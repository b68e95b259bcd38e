"""Orbax checkpoint round-trip for quantized pytrees."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fused4bit_tpu.layers.linear import QuantizedLinear
from fused4bit_tpu.models.config import flagship_model_config
from fused4bit_tpu.models.transformer import QuantizedTransformer
from fused4bit_tpu.quant import quantize
from fused4bit_tpu.utils import checkpoint


class TestCheckpoint:
    def test_quantized_tensor_roundtrip(self, rng, tmp_path):
        w = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
        qt = quantize(w)
        path = str(tmp_path / "qt")
        checkpoint.save(path, qt)
        qt2 = checkpoint.load(path, qt)
        assert jnp.array_equal(qt2.packed, qt.packed)
        assert jnp.array_equal(qt2.scales, qt.scales)
        assert qt2.layout == qt.layout and qt2.shape == qt.shape

    def test_model_roundtrip(self, rng, tmp_path):
        cfg = flagship_model_config("tiny")
        model = QuantizedTransformer.init(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "model")
        checkpoint.save(path, model)
        template = QuantizedTransformer.init(jax.random.PRNGKey(1), cfg)
        model2 = checkpoint.load(path, template)
        # restored model computes identically
        caches = model.init_cache(cfg, 1, 16)
        caches2 = model2.init_cache(cfg, 1, 16)
        toks = jnp.asarray([[1, 2, 3]], jnp.int32)
        l1, _ = model(toks, caches, jnp.arange(3))
        l2, _ = model2(toks, caches2, jnp.arange(3))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_save_restore_roundtrip(self, rng, tmp_path):
        """Save a model PLACED ON A MESH (expert weights sharded), restore
        under the SAME mesh with explicit shardings, and verify bit-identical
        leaves + identical decode logits — the case that actually breaks in
        practice (VERDICT r2 item 8)."""
        from fused4bit_tpu.parallel.mesh import make_mesh
        from fused4bit_tpu.parallel.sharded_model import (
            model_pspecs, place_model,
        )
        from jax.sharding import NamedSharding

        cfg = flagship_model_config("tiny")
        model = QuantizedTransformer.init(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(("data", "expert"), (2, 4))
        placed = place_model(model, mesh)
        path = str(tmp_path / "sharded")
        checkpoint.save(path, placed)

        template = QuantizedTransformer.init(jax.random.PRNGKey(1), cfg)
        specs = model_pspecs(template)
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda s: type(s).__name__ == "PartitionSpec",
        )
        restored = checkpoint.load(path, template, shardings=shardings)
        for a, b in zip(jax.tree.leaves(placed), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_restore_on_different_mesh_size(self, rng, tmp_path):
        """Save under an 8-device (2 dp x 4 ep) mesh, restore under a
        4-device (1 dp x 4 ep) mesh: Orbax reshards; values and compute
        must be unchanged."""
        from fused4bit_tpu.parallel.mesh import make_mesh
        from fused4bit_tpu.parallel.sharded_model import (
            model_pspecs, place_model, sharded_decode_step,
        )
        from jax.sharding import NamedSharding

        cfg = flagship_model_config("tiny")
        model = QuantizedTransformer.init(jax.random.PRNGKey(0), cfg)
        mesh8 = make_mesh(("data", "expert"), (2, 4))
        placed = place_model(model, mesh8)
        path = str(tmp_path / "resharded")
        checkpoint.save(path, placed)

        mesh4 = make_mesh(("data", "expert"), (1, 4),
                          devices=jax.devices()[:4])
        template = QuantizedTransformer.init(jax.random.PRNGKey(1), cfg)
        specs = model_pspecs(template)
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh4, s), specs,
            is_leaf=lambda s: type(s).__name__ == "PartitionSpec",
        )
        restored = checkpoint.load(path, template, shardings=shardings)
        # decode through the restored model on the smaller mesh vs the
        # unsharded original
        b = 2
        caches = model.init_cache(cfg, b, 16)
        toks = jnp.asarray([[3], [5]], jnp.int32)
        pos = jnp.zeros((b, 1), jnp.int32)
        want, _ = model(toks, caches, pos)
        got, _ = sharded_decode_step(
            restored, mesh4, toks, model.init_cache(cfg, b, 16), pos,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0.05, atol=0.05,
        )
