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


class TestElasticLoop:
    """Failure-tolerant step loop (utils/elastic.py): resume after crash,
    retry transient faults, identical trajectory to an uninterrupted run."""

    @staticmethod
    def _step(state, i):
        import jax.numpy as jnp
        return {"w": state["w"] + jnp.float32(i + 1), "n": state["n"] + 1}

    def test_uninterrupted_matches_plain_loop(self, tmp_path):
        import jax.numpy as jnp
        from fused4bit_tpu.utils.elastic import elastic_loop

        init = {"w": jnp.zeros((4,), jnp.float32), "n": jnp.int32(0)}
        got, resumed = elastic_loop(
            self._step, init, ckpt_dir=str(tmp_path / "ck"),
            num_steps=7, save_every=3,
        )
        assert resumed == 0
        want = init
        for i in range(7):
            want = self._step(want, i)
        np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(want["w"]))
        assert int(got["n"]) == 7

    def test_resume_after_crash(self, tmp_path):
        """Kill the loop mid-run (exception past the last save); a rerun
        resumes from the newest checkpoint and lands on the same state."""
        import jax.numpy as jnp
        from fused4bit_tpu.utils.elastic import elastic_loop, latest_step

        init = {"w": jnp.zeros((4,), jnp.float32), "n": jnp.int32(0)}
        ckdir = str(tmp_path / "ck")

        class Boom(RuntimeError):
            pass

        def crashing(state, i):
            if i == 5:
                raise Boom("preempted")
            return self._step(state, i)

        with pytest.raises(Boom):
            elastic_loop(crashing, init, ckpt_dir=ckdir, num_steps=8,
                         save_every=2, max_retries=0)
        assert latest_step(ckdir) == 4

        got, resumed = elastic_loop(
            self._step, init, ckpt_dir=ckdir, num_steps=8, save_every=2,
        )
        assert resumed == 4
        want = init
        for i in range(8):
            want = self._step(want, i)
        np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(want["w"]))

    def test_transient_fault_retry(self, tmp_path):
        """A step that fails once then succeeds: the loop rolls back to the
        last checkpoint and completes with the correct final state."""
        import jax.numpy as jnp
        from fused4bit_tpu.utils.elastic import elastic_loop

        init = {"w": jnp.zeros((4,), jnp.float32), "n": jnp.int32(0)}
        failed = {"done": False}

        def flaky(state, i):
            if i == 5 and not failed["done"]:
                failed["done"] = True
                raise RuntimeError("tunnel reset")
            return self._step(state, i)

        got, _ = elastic_loop(
            flaky, init, ckpt_dir=str(tmp_path / "ck"), num_steps=8,
            save_every=2, max_retries=2,
        )
        want = init
        for i in range(8):
            want = self._step(want, i)
        np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(want["w"]))

    def test_prune_keeps_newest(self, tmp_path):
        from fused4bit_tpu.utils.elastic import elastic_loop, latest_step
        import jax.numpy as jnp, os

        init = {"w": jnp.zeros((2,), jnp.float32), "n": jnp.int32(0)}
        ckdir = str(tmp_path / "ck")
        elastic_loop(self._step, init, ckpt_dir=ckdir, num_steps=10,
                     save_every=2, keep=2)
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(ckdir)
            if d.startswith("step_")
        )
        assert steps == [8, 10]
        assert latest_step(ckdir) == 10
