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
