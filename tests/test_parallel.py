"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Capability the reference lacks entirely (SURVEY.md §2.5): TP-sharded fused
linear, expert-parallel MoE (psum and all_to_all strategies) — all validated
against the single-device golden path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fused4bit_tpu.layers.moe import (
    QuantizedMoE,
    topk_route,
)
from fused4bit_tpu.parallel.mesh import best_mesh_shape, make_mesh
from fused4bit_tpu.parallel.expert_parallel import (
    moe_ep_a2a,
    moe_ep_replicated,
    tp_int4_matmul,
)
from fused4bit_tpu.parallel.sharding import shard_qt_experts, shard_qt_out_dim
from fused4bit_tpu.quant import dequantize, quantize, reference_linear_qt

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def randw(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)


class TestPipeline:
    """GPipe-style `stage` axis (SURVEY §2.5 PP row). Each stage applies an
    INT4-quantized linear; the pipelined composition must match running the
    stages sequentially on one device."""

    def test_pipeline_matches_sequential(self, rng):
        from fused4bit_tpu.parallel.pipeline import (
            pipeline_stages, stack_stage_params,
        )
        from fused4bit_tpu.ops.int4_matmul import int4_matmul

        S, M, MB, H = 4, 3, 8, 128
        ws = [randw(rng, H, H) * (H ** -0.5) for _ in range(S)]
        qts = [quantize(w, layout="planar") for w in ws]
        params = stack_stage_params([
            dict(packed=q.packed, scales=q.scales, zps=q.zero_points)
            for q in qts
        ])
        x = jnp.asarray(
            rng.standard_normal((M, MB, H)), jnp.float32
        ).astype(jnp.bfloat16)

        meta = qts[0]

        def stage_fn(p, act):
            from fused4bit_tpu.quant.core import QuantizedTensor
            q = QuantizedTensor(
                packed=p["packed"], scales=p["scales"],
                zero_points=p["zps"], shape=meta.shape,
                granularity=meta.granularity, layout=meta.layout,
                block_k=meta.block_k, group_size=meta.group_size,
                bits=meta.bits,
            )
            return jnp.tanh(int4_matmul(act, q, interpret=True))

        mesh = make_mesh(("stage",), (4,), devices=jax.devices()[:4])
        got = pipeline_stages(stage_fn, params, x, mesh)

        want = x
        for q in qts:
            want = jnp.tanh(
                int4_matmul(
                    want.reshape(M * MB, H), q, interpret=True
                ).reshape(M, MB, H)
            )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )


class TestMesh:
    def test_best_mesh_shape(self):
        assert best_mesh_shape(8) == (2, 4)
        assert best_mesh_shape(16) == (4, 4)
        assert best_mesh_shape(8, 1) == (8,)

    def test_make_mesh_default(self):
        mesh = make_mesh()
        assert mesh.shape["expert"] == 8
        assert mesh.shape["data"] == 1


class TestTensorParallel:
    def test_tp_linear_matches_reference(self, rng):
        mesh = make_mesh(("model",), (8,))
        w = randw(rng, 256, 128)
        qt = quantize(w, layout="planar")
        qts = shard_qt_out_dim(qt, mesh, "model")
        x = randw(rng, 4, 128)
        got = tp_int4_matmul(x, qts, mesh, axis="model")
        want = reference_linear_qt(x, qt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_tp_linear_sharded_output(self, rng):
        mesh = make_mesh(("model",), (8,))
        w = randw(rng, 256, 128)
        qt = shard_qt_out_dim(quantize(w, layout="planar"), mesh, "model")
        x = randw(rng, 4, 128)
        y = tp_int4_matmul(x, qt, mesh, axis="model", gather_output=False)
        assert y.shape == (4, 256)


class TestExpertParallel:
    E, K, N, T, TOPK = 8, 128, 96, 32, 2

    def _setup(self, rng):
        w = randw(rng, self.E, self.N, self.K)
        qt = quantize(w, layout="planar")
        x = randw(rng, self.T, self.K)
        logits = randw(rng, self.T, self.E)
        routing = topk_route(logits, self.TOPK, self.E)
        golden = QuantizedMoE(weight=qt)(x, routing)
        return qt, x, logits, golden

    def test_ep_replicated_matches_golden(self, rng):
        qt, x, logits, golden = self._setup(rng)
        mesh = make_mesh(("expert",), (8,))
        qts = shard_qt_experts(qt, mesh, "expert")
        got = moe_ep_replicated(
            x, logits, qts, mesh, top_k=self.TOPK, tile_m=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-3)

    def test_ep_replicated_2dev(self, rng):
        qt, x, logits, golden = self._setup(rng)
        mesh = make_mesh(("expert",), (2,), devices=jax.devices()[:2])
        qts = shard_qt_experts(qt, mesh, "expert")
        got = moe_ep_replicated(
            x, logits, qts, mesh, top_k=self.TOPK, tile_m=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-3)

    def test_ep_replicated_per_group_matches_golden(self, rng):
        """EP with the PRODUCTION granularity: per_group planar_groups
        expert weights (rank-4 packed [E, Gh, N, gs]) shard over the
        expert axis (PartitionSpec shorter than rank: trailing dims
        replicated) and the strategies dispatch to the batched-partials
        grouped kernel via _grouped_local."""
        E2, K2 = self.E, 512  # k_half=256, gs=128 -> gh=2
        w = randw(rng, E2, self.N, K2)
        qt = quantize(w, granularity="per_group", group_size=128,
                      layout="planar_groups")
        x = randw(rng, self.T, K2)
        logits = randw(rng, self.T, E2)
        routing = topk_route(logits, self.TOPK, E2)
        golden = QuantizedMoE(weight=qt)(x, routing)
        mesh = make_mesh(("expert",), (8,))
        qts = shard_qt_experts(qt, mesh, "expert")
        got = moe_ep_replicated(
            x, logits, qts, mesh, top_k=self.TOPK, tile_m=8, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(golden), atol=2e-3
        )

    def test_ep_a2a_matches_golden_with_ample_capacity(self, rng):
        qt, x, logits, golden = self._setup(rng)
        mesh = make_mesh(("expert",), (8,))
        qts = shard_qt_experts(qt, mesh, "expert")
        got = moe_ep_a2a(
            x, logits, qts, mesh, top_k=self.TOPK,
            capacity_factor=16.0,  # ample: no drops -> exact match
            tile_m=8, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-3)

    def test_ep_a2a_drops_gracefully_at_low_capacity(self, rng):
        qt, x, logits, _ = self._setup(rng)
        mesh = make_mesh(("expert",), (8,))
        qts = shard_qt_experts(qt, mesh, "expert")
        got = moe_ep_a2a(
            x, logits, qts, mesh, top_k=self.TOPK,
            capacity_factor=0.25, tile_m=8, interpret=True,
        )
        assert got.shape == (self.T, self.N)
        assert not bool(jnp.any(jnp.isnan(got)))

    def test_ep_ring_matches_golden(self, rng):
        """Ring-pipelined overlap strategy (VERDICT r2 item 7): the D-step
        ppermute rotation must reproduce the dense golden exactly — every
        pair computed at its expert's home device, accumulator arriving
        home after D hops. Dropless by construction."""
        from fused4bit_tpu.parallel.expert_parallel import moe_ep_ring

        qt, x, logits, golden = self._setup(rng)
        mesh = make_mesh(("expert",), (8,))
        qts = shard_qt_experts(qt, mesh, "expert")
        got = moe_ep_ring(
            x, logits, qts, mesh, top_k=self.TOPK, tile_m=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-3)

    def test_ep_ring_skewed_routing(self, rng):
        """Skewed routing (all pairs to one device's experts) must not drop:
        the ring has no capacity buffers."""
        from fused4bit_tpu.layers.moe import QuantizedMoE
        from fused4bit_tpu.parallel.expert_parallel import moe_ep_ring

        qt, x, _, _ = self._setup(rng)
        skew = jnp.full((self.T, self.E), -20.0)
        skew = skew.at[:, 0].set(5.0).at[:, 1].set(4.0)  # experts 0,1: device 0
        routing = topk_route(skew, self.TOPK, self.E)
        golden = QuantizedMoE(weight=qt)(x, routing)
        mesh = make_mesh(("expert",), (8,))
        qts = shard_qt_experts(qt, mesh, "expert")
        got = moe_ep_ring(
            x, skew, qts, mesh, top_k=self.TOPK, tile_m=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-3)

    @pytest.mark.slow  # 3-6 min in CPU interpret mode
    def test_ep_a2a_dropless_matches_golden(self, rng):
        from fused4bit_tpu.parallel.expert_parallel import moe_ep_a2a_dropless

        qt, x, logits, golden = self._setup(rng)
        mesh = make_mesh(("expert",), (8,))
        qts = shard_qt_experts(qt, mesh, "expert")
        got = moe_ep_a2a_dropless(
            x, logits, qts, mesh, top_k=self.TOPK, tile_m=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-3)

    @pytest.mark.slow  # 3-6 min in CPU interpret mode
    def test_ep_a2a_dropless_skewed_where_capacity_drops(self, rng):
        """All tokens routed to experts on one device — the capacity path
        PROVABLY drops here (capacity < skewed load), the ragged path must
        still match the dense golden exactly (round-1 verdict item 4)."""
        from fused4bit_tpu.parallel.expert_parallel import moe_ep_a2a_dropless

        w = randw(rng, self.E, self.N, self.K)
        qt = quantize(w, layout="planar")
        t = 128  # 16 tokens/device: capacity 2x mean = 8 slots < 32 pairs
        x = randw(rng, t, self.K)
        # every token picks experts 0 and 1 — maximal skew onto two devices
        logits = jnp.zeros((t, self.E)).at[:, 0].set(50.0).at[:, 1].set(49.0)
        routing = topk_route(logits, self.TOPK, self.E)
        golden = QuantizedMoE(weight=qt)(x, routing)
        mesh = make_mesh(("expert",), (8,))
        qts = shard_qt_experts(qt, mesh, "expert")

        # capacity path at factor 2 drops: mean load per dest = T*k/D, but
        # dest 0 gets T pairs (> 2*T*k/D for D=8, k=2)
        dropped = moe_ep_a2a(
            x, logits, qts, mesh, top_k=self.TOPK,
            capacity_factor=2.0, tile_m=8, interpret=True,
        )
        assert float(jnp.max(jnp.abs(
            dropped.astype(jnp.float32) - golden.astype(jnp.float32)
        ))) > 1e-2, "expected the capacity path to drop under this skew"

        got = moe_ep_a2a_dropless(
            x, logits, qts, mesh, top_k=self.TOPK, tile_m=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-3)


class TestShardedModel:
    @pytest.mark.slow  # 3-6 min in CPU interpret mode
    def test_sharded_decode_matches_single_device(self, rng):
        import jax.numpy as jnp
        from fused4bit_tpu.models.config import flagship_model_config
        from fused4bit_tpu.models.transformer import QuantizedTransformer
        from fused4bit_tpu.parallel.sharded_model import (
            place_model,
            sharded_decode_step,
        )

        cfg = flagship_model_config("tiny")  # 4 experts
        model = QuantizedTransformer.init(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(("data", "expert"), (2, 4))

        b, t = 4, 3
        tokens = jnp.asarray(np.arange(b * t).reshape(b, t) % cfg.vocab_size, jnp.int32)
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))

        # single-device golden
        caches0 = model.init_cache(cfg, b, max_seq=8)
        want, _ = model(tokens, caches0, positions)

        # sharded
        sm = place_model(model, mesh)
        caches = model.init_cache(cfg, b, max_seq=8)
        got, new_caches = sharded_decode_step(
            sm, mesh, tokens, caches, positions, interpret=True
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2,
        )
        assert int(new_caches[0].lengths[0]) == t

    @pytest.mark.slow  # 3-6 min in CPU interpret mode
    def test_sharded_decode_two_steps(self, rng):
        import jax.numpy as jnp
        from fused4bit_tpu.models.config import flagship_model_config
        from fused4bit_tpu.models.transformer import QuantizedTransformer
        from fused4bit_tpu.parallel.sharded_model import (
            place_model,
            sharded_decode_step,
        )

        cfg = flagship_model_config("tiny")
        model = QuantizedTransformer.init(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(("data", "expert"), (2, 4))
        sm = place_model(model, mesh)
        b = 2
        caches = model.init_cache(cfg, b, max_seq=8)
        tok = jnp.zeros((b, 1), jnp.int32)
        lg, caches = sharded_decode_step(
            sm, mesh, tok, caches, jnp.zeros((b, 1), jnp.int32), interpret=True
        )
        lg2, caches = sharded_decode_step(
            sm, mesh, tok, caches, jnp.ones((b, 1), jnp.int32), interpret=True
        )
        assert lg2.shape == (b, 1, cfg.vocab_size)
        assert int(caches[0].lengths[0]) == 2


class TestMeshShapes:
    def test_prime_and_odd_counts(self):
        # primes factor as (1, n) — valid, just degenerate
        assert best_mesh_shape(7) == (1, 7)
        assert best_mesh_shape(13) == (1, 13)
        assert best_mesh_shape(12) == (3, 4)
        assert best_mesh_shape(64) == (8, 8)
        assert best_mesh_shape(24, num_axes=3) == (4, 2, 3)
        for n in (2, 3, 4, 6, 7, 8, 12, 16, 24, 32, 64, 128, 256):
            for ax in (1, 2, 3):
                shape = best_mesh_shape(n, ax)
                assert len(shape) == ax
                prod = 1
                for s in shape:
                    prod *= s
                assert prod == n, (n, ax, shape)


class TestRingAttention:
    """Sequence/context parallelism (SURVEY §2.5 SP row): ring attention
    over a `seq` mesh axis must match single-device causal attention."""

    def _golden(self, q, k, v, causal=True):
        b, hq, t, d = q.shape
        rep = hq // k.shape[1]
        kr = jnp.repeat(k, rep, axis=1).astype(jnp.float32)
        vr = jnp.repeat(v, rep, axis=1).astype(jnp.float32)
        s = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32), kr)
        s = s / (d ** 0.5)
        if causal:
            mask = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
            s = jnp.where(mask[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", p, vr)

    @pytest.mark.parametrize("hkv", [4, 2, 1])
    def test_matches_dense_causal(self, rng, hkv):
        from fused4bit_tpu.parallel.sequence import ring_attention

        mesh = make_mesh(("seq",), (8,))
        b, hq, t, d = 2, 4, 64, 16
        q = randw(rng, b, hq, t, d)
        k = randw(rng, b, hkv, t, d)
        v = randw(rng, b, hkv, t, d)
        got = np.asarray(ring_attention(q, k, v, mesh), np.float32)
        want = np.asarray(self._golden(q, k, v), np.float32)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def test_non_causal(self, rng):
        from fused4bit_tpu.parallel.sequence import ring_attention

        mesh = make_mesh(("seq",), (8,))
        q = randw(rng, 1, 2, 32, 8)
        k = randw(rng, 1, 2, 32, 8)
        v = randw(rng, 1, 2, 32, 8)
        got = np.asarray(ring_attention(q, k, v, mesh, causal=False), np.float32)
        want = np.asarray(self._golden(q, k, v, causal=False), np.float32)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def test_rejects_indivisible_t(self, rng):
        from fused4bit_tpu.parallel.sequence import ring_attention

        mesh = make_mesh(("seq",), (8,))
        q = randw(rng, 1, 2, 12, 8)
        with pytest.raises(ValueError, match="divide"):
            ring_attention(q, q, q, mesh)

    def test_bf16_inputs(self, rng):
        """bf16 in, bf16 out, f32 online-softmax state inside."""
        from fused4bit_tpu.parallel.sequence import ring_attention

        mesh = make_mesh(("seq",), (4,), devices=jax.devices()[:4])
        q = randw(rng, 1, 2, 32, 16).astype(jnp.bfloat16)
        k = randw(rng, 1, 2, 32, 16).astype(jnp.bfloat16)
        v = randw(rng, 1, 2, 32, 16).astype(jnp.bfloat16)
        got = ring_attention(q, k, v, mesh)
        assert got.dtype == jnp.bfloat16
        want = self._golden(q, k, v)
        rel = float(
            jnp.linalg.norm(got.astype(jnp.float32) - want)
            / jnp.linalg.norm(want)
        )
        assert rel < 2e-2, rel


class TestRingAttentionQuantized:
    """Packed-INT4-cache ring attention: the rotating chunks are the cache's
    u8 codes + scales (~3.5x fewer ICI bytes/hop than bf16 K/V)."""

    def test_matches_dequant_golden(self, rng):
        from fused4bit_tpu.layers.kv_cache import QuantizedKVCache
        from fused4bit_tpu.parallel.mesh import make_mesh
        from fused4bit_tpu.parallel.sequence import ring_attention_quantized

        mesh = make_mesh(("seq",), (8,))
        b, hq, hkv, t, d = 2, 4, 2, 64, 16
        cache = QuantizedKVCache.init(b, hkv, t, d)
        k = randw(rng, b, hkv, t, d)
        v = randw(rng, b, hkv, t, d)
        cache = cache.append(k, v)
        q = randw(rng, b, hq, t, d)

        got = np.asarray(ring_attention_quantized(q, cache, mesh), np.float32)

        kd, vd = cache.dequantize(jnp.float32)  # golden on the SAME cache
        kr = jnp.repeat(kd, hq // hkv, axis=1)
        vr = jnp.repeat(vd, hq // hkv, axis=1)
        s = jnp.einsum("bhid,bhjd->bhij", q, kr) / (d ** 0.5)
        cm = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
        s = jnp.where(cm[None, None], s, -1e30)
        want = np.asarray(
            jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, -1), vr),
            np.float32,
        )
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_per_row_lengths_masking(self, rng):
        """Slots with shorter lengths must ignore positions past length even
        when the causal mask would allow them."""
        import dataclasses
        from fused4bit_tpu.layers.kv_cache import QuantizedKVCache
        from fused4bit_tpu.parallel.mesh import make_mesh
        from fused4bit_tpu.parallel.sequence import ring_attention_quantized

        mesh = make_mesh(("seq",), (4,), devices=jax.devices()[:4])
        b, hkv, t, d = 2, 1, 32, 8
        cache = QuantizedKVCache.init(b, hkv, t, d)
        k = randw(rng, b, hkv, t, d)
        cache = cache.append(k, k)
        cache = dataclasses.replace(
            cache, lengths=jnp.asarray([8, t], jnp.int32)
        )
        q = randw(rng, b, 2, t, d)
        out = ring_attention_quantized(q, cache, mesh)
        # poison entries past row 0's length; output must not change
        poison = dataclasses.replace(
            cache, v_scale=cache.v_scale.at[0, :, 8:].set(1e6)
        )
        out2 = ring_attention_quantized(q, poison, mesh)
        np.testing.assert_allclose(
            np.asarray(out[0, :, :8], np.float32),
            np.asarray(out2[0, :, :8], np.float32), rtol=1e-5,
        )

    def test_rejects_odd_chunks(self, rng):
        from fused4bit_tpu.layers.kv_cache import QuantizedKVCache
        from fused4bit_tpu.parallel.mesh import make_mesh
        from fused4bit_tpu.parallel.sequence import ring_attention_quantized

        mesh = make_mesh(("seq",), (8,))
        cache = QuantizedKVCache.init(1, 1, 8, 8)  # C = 1 (odd)
        q = randw(rng, 1, 1, 8, 8)
        with pytest.raises(ValueError, match="even chunks"):
            ring_attention_quantized(q, cache, mesh)


class TestUlyssesAttention:
    """Head-sharded SP (all_to_all re-shard): must match dense causal."""

    @pytest.mark.parametrize("p_sz,hkv", [(8, 8), (4, 4), (2, 2)])
    def test_matches_dense_causal(self, rng, p_sz, hkv):
        from fused4bit_tpu.parallel.sequence import ulysses_attention

        mesh = make_mesh(("seq",), (p_sz,), devices=jax.devices()[:p_sz])
        b, hq, t, d = 2, 16, 32, 8
        q = randw(rng, b, hq, t, d)
        k = randw(rng, b, hkv, t, d)
        v = randw(rng, b, hkv, t, d)
        got = np.asarray(ulysses_attention(q, k, v, mesh), np.float32)

        rep = hq // hkv
        kr = jnp.repeat(k, rep, axis=1)
        vr = jnp.repeat(v, rep, axis=1)
        s = jnp.einsum("bhid,bhjd->bhij", q, kr) / (d ** 0.5)
        cm = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
        s = jnp.where(cm[None, None], s, -1e30)
        want = np.asarray(
            jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, -1), vr),
            np.float32,
        )
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def test_agrees_with_ring(self, rng):
        from fused4bit_tpu.parallel.sequence import (
            ring_attention, ulysses_attention,
        )

        mesh = make_mesh(("seq",), (4,), devices=jax.devices()[:4])
        q = randw(rng, 1, 8, 64, 16)
        k = randw(rng, 1, 4, 64, 16)
        v = randw(rng, 1, 4, 64, 16)
        a = np.asarray(ulysses_attention(q, k, v, mesh), np.float32)
        b_ = np.asarray(ring_attention(q, k, v, mesh), np.float32)
        np.testing.assert_allclose(a, b_, atol=1e-5, rtol=1e-4)

    def test_rejects_indivisible_heads(self, rng):
        from fused4bit_tpu.parallel.sequence import ulysses_attention

        mesh = make_mesh(("seq",), (8,))
        q = randw(rng, 1, 8, 32, 8)
        k = randw(rng, 1, 4, 32, 8)  # Hkv=4 < P=8
        with pytest.raises(ValueError, match="must divide"):
            ulysses_attention(q, k, k, mesh)
