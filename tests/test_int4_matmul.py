"""Fused kernel vs golden reference — the reference's correctness ladder level 3.

Mirrors `tests/test_correctness.py:189-253` (CUDA-vs-reference) with the same
tolerance ladder: atol 1e-3 for small/batched shapes, 1e-2 for large shapes
(f32 accumulation-order differences). On CPU the Pallas kernel runs in
interpreter mode; on TPU the same tests exercise the compiled kernel.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fused4bit_tpu.layers.linear import QuantizedLinear
from fused4bit_tpu.ops.int4_matmul import int4_matmul
from fused4bit_tpu.quant import quantize, reference_linear_qt


def randw(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)


class TestInt4Matmul:
    def test_1d_input(self, rng):
        w = randw(rng, 128, 256)
        x = randw(rng, 256)
        qt = quantize(w)
        got = int4_matmul(x, qt)
        want = reference_linear_qt(x, qt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_batched(self, rng):
        w = randw(rng, 128, 512)
        x = randw(rng, 4, 512)
        qt = quantize(w)
        np.testing.assert_allclose(
            np.asarray(int4_matmul(x, qt)),
            np.asarray(reference_linear_qt(x, qt)),
            atol=1e-3,
        )

    def test_3d_input(self, rng):
        w = randw(rng, 64, 128)
        x = randw(rng, 2, 3, 128)
        qt = quantize(w)
        got = int4_matmul(x, qt)
        assert got.shape == (2, 3, 64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(reference_linear_qt(x, qt)), atol=1e-3
        )

    @pytest.mark.parametrize("n,k", [(256, 1024), (384, 11008 // 8)])
    def test_shapes(self, rng, n, k):
        # 1376 = 11008/8: exercises the non-512 block_k path (choose_block_k).
        w = randw(rng, n, k)
        x = randw(rng, 8, k)
        qt = quantize(w)
        np.testing.assert_allclose(
            np.asarray(int4_matmul(x, qt)),
            np.asarray(reference_linear_qt(x, qt)),
            atol=1e-2,
        )

    def test_unaligned_n(self, rng):
        # N not a multiple of the tile: exercises the padding path.
        w = randw(rng, 100, 256)
        x = randw(rng, 3, 256)
        qt = quantize(w)
        got = int4_matmul(x, qt)
        assert got.shape == (3, 100)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(reference_linear_qt(x, qt)), atol=1e-3
        )

    def test_large_tolerance_ladder(self, rng):
        # Reference uses 4096x4096 at atol 1e-2 (:236-253); scaled down for CI
        # speed but still multi-k-tile.
        w = randw(rng, 512, 2048)
        x = randw(rng, 16, 2048)
        qt = quantize(w)
        np.testing.assert_allclose(
            np.asarray(int4_matmul(x, qt)),
            np.asarray(reference_linear_qt(x, qt)),
            atol=1e-2,
        )

    def test_no_nan(self, rng):
        w = jnp.ones((64, 128)) * 2.0  # constant rows
        x = randw(rng, 2, 128)
        qt = quantize(w)
        assert not bool(jnp.any(jnp.isnan(int4_matmul(x, qt))))

    def test_bf16_activations(self, rng):
        w = randw(rng, 128, 256)
        x = randw(rng, 4, 256).astype(jnp.bfloat16)
        qt = quantize(w)
        got = int4_matmul(x, qt)
        assert got.dtype == jnp.bfloat16
        want = reference_linear_qt(x.astype(jnp.float32), qt)
        # bf16 tolerance is looser
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32), np.asarray(want), atol=0.15, rtol=0.05
        )


class TestQuantizedLinear:
    def test_from_dense_matches_reference(self, rng):
        w = randw(rng, 96, 128)
        layer = QuantizedLinear.from_dense(w)
        x = randw(rng, 5, 128)
        np.testing.assert_allclose(
            np.asarray(layer(x)),
            np.asarray(reference_linear_qt(x, layer.weight)),
            atol=1e-3,
        )

    def test_bias(self, rng):
        w = randw(rng, 32, 64)
        b = randw(rng, 32)
        layer = QuantizedLinear.from_dense(w, b)
        x = randw(rng, 2, 64)
        got = layer(x)
        want = reference_linear_qt(x, layer.weight) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_quality_vs_dense(self, rng):
        w = randw(rng, 256, 512)
        x = randw(rng, 512)
        layer = QuantizedLinear.from_dense(w)
        exact = x @ w.T
        approx = layer(x)
        cos = jnp.dot(exact, approx) / (
            jnp.linalg.norm(exact) * jnp.linalg.norm(approx)
        )
        assert float(cos) > 0.95

    def test_memory_reduction(self, rng):
        layer = QuantizedLinear.from_dense(randw(rng, 1024, 1024))
        dense_bytes = 1024 * 1024 * 4
        assert dense_bytes / layer.nbytes >= 7.5

    def test_per_group_falls_back_to_reference_path(self, rng):
        w = randw(rng, 64, 256)
        layer = QuantizedLinear.from_dense(w, granularity="per_group", group_size=64)
        x = randw(rng, 2, 256)
        np.testing.assert_allclose(
            np.asarray(layer(x)),
            np.asarray(reference_linear_qt(x, layer.weight)),
            atol=1e-5,
        )


class TestInt4MatmulA8:
    """w4a8 turbo mode: integer MXU path with dynamic activation quant."""

    def test_matches_reference_within_a8_tolerance(self, rng):
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_a8

        w = randw(rng, 128, 512)
        x = randw(rng, 8, 512)
        qt = quantize(w)
        got = int4_matmul_a8(x, qt)
        want = reference_linear_qt(x, qt)
        rel = jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want))
        assert float(rel) < 0.02  # int8 activation quantization error

    def test_shapes_and_dtype(self, rng):
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_a8

        w = randw(rng, 96, 256)
        qt = quantize(w)
        x = jnp.asarray(rng.standard_normal((2, 3, 256)), jnp.bfloat16)
        y = int4_matmul_a8(x, qt)
        assert y.shape == (2, 3, 96)
        assert y.dtype == jnp.bfloat16

    def test_integer_path_is_deterministic(self, rng):
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_a8

        w = randw(rng, 64, 256)
        qt = quantize(w)
        x = randw(rng, 4, 256)
        a = int4_matmul_a8(x, qt)
        b = int4_matmul_a8(x, qt)
        assert jnp.array_equal(a, b)

    def test_fused_quant_matches_host_quant(self, rng):
        """In-kernel activation quantization (the decode default) runs the
        same f32 amax/round/clip math as the host-op path, fused into the
        Pallas prologue. The two are separately compiled XLA programs, so we
        assert equality to well below ONE int8 code step (a real quantization
        divergence would show up at sx*s_col ~ 1e-3; observed compile-context
        noise is ~1e-5, single-ulp f32)."""
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_a8

        for m, n, k in [(8, 512, 256), (3, 256, 128), (33, 384, 512)]:
            w = randw(rng, n, k)
            qt = quantize(w)
            for dt in (jnp.float32, jnp.bfloat16):
                x = jnp.asarray(rng.standard_normal((m, k)), dt)
                host = np.asarray(
                    int4_matmul_a8(x, qt, fuse_quant=False), np.float32
                )
                fused = np.asarray(
                    int4_matmul_a8(x, qt, fuse_quant=True), np.float32
                )
                tol = 1e-4 * float(np.abs(host).max())
                np.testing.assert_allclose(
                    fused, host, rtol=0, atol=tol,
                    err_msg=str((m, n, k, dt)),
                )


class TestInt4MatmulPerGroup:
    """per_group granularity in the fused kernel (production INT4 standard)."""

    def test_matches_reference(self, rng):
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_per_group

        w = randw(rng, 128, 512)  # K/2=256, group_size=128 -> 2 groups/half
        qt = quantize(w, granularity="per_group", group_size=128, layout="planar")
        x = randw(rng, 8, 512)
        got = int4_matmul_per_group(x, qt)
        want = reference_linear_qt(x, qt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_matches_reference_many_groups(self, rng):
        """Multi-group and ODD group-count shapes (the flagship
        down-projection has gh=43 — odd — which exercises the expansion
        design's group-count padding)."""
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_per_group

        for n, k in [(64, 1024), (96, 768)]:  # gh = 4 and gh = 3 per half
            w = randw(rng, n, k)
            qt = quantize(
                w, granularity="per_group", group_size=128, layout="planar"
            )
            x = randw(rng, 8, k)
            got = int4_matmul_per_group(x, qt)
            want = reference_linear_qt(x, qt)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-3,
                err_msg=str((n, k)),
            )

    def test_better_than_per_row_on_outlier_rows(self, rng):
        """per_group must beat per_row when a row has a localized outlier."""
        w = np.asarray(rng.standard_normal((32, 512)), np.float32)
        w[:, :8] *= 50.0  # outlier columns blow up the per-row scale
        w = jnp.asarray(w)
        x = randw(rng, 4, 512)
        exact = np.asarray(x @ w.T)
        from fused4bit_tpu.ops.int4_matmul import int4_matmul, int4_matmul_per_group

        qr = quantize(w, granularity="per_row", layout="planar")
        qg = quantize(w, granularity="per_group", group_size=128, layout="planar")
        err_row = np.max(np.abs(np.asarray(int4_matmul(x, qr)) - exact))
        err_grp = np.max(np.abs(np.asarray(int4_matmul_per_group(x, qg)) - exact))
        assert err_grp < err_row

    def test_quantized_linear_dispatches_to_group_kernel(self, rng):
        w = randw(rng, 64, 512)
        layer = QuantizedLinear.from_dense(w, granularity="per_group", group_size=128)
        x = randw(rng, 2, 512)
        np.testing.assert_allclose(
            np.asarray(layer(x)),
            np.asarray(reference_linear_qt(x, layer.weight)),
            atol=1e-3,
        )

    def test_bf16(self, rng):
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_per_group
        from fused4bit_tpu.quant.core import dequantize

        w = randw(rng, 128, 256)
        qt = quantize(w, granularity="per_group", group_size=128, layout="planar")
        x = randw(rng, 4, 256).astype(jnp.bfloat16)
        got = int4_matmul_per_group(x, qt)
        # The round-3 kernel's numerical contract in bf16 compute is exactly
        # "dequantize to bf16, then matmul" (scales expand through an exact
        # 0/1 selection dot; the affine dequant rounds each weight to bf16
        # once) — match that reference tightly, and the f32 golden loosely
        # (one extra bf16 rounding vs the old f32-partial formulation).
        want_bf16 = jnp.dot(
            x.astype(jnp.float32),
            dequantize(qt, dtype=jnp.bfloat16).astype(jnp.float32).T,
            precision=jax.lax.Precision.HIGHEST,
        )
        # atol covers the kernel's own bf16 dot rounding (the reference dot
        # here runs f32 HIGHEST); 0.12 is <1% of typical output magnitude
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want_bf16),
            atol=0.12, rtol=0.02,
        )
        want = reference_linear_qt(x.astype(jnp.float32), qt)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=0.25, rtol=0.06
        )


class TestInt4MatmulPerGroupBP:
    """Batched-partials per-group kernel (layout="planar_groups"): the
    round-5 structure that runs per-group at per_row speed (the group axis
    is a dot_general batch dim over raw nibbles; scales apply to the
    [Gh, TM, TN] partials). Device-measured 1.01-1.08x per_row at the
    flagship shapes vs 2.7-2.9x for the planar expansion-dot kernel."""

    def _check(self, rng, n, k, m, gs=128, atol=1e-3, dtype=jnp.float32):
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_per_group

        w = randw(rng, n, k)
        qt = quantize(w, granularity="per_group", group_size=gs,
                      layout="planar_groups")
        x = randw(rng, m, k).astype(dtype)
        got = int4_matmul_per_group(x, qt)
        want = reference_linear_qt(x.astype(jnp.float32), qt)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=atol,
            rtol=0.02 if dtype == jnp.bfloat16 else 0,
            err_msg=str((n, k, m, gs, dtype)),
        )

    def test_matches_reference(self, rng):
        self._check(rng, 128, 512, 8)

    def test_matches_reference_odd_group_count(self, rng):
        # gh = 3 per half (the flagship down-projection's gh=43 is odd too;
        # the batch dim takes any size — no padding workaround needed)
        self._check(rng, 96, 768, 8)

    def test_matches_reference_multi_tile_and_row_pad(self, rng):
        # n > tile_n forces multiple grid columns; n % 256 != 0 exercises
        # the n-pad path (padded scale rows contribute exact zeros); m=20
        # exercises the m-pad path
        self._check(rng, 320, 512, 20, atol=2e-3)

    def test_group_size_256(self, rng):
        self._check(rng, 64, 1024, 4, gs=256)

    def test_bf16(self, rng):
        # raw nibbles are exact in bf16 and partials accumulate in f32, so
        # bf16 compute only rounds x and the dot products — tighter than the
        # expansion kernel's dequantize-to-bf16 contract
        self._check(rng, 128, 512, 8, dtype=jnp.bfloat16, atol=0.12)

    def test_planar_groups_is_default_for_per_group_layers(self, rng):
        w = randw(rng, 64, 512)
        layer = QuantizedLinear.from_dense(
            w, granularity="per_group", group_size=128
        )
        assert layer.weight.layout == "planar_groups"
        x = randw(rng, 2, 512)
        np.testing.assert_allclose(
            np.asarray(layer(x)),
            np.asarray(reference_linear_qt(x, layer.weight)),
            atol=1e-3,
        )

    def test_a8_variant_matches_reference_within_activation_error(self, rng):
        """w4a8 batched-partials per-group kernel: exact int32 partials,
        so the only deviation from the f32 golden is the int8 activation
        quantization (~1% rel, the int4_matmul_a8 contract)."""
        from fused4bit_tpu.ops.int4_matmul import int4_matmul_per_group_a8

        for n, k, m in [(256, 512, 8), (96, 768, 33)]:  # odd gh + m-pad
            w = randw(rng, n, k)
            qt = quantize(w, granularity="per_group", group_size=128,
                          layout="planar_groups")
            x = randw(rng, m, k)
            got = np.asarray(int4_matmul_per_group_a8(x, qt))
            want = np.asarray(reference_linear_qt(x, qt))
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            assert rel < 0.015, (n, k, m, rel)

    def test_a8_via_layer_activation_int8(self, rng):
        w = randw(rng, 128, 512)
        layer = QuantizedLinear.from_dense(
            w, granularity="per_group", group_size=128
        )
        layer = dataclasses.replace(layer, activation="int8")
        x = randw(rng, 4, 512)
        got = np.asarray(layer(x))
        want = np.asarray(reference_linear_qt(x, layer.weight))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.015

    def test_padded_rows_layer(self, rng):
        """pad_rows on the rank-3 planar_groups layout pads the N (middle)
        axis; outputs slice back to the logical out_features."""
        w = randw(rng, 100, 512)
        layer = QuantizedLinear.from_dense(
            w, granularity="per_group", group_size=128
        ).padded_for_kernel()
        x = randw(rng, 4, 512)
        y = layer(x)
        assert y.shape == (4, 100)
        np.testing.assert_allclose(
            np.asarray(y),
            np.asarray(
                reference_linear_qt(x, layer.weight)[..., :100]
            ),
            atol=1e-3,
        )


class TestPrefillDispatch:
    def test_prefill_path_matches_kernel(self, rng):
        w = randw(rng, 128, 256)
        qt = quantize(w)
        x = randw(rng, 600, 256)  # > default prefill_threshold
        via_prefill = int4_matmul(x, qt)
        via_kernel = int4_matmul(x, qt, prefill_threshold=10_000)
        np.testing.assert_allclose(
            np.asarray(via_prefill), np.asarray(via_kernel), atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(via_prefill),
            np.asarray(reference_linear_qt(x, qt)),
            atol=1e-3,
        )
