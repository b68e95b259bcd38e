"""Fused INT4 dequantize + matmul Pallas TPU kernel.

TPU-native re-design of the reference CUDA kernel
`quantized_linear_optimized_kernel` (`/root/reference/csrc/
quantized_linear_kernel.cu:90-279`). The reference assigns one CUDA thread per
output element, stages the input vector in shared memory, and unpacks 32
nibbles per `uint4` load with an FMA inner loop. On TPU the same job maps to:

* a Pallas grid over (M-tiles, N-tiles, K-tiles); HBM→VMEM staging is done by
  the BlockSpec pipeline (hardware DMA replaces hand-written smem tiling,
  SURVEY.md §7 idiom table). With the planar packed layout each weight tile is
  a run of long contiguous rows (K/2 bytes each), which is what the DMA
  engines want — the analogue of the reference's 16-byte `uint4` vector loads
  (`...cu:182-199`).
* nibble unpack on the VPU in the 8-bit domain: ``p & 0xF`` / ``p >> 4`` on
  uint8 lanes, one int8→bf16 hardware convert, and a bf16 zero-point subtract
  (vs. per-byte scalar unpack at `...cu:223-224`). 8-bit adds and u8→f32
  casts crash or are unsupported in Mosaic — the u8 → i8 bitcast → bf16
  convert → bf16 subtract sequence is the fast *and* exact path, since
  ``q - zp`` is an integer in [-15, 15] (exact in bfloat16).
* the multiply-accumulate runs on the 128x128 MXU as two real matmuls (low
  nibbles against the first half of x, high nibbles against the second half —
  planar packing makes both contiguous, so no lane interleave ever happens).

Numerical design (SURVEY.md §7 "hard parts" — per-row scales vs MXU tiling):
with asymmetric per-row quantization ``W[j,i] = (q[j,i] - zp[j]) * s[j]``, the
kernel subtracts the zero-point *before* the dot and applies the scale
*after*:

    y[b,j] = s[j] * ( x[b,:] @ (q[j,:] - zp[j])^T )

so the per-row scale touches only the [M, TILE_N] output tile, never the
inner loop. (The alternative ``s*(x@q^T) - s*zp*sum(x)`` rearrangement
suffers catastrophic cancellation at reduced matmul precision because
``x@q^T`` is large and uncentered.) The weights stay packed INT4 in HBM; per
K-tile the kernel moves ``TILE_N * TILE_K / 2`` bytes instead of
``2 * TILE_N * TILE_K`` (bf16) — the entire speedup in the memory-bound
decode regime.

Falls back to interpreter mode off-TPU so the same tests run everywhere.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.core import QuantizedTensor

__all__ = ["int4_matmul", "quantized_linear"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


# Unpack scheme (Mosaic cannot legalize 8-bit shifts or adds, so the unpack
# uses *masks only* on u8 lanes, one hardware i8->float convert per half, and
# a float broadcast-subtract):
#
#   qlo = i8(p & 0x0F) - zp                       == q_lo - zp
#   vhi = i8(p & 0xF0) - 16*(zp - 8)              == 16 * (q_hi - zp)
#
# The high nibble is stored XOR 8 by ``pack_planar``, so its masked byte
# reinterpreted as two's-complement int8 is exactly ``16*(q_hi - 8)`` — the
# hi dot product is multiplied by 1/16 (an exact f32 exponent shift). All
# intermediate values are integers with |v| <= 240, exact in bfloat16.


def _int4_matmul_kernel(
    x_ref,        # [TM, K]        activations (full K rows)
    w_ref,        # [TN, TKH]      packed nibbles (u8), planar: TKH = TK/2
    s_ref,        # [1, TN] f32    per-row scales
    z_ref,        # [1, TN] f32    per-row zero-points (integer-valued)
    o_ref,        # [TM, TN]
    acc_ref,      # [TM, TN] f32 scratch
    *,
    n_k: int,
    k_half: int,     # K/2 — offset of the hi-nibble columns in x
    tile_kh: int,    # packed bytes per k-tile (= TK/2)
    compute_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    zp_col = z_ref[0, :][:, None].astype(compute_dtype)  # [TN, 1]

    # Planar layout: byte column c of the k-th tile holds q columns
    # (k*tile_kh + c) [lo nibble] and (k_half + k*tile_kh + c) [hi nibble];
    # both x slices are contiguous.
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    if n_k == 1:
        # Static slices: no 128-multiple provability constraints on offsets.
        x_lo = x_ref[:, :k_half].astype(compute_dtype)
        x_hi = x_ref[:, k_half:].astype(compute_dtype)
    else:
        # tile_kh is kept a multiple of 128 by the wrapper when n_k > 1.
        off = pl.multiple_of(k * tile_kh, 128)
        x_lo = x_ref[:, pl.ds(off, tile_kh)].astype(compute_dtype)
        x_hi = x_ref[:, pl.ds(k_half + off, tile_kh)].astype(compute_dtype)
    dims = (((1,), (1,)), ((), ()))
    # The unpacked [TN, TKH] compute-dtype temporaries are the VMEM hog
    # (2 * TN * TKH * 2B in bf16 vs ~16 MB/core total); sequencing each
    # unpack-then-dot as its own accumulator statement keeps qlo dead before
    # vhi materializes, halving the peak live temporary set and leaving room
    # for double-buffered weight blocks (measured in kernel_tile_tune_a16).
    p = w_ref[:]
    qlo = (p & 0x0F).astype(jnp.int8).astype(compute_dtype) - zp_col
    acc_ref[:] += jax.lax.dot_general(
        x_lo, qlo, dims, preferred_element_type=jnp.float32, precision=prec
    )
    vhi = pltpu.bitcast(p & 0xF0, jnp.int8).astype(compute_dtype) - 16.0 * (
        zp_col - 8.0
    )
    acc_ref[:] += 0.0625 * jax.lax.dot_general(
        x_hi, vhi, dims, preferred_element_type=jnp.float32, precision=prec
    )

    @pl.when(k == n_k - 1)
    def _finish():
        o_ref[:] = (s_ref[0, :][None, :] * acc_ref[:]).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_n", "tile_kh", "compute_dtype", "out_dtype", "interpret",
    ),
)
def _int4_matmul_padded(
    x, packed, scales, zero_points,
    *, tile_m: int, tile_n: int, tile_kh: int, compute_dtype, out_dtype, interpret,
):
    """Core pallas_call on pre-padded operands.

    x:      [M, K]   (M % tile_m == 0)
    packed: [N, K/2] (N % tile_n == 0, (K/2) % tile_kh == 0), planar layout
    scales, zero_points: [N] f32
    """
    m, k = x.shape
    n, k_half = packed.shape
    n_k = k_half // tile_kh
    grid = (m // tile_m, n // tile_n, n_k)

    kernel = functools.partial(
        _int4_matmul_kernel,
        n_k=n_k,
        k_half=k_half,
        tile_kh=tile_kh,
        compute_dtype=compute_dtype,
    )

    flops = 2 * m * n * k
    bytes_accessed = x.size * x.dtype.itemsize + packed.size + 2 * n * 4 + m * n * 4

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # x: the full K row range for this m-tile (sliced inside).
            pl.BlockSpec((tile_m, k), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            # packed weights: [TN, tile_kh] bytes — long contiguous rows.
            pl.BlockSpec(
                (tile_n, tile_kh), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, packed, scales[None, :], zero_points[None, :])


# Measured-best weight-block heights per K-depth, ONE shared table for the
# kernels and the row-padding helper (benchmark/results/device_bw.json,
# device-trace protocol at the flagship pair):
#   shallow-K (k_half <= 3072): both kernels best at 1024 rows.
#   deep-K: w4a8 best at 384 (678 GB/s; 512 costs -21%), w4a16 nominally
#     best at 512 but within 5% at 384 — so the shared row-pad multiple
#     follows the a8 preference (the decode throughput path) and the bf16
#     kernel rides the 384 divisor. Keeping one table means
#     `QuantizedLinear.padded_for_kernel` can never pad to a multiple that
#     de-optimizes a kernel path behind its back.
_SHALLOW_KH = 3072


def best_tile_n_a16(k_half: int) -> int:
    return 1024 if k_half <= _SHALLOW_KH else 512


def best_tile_n_a8(k_half: int) -> int:
    return 1024 if k_half <= _SHALLOW_KH else 384


def preferred_row_multiple(k_half: int) -> int:
    """Row-pad multiple for `quant.core.pad_rows` at conversion: the a8
    target (384 deep-K beats 512 by 21% for a8 and costs a16 only 5%;
    padding to lcm(384, 512)=1536 would add +12.5% weight traffic at the
    flagship down-projection — worse than either tile compromise)."""
    return best_tile_n_a8(k_half)


def _best_tile_n(n: int, k_half: int, best: int) -> int:
    """Largest divisor of round_up(n, 128) at or below the measured-best
    block height — a divisor tile needs no n_pad copy on the hot path.
    Callers that pre-pad rows (quant.core.pad_rows) make the best size a
    divisor, unlocking it automatically."""
    n128 = _round_up(n, 128)
    best = max(128, min(best, n128))
    return next((c for c in range(best, 0, -128) if n128 % c == 0), 128)


def _pick_tiles(m: int, n: int, k: int, x_bytes: int):
    """Choose (tile_m, tile_n, tile_kh) under a VMEM budget.

    Weight-tile rows must be long for DMA efficiency, so prefer splitting K
    as little as possible; unpacked bf16 temporaries are the VMEM hog.
    tile_n targets the measured-best weight-block height per K-depth
    (benchmark/results/device_bw.json, device-trace protocol: ~2 MB blocks
    at k_half <= 3072, ~512 rows on the deep-K down-projection).
    """
    tile_m = m if m <= 256 else 256
    tile_n = _best_tile_n(n, k // 2, best_tile_n_a16(k // 2))
    k_half = k // 2
    # Unpacked lo+hi temporaries: 2 * tile_n * tile_kh * 2B (bf16) or 4B (f32);
    # keep them + 2x packed buffers under ~8MB.
    budget = 8 * 1024 * 1024
    tile_kh = k_half
    while tile_kh > 512:
        tmp = 2 * tile_n * tile_kh * 4 + 2 * tile_n * tile_kh
        xb = tile_m * k * x_bytes
        if tmp + xb <= budget:
            break
        if tile_kh % 2 != 0:
            break
        tile_kh //= 2
    return tile_m, tile_n, tile_kh


def int4_matmul(
    x: jnp.ndarray,
    qt: QuantizedTensor,
    *,
    tile_n: Optional[int] = None,
    compute_dtype=None,
    out_dtype=None,
    interpret: Optional[bool] = None,
    prefill_threshold: int = 512,
) -> jnp.ndarray:
    """``x @ dequant(qt)^T`` without materializing the dense weight.

    Args:
      x:  [..., K] activations (f32 or bf16).
      qt: per_row-quantized, planar/block_planar-packed weight [N, K].
      prefill_threshold: above this many rows the call is compute-bound, not
        weight-stream-bound — the fused kernel would re-stream the packed
        weights once per m-tile, so a one-shot dequantize + XLA dense matmul
        (which streams the weights once and runs the MXU at full tilt) is
        strictly better. Decode (small M) stays on the fused kernel.
    Returns [..., N].
    """
    if qt.granularity != "per_row":
        raise NotImplementedError(
            f"fused kernel supports per_row scales; got {qt.granularity}"
        )
    if qt.layout != "planar":
        raise ValueError(
            f"kernel requires the planar layout (see pack_planar); got {qt.layout}"
        )

    n, k = qt.out_dim, qt.in_dim
    if x.shape[-1] != k:
        raise ValueError(f"x.shape[-1]={x.shape[-1]} != K={k}")
    if interpret is None:
        interpret = not _on_tpu()
    if compute_dtype is None:
        compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    if out_dtype is None:
        out_dtype = x.dtype

    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d

    if m > prefill_threshold:
        # Prefill regime: dequantize once, let XLA's dense matmul do the rest.
        from ..quant.core import dequantize

        wd = dequantize(qt, dtype=compute_dtype)
        y = jax.lax.dot_general(
            x.reshape(m, k).astype(compute_dtype), wd,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT,
        )
        return y.astype(out_dtype).reshape(*lead, n)

    x2 = x.reshape(m, k)

    m_pad = max(_round_up(m, 8), 8)
    tile_m, tn, tile_kh = _pick_tiles(m_pad, n, k, jnp.dtype(x.dtype).itemsize)
    if tile_n is not None:
        tn = min(tile_n, _round_up(n, 128))
    # The k-split must divide K/2 exactly AND (when splitting) keep dynamic
    # lane offsets at 128-multiples; otherwise fall back to a single k-tile.
    k_half = k // 2
    while k_half % tile_kh != 0:
        tile_kh //= 2
    if tile_kh != k_half and (tile_kh % 128 != 0 or k_half % 128 != 0):
        tile_kh = k_half
    m_pad = _round_up(m_pad, tile_m)
    n_pad = _round_up(n, tn)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    packed = qt.packed
    scales = qt.scales.astype(jnp.float32)
    zps = qt.zero_points.astype(jnp.float32)
    if n_pad != n:
        packed = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad - n))
        zps = jnp.pad(zps, (0, n_pad - n))

    out = _int4_matmul_padded(
        x2, packed, scales, zps,
        tile_m=tile_m,
        tile_n=tn,
        tile_kh=tile_kh,
        compute_dtype=compute_dtype,
        out_dtype=out_dtype,
        interpret=interpret,
    )
    return out[:m, :n].reshape(*lead, n)


def quantized_linear(x, qt: QuantizedTensor, **kw):
    """Alias with the reference's forward semantics (`python/module.py:100`)."""
    return int4_matmul(x, qt, **kw)


# ---------------------------------------------------------------------------
# per_group granularity kernel
# ---------------------------------------------------------------------------
#
# Production INT4 uses finer-than-row scales: one (scale, zp) per contiguous
# `group_size` input columns of each row. The scale varies along the
# *contraction* dimension, so it cannot be applied after one big dot.
#
# Round-2 shipped the obvious structure — one MXU dot per (half, group) with
# the group's scale applied to the [TM, TN] f32 partial — and it measured
# 1.6-2.6x slower than per_row: 2*G skinny dots (contraction = group_size)
# serialize the MXU, and 2*G broadcast-rescale passes over the accumulator
# serialize the VPU. (A fori_loop that affine-dequantizes group slices into
# a VMEM scratch tile was tried next; its dynamic lane-offset scratch WRITES
# made Mosaic allocate ~45 bytes of stack per scratch element — 92 MB at
# tile_n=512 — so it never fit either.)
#
# Round-3 structure — fully static, no scratch, no dynamic offsets: expand
# the per-(row, group) scales to per-(row, column) matrices ON THE MXU with
# a constant 0/1 selection matrix E[g, c] = (c // group_size == g)
# (round 5 re-tested a no-expansion variant — static lane-aligned group
# blocks dequantized with [TN, 1]-broadcast affine coefficients — and it
# measured 15-18% SLOWER (up 227 vs 194 us, device_bw_pg_r5.json) and
# failed to compile at tile_n >= 384; the expansion form stays):
#
#   A   = s_blk  @ E     (each output element selects exactly one scale ->
#   Z   = zp_blk @ E      the dot is EXACT: one nonzero product per column)
#   wd_lo = A_lo * (q_lo - Z_lo)
#   wd_hi = A_hi * (vhi/16 + (8 - Z_hi))        == s * (q_hi - zp)
#
# then ONE fat full-K/2 MXU dot per half — identical DMA and MXU shape to
# the per_row kernel; the expansions are [TN, G/2] x [G/2, K/2] flyweights.
# (q - zp) and (vhi/16 + 8 - zp) are exact in bfloat16 (integers / 1/16
# multiples within +-15), so the dequant rounds ONCE — an `A*q - (A*zp)`
# form rounds twice with cancellation and measured ~3% per-weight error.
# Numerics match "dequantize to compute_dtype, then matmul" (the golden-
# reference formulation).
#
# Constraints: group_size % 128 == 0 (static lane slices) and
# group_size | K/2 (groups never straddle the planar lo/hi halves).


def _int4_group_kernel(
    x_ref,        # [TM, K]
    w_ref,        # [TN, K/2] u8 planar (single k-tile)
    slo_ref,      # [TN, Gh] f32 — lo-half scales
    zlo_ref,      # [TN, Gh] f32 — lo-half zero-points (integer-valued)
    shi16_ref,    # [TN, Gh] f32 — hi-half scales / 16 (exact exponent shift)
    chi_ref,      # [TN, Gh] f32 — hi-half 128 - 16*zp (integer-valued)
    e_ref,        # [Gh, K/2] f32 — 0/1 group->column selection matrix
    o_ref,        # [TM, TN]
    *,
    k_half: int,
    compute_dtype,
):
    cd = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    edims = (((1,), (0,)), ((), ()))
    e = e_ref[...].astype(cd)

    def expand(ref):
        return jax.lax.dot_general(
            ref[...].astype(cd), e, edims, preferred_element_type=jnp.float32
        ).astype(cd)

    p = w_ref[...]
    dims = (((1,), (1,)), ((), ()))

    # Each half runs expand -> dequant -> dot to completion before the other
    # half's temporaries materialize: the [TN, K/2] compute-dtype arrays are
    # the VMEM hog, and halving the peak live set is what lets wider tiles
    # fit (~16 MB/core total).
    q_lo = (p & 0x0F).astype(jnp.int8).astype(cd)
    wd_lo = expand(slo_ref) * (q_lo - expand(zlo_ref))  # (q - zp) exact in cd
    acc = jax.lax.dot_general(
        x_ref[:, :k_half].astype(cd), wd_lo, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )

    # hi half: vhi = 16*(q_hi - 8) (planar XOR-8 byte), so
    #   s*(q - zp) = (s/16) * (vhi + (128 - 16*zp))
    # with vhi + c integer multiples of 16 in [-240, 240] — exact in bf16 —
    # and s/16 an exact exponent shift. Both constants fold into the tiny
    # [TN, Gh] pre-expansion operands, so the big-array work is one add and
    # one multiply (vs mul+add+sub+mul in the round-3 form).
    vhi = pltpu.bitcast(p & 0xF0, jnp.int8).astype(cd)
    wd_hi = expand(shi16_ref) * (vhi + expand(chi_ref))
    acc += jax.lax.dot_general(
        x_ref[:, k_half:].astype(cd), wd_hi, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    o_ref[...] = acc.astype(o_ref.dtype)


def _pg_scale_operands(scales, zps, k_half, group_size):
    """Split per-group scale/zp [..., N, G] into the kernel's pre-expansion
    operands: (s_lo, zp_lo, s_hi/16, 128 - 16*zp_hi) plus the 0/1
    group->column expansion matrix. The hi-half constants are folded here so
    the kernel's big-array dequant is one add + one multiply (see
    `_int4_group_kernel`); both folds are exact (exponent shift / small
    integers).

    The group-count dim is padded to a multiple of 8 (sublane alignment):
    Mosaic 500s on expand-dots whose contraction dim is an odd size like 43
    (= 5504/128, the flagship down-projection). Padded rows of E are all
    zero, so they select nothing — the expansion stays exact."""
    gh = k_half // group_size
    gh_pad = _round_up(gh, 8)
    s = scales.astype(jnp.float32)
    z = zps.astype(jnp.float32)
    eye = (
        jnp.arange(k_half, dtype=jnp.int32)[None, :] // group_size
        == jnp.arange(gh_pad, dtype=jnp.int32)[:, None]
    ).astype(jnp.float32)
    pad = [(0, 0)] * (s.ndim - 1) + [(0, gh_pad - gh)]
    slo, zlo = jnp.pad(s[..., :gh], pad), jnp.pad(z[..., :gh], pad)
    shi16 = jnp.pad(s[..., gh:] * 0.0625, pad)
    chi = jnp.pad(128.0 - 16.0 * z[..., gh:], pad)
    return slo, zlo, shi16, chi, eye


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_n", "group_size", "compute_dtype", "out_dtype", "interpret",
    ),
)
def _int4_group_padded(
    x, packed, scales, zps,
    *, tile_m, tile_n, group_size, compute_dtype, out_dtype, interpret,
):
    m, k = x.shape
    n, k_half = packed.shape
    slo, zlo, shi16, chi, eye = _pg_scale_operands(
        scales, zps, k_half, group_size
    )
    gh = slo.shape[-1]
    grid = (m // tile_m, n // tile_n)
    kernel = functools.partial(
        _int4_group_kernel, k_half=k_half, compute_dtype=compute_dtype
    )
    sblk = lambda: pl.BlockSpec(  # noqa: E731
        (tile_n, gh), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k_half), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            sblk(), sblk(), sblk(), sblk(),
            pl.BlockSpec((gh, k_half), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, packed, slo, zlo, shi16, chi, eye)


# --- per_group, batched-partials structure (layout="planar_groups") -------
#
# Round-5 redesign that finally closes the per-group/per-row gap (VERDICT r2
# item 3: target <= 1.15x per_row; the expansion-dot kernel above measures
# 2.6-2.9x). Key identity: the group scale applies to a PARTIAL DOT, not to
# the weights —
#
#   y[m,n] = sum_g s[n,g] * (sum_{c in g} q[n,c] x[m,c])
#          + sum_g c[n,g] * (sum_{c in g} x[m,c])
#
# with c folding the zero-point (lo half: -s*zp; hi half, vhi = 16*(q-8)
# planar XOR-8 bytes: s*(8-zp), and the P multiplier s/16 — exact exponent
# shift). So the kernel never materializes dequantized or scale-expanded
# [TN, K/2] arrays at all: raw nibbles (exact in bf16) go straight into one
# MXU dot per group — a dot_general with the group axis as a BATCH dim —
# and the [Gh, TM, TN] f32 partials get one tiny scale-combine. MXU
# tile-pass count is IDENTICAL to the per_row kernel (the fused big dot
# internally steps the contraction in 128-chunks anyway); what this removes
# vs the expansion-dot design is 4 matmul-sized expansion passes + 2
# dequant passes per weight tile. Measured (device-trace, m=8): up-link
# 62.4 us vs per_row 57.9 (1.08x) and pg-expansion 167.0; down-link
# (gh=43) 56.9 vs per_row 56.5 (1.007x) and pg-expansion 163.9.
#
# Mosaic requires dot_general batch dims at operand position 0, so the
# group axis must lead the STORED bytes: layout="planar_groups",
# [Gh, N, gs] (quant.core.planar_to_planar_groups — a per-call transpose
# would re-stream the whole weight). x is passed as two [Gh, M, gs] views
# (one XLA transpose per call, amortized over all N tiles) plus the
# per-group column sums xs for the zero-point term.
#
# Compile-time trap (measured): tile_n=128 sends Mosaic into a pathological
# compile (535 s at 86 grid columns vs 16 s for the same work at
# tile_n=256); the tile picker floors tile_n at 256.


def _int4_group_bp_kernel(
    xlo_ref,      # [Gh, TM, gs] x, lo half, group-major
    xhi_ref,      # [Gh, TM, gs] x, hi half
    w3_ref,       # [Gh, TN, gs] u8 planar_groups bytes
    a_ref,        # [2*Gh, TN] f32 — P multipliers: rows [0,Gh) = s_lo,
                  #   rows [Gh, 2Gh) = s_hi/16
    xs_ref,       # [TM, Gc] f32 — per-group column sums of x (lo then hi,
                  #   zero-padded to Gc lanes)
    c_ref,        # [Gc, TN] f32 — zp/constant fold: -s*zp (lo), s*(8-zp) (hi)
    o_ref,        # [TM, TN]
    *,
    compute_dtype,
):
    cd = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    gh = w3_ref.shape[0]
    p3 = w3_ref[...]
    dims = (((2,), (2,)), ((0,), (0,)))
    acc = jax.lax.dot_general(
        xs_ref[...], c_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # Halves sequenced: only one [Gh, TM, TN] f32 partial is live at a time.
    q3 = (p3 & 0x0F).astype(jnp.int8).astype(cd)
    p_lo = jax.lax.dot_general(
        xlo_ref[...].astype(cd), q3, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )  # [Gh, TM, TN]
    acc += (a_ref[0:gh][:, None, :] * p_lo).sum(0)
    v3 = pltpu.bitcast(p3 & 0xF0, jnp.int8).astype(cd)
    p_hi = jax.lax.dot_general(
        xhi_ref[...].astype(cd), v3, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    acc += (a_ref[gh : 2 * gh][:, None, :] * p_hi).sum(0)
    o_ref[...] = acc.astype(o_ref.dtype)


def _bp_scale_operands(scales, zps, gh):
    """(a [2Gh, N], c [Gc, N]) from per-group scale/zp [N, 2Gh] f32.

    Both folds are exact: s/16 is an exponent shift; zp and (8 - zp) are
    small integers multiplied in f32."""
    s = scales.astype(jnp.float32)
    z = zps.astype(jnp.float32)
    a = jnp.concatenate(
        [jnp.swapaxes(s[..., :gh], -1, -2),
         jnp.swapaxes(s[..., gh:] * 0.0625, -1, -2)], axis=-2
    )
    c = jnp.concatenate(
        [jnp.swapaxes(-s[..., :gh] * z[..., :gh], -1, -2),
         jnp.swapaxes(s[..., gh:] * (8.0 - z[..., gh:]), -1, -2)], axis=-2
    )
    gc = _round_up(2 * gh, 128)
    pad = [(0, 0)] * (c.ndim - 2) + [(0, gc - 2 * gh), (0, 0)]
    return a, jnp.pad(c, pad)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_n", "group_size", "compute_dtype", "out_dtype",
        "interpret",
    ),
)
def _int4_group_bp_padded(
    x, packed3, scales, zps,
    *, tile_m, tile_n, group_size, compute_dtype, out_dtype, interpret,
):
    m, k = x.shape
    gh, n, gs = packed3.shape
    k_half = gh * gs
    a, c = _bp_scale_operands(scales, zps, gh)
    gc = c.shape[-2]
    xf = x.astype(jnp.float32)
    xs = jnp.zeros((m, gc), jnp.float32)
    xs = xs.at[:, : 2 * gh].set(xf.reshape(m, 2 * gh, gs).sum(-1))
    xlo = jnp.moveaxis(x[:, :k_half].reshape(m, gh, gs), 1, 0)
    xhi = jnp.moveaxis(x[:, k_half:].reshape(m, gh, gs), 1, 0)
    kernel = functools.partial(_int4_group_bp_kernel, compute_dtype=compute_dtype)
    grid = (m // tile_m, n // tile_n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gh, tile_m, gs), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_m, gs), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_n, gs), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * gh, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, gc), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gc, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xlo, xhi, packed3, a, xs, c)


def _per_group_bp(x, qt, *, tile_n, compute_dtype, out_dtype, interpret):
    gs = qt.group_size
    n, k = qt.out_dim, qt.in_dim
    k_half = k // 2
    gh = k_half // gs
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    m_pad = max(_round_up(m, 8), 8)
    tile_m = m_pad if m_pad <= 128 else 128
    cd_b = 4 if compute_dtype == jnp.float32 else 2
    gc = _round_up(2 * gh, 128)
    tn = tile_n or min(512, _round_up(n, 256))

    def ws(tm, tn_):
        return (
            tm * k * cd_b              # xlo+xhi blocks
            + tn_ * k_half             # packed w3 block (u8)
            + 2 * tn_ * k_half * cd_b  # q3/v3 casts (peak: both halves)
            + 2 * gh * tm * tn_ * 4    # partials (sequenced; x2 headroom)
            + (2 * gh + gc) * tn_ * 4  # a + c blocks
            + tm * (gc + tn_) * 4      # xs + out
        )

    if tile_n is None:
        # tile_n floor 256: tile_n=128 triggers the pathological Mosaic
        # compile documented above. Then halve tile_m (8-sublane aligned).
        budget = 14_000_000
        while ws(tile_m, tn) > budget and tn > 256:
            tn = max(256, tn // 2 // 256 * 256)
        while ws(tile_m, tn) > budget and tile_m >= 16:
            tile_m = max(8, _round_up(tile_m // 2, 8))
    m_pad = _round_up(m_pad, tile_m)
    n_pad = _round_up(n, tn)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    packed3, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed3 = jnp.pad(packed3, ((0, 0), (0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, n_pad - n), (0, 0)))
        zps = jnp.pad(zps, ((0, n_pad - n), (0, 0)))
    out = _int4_group_bp_padded(
        x2, packed3, scales.astype(jnp.float32), zps.astype(jnp.float32),
        tile_m=tile_m, tile_n=tn, group_size=gs,
        compute_dtype=compute_dtype, out_dtype=out_dtype, interpret=interpret,
    )
    return out[:m, :n].reshape(*lead, n)


# --- per_group w4a8: batched partials on the integer MXU ------------------
#
# Same structure as _int4_group_bp_kernel with the w4a8 contract of
# int4_matmul_a8 (dynamic per-row symmetric int8 activations): int8 x int8
# batched dots produce EXACT int32 partials (|P| <= 127*15*gs and
# 127*128*gs for the vhi half — both < 2^24, so the int32->f32 cast is
# exact), group scales and the zero-point fold apply in f32, and the
# per-row activation scale multiplies the final accumulator. Numerics ==
# "quantize activations to int8, dequantize weights, matmul exactly".


def _int4_group_bp_a8_kernel(
    xlo_ref,      # [Gh, TM, gs] i8 quantized x, lo half
    xhi_ref,      # [Gh, TM, gs] i8 quantized x, hi half
    w3_ref,       # [Gh, TN, gs] u8 planar_groups bytes
    a_ref,        # [2*Gh, TN] f32 P multipliers (s_lo; s_hi/16)
    xs_ref,       # [TM, Gc] f32 per-group column sums of xq (exact ints)
    c_ref,        # [Gc, TN] f32 zp/constant fold
    sx_ref,       # [TM, 1] f32 activation scales
    o_ref,        # [TM, TN]
):
    gh = w3_ref.shape[0]
    p3 = w3_ref[...]
    dims = (((2,), (2,)), ((0,), (0,)))
    acc = jax.lax.dot_general(
        xs_ref[...], c_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q3 = (p3 & 0x0F).astype(jnp.int8)
    p_lo = jax.lax.dot_general(
        xlo_ref[...], q3, dims, preferred_element_type=jnp.int32,
    )
    acc += (a_ref[0:gh][:, None, :] * p_lo.astype(jnp.float32)).sum(0)
    v3 = pltpu.bitcast(p3 & 0xF0, jnp.int8)
    p_hi = jax.lax.dot_general(
        xhi_ref[...], v3, dims, preferred_element_type=jnp.int32,
    )
    acc += (a_ref[gh : 2 * gh][:, None, :] * p_hi.astype(jnp.float32)).sum(0)
    o_ref[...] = (acc * sx_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_m", "tile_n", "group_size", "out_dtype", "interpret"),
)
def _int4_group_bp_a8_padded(
    x, packed3, scales, zps,
    *, tile_m, tile_n, group_size, out_dtype, interpret,
):
    m, k = x.shape
    gh, n, gs = packed3.shape
    k_half = gh * gs
    a, c = _bp_scale_operands(scales, zps, gh)
    gc = c.shape[-2]
    # per-row symmetric int8 activation quantization (int4_matmul_a8's
    # contract), on the host op side like the grouped a8 kernel
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    xs = jnp.zeros((m, gc), jnp.float32)
    xs = xs.at[:, : 2 * gh].set(
        xq.astype(jnp.int32).reshape(m, 2 * gh, gs).sum(-1).astype(jnp.float32)
    )
    xlo = jnp.moveaxis(xq[:, :k_half].reshape(m, gh, gs), 1, 0)
    xhi = jnp.moveaxis(xq[:, k_half:].reshape(m, gh, gs), 1, 0)
    grid = (m // tile_m, n // tile_n)
    return pl.pallas_call(
        _int4_group_bp_a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gh, tile_m, gs), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_m, gs), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_n, gs), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * gh, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, gc), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gc, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xlo, xhi, packed3, a, xs, c, sx)


def int4_matmul_per_group_a8(
    x: jnp.ndarray,
    qt: QuantizedTensor,
    *,
    tile_n: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """w4a8 fused linear for per_group planar_groups weights (batched
    partials on the integer MXU; ~0.5-1% extra activation-quantization
    error for the leaner int8 pipeline, same trade as int4_matmul_a8)."""
    if qt.granularity != "per_group" or qt.layout != "planar_groups":
        raise ValueError("requires per_group + planar_groups weights")
    gs = qt.group_size
    n, k = qt.out_dim, qt.in_dim
    k_half = k // 2
    gh = k_half // gs
    if x.shape[-1] != k:
        raise ValueError(f"x K={x.shape[-1]} != {k}")
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = x.dtype
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    m_pad = max(_round_up(m, 32), 32)  # int8 sublane tile
    tile_m = m_pad if m_pad <= 128 else 128
    gc = _round_up(2 * gh, 128)
    tn = tile_n or min(512, _round_up(n, 256))
    if tile_n is None:
        # VMEM budget; int8 x halves are half the bf16 size. tile_n floors
        # at 256 (Mosaic compile pathology at 128, see the bp comment).
        budget = 14_000_000

        def ws(tm, tn_):
            return (
                tm * k                      # xlo+xhi (i8)
                + tn_ * k_half              # w3 block (u8)
                + 2 * tn_ * k_half          # q3/v3 (i8)
                + 2 * gh * tm * tn_ * 4     # partials (i32, sequenced; x2)
                + (2 * gh + gc) * tn_ * 4
                + tm * (gc + tn_ + 1) * 4
            )

        while ws(tile_m, tn) > budget and tn > 256:
            tn = max(256, tn // 2 // 256 * 256)
        while ws(tile_m, tn) > budget and tile_m >= 64:
            tile_m = max(32, _round_up(tile_m // 2, 32))
    m_pad = _round_up(m_pad, tile_m)
    n_pad = _round_up(n, tn)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    packed3, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed3 = jnp.pad(packed3, ((0, 0), (0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, n_pad - n), (0, 0)))
        zps = jnp.pad(zps, ((0, n_pad - n), (0, 0)))
    out = _int4_group_bp_a8_padded(
        x2, packed3, scales.astype(jnp.float32), zps.astype(jnp.float32),
        tile_m=tile_m, tile_n=tn, group_size=gs,
        out_dtype=out_dtype, interpret=interpret,
    )
    return out[:m, :n].reshape(*lead, n)


def int4_matmul_per_group(
    x: jnp.ndarray,
    qt: QuantizedTensor,
    *,
    tile_n: Optional[int] = None,
    compute_dtype=None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused linear for per_group-quantized weights.

    layout="planar_groups" runs the batched-partials kernel (per_row-speed,
    see above); layout="planar" runs the older expansion-dot kernel."""
    if qt.granularity != "per_group" or qt.layout not in (
        "planar", "planar_groups"
    ):
        raise ValueError("requires per_group + planar/planar_groups weights")
    if qt.layout == "planar_groups":
        if interpret is None:
            interpret = not _on_tpu()
        if compute_dtype is None:
            compute_dtype = (
                jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
            )
        if x.shape[-1] != qt.in_dim:
            raise ValueError(f"x K={x.shape[-1]} != {qt.in_dim}")
        return _per_group_bp(
            x, qt, tile_n=tile_n, compute_dtype=compute_dtype,
            out_dtype=out_dtype or x.dtype, interpret=interpret,
        )
    gs = qt.group_size
    n, k = qt.out_dim, qt.in_dim
    k_half = k // 2
    if gs % 128 != 0 or k_half % gs != 0:
        raise ValueError(
            f"group_size={gs} must be a multiple of 128 dividing K/2={k_half}"
        )
    if x.shape[-1] != k:
        raise ValueError(f"x K={x.shape[-1]} != {k}")
    if interpret is None:
        interpret = not _on_tpu()
    if compute_dtype is None:
        compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    if out_dtype is None:
        out_dtype = x.dtype

    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    m_pad = max(_round_up(m, 8), 8)
    tile_m = m_pad if m_pad <= 256 else 256
    m_pad = _round_up(m_pad, tile_m)
    # The sequenced-halves kernel keeps ~4 [TN, K/2]-sized temporaries live
    # at peak (expand pair + unpacked q + dequantized wd of ONE half); keep
    # TN*K/2 bounded or Mosaic's VMEM spilling makes the remote compile
    # pathological (>25 min observed at [512, 5504] with the round-3 6-live
    # form).
    tn_cap = max(128, (1_600_000 // k_half) // 128 * 128)
    tn = tile_n or min(512, tn_cap, _round_up(n, 128))
    if tile_n is None:
        # Full working-set budget: x block + ~4 compute-dtype temporaries +
        # selection matrix + w block must fit scoped VMEM (~16 MB/core);
        # clamp combos that blow past it (TN floor 64 sublanes, then TM) so
        # prefill-sized TM with a wide TN can never re-create the
        # [512, 5504] pathology.
        gh_pad = _round_up(k_half // gs, 8)
        budget = 16_000_000
        cd_b = 4 if compute_dtype == jnp.float32 else 2

        def ws(tm, tn_):
            return (
                tm * k * cd_b             # x block
                + 4 * tn_ * k_half * cd_b  # expand/dequant temporaries
                + gh_pad * k_half * 4     # selection matrix
                + tn_ * k_half            # packed w block
                + tm * tn_ * 4            # accumulator/out
            )

        # shrink in 128-lane multiples (the out block's lane dim — non-128
        # tile_n values like 192/96 are untested Mosaic territory), then
        # halve tile_m keeping it 8-sublane aligned.
        while ws(tile_m, tn) > budget and tn > 128:
            tn = max(128, tn // 2 // 128 * 128)
        while ws(tile_m, tn) > budget and tile_m >= 16:
            tile_m = max(8, _round_up(tile_m // 2, 8))
        m_pad = _round_up(m_pad, tile_m)
    n_pad = _round_up(n, tn)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    packed, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, n_pad - n), (0, 0)))
        zps = jnp.pad(zps, ((0, n_pad - n), (0, 0)))
    out = _int4_group_padded(
        x2, packed, scales.astype(jnp.float32), zps.astype(jnp.float32),
        tile_m=tile_m, tile_n=tn, group_size=gs,
        compute_dtype=compute_dtype, out_dtype=out_dtype, interpret=interpret,
    )
    return out[:m, :n].reshape(*lead, n)


# ---------------------------------------------------------------------------
# w4a8 "turbo" mode: dynamic int8 activations, pure-integer MXU path
# ---------------------------------------------------------------------------
#
# A different numerical contract than the w4a16 kernel above (activations are
# per-row symmetric-int8 quantized on the fly), in exchange for a leaner
# pipeline: the weight operand needs only u8 masks + one u8->i8 cast (no
# float converts at all), the MXU runs in its int8 mode, and every
# accumulation step is EXACT int32 arithmetic — so the zero-point correction
# can be applied algebraically after the dot with no cancellation error:
#
#   y_q[b,j] = sum_i (q[j,i] - zp_j) xq[b,i]
#            = dot(xq_lo, lo) + (dot(xq_hi, vhi) >> 4) + 8*xsum_hi
#              - zp_j * (xsum_lo + xsum_hi)            (all int32, exact)
#   y[b,j]   = s_j * sx_b * y_q[b,j]
#
# with vhi = 16*(q_hi - 8) straight from the planar XOR-8 byte (see
# pack_planar), and `>> 4` exact because every vhi is a multiple of 16.


def _int4_a8_kernel(
    xq_ref,       # [TM, K] i8    quantized activations
    w_ref,        # [TN, TKH] u8  packed planar
    s_ref,        # [1, TN] f32   weight scales
    z_ref,        # [1, TN] f32   weight zero-points (integer-valued)
    sx_ref,       # [TM, 1] f32   activation scales
    o_ref,        # [TM, TN]
    acc_ref,      # [TM, TN] i32 scratch
    xsum_ref,     # [TM, 1] i32 scratch: sum of xq (lo+hi halves)
    xsumh_ref,    # [TM, 1] i32 scratch: sum of xq hi half only
    *,
    n_k: int,
    k_half: int,
    tile_kh: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xsum_ref[:] = jnp.zeros_like(xsum_ref)
        xsumh_ref[:] = jnp.zeros_like(xsumh_ref)

    p = w_ref[:]
    lo = (p & 0x0F).astype(jnp.int8)
    vhi = pltpu.bitcast(p & 0xF0, jnp.int8)

    if n_k == 1:
        x_lo = xq_ref[:, :k_half]
        x_hi = xq_ref[:, k_half:]
    else:
        off = pl.multiple_of(k * tile_kh, 128)
        x_lo = xq_ref[:, pl.ds(off, tile_kh)]
        x_hi = xq_ref[:, pl.ds(k_half + off, tile_kh)]

    dims = (((1,), (1,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo, dims, preferred_element_type=jnp.int32)
    acc_vhi = jax.lax.dot_general(x_hi, vhi, dims, preferred_element_type=jnp.int32)
    xsl = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    xsh = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True)
    # >> 4 is exact: every vhi value is a multiple of 16.
    acc_ref[:] += acc_lo + (acc_vhi >> 4)
    xsum_ref[:] += xsl + xsh
    xsumh_ref[:] += xsh

    @pl.when(k == n_k - 1)
    def _finish():
        zp = z_ref[0, :][None, :]  # f32, integer-valued
        yq = (
            (acc_ref[:] + 8 * xsumh_ref[:]).astype(jnp.float32)
            - zp * xsum_ref[:].astype(jnp.float32)
        )
        o_ref[:] = (s_ref[0, :][None, :] * sx_ref[:] * yq).astype(o_ref.dtype)


def _int4_a8_fused_kernel(
    x_ref,        # [TM, K] bf16/f32 RAW activations (quantized in-kernel)
    w_ref,        # [TN, TKH] u8  packed planar
    s_ref,        # [1, TN] f32   weight scales
    z_ref,        # [1, TN] f32   weight zero-points (integer-valued)
    o_ref,        # [TM, TN]
    acc_ref,      # [TM, TN] i32 scratch
    xsum_ref,     # [TM, 1] i32 scratch: sum of xq (lo+hi halves)
    xsumh_ref,    # [TM, 1] i32 scratch: sum of xq hi half only
    xq_ref,       # [TM, K] i8 scratch: quantized activations
    sx_ref,       # [TM, 1] f32 scratch: activation scales
    *,
    n_k: int,
    k_half: int,
    tile_kh: int,
):
    """`_int4_a8_kernel` with the dynamic int8 activation quantization fused
    into the kernel prologue. The host path lowers amax/round/cast as
    separate XLA fusions whose fixed per-op dispatch overhead is ~20% of the
    whole link at decode sizes (device_bw.json: module 40.8 us vs kernel
    33.0 at the flagship up-projection); here they ride the same program.
    The quantization math is identical (f32 amax -> sx -> round -> clip).
    """
    kk = pl.program_id(2)

    # Quantize at kk==0 of every (i, j) step — NO cross-j scratch carry: a
    # j==0-only variant (with the n dim demoted to "arbitrary") CRASHED the
    # TPU worker at the flagship shape (round 5; "kernel fault"), so the
    # scratch stays (i, j)-local. The requantize costs ~TM*K VPU per j-tile,
    # which is why the wrapper only fuses on shallow-K (see int4_matmul_a8).
    @pl.when(kk == 0)
    def _init():
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) / 127.0
        sx_ref[:] = sx
        xq_ref[:] = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xsum_ref[:] = jnp.zeros_like(xsum_ref)
        xsumh_ref[:] = jnp.zeros_like(xsumh_ref)

    p = w_ref[:]
    lo = (p & 0x0F).astype(jnp.int8)
    vhi = pltpu.bitcast(p & 0xF0, jnp.int8)

    if n_k == 1:
        x_lo = xq_ref[:, :k_half]
        x_hi = xq_ref[:, k_half:]
    else:
        off = pl.multiple_of(kk * tile_kh, 128)
        x_lo = xq_ref[:, pl.ds(off, tile_kh)]
        x_hi = xq_ref[:, pl.ds(k_half + off, tile_kh)]

    dims = (((1,), (1,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo, dims, preferred_element_type=jnp.int32)
    acc_vhi = jax.lax.dot_general(x_hi, vhi, dims, preferred_element_type=jnp.int32)
    xsl = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    xsh = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True)
    acc_ref[:] += acc_lo + (acc_vhi >> 4)
    xsum_ref[:] += xsl + xsh
    xsumh_ref[:] += xsh

    @pl.when(kk == n_k - 1)
    def _finish():
        zp = z_ref[0, :][None, :]
        yq = (
            (acc_ref[:] + 8 * xsumh_ref[:]).astype(jnp.float32)
            - zp * xsum_ref[:].astype(jnp.float32)
        )
        o_ref[:] = (s_ref[0, :][None, :] * sx_ref[:] * yq).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_m", "tile_n", "tile_kh", "out_dtype", "interpret"),
)
def _int4_a8_fused_padded(
    x, packed, scales, zero_points,
    *, tile_m, tile_n, tile_kh, out_dtype, interpret,
):
    m, k = x.shape
    n, k_half = packed.shape
    n_k = k_half // tile_kh
    grid = (m // tile_m, n // tile_n, n_k)
    kernel = functools.partial(
        _int4_a8_fused_kernel, n_k=n_k, k_half=k_half, tile_kh=tile_kh
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, tile_kh), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m, tile_n), jnp.int32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
            pltpu.VMEM((tile_m, k), jnp.int8),
            pltpu.VMEM((tile_m, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, packed, scales[None, :], zero_points[None, :])


@functools.partial(
    jax.jit,
    static_argnames=("tile_m", "tile_n", "tile_kh", "out_dtype", "interpret"),
)
def _int4_a8_padded(
    xq, sx, packed, scales, zero_points,
    *, tile_m, tile_n, tile_kh, out_dtype, interpret,
):
    m, k = xq.shape
    n, k_half = packed.shape
    n_k = k_half // tile_kh
    grid = (m // tile_m, n // tile_n, n_k)
    kernel = functools.partial(
        _int4_a8_kernel, n_k=n_k, k_half=k_half, tile_kh=tile_kh
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, tile_kh), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m, tile_n), jnp.int32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, packed, scales[None, :], zero_points[None, :], sx)


def int4_matmul_a8(
    x: jnp.ndarray,
    qt: QuantizedTensor,
    *,
    tile_n: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
    fuse_quant: Optional[bool] = None,
) -> jnp.ndarray:
    """w4a8 fused linear: per-row int8 activation quant + integer MXU dots.

    ~0.3-0.5% relative activation-quantization error vs :func:`int4_matmul`;
    use where throughput matters more than the last decimal (the weight
    dequant itself stays exact).

    ``fuse_quant`` moves the activation quantization INTO the Pallas kernel
    (default wherever the raw-x block fits VMEM): the host path's
    amax/round/cast ops are separate XLA fusions whose dispatch overhead is
    ~20% of the link at decode sizes (device_bw.json). Identical math.
    """
    if qt.granularity != "per_row" or qt.layout != "planar":
        raise ValueError("a8 kernel requires per_row + planar weights")
    n, k = qt.out_dim, qt.in_dim
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = x.dtype

    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d

    m_pad = max(_round_up(m, 32), 32)  # i8 sublane tile is 32
    tile_m = m_pad if m_pad <= 256 else 256
    m_pad = _round_up(m_pad, tile_m)
    if fuse_quant is None:
        # Fuse on shallow-K only (measured, device_bw_fusedq.json): at
        # k=4096 the fused prologue saves the host glue (40.75 -> 37.42 us
        # link), but the kernel requantizes per j-tile, so at deep K the VPU
        # cost flips the sign (down-projection k=11008: 33.27 -> 38.75 us).
        # VMEM must also fit the raw-x block + xq scratch.
        x_b = jnp.dtype(x.dtype).itemsize
        fuse_quant = (
            k <= 2 * _SHALLOW_KH
            and tile_m * k * (x_b + 1) <= 4 * 1024 * 1024
        )
    if not fuse_quant:
        # dynamic per-row symmetric int8 activation quantization (host ops)
        x2 = x.reshape(m, k).astype(jnp.float32)
        amax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
        sx = jnp.clip(amax, min=1e-8) / 127.0
        xq = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)
    # Cap the double-buffered weight block at ~8 MB so Mosaic keeps the
    # DMA/compute pipeline: [1024, 5504] blocks (the flagship down
    # projection) are 5.5 MB each and serialize when two don't fit. The
    # target block height is the measured-best per K-depth
    # (benchmark/results/device_bw.json: tn=1024 at the up-projection
    # k_half=2048, tn=384 at the down-projection k_half=5504), restricted
    # to divisors of round_up(n, 128) — a non-divisor tile forces a per-call
    # jnp.pad copy of the whole weight tensor on the decode hot path
    # (measured ~26 us at the flagship shape, more than the tile win).
    # Pre-padding rows at convert time (quant.core.pad_rows) makes the best
    # size a divisor, unlocking it without the copy.
    tn_cap = max(128, (4_194_304 // (k // 2)) // 128 * 128)
    if tile_n is None:
        tn = _best_tile_n(n, k // 2, min(tn_cap, best_tile_n_a8(k // 2)))
    else:
        tn = tile_n
    n_pad = _round_up(n, tn)
    k_half = k // 2
    tile_kh = k_half
    packed, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad - n))
        zps = jnp.pad(zps, (0, n_pad - n))

    if fuse_quant:
        # pass the RAW activations in their original dtype (the kernel
        # upcasts to f32 exactly as the host path would) — padded rows are
        # zeros, quantize to zeros
        xr = x.reshape(m, k)
        if m_pad != m:
            xr = jnp.pad(xr, ((0, m_pad - m), (0, 0)))
        out = _int4_a8_fused_padded(
            xr, packed, scales.astype(jnp.float32), zps.astype(jnp.float32),
            tile_m=tile_m, tile_n=tn, tile_kh=tile_kh,
            out_dtype=out_dtype, interpret=interpret,
        )
        return out[:m, :n].reshape(*lead, n)

    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad - m), (0, 0)))
    out = _int4_a8_padded(
        xq, sx.astype(jnp.float32), packed,
        scales.astype(jnp.float32), zps.astype(jnp.float32),
        tile_m=tile_m, tile_n=tn, tile_kh=tile_kh,
        out_dtype=out_dtype, interpret=interpret,
    )
    return out[:m, :n].reshape(*lead, n)
