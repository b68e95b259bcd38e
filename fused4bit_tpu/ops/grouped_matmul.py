"""Ragged grouped INT4 GEMM Pallas kernel (MoE expert compute).

TPU-native re-design of the reference's fused MoE CUDA kernel
(`/root/reference/csrc/moe_int4_kernel.cu:17-136`). The reference launches one
thread block per expert from a host loop with a `.item()` device sync per
expert (`...cu:112-132`) — and is incorrect for ffn_dim > 256 or multi-token
groups (SURVEY.md §2.1). This kernel implements the *intended* semantics —
``out[t] = x[t] @ dequant(W[expert_of(t)])^T`` over variable-size,
tile-aligned token groups — as a single Pallas launch:

* Tokens arrive sorted by expert with every group padded to a multiple of
  ``tile_m`` (padding rows are zero, so their outputs are exactly zero under
  the centered-dot formulation). The dispatch that produces this layout is
  pure JAX (`fused4bit_tpu.layers.moe.dispatch`).
* A scalar-prefetched ``tile_group_ids`` array maps each m-tile to its expert
  (`pltpu.PrefetchScalarGridSpec`); the weight BlockSpec index_map selects
  that expert's INT4-packed block, so no host loop, no per-expert sync, and
  all (m-tile, n-tile) pairs pipeline through one grid — the reference's
  one-block-per-expert serialization (<= E blocks busy) becomes full-chip
  utilization.
* The dequant math is identical to the linear kernel
  (`fused4bit_tpu.ops.int4_matmul`): planar packing, u8-mask unpack,
  i8->float converts, zero-point pre-subtract, per-row scale post-dot.

Weights: stacked per-expert, per-row quantized, planar layout —
``packed [E, N, K/2] u8``, ``scales/zero_points [E, N] f32``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.core import QuantizedTensor

__all__ = ["grouped_int4_matmul", "grouped_int4_matmul_a8",
           "grouped_int4_matmul_per_group", "grouped_int4_matmul_per_group_a8"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _grouped_kernel(
    gid_ref,      # [num_tiles] i32 (scalar prefetch): m-tile -> expert id
    x_ref,        # [TM, K] — or [T_pad, K] when x_resident (sliced in-kernel)
    w_ref,        # [1, TN, K/2] u8 planar (this tile's expert)
    s_ref,        # [1, 1, TN] f32
    z_ref,        # [1, 1, TN] f32
    o_ref,        # [TM, TN]
    *scratch,     # (qlo_ref, vhi_ref) compute_dtype [TN, K/2] when caching
    k_half: int,
    compute_dtype,
    resident_tile_m: int = 0,
    cache_unpack: bool = False,
):
    def unpack():
        p = w_ref[0]
        zp_col = z_ref[0, 0, :][:, None].astype(compute_dtype)
        qlo = (p & 0x0F).astype(jnp.int8).astype(compute_dtype) - zp_col
        vhi = (p & 0xF0).astype(jnp.int8).astype(compute_dtype) - 16.0 * (
            zp_col - 8.0
        ).astype(compute_dtype)
        return qlo, vhi

    if cache_unpack:
        # (n, m) grids revisit the same expert's weight block on consecutive
        # m-tiles; the dequant VPU work is the dominant non-MXU cost at
        # prefill. Recompute into VMEM scratch only on expert change.
        qlo_ref, vhi_ref = scratch
        i = pl.program_id(1)
        changed = (i == 0) | (gid_ref[i] != gid_ref[jnp.maximum(i - 1, 0)])

        @pl.when(changed)
        def _refresh():
            qlo_s, vhi_s = unpack()
            qlo_ref[...] = qlo_s
            vhi_ref[...] = vhi_s

        qlo = qlo_ref[...]
        vhi = vhi_ref[...]
    else:
        qlo, vhi = unpack()

    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    if resident_tile_m:
        # x_resident mode: the whole token buffer sits in VMEM (constant
        # BlockSpec index); slice this m-tile's rows here. Sublane-dim dynamic
        # offsets are fine on Mosaic (only lane-dim offsets need 128-proofs).
        m = pl.program_id(1)  # m innermost in the (n, m) grid
        xt = x_ref[pl.ds(m * resident_tile_m, resident_tile_m), :]
    else:
        xt = x_ref[...]
    x_lo = xt[:, :k_half].astype(compute_dtype)
    x_hi = xt[:, k_half:].astype(compute_dtype)
    dims = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(
        x_lo, qlo, dims, preferred_element_type=jnp.float32, precision=prec
    ) + 0.0625 * jax.lax.dot_general(
        x_hi, vhi, dims, preferred_element_type=jnp.float32, precision=prec
    )
    o_ref[:] = (s_ref[0, 0, :][None, :] * acc).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_n", "compute_dtype", "out_dtype", "interpret", "mode"
    ),
)
def _grouped_padded(
    x_sorted, tile_group_ids, packed, scales, zps,
    *, tile_m, tile_n, compute_dtype, out_dtype, interpret, mode,
):
    t_pad, k = x_sorted.shape
    e, n, k_half = packed.shape
    num_tiles = t_pad // tile_m

    # Grid-order modes (traffic model in `grouped_int4_matmul`):
    #   x_resident — the whole [T_pad, K] token buffer is pinned in VMEM
    #     (constant BlockSpec index -> fetched once); weights stream exactly
    #     once; output written once. Optimal traffic whenever x fits.
    #   m_inner   — m-tiles innermost: consecutive same-expert tiles hit the
    #     same weight block so weights stream once, but the x tiles re-stream
    #     once per n step.
    #   n_inner   — n-tiles innermost: x streams once, each m-tile re-streams
    #     its expert's weights.
    resident = mode == "x_resident"
    cache_unpack = mode in ("m_inner", "x_resident")  # (n, m) grids only
    kernel = functools.partial(
        _grouped_kernel, k_half=k_half, compute_dtype=compute_dtype,
        resident_tile_m=tile_m if resident else 0,
        cache_unpack=cache_unpack,
    )
    scratch_shapes = (
        [
            pltpu.VMEM((tile_n, k_half), compute_dtype),
            pltpu.VMEM((tile_n, k_half), compute_dtype),
        ]
        if cache_unpack
        else []
    )

    if mode == "n_inner":
        grid = (num_tiles, n // tile_n)
        mi = lambda i, j, g: i  # noqa: E731
        ni = lambda i, j, g: j  # noqa: E731
    else:  # m_inner / x_resident
        grid = (n // tile_n, num_tiles)
        mi = lambda j, i, g: i  # noqa: E731
        ni = lambda j, i, g: j  # noqa: E731

    if resident:
        x_spec = pl.BlockSpec(
            (t_pad, k), lambda *a: (0, 0), memory_space=pltpu.VMEM
        )
    else:
        x_spec = pl.BlockSpec(
            (tile_m, k), lambda *a: (mi(*a), 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec(
                (1, tile_n, k_half),
                lambda *a: (a[-1][mi(*a)], ni(*a), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_n),
                lambda *a: (a[-1][mi(*a)], 0, ni(*a)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_n),
                lambda *a: (a[-1][mi(*a)], 0, ni(*a)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n),
            lambda *a: (mi(*a), ni(*a)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch_shapes,
    )

    flops = 2 * t_pad * n * k
    bytes_accessed = (
        x_sorted.size * x_sorted.dtype.itemsize
        + num_tiles * tile_n * k_half
        + t_pad * n * 4
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(tile_group_ids, x_sorted, packed, scales[:, None, :], zps[:, None, :])


# ---------------------------------------------------------------------------
# k-split accumulate variant: grid (n, m, k-tile), k innermost, f32 VMEM
# accumulator revisited across the k sweep. Requested by the round-1 review
# as the "stop re-streaming weights per m-tile" candidate; measured
# head-to-head against x_resident/m_inner in benchmark/run_moe_benchmark.py.
# Traffic model: out written once (accumulator lives in VMEM across the k
# sweep), x streams once per n step, but each m-tile's k sweep re-fetches its
# expert's (n-strip, k-tile) blocks — weights re-stream per m-tile of the
# same expert, so on weight-dominated geometries x_resident/m_inner wins;
# k-split pays off only when K is too large for a full-K x or weight block.
# ---------------------------------------------------------------------------


def _grouped_ksplit_kernel(
    gid_ref,      # [num_tiles] i32
    xlo_ref,      # [TM, TKH] — low-nibble half columns of this k-tile
    xhi_ref,      # [TM, TKH] — high-nibble half columns
    w_ref,        # [1, TN, TKH] u8 planar slice
    s_ref,        # [1, 1, TN] f32
    z_ref,        # [1, 1, TN] f32
    o_ref,        # [TM, TN]
    acc_ref,      # [TM, TN] f32 scratch
    *,
    num_k: int,
    compute_dtype,
):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = w_ref[0]
    zp_col = z_ref[0, 0, :][:, None].astype(compute_dtype)
    qlo = (p & 0x0F).astype(jnp.int8).astype(compute_dtype) - zp_col
    vhi = (p & 0xF0).astype(jnp.int8).astype(compute_dtype) - 16.0 * (
        zp_col - 8.0
    ).astype(compute_dtype)
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    dims = (((1,), (1,)), ((), ()))
    acc_ref[...] += jax.lax.dot_general(
        xlo_ref[...].astype(compute_dtype), qlo, dims,
        preferred_element_type=jnp.float32, precision=prec,
    ) + 0.0625 * jax.lax.dot_general(
        xhi_ref[...].astype(compute_dtype), vhi, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(kk == num_k - 1)
    def _flush():
        o_ref[...] = (s_ref[0, 0, :][None, :] * acc_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_n", "tile_kh", "compute_dtype", "out_dtype", "interpret"
    ),
)
def _grouped_ksplit_padded(
    x_sorted, tile_group_ids, packed, scales, zps,
    *, tile_m, tile_n, tile_kh, compute_dtype, out_dtype, interpret,
):
    t_pad, k = x_sorted.shape
    e, n, k_half = packed.shape
    num_tiles = t_pad // tile_m
    num_k = k_half // tile_kh
    x_lo = x_sorted[:, :k_half]
    x_hi = x_sorted[:, k_half:]

    kernel = functools.partial(
        _grouped_ksplit_kernel, num_k=num_k, compute_dtype=compute_dtype
    )
    grid = (n // tile_n, num_tiles, num_k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, tile_kh), lambda j, i, kk, g: (i, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_m, tile_kh), lambda j, i, kk, g: (i, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_n, tile_kh), lambda j, i, kk, g: (g[i], j, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_n), lambda j, i, kk, g: (g[i], 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_n), lambda j, i, kk, g: (g[i], 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda j, i, kk, g: (i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), out_dtype),
        interpret=interpret,
    )(tile_group_ids, x_lo, x_hi, packed, scales[:, None, :], zps[:, None, :])


# VMEM working-set budget (bytes) for tile selection; v5e has ~16 MB more or
# less fully available to Pallas — leave headroom for double buffering and
# the compiler's own scratch.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_mode_and_tile_n(t_pad, k, n_pad, e, x_itemsize, tile_m, tile_n, mode):
    """Pick the execution mode and tile_n minimizing modeled HBM traffic.

    Traffic per mode (W = packed bytes = E*N*K/2, X = t_pad*K*x_itemsize):
      x_resident: W + X            (requires X + 2*TN*K/2 <= VMEM budget)
      m_inner:    W + X*(N/TN)
      n_inner:    X + (t_pad/TM)*(W/E)   (each m-tile streams its expert)
    """
    k_half = k // 2
    x_bytes = t_pad * k * x_itemsize
    w_bytes = e * n_pad * k_half

    def tn_candidates():
        cands = []
        for c in (2048, 1024, 512, 256, 128):
            if c <= n_pad and n_pad % c == 0:
                cands.append(c)
        return cands or [min(512, n_pad)]

    if mode is None:
        # largest tile_n whose double-buffered weight tile + x tile + the
        # dequant-cache scratch (2 * TN * K/2 * compute itemsize) fits
        fits = [
            c for c in tn_candidates()
            if 2 * c * k_half * (1 + x_itemsize)
            + 2 * tile_m * k * x_itemsize + 2 * tile_m * c * 4
            <= _VMEM_BUDGET
        ]
        tn_stream = fits[0] if fits else tn_candidates()[-1]
        num_tiles = t_pad // tile_m
        # n_inner's modeled weight traffic is num_tiles * (W/E); x_resident/
        # m_inner stream ~W once but pay scratch/dedupe passes that DOMINATE
        # at every measured size: device-trace at Mixtral geometry
        # (mode_crossover.json + mixtral_sweep_device.json) shows n_inner
        # winning from 10 tiles/8 experts (0.63 vs 1.25 ms, 2x) through 24
        # tiles (1.50 vs 2.03) up to 33 tiles at T=2048 prefill (3.53 vs
        # 4.26) — i.e. even at 4.1x the modeled weight bytes. Gate on the
        # modeled-traffic RATIO (ADVICE r4): inside the measured envelope
        # (<= 4x) pick n_inner outright; beyond it fall back to the traffic
        # model, where the measured ~1.2x win at ratio 4 implies a real
        # crossover somewhere past ratio ~5.
        n_inner_traffic = num_tiles * (w_bytes // e)
        if n_inner_traffic <= 4 * (w_bytes + x_bytes):
            mode = "n_inner"
        else:
            resident_ok = (
                x_bytes
                + 2 * tn_stream * k_half * (1 + x_itemsize)
                + 2 * tile_m * tn_stream * 4
                <= _VMEM_BUDGET
            )
            if resident_ok:
                mode = "x_resident"
            else:
                t_m = w_bytes + x_bytes * (n_pad // tn_stream)
                mode = "m_inner" if t_m <= n_inner_traffic + x_bytes else "n_inner"
        tile_n = tile_n or tn_stream
    tile_n = tile_n or 512
    return mode, tile_n


def grouped_int4_matmul(
    x_sorted: jnp.ndarray,
    tile_group_ids: jnp.ndarray,
    qt: QuantizedTensor,
    *,
    tile_m: int = 64,
    tile_n: Optional[int] = None,
    compute_dtype=None,
    out_dtype=None,
    interpret: Optional[bool] = None,
    mode: Optional[str] = None,
) -> jnp.ndarray:
    """Grouped ``x @ dequant(W[g])^T`` over tile-aligned token groups.

    Args:
      x_sorted: [T_pad, K] tokens sorted by expert; each expert's group is
        padded with zero rows to a multiple of ``tile_m`` (T_pad static).
      tile_group_ids: [T_pad // tile_m] i32 — expert id of each m-tile.
      qt: stacked per-expert weights [E, N, K], per_row, planar layout.
      mode: None (auto by traffic model) | "x_resident" | "m_inner" |
        "n_inner" | "ksplit". x_resident pins the whole token buffer in VMEM
        so weights, activations, and output each stream exactly once — the
        memory-bound optimum whenever x fits (~up to T_pad*K*2 <= ~8 MB).
    Returns [T_pad, N].
    """
    if qt.granularity != "per_row":
        raise NotImplementedError("grouped kernel requires per_row scales")
    if qt.layout != "planar":
        raise ValueError("grouped kernel requires the planar layout")
    if len(qt.shape) != 3:
        raise ValueError(f"expected stacked [E, N, K] weights, got {qt.shape}")

    e, n, k = qt.shape
    t_pad = x_sorted.shape[0]
    if x_sorted.shape[1] != k:
        raise ValueError(f"x K={x_sorted.shape[1]} != weight K={k}")
    if t_pad % tile_m != 0:
        raise ValueError(f"T_pad={t_pad} not a multiple of tile_m={tile_m}")
    if interpret is None:
        interpret = not _on_tpu()
    if compute_dtype is None:
        compute_dtype = (
            jnp.float32 if x_sorted.dtype == jnp.float32 else jnp.bfloat16
        )
    if out_dtype is None:
        out_dtype = x_sorted.dtype

    mode, tn = _pick_mode_and_tile_n(
        t_pad, k, _round_up(n, tile_n or 128), e,
        x_sorted.dtype.itemsize, tile_m, tile_n, mode,
    )
    n_pad = _round_up(n, tn)
    packed, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed = jnp.pad(packed, ((0, 0), (0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - n)))
        zps = jnp.pad(zps, ((0, 0), (0, n_pad - n)))

    if mode == "ksplit":
        k_half = k // 2
        tile_kh = max(128, min(1024, k_half))
        while k_half % tile_kh != 0:
            tile_kh //= 2
        out = _grouped_ksplit_padded(
            x_sorted, tile_group_ids.astype(jnp.int32), packed,
            scales.astype(jnp.float32), zps.astype(jnp.float32),
            tile_m=tile_m, tile_n=tn, tile_kh=tile_kh,
            compute_dtype=compute_dtype, out_dtype=out_dtype,
            interpret=interpret,
        )
    else:
        out = _grouped_padded(
            x_sorted, tile_group_ids.astype(jnp.int32), packed,
            scales.astype(jnp.float32), zps.astype(jnp.float32),
            tile_m=tile_m, tile_n=tn,
            compute_dtype=compute_dtype, out_dtype=out_dtype,
            interpret=interpret, mode=mode,
        )
    return out[:, :n]


# ---------------------------------------------------------------------------
# w4a8 "turbo" grouped mode: int8 activations, pure-integer MXU path
# (same numerics as ops.int4_matmul.int4_matmul_a8 — exact int32
# accumulation, zero-point corrected algebraically after the dot)
# ---------------------------------------------------------------------------


def _grouped_a8_kernel(
    gid_ref,      # [num_tiles] i32 (scalar prefetch)
    xq_ref,       # [TM, K] i8
    sx_ref,       # [TM, 1] f32
    w_ref,        # [1, TN, K/2] u8 planar
    s_ref,        # [1, 1, TN] f32
    z_ref,        # [1, 1, TN] f32
    o_ref,        # [TM, TN]
    *scratch,     # (lo_ref, vhi_ref) i8 [TN, K/2] when cache_unpack
    k_half: int,
    cache_unpack: bool = False,
):
    if cache_unpack:
        # m_inner grid (n outer, m inner): consecutive m-tiles usually map to
        # the same expert, so the weight block — and its unpack — is
        # redundant VPU work on every revisit. At prefill (T=2048 Mixtral)
        # the unpack alone costs ~2 ms across the grid vs ~1.2 ms of int8
        # MXU dots. Unpack into VMEM scratch only when the expert actually
        # changes (or the n-tile sweep restarts); the DMA layer already
        # skips the re-fetch when the block index repeats.
        lo_ref, vhi_ref = scratch
        i = pl.program_id(1)
        changed = (i == 0) | (gid_ref[i] != gid_ref[jnp.maximum(i - 1, 0)])

        @pl.when(changed)
        def _unpack():
            p = w_ref[0]
            lo_ref[...] = pltpu.bitcast(p & 0x0F, jnp.int8)
            vhi_ref[...] = pltpu.bitcast(p & 0xF0, jnp.int8)

        lo = lo_ref[...]
        vhi = vhi_ref[...]
    else:
        p = w_ref[0]
        lo = (p & 0x0F).astype(jnp.int8)
        vhi = pltpu.bitcast(p & 0xF0, jnp.int8)

    x_lo = xq_ref[:, :k_half]
    x_hi = xq_ref[:, k_half:]
    dims = (((1,), (1,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo, dims, preferred_element_type=jnp.int32)
    acc_vhi = jax.lax.dot_general(x_hi, vhi, dims, preferred_element_type=jnp.int32)
    xsl = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    xsh = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True)
    zp = z_ref[0, 0, :][None, :]  # f32, integer-valued
    yq = (
        (acc_lo + (acc_vhi >> 4) + 8 * xsh).astype(jnp.float32)
        - zp * (xsl + xsh).astype(jnp.float32)
    )
    o_ref[:] = (s_ref[0, 0, :][None, :] * sx_ref[:] * yq).astype(o_ref.dtype)


def _grouped_a8_fused_kernel(
    gid_ref,      # [num_tiles] i32 (scalar prefetch)
    x_ref,        # [TM, K] bf16/f32 RAW activations (quantized in-kernel)
    w_ref,        # [1, TN, K/2] u8 planar
    s_ref,        # [1, 1, TN] f32
    z_ref,        # [1, 1, TN] f32
    o_ref,        # [TM, TN]
    xq_ref,       # [TM, K] i8 scratch
    sx_ref,       # [TM, 1] f32 scratch
    *scratch,     # (lo_ref, vhi_ref) i8 [TN, K/2] when cache_unpack
    k_half: int,
    cache_unpack: bool = False,
):
    """`_grouped_a8_kernel` with the int8 activation quantization fused into
    the prologue (same trade as ops.int4_matmul._int4_a8_fused_kernel: the
    host-op quantize is separate XLA dispatches worth ~8% of a decode-size
    call; fused only on shallow-K where the per-step requantize VPU cost is
    below the saved glue). Quantization recomputes at every grid step —
    (i, j)-local scratch, no cross-step carry (a cross-j carry variant
    crashed the TPU worker in the linear kernel, round 5)."""
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sxv = jnp.maximum(amax, 1e-8) / 127.0
    sx_ref[:] = sxv
    xq_ref[:] = jnp.clip(jnp.round(xf / sxv), -127, 127).astype(jnp.int8)

    if cache_unpack:
        lo_ref, vhi_ref = scratch
        i = pl.program_id(1)
        changed = (i == 0) | (gid_ref[i] != gid_ref[jnp.maximum(i - 1, 0)])

        @pl.when(changed)
        def _unpack():
            p = w_ref[0]
            lo_ref[...] = pltpu.bitcast(p & 0x0F, jnp.int8)
            vhi_ref[...] = pltpu.bitcast(p & 0xF0, jnp.int8)

        lo = lo_ref[...]
        vhi = vhi_ref[...]
    else:
        p = w_ref[0]
        lo = (p & 0x0F).astype(jnp.int8)
        vhi = pltpu.bitcast(p & 0xF0, jnp.int8)

    x_lo = xq_ref[:, :k_half]
    x_hi = xq_ref[:, k_half:]
    dims = (((1,), (1,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_lo, lo, dims, preferred_element_type=jnp.int32)
    acc_vhi = jax.lax.dot_general(x_hi, vhi, dims, preferred_element_type=jnp.int32)
    xsl = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    xsh = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True)
    zp = z_ref[0, 0, :][None, :]
    yq = (
        (acc_lo + (acc_vhi >> 4) + 8 * xsh).astype(jnp.float32)
        - zp * (xsl + xsh).astype(jnp.float32)
    )
    o_ref[:] = (s_ref[0, 0, :][None, :] * sx_ref[:] * yq).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_m", "tile_n", "out_dtype", "interpret", "m_inner"),
)
def _grouped_a8_fused_padded(
    x, tile_group_ids, packed, scales, zps,
    *, tile_m, tile_n, out_dtype, interpret, m_inner,
):
    t_pad, k = x.shape
    e, n, k_half = packed.shape
    num_tiles = t_pad // tile_m
    kernel = functools.partial(
        _grouped_a8_fused_kernel, k_half=k_half, cache_unpack=m_inner
    )
    scratch_shapes = [
        pltpu.VMEM((tile_m, k), jnp.int8),
        pltpu.VMEM((tile_m, 1), jnp.float32),
    ] + (
        [
            pltpu.VMEM((tile_n, k_half), jnp.int8),
            pltpu.VMEM((tile_n, k_half), jnp.int8),
        ]
        if m_inner
        else []
    )

    if m_inner:
        grid = (n // tile_n, num_tiles)
        mi = lambda j, i, g: i  # noqa: E731
        ni = lambda j, i, g: j  # noqa: E731
    else:
        grid = (num_tiles, n // tile_n)
        mi = lambda i, j, g: i  # noqa: E731
        ni = lambda i, j, g: j  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda *a: (mi(*a), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_n, k_half),
                lambda *a: (a[-1][mi(*a)], ni(*a), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_n),
                lambda *a: (a[-1][mi(*a)], 0, ni(*a)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_n),
                lambda *a: (a[-1][mi(*a)], 0, ni(*a)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda *a: (mi(*a), ni(*a)), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), out_dtype),
        interpret=interpret,
    )(tile_group_ids, x, packed, scales[:, None, :], zps[:, None, :])


@functools.partial(
    jax.jit,
    static_argnames=("tile_m", "tile_n", "out_dtype", "interpret", "m_inner"),
)
def _grouped_a8_padded(
    xq, sx, tile_group_ids, packed, scales, zps,
    *, tile_m, tile_n, out_dtype, interpret, m_inner,
):
    t_pad, k = xq.shape
    e, n, k_half = packed.shape
    num_tiles = t_pad // tile_m
    # Scratch-cached unpack only helps when m is the inner dim (same-expert
    # weight blocks revisited); n_inner changes the block every step.
    kernel = functools.partial(
        _grouped_a8_kernel, k_half=k_half, cache_unpack=m_inner
    )
    scratch_shapes = (
        [
            pltpu.VMEM((tile_n, k_half), jnp.int8),
            pltpu.VMEM((tile_n, k_half), jnp.int8),
        ]
        if m_inner
        else []
    )

    if m_inner:
        grid = (n // tile_n, num_tiles)
        mi = lambda j, i, g: i  # noqa: E731
        ni = lambda j, i, g: j  # noqa: E731
    else:
        grid = (num_tiles, n // tile_n)
        mi = lambda i, j, g: i  # noqa: E731
        ni = lambda i, j, g: j  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda *a: (mi(*a), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda *a: (mi(*a), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_n, k_half),
                lambda *a: (a[-1][mi(*a)], ni(*a), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_n),
                lambda *a: (a[-1][mi(*a)], 0, ni(*a)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_n),
                lambda *a: (a[-1][mi(*a)], 0, ni(*a)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda *a: (mi(*a), ni(*a)), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), out_dtype),
        interpret=interpret,
    )(tile_group_ids, xq, sx, packed, scales[:, None, :], zps[:, None, :])


def grouped_int4_matmul_a8(
    x_sorted: jnp.ndarray,
    tile_group_ids: jnp.ndarray,
    qt: QuantizedTensor,
    *,
    tile_m: int = 32,
    tile_n: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
    fuse_quant: Optional[bool] = None,
) -> jnp.ndarray:
    """w4a8 grouped GEMM: per-row int8 activation quant + integer MXU dots.

    Same contract as :func:`grouped_int4_matmul` with ~0.5% activation-
    quantization error; the weight operand needs only u8 masks + one cast
    (no float converts), and the MXU runs in int8 mode. tile_m must be a
    multiple of 32 (int8 sublane tile).
    """
    if qt.granularity != "per_row" or qt.layout != "planar":
        raise ValueError("a8 grouped kernel requires per_row + planar weights")
    if tile_m % 32 != 0:
        raise ValueError(f"tile_m={tile_m} must be a multiple of 32 for int8")
    e, n, k = qt.shape
    t_pad = x_sorted.shape[0]
    if t_pad % tile_m != 0:
        raise ValueError(f"T_pad={t_pad} not a multiple of tile_m={tile_m}")
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = x_sorted.dtype

    if fuse_quant is None:
        # Unlike the linear kernel (where fusing the quantize in-kernel wins
        # on shallow-K), the grouped kernel's n_inner grid runs MANY steps
        # per m-tile (one per n-tile of the mapped expert, e.g. 14 at
        # Mixtral), re-quantizing the x block each step: measured +9% at
        # decode (T32 w4a8 0.405 -> 0.443 ms, mixtral_sweep_device regen,
        # round 5). Host-op quantize amortizes over the whole call — keep it.
        fuse_quant = False
    if not fuse_quant:
        xf = x_sorted.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sx = jnp.clip(amax, min=1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    # Pick tile_n minimizing m_inner HBM traffic under the VMEM budget:
    # larger n-tiles cut the x re-stream factor (n_pad/tn) — at Mixtral
    # prefill (T=2048) tn=512 re-streams x 28x (528 MB > the 235 MB weight
    # stream) while tn=1024 pays 14x (264 MB); budget terms are the
    # double-buffered weight block + the unpack scratch + x/out blocks.
    k_half = k // 2
    w_bytes = qt.packed.size
    x_bytes = t_pad * k  # i8
    if tile_n is None:
        best = None
        for c in (2048, 1024, 512, 256, 128):
            n_pad_c = _round_up(n, c)
            vmem = 4 * c * k_half + 2 * tile_m * k + 4 * tile_m * c
            if vmem > _VMEM_BUDGET:
                continue
            # traffic model uses PADDED weight bytes: the kernel streams
            # e*n_pad_c*k_half, so a wide tile that pads n heavily (e.g.
            # c=2048 at N=256: 8x) must lose to a pad-free one — with
            # unpadded w_bytes all decode-regime candidates tie (~x_bytes
            # ~ 0) and the widest, most-padded tile won
            traffic = (
                w_bytes * n_pad_c // n + x_bytes * (n_pad_c // c)
            )
            if best is None or traffic < best[0]:
                best = (traffic, c)
        tn = best[1] if best else min(512, _round_up(n, 128))
    else:
        tn = tile_n
    n_pad = _round_up(n, tn)
    packed, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed = jnp.pad(packed, ((0, 0), (0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - n)))
        zps = jnp.pad(zps, ((0, 0), (0, n_pad - n)))

    # m_inner streams weights once (+ x per n-sweep); n_inner streams x once
    # but re-streams each m-tile's expert weights.
    m_inner = (
        w_bytes + x_bytes * (n_pad // tn)
        <= x_bytes + (t_pad // tile_m) * (w_bytes // e)
    )

    if fuse_quant:
        out = _grouped_a8_fused_padded(
            x_sorted, tile_group_ids.astype(jnp.int32), packed,
            scales.astype(jnp.float32), zps.astype(jnp.float32),
            tile_m=tile_m, tile_n=tn, out_dtype=out_dtype,
            interpret=interpret, m_inner=m_inner,
        )
    else:
        out = _grouped_a8_padded(
            xq, sx.astype(jnp.float32), tile_group_ids.astype(jnp.int32),
            packed, scales.astype(jnp.float32), zps.astype(jnp.float32),
            tile_m=tile_m, tile_n=tn, out_dtype=out_dtype,
            interpret=interpret, m_inner=m_inner,
        )
    return out[:, :n]


# ---------------------------------------------------------------------------
# per_group granularity grouped kernel (one dot per (half, group), scale on
# the f32 partial — same scheme as ops.int4_matmul.int4_matmul_per_group)
# ---------------------------------------------------------------------------


def _grouped_pg_kernel(
    gid_ref,      # [num_tiles] i32 (scalar prefetch)
    x_ref,        # [TM, K]
    w_ref,        # [1, TN, K/2] u8 planar
    slo_ref,      # [1, TN, Gh] f32 — this expert's lo-half scales
    zlo_ref,      # [1, TN, Gh] f32 — lo-half zero-points (integer-valued)
    shi16_ref,    # [1, TN, Gh] f32 — hi-half scales / 16
    chi_ref,      # [1, TN, Gh] f32 — hi-half 128 - 16*zp
    e_ref,        # [Gh, K/2] f32 — 0/1 group->column selection matrix
    o_ref,        # [TM, TN]
    *,
    k_half: int,
    compute_dtype,
):
    # Same structure as ops.int4_matmul._int4_group_kernel (see the design
    # comment there): per-group scales are expanded to per-column affine
    # coefficient matrices ON THE MXU via the constant 0/1 selection matrix
    # (exact: one nonzero product per output element), the weight tile is
    # dequantized with fully static elementwise ops, and ONE fat full-K/2
    # dot per half does the matmul — the per_row kernel's DMA and MXU shape.
    # Halves are sequenced (expand -> dequant -> dot each) so their [TN, K/2]
    # temporaries never coexist; the hi-half constants are pre-folded so its
    # dequant is one add + one multiply. The round-2 body (2*G skinny dots +
    # 2*G accumulator rescales) measured 1.6-2.6x slower than per_row; a
    # fori_loop writing a dequant scratch via dynamic lane offsets cost ~45
    # stack bytes per scratch element in Mosaic and OOM'd scoped VMEM. A
    # round-5 static-block-slice variant ([TN, 1]-broadcast affine per
    # lane-aligned group block, no expansion) measured 15-18% SLOWER still
    # (T32 3.13 vs 2.65 ms; device_bw_pg_r5.json) and failed to compile at
    # tile_n >= 384 — the expansion-dot form stays.
    cd = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    edims = (((1,), (0,)), ((), ()))
    e = e_ref[...].astype(cd)

    def expand(ref):
        return jax.lax.dot_general(
            ref[0].astype(cd), e, edims, preferred_element_type=jnp.float32
        ).astype(cd)

    p = w_ref[0]
    dims = (((1,), (1,)), ((), ()))

    q_lo = (p & 0x0F).astype(jnp.int8).astype(cd)
    wd_lo = expand(slo_ref) * (q_lo - expand(zlo_ref))  # (q - zp) exact in cd
    acc = jax.lax.dot_general(
        x_ref[:, :k_half].astype(cd), wd_lo, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )

    vhi = pltpu.bitcast(p & 0xF0, jnp.int8).astype(cd)  # 16*(q_hi - 8)
    wd_hi = expand(shi16_ref) * (vhi + expand(chi_ref))  # == s*(q - zp), exact
    acc += jax.lax.dot_general(
        x_ref[:, k_half:].astype(cd), wd_hi, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_n", "group_size", "compute_dtype", "out_dtype",
        "interpret", "m_inner",
    ),
)
def _grouped_pg_padded(
    x_sorted, tile_group_ids, packed, scales, zps,
    *, tile_m, tile_n, group_size, compute_dtype, out_dtype, interpret, m_inner,
):
    from .int4_matmul import _pg_scale_operands

    t_pad, k = x_sorted.shape
    e, n, k_half = packed.shape
    slo, zlo, shi16, chi, eye = _pg_scale_operands(
        scales, zps, k_half, group_size
    )  # each [E, N, Gh]; eye [Gh, K/2]
    gh = slo.shape[-1]
    num_tiles = t_pad // tile_m
    kernel = functools.partial(
        _grouped_pg_kernel, k_half=k_half, compute_dtype=compute_dtype
    )
    if m_inner:
        grid = (n // tile_n, num_tiles)
        mi = lambda j, i, g: i  # noqa: E731
        ni = lambda j, i, g: j  # noqa: E731
    else:
        grid = (num_tiles, n // tile_n)
        mi = lambda i, j, g: i  # noqa: E731
        ni = lambda i, j, g: j  # noqa: E731

    def sblk():
        return pl.BlockSpec(
            (1, tile_n, gh),
            lambda *a: (a[-1][mi(*a)], ni(*a), 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda *a: (mi(*a), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_n, k_half),
                lambda *a: (a[-1][mi(*a)], ni(*a), 0),
                memory_space=pltpu.VMEM,
            ),
            sblk(), sblk(), sblk(), sblk(),
            pl.BlockSpec((gh, k_half), lambda *a: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda *a: (mi(*a), ni(*a)), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), out_dtype),
        interpret=interpret,
    )(tile_group_ids, x_sorted, packed, slo, zlo, shi16, chi, eye)


# --- grouped per_group, batched-partials structure (planar_groups) --------
# Port of ops.int4_matmul's round-5 bp kernel to the expert-grouped case:
# the expert id comes from the scalar-prefetched tile map exactly like the
# per_row grouped kernels; the group axis is a dot_general batch dim over
# the expert's raw nibbles and scales apply to the [Gh, TM, TN] partials.
# See ops/int4_matmul.py `_int4_group_bp_kernel` for the math + measured
# rationale (linear: 1.01-1.08x per_row vs 2.7-2.9x for the expansion form).


def _grouped_pg_bp_kernel(
    gid_ref,      # [num_tiles] i32 (scalar prefetch)
    xlo_ref,      # [Gh, TM, gs]
    xhi_ref,      # [Gh, TM, gs]
    w3_ref,       # [1, Gh, TN, gs] u8 planar_groups bytes (this expert)
    a_ref,        # [1, 2*Gh, TN] f32 P multipliers (s_lo; s_hi/16)
    xs_ref,       # [TM, Gc] f32 per-group column sums of x
    c_ref,        # [1, Gc, TN] f32 zp/constant fold
    o_ref,        # [TM, TN]
    *,
    compute_dtype,
):
    cd = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    gh = w3_ref.shape[1]
    p3 = w3_ref[0]
    a = a_ref[0]
    dims = (((2,), (2,)), ((0,), (0,)))
    acc = jax.lax.dot_general(
        xs_ref[...], c_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    q3 = (p3 & 0x0F).astype(jnp.int8).astype(cd)
    p_lo = jax.lax.dot_general(
        xlo_ref[...].astype(cd), q3, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    acc += (a[0:gh][:, None, :] * p_lo).sum(0)
    v3 = pltpu.bitcast(p3 & 0xF0, jnp.int8).astype(cd)
    p_hi = jax.lax.dot_general(
        xhi_ref[...].astype(cd), v3, dims,
        preferred_element_type=jnp.float32, precision=prec,
    )
    acc += (a[gh : 2 * gh][:, None, :] * p_hi).sum(0)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_n", "group_size", "compute_dtype", "out_dtype",
        "interpret", "m_inner",
    ),
)
def _grouped_pg_bp_padded(
    x_sorted, tile_group_ids, packed3, scales, zps,
    *, tile_m, tile_n, group_size, compute_dtype, out_dtype, interpret, m_inner,
):
    from .int4_matmul import _bp_scale_operands

    t_pad, k = x_sorted.shape
    e, gh, n, gs = packed3.shape
    k_half = gh * gs
    a, c = _bp_scale_operands(scales, zps, gh)  # [E, 2Gh, N], [E, Gc, N]
    gc = c.shape[-2]
    xf = x_sorted.astype(jnp.float32)
    xs = jnp.zeros((t_pad, gc), jnp.float32)
    xs = xs.at[:, : 2 * gh].set(xf.reshape(t_pad, 2 * gh, gs).sum(-1))
    xlo = jnp.moveaxis(x_sorted[:, :k_half].reshape(t_pad, gh, gs), 1, 0)
    xhi = jnp.moveaxis(x_sorted[:, k_half:].reshape(t_pad, gh, gs), 1, 0)
    num_tiles = t_pad // tile_m
    kernel = functools.partial(_grouped_pg_bp_kernel, compute_dtype=compute_dtype)
    if m_inner:
        grid = (n // tile_n, num_tiles)
        mi = lambda j, i, g: i  # noqa: E731
        ni = lambda j, i, g: j  # noqa: E731
    else:
        grid = (num_tiles, n // tile_n)
        mi = lambda i, j, g: i  # noqa: E731
        ni = lambda i, j, g: j  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gh, tile_m, gs), lambda *a_: (0, mi(*a_), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_m, gs), lambda *a_: (0, mi(*a_), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gh, tile_n, gs),
                         lambda *a_: (a_[-1][mi(*a_)], 0, ni(*a_), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * gh, tile_n),
                         lambda *a_: (a_[-1][mi(*a_)], 0, ni(*a_)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, gc), lambda *a_: (mi(*a_), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gc, tile_n),
                         lambda *a_: (a_[-1][mi(*a_)], 0, ni(*a_)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda *a_: (mi(*a_), ni(*a_)),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), out_dtype),
        interpret=interpret,
    )(tile_group_ids, xlo, xhi, packed3, a, xs, c)


def _grouped_pg_bp_a8_kernel(
    gid_ref,      # [num_tiles] i32 (scalar prefetch)
    xlo_ref,      # [Gh, TM, gs] i8 quantized x, lo half
    xhi_ref,      # [Gh, TM, gs] i8
    w3_ref,       # [1, Gh, TN, gs] u8 planar_groups bytes (this expert)
    a_ref,        # [1, 2*Gh, TN] f32
    xs_ref,       # [TM, Gc] f32 per-group column sums of xq
    c_ref,        # [1, Gc, TN] f32
    sx_ref,       # [TM, 1] f32 activation scales
    o_ref,        # [TM, TN]
):
    # w4a8 variant of _grouped_pg_bp_kernel: int8 batched dots -> exact
    # int32 partials (< 2^24, exact in f32), f32 scale-combine, per-row
    # activation scale last (see ops/int4_matmul._int4_group_bp_a8_kernel).
    gh = w3_ref.shape[1]
    p3 = w3_ref[0]
    a = a_ref[0]
    dims = (((2,), (2,)), ((0,), (0,)))
    acc = jax.lax.dot_general(
        xs_ref[...], c_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q3 = (p3 & 0x0F).astype(jnp.int8)
    p_lo = jax.lax.dot_general(
        xlo_ref[...], q3, dims, preferred_element_type=jnp.int32,
    )
    acc += (a[0:gh][:, None, :] * p_lo.astype(jnp.float32)).sum(0)
    v3 = pltpu.bitcast(p3 & 0xF0, jnp.int8)
    p_hi = jax.lax.dot_general(
        xhi_ref[...], v3, dims, preferred_element_type=jnp.int32,
    )
    acc += (a[gh : 2 * gh][:, None, :] * p_hi.astype(jnp.float32)).sum(0)
    o_ref[:] = (acc * sx_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_n", "group_size", "out_dtype", "interpret", "m_inner",
    ),
)
def _grouped_pg_bp_a8_padded(
    x_sorted, tile_group_ids, packed3, scales, zps,
    *, tile_m, tile_n, group_size, out_dtype, interpret, m_inner,
):
    from .int4_matmul import _bp_scale_operands

    t_pad, k = x_sorted.shape
    e, gh, n, gs = packed3.shape
    k_half = gh * gs
    a, c = _bp_scale_operands(scales, zps, gh)
    gc = c.shape[-2]
    xf = x_sorted.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    xs = jnp.zeros((t_pad, gc), jnp.float32)
    xs = xs.at[:, : 2 * gh].set(
        xq.astype(jnp.int32).reshape(t_pad, 2 * gh, gs).sum(-1)
        .astype(jnp.float32)
    )
    xlo = jnp.moveaxis(xq[:, :k_half].reshape(t_pad, gh, gs), 1, 0)
    xhi = jnp.moveaxis(xq[:, k_half:].reshape(t_pad, gh, gs), 1, 0)
    num_tiles = t_pad // tile_m
    if m_inner:
        grid = (n // tile_n, num_tiles)
        mi = lambda j, i, g: i  # noqa: E731
        ni = lambda j, i, g: j  # noqa: E731
    else:
        grid = (num_tiles, n // tile_n)
        mi = lambda i, j, g: i  # noqa: E731
        ni = lambda i, j, g: j  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gh, tile_m, gs), lambda *a_: (0, mi(*a_), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, tile_m, gs), lambda *a_: (0, mi(*a_), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gh, tile_n, gs),
                         lambda *a_: (a_[-1][mi(*a_)], 0, ni(*a_), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * gh, tile_n),
                         lambda *a_: (a_[-1][mi(*a_)], 0, ni(*a_)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, gc), lambda *a_: (mi(*a_), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gc, tile_n),
                         lambda *a_: (a_[-1][mi(*a_)], 0, ni(*a_)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda *a_: (mi(*a_), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda *a_: (mi(*a_), ni(*a_)),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _grouped_pg_bp_a8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), out_dtype),
        interpret=interpret,
    )(tile_group_ids, xlo, xhi, packed3, a, xs, c, sx)


def grouped_int4_matmul_per_group_a8(
    x_sorted: jnp.ndarray,
    tile_group_ids: jnp.ndarray,
    qt: QuantizedTensor,
    *,
    tile_m: int = 64,
    tile_n: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """w4a8 grouped GEMM over per_group planar_groups expert weights
    (batched partials on the integer MXU; int4_matmul_a8's activation
    contract)."""
    if qt.granularity != "per_group" or qt.layout != "planar_groups":
        raise ValueError("requires per_group + planar_groups weights")
    gs = qt.group_size
    e, n, k = qt.shape
    k_half = k // 2
    gh = k_half // gs
    t_pad = x_sorted.shape[0]
    if t_pad % tile_m != 0:
        raise ValueError(f"T_pad={t_pad} not a multiple of tile_m={tile_m}")
    if tile_m % 32 != 0:
        raise ValueError(f"tile_m={tile_m} must be a multiple of 32 (i8 tile)")
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = x_sorted.dtype
    gc = _round_up(2 * gh, 128)
    tn = tile_n or min(512, _round_up(n, 256))
    if tile_n is None:
        budget = 14_000_000

        def ws(tn_):
            return (
                tile_m * k + tn_ * k_half + 2 * tn_ * k_half
                + 2 * gh * tile_m * tn_ * 4
                + (2 * gh + gc) * tn_ * 4 + tile_m * (gc + tn_ + 1) * 4
            )

        while ws(tn) > budget and tn > 256:
            tn = max(256, tn // 2 // 256 * 256)
    n_pad = _round_up(n, tn)
    packed3, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed3 = jnp.pad(packed3, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - n), (0, 0)))
        zps = jnp.pad(zps, ((0, 0), (0, n_pad - n), (0, 0)))
    x_bytes_per_nsweep = t_pad * k  # int8 rows
    m_inner = x_bytes_per_nsweep * (n_pad // tn) <= qt.packed.size
    out = _grouped_pg_bp_a8_padded(
        x_sorted, tile_group_ids.astype(jnp.int32), packed3,
        scales.astype(jnp.float32), zps.astype(jnp.float32),
        tile_m=tile_m, tile_n=tn, group_size=gs,
        out_dtype=out_dtype, interpret=interpret, m_inner=m_inner,
    )
    return out[:, :n]


def _grouped_per_group_bp(
    x_sorted, tile_group_ids, qt,
    *, tile_m, tile_n, compute_dtype, out_dtype, interpret,
):
    gs = qt.group_size
    e, n, k = qt.shape
    k_half = k // 2
    gh = k_half // gs
    gc = _round_up(2 * gh, 128)
    t_pad = x_sorted.shape[0]
    cd_b = 4 if compute_dtype == jnp.float32 else 2
    tn = tile_n or min(512, _round_up(n, 256))
    if tile_n is None:
        # VMEM budget (see _per_group_bp): x halves + w3 + q3/v3 casts +
        # sequenced partials (x2 headroom) + small operands. tile_n floors
        # at 256 — tile_n=128 triggers the pathological Mosaic compile
        # documented in ops/int4_matmul.py.
        budget = 14_000_000

        def ws(tn_):
            return (
                tile_m * k * cd_b
                + tn_ * k_half
                + 2 * tn_ * k_half * cd_b
                + 2 * gh * tile_m * tn_ * 4
                + (2 * gh + gc) * tn_ * 4
                + tile_m * (gc + tn_) * 4
            )

        while ws(tn) > budget and tn > 256:
            tn = max(256, tn // 2 // 256 * 256)
    n_pad = _round_up(n, tn)
    packed3, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed3 = jnp.pad(packed3, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - n), (0, 0)))
        zps = jnp.pad(zps, ((0, 0), (0, n_pad - n), (0, 0)))
    x_bytes_per_nsweep = t_pad * k * x_sorted.dtype.itemsize
    m_inner = x_bytes_per_nsweep * (n_pad // tn) <= qt.packed.size
    out = _grouped_pg_bp_padded(
        x_sorted, tile_group_ids.astype(jnp.int32), packed3,
        scales.astype(jnp.float32), zps.astype(jnp.float32),
        tile_m=tile_m, tile_n=tn, group_size=gs,
        compute_dtype=compute_dtype, out_dtype=out_dtype,
        interpret=interpret, m_inner=m_inner,
    )
    return out[:, :n]


def grouped_int4_matmul_per_group(
    x_sorted: jnp.ndarray,
    tile_group_ids: jnp.ndarray,
    qt: QuantizedTensor,
    *,
    tile_m: int = 64,
    tile_n: Optional[int] = None,
    compute_dtype=None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Grouped GEMM over per_group-quantized stacked expert weights.

    qt: [E, N, K] with per_group granularity (scales/zps [E, N, K/group]);
    group_size must be a multiple of 128 dividing K/2. layout
    "planar_groups" runs the batched-partials kernel (per_row speed);
    "planar" the older expansion-dot kernel.
    """
    if qt.granularity != "per_group" or qt.layout not in (
        "planar", "planar_groups"
    ):
        raise ValueError("requires per_group + planar/planar_groups weights")
    gs = qt.group_size
    e, n, k = qt.shape
    k_half = k // 2
    if gs % 128 != 0 or k_half % gs != 0:
        raise ValueError(
            f"group_size={gs} must be a multiple of 128 dividing K/2={k_half}"
        )
    t_pad = x_sorted.shape[0]
    if t_pad % tile_m != 0:
        raise ValueError(f"T_pad={t_pad} not a multiple of tile_m={tile_m}")
    if interpret is None:
        interpret = not _on_tpu()
    if compute_dtype is None:
        compute_dtype = (
            jnp.float32 if x_sorted.dtype == jnp.float32 else jnp.bfloat16
        )
    if out_dtype is None:
        out_dtype = x_sorted.dtype
    if qt.layout == "planar_groups":
        return _grouped_per_group_bp(
            x_sorted, tile_group_ids, qt, tile_m=tile_m, tile_n=tile_n,
            compute_dtype=compute_dtype, out_dtype=out_dtype,
            interpret=interpret,
        )

    # same working-set cap as int4_matmul_per_group: ~4 [TN, K/2]
    # temporaries live at peak (sequenced halves); TN*K/2 too large makes
    # Mosaic spill VMEM and the remote compile pathological.
    tn_cap = max(128, (1_600_000 // k_half) // 128 * 128)
    tn = tile_n or min(512, tn_cap, _round_up(n, 128))
    if tile_n is None:
        # joint (tile_m-aware) budget, mirroring int4_matmul_per_group: the
        # x block scales with tile_m, so a prefill-sized tile_m with a wide
        # TN must shrink TN (64-sublane floor) to stay under scoped VMEM.
        gh_pad = _round_up(k_half // gs, 8)
        cd_b = 4 if compute_dtype == jnp.float32 else 2
        # shrink in 128-lane multiples only (see int4_matmul_per_group)
        while (
            tile_m * k * cd_b + 4 * tn * k_half * cd_b
            + gh_pad * k_half * 4 + tn * k_half + tile_m * tn * 4
        ) > 16_000_000 and tn > 128:
            tn = max(128, tn // 2 // 128 * 128)
    n_pad = _round_up(n, tn)
    packed, scales, zps = qt.packed, qt.scales, qt.zero_points  # [E,N,G]
    if n_pad != n:
        packed = jnp.pad(packed, ((0, 0), (0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - n), (0, 0)))
        zps = jnp.pad(zps, ((0, 0), (0, n_pad - n), (0, 0)))

    x_bytes_per_nsweep = t_pad * k * x_sorted.dtype.itemsize
    m_inner = x_bytes_per_nsweep * (n_pad // tn) <= qt.packed.size

    out = _grouped_pg_padded(
        x_sorted, tile_group_ids.astype(jnp.int32), packed,
        scales.astype(jnp.float32), zps.astype(jnp.float32),
        tile_m=tile_m, tile_n=tn, group_size=gs,
        compute_dtype=compute_dtype, out_dtype=out_dtype, interpret=interpret,
        m_inner=m_inner,
    )
    return out[:, :n]
