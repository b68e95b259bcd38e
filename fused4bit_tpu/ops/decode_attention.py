"""Fused INT4-KV decode attention Pallas kernel (flash-decoding style).

The capability the reference only motivates ("KV cache quantization -> 8x
memory savings", `/root/reference/README.md:112`) taken to its conclusion:
attention that reads the *packed* INT4 KV cache straight from HBM and
dequantizes inside the kernel — the cache is never materialized in bf16, so
long-context decode streams 4x fewer KV bytes (the same argument as the
weight kernel, applied to the other big HBM consumer at decode time).

The cache is SEQUENCE-PAIR-packed (`layers.kv_cache`): a K/V tile arrives as
a [S_tile/2, D=128] u8 block — a full 128-lane VMEM tile (the earlier
pack-along-D layout produced 64-wide blocks that waste half of every DMA;
measured 90 vs 229 GB/s). The low nibbles are the tile's EVEN positions and
the high nibbles (XOR 8) its ODD positions; flash attention is
permutation-invariant over s, so the kernel simply processes the tile's rows
in (evens, odds) order with a causal mask built from each row's true
position.

GQA-aware grid over (batch, kv_head, q_tile, seq_tiles); each program
advances one kv head's group of query heads over one S-tile of the cache
with the standard online-softmax (flash) recurrence in VMEM scratch:

  m'    = max(m, max(s_t));  a = exp(m - m')
  l'    = a*l + sum(exp(s_t - m'))
  acc'  = a*acc + exp(s_t - m') @ v_t

S-tiling keeps VMEM bounded at any context length; query-tiling (<=512 rows
per program) bounds it for any prefill chunk length. Lengths and query
starts arrive via scalar prefetch; tiles entirely past a row's length or the
q-tile's causal future contribute exactly zero (masked / skipped).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "int4_decode_attention", "int4_prefill_attention",
    "paged_int4_decode_attention", "paged_int4_prefill_attention",
]

_NEG_INF = -1e30


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _unpack_codes(p, compute_dtype):
    """Pair-packed [St/2, D] u8 -> integer codes [St, D] in compute_dtype,
    rows ordered (even positions, odd positions). Codes are exact integers
    in [0, 15] (the 0.0625 multiply is an exponent shift), so a
    preferred_element_type=f32 dot over them is exact; the per-position
    affine (scale, zp) is applied AFTER the dot on the score/PV side, where
    scales live as lane-major row vectors — no column-scale blocks (which
    lane-pad 1 -> 128 and both blow VMEM and bound s_tile)."""
    lo = (p & 0x0F).astype(jnp.int8).astype(jnp.float32)
    vhi = pltpu.bitcast(p & 0xF0, jnp.int8).astype(jnp.float32)
    hi = vhi * 0.0625 + 8.0
    return jnp.concatenate([lo, hi], axis=0).astype(compute_dtype)


def _attn_kernel(
    len_ref,      # [2B] i32 (scalar prefetch): [lengths | query starts]
    q_ref,        # [1, 1, QR, D] — QR = QT*G rows, t-major ((t, g) pairs)
    kp_ref,       # [1, 1, St/2, D] u8 pair-packed
    ks_ref,       # [1, 1, 1, St] f32 — k scales, tile-permuted (evens|odds)
    ksz_ref,      # [1, 1, 1, St] f32 — k scale*zp, same order
    vp_ref,       # [1, 1, St/2, D] u8
    vs_ref,       # [1, 1, 1, St] f32
    vz_ref,       # [1, 1, 1, St] f32 — v zero-points (plain, NOT s*z)
    o_ref,        # [1, 1, QR, D]
    m_ref,        # [QR, 1] f32 scratch: running max
    l_ref,        # [QR, 1] f32 scratch: running denom
    acc_ref,      # [QR, D] f32 scratch: running numerator
    *,
    head_dim: int,
    s_tile: int,
    n_s: int,
    g: int,          # query heads per kv head (rows per query position)
    qt_queries: int, # query positions per q-tile (QT)
    batch: int,
    compute_dtype,
):
    b = pl.program_id(0)
    qt = pl.program_id(2)
    t = pl.program_id(3)
    length = len_ref[b]
    qstart = len_ref[batch + b]

    @pl.when(t == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Only tiles overlapping [0, length) AND not entirely in this q-tile's
    # causal future contribute (the second condition halves prefill work).
    q_hi = qstart + (qt + 1) * qt_queries - 1  # last query position in tile
    @pl.when((t * s_tile < length) & (t * s_tile <= q_hi))
    def _tile():
        k_codes = _unpack_codes(kp_ref[0, 0], compute_dtype)  # [St, D]
        q = q_ref[0, 0].astype(compute_dtype)  # [QR, D]
        raw = jax.lax.dot_general(
            q, k_codes, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QR, St]
        qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)  # [QR,1]
        # dequant post-dot:  q . ((c - z) s) = s (q . c) - (s z) (q . 1)
        scores = (raw * ks_ref[0, 0] - qsum * ksz_ref[0, 0]) * (
            1.0 / (head_dim ** 0.5)
        )
        half = s_tile // 2
        # column j's TRUE position: evens then odds of this tile
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        span = t * s_tile + jnp.where(
            col < half, 2 * col, 2 * (col - half) + 1
        )
        # Causal per query: rows are t-major ((query, group) pairs), so row r
        # is the query at position qstart + qt*QT + r//G; it may attend to
        # s <= its position and only to filled entries (s < length).
        qpos = qstart + qt * qt_queries + (
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) // g
        )
        mask = (span <= qpos) & (span < length)
        scores = jnp.where(mask, scores, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)          # [QR, 1]
        p = jnp.exp(scores - m_new)              # [QR, St] f32
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
        v_codes = _unpack_codes(vp_ref[0, 0], compute_dtype)  # [St, D]
        # p @ ((c - z) s) per v-row = (p s_row) @ c - sum(p s_row z_row) . 1
        # ps is rounded to compute_dtype ONCE and that same rounded value
        # feeds BOTH the code dot and the zero-point correction. Round-2
        # computed corr from the unrounded p: the rounding error then
        # multiplied the raw codes c (mean ~zp) instead of the centered
        # (c - z), i.e. got amplified by |z.sum(p s)| / |sum(p s (c-z))|
        # ~ sqrt(S_effective) — the measured 1.1% -> 1.8% rel-err growth
        # from ctx 4k -> 16k (VERDICT r2 item 5). With a consistent ps the
        # error term is 2^-9 * |c - z|: context-independent, identical to
        # the dequantize-then-attend baseline's own bf16 rounding.
        ps = (p * vs_ref[0, 0]).astype(compute_dtype)        # [QR, St]
        pv = jax.lax.dot_general(
            ps, v_codes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        corr = jnp.sum(
            ps.astype(jnp.float32) * vz_ref[0, 0], axis=1, keepdims=True
        )  # [QR, 1]
        acc_ref[:] = alpha * acc_ref[:] + (pv - corr)
        m_ref[:] = m_new

    @pl.when(t == n_s - 1)
    def _finish():
        # Rows whose query tile never saw a valid entry keep l = 0 (possible
        # only for padded query rows, which callers slice off); guard the
        # division so they emit 0, not NaN.
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "s_tile", "n_q", "q_tile", "compute_dtype", "out_dtype", "interpret"
    ),
)
def _attn_call(
    q4, lens_and_starts, kp, ks, ksz, vp, vs, vz,
    *, s_tile, n_q, q_tile, compute_dtype, out_dtype, interpret,
):
    b, h_kv, rows, d = q4.shape
    g = rows // n_q  # query heads per kv head; rows are t-major (T, G)
    s_max = kp.shape[2] * 2
    n_s = s_max // s_tile
    n_qt = n_q // q_tile
    qr = q_tile * g
    kernel = functools.partial(
        _attn_kernel,
        head_dim=d, s_tile=s_tile, n_s=n_s, g=g, qt_queries=q_tile, batch=b,
        compute_dtype=compute_dtype,
    )

    def row():
        # lane-major scale rows: tiny VMEM (8 x St f32), no lane padding
        return pl.BlockSpec(
            (1, 1, 1, s_tile), lambda i, j, qt, t, L: (i, j, 0, t),
            memory_space=pltpu.VMEM,
        )

    def pk():
        return pl.BlockSpec(
            (1, 1, s_tile // 2, d), lambda i, j, qt, t, L: (i, j, t, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h_kv, n_qt, n_s),
        in_specs=[
            pl.BlockSpec((1, 1, qr, d), lambda i, j, qt, t, L: (i, j, qt, 0),
                         memory_space=pltpu.VMEM),
            pk(), row(), row(),
            pk(), row(), row(),
        ],
        out_specs=pl.BlockSpec((1, 1, qr, d), lambda i, j, qt, t, L: (i, j, qt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((qr, 1), jnp.float32),
            pltpu.VMEM((qr, 1), jnp.float32),
            pltpu.VMEM((qr, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_kv, rows, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        lens_and_starts.astype(jnp.int32), q4,
        kp, ks, ksz, vp, vs, vz,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "page", "max_pages", "n_q", "q_tile", "compute_dtype", "out_dtype",
        "interpret",
    ),
)
def _paged_attn_call(
    q4, scalars, kp, ks, ksz, vp, vs, vz,
    *, page, max_pages, n_q, q_tile, compute_dtype, out_dtype, interpret,
):
    """Paged variant of :func:`_attn_call`: same kernel BODY, the page table
    folded into the K/V BlockSpec index_maps via scalar prefetch.

    The grid's sequence dimension walks LOGICAL tiles (tile == page); each
    tile's physical source is ``table[b, t]``, read from the prefetched
    scalar vector by the index_map — the DMA engine performs the page
    gather, block by block. Masks/positions in the body use the logical
    index, so causality and lengths are untouched by paging. Unused table
    entries all point at page 0: consecutive equal block indices are not
    re-fetched by the pipeline, so the parked tail costs ~one page of DMA.

    scalars: [2B + B*max_pages] i32 = [lengths | query starts | page table].
    """
    batch, h_kv, rows, d = q4.shape
    g = rows // n_q
    n_qt = n_q // q_tile
    qr = q_tile * g
    kernel = functools.partial(
        _attn_kernel,
        head_dim=d, s_tile=page, n_s=max_pages, g=g, qt_queries=q_tile,
        batch=batch, compute_dtype=compute_dtype,
    )

    def page_id(i, t, L):
        return L[2 * batch + i * max_pages + t]

    def row():
        # scales arrive pre-gathered to LOGICAL [B, H, 1, S] layout (active
        # content only — gathering per call through the table costs O(B*S),
        # where a full-pool permute would cost O(P*page) per call per layer
        # and scale with pool size, review finding); logical indexing here.
        return pl.BlockSpec(
            (1, 1, 1, page), lambda i, j, qt, t, L: (i, j, 0, t),
            memory_space=pltpu.VMEM,
        )

    def pk():
        # the BIG operands (packed codes) stay page-indirect: this index_map
        # IS the gather, executed by the DMA engine per tile
        return pl.BlockSpec(
            (1, 1, page // 2, d),
            lambda i, j, qt, t, L: (page_id(i, t, L), j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, h_kv, n_qt, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, qr, d), lambda i, j, qt, t, L: (i, j, qt, 0),
                         memory_space=pltpu.VMEM),
            pk(), row(), row(),
            pk(), row(), row(),
        ],
        out_specs=pl.BlockSpec((1, 1, qr, d), lambda i, j, qt, t, L: (i, j, qt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((qr, 1), jnp.float32),
            pltpu.VMEM((qr, 1), jnp.float32),
            pltpu.VMEM((qr, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, h_kv, rows, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        scalars.astype(jnp.int32), q4,
        kp, ks, ksz, vp, vs, vz,
    )


def _paged_operands(cache):
    """Kernel operands: packed code POOLS page-indirect (the index_map does
    that gather), scale planes gathered through the table to logical
    [B, H, 1, S] lane-major rows. Scales are ~12% of the stream at D=128,
    and gathering only table-referenced pages keeps the per-call cost at
    O(active content) instead of O(pool) (review finding)."""
    st = cache.page_size
    table = cache.page_table  # [B, MP]

    def gather(plane):        # [P, H, page] -> [B, H, MP*page]
        g = plane[table]      # [B, MP, H, page]
        b, mp, h, pg = g.shape
        return g.transpose(0, 2, 1, 3).reshape(b, h, mp * pg)

    ks_l, kz_l = gather(cache.k_scale), gather(cache.k_zp)
    vs_l, vz_l = gather(cache.v_scale), gather(cache.v_zp)
    ks = _perm_rows(ks_l, st)
    ksz = _perm_rows(ks_l * kz_l, st)
    vs = _perm_rows(vs_l, st)
    vz = _perm_rows(vz_l, st)
    return (cache.k_pool, ks, ksz, cache.v_pool, vs, vz)


def _paged_scalars(cache, starts):
    return jnp.concatenate([
        cache.lengths.astype(jnp.int32),
        starts.astype(jnp.int32),
        cache.page_table.reshape(-1).astype(jnp.int32),
    ])


def _check_page_lanes(page: int, max_pages: int, interpret: bool) -> None:
    """Mosaic requires the last block dim to be a 128 multiple OR the full
    array dim; the paged kernels' scale-plane blocks are `page` lanes wide
    over a `max_pages * page`-lane plane, so compiled paged attention needs
    ``page_size % 128 == 0`` — except when ``max_pages == 1``, where the
    block IS the full lane extent and any page size lowers. Interpret mode
    (CPU tests) has no such constraint. Raised here, at the wrapper, so the
    failure names the knob instead of surfacing as a Mosaic lowering error
    mid-serving (hit in round 4 with the old page_size=64 default)."""
    if not interpret and page % 128 != 0 and max_pages != 1:
        raise ValueError(
            f"compiled paged attention requires page_size % 128 == 0 "
            f"(got {page} with {max_pages} pages/slot); use page_size=128 "
            f"(the serving default) or run in interpret mode"
        )


def paged_int4_decode_attention(
    q: jnp.ndarray,        # [B, Hq, D] — single decode step (post-RoPE)
    cache,                 # PagedKVCache (lengths INCLUDE the new step)
    *,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Decode attention straight over the paged INT4 pool (no gather)."""
    b, hq, d = q.shape
    h_kv = cache.k_pool.shape[1]
    g = hq // h_kv
    if g * h_kv != hq:
        raise ValueError(f"Hq={hq} not a multiple of Hkv={h_kv}")
    if interpret is None:
        interpret = not _on_tpu()
    _check_page_lanes(cache.page_size, cache.max_pages_per_slot, interpret)
    if out_dtype is None:
        out_dtype = q.dtype
    q4 = q.reshape(b, h_kv, g, d)
    out = _paged_attn_call(
        q4, _paged_scalars(cache, cache.lengths - 1), *_paged_operands(cache),
        page=cache.page_size, max_pages=cache.max_pages_per_slot,
        n_q=1, q_tile=1, compute_dtype=compute_dtype,
        out_dtype=out_dtype, interpret=interpret,
    )
    return out.reshape(b, hq, d)


def paged_int4_prefill_attention(
    q: jnp.ndarray,        # [B, Hq, T, D]
    cache,                 # PagedKVCache (lengths INCLUDE the T new steps)
    starts: jnp.ndarray,   # [B] i32
    *,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Chunked prefill attention over the paged INT4 pool."""
    b, hq, t, d = q.shape
    h_kv = cache.k_pool.shape[1]
    g = hq // h_kv
    if g * h_kv != hq:
        raise ValueError(f"Hq={hq} not a multiple of Hkv={h_kv}")
    if interpret is None:
        interpret = not _on_tpu()
    _check_page_lanes(cache.page_size, cache.max_pages_per_slot, interpret)
    if out_dtype is None:
        out_dtype = q.dtype
    qt = max(1, min(512 // g, t))
    t_pad = _cdiv(t, qt) * qt
    q4 = q.reshape(b, h_kv, g, t, d).transpose(0, 1, 3, 2, 4)
    if t_pad != t:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    q4 = q4.reshape(b, h_kv, t_pad * g, d)
    out = _paged_attn_call(
        q4, _paged_scalars(cache, starts), *_paged_operands(cache),
        page=cache.page_size, max_pages=cache.max_pages_per_slot,
        n_q=t_pad, q_tile=qt, compute_dtype=compute_dtype,
        out_dtype=out_dtype, interpret=interpret,
    )
    out = out.reshape(b, h_kv, t_pad, g, d).transpose(0, 1, 3, 2, 4)
    return out.reshape(b, hq, t_pad, d)[:, :, :t]


def _perm_rows(a, st):
    """[B, H, S] per-position values -> [B, H, 1, S] lane-major rows where
    each s_tile's entries are reordered (evens, odds) to match the kernel's
    column permutation."""
    b, h, s = a.shape
    t = a.reshape(b, h, s // st, st)
    perm = jnp.concatenate([t[..., 0::2], t[..., 1::2]], axis=-1)
    return perm.reshape(b, h, 1, s)


def _cache_operands(cache, st):
    ks = _perm_rows(cache.k_scale, st)
    ksz = _perm_rows(cache.k_scale * cache.k_zp, st)
    vs = _perm_rows(cache.v_scale, st)
    vz = _perm_rows(cache.v_zp, st)  # plain zp: corr pairs with rounded ps
    return (cache.k_packed, ks, ksz, cache.v_packed, vs, vz)


def int4_decode_attention(
    q: jnp.ndarray,        # [B, Hq, D] — single decode step (post-RoPE)
    cache,                 # QuantizedKVCache (lengths INCLUDE the new step)
    *,
    s_tile: int = 1024,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Attention over the packed INT4 KV cache for one decode step.

    Returns [B, Hq, D]. The current step's K/V must already be appended
    (cache index == position; entry `length-1` is the current step, so the
    causal mask is simply `s < length`).
    """
    if hasattr(cache, "page_table"):  # PagedKVCache: page-gathering kernel
        return paged_int4_decode_attention(
            q, cache, compute_dtype=compute_dtype, out_dtype=out_dtype,
            interpret=interpret,
        )
    b, hq, d = q.shape
    h_kv = cache.k_packed.shape[1]
    g = hq // h_kv
    if g * h_kv != hq:
        raise ValueError(f"Hq={hq} not a multiple of Hkv={h_kv}")
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = q.dtype
    s_max = cache.max_seq
    st = min(s_tile, s_max)
    while s_max % st != 0 or st % 2 != 0:
        st //= 2
    q4 = q.reshape(b, h_kv, g, d)
    lens_starts = jnp.concatenate([cache.lengths, cache.lengths - 1])
    out = _attn_call(
        q4, lens_starts, *_cache_operands(cache, st),
        s_tile=st, n_q=1, q_tile=1, compute_dtype=compute_dtype,
        out_dtype=out_dtype, interpret=interpret,
    )
    return out.reshape(b, hq, d)


def int4_prefill_attention(
    q: jnp.ndarray,        # [B, Hq, T, D] — chunk of queries (post-RoPE)
    cache,                 # QuantizedKVCache (lengths INCLUDE the T new steps)
    starts: jnp.ndarray,   # [B] i32 — position of each row's first query
    *,
    s_tile: int = 1024,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Chunked prefill attention over the packed INT4 cache.

    Same flash kernel as decode, with the queries tiled over a grid
    dimension: each program handles QT query positions x G grouped heads
    (QT*G <= 512 rows bounds the VMEM scratch), so ANY chunk length runs
    fused. Per-query causal mask: query t attends to positions
    <= starts[b] + t; s-tiles entirely in a q-tile's causal future are
    skipped.
    Returns [B, Hq, T, D].
    """
    if hasattr(cache, "page_table"):  # PagedKVCache: page-gathering kernel
        return paged_int4_prefill_attention(
            q, cache, starts, compute_dtype=compute_dtype,
            out_dtype=out_dtype, interpret=interpret,
        )
    b, hq, t, d = q.shape
    h_kv = cache.k_packed.shape[1]
    g = hq // h_kv
    if g * h_kv != hq:
        raise ValueError(f"Hq={hq} not a multiple of Hkv={h_kv}")
    if interpret is None:
        interpret = not _on_tpu()
    if out_dtype is None:
        out_dtype = q.dtype
    s_max = cache.max_seq
    st = min(s_tile, s_max)
    while s_max % st != 0 or st % 2 != 0:
        st //= 2
    # Query tiling: QT query positions per program, QT*G rows <= 512.
    qt = max(1, min(512 // g, t))
    t_pad = _cdiv(t, qt) * qt
    # t-major row layout: row r = (query r // G, head r % G)
    q4 = q.reshape(b, h_kv, g, t, d).transpose(0, 1, 3, 2, 4)
    if t_pad != t:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    q4 = q4.reshape(b, h_kv, t_pad * g, d)
    lens_starts = jnp.concatenate(
        [cache.lengths, starts.astype(jnp.int32)]
    )
    out = _attn_call(
        q4, lens_starts, *_cache_operands(cache, st),
        s_tile=st, n_q=t_pad, q_tile=qt, compute_dtype=compute_dtype,
        out_dtype=out_dtype, interpret=interpret,
    )
    out = out.reshape(b, h_kv, t_pad, g, d).transpose(0, 1, 3, 2, 4)
    return out.reshape(b, hq, t_pad, d)[:, :, :t]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)
