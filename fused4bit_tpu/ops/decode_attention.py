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

__all__ = ["int4_decode_attention", "int4_prefill_attention"]

_NEG_INF = -1e30


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _dequant_pairs(p, ze, se, zo, so, compute_dtype):
    """Pair-packed [St/2, D] u8 -> dense [St, D] with rows ordered
    (even positions, odd positions).

    se/ze (so/zo): [St/2, 1] f32 scale/zp columns for the even (odd)
    positions. Dequantizes in f32 and casts once, matching the golden
    `QuantizedKVCache.dequantize` bit-for-bit.
    """
    lo = (p & 0x0F).astype(jnp.int8).astype(jnp.float32)
    vhi = pltpu.bitcast(p & 0xF0, jnp.int8).astype(jnp.float32)
    hi = vhi * 0.0625 + 8.0
    k_e = (lo - ze) * se
    k_o = (hi - zo) * so
    return jnp.concatenate([k_e, k_o], axis=0).astype(compute_dtype)


def _attn_kernel(
    len_ref,      # [2B] i32 (scalar prefetch): [lengths | query starts]
    q_ref,        # [1, 1, QR, D] — QR = QT*G rows, t-major ((t, g) pairs)
    kp_ref,       # [1, 1, St/2, D] u8 pair-packed
    kse_ref,      # [1, 1, St/2, 1] f32 (even-position scales)
    kze_ref,      # [1, 1, St/2, 1] f32
    kso_ref,      # [1, 1, St/2, 1] f32 (odd-position scales)
    kzo_ref,      # [1, 1, St/2, 1] f32
    vp_ref,       # [1, 1, St/2, D] u8
    vse_ref,      # [1, 1, St/2, 1] f32
    vze_ref,      # [1, 1, St/2, 1] f32
    vso_ref,      # [1, 1, St/2, 1] f32
    vzo_ref,      # [1, 1, St/2, 1] f32
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
        k = _dequant_pairs(
            kp_ref[0, 0], kze_ref[0, 0], kse_ref[0, 0],
            kzo_ref[0, 0], kso_ref[0, 0], compute_dtype,
        )  # [St, D], rows = (evens, odds)
        q = q_ref[0, 0].astype(compute_dtype)  # [QR, D]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (1.0 / (head_dim ** 0.5))  # [QR, St]
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
        v = _dequant_pairs(
            vp_ref[0, 0], vze_ref[0, 0], vse_ref[0, 0],
            vzo_ref[0, 0], vso_ref[0, 0], compute_dtype,
        )  # [St, D], same row permutation as the scores columns
        pv = jax.lax.dot_general(
            p.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = alpha * acc_ref[:] + pv
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
    q4, lens_and_starts, kp, kse, kze, kso, kzo, vp, vse, vze, vso, vzo,
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

    def vec():
        return pl.BlockSpec(
            (1, 1, s_tile // 2, 1), lambda i, j, qt, t, L: (i, j, t, 0),
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
            pk(), vec(), vec(), vec(), vec(),
            pk(), vec(), vec(), vec(), vec(),
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
        kp, kse, kze, kso, kzo, vp, vse, vze, vso, vzo,
    )


def _split_scales(a):
    """[B, H, S] per-position scale/zp -> even/odd [B, H, S/2, 1] columns."""
    return a[:, :, 0::2, None], a[:, :, 1::2, None]


def _cache_operands(cache):
    kse, kso = _split_scales(cache.k_scale)
    kze, kzo = _split_scales(cache.k_zp)
    vse, vso = _split_scales(cache.v_scale)
    vze, vzo = _split_scales(cache.v_zp)
    return (cache.k_packed, kse, kze, kso, kzo,
            cache.v_packed, vse, vze, vso, vzo)


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
        q4, lens_starts, *_cache_operands(cache),
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
        q4, lens_starts, *_cache_operands(cache),
        s_tile=st, n_q=t_pad, q_tile=qt, compute_dtype=compute_dtype,
        out_dtype=out_dtype, interpret=interpret,
    )
    out = out.reshape(b, h_kv, t_pad, g, d).transpose(0, 1, 3, 2, 4)
    return out.reshape(b, hq, t_pad, d)[:, :, :t]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)
