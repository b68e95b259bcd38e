"""Fused INT4-KV decode attention Pallas kernel (flash-decoding style).

The capability the reference only motivates ("KV cache quantization -> 8x
memory savings", `/root/reference/README.md:112`) taken to its conclusion:
attention that reads the *packed* INT4 KV cache straight from HBM and
dequantizes inside the kernel — the cache is never materialized in bf16, so
long-context decode streams 4x fewer KV bytes (the same argument as the
weight kernel, applied to the other big HBM consumer at decode time).

Decode-only (query time-step T=1), GQA-aware: grid over
(batch, kv_head, seq_tiles); each program advances one kv head's whole group
of query heads over one S-tile of the cache with the standard online-softmax
(flash) recurrence in VMEM scratch:

  k_t = (lo - zp_k) * s_k ; v_t likewise     (mask-only unpack, XOR-8 high
                                              nibble — quant.core.pack_planar)
  s_t   = q_g @ k_t^T / sqrt(D)  masked to s < length
  m'    = max(m, max(s_t));  a = exp(m - m')
  l'    = a*l + sum(exp(s_t - m'))
  acc'  = a*acc + exp(s_t - m') @ v_t

S-tiling keeps VMEM bounded at any context length (a whole 4k+ cache head
does not fit the 16MB VMEM dequantized). Lengths arrive via scalar prefetch;
tiles entirely past a row's length contribute exactly zero (masked).
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


def _dequant_rows(p, zp_col, s_col, compute_dtype):
    """Packed [St, D/2] + per-row scale/zp -> dense [St, D] in compute_dtype.

    Dequantizes in f32 and casts once at the end, matching the golden
    `dequantize_kv` bit-for-bit (stepwise bf16 rounding would diverge).
    """
    lo = (p & 0x0F).astype(jnp.int8).astype(jnp.float32)
    vhi = pltpu.bitcast(p & 0xF0, jnp.int8).astype(jnp.float32)
    hi = vhi * 0.0625 + 8.0
    lo_d = (lo - zp_col) * s_col
    hi_d = (hi - zp_col) * s_col
    return jnp.concatenate([lo_d, hi_d], axis=-1).astype(compute_dtype)


def _attn_kernel(
    len_ref,      # [2B] i32 (scalar prefetch): [lengths | query starts]
    q_ref,        # [1, 1, QR, D] — QR = QT*G rows, t-major ((t, g) pairs)
    kp_ref,       # [1, 1, St, D/2] u8
    ks_ref,       # [1, 1, St, 1] f32
    kz_ref,       # [1, 1, St, 1] f32
    vp_ref,       # [1, 1, St, D/2] u8
    vs_ref,       # [1, 1, St, 1] f32
    vz_ref,       # [1, 1, St, 1] f32
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
        k = _dequant_rows(kp_ref[0, 0], kz_ref[0, 0], ks_ref[0, 0], compute_dtype)
        q = q_ref[0, 0].astype(compute_dtype)  # [QR, D]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (1.0 / (head_dim ** 0.5))  # [QR, St]
        span = t * s_tile + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
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
        v = _dequant_rows(vp_ref[0, 0], vz_ref[0, 0], vs_ref[0, 0], compute_dtype)
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
    q4, lens_and_starts, kp, ks, kz, vp, vs, vz,
    *, s_tile, n_q, q_tile, compute_dtype, out_dtype, interpret,
):
    b, h_kv, rows, d = q4.shape
    g = rows // n_q  # query heads per kv head; rows are t-major (T, G)
    s_max = kp.shape[2]
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
            (1, 1, s_tile, 1), lambda i, j, qt, t, L: (i, j, t, 0),
            memory_space=pltpu.VMEM,
        )

    def pk():
        return pl.BlockSpec(
            (1, 1, s_tile, d // 2), lambda i, j, qt, t, L: (i, j, t, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h_kv, n_qt, n_s),
        in_specs=[
            pl.BlockSpec((1, 1, qr, d), lambda i, j, qt, t, L: (i, j, qt, 0),
                         memory_space=pltpu.VMEM),
            pk(), vec(), vec(), pk(), vec(), vec(),
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
        lens_and_starts.astype(jnp.int32), q4, kp,
        ks[..., None], kz[..., None], vp, vs[..., None], vz[..., None],
    )


def int4_decode_attention(
    q: jnp.ndarray,        # [B, Hq, D] — single decode step (post-RoPE)
    cache,                 # QuantizedKVCache (lengths INCLUDE the new step)
    *,
    s_tile: int = 512,
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
    while s_max % st != 0:
        st //= 2
    q4 = q.reshape(b, h_kv, g, d)
    lens_starts = jnp.concatenate([cache.lengths, cache.lengths - 1])
    out = _attn_call(
        q4, lens_starts,
        cache.k_packed, cache.k_scale, cache.k_zp,
        cache.v_packed, cache.v_scale, cache.v_zp,
        s_tile=st, n_q=1, q_tile=1, compute_dtype=compute_dtype,
        out_dtype=out_dtype, interpret=interpret,
    )
    return out.reshape(b, hq, d)


def int4_prefill_attention(
    q: jnp.ndarray,        # [B, Hq, T, D] — chunk of queries (post-RoPE)
    cache,                 # QuantizedKVCache (lengths INCLUDE the T new steps)
    starts: jnp.ndarray,   # [B] i32 — position of each row's first query
    *,
    s_tile: int = 512,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Chunked prefill attention over the packed INT4 cache.

    Same flash kernel as decode, with the queries tiled over a fourth grid
    dimension: each program handles QT query positions x G grouped heads
    (QT*G <= 512 rows bounds the VMEM scratch at ~512*D f32), so ANY chunk
    length runs fused — the round-1 build fell back to a dequantize-
    everything jnp path beyond 512 flattened rows. Per-query causal mask:
    query t attends to positions <= starts[b] + t; s-tiles entirely in a
    q-tile's causal future are skipped.
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
    while s_max % st != 0:
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
        q4, lens_starts,
        cache.k_packed, cache.k_scale, cache.k_zp,
        cache.v_packed, cache.v_scale, cache.v_zp,
        s_tile=st, n_q=t_pad, q_tile=qt, compute_dtype=compute_dtype,
        out_dtype=out_dtype, interpret=interpret,
    )
    out = out.reshape(b, h_kv, t_pad, g, d).transpose(0, 1, 3, 2, 4)
    return out.reshape(b, hq, t_pad, d)[:, :, :t]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)
