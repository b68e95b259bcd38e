"""Sequence (context) parallelism: ring attention over a mesh axis.

The long-context scale-out axis the reference has no analogue for (SURVEY.md
§2.5 absence inventory — single GPU, no distributed support): shard the
SEQUENCE dimension of Q/K/V over a mesh axis so a context too long for one
chip's HBM — or one chip's attention FLOPs — spreads over the ring.

Design (blockwise/ring attention, the standard flash-attention-over-devices
construction): every device holds one contiguous [T/P] chunk of Q, K, V.
Each device keeps its Q chunk resident and walks the K/V ring: P steps, each
step combining the current K/V chunk into the flash online-softmax state
(m, l, acc) and rotating the chunk to the next device with ``ppermute``.
After P steps every Q row has seen every K/V position exactly once, at peak
memory O(T/P) per device, with each rotation's ICI transfer overlappable
with the chunk's attention compute (same pattern as the ring-pipelined EP
strategy, ``expert_parallel.moe_ep_ring``).

Causality never moves data it can skip *numerically*: chunks fully in a Q
chunk's future contribute all-masked scores and drop out of the online
softmax via the masked-probability form (p = where(mask, exp(s - m), 0)) —
control flow stays static for XLA, and the masked chunks' dots are the
price of the uniform schedule (half the total work at P chunks, same as any
causal flash implementation without triangle scheduling).

GQA is supported the same way as the fused attention kernel
(`ops/decode_attention.py`): K/V arrive with ``Hkv`` heads and are repeated
to the query head count inside the shard_map body (a [B, Hkv, C, D] chunk is
small; the repeat never touches HBM-resident global arrays).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["ring_attention", "sequence_sharded_attention"]

_NEG = -1e30


def _ring_body(q, k, v, *, axis: str, causal: bool, scale: float):
    """shard_map body: local chunks [B, H(q/kv), C, D] -> [B, Hq, C, D]."""
    p_sz = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    b, hq, c, d = q.shape
    hkv = k.shape[1]
    rep = hq // hkv

    qf = q.astype(jnp.float32) * scale
    q_pos = idx * c + jnp.arange(c, dtype=jnp.int32)          # global rows

    # pvary: the state starts identical on every device but the scan body
    # makes it device-varying; shard_map's varying-axis type system needs
    # the carry marked varying up front.
    m0 = jax.lax.pvary(jnp.full((b, hq, c, 1), _NEG, jnp.float32), axis)
    l0 = jax.lax.pvary(jnp.zeros((b, hq, c, 1), jnp.float32), axis)
    a0 = jax.lax.pvary(jnp.zeros((b, hq, c, d), jnp.float32), axis)
    perm = [(j, (j + 1) % p_sz) for j in range(p_sz)]

    def step(carry, p_i):
        m, l, acc, k_cur, v_cur = carry
        src = (idx - p_i) % p_sz                              # chunk id held now
        k_pos = src * c + jnp.arange(c, dtype=jnp.int32)
        kr = jnp.repeat(k_cur, rep, axis=1).astype(jnp.float32)
        vr = jnp.repeat(v_cur, rep, axis=1).astype(jnp.float32)
        s = jnp.einsum("bhid,bhjd->bhij", qf, kr)             # [B, Hq, C, C]
        if causal:
            mask = k_pos[None, :] <= q_pos[:, None]           # [C, C]
            s = jnp.where(mask[None, None], s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # masked-probability form: rows whose every column is masked keep
        # m_new == -1e30; exp(s - m_new) would be exp(0) == 1 there, so the
        # mask multiplies those probabilities back to exactly zero.
        prob = jnp.exp(s - m_new)
        if causal:
            prob = jnp.where(mask[None, None], prob, 0.0)
        alpha = jnp.exp(m - m_new)
        l = alpha * l + jnp.sum(prob, axis=-1, keepdims=True)
        acc = alpha * acc + jnp.einsum("bhij,bhjd->bhid", prob, vr)
        # rotate AFTER use; XLA is free to overlap the transfer with the
        # next iteration's einsums (the chunk only blocks at its first use)
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (m_new, l, acc, k_nxt, v_nxt), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, a0, k, v), jnp.arange(p_sz, dtype=jnp.int32)
    )
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,   # [B, Hq, T, D]
    k: jnp.ndarray,   # [B, Hkv, T, D]
    v: jnp.ndarray,   # [B, Hkv, T, D]
    mesh: Mesh,
    *,
    axis: str = "seq",
    causal: bool = True,
) -> jnp.ndarray:
    """Causal attention with the sequence dim sharded over ``mesh[axis]``.

    Returns [B, Hq, T, D], sequence-sharded the same way. T must divide by
    the axis size. Peak per-device memory is O(B*H*(T/P)*D); total ICI
    traffic per device is (P-1)/P of its K+V bytes, overlappable with
    compute.
    """
    t = q.shape[2]
    p_sz = mesh.shape[axis]
    if t % p_sz != 0:
        raise ValueError(f"T={t} must divide by {axis} size {p_sz}")
    if q.shape[1] % k.shape[1] != 0:
        raise ValueError(f"Hq={q.shape[1]} not a multiple of Hkv={k.shape[1]}")
    scale = q.shape[-1] ** -0.5
    body = functools.partial(_ring_body, axis=axis, causal=causal, scale=scale)
    spec = P(None, None, axis, None)
    fn = shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )
    return fn(q, k, v)


def sequence_sharded_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh, **kw
) -> jnp.ndarray:
    """Alias for :func:`ring_attention` (the sequence-parallel entry point)."""
    return ring_attention(q, k, v, mesh, **kw)
