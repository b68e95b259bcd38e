"""INT4-quantized KV cache.

New capability the reference only *motivates* ("KV cache quantization → 8x
memory savings", `/root/reference/README.md:112`;
`run_honest_benchmark.py:162`) but never implements — there is no attention
code in the reference at all (SURVEY.md §5 long-context row). Reuses the
exact pack/scale scheme of the weight quantizer: asymmetric per-row INT4
where a "row" is one (head, position) vector over head_dim, packed planar.

Layout (per layer):
  k_packed/v_packed: [B, H_kv, S_max, D/2] u8
  k_scales/k_zps/...: [B, H_kv, S_max] f32
Static S_max ring keeps everything jit-friendly; `length` tracks the fill.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["QuantizedKVCache", "quantize_kv", "dequantize_kv"]

_MAXQ = 15.0


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize [..., D] vectors to planar-packed INT4 with per-vector scale/zp.

    Same affine spec as the weight quantizer (`fused4bit_tpu.quant.core`),
    vectorized over all leading dims.
    """
    x = x.astype(jnp.float32)
    mn = jnp.min(x, axis=-1)
    mx = jnp.max(x, axis=-1)
    scale = (mx - mn) / _MAXQ
    scale = jnp.where(mx == mn, jnp.clip(jnp.abs(mx), min=1.0) / _MAXQ, scale)
    scale = jnp.clip(scale, min=1e-8)
    zp = jnp.clip(jnp.round(-mn / scale), 0.0, _MAXQ)
    q = jnp.clip(jnp.round(x / scale[..., None] + zp[..., None]), 0, _MAXQ)
    q = q.astype(jnp.uint8)
    half = x.shape[-1] // 2
    # Same planar + XOR-8 layout as the weight packer (quant.core.pack_planar)
    # so the fused attention kernel can unpack with masks only.
    packed = (((q[..., half:] ^ 0x8) << 4) | q[..., :half]).astype(jnp.uint8)
    return packed, scale.astype(jnp.float32), zp.astype(jnp.float32)


def dequantize_kv(packed, scale, zp, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`quantize_kv`: [..., D/2] u8 -> [..., D]."""
    lo = (packed & 0x0F).astype(jnp.float32)
    hi = ((packed >> 4) ^ 0x8).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=-1)
    return ((q - zp[..., None]) * scale[..., None]).astype(dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedKVCache:
    """Per-layer INT4 KV cache with static capacity and per-slot lengths.

    Per-slot ``lengths`` (rather than one scalar) is what continuous batching
    needs: every batch slot advances independently as requests of different
    lengths come and go (`fused4bit_tpu.serving.engine`).
    """

    k_packed: jnp.ndarray   # [B, H, S, D/2] u8
    v_packed: jnp.ndarray
    k_scale: jnp.ndarray    # [B, H, S] f32
    k_zp: jnp.ndarray
    v_scale: jnp.ndarray
    v_zp: jnp.ndarray
    lengths: jnp.ndarray    # [B] i32 — filled positions per slot

    @classmethod
    def init(cls, batch: int, num_kv_heads: int, max_seq: int, head_dim: int):
        z8 = jnp.zeros((batch, num_kv_heads, max_seq, head_dim // 2), jnp.uint8)
        zf = jnp.zeros((batch, num_kv_heads, max_seq), jnp.float32)
        return cls(z8, z8, zf, zf, zf, zf, jnp.zeros((batch,), jnp.int32))

    @property
    def max_seq(self) -> int:
        return self.k_packed.shape[2]

    @property
    def head_dim(self) -> int:
        return self.k_packed.shape[3] * 2

    @property
    def length(self) -> jnp.ndarray:
        """Scalar length when all slots are in lockstep (simple decode)."""
        return jnp.max(self.lengths)

    @property
    def nbytes(self) -> int:
        return sum(
            a.size * a.dtype.itemsize
            for a in (
                self.k_packed, self.v_packed,
                self.k_scale, self.k_zp, self.v_scale, self.v_zp,
            )
        )

    def append(self, k: jnp.ndarray, v: jnp.ndarray, start=None) -> "QuantizedKVCache":
        """Quantize + insert new steps.

        k, v: [B, H, T_new, D]; each batch row b is written at positions
        [start[b], start[b]+T_new) — ``start`` defaults to the row's current
        length (plain append).
        """
        t_new = k.shape[2]
        kp, ks, kz = quantize_kv(k)
        vp, vs, vz = quantize_kv(v)
        start = self.lengths if start is None else start

        def upd4(buf, val):
            # vmap a per-row dynamic_update_slice over the batch dim.
            return jax.vmap(
                lambda b, v_, s: jax.lax.dynamic_update_slice(b, v_, (0, s, 0))
            )(buf, val, start)

        def upd3(buf, val):
            return jax.vmap(
                lambda b, v_, s: jax.lax.dynamic_update_slice(b, v_, (0, s))
            )(buf, val, start)

        return QuantizedKVCache(
            k_packed=upd4(self.k_packed, kp),
            v_packed=upd4(self.v_packed, vp),
            k_scale=upd3(self.k_scale, ks),
            k_zp=upd3(self.k_zp, kz),
            v_scale=upd3(self.v_scale, vs),
            v_zp=upd3(self.v_zp, vz),
            lengths=start + t_new,
        )

    def reset_slot(self, slot) -> "QuantizedKVCache":
        """Mark one batch slot empty (its stale data is masked by length)."""
        return dataclasses.replace(
            self, lengths=self.lengths.at[slot].set(0)
        )

    def dequantize(self, dtype=jnp.bfloat16):
        """Full dense K, V: [B, H, S, D] (positions past `length` are junk —
        mask in attention)."""
        k = dequantize_kv(self.k_packed, self.k_scale, self.k_zp, dtype)
        v = dequantize_kv(self.v_packed, self.v_scale, self.v_zp, dtype)
        return k, v
