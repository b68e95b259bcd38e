"""QuantizedLinear — drop-in INT4 linear layer (pytree module).

TPU-native counterpart of the reference's ``QuantizedLinear(nn.Module)``
(`/root/reference/python/module.py:33-138`). Instead of ``register_buffer``
state on an ``nn.Module``, the layer is a frozen pytree dataclass holding a
:class:`~fused4bit_tpu.quant.QuantizedTensor` — it jits, vmaps, shards with
``jax.sharding``, and checkpoints with orbax out of the box.

Dispatch mirrors the reference (`python/module.py:113-118`): the fused Pallas
kernel on TPU, the pure-jnp golden reference elsewhere (or when
``use_kernel=False``). ``from_dense`` is the ``from_linear`` converter
(`python/module.py:67-98`); unlike the reference (assert at :84) we support an
optional bias — it simply adds after the matmul and stays unquantized.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.int4_matmul import int4_matmul
from ..quant.core import QuantizedTensor, quantize
from ..quant.reference import reference_linear_qt

__all__ = ["QuantizedLinear", "DenseLinear"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseLinear:
    """Unquantized linear (bf16/f32) — for layers excluded from INT4 by a
    mixed-precision policy (routers, optionally lm_head). MoE routers are
    tiny ([E, H]) but their argmax decides expert assignment; quantizing
    them flips top-k choices on trained weights (see
    benchmark/results/quality_trained.json for the measured effect).
    """

    weight: jnp.ndarray  # [N, K]
    bias: Optional[jnp.ndarray] = None

    @property
    def in_dim(self) -> int:
        return self.weight.shape[1]

    @property
    def out_dim(self) -> int:
        return self.weight.shape[0]

    @property
    def nbytes(self) -> int:
        extra = (
            self.bias.size * self.bias.dtype.itemsize
            if self.bias is not None else 0
        )
        return self.weight.size * self.weight.dtype.itemsize + extra

    def as_xla_turbo(self) -> "DenseLinear":
        return self  # already XLA-native

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x @ self.weight.T.astype(x.dtype)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedLinear:
    """INT4 weight-only linear layer: ``y = x @ dequant(W)^T (+ b)``."""

    weight: QuantizedTensor
    bias: Optional[jnp.ndarray] = None
    use_kernel: bool = dataclasses.field(metadata=dict(static=True), default=True)
    activation: str = dataclasses.field(metadata=dict(static=True), default="bf16")
    # Optional int8-resident copy of the same int4 weights for the XLA-turbo
    # execution mode (activation="int8_xla"): 2x packed size, streamed by
    # XLA's matmul emitter — see ops/int8_xla.py for when this wins.
    w8: Optional[object] = None
    # Logical output dim when `weight` rows are padded to the kernel's best
    # tile multiple (quant.core.pad_rows); outputs are sliced back to it.
    out_features: Optional[int] = dataclasses.field(
        metadata=dict(static=True), default=None
    )

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dense(
        cls,
        weight: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        *,
        granularity: str = "per_row",
        use_kernel: bool = True,
        **quant_kw,
    ) -> "QuantizedLinear":
        """Quantize a dense [N, K] weight (reference from_linear,
        `python/module.py:67-98`).

        per_group weights pack group-major (layout="planar_groups") when the
        batched-partials kernel's constraints hold — it runs at per_row
        speed vs the planar expansion-dot kernel's ~2.7x (ops.int4_matmul)."""
        layout = "planar"
        if granularity == "per_group":
            gs = quant_kw.get("group_size", 128)
            k_half = weight.shape[-1] // 2
            if gs % 128 == 0 and k_half % gs == 0:
                layout = "planar_groups"
        qt = quantize(weight, granularity=granularity, layout=layout, **quant_kw)
        return cls(weight=qt, bias=bias, use_kernel=use_kernel)

    @classmethod
    def init(
        cls,
        key: jax.Array,
        in_dim: int,
        out_dim: int,
        *,
        bias: bool = False,
        dtype=jnp.float32,
        **kw,
    ) -> "QuantizedLinear":
        w = jax.random.normal(key, (out_dim, in_dim), dtype) * (in_dim ** -0.5)
        b = jnp.zeros((out_dim,), dtype) if bias else None
        return cls.from_dense(w, b, **kw)

    # -- properties ----------------------------------------------------------

    @property
    def in_dim(self) -> int:
        return self.weight.in_dim

    @property
    def out_dim(self) -> int:
        return self.out_features or self.weight.out_dim

    @property
    def nbytes(self) -> int:
        extra = self.bias.size * self.bias.dtype.itemsize if self.bias is not None else 0
        return self.weight.nbytes + extra

    # -- forward -------------------------------------------------------------

    def as_xla_turbo(self) -> "QuantizedLinear":
        """Attach the i8-resident weight copy and switch to the XLA int8
        path. The packed u4 copy stays as the source of truth (checkpoints,
        metadata); serving memory is dominated by the i8 copy (~2x packed)."""
        from ..ops.int8_xla import to_int8_resident

        return dataclasses.replace(
            self, w8=to_int8_resident(self.weight), activation="int8_xla"
        )

    def as_u4_turbo(self) -> "QuantizedLinear":
        """Regime-dispatched execution with PACKED residency (no weight
        copies): decode-size inputs run the fused Pallas w4a8 kernel (half
        the weight bytes, the measured decode winner); prefill-size inputs
        unpack to a per-call transient i8 tensor and run XLA's integer-MXU
        dot (`ops.int8_xla.int4_linear_transient`) — XLA streaming without
        the resident mode's permanent 2x weight memory. The leading dim is
        static under jit, so the dispatch is compile-time."""
        return dataclasses.replace(self, activation="int8_auto")

    def padded_for_kernel(self) -> "QuantizedLinear":
        """Pre-pad weight rows to the kernels' shared measured-best tile
        multiple (`ops.int4_matmul.preferred_row_multiple` — ONE table with
        the kernels' own tile pickers, so padding can't silently de-optimize
        a path) so the forward never pays a per-call n_pad copy; outputs are
        sliced back to the logical ``out_features``."""
        from ..ops.int4_matmul import preferred_row_multiple
        from ..quant.core import pad_rows

        k_half = self.weight.in_dim // 2
        best = preferred_row_multiple(k_half)
        if self.weight.granularity not in ("per_row", "per_group"):
            return self
        padded = pad_rows(self.weight, best)
        if padded is self.weight:
            return self
        return dataclasses.replace(
            self, weight=padded, out_features=self.weight.out_dim
        )

    # Leading-dim size at which the XLA transient path takes over from the
    # fused kernel under activation="int8_auto". The fused kernel wins the
    # memory-bound decode regime (half the bytes at ~460-580 GB/s); XLA's
    # MXU emitter wins once the op is compute-bound.
    _AUTO_PREFILL_M = 256

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.weight
        activation = self.activation
        if activation == "int8_auto":
            m = 1
            for d in x.shape[:-1]:
                m *= d
            if (
                m >= self._AUTO_PREFILL_M
                and w.layout == "planar"
                and w.granularity in ("per_row", "per_tensor")
            ):
                activation = "int8_transient"
            else:
                activation = "int8"
        if activation == "int8_transient":
            from ..ops.int8_xla import int4_linear_transient

            y = int4_linear_transient(x, w)
            if self.out_features and y.shape[-1] != self.out_features:
                y = y[..., : self.out_features]
            if self.bias is not None:
                y = y + self.bias.astype(y.dtype)
            return y
        if activation == "int8_xla" and self.w8 is not None:
            from ..ops.int8_xla import int8_linear

            y = int8_linear(x, self.w8)
            if self.out_features and y.shape[-1] != self.out_features:
                y = y[..., : self.out_features]
            if self.bias is not None:
                y = y + self.bias.astype(y.dtype)
            return y
        if (
            self.use_kernel
            and activation == "int8"
            and w.layout == "planar"
            and w.granularity == "per_row"
        ):
            from ..ops.int4_matmul import int4_matmul_a8

            y = int4_matmul_a8(x, w)
        elif self.use_kernel and w.layout == "planar" and w.granularity == "per_row":
            y = int4_matmul(x, w)
        elif (
            self.use_kernel
            and activation == "int8"
            and w.layout == "planar_groups"
            and w.granularity == "per_group"
        ):
            from ..ops.int4_matmul import int4_matmul_per_group_a8

            y = int4_matmul_per_group_a8(x, w)
        elif (
            self.use_kernel
            and w.layout in ("planar", "planar_groups")
            and w.granularity == "per_group"
            and w.group_size % 128 == 0
            and (w.in_dim // 2) % w.group_size == 0
        ):
            from ..ops.int4_matmul import int4_matmul_per_group

            y = int4_matmul_per_group(x, w)
        else:
            y = reference_linear_qt(x, self.weight, dtype=x.dtype)
        if self.out_features and y.shape[-1] != self.out_features:
            y = y[..., : self.out_features]
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    def __repr__(self) -> str:  # reference extra_repr (`python/module.py:134-138`)
        return (
            f"QuantizedLinear(in={self.in_dim}, out={self.out_dim}, "
            f"bits={self.weight.bits}, granularity={self.weight.granularity}, "
            f"bias={self.bias is not None})"
        )
