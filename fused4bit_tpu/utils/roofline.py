"""Analytic roofline model for the fused INT4 kernels.

Port of the reference's performance-truth mechanism
(`/root/reference/benchmark/run_benchmark.py:205-242`): per-forward bytes
moved, FLOPs, arithmetic intensity, achieved vs peak bandwidth. TPU peaks are
table-driven; the defaults describe TPU v5e and can be overridden (the
benchmark harness also measures an *empirical* streaming ceiling, which on
virtualized chips is the honest denominator).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["ChipSpec", "TPU_V5E", "linear_roofline", "RooflineReport"]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float          # HBM bandwidth, GB/s
    bf16_tflops: float       # MXU peak, TFLOP/s
    vmem_mbytes: float = 16.0


TPU_V5E = ChipSpec(name="TPU v5e", hbm_gbps=819.0, bf16_tflops=197.0)


@dataclasses.dataclass
class RooflineReport:
    bytes_moved: int
    flops: int
    arithmetic_intensity: float
    ridge_intensity: float
    bound: str                      # "memory" | "compute"
    sol_latency_us: float           # speed-of-light latency
    achieved_gbps: Optional[float] = None
    achieved_tflops: Optional[float] = None
    pct_of_sol: Optional[float] = None

    def pretty(self) -> str:
        lines = [
            f"bytes/fwd          {self.bytes_moved/1e6:10.2f} MB",
            f"flops/fwd          {self.flops/1e9:10.2f} GFLOP",
            f"arith intensity    {self.arithmetic_intensity:10.2f} flop/byte"
            f" (ridge {self.ridge_intensity:.1f})  -> {self.bound}-bound",
            f"speed-of-light     {self.sol_latency_us:10.1f} us",
        ]
        if self.achieved_gbps is not None:
            lines.append(
                f"achieved           {self.achieved_gbps:10.1f} GB/s"
                f" ({self.pct_of_sol:.0f}% of SoL)"
            )
        if self.achieved_tflops is not None:
            lines.append(f"achieved           {self.achieved_tflops:10.2f} TFLOP/s")
        return "\n".join(lines)


def linear_roofline(
    batch: int,
    in_dim: int,
    out_dim: int,
    *,
    weight_bits: float = 4.0,
    act_bytes: int = 2,
    chip: ChipSpec = TPU_V5E,
    measured_s: Optional[float] = None,
    measured_hbm_gbps: Optional[float] = None,
) -> RooflineReport:
    """Roofline for one quantized-linear forward.

    Bytes model extends the reference's (`run_benchmark.py:219-238`,
    bytes = 4*in + out*in/2 + 8*out for fp32/INT4) to arbitrary activation
    dtype and batch:
      read x [B,K], read packed [N, K*bits/8], read scales+zp [2N f32],
      write y [B,N].
    """
    w_bytes = int(out_dim * in_dim * weight_bits / 8) + 8 * out_dim
    bytes_moved = batch * in_dim * act_bytes + w_bytes + batch * out_dim * act_bytes
    flops = 2 * batch * in_dim * out_dim
    ai = flops / bytes_moved
    peak_bw = measured_hbm_gbps or chip.hbm_gbps
    ridge = chip.bf16_tflops * 1e12 / (peak_bw * 1e9)
    bound = "memory" if ai < ridge else "compute"
    sol = max(
        bytes_moved / (peak_bw * 1e9), flops / (chip.bf16_tflops * 1e12)
    )
    rep = RooflineReport(
        bytes_moved=bytes_moved,
        flops=flops,
        arithmetic_intensity=ai,
        ridge_intensity=ridge,
        bound=bound,
        sol_latency_us=sol * 1e6,
    )
    if measured_s:
        rep.achieved_gbps = bytes_moved / measured_s / 1e9
        rep.achieved_tflops = flops / measured_s / 1e12
        rep.pct_of_sol = 100.0 * sol / measured_s
    return rep
