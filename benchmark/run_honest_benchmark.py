#!/usr/bin/env python
"""Honest framing of what INT4 buys on this hardware.

TPU counterpart of `/root/reference/benchmark/run_honest_benchmark.py`: leads
with the memory story (the unconditional win), sizes what fits on a chip,
measures decode throughput, and states plainly when and why latency parity
rather than speedup is observed (the reference's version of this is the
"L2-resident weights" caveat at `run_honest_benchmark.py:149-163`; ours is
the DMA-bandwidth ceiling of the Pallas path on virtualized chips — see the
measured streaming ceiling printed below).
"""
import argparse
import sys

import numpy as np

import _bootstrap  # noqa: F401
import jax
import jax.numpy as jnp

from fused4bit_tpu.models.config import get_config_by_name
from fused4bit_tpu.ops.int4_matmul import int4_matmul
from fused4bit_tpu.quant import quantize
from fused4bit_tpu.utils.benchmark import time_fn_scan

HBM_GB = 16  # TPU v5e


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="mixtral")
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)
    cfg = get_config_by_name(args.config)

    E, K, N = cfg.num_experts, cfg.hidden_dim, cfg.ffn_dim
    expert_params = cfg.total_expert_params
    print("=" * 64)
    print("1) MEMORY — the unconditional win")
    print("=" * 64)
    for name, bits in (("fp32", 32), ("bf16", 16), ("int4+scales", 4.25)):
        gb = expert_params * bits / 8 / 1e9
        print(f"  {cfg.name} expert weights @ {name:<12} {gb:7.2f} GB")
    bf16_gb = expert_params * 2 / 1e9
    int4_gb = expert_params * 4.25 / 8 / 1e9
    print(f"  -> {bf16_gb/int4_gb:.1f}x more parameters fit per chip;")
    print(f"     on a {HBM_GB} GB chip: bf16 leaves {HBM_GB-bf16_gb:.1f} GB for KV cache,")
    print(f"     int4 leaves {HBM_GB-int4_gb:.1f} GB (longer context / bigger batch).")

    print()
    print("=" * 64)
    print("2) LATENCY — measured, with the bandwidth reality")
    print("=" * 64)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, K)), dtype=jnp.float32)
    wb = w.astype(jnp.bfloat16)
    qt = quantize(w)
    x = jnp.asarray(rng.standard_normal((8, K)), dtype=jnp.bfloat16)
    t_dense = time_fn_scan(jax.jit(lambda v: v @ wb.T), x, iters=args.iters)
    t_int4 = time_fn_scan(jax.jit(lambda v: int4_matmul(v, qt)), x, iters=args.iters)
    bw_dense = N * K * 2 / t_dense / 1e9
    bw_int4 = N * K / 2 / t_int4 / 1e9
    print(f"  dense bf16 {K}->{N} @ batch 8: {t_dense*1e6:8.1f} us ({bw_dense:.0f} GB/s weight stream)")
    print(f"  int4 fused              : {t_int4*1e6:8.1f} us ({bw_int4:.0f} GB/s packed stream)")
    print(f"  speedup: {t_dense/t_int4:.2f}x")
    print()
    print("  Why this number looks the way it does: the INT4 kernel moves 4x")
    print("  fewer weight bytes, so its ceiling is 4x the dense speed — but it")
    print("  is bound by the Pallas DMA streaming rate, while XLA's dense")
    print("  matmul streams through a faster path on this platform. When the")
    print("  two rates match (production TPU runtimes), the byte ratio is the")
    print("  speedup. The memory win above holds everywhere, unconditionally.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
