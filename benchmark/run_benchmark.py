#!/usr/bin/env python
"""Linear-kernel benchmark + roofline (reference parity).

TPU counterpart of `/root/reference/benchmark/run_benchmark.py`: sweeps the
same weight shapes ((1024,1024), (4096,4096), (4096,11008),
`run_benchmark.py:54-58`), compares the fused INT4 kernel against the
framework-native full-precision matmul (bf16 XLA here vs fp16 cuBLAS there),
reports latency / weight memory / roofline (bytes, FLOPs, arithmetic
intensity, achieved GB/s — `run_benchmark.py:205-242`).

Usage: python benchmark/run_benchmark.py [--batch 8] [--iters 100] [--quick]
"""
import argparse
import sys

import numpy as np

import _bootstrap  # noqa: F401  (repo-root import shim)
import jax
import jax.numpy as jnp

from fused4bit_tpu.ops.int4_matmul import int4_matmul
from fused4bit_tpu.quant import quantize
from fused4bit_tpu.utils.benchmark import BenchmarkResult, print_table, time_fn_scan
from fused4bit_tpu.utils.roofline import linear_roofline

SHAPES = [(1024, 1024), (4096, 4096), (4096, 11008)]  # (in, out), ref :54-58


def bench_shape(in_dim, out_dim, batch, iters, measured_bw=None):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((out_dim, in_dim)), dtype=jnp.float32)
    wb = w.astype(jnp.bfloat16)
    qt = quantize(w)
    x = jnp.asarray(rng.standard_normal((batch, in_dim)), dtype=jnp.bfloat16)

    dense = jax.jit(lambda v: v @ wb.T)
    kern = jax.jit(lambda v: int4_matmul(v, qt))

    t_dense = time_fn_scan(dense, x, iters=iters, repeats=3)
    t_int4 = time_fn_scan(kern, x, iters=iters, repeats=3)

    dense_bytes = out_dim * in_dim * 2
    print(f"\n=== {in_dim} -> {out_dim}, batch={batch} ===")
    print_table(
        [
            BenchmarkResult("bf16 dense (XLA)", t_dense * 1e3, num_tokens=batch),
            BenchmarkResult("int4 fused (Pallas)", t_int4 * 1e3, num_tokens=batch),
        ],
        baseline="bf16 dense (XLA)",
    )
    print(
        f"weight memory: bf16 {dense_bytes/1e6:.1f} MB -> int4 "
        f"{qt.nbytes/1e6:.1f} MB ({dense_bytes*2/qt.nbytes:.1f}x vs fp32, "
        f"{dense_bytes/qt.nbytes:.1f}x vs bf16)"
    )
    rep = linear_roofline(
        batch, in_dim, out_dim, measured_s=t_int4, measured_hbm_gbps=measured_bw
    )
    print(rep.pretty())
    return t_dense, t_int4


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--quick", action="store_true", help="only the largest shape")
    p.add_argument(
        "--measured-bw", type=float, default=None,
        help="empirical HBM GB/s to use as the roofline denominator",
    )
    args = p.parse_args(argv)

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    shapes = SHAPES[-1:] if args.quick else SHAPES
    for in_dim, out_dim in shapes:
        bench_shape(in_dim, out_dim, args.batch, args.iters, args.measured_bw)
    return 0


if __name__ == "__main__":
    sys.exit(main())
