#!/usr/bin/env python
"""Driver benchmark: fused INT4 dequant-linear vs dense BF16 XLA matmul.

Mirrors the reference's headline linear benchmark
(`/root/reference/benchmark/run_benchmark.py`): the (4096 -> 11008) decode
GEMV shape, INT4 fused kernel vs the framework-native full-precision matmul.
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`value` is the fused-kernel latency in microseconds; `vs_baseline` is the
speedup over the dense bf16 XLA matmul on the same chip (reference target:
>= 2x on memory-bound decode shapes, BASELINE.md).
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from fused4bit_tpu.quant import quantize
    from fused4bit_tpu.ops.int4_matmul import int4_matmul
    from fused4bit_tpu.utils.benchmark import time_fn_scan

    rng = np.random.default_rng(0)
    # Reference protocol: single-vector input (run_benchmark.py:166) on the
    # (4096 -> 11008) shape (run_benchmark.py:54-58) — the decode GEMV.
    K, N, M = 4096, 11008, 1
    w = jnp.asarray(rng.standard_normal((N, K)), dtype=jnp.float32)
    wb = w.astype(jnp.bfloat16)
    qt = quantize(w)
    x = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.bfloat16)

    dense = jax.jit(lambda v: v @ wb.T)
    kern = jax.jit(lambda v: int4_matmul(v, qt, tile_n=1024))

    # take the best of several interleaved repeats — the chip is shared and
    # run-to-run variance is large
    t_dense = min(
        time_fn_scan(dense, x, iters=100, repeats=3) for _ in range(3)
    )
    t_int4 = min(
        time_fn_scan(kern, x, iters=100, repeats=3) for _ in range(3)
    )

    print(json.dumps({
        "metric": "int4_fused_linear_latency_4096x11008_m1",
        "value": round(t_int4 * 1e6, 1),
        "unit": "us",
        "vs_baseline": round(t_dense / t_int4, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
