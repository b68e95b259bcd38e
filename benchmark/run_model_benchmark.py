#!/usr/bin/env python
"""Model-level decode throughput: INT4 model vs its dense bf16 twin.

The BASELINE.json configs[3] measurement: Mixtral-geometry INT4 decode
tokens/s/chip vs the bf16 baseline. The dense twin is produced by
*dequantizing* the INT4 model (`models/dense_baseline.py`), so both models
compute the same function — the comparison isolates the execution strategy
(packed INT4 kernels + INT4 KV cache vs dense bf16 matmuls + bf16 KV cache).

Usage: python benchmark/run_model_benchmark.py [--scale small] [--batch 8]
"""
import argparse
import sys

import numpy as np

import _bootstrap  # noqa: F401
import jax
import jax.numpy as jnp

from fused4bit_tpu.models.config import flagship_model_config
from fused4bit_tpu.models.dense_baseline import dense_from_quantized
from fused4bit_tpu.models.transformer import QuantizedTransformer
from fused4bit_tpu.utils.benchmark import time_fn


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="small", choices=["tiny", "small", "full"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-seq", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    cfg = flagship_model_config(args.scale)
    print(f"model: {cfg.name}  layers={cfg.num_layers} hidden="
          f"{cfg.num_heads * cfg.head_dim} experts={cfg.moe.num_experts} "
          f"ffn={cfg.moe.ffn_dim} top{cfg.moe.top_k}")

    model = QuantizedTransformer.init(jax.random.PRNGKey(0), cfg)
    dense = dense_from_quantized(model)
    print(f"weights+embed: int4 {model.nbytes/1e6:.0f} MB   "
          f"bf16 {dense.nbytes/1e6:.0f} MB   "
          f"({dense.nbytes/model.nbytes:.1f}x reduction)")

    b = args.batch
    qcaches = model.init_cache(cfg, b, args.max_seq)
    dcaches = dense.init_cache(cfg, b, args.max_seq)
    print(f"KV cache @ max_seq={args.max_seq}: int4 "
          f"{sum(c.nbytes for c in qcaches)/1e6:.0f} MB   bf16 "
          f"{sum(c.nbytes for c in dcaches)/1e6:.0f} MB")

    tok = jnp.zeros((b, 1), jnp.int32)
    pos = jnp.full((b, 1), 16, jnp.int32)

    qstep = jax.jit(lambda m, t, c, p: m(t, c, p))
    dstep = jax.jit(lambda m, t, c, p: m(t, c, p))

    # prime caches a bit so attention reads something
    _, qcaches = qstep(model, jnp.zeros((b, 16), jnp.int32), qcaches,
                       jnp.broadcast_to(jnp.arange(16)[None], (b, 16)))
    _, dcaches = dstep(dense, jnp.zeros((b, 16), jnp.int32), dcaches,
                       jnp.broadcast_to(jnp.arange(16)[None], (b, 16)))

    tq = time_fn(lambda: qstep(model, tok, qcaches, pos)[0],
                 warmup=3, iters=args.iters)
    td = time_fn(lambda: dstep(dense, tok, dcaches, pos)[0],
                 warmup=3, iters=args.iters)

    print(f"\ndecode step (batch {b}):")
    print(f"  int4 model: {tq*1e3:8.3f} ms  -> {b/tq:8.0f} tokens/s")
    print(f"  bf16 model: {td*1e3:8.3f} ms  -> {b/td:8.0f} tokens/s")
    print(f"  speedup: {td/tq:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
