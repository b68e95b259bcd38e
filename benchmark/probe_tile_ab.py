#!/usr/bin/env python
"""Focused A/B re-measure of tile candidates with trial replication.

The one-shot tune sweeps (`probe_kernel_bw.py --tune`) showed exactly one
anomalously fast cell per run, with the SAME config differing 2.4x between
runs — consistent with platform jitter corrupting the two-point slope. This
probe re-measures a small candidate set with N independent slope trials per
cell and reports all trials, so a pinned default is backed by replicated
evidence rather than a single lucky slope.

Usage: python benchmark/probe_tile_ab.py --impl w4a16 \
           --cells 1024:256 1024:512 512:512 --trials 3
"""
import argparse
import json

import _bootstrap  # noqa: F401
import jax
import jax.numpy as jnp

from fused4bit_tpu.ops.int4_matmul import int4_matmul, int4_matmul_a8
from fused4bit_tpu.quant.core import quantize
from fused4bit_tpu.utils.benchmark import time_chain_slope


def build_pairs(k, n, num, seed=0):
    pairs = []
    key = jax.random.PRNGKey(seed)
    for _ in range(num):
        key, k1, k2 = jax.random.split(key, 3)
        wu = jax.random.normal(k1, (n, k), jnp.float32) * (k ** -0.5)
        wd = jax.random.normal(k2, (k, n), jnp.float32) * (n ** -0.5)
        pairs.append((
            quantize(wu, granularity="per_row", layout="planar"),
            quantize(wd, granularity="per_row", layout="planar"),
        ))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="w4a16", choices=["w4a16", "w4a8"])
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=11008)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cells", nargs="*", default=["1024:256", "1024:512", "512:512"],
                    help="tile_n_up:tile_n_down pairs")
    ap.add_argument("--out", default="benchmark/results/kernel_tile_ab.json")
    args = ap.parse_args()

    call = {"w4a16": int4_matmul, "w4a8": int4_matmul_a8}[args.impl]
    k, n = args.k, args.n
    qpairs = build_pairs(k, n, args.pairs)
    x = jax.random.normal(
        jax.random.PRNGKey(9), (args.m, k), jnp.float32
    ).astype(jnp.bfloat16)
    pair_bytes = (n * k // 2 + 8 * n) + (k * n // 2 + 8 * k)

    def mk_step(tu, td):
        def step(y, ws):
            qu, qd = ws
            return call(jnp.sin(call(y, qu, tile_n=tu)), qd, tile_n=td)
        return step

    results = {}
    for cell in args.cells:
        tu, td = (int(v) for v in cell.split(":"))
        trials = []
        for t in range(args.trials):
            sec = time_chain_slope(
                mk_step(tu, td), x, qpairs,
                p_small=1, p_large=len(qpairs), iters=args.iters,
            )
            trials.append(round(sec * 1e3, 4))
            print(f"up{tu}_dn{td} trial{t}: {sec*1e3:8.4f} ms/pair "
                  f"{pair_bytes/sec/1e9:8.1f} GB/s", flush=True)
        med = sorted(trials)[len(trials) // 2]
        results[f"up{tu}_dn{td}"] = {
            "trials_ms": trials,
            "median_ms": med,
            "median_gbps": round(pair_bytes / (med / 1e3) / 1e9, 1),
        }
    doc = {
        "impl": args.impl,
        "shape": {"m": args.m, "k": k, "n": n},
        "protocol": f"time_chain_slope x{args.trials} trials",
        "device": str(jax.devices()[0]),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
