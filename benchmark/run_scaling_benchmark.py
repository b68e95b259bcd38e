#!/usr/bin/env python
"""Expert-parallel scaling benchmark (1 -> N devices).

The BASELINE.md north-star measurement: tokens/s of the Mixtral-geometry MoE
layer as experts shard across a mesh. On a real pod slice this measures ICI
scaling; on a single chip / CPU it still validates the sharded path end to
end on a virtual mesh (pass JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=8) and prints per-device-count
latencies.

Usage:
  python benchmark/run_scaling_benchmark.py --config debug --tokens 64
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmark/run_scaling_benchmark.py --config debug --virtual
"""
import argparse
import os
import sys
import time

import numpy as np

import _bootstrap  # noqa: F401
import jax
import jax.numpy as jnp

from fused4bit_tpu.layers.moe import QuantizedMoE, simulate_router_logits, topk_route
from fused4bit_tpu.models.config import get_config_by_name
from fused4bit_tpu.parallel.expert_parallel import moe_ep_replicated
from fused4bit_tpu.parallel.mesh import make_mesh
from fused4bit_tpu.parallel.sharding import shard_qt_experts
from fused4bit_tpu.quant import quantize


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="debug")
    p.add_argument("--tokens", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--virtual", action="store_true",
                   help="force the CPU platform (virtual multi-device mesh)")
    args = p.parse_args(argv)

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    cfg = get_config_by_name(args.config)
    n_dev_total = len(jax.devices())
    print(f"backend: {jax.default_backend()}  devices: {n_dev_total}")

    rng = np.random.default_rng(0)
    E, K, N, T = cfg.num_experts, cfg.hidden_dim, cfg.ffn_dim, args.tokens
    w = jnp.asarray(rng.standard_normal((E, N, K)) * 0.02, jnp.float32)
    qt_full = quantize(w, layout="planar")
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    logits = simulate_router_logits(jax.random.PRNGKey(0), T, E)

    golden = QuantizedMoE(weight=qt_full)(x, topk_route(logits, cfg.top_k, E))

    counts = [d for d in (1, 2, 4, 8) if d <= n_dev_total and E % d == 0]
    interp = jax.default_backend() not in ("tpu", "axon")
    print(f"{'devices':>8} {'ms/layer':>10} {'tokens/s':>10} {'max err':>9}")
    for d in counts:
        mesh = make_mesh(("expert",), (d,), devices=jax.devices()[:d])
        qt = shard_qt_experts(qt_full, mesh, "expert")
        fn = lambda: moe_ep_replicated(  # noqa: E731
            x, logits, qt, mesh, top_k=cfg.top_k, tile_m=16, interpret=interp
        )
        out = fn()
        err = float(jnp.max(jnp.abs(out - golden)))
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{d:>8} {med*1e3:>10.3f} {T/med:>10.0f} {err:>9.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
