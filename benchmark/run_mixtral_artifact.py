#!/usr/bin/env python
"""Mixtral-8x7B MoE-layer evidence sweep (the round-1 verdict's top item).

Single-projection grouped GEMM at the reference's flagship geometry
(`/root/reference/python/moe_int4_module.py:159-165`: 8 experts, 4096->14336,
top-2), measured across decode/prefill token counts x routing distributions,
with a MEASURED bf16 capacity-einsum baseline in every cell (the round-1
artifact had none) and every INT4 execution path side by side:

  bf16-bmm    capacity-padded batched einsum over dense bf16 weights —
              the strong baseline (reference `grouped_gemm_torch.py:48-100`)
  int4        fused grouped Pallas kernel, auto mode (the product)
  int4-xres / int4-minner / int4-ninner / int4-ksplit — explicit modes
  int4-dequant dequantize-once + capacity einsum (XLA-streaming INT4 path)
  w4a8        int8-activation integer-MXU grouped kernel
  pg128       per_group(128) grouped kernel

All timing uses the scan-in-jit protocol (utils.benchmark.time_fn_scan) —
the only trustworthy protocol on this platform (single-call
block_until_ready can return early; see AGENTS.md). Results are appended
incrementally to benchmark/results/mixtral_sweep.json so partial runs
still leave evidence.

Usage:
  python benchmark/run_mixtral_artifact.py --tokens 8 32 128 2048 \
      --dists uniform skewed --iters 8

The sweep generalizes to every geometry in the config registry
(`--config deepseek` = 64e 4096->11008 top-8, etc.). At the 64-expert
geometries run it in two passes so the resident weight sets leave HBM
headroom for the kernels (cells resume/merge into one artifact):

  python benchmark/run_mixtral_artifact.py --config deepseek \
      --device-trace --tokens 8 64 1024 --dists uniform \
      --impls int4 w4a8 pg128bp8
  python benchmark/run_mixtral_artifact.py --config deepseek \
      --device-trace --tokens 8 64 1024 --dists uniform --no-verify \
      --impls bf16-bmm bf16-naive
"""
import argparse
import functools
import json
import os
import sys

import numpy as np

import _bootstrap  # noqa: F401

# The remote compiler on this platform is extremely slow for batched einsums
# (E=8 bmm: >5 min); the persistent cache makes re-runs and partial-sweep
# restarts cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from fused4bit_tpu.layers.moe import (
    dispatch,
    make_dispatch_plan,
    simulate_router_logits,
    topk_route,
)
from fused4bit_tpu.ops.grouped_matmul import (
    grouped_int4_matmul,
    grouped_int4_matmul_a8,
    grouped_int4_matmul_per_group,
)
from fused4bit_tpu.ops.int8_xla import int4_grouped_transient
from fused4bit_tpu.quant import dequantize, quantize
from fused4bit_tpu.utils.benchmark import time_fn_scan, time_fn_slope
from fused4bit_tpu.utils.device_profile import device_op_times


def time_fn_device(fn, x, *, consts=(), traces=3):
    """Per-call device seconds via the profiler (utils/device_profile).

    One jitted call per trace; the metric is the XLA module's device
    duration — every op the impl executes, no host dispatch, no scan
    bookkeeping. Round-4 replication showed the wall-clock slope protocols
    carry 2-4x trial-to-trial variance on this platform; device traces
    reproduce to ~0.1%. The Mixtral weight set (235 MB packed / 940 MB
    bf16) exceeds the platform's ~64-128 MB fast-tier working set, so
    weights stream from HBM as in a real model.
    """
    jf = jax.jit(fn)
    np.asarray(jax.tree.leaves(jf(x, *consts))[0])  # compile + warm
    best = None
    for _ in range(traces):
        prof = device_op_times(
            lambda: np.asarray(jax.tree.leaves(jf(x, *consts))[0])
        )
        t = prof.main_module_ms() / 1e3
        best = t if best is None or t < best else best
    return best

E, K, N, TOPK = 8, 4096, 14336, 2


_WEIGHTS = {}


def build_weights(seed=0):
    """Quantize once per process — weights are generated ON DEVICE (a host
    transfer of the 1.9 GB f32 tensor through the tunnel takes minutes).

    Generation is CHUNKED over experts: quantizing all of a 64-expert
    geometry (DeepSeek/Qwen: f32 [64, 11008, 4096] = 11.5 GB) in one jit
    peaks at ~35 GB of HBM transients; 8-expert chunks keep the peak at
    the bf16 copy + one chunk's f32 (~1.5 GB)."""
    # Only build the weight sets the requested impls need: at the 64-expert
    # geometries every set is 1.4-5.8 GB resident and building all four
    # leaves no headroom for the kernels themselves.
    need = _WEIGHTS.pop("_need", {"qt", "qt_pg", "qt_pgb", "wb"})
    if _WEIGHTS:
        return _WEIGHTS

    chunk = max(1, min(E, 8))

    @functools.partial(jax.jit, static_argnames=("ec",))
    def make(key, ec):
        w = jax.random.normal(key, (ec, N, K), jnp.float32) * 0.02
        out = {}
        if "qt" in need:
            out["qt"] = quantize(w, layout="planar")
        if "qt_pg" in need:
            out["qt_pg"] = quantize(w, layout="planar",
                                    granularity="per_group", group_size=128)
        if "qt_pgb" in need:
            out["qt_pgb"] = quantize(w, layout="planar_groups",
                                     granularity="per_group", group_size=128)
        if "wb" in need:
            out["wb"] = w.astype(jnp.bfloat16)
        return out

    parts = []
    key = jax.random.PRNGKey(seed)
    for e0 in range(0, E, chunk):
        key, k1 = jax.random.split(key)
        parts.append(jax.block_until_ready(make(k1, min(chunk, E - e0))))
    import dataclasses as _dc

    def cat_qt(qts):
        first = qts[0]
        return _dc.replace(
            first,
            packed=jnp.concatenate([q.packed for q in qts], 0),
            scales=jnp.concatenate([q.scales for q in qts], 0),
            zero_points=jnp.concatenate([q.zero_points for q in qts], 0),
            shape=(E,) + tuple(first.shape[1:]),
        )

    for name in ("qt", "qt_pg", "qt_pgb"):
        if name in need:
            _WEIGHTS[name] = cat_qt([p[name] for p in parts])
    if "wb" in need:
        _WEIGHTS["wb"] = jnp.concatenate([p["wb"] for p in parts], 0)
    return _WEIGHTS


def build(num_tokens, distribution, tile_m, seed=0):
    env = dict(build_weights(seed))
    key = jax.random.PRNGKey(seed + 1)
    x = jax.random.normal(key, (num_tokens, K), jnp.bfloat16)
    logits = simulate_router_logits(
        jax.random.PRNGKey(seed), num_tokens, E, distribution
    )
    routing = topk_route(logits, TOPK, E)
    plan = make_dispatch_plan(routing, E, tile_m=tile_m)
    xs = jax.block_until_ready(dispatch(x, routing, plan))
    # capacity layout for the dense/einsum paths: same total rows as the
    # dropless plan (fair: identical GEMM work)
    env.update(xs=xs, plan=plan, cap=plan.t_pad // E)
    return env


def implementations(env, tile_m, which):
    """name -> (fn(xs, *consts), consts).

    Weights are passed as jit ARGUMENTS (consts), never closures: a closed-
    over device array lowers to a literal HLO constant, and this platform
    ships the compile request over HTTP — the bf16 weights alone are 940 MB
    (HTTP 413) and even the 235 MB packed weights made every compile an
    upload taking minutes.
    """
    qt, qt_pg, wb, plan, cap = (
        env.get("qt"), env.get("qt_pg"), env.get("wb"), env["plan"],
        env["cap"]
    )
    gids = plan.tile_group_ids

    impls = {}

    def reg(name, fn, consts):
        if not which or name in which:
            impls[name] = (fn, consts)

    def k(mode):
        return lambda xs, q: grouped_int4_matmul(
            xs, gids, q, tile_m=tile_m, mode=mode)

    reg("int4", k(None), (qt,))
    reg("int4-xres", k("x_resident"), (qt,))
    reg("int4-minner", k("m_inner"), (qt,))
    reg("int4-ninner", k("n_inner"), (qt,))
    reg("int4-ksplit", k("ksplit"), (qt,))

    def int4_dequant(xs, q):
        wd = dequantize(q, dtype=jnp.bfloat16)
        return jnp.einsum(
            "eck,enk->ecn", xs[: E * cap].reshape(E, cap, K), wd
        ).reshape(-1, N)

    if tile_m % 32 == 0:  # w4a8 kernel needs the int8 sublane tile
        reg("w4a8", lambda xs, q: grouped_int4_matmul_a8(
            xs, gids, q, tile_m=tile_m), (qt,))
    reg("pg128", lambda xs, q: grouped_int4_matmul_per_group(
        xs, gids, q, tile_m=tile_m), (qt_pg,))
    # round-5 batched-partials per-group kernel (layout="planar_groups")
    reg("pg128bp", lambda xs, q: grouped_int4_matmul_per_group(
        xs, gids, q, tile_m=tile_m), (env.get("qt_pgb"),))
    if tile_m % 32 == 0:
        from fused4bit_tpu.ops.grouped_matmul import (
            grouped_int4_matmul_per_group_a8,
        )
        reg("pg128bp8", lambda xs, q: grouped_int4_matmul_per_group_a8(
            xs, gids, q, tile_m=tile_m), (env.get("qt_pgb"),))
    reg("int4-dequant", int4_dequant, (qt,))
    reg("bf16-bmm", lambda xs, w: jnp.einsum(
        "eck,enk->ecn", xs[: E * cap].reshape(E, cap, K), w
    ).reshape(-1, N), (wb,))

    def bf16_naive(xs, w):
        # the reference's naive per-expert loop baseline
        # (`naive_grouped_gemm.py:34-41`): one dense dot per expert
        outs = []
        for e_i in range(E):
            xe = jax.lax.dynamic_slice_in_dim(xs, e_i * cap, cap, 0)
            outs.append(xe @ w[e_i].T)
        return jnp.concatenate(outs, axis=0)

    reg("bf16-naive", bf16_naive, (wb,))

    # w4a8-xla: int4-valued weights resident in i8 containers, int8
    # activations, integer einsum on the MXU — an XLA-streamed path for
    # platforms (like this tunneled chip) where XLA matmuls stream ~2.7x
    # faster than any Pallas DMA pipeline. 2x weight memory vs packed, same
    # int4 weight quality; see layers/linear (w8 resident mode).
    want_xla = not which or bool({"w4a8-xla", "w4u4-xla"} & set(which))
    if want_xla and "w8" not in _WEIGHTS:
        # EAGER build — only when an xla-resident impl is requested (the
        # full-set f32 dequant transient is 11.5 GB at 64-expert geometries)
        wd = dequantize(qt, dtype=jnp.float32)
        # re-derive the int4 integer grid: q - zp in [-15, 15] fits i8
        # (zp is integer-valued by the quantization spec)
        q_int = jnp.round(wd / qt.scales[..., None]).astype(jnp.int8)
        _WEIGHTS["w8"] = jax.block_until_ready(q_int)
        _WEIGHTS["w8_scale"] = qt.scales
    if want_xla:
        env["w8"], env["w8_scale"] = _WEIGHTS["w8"], _WEIGHTS["w8_scale"]

    def w4a8_xla(xs, w8, scale):
        xf = xs[: E * cap].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sx = jnp.clip(amax, min=1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq.reshape(E, cap, K), w8,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [E, cap, N]
        return (
            acc.astype(jnp.float32)
            * sx.reshape(E, cap, 1)
            * scale[:, None, :]
        ).reshape(-1, N).astype(xs.dtype)

    if want_xla:
        reg("w4a8-xla", w4a8_xla, (env["w8"], env["w8_scale"]))

    # w4u4-xla: TRANSIENT unpack — weights stay packed u4 in HBM (true 4-bit
    # residency, unlike w4a8-xla's permanent 2x i8 copy); each call unpacks
    # to a per-layer transient i8 tensor in-graph and runs the same integer
    # einsum. Read 0.5x + write 1x + read 1x of dense-i8 bytes, all at XLA's
    # streaming rate; MXU-bound at prefill so the unpack amortizes.
    def w4u4_xla(xs, q):
        return int4_grouped_transient(
            xs[: E * cap].reshape(E, cap, K), q
        ).reshape(-1, N)

    reg("w4u4-xla", w4u4_xla, (qt,))
    return impls


def verify_cell(env, tile_m):
    """Max rel error of the fused kernel vs an f32 dequant golden.

    The golden runs in NumPy on the host: this platform's remote compiler
    takes tens of minutes for batched einsums, and the golden needs no
    compilation at all.
    """
    import dataclasses as _dc

    qt, xs, plan = env["qt"], env["xs"], env["plan"]
    got = np.asarray(
        grouped_int4_matmul(xs, plan.tile_group_ids, qt, tile_m=tile_m),
        np.float32,
    )
    # Per-expert dequant: a one-shot f32 dequant of a 64-expert geometry is
    # 11.5 GB of device transients (OOM beside the resident weight sets).
    dq1 = jax.jit(lambda p, s, z: dequantize(_dc.replace(
        qt, packed=p, scales=s, zero_points=z, shape=qt.shape[1:]
    ), dtype=jnp.float32))
    gids = np.asarray(plan.tile_group_ids)
    wd_cache = {}

    def wd(g):
        if g not in wd_cache:
            wd_cache[g] = np.asarray(dq1(
                qt.packed[g], qt.scales[g], qt.zero_points[g]
            ))
        return wd_cache[g]

    xt = np.asarray(xs, np.float32).reshape(len(gids), plan.tile_m, -1)
    gotr = got.reshape(len(gids), plan.tile_m, -1)
    # Subsample tiles at scale: the host-side f32 golden is single-core
    # NumPy; at 64-expert prefill cells a full pass takes tens of minutes.
    # 24 evenly-spaced tiles still touch >= 24 distinct experts' weights
    # and every part of the token range.
    idx = (np.arange(len(gids)) if len(gids) <= 24
           else np.linspace(0, len(gids) - 1, 24).astype(int))
    err = denom = 0.0
    for i in idx:
        want_i = xt[i] @ wd(int(gids[i])).T
        err = max(err, float(np.max(np.abs(gotr[i] - want_i))))
        denom = max(denom, float(np.max(np.abs(want_i))))
    return err / max(denom, 1e-9)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="mixtral",
                   help="MoE geometry from the registry (mixtral / deepseek "
                        "/ glm / qwen / debug) — the same sweep generalizes "
                        "to any of the reference's model configs "
                        "(config.py:70-109); non-mixtral runs default their "
                        "artifact to moe_sweep_<name>_device.json")
    p.add_argument("--tokens", type=int, nargs="*", default=[8, 32, 128, 2048])
    p.add_argument("--dists", nargs="*", default=["uniform", "skewed"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--tile-m", type=int, default=32,
                   help="decode-regime tile; 32 = int8 sublane so the w4a8 kernel shares the plan")
    p.add_argument("--prefill-tile-m", type=int, default=128,
                   help="tile_m when T*top_k > 512 (128 fills the MXU's "
                        "systolic rows for the int8 path)")
    p.add_argument("--impls", nargs="*", default=None)
    p.add_argument("--slope", action="store_true",
                   help="TRUE per-op times via the two-point slope method "
                        "(amortizes this platform's ~3 ms per-scan-step "
                        "fixed cost; see utils.benchmark.time_fn_slope)")
    p.add_argument("--device-trace", action="store_true",
                   help="exact per-call device times via jax.profiler "
                        "traces (preferred; see time_fn_device above)")
    p.add_argument("--verify", action="store_true", default=True)
    p.add_argument("--no-verify", dest="verify", action="store_false")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    global E, K, N, TOPK
    if args.config != "mixtral":
        from fused4bit_tpu.models.config import get_config_by_name

        mc = get_config_by_name(args.config)
        E, K, N, TOPK = mc.num_experts, mc.hidden_dim, mc.ffn_dim, mc.top_k
    if args.out is None:
        name = ("mixtral_sweep.json" if args.config == "mixtral"
                else f"moe_sweep_{args.config}_device.json")
        args.out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "results", name)

    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    print(f"geometry: E={E} {K}->{N} top{TOPK} ({args.config})")

    # lazy weight sets (see build_weights): only what the requested impls
    # + verification actually touch
    core_extra = set(args.impls or []) or {
        "bf16-bmm", "bf16-naive", "int4", "int4-dequant", "w4a8",
        "w4a8-xla", "int4-xres", "int4-minner", "int4-ninner",
        "int4-ksplit", "pg128", "pg128bp", "pg128bp8", "w4u4-xla",
    }
    need = set()
    if args.verify or core_extra & {
        "int4", "int4-dequant", "w4a8", "w4a8-xla", "w4u4-xla",
        "int4-xres", "int4-minner", "int4-ninner", "int4-ksplit",
    }:
        need.add("qt")
    if "pg128" in core_extra:
        need.add("qt_pg")
    if core_extra & {"pg128bp", "pg128bp8"}:
        need.add("qt_pgb")
    if core_extra & {"bf16-bmm", "bf16-naive"}:
        need.add("wb")
    _WEIGHTS["_need"] = need
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    core = ["bf16-bmm", "bf16-naive", "int4", "int4-dequant", "w4a8", "w4a8-xla"]
    modes_at = {32, 2048}  # cells where the mode comparison runs
    for t in args.tokens:
        tile_m = args.tile_m if t * TOPK <= 512 else args.prefill_tile_m
        for dist in args.dists:
            cell_key = f"T{t}_{dist}"
            cell = results.setdefault(cell_key, {})
            extra = ["int4-xres", "int4-minner", "int4-ninner",
                     "int4-ksplit", "pg128", "pg128bp", "pg128bp8"]
            which = args.impls or (
                core + extra if (t in modes_at and dist == "uniform") else core
            )
            which = [w for w in which if w not in cell]  # resume partial runs
            if not which:
                print(f"=== T={t} dist={dist}: cached, skipping ===")
                continue
            env = build(t, dist, tile_m)
            print(f"\n=== T={t} dist={dist} tile_m={tile_m} "
                  f"t_pad={env['plan'].t_pad} ===", flush=True)
            if args.verify and "verify_rel_err" not in cell:
                rel = verify_cell(env, tile_m)
                cell["verify_rel_err"] = rel
                print(f"  verify int4 vs f32 golden: rel {rel:.5f} "
                      f"{'OK' if rel < 2e-2 else 'FAIL'}", flush=True)
            for name, (fn, consts) in implementations(env, tile_m, which).items():
                print(f"  [compile+time] {name} ...", flush=True)
                try:
                    if args.device_trace:
                        sec = time_fn_device(
                            fn, env["xs"], consts=consts,
                            traces=args.repeats,
                        )
                    elif args.slope:
                        sec = time_fn_slope(
                            fn, env["xs"], consts=consts, iters=args.iters,
                            repeats=args.repeats, warmup=1, chain=8,
                        )
                    else:
                        sec = time_fn_scan(
                            fn, env["xs"], consts=consts, iters=args.iters,
                            repeats=args.repeats, warmup=1,
                        )
                except Exception as exc:
                    print(f"  [skip] {name}: {type(exc).__name__}: "
                          f"{str(exc)[:110]}", flush=True)
                    continue
                cell[name] = round(sec * 1e3, 4)
                base = cell.get("bf16-bmm")
                sp = f"  ({base / cell[name]:.2f}x vs bf16)" if base else ""
                print(f"  {name:<14} {sec * 1e3:9.3f} ms{sp}", flush=True)
                with open(args.out, "w") as f:
                    json.dump(results, f, indent=2)
            del env
    meta = results.setdefault("_meta", {})
    if args.device_trace:
        proto = (f"time_fn_device traces={args.repeats} (jax.profiler "
                 "module device time per call — exact, host-jitter-free)")
    elif args.slope:
        proto = f"time_fn_slope iters={args.iters} chain=8"
    else:
        proto = (f"time_fn_scan iters={args.iters} repeats={args.repeats} "
                 "(scan-in-jit, min-of-repeats)")
    meta.update(dict(
        geometry=f"E={E} {K}->{N} top{TOPK}",
        protocol=proto,
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
    ))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
