#!/usr/bin/env python
"""Weight-stream bandwidth probe: XLA yardstick vs Pallas kernels + variants.

Round-3 instrument for VERDICT item 1 (close the Pallas-vs-XLA bandwidth
gap). Protocol: ``time_chain_slope`` — chains of DISTINCT up/down projection
pairs at the flagship linear geometry (4096 -> 11008 -> 4096, the reference's
headline shape, `/root/reference/benchmark/run_benchmark.py:54-58`), slope
between a short and a long chain. Single-op slope chains proved jitter-bound
below ~0.5 ms and can re-serve a repeated weight stream (4.4 TB/s artifacts);
distinct weights per link make every chain position stream fresh bytes, like
a real model.

Measured per implementation: per-PAIR ms and achieved weight GB/s
(= pair weight bytes / time — the roofline currency of the memory-bound
decode regime, reference bytes model `run_benchmark.py:219-238`).

* ``xla_bf16``   — dense bf16 pair: the XLA streaming yardstick.
* ``xla_i8``     — int8-resident XLA mode (`ops/int8_xla.py`).
* ``stream_u4``  — Pallas DMA of the packed pair with ~zero compute: the
                   Pallas pipeline ceiling.
* ``w4a16`` / ``w4a8`` / ``w4a8_3dot`` / ``w4pg128`` — fused kernels+variants.
"""
import argparse
import functools
import json
import sys

import _bootstrap  # noqa: F401  (repo path + persistent compile cache)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")  # repo root
from fused4bit_tpu.ops.int4_matmul import (  # noqa: E402
    int4_matmul,
    int4_matmul_a8,
    int4_matmul_per_group,
    _round_up,
)
from fused4bit_tpu.ops.int8_xla import int8_linear, to_int8_resident  # noqa: E402
from fused4bit_tpu.quant.core import dequantize, quantize  # noqa: E402
from fused4bit_tpu.utils.benchmark import time_chain_slope  # noqa: E402


# ---------------------------------------------------------------------------
# Pure-stream kernel: price the Pallas DMA pipeline with ~zero compute
# ---------------------------------------------------------------------------


def _stream_kernel(x_ref, w_ref, o_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    # Touch a sliver of the block (the DMA moved all of it regardless) and
    # mix in x so the call can't be hoisted out of the timing loop.
    o_ref[:] += (
        pltpu.bitcast(w_ref[:8, :128], jnp.int8).astype(jnp.float32)
        * x_ref[:].astype(jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("tile_n",))
def _stream_u4(x8, packed, *, tile_n):
    n, k_half = packed.shape
    grid = (n // tile_n,)
    return pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k_half), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x8, packed)


# ---------------------------------------------------------------------------
# w4a8 variant: 1 mask + 3 dots (p_i8 = vhi + q_lo identity, see pack_planar)
# ---------------------------------------------------------------------------


def _a8_3dot_kernel(
    xq_ref, w_ref, s_ref, z_ref, sx_ref, o_ref, *, k_half: int
):
    p = w_ref[:]
    p_i8 = pltpu.bitcast(p, jnp.int8)          # = 16*(q_hi-8) + q_lo
    vhi = pltpu.bitcast(p & 0xF0, jnp.int8)    # = 16*(q_hi-8)

    x_lo = xq_ref[:, :k_half]
    x_hi = xq_ref[:, k_half:]
    dims = (((1,), (1,)), ((), ()))
    dot_p = jax.lax.dot_general(x_lo, p_i8, dims, preferred_element_type=jnp.int32)
    dot_vlo = jax.lax.dot_general(x_lo, vhi, dims, preferred_element_type=jnp.int32)
    dot_vhi = jax.lax.dot_general(x_hi, vhi, dims, preferred_element_type=jnp.int32)
    acc = (dot_p - dot_vlo) + (dot_vhi >> 4)
    xsl = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    xsh = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True)
    zp = z_ref[0, :][None, :]
    yq = (acc + 8 * xsh).astype(jnp.float32) - zp * (xsl + xsh).astype(jnp.float32)
    o_ref[:] = (s_ref[0, :][None, :] * sx_ref[:] * yq).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n"))
def _a8_3dot(xq, sx, packed, scales, zps, *, tile_m, tile_n):
    m, k = xq.shape
    n, k_half = packed.shape
    grid = (m // tile_m, n // tile_n)
    kernel = functools.partial(_a8_3dot_kernel, k_half=k_half)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k_half), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(xq, packed, scales[None, :], zps[None, :], sx)


def _quant_acts(x2):
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.clip(amax, min=1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def a8_3dot_call(x, qt, *, tile_n=1024):
    m, k = x.shape
    n = qt.out_dim
    n_pad = _round_up(n, tile_n)
    xq, sx = _quant_acts(x)
    m_pad = max(_round_up(m, 32), 32)
    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad - m), (0, 0)))
    packed, scales, zps = qt.packed, qt.scales, qt.zero_points
    if n_pad != n:
        packed = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad - n))
        zps = jnp.pad(zps, (0, n_pad - n))
    out = _a8_3dot(
        xq, sx.astype(jnp.float32), packed,
        scales.astype(jnp.float32), zps.astype(jnp.float32),
        tile_m=m_pad, tile_n=tile_n,
    )
    return out[:m, :n].astype(x.dtype)


# ---------------------------------------------------------------------------


def build_pairs(k, n, num, *, pg=False, seed=0):
    """`num` distinct (up [N,K], down [K,N]) quantized projection pairs."""
    pairs = []
    key = jax.random.PRNGKey(seed)
    for i in range(num):
        key, k1, k2 = jax.random.split(key, 3)
        wu = jax.random.normal(k1, (n, k), jnp.float32) * (k ** -0.5)
        wd = jax.random.normal(k2, (k, n), jnp.float32) * (n ** -0.5)
        kwargs = (
            dict(granularity="per_group", group_size=128, layout="planar")
            if pg else dict(granularity="per_row", layout="planar")
        )
        pairs.append((quantize(wu, **kwargs), quantize(wd, **kwargs)))
    return pairs


def sweep_batches(args):
    """Flagship linear artifact: per-batch true latency of a distinct
    up(4096->11008)/down(11008->4096) pair chain — a real 2-layer FFN with
    data dependence — for bf16 XLA vs the fused kernels. Per-PAIR ms stands
    ~pairs x above the platform's fixed per-iteration cost, so the numbers
    are not floor-compressed (reference shape `run_benchmark.py:54-58`)."""
    k, n = args.k, args.n
    qpairs = build_pairs(k, n, args.pairs)
    bf16_pairs = [
        (dequantize(u, dtype=jnp.bfloat16).T, dequantize(d, dtype=jnp.bfloat16).T)
        for (u, d) in qpairs
    ]
    pair_bytes_u4 = (n * k // 2 + 8 * n) + (k * n // 2 + 8 * k)
    pair_bytes_bf16 = 2 * k * n * 2

    def bf16_step(y, ws):
        wu, wd = ws
        return jnp.dot(jnp.sin(jnp.dot(y, wu)), wd)

    out = {}
    for b in args.sweep_batch:
        x = jax.random.normal(
            jax.random.PRNGKey(9), (b, k), jnp.float32
        ).astype(jnp.bfloat16)
        row = {}
        for name, step, pairs, pbytes in (
            ("bf16", bf16_step, bf16_pairs, pair_bytes_bf16),
            ("w4a16", mk_kernel_step_g(int4_matmul), qpairs, pair_bytes_u4),
            ("w4a8", mk_kernel_step_g(int4_matmul_a8), qpairs, pair_bytes_u4),
        ):
            try:
                t = time_chain_slope(
                    step, x, pairs, p_small=1, p_large=len(pairs),
                    iters=args.iters,
                )
                row[name] = {
                    "ms_per_pair": round(t * 1e3, 4),
                    "weight_gbps": round(pbytes / t / 1e9, 1),
                }
                print(f"b={b:<4} {name:<6} {t*1e3:8.4f} ms/pair "
                      f"{pbytes/t/1e9:8.1f} GB/s")
            except Exception as err:
                row[name] = {"error": str(err)[:300]}
                print(f"b={b:<4} {name:<6} FAILED {str(err)[:120]}")
        if "bf16" in row and "ms_per_pair" in row.get("bf16", {}):
            for kk in ("w4a16", "w4a8"):
                if "ms_per_pair" in row.get(kk, {}):
                    row[kk]["speedup_vs_bf16"] = round(
                        row["bf16"]["ms_per_pair"] / row[kk]["ms_per_pair"], 3
                    )
        out[f"batch{b}"] = row
        doc = {
            "shape": {"k": k, "n": n},
            "protocol": (
                "time_chain_slope over DISTINCT up/down pairs (true 2-layer "
                "FFN chain); per-pair ms = slope between 1-pair and "
                f"{args.pairs}-pair chain steps, host-fetch barrier, median"
            ),
            "device": str(jax.devices()[0]),
            "results": out,
        }
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")


def mk_kernel_step_g(call, **kw):
    def step(y, ws):
        qu, qd = ws
        return call(jnp.sin(call(y, qu, **kw)), qd, **kw)
    return step


def tune_tiles(args):
    """Sweep the kernel tile_n knob per projection direction.

    tile_n is the DMA/compute-overlap granularity of the fused kernels: the
    weight stream is pipelined in [tile_n, K/2] blocks, so fewer/bigger
    blocks amortize per-step overhead while more/smaller blocks overlap
    better and fit double buffering. The wrapper's default is a VMEM-budget
    heuristic (`int4_matmul.py` tn caps); this sweep measures the truth at
    the flagship pair shape and writes `kernel_tile_tune.json` so the
    defaults can be pinned to measured winners (VERDICT r2 item 1).

    Grid: (tn_up for the 4096->11008 call) x (tn_down for 11008->4096),
    chained-pairs slope protocol, one kernel impl per --tune value.
    """
    k, n = args.k, args.n
    call = {"w4a16": int4_matmul, "w4a8": int4_matmul_a8}[args.tune]
    qpairs = build_pairs(k, n, args.pairs)
    x = jax.random.normal(jax.random.PRNGKey(9), (args.m, k), jnp.float32).astype(
        jnp.bfloat16
    )
    pair_bytes = (n * k // 2 + 8 * n) + (k * n // 2 + 8 * k)

    def mk_step(tn_up, tn_dn):
        def step(y, ws):
            qu, qd = ws
            return call(jnp.sin(call(y, qu, tile_n=tn_up)), qd, tile_n=tn_dn)
        return step

    # Up-proj weight block is [tn, 2048] bytes; down-proj [tn, 5504].
    # Keep double-buffered blocks within the proven ~8 MB total.
    ups = [t for t in args.tune_tiles if t * (k // 2) <= 4_194_304]
    dns = [t for t in args.tune_tiles if t * (n // 2) <= 4_194_304]
    results, best = {}, None
    for tu in ups:
        for td in dns:
            name = f"up{tu}_dn{td}"
            try:
                t = time_chain_slope(
                    mk_step(tu, td), x, qpairs,
                    p_small=1, p_large=len(qpairs), iters=args.iters,
                )
                results[name] = {
                    "ms_per_pair": round(t * 1e3, 4),
                    "weight_gbps": round(pair_bytes / t / 1e9, 1),
                }
                print(f"{name:<14} {t*1e3:8.4f} ms/pair "
                      f"{pair_bytes/t/1e9:8.1f} GB/s")
                if best is None or t < best[1]:
                    best = (name, t)
            except Exception as err:
                results[name] = {"error": str(err)[:300]}
                print(f"{name:<14} FAILED {str(err)[:120]}")
    doc = {
        "impl": args.tune,
        "shape": {"m": args.m, "k": k, "n": n},
        "protocol": "time_chain_slope over distinct up/down pairs",
        "device": str(jax.devices()[0]),
        "best": best[0] if best else None,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"best={best[0] if best else 'n/a'}; wrote {args.out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=11008)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--out", default="benchmark/results/kernel_bw_probe.json")
    ap.add_argument("--only", default="", help="comma list of measure names")
    ap.add_argument(
        "--sweep-batch", type=int, nargs="*", default=None,
        help="measure {xla_bf16, w4a16, w4a8} at each batch size under the "
             "chained-pairs protocol and write the flagship linear batch-"
             "sweep artifact (BASELINE configs[1]; replaces the floor-"
             "dominated time_fn_slope sweep, VERDICT r2 item 2)",
    )
    ap.add_argument(
        "--tune", choices=["w4a16", "w4a8"], default=None,
        help="sweep (tile_n up x tile_n down) for one kernel impl and write "
             "the tile-tune artifact",
    )
    ap.add_argument(
        "--tune-tiles", type=int, nargs="*",
        default=[256, 512, 768, 1024, 1536, 2048],
    )
    args = ap.parse_args()

    if args.tune:
        return tune_tiles(args)
    if args.sweep_batch:
        return sweep_batches(args)

    m, k, n = args.m, args.k, args.n
    x = jax.random.normal(jax.random.PRNGKey(9), (m, k), jnp.float32).astype(
        jnp.bfloat16
    )
    np_ = args.pairs

    qpairs = build_pairs(k, n, np_)
    bf16_pairs = [
        (dequantize(u, dtype=jnp.bfloat16).T, dequantize(d, dtype=jnp.bfloat16).T)
        for (u, d) in qpairs[: max(2, np_ // 2 + 1)]
    ]
    i8_pairs = [(to_int8_resident(u), to_int8_resident(d)) for (u, d) in qpairs]
    n_pad = _round_up(n, 1024)
    stream_pairs = [
        (
            jnp.pad(u.packed, ((0, n_pad - n), (0, 0))),
            d.packed,  # [K, N/2]: K=4096 rows — already tiles by 1024
        )
        for (u, d) in qpairs
    ]

    pair_bytes_u4 = (n * k // 2 + 8 * n) + (k * n // 2 + 8 * k)
    pair_bytes = {
        "xla_bf16": 2 * k * n * 2,
        "xla_i8": (k * n + 4 * n) + (n * k + 4 * k),
        "stream_u4": n_pad * k // 2 + k * n // 2,
        "w4a16": pair_bytes_u4,
        "w4a8": pair_bytes_u4,
        "w4a8_3dot": pair_bytes_u4,
        "w4pg128": (n * k // 2 + 8 * n * k // 128) + (k * n // 2 + 8 * k * n // 128),
    }

    def bf16_step(y, ws):
        wu, wd = ws
        h = jnp.dot(y, wu)
        return jnp.dot(jnp.sin(h), wd)

    def i8_step(y, ws):
        wu, wd = ws
        return int8_linear(jnp.sin(int8_linear(y, wu)), wd)

    def stream_step(y, ws):
        pu, pd = ws
        a1 = _stream_u4(y[:8, :128].astype(jnp.bfloat16), pu, tile_n=1024)
        a2 = _stream_u4(y[:8, :128].astype(jnp.bfloat16), pd, tile_n=1024)
        mix = (jnp.tanh(jnp.sum(a1) + jnp.sum(a2)) * 1e-6).astype(y.dtype)
        return y + mix

    def mk_kernel_step(call, **kw):
        def step(y, ws):
            qu, qd = ws
            return call(jnp.sin(call(y, qu, **kw)), qd, **kw)
        return step

    measures = {
        "xla_bf16": (bf16_step, bf16_pairs),
        "xla_i8": (i8_step, i8_pairs),
        "stream_u4": (stream_step, stream_pairs),
        "w4a16": (mk_kernel_step(int4_matmul), qpairs),
        "w4a8": (mk_kernel_step(int4_matmul_a8), qpairs),
        "w4a8_3dot": (mk_kernel_step(a8_3dot_call), qpairs),
    }
    only = [s for s in args.only.split(",") if s]
    if not only or "w4pg128" in only:
        pg_pairs = build_pairs(k, n, np_, pg=True, seed=7)
        measures["w4pg128"] = (mk_kernel_step(int4_matmul_per_group), pg_pairs)

    results = {}
    for name, (step, pairs) in measures.items():
        if only and name not in only:
            continue
        try:
            t = time_chain_slope(
                step, x, pairs, p_small=1, p_large=len(pairs), iters=args.iters
            )
        except Exception as err:  # keep other measures on a per-impl failure
            results[name] = {"error": str(err)[:300]}
            print(f"{name:<12} FAILED: {str(err)[:160]}")
            continue
        gbps = pair_bytes[name] / t / 1e9
        results[name] = {"ms_per_pair": round(t * 1e3, 4),
                         "weight_gbps": round(gbps, 1)}
        print(f"{name:<12} {t*1e3:8.3f} ms/pair   {gbps:8.1f} GB/s (weight stream)")

    out = {
        "shape": {"m": m, "k": k, "n": n},
        "protocol": (
            "time_chain_slope: chains of DISTINCT up/down pairs, slope "
            "between 1-pair and max-pair steps, host-fetch barrier, median"
        ),
        "device": str(jax.devices()[0]),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
