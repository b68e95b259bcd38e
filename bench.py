#!/usr/bin/env python
"""Driver benchmark: INT4 model decode vs its dense bf16 twin.

The framework headline, in the reference's own comparison philosophy (its
2.14x is fused-INT4-kernel vs naive-FP16 MoE, `README.md:24-34`): a
Mixtral-geometry INT4 decoder (fused Pallas linear + grouped MoE kernels +
INT4 KV cache) against the same model dequantized to bf16 and run the plain
XLA way (dense matmuls, per-token expert gather, bf16 KV cache) — identical
function, two execution strategies, measured as a real autoregressive
lax.scan decode loop on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`value` = INT4 model ms/decode-step (batch 8) on 2 layers of the exact
Mixtral-8x7B layer geometry (8e, 4096->14336, top-2); `vs_baseline` =
strong bf16-twin latency / INT4 latency (reference target: >= 2x,
BASELINE.md). The smaller h=1024 scale is reported under "small_scale"
(incl. the naive-gather parity row).

Timing protocol notes (tunneled/virtualized chips): fresh token inputs per
repeat — identical repeated requests can return anomalously fast — and
median-of-repeats with an explicit block per run.
"""
import json
import os
import sys
import time

# Persistent compile cache: the layer2-scale programs take minutes to
# compile on the remote compiler; cached re-runs (the driver runs this
# several times) skip that entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from fused4bit_tpu.models.config import flagship_model_config
    from fused4bit_tpu.models.dense_baseline import dense_from_quantized
    from fused4bit_tpu.models.transformer import QuantizedTransformer

    from fused4bit_tpu.models.transformer import as_u4_turbo, as_xla_turbo

    # Headline scale: 2 layers of the EXACT reference flagship layer
    # geometry (8e, 4096->14336, top-2) — the memory-bound regime INT4
    # exists for (bf16 twin streams ~5.7 GB/step; INT4 ~0.6 GB; 4 layers
    # OOM with both twins resident, models/config.py "layer2"). The
    # smaller "small" scale (h=1024, ffn=3584) is measured alongside for
    # continuity with earlier rounds; at that size decode is NOT
    # weight-bound and the INT4-vs-strong gap honestly compresses to ~1x.
    cfg = flagship_model_config("layer2")
    cfg_s = flagship_model_config("small")
    b, steps = 8, 24

    def bench(m, caches):
        @jax.jit
        def loop(m, caches, tok0, pos0):
            def body(carry, _):
                tok, caches, pos = carry
                logits, caches = m(tok, caches, pos)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                return (nxt, caches, pos + 1), nxt

            _, toks = jax.lax.scan(body, (tok0, caches, pos0), None, length=steps)
            return toks

        pos0 = jnp.zeros((b, 1), jnp.int32)
        np.asarray(loop(m, caches, jnp.zeros((b, 1), jnp.int32), pos0))  # compile
        ts = []
        for r in range(4):
            tok0 = jnp.full((b, 1), r + 3, jnp.int32)
            t0 = time.perf_counter()
            # HOST FETCH as the barrier: block_until_ready returns early for
            # XLA-only programs on this backend (the bf16 twins have no
            # Pallas calls), silently under-measuring them.
            np.asarray(loop(m, caches, tok0, pos0))
            ts.append((time.perf_counter() - t0) / steps)
        return sorted(ts)[len(ts) // 2]

    def bench_device(m, caches):
        """Device-trace per-step ms (utils/device_profile): module device
        time of the whole 24-step scan / steps — exact, immune to the
        host-dispatch jitter the wall numbers above carry. None off-TPU or
        if the profiler yields no device events."""
        try:
            from fused4bit_tpu.utils.device_profile import device_op_times

            @jax.jit
            def loop(m, caches, tok0, pos0):
                def body(carry, _):
                    tok, caches, pos = carry
                    logits, caches = m(tok, caches, pos)
                    nxt = jnp.argmax(
                        logits[:, -1], axis=-1
                    ).astype(jnp.int32)[:, None]
                    return (nxt, caches, pos + 1), nxt

                _, toks = jax.lax.scan(
                    body, (tok0, caches, pos0), None, length=steps
                )
                return toks

            tok0 = jnp.zeros((b, 1), jnp.int32)
            pos0 = jnp.zeros((b, 1), jnp.int32)
            np.asarray(loop(m, caches, tok0, pos0))  # compile + warm
            best = None
            for _ in range(3):
                prof = device_op_times(
                    lambda: np.asarray(loop(m, caches, tok0, pos0))
                )
                if not prof.by_module:
                    return None
                t = prof.main_module_ms("jit_loop") / steps
                best = t if best is None or t < best else best
            return best
        except Exception:
            return None

    import gc

    # --- headline scale (layer2): sequential construction keeps peak HBM
    # at int4 + one bf16 twin (~6.3 GB of 15.75, + ~1.9 GB dequant
    # transient while the twin materializes).
    model = QuantizedTransformer.init(jax.random.PRNGKey(0), cfg)
    t_kernel = bench(model, model.init_cache(cfg, b, 256))
    d_kernel = bench_device(model, model.init_cache(cfg, b, 256))
    u4 = as_u4_turbo(model)  # packed-u4 residency + w4a8 decode kernels
    t_u4 = bench(u4, u4.init_cache(cfg, b, 256))
    d_u4 = bench_device(u4, u4.init_cache(cfg, b, 256))
    del u4
    strong = dense_from_quantized(model, moe_impl="dense_all")
    t_strong = bench(strong, strong.init_cache(cfg, b, 256))
    d_strong = bench_device(strong, strong.init_cache(cfg, b, 256))
    del strong
    gc.collect()
    turbo = as_xla_turbo(model)       # int8-resident XLA mode (ops/int8_xla)
    t_turbo = bench(turbo, turbo.init_cache(cfg, b, 256))
    del turbo, model
    gc.collect()

    # --- small scale (continuity + the naive-gather reference-parity row;
    # the gather twin's [T*k, ffn, H] buffers don't fit at layer2 scale).
    model_s = QuantizedTransformer.init(jax.random.PRNGKey(1), cfg_s)
    t_kernel_s = bench(model_s, model_s.init_cache(cfg_s, b, 256))
    naive_s = dense_from_quantized(model_s)
    t_naive_s = bench(naive_s, naive_s.init_cache(cfg_s, b, 256))
    del naive_s
    gc.collect()
    strong_s = dense_from_quantized(model_s, moe_impl="dense_all")
    t_strong_s = bench(strong_s, strong_s.init_cache(cfg_s, b, 256))
    del strong_s, model_s
    gc.collect()

    # The INT4 model's headline config is whichever int4 execution mode wins
    # on this platform (packed-u4 Pallas kernels vs int8-resident XLA —
    # ops/int8_xla.py documents the platform trade). Both modes run DROPLESS
    # MoE at decode (xla_turbo's capacity/drop layout applies only at prefill
    # sizes, models/transformer.py MoEBlock.__call__), so this min() compares
    # identical semantics. vs_baseline is the STRONG dense twin (each
    # expert's weights streamed exactly once per step — real dense_all since
    # the moe_impl plumbing fix; earlier rounds' "strong" silently measured
    # the gather impl); vs_naive_dense_small mirrors the reference's
    # naive-FP16 comparison philosophy (README.md:24-34) at the small scale
    # where the gather twin fits.
    t_int4 = min(t_kernel, t_u4, t_turbo)
    d_int4 = min(x for x in (d_kernel, d_u4) if x is not None) \
        if (d_kernel or d_u4) else None
    print(json.dumps({
        "metric": "int4_model_decode_ms_per_step_mixtral_layer_geometry_2L_b8",
        "value": round(t_int4 * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(t_strong / t_int4, 3),
        "vs_strong_dense": round(t_strong / t_int4, 3),
        "int4_kernel_ms": round(t_kernel * 1e3, 3),
        "int4_u4_turbo_ms": round(t_u4 * 1e3, 3),
        "int4_xla_turbo_ms": round(t_turbo * 1e3, 3),
        "bf16_strong_ms": round(t_strong * 1e3, 3),
        "small_scale": {
            "int4_kernel_ms": round(t_kernel_s * 1e3, 3),
            "bf16_strong_ms": round(t_strong_s * 1e3, 3),
            "bf16_naive_ms": round(t_naive_s * 1e3, 3),
            "vs_strong_dense": round(t_strong_s / t_kernel_s, 3),
            "vs_naive_dense": round(t_naive_s / t_kernel_s, 3),
        },
        # device-trace per-step ms (exact on-device time inside the scan;
        # the wall numbers above include the platform's per-dispatch cost)
        "int4_kernel_device_ms": (
            round(d_kernel, 3) if d_kernel is not None else None
        ),
        "int4_u4_turbo_device_ms": (
            round(d_u4, 3) if d_u4 is not None else None
        ),
        "bf16_strong_device_ms": (
            round(d_strong, 3) if d_strong is not None else None
        ),
        "vs_strong_dense_device": (
            round(d_strong / d_int4, 3)
            if d_int4 and d_strong else None
        ),
        # provenance: CPU numbers (chip outage fallback) are interpret-mode
        # and NOT comparable to TPU runs
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    sys.exit(main())
