#!/bin/bash
# Round-4 TPU measurement batch — regenerates every chip-dependent artifact
# queued at the end of round 3 (NOTES_r3.md "post-batch integration
# checklist"), in priority order. Each step is independently resumable:
# the persistent compile cache (benchmark/_bootstrap.py) makes re-runs
# cheap, and run_mixtral_artifact.py resumes per-cell.
#
# Run AFTER the kernel tile defaults are pinned (kernel_tile_tune_*.json),
# since every downstream number depends on the tuned kernels.
set -ux
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp}
export PYTHONUNBUFFERED=1
R=benchmark/results

# 1. flagship linear batch sweep (VERDICT r2 item 2: BASELINE configs[1])
timeout 4800 python benchmark/probe_kernel_bw.py \
    --sweep-batch 1 8 32 128 256 --out $R/linear_batch_sweep.json

# 2. kernel bandwidth probe refresh with the tuned defaults (VERDICT item 1)
timeout 3600 python benchmark/probe_kernel_bw.py --out $R/kernel_bw_probe.json

# 3. attention sweep regen post rounding-fix (VERDICT item 5; expect ~1.1%
#    rel err flat across contexts)
timeout 4800 python benchmark/run_attention_benchmark.py \
    --contexts 1024 4096 8192 16384 --out $R/attention_sweep.json

# 4. Mixtral MoE-layer slope sweep with the tuned kernels + w4u4-xla
#    (VERDICT item 1: does packed-u4 win prefill now?)
rm -f $R/mixtral_sweep_slope.json
timeout 10800 python benchmark/run_mixtral_artifact.py --slope \
    --tokens 8 32 2048 --dists uniform skewed \
    --out $R/mixtral_sweep_slope.json
timeout 3600 python benchmark/run_mixtral_artifact.py --slope \
    --tokens 8 32 2048 --dists uniform \
    --impls w4u4-xla pg128 --out $R/mixtral_sweep_slope.json

# 5. serving throughput: decode_block ranking + paged + speculative rows
#    (VERDICT item 4)
rm -f $R/serving_throughput.json
for d in 1 4 16; do
  timeout 2400 python benchmark/run_serving_benchmark.py --scale small \
      --mode kernel --decode-block $d --json $R/serving_throughput.json
done
timeout 2400 python benchmark/run_serving_benchmark.py --scale small \
    --mode u4_turbo --decode-block 4 --json $R/serving_throughput.json
timeout 2400 python benchmark/run_serving_benchmark.py --scale small \
    --mode kernel --decode-block 4 --paged --json $R/serving_throughput.json
timeout 2400 python benchmark/run_serving_benchmark.py --scale small \
    --mode kernel --spec-draft self --json $R/serving_throughput.json
timeout 2400 python benchmark/run_serving_benchmark.py --scale small \
    --mode kernel --spec-draft tiny --json $R/serving_throughput.json

# 6. h256 trained fixture on the TPU backend (VERDICT item 6) + quality eval
#    for both fixtures on TPU
if [ ! -f tests/fixtures/tiny_trained_h256.safetensors ]; then
  TRAIN_TINY_BACKEND=tpu TRAIN_TINY_HIDDEN=256 TRAIN_TINY_STEPS=2000 \
      TRAIN_TINY_NAME=tiny_trained_h256 \
      timeout 4800 python scripts/train_tiny.py
fi
QUALITY_EVAL_CPU=0 \
    QUALITY_EVAL_FIXTURE=tests/fixtures/tiny_trained_h256.safetensors \
    QUALITY_EVAL_OUT=$R/quality_trained_h256.json \
    timeout 4800 python benchmark/run_quality_eval.py
QUALITY_EVAL_CPU=0 timeout 4800 python benchmark/run_quality_eval.py

# 7. speculative decoding envelope
timeout 3600 python benchmark/run_speculative_benchmark.py || true

# 8. headline sanity
timeout 1800 python bench.py
