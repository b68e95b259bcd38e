#!/bin/bash
# Round-4 TPU measurement batch — remaining artifact regens after the
# device-trace protocol migration (see NOTES_r4.md). Steps already done
# interactively: device_bw.json, linear_batch_sweep.json,
# mixtral_sweep_device.json. Each step is independently resumable; the
# persistent compile cache (benchmark/_bootstrap.py) makes re-runs cheap.
set -ux
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp}
export PYTHONUNBUFFERED=1
R=benchmark/results

# 1. attention sweep regen post rounding-fix (VERDICT item 5; expect ~1.1%
#    rel err flat across contexts) — device-trace protocol
rm -f $R/attention_sweep.json
timeout 4800 python benchmark/run_attention_benchmark.py \
    --contexts 1024 4096 8192 16384 --out $R/attention_sweep.json

# 2. serving throughput: decode_block ranking + paged + speculative rows
#    (VERDICT item 4) — wall-clock on purpose (it measures the host-driven
#    serving system)
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

# 3. h256 trained fixture on the TPU backend (VERDICT item 6) + quality
#    evals for both fixtures
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

# 4. speculative decoding envelope
timeout 3600 python benchmark/run_speculative_benchmark.py || true

# 5. headline sanity (now also reports device-trace per-step fields)
timeout 1800 python bench.py
