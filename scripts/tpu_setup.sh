#!/usr/bin/env bash
# TPU VM setup + verification script.
# Counterpart of the reference's benchmark/runpod_setup.sh (GPU detect,
# install, build, import-check, run benchmarks) for TPU VMs.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 1. device check ==="
python - <<'PY'
import jax
devs = jax.devices()
print(f"backend: {jax.default_backend()}  devices: {devs}")
assert devs, "no JAX devices visible"
PY

echo "=== 2. native packer build ==="
python - <<'PY'
from fused4bit_tpu import native
print("native packer:", "OK" if native.native_available() else "using NumPy fallback")
PY

echo "=== 3. import check ==="
python - <<'PY'
import fused4bit_tpu as f
print("fused4bit_tpu", f.__version__, "exports:", len(f.__all__))
PY

echo "=== 4. test suite (virtual 8-device CPU mesh) ==="
python -m pytest tests/ -q

echo "=== 5. kernel smoke on hardware ==="
python bench.py

echo "=== 6. benchmarks ==="
python benchmark/run_benchmark.py --quick
python benchmark/run_moe_benchmark.py --config debug --tokens 64 --iters 10

echo "all good."
