"""Make the repo root importable when running benchmark scripts directly."""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# Persistent compile cache: the remote compiler on this platform is slow
# (~10-40 s per jit), so every benchmark script wants re-runs and partial
# sweeps to hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def _enable_compile_cache():
    import jax

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


_enable_compile_cache()


# FUSED4BIT_CPU=1 forces the CPU platform before first backend use — the
# JAX_PLATFORMS env var is ignored by this build when a TPU plugin is
# present (AGENTS.md), and a dead tunnel otherwise hangs backend init.
if os.environ.get("FUSED4BIT_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
