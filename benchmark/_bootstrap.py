"""Make the repo root importable when running benchmark scripts directly."""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


# FUSED4BIT_CPU=1 forces the CPU platform before first backend use — the
# JAX_PLATFORMS env var is ignored by this build when a TPU plugin is
# present (AGENTS.md), and a dead tunnel otherwise hangs backend init.
if os.environ.get("FUSED4BIT_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
