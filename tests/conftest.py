"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding tests need >1 device; the reference never needed this
(single-GPU library), but our parallel layer does. Pallas kernels run in
interpreter mode on CPU (see fused4bit_tpu.ops), so the full suite is
hardware-independent; on a real TPU the same tests exercise compiled kernels
(set FUSED4BIT_TEST_TPU=1).
"""
import os

# Must run before jax initializes a backend. Note this JAX build ignores the
# JAX_PLATFORMS *env var* when a TPU plugin is tunneled in — only the config
# knob reliably forces CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if not os.environ.get("FUSED4BIT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
