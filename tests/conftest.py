"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding tests need >1 device; the reference never needed this
(single-GPU library), but our parallel layer does. Pallas kernels run in
interpreter mode on CPU (see fused4bit_tpu.ops), so the full suite is
hardware-independent; on a real TPU the same tests exercise compiled kernels.
"""
import os

# Must be set before jax is imported anywhere. Force CPU (the ambient
# environment may point JAX at a tunneled TPU); set FUSED4BIT_TEST_TPU=1 to
# run the suite against real hardware instead.
if not os.environ.get("FUSED4BIT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
