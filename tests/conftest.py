"""Test configuration: force an 8-device virtual CPU mesh before jax initializes.

Mirrors the reference's DistCall pattern (tests/test_utils.py:411) — multi-device
collective tests run on CPU-only CI via XLA's host platform device count.

The axon TPU plugin registers its PJRT backend from sitecustomize at interpreter start
(gated on PALLAS_AXON_POOL_IPS), before any conftest runs — so when that env var is
present we re-exec pytest once with a cleaned environment.
"""
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_MONAI_TPU_TEST_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    env["_MONAI_TPU_TEST_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

# tests are CPU-only by design; also overrides a leftover JAX_PLATFORMS=axon that
# cannot initialize once PALLAS_AXON_POOL_IPS is removed
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
