"""Test configuration: force an 8-device virtual CPU mesh before tests run.

Mirrors the reference's DistCall pattern (tests/test_utils.py:411) — multi-device
collective tests run on CPU-only CI via XLA's host platform device count.

The axon TPU plugin initializes its PJRT backend from sitecustomize at interpreter
start (gated on PALLAS_AXON_POOL_IPS), before any conftest runs. Earlier rounds
re-exec'd pytest with a cleaned env, which silently lost pytest's stdout (the
parent's capture owned fd 1 and the exit skipped its restore). Instead the backend
is switched in-process: update jax_platforms and clear the already-created
backends so the next lookup builds the 8-device CPU client.
"""
import os

# MONAI_TPU_TEST_REAL_TPU=1 keeps the real backend so TPU-only tests (e.g. the
# Pallas window-attention parity class) can run against hardware; the default
# is the 8-device virtual CPU mesh for deterministic CI.
_USE_REAL_TPU = os.environ.get("MONAI_TPU_TEST_REAL_TPU", "0") == "1"
if not _USE_REAL_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if not _USE_REAL_TPU:
    jax.config.update("jax_platforms", "cpu")
if not _USE_REAL_TPU and jax._src.xla_bridge._backends:
    # sitecustomize already initialized a TPU backend
    from jax.extend.backend import clear_backends

    clear_backends()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
