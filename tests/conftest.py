"""Test harness configuration.

Tests run on CPU in float64 — the reference is Float64 throughout, and the
numerics tests (finite-difference gradient checks, Cholesky identities)
need f64 to be meaningful. A virtual 8-device CPU mesh is forced so the
multi-chip sharding paths are exercised without TPU hardware
(tests/test_parallel.py).

IMPORTANT ordering note: on the target machine a sitecustomize imports jax
at interpreter startup with JAX_PLATFORMS=axon (the TPU relay). Setting
os.environ here is therefore too late; jax.config.update('jax_platforms')
must be used, which works as long as no backend has been initialized yet.
Without this, "CPU" tests silently run float64 over the TPU relay — minutes
per test and intermittent multi-minute stalls on relay I/O.
"""
import os

# Harmless when jax is not yet imported; the authoritative override is the
# config.update below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
