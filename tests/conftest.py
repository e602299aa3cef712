"""Test configuration: CPU backend with 8 virtual devices + float64.

The test suite runs on CPU (x64 available, multi-device sharding via
XLA_FLAGS=--xla_force_host_platform_device_count) regardless of attached
accelerators; TPU-specific numerics are covered by bench.py on real hardware.
"""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to "axon,cpu"; override it before
# any computation so tests deterministically run on the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def laplacian_1d(n, dtype=np.float64):
    """SymTridiagonal(2, -1): the reference test suite's analytic fixture
    (test/runtests.jl tridiagonal Laplacians); spectrum 2-2cos(k*pi/(n+1))."""
    A = (np.diag(2.0 * np.ones(n)) + np.diag(-1.0 * np.ones(n - 1), 1)
         + np.diag(-1.0 * np.ones(n - 1), -1))
    return A.astype(dtype)


def laplacian_eigs(n):
    k = np.arange(1, n + 1)
    return 2.0 - 2.0 * np.cos(k * np.pi / (n + 1))
