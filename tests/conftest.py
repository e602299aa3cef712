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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    A single pytest process accumulates hundreds of XLA:CPU programs over
    the full suite; the long-lived LLVM JIT state has been observed to
    SEGFAULT on a late compile (jax backend_compile_and_load, ~91% into
    the run) while every module passes in isolation. Dropping the
    compilation caches at module boundaries bounds that accumulated state;
    cross-module program reuse is rare, so the recompile cost is small."""
    yield
    jax.clear_caches()


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
