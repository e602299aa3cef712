"""Benchmark: dense generalized symmetric FEAST on the real TPU chip.

Measures BASELINE.json config 2 ("Dense generalized Hermitian Ax=lamBx,
n=2k, 16 contour points") as wall-clock for a converged solve, and compares
against a freshly measured CPU reference implementation of the same
algorithm (scipy LU per contour node, threaded BLAS — the honest stand-in
for multithreaded FeastKit.jl per BASELINE.md's protocol, since the
reference publishes no numbers and Julia is not in this image).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = cpu_reference_time / tpu_time (higher is better; >1 beats the
reference proxy).
"""
import json
import time

import numpy as np


def _problem(n, seed=0):
    rng = np.random.default_rng(seed)
    A = (np.diag(2.0 * np.ones(n)) + np.diag(-1.0 * np.ones(n - 1), 1)
         + np.diag(-1.0 * np.ones(n - 1), -1))
    C = rng.standard_normal((n, n)) * (0.5 / np.sqrt(n))
    B = C @ C.T + np.eye(n)
    return A.astype(np.float32), B.astype(np.float32)


def cpu_reference(A, B, Emin, Emax, M0, ne, loops=3):
    """Same FEAST algorithm, scipy/LAPACK on all CPU cores (threaded BLAS):
    per-node LU factor cache + multi-RHS solves + Rayleigh-Ritz."""
    import scipy.linalg as sla
    from feastkit_tpu.core.contour import feast_contour

    n = A.shape[0]
    A64, B64 = A.astype(np.float64), B.astype(np.float64)
    c = feast_contour(Emin, Emax, ne=ne, quadrature=0, aspect_ratio=1.0)
    rng = np.random.default_rng(1)
    Q = rng.standard_normal((n, M0))
    t0 = time.perf_counter()
    factors = [sla.lu_factor(z * B64 - A64) for z in c.Zne]
    for _ in range(loops):
        rhs = (B64 @ Q).astype(np.complex128)
        Qp = np.zeros((n, M0))
        for (f, w) in zip(factors, c.Wne):
            Qp += np.real(2.0 * w * sla.lu_solve(f, rhs))
        U, s, _ = np.linalg.svd(Qp, full_matrices=False)
        S = U.T @ (A64 @ U)
        G = U.T @ (B64 @ U)
        lam, V = sla.eigh(S, G)
        Q = U @ V
    return time.perf_counter() - t0


def _device_run(n, M0, ne, A, B, Emin, Emax):
    """Measure the full public solve on the current default device (warm:
    first call compiles). Every run fetches result values."""
    from feastkit_tpu.core.parameters import feastinit
    from feastkit_tpu.solvers.dense import feast_sygv

    fpm = feastinit()
    fpm[2] = ne

    def run():
        r = feast_sygv(A, B, Emin, Emax, M0, fpm)
        assert r.M > 0, "benchmark solve found no eigenpairs"
        return r

    run()                      # compile + warm up (and surface errors)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import scipy.linalg as sla

    n, M0, ne = 2048, 32, 16
    A, B = _problem(n)
    # interval enclosing 24 eigenvalues of the pencil (ground truth once)
    w = sla.eigh(A.astype(np.float64), B.astype(np.float64),
                 eigvals_only=True)
    k = n // 2
    Emin = float((w[k - 1] + w[k]) / 2)
    Emax = float((w[k + 23] + w[k + 24]) / 2)

    metric = "dense_sygv_n2048_ne16_M0_32"
    try:
        device_time = _device_run(n, M0, ne, A, B, Emin, Emax)
    except Exception:
        # TPU tunnel unavailable/broken: measure on CPU and say so.
        jax.config.update("jax_platforms", "cpu")
        metric += "_cpu_fallback"
        device_time = _device_run(n, M0, ne, A, B, Emin, Emax)

    cpu_time = cpu_reference(A, B, Emin, Emax, M0, ne, loops=3)

    print(json.dumps({
        "metric": metric,
        "value": round(device_time, 4),
        "unit": "s",
        "vs_baseline": round(cpu_time / device_time, 2),
    }))


if __name__ == "__main__":
    main()
