#!/usr/bin/env python
"""Solve-free FEAST with the Chebyshev polynomial filter (solver="cheb").

TPU-first extension with no reference counterpart (FeastKit.jl is
contour-only): for STANDARD symmetric/Hermitian interval problems — and
lumped-mass pencils with a positive diagonal B — the spectral projector is
approximated by a Jackson-damped Chebyshev expansion of the interval
indicator instead of the contour quadrature. Each filter application is
`degree` plain sparse matvecs (the ideal bandwidth-bound TPU workload):
no inner Krylov iteration, no preconditioner, no linear solves.

Five flows:
  1. lowest eigenpairs of a 2D Laplacian (the BASELINE config-4 shape)
  2. mixed-precision ladder (fpm[42]): f32 -> double-single -> f64
  3. lumped-mass generalized pencil (positive diagonal B)
  4. stochastic eigenvalue count (fpm[14]=2) through the same filter
  5. CONSISTENT-mass generalized pencil (sparse SPD B): the B-resolvent
     becomes a closed-form Chebyshev polynomial inverse — still no
     linear solves

    JAX_ENABLE_X64=1 python examples/polynomial_filter.py    # all five
    JAX_ENABLE_X64=1 python examples/polynomial_filter.py 2  # just flow 2

(the tolerances asserted here are f64 targets — enable x64 as above)
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import scipy.sparse as sp

import feastkit_tpu as fk


def banner(title):
    print(f"\n=== {title} ===")


def lap2d(nx):
    D = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(D, sp.eye(nx)) + sp.kron(sp.eye(nx), D)).tocsr()


def lap2d_eigs(nx):
    wx = 2.0 - 2.0 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
    return np.sort((wx[:, None] + wx[None, :]).ravel())


def flow1():
    banner("1. lowest 20 pairs of a 64x64 2D Laplacian (solve-free)")
    nx = 64
    A = lap2d(nx)
    w = lap2d_eigs(nx)
    Emax = float(0.5 * (w[19] + w[20]))
    t0 = time.perf_counter()
    r = fk.feast(A, None, (0.0, Emax), M0=28, solver="cheb",
                 backend="serial")
    print(f"  {time.perf_counter() - t0:.2f}s")
    fk.feast_summary(r)
    assert r.M == 20 and np.abs(np.sort(r.lam) - w[:20]).max() < 1e-9


def flow2():
    banner("2. the fpm[42] precision ladder (f32 -> double-single -> f64)")
    # fpm[42]=2 forces the mixed schedule anywhere (auto engages on TPU):
    # early refinement loops run the three-term recurrence in f32, then
    # climb stall-driven precision rungs; Rayleigh-Ritz and residuals stay
    # exact f64 throughout, so the 1e-8 contract is certified identically.
    nx = 64
    A = lap2d(nx)
    w = lap2d_eigs(nx)
    Emax = float(0.5 * (w[19] + w[20]))
    fpm = fk.feastinit()
    fpm[1] = 1            # print the per-loop rung/timing lines
    fpm[3] = 8
    fpm[42] = 2
    r = fk.dfeast_scsrev(A, 0.0, Emax, 28, fpm, solver="cheb")
    assert r.info == 0 and r.M == 20


def flow3():
    banner("3. lumped-mass pencil A x = lam B x (positive diagonal B)")
    # solved exactly via the congruence D^-1/2 A D^-1/2; eigenvectors are
    # back-transformed and residuals recomputed for the ORIGINAL pencil
    import scipy.linalg as sla
    n = 400
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    d = 0.5 + np.random.default_rng(3).random(n)
    B = sp.diags(d, 0, format="csr")
    w = np.sort(sla.eigh(A.toarray(), np.diag(d), eigvals_only=True))
    # lowest 15 pencil eigenpairs — the spectrum-edge regime the
    # polynomial filter is built for (interior intervals with many
    # transition-region neighbors are the contour solvers' home turf)
    Emax = float(0.5 * (w[14] + w[15]))
    fpm = fk.feastinit()
    fpm[3] = 8
    r = fk.feast_scsrgv(A, B, 0.0, Emax, 22, fpm, solver="cheb")
    fk.feast_summary(r)
    assert r.info == 0 and r.M == 15
    assert np.abs(np.sort(r.lam) - w[:15]).max() < 1e-8


def flow4():
    banner("4. stochastic count estimate (fpm[14]=2) through the filter")
    nx = 64
    A = lap2d(nx)
    w = lap2d_eigs(nx)
    Emax = float(0.5 * (w[49] + w[50]))
    fpm = fk.feastinit()
    fpm[14] = 2
    r = fk.dfeast_scsrev(A, 0.0, Emax, 80, fpm, solver="cheb")
    print(f"  estimated count: {r.M} (true: 50)")
    assert 30 <= r.M <= 75


def flow5():
    banner("5. consistent-mass pencil K x = lam M x (sparse SPD B)")
    # P1 FEM stiffness/consistent-mass pair: after the unit-diagonal
    # congruence, B~'s inverse is a degree-~20 Chebyshev polynomial
    # (kappa(B~) = 3), so each recurrence step is one K matvec plus a
    # short Clenshaw in M — the whole generalized solve stays solve-free.
    # Rayleigh-Ritz uses the exact pencil; residuals are recomputed for
    # the original (K, M).
    import scipy.linalg as sla
    n = 400
    h = 1.0 / (n + 1)
    K = sp.diags([2.0 / h * np.ones(n), -1.0 / h * np.ones(n - 1),
                  -1.0 / h * np.ones(n - 1)], [0, 1, -1], format="csr")
    M = sp.diags([4 * h / 6 * np.ones(n), h / 6 * np.ones(n - 1),
                  h / 6 * np.ones(n - 1)], [0, 1, -1], format="csr")
    w = np.sort(sla.eigh(K.toarray(), M.toarray(), eigvals_only=True))
    Emax = float(0.5 * (w[11] + w[12]))
    fpm = fk.feastinit()
    fpm[1] = 1                      # prints the B-inverse degree
    fpm[3] = 10
    r = fk.feast_scsrgv(K, M, 0.0, Emax, 18, fpm, solver="cheb")
    fk.feast_summary(r)
    assert r.info == 0 and r.M == 12
    assert np.abs(np.sort(r.lam) - w[:12]).max() / w[11] < 1e-10


FLOWS = [flow1, flow2, flow3, flow4, flow5]

if __name__ == "__main__":
    picks = ([FLOWS[int(a) - 1] for a in sys.argv[1:]]
             if len(sys.argv) > 1 else FLOWS)
    for f in picks:
        f()
    print("\nall polynomial-filter flows passed")
