#!/usr/bin/env python
"""Matrix-free FEAST examples (parity: examples/matrix_free_examples.jl).

Five flows, mirrored from the reference driver-for-driver but expressed
TPU-first: operators are jit-compatible batched matvecs (X is (N, M0) —
XLA fuses the stencil into one pass over the block), not per-vector
mutation callbacks.

    python examples/matrix_free.py            # all five
    python examples/matrix_free.py 2          # just example 2
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import feastkit_tpu as fk


def banner(title):
    print(f"\n=== {title} ===")


def report(result, max_values=5):
    ok = "Success" if result.info == 0 else f"Error {int(result.info)}"
    print(f"  eigenpairs found = {result.M}  ({ok}, "
          f"loops={result.loop}, epsout={result.epsout:.2e})")
    lam = np.asarray(result.lam)
    for i in range(min(result.M, max_values)):
        print(f"    lam[{i}] = {lam[i]}")


def example_tridiagonal_matfree():
    """Large symmetric tridiagonal T (2 on the diagonal, -1 off) without
    storing the matrix; exact spectrum 2 - 2 cos(k pi / (n+1)) (reference
    example 1, matrix_free_examples.jl:15-75)."""
    banner("Example 1: Tridiagonal Matrix (Matrix-Free)")
    # Reference note: matrix_free_examples.jl uses n=10_000 on (0.8, 1.2) with
    # M0=10 — an interval that actually holds ~735 eigenvalues, so the example
    # cannot converge as written. Here the size is chosen so the interval's
    # true eigenvalue count fits M0 and the unpreconditioned shifted solves
    # stay well-conditioned (contour elevation ~ half-width, so kappa ~
    # spectral_range / half-width ~ 20).
    n = 400

    def tridiag_mv(X):
        # batched stencil: one shifted-add pass over the whole block
        return (2.0 * X
                - jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], 0)
                - jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], 0))

    A_op = fk.LinearOperator(tridiag_mv, (n, n), np.float64, symmetric=True,
                             posdef=True)
    k = np.arange(1, n + 1)
    exact = 2.0 - 2.0 * np.cos(k * np.pi / (n + 1))
    interval = (0.8, 1.2)
    expected = int(((exact >= interval[0]) & (exact <= interval[1])).sum())
    print(f"  n = {n}, interval = {interval}, exact count = {expected}")
    t0 = time.perf_counter()
    # solver_tol: FEAST refinement tolerates inexact inner solves — a 1e-6
    # GMRES target converges to 1e-13 outer residuals in one extra loop at
    # half the wall time of the library's certification-grade default
    r = fk.feast_matvec(A_op, None, interval, max(expected + 8, 12),
                        solver_tol=1e-6)
    print(f"  solve time: {time.perf_counter() - t0:.2f} s")
    report(r)
    assert r.M == expected
    return r


def example_2d_laplacian_matfree():
    """Negative 2D Laplacian, generalized with B = I (reference example 2,
    matrix_free_examples.jl:83-159). TPU-first divergence: the reference
    hands the shifted solves to unpreconditioned CG, which crawls on the
    stiff (z I - A) systems; here the known sine eigenbasis turns the solve
    into a DIRECT spectral one — batched (nx x nx) matmuls that land on the
    MXU — through the same solve_shifted hook any user solver plugs into."""
    banner("Example 2: 2D Laplacian (Matrix-Free)")
    nx = ny = 96
    n = nx * ny
    h = 1.0 / (nx + 1)

    def lap_mv(X):
        # (N, M0) block -> (nx, ny, M0) grid; 5-point stencil, fused by XLA
        G = X.reshape(nx, ny, -1)
        out = 4.0 * G
        out = out.at[1:].add(-G[:-1]).at[:-1].add(-G[1:])
        out = out.at[:, 1:].add(-G[:, :-1]).at[:, :-1].add(-G[:, 1:])
        return (out / h**2).reshape(n, -1)

    # discrete sine eigenbasis: A = (S kron S) diag(lam_ij) (S kron S)^T
    i = np.arange(1, nx + 1)
    S = jnp.asarray(np.sqrt(2.0 * h) * np.sin(np.pi * h * np.outer(i, i)))
    mode = 2.0 * (1.0 - np.cos(np.pi * h * i)) / h**2
    lam2d = jnp.asarray(mode[:, None] + mode[None, :])   # (nx, ny) spectrum

    def solve_shifted(z, RHS):
        # (z I - A)^{-1} exactly: rotate to the eigenbasis, divide, rotate
        # back — three batched matmuls per side, all MXU work
        G = RHS.reshape(nx, ny, -1).astype(RHS.dtype)
        Sc = S.astype(RHS.dtype)
        hat = jnp.einsum("ki,ijm,jl->klm", Sc.T, G, Sc)
        hat = hat / (z - lam2d.astype(RHS.dtype))[:, :, None]
        out = jnp.einsum("ki,ijm,jl->klm", Sc, hat, Sc.T)
        return out.reshape(n, -1)

    A_op = fk.LinearOperator(lap_mv, (n, n), np.float64, symmetric=True,
                             posdef=True)
    B_op = fk.LinearOperator(lambda X: X, (n, n), np.float64, symmetric=True,
                             posdef=True)
    lam_exact = np.sort(np.ravel(np.add.outer(mode, mode)))
    interval = (0.8 * lam_exact[0], 1.02 * lam_exact[4])
    expected = int(((lam_exact >= interval[0])
                    & (lam_exact <= interval[1])).sum())
    print(f"  grid {nx} x {ny} ({n} DOFs), h = {h:.4f}")
    print(f"  smallest eigenvalue: {lam_exact[0]:.4f}, interval ="
          f" ({interval[0]:.4f}, {interval[1]:.4f}), exact count ="
          f" {expected}")
    t0 = time.perf_counter()
    r = fk.feast_matvec(A_op, B_op, interval, expected + 6,
                        solve_shifted=solve_shifted)
    print(f"  solve time: {time.perf_counter() - t0:.2f} s")
    report(r)
    assert r.M == expected
    return r


def example_custom_solver():
    """User-supplied shifted solver: FEAST only needs X = (z B - A)^{-1} RHS;
    here a direct tridiagonal solve replaces the built-in Krylov loop
    (reference example 3, matrix_free_examples.jl:164-227). The callback is
    traced into the contour scan, so a HOST solver (scipy here) is wrapped
    in jax.pure_callback — swap in any jit-traceable solve to stay
    on-device."""
    banner("Example 3: Custom Linear Solver")
    n = 1000
    main = 2.0 * np.ones(n)

    def tridiag_mv(X):
        return (2.0 * X
                - jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], 0)
                - jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], 0))

    import scipy.linalg as sla

    def host_solve(z, RHS):
        # (z I - A) X = RHS via a banded direct factor/solve on the host
        ab = np.zeros((3, n), complex)
        ab[0, 1:] = 1.0
        ab[1] = complex(z) - main
        ab[2, :-1] = 1.0
        return sla.solve_banded((1, 1), ab, np.asarray(RHS))

    def solve_shifted(z, RHS):
        return jax.pure_callback(
            host_solve, jax.ShapeDtypeStruct(RHS.shape, RHS.dtype), z, RHS,
            vmap_method="sequential")

    A_op = fk.LinearOperator(tridiag_mv, (n, n), np.float64, symmetric=True)
    k = np.arange(1, n + 1)
    exact = 2.0 - 2.0 * np.cos(k * np.pi / (n + 1))
    interval = (1.0, 1.1)
    expected = int(((exact >= interval[0]) & (exact <= interval[1])).sum())
    print(f"  n = {n}, interval = {interval}, exact count = {expected}")
    r = fk.feast_matvec(A_op, None, interval, expected + 6,
                        solve_shifted=solve_shifted)
    report(r)
    assert r.M == expected
    return r


def example_general_matfree():
    """Non-Hermitian matrix-free problem on a circular contour (reference
    example 4, matrix_free_examples.jl:233-290)."""
    banner("Example 4: General (Non-Hermitian) Matrix-Free")
    n = 8

    def A_mv(X):
        return (2.0 * X
                - 1.2 * jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], 0)
                - 0.8 * jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], 0))

    A_op = fk.LinearOperator(A_mv, (n, n), np.complex128)
    center, radius = 1.0 + 0.0j, 1.5
    print(f"  n = {n}, contour: |z - {center}| = {radius}")
    r = fk.feast_matvec_general(A_op, None, center, radius, 6,
                                solver_restart=20, solver_tol=1e-10)
    report(r)
    return r


def example_large_sparse_matfree():
    """A large sparse matrix exposed ONLY through its matvec — the pattern
    for operators assembled on the fly (reference example 5)."""
    banner("Example 5: Sparse Matrix via Matrix-Free Interface")
    import scipy.linalg as sla
    import scipy.sparse as sp
    # Interval centered where the tridiagonal spectrum's level spacing is
    # widest (lam ~ 2): shifted contour systems stay well-enough conditioned
    # for the plain unpreconditioned solver this interface defaults to.
    n = 600
    rng = np.random.default_rng(7)
    diag = 2.0 + 0.1 * rng.standard_normal(n)
    off = -1.0 * np.ones(n - 1)
    A = sp.diags([off, diag, off], [-1, 0, 1], format="csr")
    Ad = jnp.asarray(diag)

    def A_mv(X):
        up = jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], 0)
        dn = jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], 0)
        return Ad[:, None] * X - up - dn

    A_op = fk.LinearOperator(A_mv, (n, n), np.float64, symmetric=True)
    interval = (1.9, 2.1)
    # honest M0: count the true eigenvalues in the window first
    exact = sla.eigvalsh_tridiagonal(diag, off, select="v",
                                     select_range=interval)
    expected = len(exact)
    print(f"  n = {n}, interval = {interval}, exact count = {expected}")
    t0 = time.perf_counter()
    r = fk.feast_matvec(A_op, None, interval, expected + 8)
    print(f"  solve time: {time.perf_counter() - t0:.2f} s")
    report(r)
    assert r.M == expected
    # cross-check against the stored-matrix sparse driver
    r_sp = fk.feast(A, None, interval, expected + 8)
    assert r.M == r_sp.M, (r.M, r_sp.M)
    print(f"  matches the stored-matrix sparse driver (M = {r_sp.M})")
    return r


EXAMPLES = {
    "1": example_tridiagonal_matfree,
    "2": example_2d_laplacian_matfree,
    "3": example_custom_solver,
    "4": example_general_matfree,
    "5": example_large_sparse_matfree,
}


def main(argv):
    picks = [a for a in argv if a in EXAMPLES] or list(EXAMPLES)
    for k in picks:
        EXAMPLES[k]()
    print("\nAll matrix-free examples completed.")


if __name__ == "__main__":
    main(sys.argv[1:])
