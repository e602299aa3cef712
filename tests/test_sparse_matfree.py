"""Sparse + matrix-free engine tests (mirrors test/runtests.jl:442-580
GMRES-vs-direct agreement and test/test_matrix_free.jl)."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.linalg as sla

import jax.numpy as jnp

from feastkit_tpu.ops.gmres import bicgstab_block, gmres_block
from feastkit_tpu.solvers.matfree import (LinearOperator, MatrixVecFunction,
                                          create_iterative_solver,
                                          feast_matvec, feast_matvec_general)
from feastkit_tpu.solvers.sparse import (feast_gcsrev, feast_hcsrev,
                                         feast_scsrev, feast_scsrgv,
                                         feast_scsrev_complex)


def _lap(n):
    return sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                    [0, 1, -1], format="csr")


def _lap_eigs(n):
    return 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))


def test_gmres_solves_shifted(rng):
    n = 150
    A = _lap(n).toarray()
    z = 1.0 + 0.3j
    M = z * np.eye(n) - A
    B = rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4))
    op = lambda X: jnp.asarray(M) @ X
    X, info = gmres_block(op, jnp.asarray(B), tol=1e-10, restart=40,
                          maxiter=400)
    assert bool(info.converged.all())
    assert np.abs(np.asarray(X) - np.linalg.solve(M, B)).max() < 1e-8
    X2, info2 = bicgstab_block(op, jnp.asarray(B), tol=1e-10, maxiter=600)
    assert bool(info2.converged.all())


def test_scsrev_laplacian():
    n = 300
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    r = feast_scsrev(A, 0.5, 0.7, len(exp) + 5)
    assert r.info == 0
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10


def test_scsrgv_mass_matrix():
    n = 200
    A = _lap(n)
    B = sp.diags([4 * np.ones(n), np.ones(n - 1), np.ones(n - 1)],
                 [0, 1, -1], format="csr") / 6.0
    w = sla.eigh(A.toarray(), B.toarray(), eigvals_only=True)
    exp = np.sort(w[(w >= 1.0) & (w <= 2.0)])
    r = feast_scsrgv(A, B, 1.0, 2.0, len(exp) + 5)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_hcsrev_hermitian(rng):
    n = 120
    d = rng.standard_normal(n) * 2
    off = rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)
    A = sp.diags([d, off, off.conj()], [0, 1, -1], format="csr")
    w = np.linalg.eigvalsh(A.toarray())
    Emin, Emax = w[40] - 1e-9, w[55] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_hcsrev(A, Emin, Emax, len(exp) + 6)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-8


def test_gcsrev_general(rng):
    n = 80
    main = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    up = rng.standard_normal(n - 1)
    A = sp.diags([main, up, 0.5 * np.ones(n - 1)], [0, 1, -1], format="csr")
    w = np.linalg.eigvals(A.toarray())
    from feastkit_tpu import feast_inside_gcontour
    Emid, rr = w[0], 0.8
    exp = w[np.asarray(feast_inside_gcontour(w, Emid, rr))]
    r = feast_gcsrev(A, Emid, rr, min(len(exp) + 5, n))
    assert r.M == len(exp)


def test_sparse_matches_dense():
    """Cross-engine agreement: sparse iterative vs dense direct
    (the reference's GMRES-vs-direct tests, runtests.jl:442-580)."""
    from feastkit_tpu import feast_syev
    n = 150
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 1.0) & (w <= 1.3)])
    rd = feast_syev(A.toarray(), 1.0, 1.3, len(exp) + 4)
    rs = feast_scsrev(A, 1.0, 1.3, len(exp) + 4)
    assert rd.M == rs.M == len(exp)
    assert np.abs(np.sort(rd.lam) - np.sort(rs.lam)).max() < 1e-9


def test_matfree_operator_protocol():
    n = 100
    A = _lap(n).toarray()
    Aj = jnp.asarray(A)
    op = MatrixVecFunction(lambda X: Aj @ X, (n, n), jnp.float64,
                           issymmetric=True)
    y = op(jnp.ones(n))
    assert y.shape == (n,)
    Y = op @ jnp.ones((n, 3))
    assert Y.shape == (n, 3)
    assert np.abs(np.asarray(Y) - A @ np.ones((n, 3))).max() < 1e-12


def test_feast_matvec_symmetric():
    n = 150
    A = _lap(n).toarray()
    Aj = jnp.asarray(A)
    A_op = LinearOperator(lambda X: Aj @ X, (n, n), jnp.float64,
                          symmetric=True)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r = feast_matvec(A_op, None, (0.5, 0.8), len(exp) + 5)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_feast_matvec_custom_solver():
    """User-supplied shifted solver (the RCI linear_solver contract)."""
    n = 100
    A = _lap(n).toarray()
    Aj = jnp.asarray(A)
    A_op = LinearOperator(lambda X: Aj @ X, (n, n), jnp.float64,
                          symmetric=True)

    def my_solver(z, RHS):
        M = z * jnp.eye(n, dtype=RHS.dtype) - Aj.astype(RHS.dtype)
        return jnp.linalg.solve(M, RHS)

    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r = feast_matvec(A_op, None, (0.5, 0.8), len(exp) + 4,
                     solve_shifted=my_solver)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10


def test_matfree_general(rng):
    n = 60
    lam_true = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    D = jnp.asarray(np.diag(lam_true))
    A_op = LinearOperator(lambda X: D @ X, (n, n), jnp.complex128)
    from feastkit_tpu import feast_inside_gcontour
    Emid, rr = 0.0 + 0.0j, 0.8
    exp = lam_true[np.asarray(feast_inside_gcontour(lam_true, Emid, rr))]
    r = feast_matvec_general(A_op, None, Emid, rr, min(len(exp) + 5, n))
    assert r.M == len(exp)


def test_cg_rejected():
    n = 10
    A_op = LinearOperator(lambda X: X, (n, n), jnp.float64, symmetric=True)
    with pytest.raises(ValueError, match="CG is not valid"):
        create_iterative_solver(A_op, method="cg")
    with pytest.raises(ValueError):
        feast_scsrev(_lap(20), 0.5, 1.0, 4, solver="cg")


def test_bicgstab_path():
    n = 200
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    r = feast_scsrev(A, 0.5, 0.7, len(exp) + 4, solver="bicgstab",
                     solver_maxiter=800)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-8
