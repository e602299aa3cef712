"""Inner-solve failure policy: starved iterative solvers must be flagged,
never silently SUCCESS (reference failure policy: degraded contribution +
@warn, feast_parallel.jl:266-273; success consensus, feast_mpi.jl:508-511)."""
import warnings

import numpy as np
import pytest
import scipy.sparse as sp

import feastkit_tpu as fk

from conftest import laplacian_1d, laplacian_eigs


def _sparse_laplacian(n):
    return sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                    [0, 1, -1], format="csr")


def test_starved_gmres_is_flagged():
    """solver_maxiter=1 cannot converge the shifted solves: the result must
    carry inner_converged=False, a RuntimeWarning, and a non-SUCCESS info."""
    n = 200
    A = _sparse_laplacian(n)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        r = fk.feast_scsrev(A, 0.5, 0.8, 12, solver_maxiter=1,
                            solver_restart=2)
    assert r.inner_converged is False
    assert any(issubclass(w.category, RuntimeWarning)
               and "inner iterative solver" in str(w.message) for w in rec)
    assert r.info != fk.FeastError.SUCCESS


@pytest.mark.slow
def test_healthy_solve_not_flagged():
    n = 150
    A = _sparse_laplacian(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        r = fk.feast_scsrev(A, 0.5, 0.8, len(exp) + 4)
    assert r.inner_converged is True
    assert not any("inner iterative solver" in str(w.message) for w in rec)
    assert r.M == len(exp)


def test_direct_dense_always_inner_converged():
    A = laplacian_1d(60)
    r = fk.feast_syev(A, 0.5, 1.5, 14)
    assert r.inner_converged is True


def test_starved_matfree_flagged():
    n = 120
    Ad = laplacian_1d(n)
    import jax.numpy as jnp
    A_op = fk.LinearOperator(lambda X: jnp.asarray(Ad) @ X, (n, n),
                             np.float64, symmetric=True)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        r = fk.feast_matvec(A_op, None, (0.5, 1.5), 10, solver_maxiter=1,
                            solver_restart=2)
    assert r.inner_converged is False
    assert any("inner iterative solver" in str(w.message) for w in rec)
