"""fpm[14]=2 stochastic eigenvalue-count estimate across every driver class
(the reference applies execution modes per driver class,
feast_parameters.jl:71-75; dense is covered in test_dense.py)."""
import numpy as np
import scipy.sparse as sp

import feastkit_tpu as fk
from feastkit_tpu.core.parameters import feastinit

from conftest import laplacian_1d, laplacian_eigs


def _estimate_fpm(trials=40):
    fpm = feastinit()
    fpm[14] = 2
    fpm[32] = trials
    return fpm


def _laplacian_count(n, lo, hi):
    w = laplacian_eigs(n)
    return int(((w >= lo) & (w <= hi)).sum())


def test_sparse_estimate():
    n = 300
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    true = _laplacian_count(n, 0.5, 1.5)
    r = fk.feast_scsrev(A, 0.5, 1.5, 8, _estimate_fpm())
    assert r.info == 0 and r.lam.size == 0
    assert abs(r.M - true) <= 0.25 * true + 3


def test_banded_estimate():
    n = 300
    bands = np.zeros((3, n))
    bands[0, 1:] = -1.0
    bands[1, :] = 2.0
    bands[2, :-1] = -1.0
    true = _laplacian_count(n, 0.5, 1.5)
    r = fk.feast_sbev(bands, 1, 1, 0.5, 1.5, 8, _estimate_fpm())
    assert r.lam.size == 0
    assert abs(r.M - true) <= 0.25 * true + 3


def test_matfree_estimate():
    import jax.numpy as jnp
    n = 300
    Ad = jnp.asarray(laplacian_1d(n))
    A_op = fk.LinearOperator(lambda X: Ad @ X, (n, n), np.float64,
                             symmetric=True)
    true = _laplacian_count(n, 0.5, 1.5)
    r = fk.feast_matvec(A_op, None, (0.5, 1.5), 8, _estimate_fpm())
    assert r.lam.size == 0
    assert abs(r.M - true) <= 0.25 * true + 3


def test_dense_general_estimate(rng):
    n = 120
    lam = np.concatenate([rng.uniform(-0.5, 0.5, 12)
                          + 1j * rng.uniform(-0.4, 0.4, 12),
                          3.0 + rng.standard_normal(n - 12)])
    X = rng.standard_normal((n, n)) + 0.05 * 1j * rng.standard_normal((n, n))
    A = X @ np.diag(lam) @ np.linalg.inv(X)
    true = int(np.sum(np.abs(lam) <= 1.0))
    fpm = _estimate_fpm(60)
    r = fk.feast_geev(A, 0.0 + 0.0j, 1.0, 8, fpm)
    assert r.lam.size == 0
    assert abs(r.M - true) <= 0.3 * true + 3


def test_sparse_general_estimate(rng):
    n = 200
    d = np.concatenate([rng.uniform(-0.5, 0.5, 10)
                        + 1j * rng.uniform(-0.3, 0.3, 10),
                        4.0 + np.arange(n - 10, dtype=float)])
    A = sp.diags(d, 0, format="csr")
    true = 10
    r = fk.feast_gcsrev(A, 0.0 + 0.0j, 1.0, 8, _estimate_fpm(60))
    assert r.lam.size == 0
    assert abs(r.M - true) <= 0.3 * true + 3


def test_banded_general_estimate_unbiased():
    """Regression: the banded-general estimate applied HALVED weights to a
    raw full-contour filter (trace(P) = M already), reporting ~M/2. A large
    true count with a sub-50% tolerance pins the convention."""
    n = 400
    bands = np.zeros((3, n), np.complex128)
    bands[0, 1:] = -1.0
    bands[1, :] = 2.0
    bands[2, :-1] = -1.0
    w = laplacian_eigs(n)
    true = int((np.abs(w - 2.0) <= 0.8).sum())   # ~106
    r = fk.zfeast_gbev(bands, 1, 1, 2.0 + 0.0j, 0.8, 8, _estimate_fpm(20))
    assert r.info == 0 and r.lam.size == 0
    assert abs(r.M - true) <= 0.2 * true


def test_pfeast_general_estimate_unbiased():
    """Regression: same halved-weight bug in the sharded general filter."""
    from feastkit_tpu.parallel.pfeast import pfeast_general
    n = 400
    A = np.asarray(laplacian_1d(n), np.complex128)
    w = laplacian_eigs(n)
    true = int((np.abs(w - 2.0) <= 0.8).sum())
    r = pfeast_general(A, None, 2.0 + 0.0j, 0.8, 8, _estimate_fpm(20))
    assert r.info == 0 and r.lam.size == 0
    assert abs(r.M - true) <= 0.2 * true


def test_pfeast_sparse_general_estimate_honors_contour_and_hints():
    """Regression: the sharded sparse-general estimate delegation dropped
    explicit contour/grid/precond kwargs — the count came out for the
    DEFAULT (Emid, r) ellipse instead of the supplied contour."""
    from feastkit_tpu.core.contour import feast_gcontour
    from feastkit_tpu.parallel.pfeast import pfeast_sparse_general
    n = 400
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    w = laplacian_eigs(n)
    true = int((np.abs(w - 2.0) <= 0.8).sum())
    contour = feast_gcontour(2.0 + 0.0j, 0.8, feastinit())
    # (Emid, r) deliberately encloses ~nothing; the contour must win
    r = pfeast_sparse_general(A, None, 5.0 + 0.0j, 0.05, 8,
                              _estimate_fpm(20), contour=contour)
    assert r.info == 0 and r.lam.size == 0
    assert abs(r.M - true) <= 0.2 * true
