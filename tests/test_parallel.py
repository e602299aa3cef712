"""Sharded-backend tests on the 8-virtual-device CPU mesh (the 'fake
backend' SURVEY.md section 4 notes the reference lacks)."""
import numpy as np
import pytest

import jax

from feastkit_tpu import feast
from feastkit_tpu.parallel.pfeast import (contour_mesh, contour_rhs_mesh,
                                          pad_contour, pfeast_dense)

from conftest import laplacian_1d, laplacian_eigs


def test_pad_contour():
    Z = np.arange(5) + 1j
    W = np.ones(5, complex)
    Zp, Wp = pad_contour(Z, W, 4)
    assert len(Zp) == 8 and len(Wp) == 8
    assert np.all(Wp[5:] == 0)          # zero-weight padding is exact


def test_sharded_matches_serial_bitwise():
    n = 80
    A = laplacian_1d(n)
    r1 = feast(A, None, (0.5, 1.5), 20, backend="serial")
    r2 = feast(A, None, (0.5, 1.5), 20, backend="sharded")
    assert r1.M == r2.M
    assert np.array_equal(np.asarray(r1.lam), np.asarray(r2.lam))


def test_contour_rhs_mesh_2d():
    """2-axis (contour x rhs) mesh: 4 contour shards x 2 rhs shards."""
    n = 80
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    mesh = contour_rhs_mesh(4, 2)
    r = pfeast_dense(A, None, 0.5, 1.5, len(exp) + 3, mesh=mesh,
                     hermitian=False)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10
    # and agrees with serial
    r_serial = feast(A, None, (0.5, 1.5), len(exp) + 3, backend="serial")
    assert np.abs(np.sort(r.lam) - np.sort(r_serial.lam)).max() < 1e-10


def test_contour_rhs_mesh_hermitian(rng):
    n = 50
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    w = np.linalg.eigvalsh(H)
    Emin, Emax = w[20] - 1e-9, w[28] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    mesh = contour_rhs_mesh(2, 4)
    r = pfeast_dense(H, None, Emin, Emax, 13, mesh=mesh, hermitian=True)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_odd_m0_padded_on_rhs_axis():
    n = 60
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    mesh = contour_rhs_mesh(2, 2)
    r = pfeast_dense(A, None, 0.5, 1.5, len(exp) + 3, mesh=mesh,
                     hermitian=False)   # M0 odd -> padded internally
    assert r.M == len(exp)


def test_pfeast_sparse_matches_serial():
    import scipy.sparse as sp
    from feastkit_tpu import pfeast_sparse
    from feastkit_tpu.solvers.sparse import feast_scsrev
    n = 150
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r1 = pfeast_sparse(A, None, 0.5, 0.8, len(exp) + 4)
    r2 = feast_scsrev(A, 0.5, 0.8, len(exp) + 4)
    assert r1.M == r2.M == len(exp)
    assert np.abs(np.sort(r1.lam) - np.sort(r2.lam)).max() < 1e-9


def test_parallel_sparse_alias():
    import scipy.sparse as sp
    import feastkit_tpu as fk
    n = 100
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.9)])
    r = fk.pdfeast_scsrev(A, 0.5, 0.9, len(exp) + 4)
    assert r.M == len(exp)
