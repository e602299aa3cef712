"""General non-Hermitian / complex-symmetric / polynomial solver tests
(mirrors test/runtests.jl:197-279: contour-membership-filtered expected
spectra vs LAPACK eig; bar 1e-7)."""
import numpy as np
import pytest
import scipy.linalg as sla

from feastkit_tpu import (feast_geev, feast_geev_complex_sym, feast_gegv,
                          feast_general, feast_inside_gcontour, feast_pep,
                          feast_polynomial)


def _expected_inside(w, Emid, r, aspect=1.0, rot=0.0):
    mask = feast_inside_gcontour(np.asarray(w), complex(Emid), r,
                                 aspect_ratio=aspect, rotation_deg=rot)
    return np.asarray(w)[np.asarray(mask)]


def _sortc(x):
    x = np.asarray(x)
    return x[np.lexsort((x.imag, x.real))]


def _match_err(got, exp):
    """Max eigenvalue distance under optimal assignment (sorting complex
    values is ambiguous when real parts tie to rounding)."""
    from scipy.optimize import linear_sum_assignment
    got, exp = np.asarray(got), np.asarray(exp)
    assert len(got) == len(exp)
    if len(got) == 0:
        return 0.0
    D = np.abs(got[:, None] - exp[None, :])
    ri, ci = linear_sum_assignment(D)
    return D[ri, ci].max()


def test_geev_diagonal_complex():
    """Analytic fixture: diagonal with hand-placed complex eigenvalues
    (the reference's MPI/general test technique)."""
    lam_true = np.array([0.5 + 0.1j, 0.7 - 0.2j, 1.0 + 0.0j, 2.5 + 1.0j,
                         -1.0 + 0.5j, 0.9 + 0.3j])
    A = np.diag(lam_true).astype(np.complex128)
    r = feast_geev(A, 0.8 + 0.0j, 0.6, 5)
    exp = _expected_inside(lam_true, 0.8, 0.6)
    assert r.M == len(exp)
    assert _match_err(r.lam, exp) < 1e-10


def test_geev_random(rng):
    n = 50
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    w = np.linalg.eigvals(A)
    Emid = w[10]
    rr = 1.5
    exp = _expected_inside(w, Emid, rr)
    r = feast_geev(A, Emid, rr, len(exp) + 6)
    assert r.M == len(exp)
    assert _match_err(r.lam, exp) < 1e-7
    # eigenvector residuals
    for j in range(r.M):
        assert np.linalg.norm(A @ r.q[:, j] - r.lam[j] * r.q[:, j]) < 1e-6


def test_gegv_generalized(rng):
    n = 40
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)) \
        + 4 * np.eye(n)
    w = sla.eig(A, B, right=False)
    Emid = w[5]
    rr = 1.0
    exp = _expected_inside(w, Emid, rr)
    if len(exp) == 0:
        rr = 2.0
        exp = _expected_inside(w, Emid, rr)
    r = feast_gegv(A, B, Emid, rr, min(len(exp) + 6, n))
    assert r.M == len(exp)
    assert _match_err(r.lam, exp) < 1e-7


def test_geev_real_nonsymmetric(rng):
    """Real non-symmetric matrices promote to complex."""
    n = 40
    A = rng.standard_normal((n, n))
    w = np.linalg.eigvals(A)
    real_w = w[np.abs(w.imag) < 1e-12]
    Emid = complex(np.median(real_w.real), 0.0)
    rr = 1.2
    exp = _expected_inside(w, Emid, rr)
    r = feast_geev(A, Emid, rr, min(len(exp) + 6, n))
    assert r.M == len(exp)
    assert _match_err(r.lam, exp) < 1e-7


def test_complex_symmetric(rng):
    """Complex-symmetric (NOT Hermitian): transpose-bilinear Rayleigh-Ritz."""
    n = 40
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = (A + A.T) / 2         # complex symmetric
    w = np.linalg.eigvals(A)
    Emid = w[0]
    rr = 1.5
    exp = _expected_inside(w, Emid, rr)
    r = feast_geev_complex_sym(A, Emid, rr, min(len(exp) + 6, n))
    assert r.M == len(exp)
    assert _match_err(r.lam, exp) < 1e-7


def test_feast_general_api_routes_complex_symmetric(rng):
    n = 30
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = (A + A.T) / 2
    w = np.linalg.eigvals(A)
    exp = _expected_inside(w, w[0], 1.5)
    r = feast_general(A, None, w[0], 1.5, min(len(exp) + 5, n))
    assert r.M == len(exp)


def test_polynomial_quadratic(rng):
    """Quadratic eigenproblem (lam^2 M + lam C + K) x = 0 vs scipy
    linearization ground truth."""
    n = 16
    M = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    C = 0.3 * rng.standard_normal((n, n))
    K = rng.standard_normal((n, n))
    # ground truth by companion
    Acomp = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    Bcomp = np.block([[np.eye(n), np.zeros((n, n))],
                      [np.zeros((n, n)), M]])
    w = sla.eig(Acomp, Bcomp, right=False)
    Emid = 0.0 + 0.0j
    rr = 1.0
    exp = _expected_inside(w, Emid, rr)
    r = feast_pep([K, C, M], Emid, rr, min(len(exp) + 6, 2 * n))
    assert r.M == len(exp)
    assert _match_err(r.lam, exp) < 1e-7
    # eigenvectors satisfy the polynomial: (lam^2 M + lam C + K) x ~ 0
    assert r.q.shape[0] == n
    for j in range(r.M):
        lam = r.lam[j]
        x = r.q[:, j]
        assert np.linalg.norm((lam ** 2 * M + lam * C + K) @ x) < 1e-5


def test_polynomial_linear_degenerates_to_gegv(rng):
    n = 12
    A0 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A1 = np.eye(n) + 0.05 * rng.standard_normal((n, n))
    w = sla.eig(-A0, A1, right=False)
    exp = _expected_inside(w, w[0], 1.0)
    r = feast_polynomial([A0, A1], w[0], 1.0, min(len(exp) + 4, n))
    assert r.M == len(exp)


def test_general_trapezoid_default():
    """fpm[16] defaults to trapezoid for general problems via fpm[30];
    explicit trapezoid works end-to-end."""
    from feastkit_tpu import feastinit
    lam_true = np.array([0.2 + 0.1j, 0.5 - 0.3j, 3.0 + 0.0j])
    A = np.diag(lam_true)
    fpm = feastinit()
    fpm[16] = 1
    r = feast_geev(A, 0.3 + 0.0j, 0.7, 3, fpm)
    exp = _expected_inside(lam_true, 0.3, 0.7)
    assert r.M == len(exp)


def test_polynomial_direct_beyn(rng):
    """Linearization-free (Beyn moment) polynomial path: quadrature-limited
    accuracy, d-times less memory than the companion."""
    from feastkit_tpu import feast_polynomial, feastinit
    n = 20
    M = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    C = 0.3 * rng.standard_normal((n, n))
    K = rng.standard_normal((n, n))
    Acomp = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    Bcomp = np.block([[np.eye(n), np.zeros((n, n))],
                      [np.zeros((n, n)), M]])
    w = sla.eig(Acomp, Bcomp, right=False)
    exp = _expected_inside(w, 0.0, 1.0)
    fpm = feastinit()
    fpm[8] = 64
    fpm[4] = 3
    r = feast_polynomial([K, C, M], 0.0 + 0.0j, 1.0,
                         min(len(exp) + 6, 2 * n), fpm, method="direct")
    assert r.M == len(exp)
    assert _match_err(r.lam, exp) < 1e-2      # quadrature-limited
