"""Dense solver tests vs LAPACK ground truth (mirrors test/runtests.jl:151-304:
dispatch across real/Hermitian x standard/generalized, Float32, determinism).
Reference accuracy bars (BASELINE.md): dense symmetric 1e-10, Hermitian 1e-9,
Float32 1e-5."""
import numpy as np
import pytest
import scipy.linalg as sla

from feastkit_tpu import feast, feastinit, feastdefault, eigvals_feast
from feastkit_tpu.solvers.dense import (feast_heev, feast_hegv, feast_syev,
                                        feast_sygv)

from conftest import laplacian_1d, laplacian_eigs


def test_quickstart_tridiagonal():
    """README quickstart: n=100 Laplacian, interval (0.5, 1.5)."""
    n = 100
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    expected = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = feast_sygv(A, np.eye(n), 0.5, 1.5, 25)
    assert r.info == 0
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-10
    assert r.res.max() < 1e-10
    # eigenvectors actually satisfy A q = lam q
    for j in range(r.M):
        assert np.linalg.norm(A @ r.q[:, j] - r.lam[j] * r.q[:, j]) < 1e-8


def test_syev_standard():
    n = 80
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    # avoid a boundary tie: 2-2cos(27*pi/81) == 1.0 exactly for n=80
    expected = np.sort(w[(w >= 1.01) & (w <= 2.0)])
    r = feast_syev(A, 1.01, 2.0, len(expected) + 6)
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-10


def test_sygv_generalized(rng):
    n = 50
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    B = rng.standard_normal((n, n))
    B = B @ B.T + n * np.eye(n)
    w = sla.eigh(A, B, eigvals_only=True)
    Emin, Emax = w[15] - 1e-8, w[30] + 1e-8
    expected = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_sygv(A, B, Emin, Emax, len(expected) + 5)
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-9
    # B-generalized residual
    for j in range(r.M):
        assert (np.linalg.norm(A @ r.q[:, j] - r.lam[j] * (B @ r.q[:, j]))
                < 1e-8)


def test_heev_hermitian(rng):
    n = 60
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    w = np.linalg.eigvalsh(H)
    Emin, Emax = w[20] - 1e-9, w[30] + 1e-9
    expected = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_heev(H, Emin, Emax, 16)
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-9
    assert np.iscomplexobj(r.q)     # eigenvectors stay complex


def test_hegv_generalized(rng):
    n = 60
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    Bh = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Bh = Bh @ Bh.conj().T + n * np.eye(n)
    w = sla.eigh(H, Bh, eigvals_only=True)
    Emin, Emax = w[25] - 1e-9, w[35] + 1e-9
    expected = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_hegv(H, Bh, Emin, Emax, 16)
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-9


def test_float32(rng):
    """Float32 end-to-end (runtests.jl:281-304); bar 1e-5."""
    n = 60
    A = laplacian_1d(n, dtype=np.float32)
    w = laplacian_eigs(n)
    expected = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = feast_sygv(A, np.eye(n, dtype=np.float32), 0.5, 1.5,
                   len(expected) + 5)
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-5
    assert r.lam.dtype == np.float32


def test_determinism():
    """Same problem twice -> bit-identical lambdas (seeded-subspace contract,
    runtests.jl:1094-1106)."""
    n = 60
    A = laplacian_1d(n)
    r1 = feast_syev(A, 0.5, 1.5, 14)
    np.random.seed(123)     # global RNG state must not matter
    r2 = feast_syev(A, 0.5, 1.5, 14)
    assert np.array_equal(r1.lam, r2.lam)
    assert np.array_equal(np.asarray(r1.q), np.asarray(r2.q))


def test_no_store_factorization():
    """fpm[10]=0: recompute factorizations per loop (low-memory path)."""
    n = 60
    A = laplacian_1d(n)
    fpm = feastinit()
    fpm[10] = 0
    r = feast_syev(A, 0.5, 1.5, 14, fpm)
    w = laplacian_eigs(n)
    expected = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-10


def test_zolotarev_quadrature_end_to_end():
    n = 80
    A = laplacian_1d(n)
    fpm = feastinit()
    fpm[16] = 2         # Zolotarev
    r = feast_syev(A, 0.5, 1.5, 20, fpm)
    w = laplacian_eigs(n)
    expected = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-10


def test_trace_convergence_criterion():
    n = 60
    A = laplacian_1d(n)
    fpm = feastinit()
    fpm[6] = 0          # trace criterion
    r = feast_syev(A, 0.5, 1.5, 14, fpm)
    w = laplacian_eigs(n)
    expected = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-8


def test_empty_interval():
    """No eigenvalues in the interval -> M=0, no crash."""
    n = 40
    A = laplacian_1d(n)
    r = feast_syev(A, 100.0, 101.0, 8)
    assert r.M == 0


def test_high_level_feast_api(rng):
    n = 60
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    expected = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = feast(A, None, (0.5, 1.5), len(expected) + 4)
    assert r.M == len(expected)
    lam = eigvals_feast(A, (0.5, 1.5), M0=len(expected) + 4)
    assert np.abs(np.sort(lam) - expected).max() < 1e-10
    # generalized via positional B
    r2 = feast(A, np.eye(n), (0.5, 1.5), len(expected) + 4)
    assert r2.M == len(expected)


def test_feast_api_validation(rng):
    n = 20
    A = rng.standard_normal((n, n))     # non-symmetric
    with pytest.raises(ValueError):
        feast(A, None, (0.0, 1.0), 5)
    As = (A + A.T) / 2
    with pytest.raises(ValueError):
        feast(As, None, None, 5)
    with pytest.raises(ValueError):
        feast(As, None, (1.0, 0.0), 5)
    with pytest.warns(UserWarning):     # Gershgorin warning
        feast(As, None, (1e6, 2e6), 5)


def test_backend_kwarg_conflicts():
    n = 30
    A = laplacian_1d(n)
    with pytest.raises(ValueError):
        feast(A, None, (0.5, 1.5), 8, backend="serial", parallel=True)
    with pytest.raises(ValueError):
        feast(A, None, (0.5, 1.5), 8, backend="bogus")
    r = feast(A, None, (0.5, 1.5), 8, backend="serial")
    assert r.M > 0


def test_subspace_only_mode():
    """fpm[14]=1: return filtered orthonormal subspace without Ritz solve."""
    n = 60
    A = laplacian_1d(n)
    fpm = feastinit()
    fpm[14] = 1
    r = feast_syev(A, 0.5, 1.5, 14, fpm)
    Q = np.asarray(r.q_full)
    assert Q.shape == (n, 14)
    # returned basis is orthonormal
    assert np.abs(Q.conj().T @ Q - np.eye(14)).max() < 1e-8


def test_stochastic_estimate_mode():
    """fpm[14]=2: stochastic eigenvalue-count estimate through the driver."""
    n = 300
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    true = int(((w >= 0.5) & (w <= 1.5)).sum())
    fpm = feastinit()
    fpm[14] = 2
    fpm[32] = 40
    r = feast_syev(A, 0.5, 1.5, 8, fpm)
    assert r.info == 0 and r.lam.size == 0
    assert abs(r.M - true) <= 0.25 * true + 3
