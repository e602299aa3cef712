"""Banded engine tests (mirrors test/runtests.jl:582-681: banded utilities
round-trip + banded-vs-dense agreement for every family)."""
import numpy as np
import pytest
import scipy.linalg as sla

from feastkit_tpu.ops.banded import (banded_matvec, banded_to_full,
                                     full_to_banded)
from feastkit_tpu.solvers.banded import (feast_gbev, feast_gbgv, feast_hbev,
                                         feast_sbev, feast_sbev_complex,
                                         feast_sbgv)


def _banded_random(rng, N, kl, ku, dtype=float, herm=False, sym=False):
    A = np.zeros((N, N), complex if (herm or np.dtype(dtype).kind == 'c')
                 else float)
    for d in range(-kl, ku + 1):
        v = rng.standard_normal(N - abs(d)).astype(float)
        if A.dtype.kind == 'c':
            v = v + 1j * rng.standard_normal(N - abs(d))
        A += np.diag(v, d)
    if herm:
        A = (A + A.conj().T) / 2
    if sym:
        A = (A + A.T) / 2
    return A


def test_band_round_trip(rng):
    A = _banded_random(rng, 30, 2, 3)
    bands = full_to_banded(A, 2, 3)
    assert np.abs(banded_to_full(bands, 2, 3) - A).max() == 0
    x = rng.standard_normal((30, 4))
    import jax.numpy as jnp
    y = banded_matvec(jnp.asarray(bands), jnp.asarray(x), 2, 3)
    assert np.abs(np.asarray(y) - A @ x).max() < 1e-12


def test_sbev_tridiagonal():
    """Banded Laplacian vs analytic spectrum."""
    n = 120
    A = (np.diag(2.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1)
         + np.diag(-np.ones(n - 1), -1))
    bands = full_to_banded(A, 1, 1)
    w = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = feast_sbev(bands, 1, 1, 0.5, 1.5, len(exp) + 6)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9
    assert r.res.max() < 1e-10


def test_sbgv_generalized(rng):
    n = 60
    A = _banded_random(rng, n, 2, 2, sym=True)
    B = _banded_random(rng, n, 1, 1, sym=True) + 8 * np.eye(n)
    w = sla.eigh(A, B, eigvals_only=True)
    Emin, Emax = w[20] - 1e-9, w[30] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_sbgv(full_to_banded(A, 2, 2), 2, 2,
                   full_to_banded(B, 1, 1), 1, 1, Emin, Emax, 16)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_hbev_hermitian(rng):
    n = 50
    A = _banded_random(rng, n, 3, 3, dtype=complex, herm=True)
    w = np.linalg.eigvalsh(A)
    Emin, Emax = w[15] - 1e-9, w[25] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_hbev(full_to_banded(A, 3, 3), 3, 3, Emin, Emax, 16)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_gbev_general(rng):
    n = 40
    A = _banded_random(rng, n, 2, 1, dtype=complex)
    w = np.linalg.eigvals(A)
    Emid, rr = w[0], 1.0
    from feastkit_tpu import feast_inside_gcontour
    exp = w[np.asarray(feast_inside_gcontour(w, Emid, rr))]
    r = feast_gbev(full_to_banded(A, 2, 1), 2, 1, Emid, rr,
                   min(len(exp) + 6, n))
    assert r.M == len(exp)
    from scipy.optimize import linear_sum_assignment
    D = np.abs(np.asarray(r.lam)[:, None] - exp[None, :])
    ri, ci = linear_sum_assignment(D)
    assert D[ri, ci].max() < 1e-7


def test_sbev_complex_symmetric(rng):
    n = 40
    A = _banded_random(rng, n, 2, 2, dtype=complex)
    A = (A + A.T) / 2
    bands = full_to_banded(A, 2, 2)
    w = np.linalg.eigvals(A)
    Emid, rr = w[0], 1.2
    from feastkit_tpu import feast_inside_gcontour
    exp = w[np.asarray(feast_inside_gcontour(w, Emid, rr))]
    r = feast_sbev_complex(bands, 2, 2, Emid, rr, min(len(exp) + 5, n))
    assert r.M == len(exp)


@pytest.mark.slow
def test_banded_matches_dense(rng):
    """Banded and dense drivers agree on the identical problem
    (cross-solver agreement, SURVEY.md section 4)."""
    from feastkit_tpu import feast_syev
    n = 80
    A = _banded_random(rng, n, 2, 2, sym=True) + 4 * np.eye(n)
    w = np.linalg.eigvalsh(A)
    Emin, Emax = w[30] - 1e-9, w[45] + 1e-9
    rd = feast_syev(A, Emin, Emax, 22)
    rb = feast_sbev(full_to_banded(A, 2, 2), 2, 2, Emin, Emax, 22)
    assert rd.M == rb.M
    assert np.abs(np.sort(rd.lam) - np.sort(rb.lam)).max() < 1e-10


def test_bcr_mxu_block_size(rng):
    """BCR with MXU-sized blocks (the TPU re-blocking, ops/banded.py
    _auto_block) factors/solves identically to the minimal-block path."""
    import jax.numpy as jnp
    from feastkit_tpu.ops.banded import (banded_to_blocktridiag, bcr_factor,
                                         bcr_solve, banded_to_full,
                                         full_to_banded)
    n, kd = 700, 3
    A = np.zeros((n, n))
    for d in range(kd + 1):
        v = rng.standard_normal(n - d) * (0.4 if d else 1.0)
        A[np.arange(n - d), np.arange(d, n)] = v
        A[np.arange(d, n), np.arange(n - d)] = v
    A[np.arange(n), np.arange(n)] += 4.0 * kd
    bands = full_to_banded(A, kd, kd)
    rhs = rng.standard_normal((n, 3))
    x_ref = np.linalg.solve(A, rhs)
    for block in (kd, 128):
        D, L, U, b, _ = banded_to_blocktridiag(jnp.asarray(bands), kd, kd,
                                               block=block)
        levels, rlu, rpiv = bcr_factor(D, L, U)
        Npad = D.shape[0] * b
        rp = np.zeros((Npad, 3))
        rp[:n] = rhs
        x = bcr_solve(levels, rlu, rpiv,
                      jnp.asarray(rp.reshape(Npad // b, b, 3)))
        x = np.asarray(x).reshape(Npad, 3)[:n]
        assert np.abs(x - x_ref).max() < 1e-8, f"block={block}"


def test_banded_contour_poly_route_matches_bcr(monkeypatch):
    """At throughput scale (N >= 4096) an eligible symmetric banded pencil
    takes the contour-polynomial route; FEAST_CONTOUR_POLY=0 restores the
    BCR direct engine. Identical eigenpairs either way."""
    from feastkit_tpu.solvers.banded import feast_sbev
    n, kd = 4096, 3
    rng = np.random.default_rng(0)
    bands = np.zeros((2 * kd + 1, n), np.float64)
    for d in range(1, kd + 1):
        v = rng.standard_normal(n - d) * 0.4
        bands[kd - d, d:] = v
        bands[kd + d, :n - d] = v
    bands[kd] = 2 * kd + rng.standard_normal(n) * 0.4
    spikes = rng.choice(n, 10, replace=False)
    bands[kd, spikes] = np.linspace(20.0, 22.0, 10)
    r = feast_sbev(bands, kd, kd, 18.0, 25.0, 16)
    assert r.M == 10 and int(r.info) == 0
    monkeypatch.setenv("FEAST_CONTOUR_POLY", "0")
    r2 = feast_sbev(bands, kd, kd, 18.0, 25.0, 16)
    assert r2.M == 10 and int(r2.info) == 0
    assert np.allclose(np.sort(np.asarray(r.lam)),
                       np.sort(np.asarray(r2.lam)), atol=1e-9)
