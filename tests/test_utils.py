"""Checkpoint/resume, profiling utilities, IFEAST knobs, deprecations."""
import warnings

import numpy as np
import pytest

import feastkit_tpu as fk
from feastkit_tpu.core.parameters import feastdefault, ifeast_solver_options

from conftest import laplacian_1d, laplacian_eigs


def test_checkpoint_resume(tmp_path):
    n = 60
    A = laplacian_1d(n)
    r = fk.feast_syev(A, 0.5, 1.5, 14)
    p = tmp_path / "ck.npz"
    fk.save_checkpoint(p, r, fk.feastinit(), (0.5, 1.5))
    ck = fk.load_checkpoint(p)
    assert ck.Q.shape == (n, 14)
    r2 = fk.feast_syev(A, 0.5, 1.5, 14, **fk.resume_kwargs(ck))
    # warm start from converged subspace: immediate convergence
    assert r2.loop <= 1
    assert r2.M == r.M
    assert np.abs(np.sort(r2.lam) - np.sort(r.lam)).max() < 1e-12


@pytest.mark.slow
def test_checkpoint_resume_banded(tmp_path):
    """resume_kwargs round-trips through the banded driver (Q0 + fpm[5])."""
    n = 200
    bands = np.zeros((3, n))
    bands[0, 1:] = -1.0
    bands[1, :] = 2.0
    bands[2, :-1] = -1.0
    w = laplacian_eigs(n)
    M0 = int(((w >= 0.5) & (w <= 0.8)).sum()) + 5
    r = fk.feast_sbev(bands, 1, 1, 0.5, 0.8, M0)
    assert r.info == 0
    p = tmp_path / "ck.npz"
    fk.save_checkpoint(p, r, fk.feastinit(), (0.5, 0.8))
    ck = fk.load_checkpoint(p)
    r2 = fk.feast_sbev(bands, 1, 1, 0.5, 0.8, M0, **fk.resume_kwargs(ck))
    # BCR solve error is slightly above the LU path's, so the warm start may
    # need one extra polish loop
    assert r2.loop <= 2
    assert r2.M == r.M


@pytest.mark.slow
def test_checkpoint_resume_sparse_general(tmp_path, rng):
    import scipy.sparse as sp
    n = 80
    d = np.concatenate([rng.uniform(-0.5, 0.5, 8)
                        + 1j * rng.uniform(-0.3, 0.3, 8),
                        4.0 + np.arange(n - 8, dtype=float)])
    A = sp.diags(d, 0, format="csr")
    r = fk.feast_gcsrev(A, 0.0 + 0.0j, 1.0, 12)
    p = tmp_path / "ck.npz"
    fk.save_checkpoint(p, r, fk.feastinit(), (0.0, 0.0, 1.0), kind="general")
    ck = fk.load_checkpoint(p)
    r2 = fk.feast_gcsrev(A, 0.0 + 0.0j, 1.0, 12, **fk.resume_kwargs(ck))
    assert r2.M == r.M
    assert r2.loop <= 1


def test_checkpoint_resume_pep(tmp_path, rng):
    n = 12
    K = np.diag(rng.uniform(0.5, 2.0, n))
    C = 0.1 * np.eye(n)
    M = np.eye(n)
    r = fk.feast_pep([K, C, M], 0.0 + 1.0j, 0.8, 16)
    assert r.info == fk.FeastError.SUCCESS
    p = tmp_path / "ck.npz"
    fk.save_checkpoint(p, r, fk.feastinit(), (0.0, 1.0, 0.8), kind="general")
    ck = fk.load_checkpoint(p)
    r2 = fk.feast_pep([K, C, M], 0.0 + 1.0j, 0.8, 16, **fk.resume_kwargs(ck))
    assert r2.info == fk.FeastError.SUCCESS
    # every converged pair of the first run is recovered by the warm start
    # (the tiled companion basis may legitimately capture extra borderline
    # pairs, so compare as a subset, not an exact count)
    for lam in r.lam:
        assert np.min(np.abs(r2.lam - lam)) < 1e-6


def test_stale_q0_ignored_without_fpm5():
    """fpm[5]=0 ignores a supplied Q0 (exact reference semantics,
    feast_kernel.jl:67-79): results equal the seeded-subspace run."""
    n = 60
    A = laplacian_1d(n)
    base = fk.feast_syev(A, 0.5, 1.5, 14)
    stale = np.ones((n, 14)) / np.sqrt(n)    # rank-1: disastrous if used
    r = fk.feast_syev(A, 0.5, 1.5, 14, Q0=stale)   # fpm[5] defaults to 0
    assert r.M == base.M
    assert np.abs(np.sort(r.lam) - np.sort(base.lam)).max() < 1e-12


def test_ifeast_knobs():
    fpm = fk.feastinit()
    fpm[43] = 1
    feastdefault(fpm)
    opts = ifeast_solver_options(fpm)
    assert opts == {"solver": "bicgstab", "solver_tol": 0.1,
                    "solver_maxiter": 40}
    fpm2 = feastdefault(fk.feastinit())
    assert ifeast_solver_options(fpm2) is None


def test_ifeast_end_to_end():
    """fpm[43]=1 with tightened inner accuracy solves sparse problems."""
    import scipy.sparse as sp
    n = 150
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    fpm = fk.feastinit()
    fpm[43] = 1     # IFEAST
    fpm[45] = 6     # inner tol 1e-6
    fpm[46] = 300
    fpm[3] = 6      # outer tol 1e-6 (inexact solves bound accuracy)
    r = fk.feast_scsrev(A, 0.5, 0.8, len(exp) + 4, fpm)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-5


def test_timer_and_benchmark():
    t = fk.FeastTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("b"):
        pass
    phases = t.report()
    assert "a" in phases and phases["a"] >= 0
    out = fk.feast_benchmark(lambda x: x + 1, 1, warmup=1, repeats=2)
    assert out["min_s"] >= 0


def test_parallel_comparison():
    n = 60
    A = laplacian_1d(n)
    out = fk.feast_parallel_comparison(A, None, (0.5, 1.5), 14)
    assert out["serial"]["M"] == out["sharded"]["M"]


def test_deprecated_constants():
    import feastkit_tpu.deprecations as dep
    assert dep.Feast_RCI_SOLVE == 11
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _ = dep.FEAST_SUCCESS
        assert any(isinstance(w.message, DeprecationWarning) for w in rec)
    with pytest.raises(AttributeError):
        dep.NOT_A_CONSTANT


def test_sparse_polynomial():
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    n = 12
    K = np.diag(rng.uniform(0.5, 2.0, n))
    C = 0.1 * np.eye(n)
    M = np.eye(n)
    Acomp = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    w = np.linalg.eigvals(Acomp)
    exp = w[np.asarray(fk.feast_inside_gcontour(w, 0.0 + 1.0j, 0.8))]
    r = fk.feast_scsrpev([sp.csr_matrix(K), sp.csr_matrix(C),
                          sp.csr_matrix(M)], 0.0 + 1.0j, 0.8,
                         min(len(exp) + 4, 2 * n))
    assert r.M == len(exp)
