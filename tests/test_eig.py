"""qr_eig / general_eig coverage: the on-device shifted-QR path is the
default reduced eigensolver on the axon tunnel (solvers/dense_general.py),
so it must agree with the LAPACK callback path (the reference's
eigen(A, B) semantics, feast_kernel.jl:812) on the matrix classes the
reduced Rayleigh-Ritz pencil actually produces."""
import numpy as np
import jax.numpy as jnp
import pytest

from feastkit_tpu.ops.eig import general_eig, generalized_eig, qr_eig

from conftest import laplacian_1d


def _check_eigpairs(A, w, V, atol):
    """A V = V diag(w) columnwise, unit columns."""
    A = np.asarray(A)
    w = np.asarray(w)
    V = np.asarray(V)
    res = np.linalg.norm(A @ V - V * w[None, :], axis=0)
    scale = np.maximum(np.abs(w), 1.0)
    assert np.all(res <= atol * scale), (res / scale).max()
    nrm = np.linalg.norm(V, axis=0)
    assert np.allclose(nrm, 1.0, atol=1e-8)


def _match_sets(w1, w2, atol):
    """Eigenvalue multisets agree under optimal pairing (lexsort is unstable
    for conjugate pairs whose real parts differ at roundoff)."""
    from scipy.optimize import linear_sum_assignment
    w1, w2 = np.asarray(w1), np.asarray(w2)
    cost = np.abs(w1[:, None] - w2[None, :])
    rows, cols = linear_sum_assignment(cost)
    assert np.all(cost[rows, cols] <= atol), cost[rows, cols].max()


@pytest.mark.parametrize("n", [2, 5, 12, 32])
def test_qr_vs_callback_random(rng, n):
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex128)
    w_cb, _ = general_eig(jnp.asarray(A), method="callback")
    w_qr, V_qr = general_eig(jnp.asarray(A), method="qr")
    _match_sets(w_cb, w_qr, atol=1e-8 * n)
    _check_eigpairs(A, w_qr, V_qr, atol=1e-8 * n)


def test_qr_vs_callback_clustered(rng):
    """Clustered eigenvalues: the deflation criterion must not merge
    distinct-but-close eigenvalues or stall the sweep."""
    n = 16
    lam = np.concatenate([
        1.0 + np.arange(4) * 1e-5,              # tight real cluster
        (2.0 + 0.5j) + np.arange(4) * 1e-5j,    # tight complex cluster
        rng.standard_normal(8) + 1j * rng.standard_normal(8),
    ]).astype(np.complex128)
    X = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    Q, _ = np.linalg.qr(X)
    R = np.triu(rng.standard_normal((n, n)) * 0.3, 1)
    A = Q @ (np.diag(lam) + R) @ Q.conj().T
    w_cb, _ = general_eig(jnp.asarray(A), method="callback")
    w_qr, V_qr = general_eig(jnp.asarray(A), method="qr")
    # eigenvalues inside a 1e-5-diameter cluster of a non-normal matrix are
    # individually conditioned only to ~cluster diameter; match to 1e-4
    _match_sets(w_cb, w_qr, atol=1e-4)
    _check_eigpairs(A, w_qr, V_qr, atol=1e-6)


def test_qr_defective_jordan_block(rng):
    """A defective matrix (2x2 Jordan block) must still produce eigenvalues
    near the true ones; eigenvectors come from regularized back-substitution
    so only the residual bound is meaningful up to sqrt(eps)."""
    n = 6
    J = np.diag(np.arange(1.0, n + 1.0).astype(np.complex128))
    J[0, 1] = 1.0
    J[0, 0] = J[1, 1] = 3.5   # double defective eigenvalue
    X = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Q, _ = np.linalg.qr(X)
    A = Q @ J @ Q.conj().T
    w_qr, _ = qr_eig(jnp.asarray(A))
    w_true = np.sort_complex(np.linalg.eigvals(A))
    # defective pair is only determined to sqrt(eps)
    _match_sets(w_true, w_qr, atol=1e-6)


@pytest.mark.parametrize("method", ["callback", "qr"])
def test_generalized_pencil(rng, method):
    """S v = lam G v with G Hermitian positive definite (the reduced-pencil
    shape: G = U^H B U, U orthonormal)."""
    n = 10
    S = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex128)
    C = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    G = C @ C.conj().T + n * np.eye(n)
    lam, V = generalized_eig(jnp.asarray(S), jnp.asarray(G), method=method)
    lam, V = np.asarray(lam), np.asarray(V)
    import scipy.linalg as sla
    lam_true = sla.eigvals(S, G)
    _match_sets(np.sort_complex(lam_true), lam, atol=1e-7)
    res = np.linalg.norm(S @ V - (G @ V) * lam[None, :], axis=0)
    assert np.all(res <= 1e-7 * np.maximum(np.abs(lam), 1.0) * np.linalg.norm(G))


def test_generalized_rank_deficient_G(rng):
    """Rank-deficient G: deflated reduced directions must map to huge
    eigenvalues (outside any contour), not NaNs — mirrors LAPACK ggev's
    tiny-beta convention."""
    n = 6
    S = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    U = np.linalg.qr(rng.standard_normal((n, n)))[0]
    G = U @ np.diag([1.0, 1.0, 1.0, 1.0, 0.0, 0.0]) @ U.T
    lam, V = generalized_eig(jnp.asarray(S.astype(np.complex128)),
                             jnp.asarray(G.astype(np.complex128)))
    lam = np.asarray(lam)
    assert np.all(np.isfinite(lam))


def test_driver_qr_vs_callback_end_to_end(rng):
    """feast_gegv with eig_method='qr' must agree with 'callback' on the
    same general pencil — this is the exact path difference between the
    axon chip (qr default) and the CPU suite (callback default)."""
    from feastkit_tpu.solvers.dense_general import feast_gegv

    n = 40
    A = laplacian_1d(n) + 0.3 * rng.standard_normal((n, n))
    B = np.eye(n) + 0.05 * rng.standard_normal((n, n))
    w = np.sort_complex(np.linalg.eigvals(np.linalg.solve(B, A)))
    Emid, r = 2.0, 0.7
    expected = w[np.abs(w - Emid) < r]
    r_cb = feast_gegv(A, B, Emid, r, M0=12, eig_method="callback")
    r_qr = feast_gegv(A, B, Emid, r, M0=12, eig_method="qr")
    assert r_cb.M == r_qr.M == len(expected)
    _match_sets(np.asarray(r_cb.lam), np.asarray(r_qr.lam), atol=1e-8)
    _match_sets(np.asarray(r_qr.lam), expected, atol=1e-8)


class TestPolishRotation:
    """Regression for the weak-f64 eigh polish (core/tools.py
    _polish_rotation): on the chip, raw eigh's ~2e-7*||C|| backward error
    over near-degenerate gaps ~1.5e-5 admits first-order corrections
    |Delta| ~ 0.05, and a single Y(I + Delta) step then LOSES orthonormality
    at Delta^2 ~ 2.5e-3 — which the GEVP whitening amplified into a 2e-5
    eigenvalue error at the 65k consistent-mass fixture. The iterated
    (polish, Newton-Schulz) pair must recover an orthonormal, diagonalizing
    basis from exactly such a corrupted start."""

    def _crowded_case(self, seed=0, n=72, theta=0.01):
        rng = np.random.default_rng(seed)
        base = np.sort(rng.uniform(0.0, 0.0156, n))
        base[10:12] = base[10]                     # exact degeneracy
        base[30:33] = base[30] + np.array([0.0, 1e-9, 2e-9])  # near-cluster
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        C = (Q * base[None, :]) @ Q.T
        C = 0.5 * (C + C.T)
        # corrupt the true eigenbasis by a random rotation of angle ~theta
        G = rng.standard_normal((n, n)) * theta
        G = 0.5 * (G - G.T)
        Y0, _ = np.linalg.qr(Q @ (np.eye(n) + G + G @ G / 2))
        return C, base, Y0

    def test_recovers_from_corrupted_rotation(self):
        from feastkit_tpu.core.tools import _polish_rotation
        C, base, Y0 = self._crowded_case()
        w, Y = _polish_rotation(jnp.asarray(C), jnp.asarray(Y0), iters=3)
        w = np.asarray(w)
        Y = np.asarray(Y)
        n = C.shape[0]
        # orthonormality is the property whose loss caused the field bug
        assert np.abs(Y.T @ Y - np.eye(n)).max() < 1e-10
        assert np.abs(np.sort(w) - base).max() < 1e-8
        assert np.abs(C @ Y - Y * w[None, :]).max() < 1e-7

    def test_complex_hermitian(self):
        from feastkit_tpu.core.tools import _polish_rotation
        rng = np.random.default_rng(3)
        n = 48
        base = np.sort(rng.uniform(0.0, 1.0, n))
        base[5:8] = base[5] + np.array([0.0, 1e-10, 2e-10])
        Z = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        Q, _ = np.linalg.qr(Z)
        C = (Q * base[None, :]) @ Q.conj().T
        C = 0.5 * (C + C.conj().T)
        G = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))) * 0.01
        G = 0.5 * (G - G.conj().T)
        Y0, _ = np.linalg.qr(Q @ (np.eye(n) + G))
        w, Y = _polish_rotation(jnp.asarray(C), jnp.asarray(Y0), iters=3)
        w = np.asarray(w)
        Y = np.asarray(Y)
        assert np.abs(Y.conj().T @ Y - np.eye(n)).max() < 1e-7
        assert np.abs(np.sort(w) - base).max() < 1e-8

    def test_eigh_polished_noop_on_strong_backend(self):
        # CPU raw eigh is accurate; eigh_polished must return its result
        # unchanged (no weak-backend machinery engaged)
        from feastkit_tpu.core.tools import eigh_polished
        rng = np.random.default_rng(1)
        A = rng.standard_normal((16, 16))
        C = 0.5 * (A + A.T)
        w, Y = eigh_polished(jnp.asarray(C))
        wt = np.linalg.eigvalsh(C)
        assert np.abs(np.asarray(w) - wt).max() < 1e-12
