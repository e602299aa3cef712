"""Split-complex f64 engines (ops/splitlu.py): pair-carried iterative
refinement, real embeddings of complex-Hermitian problems, and the
platform-feasibility gates.

These paths are TPU-only in production (XLA:TPU has no c128 HLO and no
f64 LU); FEAST_FORCE_PAIR_LU=1 forces them on the CPU backend so the
whole machinery is covered by the suite. Reference parity targets:
feast_dense.jl:147-213 (f64 getrf/getrs), feast_banded.jl:94-161 (f64
gbtrf/gbtrs), feast_sparse.jl:759-871 (zfeast_hcsr*), all at full f64.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import feastkit_tpu as fk
from feastkit_tpu.ops import splitlu
from feastkit_tpu.ops.banded import full_to_banded, banded_to_full

from conftest import laplacian_1d, laplacian_eigs


@pytest.fixture
def force_pair(monkeypatch):
    monkeypatch.setenv("FEAST_FORCE_PAIR_LU", "1")


def _rand_hermitian(n, seed=0, shift=4.0):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    return H + shift * np.eye(n)


def _rand_banded_hermitian(n, b, seed=0, shift=4.0):
    rng = np.random.default_rng(seed)
    H = np.zeros((n, n), complex)
    for d in range(b + 1):
        v = rng.standard_normal(n - d)
        if d > 0:
            v = v + 1j * rng.standard_normal(n - d)
            H += np.diag(v, d) + np.diag(v.conj(), -d)
        else:
            H += np.diag(v + shift)
    return H


# ---------------------------------------------------------------------------
# core primitive
# ---------------------------------------------------------------------------

class TestPairRefinedSolve:
    def test_reaches_f64_backward_error(self):
        """c64 inner solve + f64 pair refinement must beat 1e-13 relative
        residual — three decades below the raw c64 solve."""
        rng = np.random.default_rng(1)
        n, m = 64, 7
        A = laplacian_1d(n)
        z = 1.0 + 0.35j
        M = z * np.eye(n) - A
        F = rng.standard_normal((n, m))
        import jax.scipy.linalg as jsl
        lu, piv = jsl.lu_factor(jnp.asarray(M.astype(np.complex64)))

        def apply_shift(Xr, Xi):
            s, t = z.real, z.imag
            AXr, AXi = A @ Xr, A @ Xi
            return s * Xr - AXr - t * Xi, s * Xi - AXi + t * Xr

        Xr, Xi, ok = splitlu.pair_refined_solve(
            lambda Z: jsl.lu_solve((lu, piv), Z), apply_shift,
            jnp.asarray(F), jnp.zeros_like(jnp.asarray(F)))
        X = np.asarray(Xr) + 1j * np.asarray(Xi)
        rel = np.linalg.norm(M @ X - F) / np.linalg.norm(F)
        assert bool(ok)
        assert rel < 1e-13
        # and the raw c64 solve alone genuinely cannot do this
        X0 = np.asarray(jsl.lu_solve((lu, piv),
                                     jnp.asarray(F.astype(np.complex64))))
        rel0 = np.linalg.norm(M @ X0 - F) / np.linalg.norm(F)
        assert rel0 > 1e-8


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

class TestEmbeddings:
    def test_dense_embedding_spectrum(self):
        H = _rand_hermitian(24, seed=5)
        E = splitlu.embed_hermitian_dense(H)
        assert np.allclose(E, E.T)
        ev = np.linalg.eigvalsh(H)
        evE = np.linalg.eigvalsh(E)
        assert np.allclose(np.repeat(ev, 2), evE, atol=1e-10)

    def test_banded_embedding_matches_dense_interleaved(self):
        n, b = 20, 2
        H = _rand_banded_hermitian(n, b, seed=6)
        Hb = full_to_banded(H, b, b)
        Eb, KL, KU = splitlu.embed_hermitian_banded(Hb, b, b)
        assert (KL, KU) == (2 * b + 1, 2 * b + 1)
        E = banded_to_full(Eb, KL, KU)
        # interleaved embedding: rows/cols (2i, 2i+1) hold the 2x2 block
        # [[re, -im], [im, re]] of H[i, j]
        P = np.zeros((2 * n, 2 * n))
        for i in range(n):
            P[2 * i, i] = 1.0          # Re slot
            P[2 * i + 1, n + i] = 1.0  # Im slot
        Eblk = splitlu.embed_hermitian_dense(H)
        assert np.allclose(E, P @ Eblk @ P.T, atol=1e-12)

    def test_sparse_embedding_matches_dense(self):
        H = _rand_banded_hermitian(16, 3, seed=7)
        Hs = sp.csr_matrix(H)
        E = splitlu.embed_hermitian_sparse(Hs).toarray()
        n = H.shape[0]
        P = np.zeros((2 * n, 2 * n))
        for i in range(n):
            P[2 * i, i] = 1.0
            P[2 * i + 1, n + i] = 1.0
        assert np.allclose(E, P @ splitlu.embed_hermitian_dense(H) @ P.T,
                           atol=1e-12)

    def test_collapse_recovers_complex_pairs(self):
        """Embedded eigenvectors of a known Hermitian matrix collapse to
        eigenvectors of the complex matrix, one per doubled eigenvalue."""
        H = _rand_hermitian(18, seed=8)
        E = splitlu.embed_hermitian_dense(H)
        ev, W = np.linalg.eigh(E)
        sel = slice(10, 18)           # 4 doubled eigenvalues
        lam = ev[sel]
        Q2 = W[:, sel]
        res = np.full(lam.size, 1e-14)
        inside = np.ones(lam.size, bool)
        lam_c, X, res_c, ins = splitlu.collapse_embedded(
            lam, Q2, res, inside, interleaved=False,
            apply_A=lambda X: H @ X)
        assert lam_c.size == 4
        for j in range(4):
            r = np.linalg.norm(H @ X[:, j] - lam_c[j] * X[:, j])
            assert r < 1e-10
        assert np.all(res_c < 1e-10)


# ---------------------------------------------------------------------------
# drivers through the public API (forced pair mode)
# ---------------------------------------------------------------------------

class TestPairDrivers:
    def test_dense_real_standard(self, force_pair):
        n = 96
        A = laplacian_1d(n)
        ev = laplacian_eigs(n)
        exp = ev[(ev > 0.9) & (ev < 1.2)]
        r = fk.feast(A, None, (0.9, 1.2), M0=2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS
        assert r.M == len(exp)
        assert np.allclose(np.sort(r.lam), np.sort(exp), atol=1e-10)
        assert float(r.epsout) < 1e-11

    def test_dense_real_generalized(self, force_pair, rng):
        n = 80
        A = laplacian_1d(n)
        B = np.diag(1.0 + 0.2 * rng.random(n))
        import scipy.linalg as sla
        ev = sla.eigh(A, B, eigvals_only=True)
        exp = ev[(ev > 0.8) & (ev < 1.1)]
        r = fk.feast(A, B, (0.8, 1.1), M0=2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert np.allclose(np.sort(r.lam), np.sort(exp), atol=1e-10)

    def test_dense_hermitian_embedded(self, force_pair):
        n = 64
        H = _rand_hermitian(n, seed=11)
        ev = np.linalg.eigvalsh(H)
        lo, hi = ev[30] - 1e-9, ev[38] + 1e-9
        exp = ev[(ev > lo) & (ev < hi)]
        r = fk.feast(H, None, (lo, hi), M0=2 * len(exp))
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert np.allclose(np.sort(r.lam), np.sort(exp), atol=1e-9)
        # complex eigenvectors of the ORIGINAL operator
        for j in range(r.M):
            x, l = r.q[:, j], r.lam[j]
            assert np.linalg.norm(H @ x - l * x) / max(abs(l), 1) < 1e-10

    def test_banded_real_pair(self, force_pair):
        n = 300
        A = laplacian_1d(n)
        Ab = full_to_banded(A, 1, 1)
        ev = laplacian_eigs(n)
        exp = ev[(ev > 0.5) & (ev < 0.6)]
        r = fk.feast_sbev(Ab, 1, 1, 0.5, 0.6, 2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert float(r.epsout) < 1e-11

    def test_banded_hermitian_embedded(self, force_pair):
        n, b = 150, 2
        H = _rand_banded_hermitian(n, b, seed=12)
        Hb = full_to_banded(H, b, b)
        ev = np.linalg.eigvalsh(H)
        lo, hi = ev[70] - 1e-9, ev[78] + 1e-9
        exp = ev[(ev > lo) & (ev < hi)]
        r = fk.feast_hbev(Hb, b, b, lo, hi, 2 * len(exp))
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        for j in range(r.M):
            x, l = r.q[:, j], r.lam[j]
            assert np.linalg.norm(H @ x - l * x) / max(abs(l), 1) < 1e-9

    def test_sparse_hermitian_embedded(self, force_pair):
        m = 220
        rng = np.random.default_rng(13)
        d0 = 4.0 + rng.random(m)
        d1 = rng.standard_normal(m - 1) + 1j * rng.standard_normal(m - 1)
        H = sp.diags([d0, d1, d1.conj()], [0, 1, -1], format="csr")
        ev = np.linalg.eigvalsh(H.toarray())
        lo, hi = ev[100] - 1e-9, ev[112] + 1e-9
        exp = ev[(ev > lo) & (ev < hi)]
        r = fk.feast_hcsrev(H, lo, hi, 2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert np.allclose(np.sort(r.lam), np.sort(exp), atol=1e-9)
        for j in range(r.M):
            x, l = r.q[:, j], r.lam[j]
            assert np.linalg.norm(H @ x - l * x) / max(abs(l), 1) < 1e-9

    def test_sparse_hermitian_generalized_embedded(self, force_pair):
        m = 180
        rng = np.random.default_rng(14)
        d0 = 4.0 + rng.random(m)
        d1 = rng.standard_normal(m - 1) + 1j * rng.standard_normal(m - 1)
        H = sp.diags([d0, d1, d1.conj()], [0, 1, -1], format="csr")
        Bm = sp.diags([1.0 + 0.3 * rng.random(m)], [0], format="csr")
        import scipy.linalg as sla
        ev = sla.eigh(H.toarray(), Bm.toarray(), eigvals_only=True)
        lo, hi = ev[80] - 1e-9, ev[92] + 1e-9
        exp = ev[(ev > lo) & (ev < hi)]
        r = fk.feast_hcsrgv(H, Bm, lo, hi, 2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert np.allclose(np.sort(r.lam), np.sort(exp), atol=1e-9)

    def test_narrow_band_router_f64(self, force_pair):
        """The auto-router's BCR delegation (the verdict's live-crash
        config: f64 tridiagonal through feast_scsrev) must converge in
        pair mode — platform feasibility is part of eligibility now."""
        n = 400
        A = sp.diags([2.0 * np.ones(n), -1.0 * np.ones(n - 1),
                      -1.0 * np.ones(n - 1)], [0, 1, -1], format="csr")
        ev = laplacian_eigs(n)
        exp = ev[(ev > 0.5) & (ev < 0.56)]
        r = fk.feast_scsrev(A, 0.5, 0.56, 2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert float(r.epsout) < 1e-11

    def test_estimate_mode_embedded_halves(self, force_pair):
        """fpm[14]=2 stochastic estimate through the embedding counts every
        eigenvalue twice; the collapse must halve it back."""
        n = 64
        H = _rand_hermitian(n, seed=15)
        ev = np.linalg.eigvalsh(H)
        lo, hi = ev[20] - 1e-9, ev[35] + 1e-9
        fpm = fk.feastinit()
        fpm[14] = 2
        fpm[32] = 40
        r = fk.feast(H, None, (lo, hi), M0=20, fpm=fpm)
        assert abs(r.M - 16) <= 5


class TestMatfreePair:
    def test_matfree_f64_pair_contour(self, force_pair):
        """Real-operator matrix-free f64 contour engine: c64 GMRES inner
        + pair-carried f64 refinement (the reference's real-callback
        complex-solve split at full double; accuracy floored at the c64
        inner solver's attainable ~1e-7)."""
        import jax.numpy as jnp
        from feastkit_tpu.solvers.matfree import feast_matvec, LinearOperator
        n = 160

        def A_mv(X):
            Y = 2.0 * X
            Y = Y.at[:-1].add(-X[1:])
            Y = Y.at[1:].add(-X[:-1])
            return Y

        A_op = LinearOperator(A_mv, (n, n), jnp.float64, symmetric=True)
        A = laplacian_1d(n)
        ev = laplacian_eigs(n)
        exp = ev[(ev > 0.5) & (ev < 0.7)]
        r = feast_matvec(A_op, None, (0.5, 0.7), 2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert float(r.epsout) < 1e-7
        x, l = np.asarray(r.q[:, 0]), r.lam[0]
        assert np.linalg.norm(A @ x - l * x) / max(abs(l), 1) < 1e-7


class TestShardedPair:
    def test_pfeast_sparse_hermitian_embedded(self, force_pair):
        """Sharded complex-Hermitian f64: interleaved embedding through the
        mesh driver's real path, collapsed on return. Loose tolerance /
        small mesh keeps the compile bill test-sized; the collapse
        recomputes residuals against the TRUE complex operator and
        upgrades info when they meet the tolerance."""
        from feastkit_tpu.parallel.pfeast import pfeast_sparse, contour_mesh
        m = 48
        rng = np.random.default_rng(19)
        d0 = 4.0 + rng.random(m)
        d1 = rng.standard_normal(m - 1) + 1j * rng.standard_normal(m - 1)
        H = sp.diags([d0, d1, d1.conj()], [0, 1, -1], format="csr")
        ev = np.linalg.eigvalsh(H.toarray())
        lo, hi = ev[20] - 1e-9, ev[26] + 1e-9
        exp = ev[(ev > lo) & (ev < hi)]
        fpm = fk.feastinit()
        fpm[3] = 7
        fpm[4] = 6
        r = pfeast_sparse(H, None, lo, hi, 2 * len(exp) + 2, fpm,
                          mesh=contour_mesh(2), hermitian=True)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert np.allclose(np.sort(r.lam), np.sort(exp), atol=1e-6)

    def test_pfeast_dense_f64_demotes(self, force_pair):
        from feastkit_tpu.parallel.pfeast import pfeast_dense, contour_mesh
        H = _rand_hermitian(48, seed=20)
        with pytest.warns(RuntimeWarning, match="complex64"):
            r = pfeast_dense(H, None, -5.0, 5.0, 12, mesh=contour_mesh(4),
                             hermitian=True)
        assert r.M >= 0


class TestGates:
    def test_general_demotes_with_warning(self, force_pair):
        rng = np.random.default_rng(16)
        n = 40
        A = rng.standard_normal((n, n))
        with pytest.warns(RuntimeWarning, match="complex64"):
            r = fk.feast_general(A, None, 0.0, 10.0, M0=20)
        # demoted work precision still produces a valid (c64-accuracy) run
        assert r.q.dtype == np.complex64 or r.M >= 0

    def test_general_strict_raises(self, force_pair, monkeypatch):
        monkeypatch.setenv("FEAST_STRICT_F64", "1")
        rng = np.random.default_rng(17)
        n = 30
        A = rng.standard_normal((n, n))
        with pytest.raises(RuntimeError, match="FEAST_STRICT_F64"):
            fk.feast_general(A, None, 0.0, 10.0, M0=10)

    def test_cpu_paths_untouched_without_flag(self, monkeypatch):
        monkeypatch.delenv("FEAST_FORCE_PAIR_LU", raising=False)
        assert splitlu.f64_lu_unavailable() == (
            jax.default_backend() == "tpu")
