"""Blocked LU for batched FEAST shifted pencils (ops/blocklu.py).

TPU-only in production (the builtin batched LU there runs at ~1.5% of
matmul throughput); FEAST_BLOCK_LU=1 forces it on CPU for coverage.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import feastkit_tpu as fk
from feastkit_tpu.ops.blocklu import (block_lu_factor, block_lu_solve,
                                      use_block_lu)

from conftest import laplacian_1d, laplacian_eigs


def _pencils(n, ne=6, seed=0):
    """Hermitian shifted pencils z I - A (the accretive FEAST class)."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    Z = (np.linspace(-1.0, 1.0, ne) + 0.4j).astype(np.complex128)
    M = (Z[:, None, None] * np.eye(n)[None] - A[None]).astype(np.complex64)
    return M


class TestBlockLU:
    @pytest.mark.parametrize("n,b", [(200, 64), (384, 128), (50, 128)])
    def test_factor_solve_roundtrip(self, n, b):
        M = _pencils(n)
        F, piv = jax.jit(lambda m: block_lu_factor(m, block=b))(M)
        rng = np.random.default_rng(1)
        rhs = (rng.standard_normal((M.shape[0], n, 7))
               + 1j * rng.standard_normal((M.shape[0], n, 7))
               ).astype(np.complex64)
        X = np.asarray(jax.jit(
            lambda F, p, r: block_lu_solve(F, p, r, block=b))(F, piv, rhs))
        rel = np.linalg.norm(M @ X - rhs) / np.linalg.norm(rhs)
        assert rel < 5e-5

    def test_adjoint_solve(self):
        M = _pencils(160)
        F, piv = jax.jit(lambda m: block_lu_factor(m, block=64))(M)
        rng = np.random.default_rng(2)
        rhs = (rng.standard_normal((M.shape[0], 160, 4))
               + 1j * rng.standard_normal((M.shape[0], 160, 4))
               ).astype(np.complex64)
        X = np.asarray(jax.jit(lambda F, p, r: block_lu_solve(
            F, p, r, trans=2, block=64))(F, piv, rhs))
        MH = np.conj(np.swapaxes(M, -1, -2))
        rel = np.linalg.norm(MH @ X - rhs) / np.linalg.norm(rhs)
        assert rel < 5e-5

    def test_matches_builtin_lu(self):
        import jax.scipy.linalg as jsl
        M = _pencils(128)
        F, piv = jax.jit(lambda m: block_lu_factor(m, block=64))(M)
        rng = np.random.default_rng(3)
        rhs = (rng.standard_normal((M.shape[0], 128, 3)) + 0j
               ).astype(np.complex64)
        Xb = np.asarray(jax.jit(lambda F, p, r: block_lu_solve(
            F, p, r, block=64))(F, piv, rhs))
        lu, pv = jax.vmap(jsl.lu_factor)(jnp.asarray(M))
        Xr = np.asarray(jax.vmap(jsl.lu_solve)((lu, pv), jnp.asarray(rhs)))
        assert np.allclose(Xb, Xr, atol=2e-4)

    def test_env_gate(self, monkeypatch):
        monkeypatch.setenv("FEAST_BLOCK_LU", "0")
        assert not use_block_lu(4096, np.complex64)
        monkeypatch.setenv("FEAST_BLOCK_LU", "1")
        assert use_block_lu(64, np.complex64)


class TestThroughDriver:
    def test_dense_f32_blocked(self, monkeypatch):
        monkeypatch.setenv("FEAST_BLOCK_LU", "1")
        n = 256
        A = laplacian_1d(n).astype(np.float32)
        ev = laplacian_eigs(n)
        exp = ev[(ev > 0.5) & (ev < 0.7)]
        r = fk.feast(A, None, (0.5, 0.7), M0=2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)

    def test_dense_f64_pair_blocked(self, monkeypatch):
        monkeypatch.setenv("FEAST_BLOCK_LU", "1")
        monkeypatch.setenv("FEAST_FORCE_PAIR_LU", "1")
        n = 256
        A = laplacian_1d(n)
        ev = laplacian_eigs(n)
        exp = ev[(ev > 0.5) & (ev < 0.7)]
        r = fk.feast(A, None, (0.5, 0.7), M0=2 * len(exp) + 2)
        assert r.info == fk.FeastError.SUCCESS and r.M == len(exp)
        assert float(r.epsout) < 1e-11
