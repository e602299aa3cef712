"""Blocked (right-looking) LU for batched FEAST shifted pencils.

XLA:TPU's builtin ``LuDecomposition`` runs the batched (ne, N, N) c64
factorization at ~2 real-TFLOP/s on this chip (measured at the BASELINE
dense shape (16, 2048, 2048): 179 ms) — ~1.5% of the chip's measured
matmul throughput, because its panel factorization is a long sequential
scalar recurrence. FEAST's dominant one-time cost is exactly this batched
factorization (SURVEY.md section 2.7: getrf per contour node), so this
module re-blocks it MXU-first:

* the matrix is partitioned into b x b blocks (b = 256);
* each step factors ONE diagonal block with the builtin (pivoted) LU —
  O(nb * b^3) work, a vanishing fraction — and forms the sub-panel and
  trailing Schur update with batched GEMMs, where ~all the (2/3) N^3
  MACs live.

Pivoting is LOCAL to the diagonal blocks (block LU, not LU with partial
pivoting). That is numerically sound for FEAST pencils: with A, B
Hermitian (B SPD or I) and a contour node z with Im z != 0, the shifted
pencil M = zB - A has skew-Hermitian part i*(Im z)*B DEFINITE, i.e. M is
accretive after rotation by i — the class for which LU without row
exchanges is backward stable with bounded growth (diagonal blocks stay
nonsingular with ||M_kk^-1|| <= 1/(Im z * lam_min(B))). The drivers keep
their iterative-refinement sweeps on top (solvers/dense.py
_refine_iters_for), so any residual growth is measured and corrected
against the exact operator.

Parity: LAPACK getrf/getrs per contour node with a factor cache
(/root/reference's feast_dense.jl:147-213) — same semantics, MXU-shaped.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = ["block_lu_factor", "block_lu_solve", "use_block_lu"]

_BLOCK = 256


def use_block_lu(N: int, dtype) -> bool:
    """Blocked LU pays where the builtin's sequential panel dominates:
    sizeable N on the TPU backend. FEAST_BLOCK_LU=0 opts out, =1 forces
    (CPU test coverage)."""
    env = os.environ.get("FEAST_BLOCK_LU")
    if env == "0":
        return False
    if env == "1":
        return True
    try:
        return jax.default_backend() == "tpu" and N >= 1024
    except Exception:                                    # pragma: no cover
        return False


def _pad_to_blocks(M, b):
    N = M.shape[-1]
    nb = -(-N // b)
    Np = nb * b
    if Np == N:
        return M, N
    pad = jnp.zeros(M.shape[:-2] + (Np, Np), M.dtype)
    pad = pad.at[..., :N, :N].set(M)
    # identity on padded diagonal keeps the factorization nonsingular
    idx = jnp.arange(N, Np)
    pad = pad.at[..., idx, idx].set(1.0)
    return pad, N


def block_lu_factor(M, block: int = _BLOCK):
    """Batched block-LU of ``M`` (..., N, N).

    Returns ``(F, piv, N)``: ``F`` holds, in place, the unit-block-lower
    panels L[i,k] (strictly-below-diagonal blocks), the builtin-packed LU
    of each diagonal block, and the updated upper panels U[k,j];
    ``piv`` is (..., nb, b) of per-diagonal-block pivots.
    """
    b = block
    F, N = _pad_to_blocks(jnp.asarray(M), b)
    nb = F.shape[-1] // b
    pivs = []
    for k in range(nb):
        o = k * b
        D = F[..., o:o + b, o:o + b]
        lu_k, piv_k = jnp.linalg.lu_factor(D) if hasattr(jnp.linalg, "lu_factor") \
            else jsl.lu_factor(D)
        pivs.append(piv_k)
        F = F.at[..., o:o + b, o:o + b].set(lu_k)
        if k + 1 < nb:
            P = F[..., o + b:, o:o + b]          # (..., m, b) sub-panel
            # L = P @ M_kk^{-1}  ==  solve M_kk^T X^T = P^T from the left
            L = jnp.swapaxes(
                jsl.lu_solve((lu_k, piv_k), jnp.swapaxes(P, -1, -2),
                             trans=1), -1, -2)
            U = F[..., o:o + b, o + b:]          # (..., b, m) upper panel
            T = F[..., o + b:, o + b:] - L @ U   # Schur update: the GEMM
            F = F.at[..., o + b:, o:o + b].set(L)
            F = F.at[..., o + b:, o + b:].set(T)
    piv = jnp.stack(pivs, axis=-2)               # (..., nb, b)
    return F, piv


def block_lu_solve(F, piv, rhs, trans: int = 0, block: int = _BLOCK):
    """Solve with a :func:`block_lu_factor` result; ``rhs`` (..., N, M)
    with N the ORIGINAL (pre-padding) size — the pad offset is derived
    from the shapes, which are static under jit.

    trans=0: M x = rhs. trans=2: M^H x = rhs (the Hermitian drivers'
    adjoint-solve on the same factors, jsl.lu_solve's convention).
    """
    b = block
    Np = F.shape[-1]
    nb = Np // b
    N = rhs.shape[-2]
    pad = Np - N
    if pad:
        z = jnp.zeros(rhs.shape[:-2] + (pad, rhs.shape[-1]), rhs.dtype)
        rhs = jnp.concatenate([rhs, z], axis=-2)
    y = rhs

    def dlu(k):
        o = k * b
        return (F[..., o:o + b, o:o + b], piv[..., k, :])

    if trans == 0:
        # forward: unit-block-lower L
        for k in range(nb - 1):
            o = k * b
            yk = y[..., o:o + b, :]
            y = y.at[..., o + b:, :].add(-F[..., o + b:, o:o + b] @ yk)
        # backward: block-upper U (diagonal blocks via the packed LU)
        for k in range(nb - 1, -1, -1):
            o = k * b
            rk = y[..., o:o + b, :]
            if k + 1 < nb:
                rk = rk - F[..., o:o + b, o + b:] @ y[..., o + b:, :]
            lu_k, piv_k = dlu(k)
            xk = jsl.lu_solve((lu_k, piv_k), rk)
            y = y.at[..., o:o + b, :].set(xk)
    else:
        # M^H = U^H L^H: forward over U^H (diagonal lu_solve trans=2),
        # then backward over L^H (unit diagonal).
        for k in range(nb):
            o = k * b
            rk = y[..., o:o + b, :]
            lu_k, piv_k = dlu(k)
            wk = jsl.lu_solve((lu_k, piv_k), rk, trans=2)
            y = y.at[..., o:o + b, :].set(wk)
            if k + 1 < nb:
                U = F[..., o:o + b, o + b:]      # U[k, j] panels
                y = y.at[..., o + b:, :].add(
                    -jnp.swapaxes(jnp.conj(U), -1, -2) @ wk)
        for k in range(nb - 2, -1, -1):
            o = k * b
            L = F[..., o + b:, o:o + b]          # L[i, k] panels
            y = y.at[..., o:o + b, :].add(
                -jnp.swapaxes(jnp.conj(L), -1, -2) @ y[..., o + b:, :])
    return y[..., :N, :]
