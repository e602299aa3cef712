"""Banded linear algebra for TPU: band storage, band matvec, and a block
cyclic-reduction (BCR) factor/solve.

TPU-native replacement of the reference's LAPACK ``gbtrf!/gbtrs!`` banded LU
(feast_banded.jl:94-161) per SURVEY.md section 2.7: a sequential banded LU is
hostile to the MXU (O(N) dependent scalar steps), so the banded matrix is
re-blocked into block-tridiagonal form (block size b = max(kl, ku)) and
factored by block cyclic reduction — log2(N/b) levels of batched b x b
LU factorizations and matmuls, all MXU-shaped, vmappable over contour nodes.

The BCR hierarchy plays the role of the cached LAPACK factorization
(feast_banded.jl factor cache at :94-161): ``bcr_factor`` once per contour
node, ``bcr_solve`` per refinement loop with multi-RHS.

Band storage convention (matches LAPACK ``ab`` used by the reference):
``bands`` has shape (kl+ku+1, N); row k holds diagonal d = ku-k, i.e.
bands[k, j] = A[j - (ku-k), j] (column-major diagonals, row 0 = highest
superdiagonal). Out-of-range entries are zero.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = [
    "full_to_banded", "banded_to_full", "dia_to_banded", "banded_matvec",
    "banded_to_blocktridiag", "bcr_factor", "bcr_solve", "BCRLevel",
]


# ---------------------------------------------------------------------------
# Storage conversion (host-side utilities; parity with full_to_banded /
# banded_to_full, feast_banded.jl:1286-1330, :423-483)
# ---------------------------------------------------------------------------

def full_to_banded(A, kl: int, ku: int) -> np.ndarray:
    """Dense (N, N) -> band storage (kl+ku+1, N)."""
    A = np.asarray(A)
    N = A.shape[0]
    bands = np.zeros((kl + ku + 1, N), dtype=A.dtype)
    for k in range(kl + ku + 1):
        d = ku - k              # diagonal offset: A[i, i+d]
        for j in range(N):
            i = j - d
            if 0 <= i < N:
                bands[k, j] = A[i, j]
    return bands


def dia_to_banded(diags, offsets, kl: int, ku: int) -> np.ndarray:
    """Row-aligned DIA form (ops/pallas_kernels.bcoo_to_dia) -> LAPACK band
    storage (kl+ku+1, N).

    diags[k, i] = A[i, i + offsets[k]]  ->  bands[ku - d, j] = A[j - d, j].
    Inverse of pallas_kernels.bands_to_dia; offsets must lie in [-kl, ku].
    """
    diags = np.asarray(diags)
    N = diags.shape[1]
    bands = np.zeros((kl + ku + 1, N), dtype=diags.dtype)
    for k, d in enumerate(offsets):
        if not -kl <= d <= ku:
            raise ValueError(f"offset {d} outside band [-{kl}, {ku}]")
        if d >= 0:
            bands[ku - d, d:] = diags[k, : N - d]
        else:
            bands[ku - d, : N + d] = diags[k, -d:]
    return bands


def banded_to_full(bands, kl: int, ku: int, N: int | None = None) -> np.ndarray:
    """Band storage -> dense (N, N)."""
    bands = np.asarray(bands)
    N = bands.shape[1] if N is None else N
    A = np.zeros((N, N), dtype=bands.dtype)
    for k in range(kl + ku + 1):
        d = ku - k
        for j in range(N):
            i = j - d
            if 0 <= i < N:
                A[i, j] = bands[k, j]
    return A


def banded_matvec(bands, x, kl: int, ku: int):
    """y = A @ x with A in band storage; x is (N,) or (N, M).

    Static Python loop over the kl+ku+1 diagonals (band matvec parity:
    general_banded_matvec!, feast_banded.jl:298-314; the
    symmetric/Hermitian mirrored variants are expressed by storing the full
    band). Each diagonal is one shifted elementwise multiply — VPU work,
    fused by XLA.
    """
    bands = jnp.asarray(bands)
    N = bands.shape[1]
    x2 = x if x.ndim == 2 else x[:, None]
    y = jnp.zeros((N, x2.shape[1]), dtype=jnp.result_type(bands.dtype, x.dtype))
    for k in range(bands.shape[0]):
        d = ku - k              # y[i] += A[i, i+d] * x[i+d] = bands[k, i+d]*x[i+d]
        if d >= 0:
            contrib = bands[k, d:] * x2[d:].T      # rows 0..N-d-1
            y = y.at[:N - d].add(contrib.T) if d > 0 else y + contrib.T
        else:
            contrib = bands[k, :d] * x2[:d].T      # rows -d..N-1, cols 0..N+d-1
            y = y.at[-d:].add(contrib.T)
    return y if x.ndim == 2 else y[:, 0]


# ---------------------------------------------------------------------------
# Block-tridiagonal re-blocking
# ---------------------------------------------------------------------------

def _auto_block(kl: int, ku: int, N: int) -> int:
    """Platform-aware BCR block size.

    The minimum legal block is max(kl, ku, 1) (coupling must stay within
    adjacent blocks). On TPU that leaves the 128x128 MXU ~99% idle for
    narrow bands and makes the BCR level count (and per-level dispatch
    overhead) deep: re-block to MXU-shaped 128x128 blocks — each level is
    then a handful of batched dense LUs/matmuls at systolic width. The
    extra flops (b^3 per block vs band elimination) are free next to the
    latency they remove. CPU keeps the narrow blocks (flops are NOT free
    there)."""
    b_min = max(kl, ku, 1)
    try:
        plat = jax.default_backend()
    except Exception:                                  # pragma: no cover
        plat = "cpu"
    if plat != "tpu" or N <= 256:
        return b_min
    b = min(128, 1 << int(np.floor(np.log2(max(N // 8, 1)))))
    return max(b_min, b)


def banded_to_blocktridiag(bands, kl: int, ku: int, block: int | None = None):
    """Band storage -> block-tridiagonal (D, L, U) with padding.

    Block size b >= max(kl, ku, 1) (default: :func:`_auto_block` — MXU-
    shaped 128 on TPU, minimal elsewhere); the block count is padded to a
    power of two with identity diagonal blocks (decoupled trailing
    equations), so BCR runs a static log2 schedule. Returns
    (D (nb,b,b), L, U, b, N) with L[i] connecting block i to i-1 (L[0] = 0)
    and U[i] to i+1 (U[last]=0).
    """
    bands = jnp.asarray(bands)
    N = bands.shape[1]
    b = _auto_block(kl, ku, N) if block is None else block
    nb = -(-N // b)
    nb_pad = 1 << max(int(np.ceil(np.log2(max(nb, 1)))), 0)
    Npad = nb_pad * b

    # Scatter diagonals into a (Npad, 2b+... ) skewed layout then carve
    # blocks. Simpler: build row/col index maps per diagonal.
    dtype = bands.dtype
    D = jnp.zeros((nb_pad, b, b), dtype)
    L = jnp.zeros((nb_pad, b, b), dtype)
    U = jnp.zeros((nb_pad, b, b), dtype)
    # identity padding for rows >= N
    eye_pad = (jnp.arange(Npad) >= N)
    blk = jnp.arange(Npad) // b
    loc = jnp.arange(Npad) % b

    for k in range(bands.shape[0]):
        d = ku - k                       # entry A[i, i+d] = bands[k, i+d]
        i = jnp.arange(Npad)
        j = i + d
        valid = (j >= 0) & (j < N) & (i < N)
        vals = jnp.where(valid, bands[k, jnp.clip(j, 0, N - 1)], 0)
        bi, bj = i // b, jnp.clip(j, 0, Npad - 1) // b
        li, lj = i % b, jnp.clip(j, 0, Npad - 1) % b
        same = valid & (bi == bj)
        up = valid & (bj == bi + 1)
        lo = valid & (bj == bi - 1)
        D = D.at[bi, li, lj].add(jnp.where(same, vals, 0))
        U = U.at[bi, li, lj].add(jnp.where(up, vals, 0))
        L = L.at[bi, li, lj].add(jnp.where(lo, vals, 0))
    # identity on padded rows
    D = D.at[blk, loc, loc].add(jnp.where(eye_pad, 1.0, 0.0).astype(dtype))
    return D, L, U, b, N


class BCRLevel(NamedTuple):
    lu_odd: jax.Array      # (m, b, b) LU factors of odd diagonal blocks
    piv_odd: jax.Array     # (m, b)
    L_odd: jax.Array       # (m, b, b) odd blocks' couplings (for back-subst)
    U_odd: jax.Array
    C1: jax.Array          # (m, b, b) L_even @ D_{odd left}^-1
    C2: jax.Array          # (m, b, b) U_even @ D_{odd right}^-1


def bcr_factor(D, L, U):
    """Block-cyclic-reduction factorization of a block-tridiagonal matrix.

    Returns (levels, root_lu, root_piv): per level the cached elimination
    operators; root = the final single block. Python-level loop over the
    static log2(nb) levels (shapes halve each level; all batched ops).
    """
    levels = []
    nb = D.shape[0]
    b = D.shape[-1]
    while nb > 1:
        Do, Lo, Uo = D[1::2], L[1::2], U[1::2]        # odd blocks (eliminated)
        De, Le, Ue = D[0::2], L[0::2], U[0::2]        # even blocks (kept)
        lu_o, piv_o = jax.vmap(jsl.lu_factor)(Do)
        m = De.shape[0]
        # even block j=2k: left odd neighbor 2k-1 (odd index k-1),
        # right odd neighbor 2k+1 (odd index k). Neighbor factorizations are
        # aligned with a dummy identity LU where the neighbor is absent and
        # the contribution masked — NO explicit inverses are formed
        # (X @ D^-1 is computed as lu_solve(D^T y = X^T)^T, retaining the
        # pivoted factorization's stability, the gbtrf analog).
        eye_lu, eye_piv = jsl.lu_factor(jnp.eye(b, dtype=D.dtype))
        dummy_lu = eye_lu[None]
        dummy_piv = eye_piv[None]
        lu_left = jnp.concatenate([dummy_lu, lu_o], axis=0)[:m]
        piv_left = jnp.concatenate([dummy_piv, piv_o], axis=0)[:m]
        has_left = (jnp.arange(m) > 0)[:, None, None]
        if lu_o.shape[0] == m:
            lu_right, piv_right = lu_o, piv_o
            has_right = jnp.ones((m, 1, 1), bool)
        else:
            lu_right = jnp.concatenate([lu_o, dummy_lu], axis=0)[:m]
            piv_right = jnp.concatenate([piv_o, dummy_piv], axis=0)[:m]
            has_right = (jnp.arange(m) < lu_o.shape[0])[:, None, None]
        L_left = jnp.concatenate([jnp.zeros_like(Lo[:1]), Lo], axis=0)[:m]
        U_left = jnp.concatenate([jnp.zeros_like(Uo[:1]), Uo], axis=0)[:m]
        L_right = Lo if Lo.shape[0] == m else jnp.concatenate(
            [Lo, jnp.zeros_like(Lo[:1])], axis=0)[:m]
        U_right = Uo if Uo.shape[0] == m else jnp.concatenate(
            [Uo, jnp.zeros_like(Uo[:1])], axis=0)[:m]

        def _right_div(X, lu, piv):
            # X @ D^-1 = solve(D^T Y = X^T)^T
            return jnp.swapaxes(
                jax.vmap(lambda l, p, xt: jsl.lu_solve((l, p), xt, trans=1))(
                    lu, piv, jnp.swapaxes(X, -1, -2)), -1, -2)

        C1 = jnp.where(has_left, _right_div(Le, lu_left, piv_left), 0)
        C2 = jnp.where(has_right, _right_div(Ue, lu_right, piv_right), 0)
        D_new = (De - jnp.einsum("kij,kjl->kil", C1, U_left)
                 - jnp.einsum("kij,kjl->kil", C2, L_right))
        L_new = -jnp.einsum("kij,kjl->kil", C1, L_left)
        U_new = -jnp.einsum("kij,kjl->kil", C2, U_right)
        levels.append(BCRLevel(lu_o, piv_o, Lo, Uo, C1, C2))
        D, L, U = D_new, L_new, U_new
        nb = D.shape[0]
    root_lu, root_piv = jsl.lu_factor(D[0])
    return levels, root_lu, root_piv


def bcr_solve(levels, root_lu, root_piv, rhs_blocks):
    """Solve with a cached BCR factorization; rhs_blocks is (nb, b, M)."""
    # Restriction sweep: fold odd rhs into even.
    stack = []
    f = rhs_blocks
    for lvl in levels:
        fo, fe = f[1::2], f[0::2]
        m = fe.shape[0]
        zeros = jnp.zeros_like(fo[:1])
        f_left = jnp.concatenate([zeros, fo], axis=0)[:m]
        f_right = fo if fo.shape[0] == m else jnp.concatenate(
            [fo, zeros], axis=0)[:m]
        fe = (fe - jnp.einsum("kij,kjm->kim", lvl.C1, f_left)
              - jnp.einsum("kij,kjm->kim", lvl.C2, f_right))
        stack.append(fo)
        f = fe
    # Root solve.
    x = jsl.lu_solve((root_lu, root_piv), f[0])[None]
    # Back-substitution sweep.
    for lvl, fo in zip(reversed(levels), reversed(stack)):
        # x currently holds the even blocks of this level.
        xe = x
        mo = fo.shape[0]
        # odd block i=2k+1: left even neighbor k, right even neighbor k+1
        x_left = xe[:mo]
        zeros = jnp.zeros_like(xe[:1])
        x_right = jnp.concatenate([xe[1:], zeros], axis=0)[:mo]
        rhs_o = (fo - jnp.einsum("kij,kjm->kim", lvl.L_odd, x_left)
                 - jnp.einsum("kij,kjm->kim", lvl.U_odd, x_right))
        xo = jax.vmap(lambda l, p, r: jsl.lu_solve((l, p), r))(
            lvl.lu_odd, lvl.piv_odd, rhs_o)
        # interleave even/odd
        nb = xe.shape[0] + xo.shape[0]
        out = jnp.zeros((nb,) + xe.shape[1:], xe.dtype)
        out = out.at[0::2].set(xe)
        out = out.at[1::2].set(xo)
        x = out
    return x
