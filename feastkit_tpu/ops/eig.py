"""Small dense general (non-Hermitian) eigendecomposition for the reduced
Rayleigh-Ritz pencil.

SURVEY.md section 7 "hard part #1": XLA has no general complex eig on TPU.
The reduced problem is tiny (M0 x M0, M0 <~ 128), so two strategies:

* ``method='callback'`` (default): ``jax.pure_callback`` to LAPACK zgeev on
  the host — numerically identical to the reference's eigen(A, B) route
  (feast_kernel.jl:812, feast_dense.jl:272-283). The (M0, M0) transfer is
  microscopic next to the contour solves.
* ``method='qr'``: fully on-device complex Schur via Hessenberg reduction +
  implicitly shifted QR with Wilkinson shifts (mask-based deflation, static
  iteration bound) — see qr_eig below. Used where callbacks are unavailable
  (e.g. inside shard_map on some runtimes).
"""
from __future__ import annotations

import functools
from typing import Literal

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["general_eig", "generalized_eig"]


def _host_eig(a):
    w, v = np.linalg.eig(np.asarray(a))
    # Fixed ordering for determinism: ascending (real, imag).
    order = np.lexsort((w.imag, w.real))
    return w[order].astype(a.dtype), v[:, order].astype(a.dtype)


def general_eig(A, method: Literal["callback", "qr"] = "callback"):
    """Eigenvalues/right eigenvectors of a small general complex matrix.

    Returns (w (n,), V (n, n)) with A @ V = V @ diag(w), deterministic
    eigenvalue ordering (ascending by (Re, Im)).
    """
    n = A.shape[-1]
    cdtype = A.dtype
    if method == "callback":
        out_shape = (jax.ShapeDtypeStruct((n,), cdtype),
                     jax.ShapeDtypeStruct((n, n), cdtype))
        return jax.pure_callback(_host_eig, out_shape, A, vmap_method="sequential")
    return qr_eig(A)


def generalized_eig(S, G, method: Literal["callback", "qr"] = "callback",
                    rcond: float | None = None):
    """Solve the small generalized pencil S v = lam G v (general complex).

    The FEAST reduced pencil has G = U^H B U with U orthonormal, so G is as
    well-conditioned as B; we reduce to the standard problem T = G^{-1} S
    via an SVD-regularized solve (rank-deficient directions of G get huge
    eigenvalues that land outside any search region, mirroring how LAPACK
    ggev reports alpha/beta with tiny beta).
    """
    n = S.shape[-1]
    U, s, Vh = jnp.linalg.svd(G)
    if rcond is None:
        rcond = float(np.finfo(np.float32 if S.dtype == jnp.complex64
                               else np.float64).eps) * n
    s_max = jnp.maximum(s[0], 1e-30)
    s_inv = jnp.where(s > rcond * s_max, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    Ginv = (Vh.conj().T * s_inv[None, :]) @ U.conj().T
    T = Ginv @ S
    lam, V = general_eig(T, method=method)
    return lam, V


# ---------------------------------------------------------------------------
# Native on-device path: Hessenberg + implicitly-shifted QR (complex Schur)
# ---------------------------------------------------------------------------

def _householder(x, k, n):
    """Unitary reflector H with (H x)[k+1:] = 0, applied full-size.

    Returns (v, beta) with H = I - beta v v^H; v[:k+1] = 0 except v[k]=1
    handled by masking.
    """
    idx = jnp.arange(n)
    mask = (idx > k).astype(x.dtype)
    tail = x * mask                      # entries below k
    alpha = x[k]
    sigma = jnp.linalg.norm(tail)
    # phase of alpha (1 if zero)
    unit = jnp.where(jnp.abs(alpha) > 0, alpha / jnp.maximum(jnp.abs(alpha), 1e-30), 1.0)
    mu = jnp.sqrt(jnp.abs(alpha) ** 2 + sigma ** 2)
    v_k = alpha + unit * mu
    v = tail + jnp.where(idx == k, v_k, 0.0).astype(x.dtype)
    vnorm2 = jnp.real(jnp.vdot(v, v))
    beta = jnp.where(vnorm2 > 0, 2.0 / jnp.maximum(vnorm2, 1e-30), 0.0).astype(x.dtype)
    return v, beta


def _hessenberg(A):
    """Unitary reduction A = Q H Q^H with H upper Hessenberg (fori_loop)."""
    n = A.shape[0]
    Q0 = jnp.eye(n, dtype=A.dtype)

    def body(k, carry):
        H, Q = carry
        v, beta = _householder(H[:, k], k + 1, n)
        # H <- (I - beta v v^H) H (I - beta v v^H); Q <- Q (I - beta v v^H)
        H = H - beta * jnp.outer(v, v.conj() @ H)
        H = H - beta * jnp.outer(H @ v, v.conj())
        Q = Q - beta * jnp.outer(Q @ v, v.conj())
        return H, Q

    H, Q = jax.lax.fori_loop(0, n - 2, body, (A, Q0))
    return H, Q


def _wilkinson_shift(H, m):
    """Wilkinson shift from the trailing 2x2 of the active m x m block."""
    a = H[m - 2, m - 2]
    b = H[m - 2, m - 1]
    c = H[m - 1, m - 2]
    d = H[m - 1, m - 1]
    tr = a + d
    det = a * d - b * c
    disc = jnp.sqrt(tr * tr - 4.0 * det)
    r1 = (tr + disc) / 2.0
    r2 = (tr - disc) / 2.0
    return jnp.where(jnp.abs(r1 - d) < jnp.abs(r2 - d), r1, r2)


def qr_eig(A, max_sweeps_per_eig: int = 15):
    """Complex Schur decomposition by shifted QR; returns (w, V).

    Fully on-device (static shapes, fori_loop): Hessenberg reduction, then
    n * max_sweeps_per_eig single-shift QR steps with deflation tracked by
    an active-size scalar (classic small-matrix algorithm; this is NOT the
    hot path — the reduced pencil is M0 x M0).

    Eigenvectors are recovered by back-substitution on the triangular Schur
    factor. Ordering matches general_eig (ascending (Re, Im)).
    """
    n = A.shape[0]
    if n == 1:
        return A[0, :1], jnp.ones((1, 1), A.dtype)
    cdtype = A.dtype
    rdtype = jnp.finfo(cdtype).dtype
    eps = jnp.asarray(jnp.finfo(rdtype).eps, rdtype)

    H, Q = _hessenberg(A)

    def qr_step(carry, _):
        H, Q, m = carry
        # deflate: if trailing subdiagonal of the active block is tiny
        sub = jnp.abs(H[m - 1, m - 2])
        scale = jnp.abs(H[m - 1, m - 1]) + jnp.abs(H[m - 2, m - 2])
        deflate = sub <= eps * jnp.maximum(scale, 1e-30)
        m = jnp.where(deflate & (m > 2), m - 1, m)

        mu = _wilkinson_shift(H, m)
        # Implicit single shift via explicit QR of (H - mu I) restricted to
        # the active block, done full-size with masking: rows/cols >= m are
        # already triangular, Givens rotations there are identity.
        idx = jnp.arange(n)

        def givens_sweep(H, Q):
            # zero subdiagonal of (H - mu I) by n-1 Givens rotations
            def rot_body(k, carry):
                R, G = carry   # R accumulates the rotated H-muI; G the total unitary
                active = k < (m - 1)
                a = R[k, k]
                b = R[k + 1, k]
                r = jnp.sqrt(jnp.abs(a) ** 2 + jnp.abs(b) ** 2)
                safe = (r > 0) & active
                c = jnp.where(safe, jnp.abs(a) / jnp.maximum(r, 1e-30), 1.0)
                phase = jnp.where(jnp.abs(a) > 0, a / jnp.maximum(jnp.abs(a), 1e-30), 1.0)
                s = jnp.where(safe, phase * jnp.conj(b) / jnp.maximum(r, 1e-30), 0.0)
                # rows k, k+1 of R
                rk = c * R[k, :] + s * R[k + 1, :]
                rk1 = -jnp.conj(s) * R[k, :] + c * R[k + 1, :]
                R = R.at[k, :].set(jnp.where(active, rk, R[k, :]))
                R = R.at[k + 1, :].set(jnp.where(active, rk1, R[k + 1, :]))
                # columns of G accumulate right-multiplication by G_k^H
                gk = c * G[:, k] + jnp.conj(s) * G[:, k + 1]
                gk1 = -s * G[:, k] + c * G[:, k + 1]
                G = G.at[:, k].set(jnp.where(active, gk, G[:, k]))
                G = G.at[:, k + 1].set(jnp.where(active, gk1, G[:, k + 1]))
                return R, G

            R0 = H - mu * jnp.eye(n, dtype=cdtype)
            G0 = jnp.eye(n, dtype=cdtype)
            R, G = jax.lax.fori_loop(0, n - 1, rot_body, (R0, G0))
            # H' = R G + mu I ; Q' = Q G
            return R @ G + mu * jnp.eye(n, dtype=cdtype), Q @ G

        H, Q = givens_sweep(H, Q)
        return (H, Q, m), None

    total_steps = n * max_sweeps_per_eig
    (H, Q, _), _ = jax.lax.scan(qr_step, (H, Q, jnp.int32(n)), None,
                                length=total_steps)

    w = jnp.diag(H)

    # Eigenvectors of the (numerically) triangular H by back-substitution:
    # for each eigenvalue w_j solve (T - w_j I) y = 0 with y_j = 1.
    T = jnp.triu(H)

    def eigvec(j):
        lam_j = w[j]
        idx = jnp.arange(n)
        shifted = T - lam_j * jnp.eye(n, dtype=cdtype)
        # regularize the j-th diagonal (and any near-multiples)
        diag = jnp.diag(shifted)
        tiny = eps * jnp.maximum(jnp.abs(lam_j), 1.0)
        diag_safe = jnp.where(jnp.abs(diag) < tiny, tiny.astype(cdtype), diag)
        shifted = shifted - jnp.diag(jnp.diag(shifted)) + jnp.diag(diag_safe)
        rhs = jnp.where(idx == j, 1.0 + 0.0j, 0.0).astype(cdtype)
        # back-substitution solving shifted y = rhs restricted to upper tri
        y = jax.scipy.linalg.solve_triangular(shifted, rhs, lower=False)
        mask = (idx <= j).astype(cdtype)
        y = y * mask
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)

    Y = jax.vmap(eigvec)(jnp.arange(n)).T
    V = Q @ Y
    nrm = jnp.linalg.norm(V, axis=0)
    V = V / jnp.where(nrm > 0, nrm, 1.0)[None, :]
    order = jnp.lexsort((w.imag, w.real))
    return w[order], V[:, order]
