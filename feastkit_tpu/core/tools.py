"""Device-side numeric helpers: seeded subspaces, residuals, ordering,
orthonormalization, reduced eigensolves.

Counterpart of the reference's seeded subspaces + sort/residual helpers in
``src/core/feast_tools.jl`` (:6-43, :653-755) and the hot-loop helpers in
``src/core/feast_aux.jl`` (_feast_qr_compress! :101-131,
_feast_reorder_by_interval! :144-257). Design differences for TPU/XLA:

* everything is static-shape: "M eigenvalues found" is a validity mask over
  M0-sized buffers, and "reorder inside-first" is an argsort by a composite
  key rather than an in-place permutation;
* rank-revealing pivoted QR becomes SVD-based orthonormalization (same
  purpose — a stable orthonormal basis of the filtered subspace — but SVD is
  TPU-native via jnp.linalg.svd and needs no column pivoting);
* the reduced generalized Hermitian pencil is solved by eigh after a robust
  inverse-square-root congruence (clipped eigendecomposition of the Gram
  matrix), which tolerates rank deficiency that Cholesky would not.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "gram_accurate", "matmul_accurate",
    "seeded_subspace", "residuals", "inside_first_order", "orthonormalize",
    "reduced_hermitian_gevp", "feast_name",
]


def seeded_subspace(N: int, M0: int, dtype, *, general: bool = False) -> np.ndarray:
    """Deterministic (N, M0) initial subspace with unit columns (HOST array).

    Determinism contract of the reference (_feast_seeded_subspace!,
    feast_tools.jl:6-43): the subspace depends only on (N, M0) — identical
    results regardless of global RNG state. Complex Hermitian variants use
    REAL random entries (zero imaginary part) for better overlap with
    Hermitian eigenvectors (feast_tools.jl:22-26); general variants
    (``general=True``) use fully complex entries (feast_kernel.jl:719).

    Host numpy on purpose: some runtimes cannot transfer complex arrays
    (see utils/cio.py) — the jit boundary handles the device placement.
    """
    dtype = np.dtype(dtype)
    is_complex = np.issubdtype(dtype, np.complexfloating)
    tag = 7 if general else (1 if is_complex else 0)
    rng = np.random.default_rng((N * 1000003 + M0 * 101 + tag) % (2 ** 31 - 1))
    real_dtype = np.float32 if dtype in (np.dtype(np.complex64),
                                         np.dtype(np.float32)) else np.float64
    w = rng.standard_normal((N, M0)).astype(real_dtype)
    if general and is_complex:
        w = w + 1j * rng.standard_normal((N, M0)).astype(real_dtype)
    w = w / np.linalg.norm(w, axis=0, keepdims=True)
    return w.astype(dtype)


def initial_subspace(fpm, Q0, N: int, M0: int, dtype, *,
                     general: bool = False) -> np.ndarray:
    """Warm-start policy shared by every driver (feast_kernel.jl:67-79):
    use the caller's Q0 only when fpm[5]=1 (a stale Q0 passed with fpm[5]=0
    is ignored, exact reference semantics); otherwise the deterministic
    seeded subspace. A Q0 with fewer than M0 columns is padded with seeded
    columns (checkpoint resume at a larger M0)."""
    if Q0 is None or int(fpm[5]) != 1:
        return seeded_subspace(N, M0, dtype, general=general)
    Q0 = np.asarray(Q0, np.dtype(dtype))
    if Q0.shape[0] != N:
        raise ValueError(f"Q0 must have {N} rows, got {Q0.shape[0]}")
    seed = seeded_subspace(N, M0, dtype, general=general)
    if Q0.shape[1] >= M0:
        Q0 = np.ascontiguousarray(Q0[:, :M0])
    else:
        Q0 = np.concatenate([Q0, seed[:, Q0.shape[1]:]], axis=1)
    # Checkpointed buffers carry zero columns for deflated directions
    # (static-shape q_full); a zero start column never recovers — swap in
    # seeded columns.
    dead = np.linalg.norm(Q0, axis=0) <= 0
    if dead.any():
        Q0 = Q0.copy()
        Q0[:, dead] = seed[:, dead]
    return Q0


def _f64_matmul_weak() -> bool:
    """True where the backend's f64 matmul is NOT genuinely double: TPU
    MXUs compute f64 dots with float32 products/accumulation (~5e-8
    relative error, measured), which floors eigensolver residuals at ~1e-7
    unless accuracy-critical contractions bypass the MXU."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def gram_accurate(X, Y, chunk: int = 1024):
    """G = X^H Y (k x l) with GENUINE f64 accumulation.

    Row-chunked elementwise outer products summed on the VPU (where f64
    emulation is accurate) instead of one MXU dot whose long-N f32
    accumulation dominates the error. Only worth it for f64 on TPU; other
    configurations take the plain einsum."""
    if not (_f64_matmul_weak() and jnp.dtype(X.dtype).itemsize >= 8):
        return jnp.einsum("nk,nl->kl", jnp.conj(X), Y)
    N, k = X.shape
    l = Y.shape[1]
    nb = -(-N // chunk)
    Np = nb * chunk
    # chunk-aligned N (every power-of-two grid) skips the pad COPY — at
    # 1M x 72 f64 the two padded duplicates are 1.2 GB of peak HBM
    Xp = X if Np == N else jnp.zeros((Np, k), X.dtype).at[:N].set(X)
    Yp = Y if Np == N else jnp.zeros((Np, l), Y.dtype).at[:N].set(Y)
    Xb = Xp.reshape(nb, chunk, k)
    Yb = Yp.reshape(nb, chunk, l)

    def body(acc, xy):
        x, y = xy
        outer = jnp.conj(x)[:, :, None] * y[:, None, :]
        return acc + outer.sum(0), None

    acc0 = jnp.zeros((k, l), jnp.result_type(X.dtype, Y.dtype))
    G, _ = jax.lax.scan(body, acc0, (Xb, Yb))
    return G


def matmul_accurate(X, W, chunk: int = 1024):
    """X @ W for (N, k) @ (k, l) with f64-accurate products.

    The MXU's f32 products put ~6e-8 relative error in every element of a
    f64 matmul; for the Ritz-vector assembly q = U V that error bounds the
    final residual. Row-chunked elementwise products with VPU accumulation
    keep full f64 accuracy."""
    if not (_f64_matmul_weak() and jnp.dtype(X.dtype).itemsize >= 8):
        return X @ W
    N, k = X.shape
    l = W.shape[1]
    nb = -(-N // chunk)
    Np = nb * chunk
    Xp = X if Np == N else jnp.zeros((Np, k), X.dtype).at[:N].set(X)
    Xb = Xp.reshape(nb, chunk, k)

    def body(_, x):
        out = (x[:, :, None] * W[None, :, :]).sum(1)
        return None, out

    _, Yb = jax.lax.scan(body, None, Xb)
    return Yb.reshape(Np, l)[:N]


def residuals(apply_A, apply_B, lam, q):
    """Relative residuals ||A q - lam B q|| / max(|lam|, 1), columnwise
    (feast_tools.jl:716-755). ``lam`` may be real or complex; q is (N, M0)."""
    Aq = apply_A(q)
    Bq = apply_B(q)
    r = Aq - lam[None, :].astype(Aq.dtype) * Bq
    return jnp.linalg.norm(r, axis=0) / jnp.maximum(jnp.abs(lam), 1.0)


def inside_first_order(lam, inside, *, general: bool = False):
    """Permutation placing inside-contour eigenpairs first, each group sorted
    ascending by lam (real case) or by |lam|^2 (general case) — the static
    shape equivalent of _feast_reorder_by_interval!/_feast_reorder_by_gcontour!
    (feast_aux.jl:144-257) followed by feast_sort! (feast_tools.jl:653-713).
    """
    key = jnp.abs(lam) ** 2 if general else lam
    primary = jnp.where(inside, 0, 1)
    return jnp.lexsort((key, primary))


def orthonormalize(Q, rtol=None):
    """Orthonormal basis of span(Q) with rank detection.

    TPU-native replacement of the rank-revealing pivoted-QR compression
    ``_feast_qr_compress!`` (feast_aux.jl:101-131): thin SVD; columns with
    singular value <= rtol * s_max are counted out of the numerical rank.
    Returns (Q_orth with all M0 orthonormal columns, rank, s). The extra
    columns beyond the rank are valid orthonormal directions (left singular
    vectors) — harmless to Rayleigh-Ritz, filtered later by the
    inside-contour mask, so no dynamic shapes are needed.
    """
    U, s, _ = jnp.linalg.svd(Q, full_matrices=False)
    if rtol is None:
        rtol = float(np.sqrt(np.finfo(
            np.float32 if Q.dtype in (jnp.complex64, jnp.float32) else np.float64).eps))
    rank = jnp.sum(s > rtol * s[0])
    return U, rank, s


def eigh_polished(C, iters: int = 3):
    """``jnp.linalg.eigh`` plus iterated Newton diagonalization-polish on
    backends with weak f64 eigh.

    Measured on the chip: f64 eigh backward error ~2e-7*||C|| on crowded
    spectra (vs the CPU LAPACK's ~3e-15) while small f64 matmuls are
    accurate (~3e-15). With reduced-pencil eigenvalue gaps ~1e-5*||C|| the
    raw eigh floors Ritz-VECTOR accuracy at backward_err/gap — observed as
    residual plateaus. Each polish step exposes the residual rotation
    E = Y^H C Y and corrects it to first order:
    Delta_ij = E_ij / (w_j - w_i), Y <- Y (I + Delta). Gaps below
    ~1e-12*||w|| or below 10x the coupling are left alone — rotations
    inside a cluster degenerate to working precision are physically
    meaningless and the quotient would blow up.

    CRITICAL refinement over a single first-order step: with near- (not
    exactly-) degenerate clusters the admissible Delta can reach ~0.05
    (F ~ 7e-7 backward error over gaps ~1.5e-5), and Y(I + Delta) then
    loses orthonormality at Delta^2 ~ 2.5e-3 — which silently corrupts any
    consumer that TRUSTS Y as a basis (the GEVP whitening W = U f(w) U^H
    amplified exactly this into a 2e-5 eigenvalue error at the 65k
    consistent-mass fixture). Two matmul-only Newton-Schulz steps
    Y <- Y (3I - Y^H Y)/2 after every polish step restore orthonormality
    to ~1e-13, and iterating the (polish, re-orthonormalize) pair twice
    converges the correctable rotation quadratically: measured on the
    captured failing grams, GEVP eigenvalue error 2.17e-5 -> 1.26e-13."""
    w, Y = jnp.linalg.eigh(C)
    rbits = jnp.finfo(jnp.real(jnp.zeros((), C.dtype)).dtype).bits
    if not _f64_matmul_weak() or rbits < 64:
        return w, Y
    return _polish_rotation(C, Y, iters)


def _polish_rotation(C, Y, iters: int = 3):
    """The (first-order rotation correction, Newton-Schulz
    re-orthonormalization) iteration behind :func:`eigh_polished`, split out
    so the recovery property — a Y rotated away from the true eigenbasis by
    O(0.05) comes back orthonormal and diagonalizing — is unit-testable on
    CPU, where the raw eigh never errs enough to exercise it."""
    eye = jnp.eye(C.shape[0], dtype=C.dtype)
    wscale_tiny = jnp.asarray(np.finfo(np.float64).tiny,
                              jnp.real(jnp.zeros((), C.dtype)).dtype)
    for _ in range(iters):
        E = Y.conj().T @ (C @ Y)
        w = jnp.real(jnp.diag(E))
        F = E - jnp.diag(jnp.diag(E))
        d = (w[None, :] - w[:, None]).astype(C.dtype)
        wscale = jnp.maximum(jnp.max(jnp.abs(w)), wscale_tiny)
        safe = jnp.abs(d) > jnp.maximum(1e-12 * wscale, 10.0 * jnp.abs(F))
        delta = jnp.where(safe, F / jnp.where(safe, d, 1.0), 0.0)
        Y = Y + Y @ delta
        for _ in range(2):
            Y = Y @ (1.5 * eye - 0.5 * (Y.conj().T @ Y))
    E = Y.conj().T @ (C @ Y)
    w = jnp.real(jnp.diag(E))
    order = jnp.argsort(w)
    return w[order], Y[:, order]


def reduced_hermitian_gevp(S, G, eps_scale=None):
    """Solve the reduced pencil S v = lam G v with S, G Hermitian, G >= 0.

    Robust congruence route (replaces eigen(Hermitian, Hermitian) +
    PosDefException fallback, feast_dense.jl:272-284): G = U diag(w) U^H with
    w clipped below at eps*max(w); W = U diag(1/sqrt(w_clip)) U^H;
    eigh(W S W) -> (lam, y); v = W y. Rank-deficient directions of G receive
    huge clipped weights and surface as Ritz values far outside the search
    region, where the inside mask removes them.
    """
    S = 0.5 * (S + S.conj().T)
    G = 0.5 * (G + G.conj().T)
    w, U = eigh_polished(G)
    if eps_scale is None:
        eps_scale = float(np.finfo(
            np.float32 if S.dtype == jnp.complex64 else np.float64).eps)
    floor = jnp.maximum(w[-1], 0.0) * eps_scale * S.shape[0]
    w_safe = jnp.maximum(w, floor)
    # Guard fully-degenerate case (all-zero G): fall back to identity scaling.
    w_safe = jnp.where(w_safe > 0, w_safe, 1.0)
    W = (U * (1.0 / jnp.sqrt(w_safe))[None, :]) @ U.conj().T
    C = W @ S @ W
    C = 0.5 * (C + C.conj().T)
    lam, Y = eigh_polished(C)
    V = W @ Y
    return lam, V


def feast_name(code: int) -> str:
    """Decode a 6-digit FEAST routine code into the routine name
    (feast_tools.jl:758-832)."""
    digits = [0] * 6
    rem = int(code)
    for i in range(6):
        digits[5 - i] = rem % 10
        rem //= 10
    name = ""
    if digits[0] == 2:
        name += "p"
    name += {1: "s", 2: "d", 3: "c", 4: "z"}.get(digits[1], "")
    if digits[2] == 2:
        name += "i"
    name += "feast_"
    name += {1: "s", 2: "h", 3: "g"}.get(digits[3], "")
    name += {1: "rci", 2: "y", 3: "b", 4: "csr", 5: "e"}.get(digits[4], "")
    name += {1: "x", 2: "ev", 3: "evx", 4: "gv", 5: "gvx",
             6: "pev", 7: "pevx"}.get(digits[5], "")
    return name
