"""Split-complex (pair-of-float64) shifted solves and real embeddings.

XLA:TPU implements ``LuDecomposition`` only for F32 and C64, and its x64
pass cannot compile ANY complex128 HLO (measured live on the chip:
c128 matmul / triangular-solve / eigh / lu all abort the compiler, while
f64 matmul / eigh / qr / svd / triangular-solve compile and run). A
double-precision shifted solve ``(z B - A) X = F`` therefore cannot be
expressed with complex128 arrays on the chip at all. This module realizes
double-precision complex linear algebra c128-FREE, two ways:

1. **Pair-carried mixed-precision refinement** (real operands): factor the
   shifted pencils once in complex64 (supported batched LU / BCR), carry
   the f64 iterate as an explicit ``(re, im)`` pair of float64 arrays, and
   iteratively refine — the residual ``F - (zB - A) X`` is evaluated in
   genuine f64 pair arithmetic (two real operator applications per part),
   the correction comes from the c64 factorization. Classic Wilkinson /
   LAPACK-``dsgesv`` mixed-precision IR: each sweep contracts the error by
   ~cond(zB-A)*eps_c64, and FEAST's contour nodes keep ``|Im z| > 0`` so
   the pencils are uniformly nonsingular — 3-6 sweeps reach ~1e-14
   backward error. Parity: the reference gets dense/banded f64 straight
   from LAPACK getrf/gbtrf (feast_dense.jl:147-213, feast_banded.jl:94-161).

2. **Real embedding** (complex Hermitian operands): a complex-Hermitian
   pencil ``A x = lam B x`` maps to the real-symmetric pencil
   ``M(A) w = lam M(B) w`` with ``M(A) = [[Ar, -Ai], [Ai, Ar]]`` — same
   (real) spectrum with every eigenvalue doubled, eigenvectors
   ``(u; v) <-> x = u + i v``. The embedded problem runs on the real-f64
   engines (which are fully c128-free), and the doubled eigenpairs are
   collapsed back to complex pairs host-side. For banded/DIA operands the
   INTERLEAVED embedding (rows ``2i``/``2i+1`` = Re/Im of row ``i``, i.e.
   ``kron(Ar, I2) + kron(Ai, J2)``) preserves bandedness: half-bandwidth
   ``b -> 2b + 1``, a DIA offset ``d -> {2d-1, 2d, 2d+1}``.

Used by solvers/dense.py, solvers/banded.py and solvers/sparse.py when
``f64_lu_unavailable()`` (every XLA:TPU backend, incl. the axon tunnel).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..core.tools import matmul_accurate

__all__ = [
    "f64_lu_unavailable", "pair_refined_solve", "make_pair_solve_all_dense",
    "embed_hermitian_dense", "embed_hermitian_banded",
    "embed_hermitian_sparse", "collapse_embedded", "map_embedded_subspace",
    "finish_embedded_interval",
]


@functools.lru_cache(maxsize=1)
def _platform_lu_limited() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:                                    # pragma: no cover
        return False


def f64_lu_unavailable() -> bool:
    """True where f64/c128 LU (and all c128 HLO) cannot compile — all
    XLA:TPU backends. ``FEAST_FORCE_PAIR_LU=1`` forces the pair paths on
    any platform (CPU test coverage of the TPU-only code)."""
    if os.environ.get("FEAST_FORCE_PAIR_LU") == "1":
        return True
    return _platform_lu_limited()


def demote_f64_general(what: str) -> None:
    """Platform-feasibility gate for the GENERAL-contour engines on f64.

    General/complex-symmetric/polynomial spectra carry complex eigenpairs
    end-to-end, so (unlike the Hermitian families, which real-embed) there
    is no c128-free f64 realization built yet; with no c128 HLO on XLA:TPU
    the full-precision options are the CPU backend or casting down. The
    default policy mirrors the backend fallback contract
    (feast_backend_utils.jl:52-79 strict-vs-fallback): demote the WORK
    precision to complex64 with a warning (tolerance floors at ~sqrt(eps),
    honest info codes still apply); ``FEAST_STRICT_F64=1`` raises instead.
    Called by the dense/banded/sparse general drivers before any c128
    array is created."""
    import warnings
    if os.environ.get("FEAST_STRICT_F64") == "1":
        raise RuntimeError(
            f"{what}: float64/complex128 work precision cannot compile on "
            "this TPU backend (XLA implements LU only for f32/c64 and no "
            "complex128 HLO at all); cast operands to float32/complex64, "
            "run on the CPU backend, or unset FEAST_STRICT_F64 to accept "
            "complex64 work precision")
    warnings.warn(
        f"{what}: complex128 cannot compile on this TPU backend; demoting "
        "work precision to complex64 (residual floor ~1e-6; set "
        "FEAST_STRICT_F64=1 to make this an error, or run on the CPU "
        "backend for full float64)", RuntimeWarning, stacklevel=3)


# ---------------------------------------------------------------------------
# Pair-carried mixed-precision refinement
# ---------------------------------------------------------------------------

def pair_refined_solve(solve_c64, apply_shift, Fr, Fi, *, max_sweeps=12,
                       rtol=None):
    """Solve ``(zB - A)(Xr + i Xi) = Fr + i Fi`` to f64 backward accuracy.

    solve_c64: (N, M) complex64 -> (N, M) complex64 — the low-precision
      inner solve with the cached factorization (LU, BCR, ...).
    apply_shift: (Xr, Xi) -> (Yr, Yi) — ``(zB - A) X`` in f64 pair
      arithmetic (accurate f64 products; see make_pair_solve_all_dense).

    Iterative refinement with early exit on relative residual. Returns
    (Xr, Xi, ok) with ok = backward error reached ``rtol`` (sticky inner_ok
    material for the kernel's failure policy).
    """
    rdt = Fr.dtype
    if rtol is None:
        rtol = 64.0 * float(jnp.finfo(rdt).eps)
    fn = jnp.sqrt(jnp.sum(Fr * Fr) + jnp.sum(Fi * Fi))
    fn = jnp.maximum(fn, jnp.asarray(np.finfo(np.float64).tiny, rdt))

    def solve_c(Rr, Ri):
        Z = solve_c64(jax.lax.complex(Rr.astype(jnp.float32),
                                      Ri.astype(jnp.float32)))
        return jnp.real(Z).astype(rdt), jnp.imag(Z).astype(rdt)

    Xr, Xi = solve_c(Fr, Fi)

    def body(carry):
        Xr, Xi, k, _ = carry
        Yr, Yi = apply_shift(Xr, Xi)
        Rr, Ri = Fr - Yr, Fi - Yi
        rn = jnp.sqrt(jnp.sum(Rr * Rr) + jnp.sum(Ri * Ri))
        Dr, Di = solve_c(Rr, Ri)
        # a correction computed from an already-converged residual is
        # harmless (it is ~eps-sized); gating it on rn would add a select
        return Xr + Dr, Xi + Di, k + 1, rn

    def cond(carry):
        _, _, k, rn = carry
        return (k < max_sweeps) & (rn > rtol * fn)

    Xr, Xi, _, rn = jax.lax.while_loop(
        cond, body, (Xr, Xi, jnp.int32(0), jnp.asarray(jnp.inf, rdt)))
    # one final residual look for the ok flag (rn in the carry is the
    # PRE-correction residual of the last sweep)
    Yr, Yi = apply_shift(Xr, Xi)
    rn = jnp.sqrt(jnp.sum((Fr - Yr) ** 2) + jnp.sum((Fi - Yi) ** 2))
    return Xr, Xi, rn <= 16.0 * rtol * fn


def _pair_factor_dense(A, B, sig, tau, standard):
    """Batched c64 LU of the (ne, N, N) shifted pencils from f32 casts.
    Hermitian pencils with Im z != 0 are accretive, so the MXU-blocked
    locally-pivoted LU (ops/blocklu.py) applies at sizeable N."""
    from .blocklu import block_lu_factor, use_block_lu
    A32 = A.astype(jnp.float32)
    base = (jnp.eye(A.shape[0], dtype=jnp.float32) if standard
            else B.astype(jnp.float32))
    re = sig[:, None, None].astype(jnp.float32) * base[None] - A32[None]
    im = jnp.broadcast_to(tau[:, None, None].astype(jnp.float32) * base[None],
                          re.shape)
    shifted = jax.lax.complex(re, im)
    if use_block_lu(A.shape[0], jnp.complex64):
        return block_lu_factor(shifted)
    return jax.vmap(jsl.lu_factor)(shifted)


def make_pair_solve_all_dense(A, B, sig, tau, standard, lu_piv=None):
    """Dense batched pair solver: returns (solve_all, (lu, piv)).

    solve_all: Fr (N, M) f64 real rhs -> (Xr, Xi) stacked (ne, N, M) f64,
    the solutions of ``(z_e B - A) X_e = Fr`` for all contour nodes.
    ``A``/``B`` are REAL f64 (the real-symmetric path; complex-Hermitian
    operands go through the real embedding instead). Residual matmuls ride
    :func:`matmul_accurate` — the MXU's f32-product f64 matmul (~5e-8
    relative) would floor the refinement three decades above f64.
    """
    if lu_piv is None:
        lu_piv = _pair_factor_dense(A, B, sig, tau, standard)
    lu, piv = lu_piv

    def apply_shift(s, t, Xr, Xi):
        AXr = matmul_accurate(A, Xr)
        AXi = matmul_accurate(A, Xi)
        BXr = Xr if standard else matmul_accurate(B, Xr)
        BXi = Xi if standard else matmul_accurate(B, Xi)
        return (s * BXr - AXr - t * BXi,
                s * BXi - AXi + t * BXr)

    from .blocklu import block_lu_solve, use_block_lu
    blocked = use_block_lu(A.shape[0], jnp.complex64)

    def solve_all(Fr):
        Fi = jnp.zeros_like(Fr)

        def one(l, p, s, t):
            inner = ((lambda Z: block_lu_solve(l, p, Z)) if blocked
                     else (lambda Z: jsl.lu_solve((l, p), Z)))
            return pair_refined_solve(
                inner, lambda Xr, Xi: apply_shift(s, t, Xr, Xi), Fr, Fi)

        Xr, Xi, ok = jax.vmap(one)(lu, piv, sig, tau)
        return Xr, Xi, jnp.all(ok)

    return solve_all, lu_piv


# ---------------------------------------------------------------------------
# Real embeddings of complex-Hermitian operands
# ---------------------------------------------------------------------------

def embed_hermitian_dense(A) -> np.ndarray:
    """Complex-Hermitian (N, N) -> real-symmetric (2N, 2N) block embedding
    ``[[Ar, -Ai], [Ai, Ar]]`` (same spectrum, doubled multiplicity;
    eigenvector map ``(u; v) -> u + i v``)."""
    A = np.asarray(A)
    Ar, Ai = np.ascontiguousarray(A.real), np.ascontiguousarray(A.imag)
    return np.block([[Ar, -Ai], [Ai, Ar]])


def embed_hermitian_banded(bands, kl: int, ku: int):
    """Complex-Hermitian band storage (kl+ku+1, N) -> INTERLEAVED real
    embedding in band storage ((2kl+1)+(2ku+1)+1, 2N) with half-bandwidths
    (2kl+1, 2ku+1).

    Interleaving (row 2i = Re eq, 2i+1 = Im eq of original row i) keeps the
    matrix banded: an original diagonal ``d`` entry ``a = ar + i ai``
    contributes ``ar`` on new diagonals ``2d`` (twice) and ``+-ai`` on
    ``2d +- 1``. Eigenvector map: ``x = w[0::2] + i w[1::2]``.
    """
    bands = np.asarray(bands)
    N = bands.shape[1]
    KL, KU = 2 * kl + 1, 2 * ku + 1
    out = np.zeros((KL + KU + 1, 2 * N), np.float64)
    for k in range(bands.shape[0]):
        d = ku - k                   # entry A[i, i+d] = bands[k, i+d]
        ar = bands[k].real.astype(np.float64)
        ai = bands[k].imag.astype(np.float64)
        # bands[k, j] holds A[j-d, j]; embedded entries are at
        # (2(j-d), 2j) val ar  -> new offset 2d,   new col 2j
        # (2(j-d)+1, 2j+1) ar  -> new offset 2d,   new col 2j+1
        # (2(j-d), 2j+1) -ai   -> new offset 2d+1, new col 2j+1
        # (2(j-d)+1, 2j)  ai   -> new offset 2d-1, new col 2j
        j = np.arange(N)
        valid = (j - d >= 0) & (j - d < N)
        for nd, col, val in ((2 * d, 2 * j, ar), (2 * d, 2 * j + 1, ar),
                             (2 * d + 1, 2 * j + 1, -ai),
                             (2 * d - 1, 2 * j, ai)):
            row = KU - nd
            np.add.at(out[row], col[valid], val[valid])
    return out, KL, KU


def embed_hermitian_sparse(A):
    """Complex-Hermitian scipy sparse -> interleaved real embedding
    ``kron(Ar, I2) + kron(Ai, J2)`` (J2 = [[0,-1],[1,0]]) as CSR.
    Preserves DIA structure: offset d -> {2d-1, 2d, 2d+1}."""
    import scipy.sparse as sp
    A = A.tocsr() if sp.issparse(A) else sp.csr_matrix(np.asarray(A))
    Ar = sp.csr_matrix((np.ascontiguousarray(A.data.real), A.indices,
                        A.indptr), shape=A.shape)
    I2 = sp.csr_matrix(np.eye(2))
    E = sp.kron(Ar, I2, format="csr")
    if np.iscomplexobj(A.data):
        Ai = sp.csr_matrix((np.ascontiguousarray(A.data.imag), A.indices,
                            A.indptr), shape=A.shape)
        J2 = sp.csr_matrix(np.array([[0.0, -1.0], [1.0, 0.0]]))
        E = (E + sp.kron(Ai, J2, format="csr")).tocsr()
    E.sum_duplicates()
    return E


def map_embedded_subspace(Q0c, M0e: int, interleaved: bool) -> np.ndarray:
    """Complex (N, M0) start subspace -> real embedded (2N, M0e) one: each
    complex column x = u + iv spans the two embedded directions (u; v) and
    (-v; u)."""
    Q0c = np.asarray(Q0c)
    u, v = np.ascontiguousarray(Q0c.real), np.ascontiguousarray(Q0c.imag)
    if interleaved:
        w1 = np.zeros((2 * u.shape[0], u.shape[1]))
        w2 = np.zeros_like(w1)
        w1[0::2], w1[1::2] = u, v
        w2[0::2], w2[1::2] = -v, u
    else:
        w1 = np.concatenate([u, v], axis=0)
        w2 = np.concatenate([-v, u], axis=0)
    return np.concatenate([w1, w2], axis=1)[:, :M0e]


def finish_embedded_interval(r, N: int, M0: int, fpm, *, interleaved: bool,
                             apply_A=None, apply_B=None):
    """Turn the real-embedded solve's FeastResult into the complex one:
    handles the estimate mode (fpm[14]=2 counts every eigenvalue twice),
    the subspace-only mode (fpm[14]=1 maps + complex-orthonormalizes), and
    the normal collapse of doubled eigenpairs."""
    from ..core.types import FeastResult, _trim
    mode = int(fpm[14]) if fpm is not None else 0
    if mode == 2:
        est = float(r.epsout) / 2.0
        return FeastResult(np.zeros(0), np.zeros((N, 0), np.complex128),
                           max(int(round(est)), 0), np.zeros(0),
                           r.info, est, r.loop)
    if mode == 1:
        Qe = np.asarray(r.q_full if r.q_full is not None else r.q)
        X = (Qe[0::2] + 1j * Qe[1::2]) if interleaved \
            else (Qe[:N] + 1j * Qe[N:])
        U, _, _ = np.linalg.svd(X, full_matrices=False)
        return FeastResult(np.zeros(0), U[:, :M0], 0, np.zeros(0),
                           r.info, r.epsout, r.loop)
    lam_f = np.asarray(r.lam_full if r.lam_full is not None else r.lam)
    q_f = r.q_full if r.q_full is not None else r.q
    res_f = np.asarray(r.res_full if r.res_full is not None else r.res)
    inside_f = (np.asarray(r.inside) if r.inside is not None
                else np.ones(lam_f.size, bool))
    lam_c, Xc, res_c, ins_c = collapse_embedded(
        lam_f, q_f, res_f, inside_f, interleaved=interleaved,
        apply_A=apply_A, apply_B=apply_B)
    Mc = min(int(ins_c.sum()), M0)
    lam_full = np.zeros(M0)
    res_full = np.zeros(M0)
    q_full = np.zeros((N, M0), np.complex128)
    inside = np.zeros(M0, bool)
    lam_full[:Mc] = lam_c[:Mc]
    res_full[:Mc] = res_c[:Mc]
    q_full[:, :Mc] = Xc[:, :Mc]
    inside[:Mc] = True
    info = int(r.info)
    epsout = float(r.epsout)
    if Mc > 0 and apply_A is not None:
        # post-collapse SUCCESS upgrade (the cheb driver's pattern): the
        # collapsed residuals are recomputed against the TRUE complex
        # operator — if every returned pair meets the tolerance, the
        # convergence contract is met even when the embedded run's own
        # flag (judged on the doubled problem's max-over-plausible) missed
        try:
            from ..core.parameters import feast_tolerance
            tol = float(feast_tolerance(fpm, np.float64))
        except Exception:                                # noqa: BLE001
            tol = 10.0 ** (-int(fpm[3])) if fpm is not None else 1e-12
        worst = float(np.max(res_full[:Mc]))
        if worst <= tol:
            from ..core.types import FeastError
            info = int(FeastError.SUCCESS)
            epsout = worst
    return _trim(FeastResult, lam_full, q_full, res_full, inside,
                 info, epsout, int(r.loop),
                 inner_ok=r.inner_converged)


def collapse_embedded(lam, Q2, res, inside, *, interleaved: bool,
                      apply_A=None, apply_B=None, cluster_rtol=None):
    """Collapse a real-embedded solve's doubled eigenpairs to complex pairs.

    lam/res/inside: (M0',) host arrays from the embedded FeastResult-style
    buffers, inside-first ordered; Q2: (2N, M0') real eigenvectors.
    Mapping: ``x = Q2[:N] + i Q2[N:]`` (block) or
    ``x = Q2[0::2] + i Q2[1::2]`` (interleaved).

    Every embedded eigenvalue appears (numerically) twice; the two real
    eigenvectors of one complex pair map to the SAME complex eigenvector up
    to a unit scalar (``alpha (u,v) + beta (-v,u) -> (alpha + i beta)
    (u+iv)``), so within each eigenvalue cluster the mapped matrix has
    complex rank = cluster_size/2: an SVD keeps exactly the leading half.
    Residuals transfer exactly (``||M(A)w - lam w|| = ||A x - lam x||``
    with ``||w|| = ||x||``); they are recomputed honestly when
    ``apply_A``/``apply_B`` (host callables on complex (N, k) blocks) are
    supplied, else the cluster maximum is inherited.

    Returns (lam_c, X, res_c, inside_c) host arrays, inside-first.
    """
    lam = np.asarray(lam)
    Q2 = np.asarray(Q2)
    res = np.asarray(res)
    inside = np.asarray(inside, bool)
    if interleaved:
        X_all = Q2[0::2] + 1j * Q2[1::2]
    else:
        N = Q2.shape[0] // 2
        X_all = Q2[:N] + 1j * Q2[N:]

    idx = np.where(inside)[0]
    if idx.size == 0:
        return (np.zeros(0), np.zeros((X_all.shape[0], 0), np.complex128),
                np.zeros(0), np.zeros(0, bool))
    lam_in, res_in = lam[idx], res[idx]
    order = np.argsort(lam_in)
    lam_in, res_in, idx = lam_in[order], res_in[order], idx[order]

    scale = max(float(np.max(np.abs(lam_in))), 1.0)
    if cluster_rtol is None:
        # duplicates agree to ~residual * |lam|; keep the cluster width an
        # order above that but far below genuine eigenvalue gaps
        cluster_rtol = max(1e-11, 20.0 * float(np.max(res_in, initial=0.0)))
    ctol = cluster_rtol * scale

    lam_c, vecs, res_c = [], [], []
    i = 0
    while i < lam_in.size:
        j = i + 1
        while j < lam_in.size and lam_in[j] - lam_in[j - 1] <= ctol:
            j += 1
        cl = idx[i:j]
        Xc = X_all[:, cl]
        if cl.size == 1:
            # odd cluster (its partner fell outside M0' or the interval):
            # the single mapped vector is still an eigenvector
            keep = Xc / np.linalg.norm(Xc, axis=0)
        else:
            # keep by NUMERICAL RANK, not cl.size//2: a doubled pair
            # contributes one complex direction with sigma ~ sqrt(2)
            # (its duplicate collapses onto it), while an UNPAIRED member
            # (partner trimmed by the M0e cap or the interval edge)
            # contributes a genuine extra direction with sigma ~ 1 — a
            # size-3 cluster has complex rank 2, and //2 would drop a
            # converged eigenpair
            U, s, _ = np.linalg.svd(Xc, full_matrices=False)
            m = max(int(np.sum(s > 0.5 * s[0])), 1)
            keep = U[:, :m]
        lmean = float(np.mean(lam_in[i:j]))
        rmax = float(np.max(res_in[i:j]))
        for k in range(keep.shape[1]):
            lam_c.append(lmean)
            vecs.append(keep[:, k])
            res_c.append(rmax)
        i = j

    X = np.stack(vecs, axis=1) if vecs else np.zeros((X_all.shape[0], 0),
                                                     np.complex128)
    lam_c = np.asarray(lam_c)
    res_c = np.asarray(res_c)
    if apply_A is not None and lam_c.size:
        AX = np.asarray(apply_A(X))
        BX = X if apply_B is None else np.asarray(apply_B(X))
        R = AX - lam_c[None, :] * BX
        res_c = (np.linalg.norm(R, axis=0)
                 / np.maximum(np.abs(lam_c), 1.0)
                 / np.maximum(np.linalg.norm(X, axis=0), 1e-300))
    return lam_c, X, res_c, np.ones(lam_c.size, bool)
