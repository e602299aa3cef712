"""Sparse FEAST drivers: BCOO operators + batched iterative shifted solves.

Counterpart of the reference's ``src/sparse/feast_sparse.jl``. The reference's
primary sparse path is a cached UMFPACK LU per contour node
(feast_sparse.jl:294,334-348) with GMRES as the ``zifeast_*`` escape hatch
(:164-236); TPUs have no sparse direct factorization (SURVEY.md section 2.7),
so here the iterative path IS the primary path — batched block GMRES /
BiCGStab (ops/gmres.py) on the shift operator z B - A applied matrix-free
through BCOO matvecs (the shifted matrix is never materialized), sequential
over contour nodes (lax.scan) to bound memory, batched over all M0 RHS.

Supports scipy.sparse inputs and jax BCOO. Sparse operands cross the jit
boundary as raw (data, indices) arrays — complex-I/O safe (utils/cio.py) and
rebuilt as BCOO inside the program.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from ..core.contour import feast_contour, feast_gcontour
from ..core.parameters import (FeastConfig, _ensure_fpm,
                               ifeast_solver_options)
from ..core.tools import seeded_subspace
from ..core.types import FeastError, FeastGeneralResult, FeastResult, _trim
from ..kernel.general import feast_general_core
from ..kernel.hermitian import (LOOP_TOL_CAP, VERIFY_FILTER_TOL,
                                HermitianState, feast_hermitian_core,
                                make_hermitian_body, verify_spurious)
from ..ops.gmres import bicgstab_block, gmres_block
from ..ops.multigrid import (GridStencil, detect_grid_stencil,
                             make_shifted_vcycle, plan_mg_levels)
from ..ops.pallas_kernels import (bcoo_to_dia, dia_matvec_any,
                                  dia_matvec_reference)
from ..utils import cio
from ..utils.cio import cjit, fetch

__all__ = ["feast_scsrev", "feast_scsrgv", "feast_hcsrev", "feast_hcsrgv",
           "feast_gcsrev", "feast_gcsrgv", "feast_scsrev_complex",
           "feast_scsrgv_complex", "feast_scsrpev", "feast_hcsrpev",
           "feast_gcsrpev", "as_bcoo", "sparse_coo_arrays",
           "sparse_feast_interval", "sparse_feast_general"]


def _cast_values(data, dtype):
    """dtype cast that handles complex -> real explicitly (JAX deprecates
    Array.astype from complex to real dtypes): s/d-prefixed aliases applied
    to complex data keep the real part, matching the reference's
    real-precision wrappers."""
    if dtype is None:
        return data
    if (jnp.iscomplexobj(data)
            and not jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)):
        data = data.real
    return data.astype(dtype)


def as_bcoo(A, dtype=None):
    """scipy.sparse / dense / BCOO -> jax BCOO (optionally cast)."""
    if isinstance(A, jsparse.BCOO):
        return A if dtype is None else jsparse.BCOO(
            (_cast_values(A.data, dtype), A.indices), shape=A.shape)
    data, idx, shape = sparse_coo_arrays(A, dtype)
    return jsparse.BCOO((jnp.asarray(data), jnp.asarray(idx)), shape=shape)


def sparse_coo_arrays(A, dtype=None):
    """Any sparse/dense input -> host (data, indices(nnz,2), shape)."""
    if isinstance(A, jsparse.BCOO):
        data = np.asarray(A.data) if dtype is None \
            else np.asarray(A.data).astype(dtype)
        return data, np.asarray(A.indices), tuple(A.shape)
    try:
        import scipy.sparse as sp
        if sp.issparse(A):
            coo = A.tocoo()
            data = _cast_values(coo.data, dtype)
            idx = np.stack([coo.row.astype(np.int32),
                            coo.col.astype(np.int32)], axis=1)
            return np.ascontiguousarray(data), idx, tuple(coo.shape)
    except ImportError:
        pass
    A = np.asarray(A) if dtype is None else _cast_values(np.asarray(A), dtype)
    r, c = np.nonzero(np.ones(A.shape, bool))
    idx = np.stack([r.astype(np.int32), c.astype(np.int32)], axis=1)
    return A.ravel(), idx, tuple(A.shape)


def _solver_fn(name):
    if name in ("gmres", ":gmres", None):
        return "gmres"
    if name in ("bicgstab", ":bicgstab"):
        return "bicgstab"
    if name in ("cg", ":cg"):
        raise ValueError(
            "CG is not valid for FEAST shifted systems (z B - A is never "
            "Hermitian positive definite for complex z); use gmres/bicgstab")
    raise ValueError(f"Unknown iterative solver {name!r}")


def _make_apply(bcoo_mat, dia, offsets, use_pallas, cast=None):
    """Matvec closure: DIA fast path (unit-stride shifted adds; Pallas on
    TPU, with complex products decomposed into real kernels) when the matrix
    lives on few diagonals, BCOO otherwise."""
    if offsets is not None:
        if cast is None:
            diags = dia
        elif (jnp.issubdtype(jnp.dtype(cast), jnp.complexfloating)
              and not jnp.iscomplexobj(dia)):
            # keep REAL diagonals real under a complex cast: dia_matvec_any
            # then decomposes real-A x complex-X into 2 Pallas calls, not 4
            diags = dia.astype(jnp.finfo(cast).dtype)
        else:
            diags = _cast_values(dia, cast)
        # Mosaic has no 64-bit element types (and the x64 rewriter cannot
        # split a custom-call): 64-bit applies take the XLA shifted-add path
        if jnp.finfo(jnp.dtype(diags.dtype)).bits > 32:
            use_pallas = False
        return lambda X: dia_matvec_any(diags, X, offsets,
                                        use_pallas=use_pallas)
    A = bcoo_mat if cast is None else jsparse.BCOO(
        (_cast_values(bcoo_mat.data, cast), bcoo_mat.indices),
        shape=bcoo_mat.shape)
    return lambda X: A @ X


def _mixed_enabled(config, cdtype):
    """fpm[42] policy: 0 off, 1 auto (mixed precision pays only where f64
    is software-emulated, i.e. TPU backends), 2 force. Only meaningful for
    double-precision work dtypes."""
    if cdtype != jnp.complex128 or not config.mixed:
        return False
    if int(config.mixed) >= 2:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _unpack_stencil(mg):
    """Hashable static tuple -> GridStencil (see _pack_stencil). A packed
    tuple may carry the planned V-cycle level count as a 4th element."""
    if mg is None:
        return None
    disps, coeffs, grid = mg[:3]
    return GridStencil(np.asarray(disps, np.int64), np.asarray(coeffs), grid)


def _plan_mg(mg_A, mg_B, re_max, precond_base, user_precond):
    """Driver-side multigrid decision (needs the search region's real upper
    edge re_max): returns (precond, mg_A', mg_B') with the planned level
    count appended to mg_A'. Falls back to the diagonal-dominance-based
    preconditioner when no feasible V-cycle exists."""
    import warnings
    if user_precond not in (None, "mg"):
        return user_precond, None, None
    if mg_A is not None:
        n_lv = plan_mg_levels(_unpack_stencil(mg_A), _unpack_stencil(mg_B),
                              re_max)
        if n_lv is not None:
            return "mg", mg_A + (int(n_lv),), mg_B
    if user_precond == "mg":
        warnings.warn(
            "precond='mg' requested but no feasible multigrid hierarchy "
            "exists for this operator/search region (operator is not a "
            "constant tensor-grid stencil, or the shifted problem is too "
            "indefinite for the coarse-grid budget); falling back",
            RuntimeWarning)
    return precond_base, None, None


def _pack_stencil(st):
    """GridStencil -> hashable nested tuples (jit static argument)."""
    if st is None:
        return None
    return (tuple(tuple(int(x) for x in d) for d in st.disps),
            tuple(complex(c) if np.iscomplexobj(st.coeffs) else float(c)
                  for c in st.coeffs),
            tuple(st.grid))


def _make_sparse_solve_all(apply_A_c, apply_B_c, standard, *, solver,
                           solver_tol, solver_maxiter, solver_restart,
                           diagA=None, diagB=None, precond="jacobi",
                           col_block=None, flag_tol=None,
                           mg_A=None, mg_B=None, mixed=False,
                           apply_A_lo=None, apply_B_lo=None,
                           apply_A_re=None, apply_B_re=None, ir_max=5,
                           mg_opts=(2, 2, 0.8, 1),
                           axis_name=None, sync_axes=None,
                           prec_gather_axis=None):
    """filter_partial(Zall, Wall, rhs) -> (sum_e W_e X_e, conv (ne,K)):
    sequential scan over contour nodes with the weighted accumulation FUSED
    into the scan carry (stacking all (ne, N, K) solves would cost ne x the
    subspace memory), batched block-iterative solve per node, optional
    column chunking (the Krylov basis is (restart+1, N, cols)).

    Preconditioning: ``precond`` is 'jacobi' | 'mg' | 'none'. 'mg' builds a
    geometric-multigrid V-cycle per contour node from the packed stencil
    statics (ops/multigrid.py) — the TPU-native replacement for the
    reference's per-node UMFPACK factorization (feast_sparse.jl:294).

    Mixed precision (fpm[42], ``mixed=True``): the Krylov solves run in
    COMPLEX64 (apply_*_lo operators) with column-normalized residuals, and
    a double-precision iterative-refinement loop around them restores the
    full-accuracy solution — single-precision speed with float64 residual
    floors (SURVEY.md section 7 hard-part 3)."""

    def apply_shift(z, X):
        BX = X if standard else apply_B_c(X)
        return z * BX - apply_A_c(X)

    def apply_shift_lo(z_lo, X):
        BX = X if standard else apply_B_lo(X)
        return z_lo * BX - apply_A_lo(X)

    def _psum_k(v):
        """Per-column contractions over rows are PARTIAL sums when N is
        sharded over a mesh axis (axis_name): reduce across it."""
        return v if axis_name is None else jax.lax.psum(v, axis_name)

    def _sync_any(flag):
        """Loops around collective-bearing Krylov solves must execute
        identical trip counts on every mesh device: continue while ANY sync
        group still wants to (extra steps are harmless — the IR
        accept-only-if-improved logic keeps the best iterate)."""
        if sync_axes:
            return jax.lax.pmax(flag.astype(jnp.int32), sync_axes) > 0
        return flag

    def _wrap_prec(prec):
        """Row-sharded multigrid: the V-cycle is a full-grid operation.
        all_gather the residual over the model axis, run the V-cycle
        redundantly on every device of the group, slice the local rows
        back — exact math, redundant compute (the stencil tables are
        compile-time constants so every device can run the full grid)."""
        if prec is None or prec_gather_axis is None:
            return prec

        def sharded(Xloc):
            X = jax.lax.all_gather(Xloc, prec_gather_axis, axis=0,
                                   tiled=True)
            Y = prec(X)
            i = jax.lax.axis_index(prec_gather_axis)
            return jax.lax.dynamic_slice_in_dim(
                Y, i * Xloc.shape[0], Xloc.shape[0], axis=0)
        return sharded

    # Inner single-precision target: the attainable c64 GMRES floor is
    # ~eps_c64 * kappa(precond system) ~ 1e-5 relative; aiming below it
    # makes every refinement step burn its full iteration budget for
    # nothing. Stop at the floor and let the (cheap) f64 refinement steps
    # multiply accuracy: 3 steps at 2e-5 each reach ~1e-14.
    lo_tol = max(float(solver_tol), 2e-5) if mixed else solver_tol

    def _eff_tol(tol_hint):
        """Per-application inner tolerance: the caller's hint clamped to
        [solver_tol, max(solver_tol, VERIFY_FILTER_TOL)] (traced). The
        tighter refinement-LOOP cap (LOOP_TOL_CAP, rank-deflation safety)
        is enforced by the kernel on the hints it emits; the verify pass's
        2e-3 hint passes through here unclamped."""
        if tol_hint is None:
            return solver_tol
        hi = max(float(solver_tol), VERIFY_FILTER_TOL)
        return jnp.clip(jnp.asarray(tol_hint), float(solver_tol), hi)

    def krylov(apply_op, rhs, tol, prec, x0=None):
        if solver == "gmres":
            return gmres_block(apply_op, rhs, tol=tol,
                               restart=solver_restart,
                               maxiter=solver_maxiter, apply_prec=prec,
                               x0=x0, flag_tol=flag_tol, axis_name=axis_name,
                               sync_axes=sync_axes)
        return bicgstab_block(apply_op, rhs, tol=tol,
                              maxiter=solver_maxiter, apply_prec=prec,
                              x0=x0, flag_tol=flag_tol, axis_name=axis_name,
                              sync_axes=sync_axes)

    def _guard_guess(X0g, rhs, apply_fn):
        """Accept a warm-start guess PER COLUMN only where it beats the
        zero iterate: Ritz guesses are excellent for converged columns but
        garbage for loop-0 / deflated ones (one extra operator application;
        ~1 Krylov iteration's worth of work)."""
        R0 = rhs - apply_fn(X0g)
        n_g2 = jnp.real(_psum_k(jnp.einsum("nk,nk->k", jnp.conj(R0), R0)))
        n_b2 = jnp.real(_psum_k(jnp.einsum("nk,nk->k", jnp.conj(rhs), rhs)))
        good = n_g2 < n_b2
        return jnp.where(good[None, :], X0g, 0), jnp.sqrt(
            jnp.minimum(n_g2, n_b2))

    def solve_cols(z, rhs, prec, X0g=None, tol_hint=None):
        tol_eff = _eff_tol(tol_hint)
        if not mixed:
            x0 = None
            if X0g is not None:
                x0, _ = _guard_guess(X0g.astype(rhs.dtype), rhs,
                                     lambda V: apply_shift(z, V))
            X, info = krylov(lambda X: apply_shift(z, X), rhs,
                             tol_eff, prec, x0=x0)
            return X, info.converged
        # --- mixed precision: c64 Krylov + c128 iterative refinement ---
        # Each step solves the column-normalized f64 residual in c64 and
        # accepts the correction PER COLUMN only where it reduced the true
        # residual (c64 BiCGStab can diverge near-breakdown; a rejected
        # correction must not poison the f64 iterate). Stalled refinement
        # (< 2x reduction on every column) exits early.
        hi = rhs.dtype
        lo = jnp.complex64
        z_lo = z.astype(lo)
        nrm = jnp.sqrt(jnp.real(_psum_k(
            jnp.einsum("nk,nk->k", jnp.conj(rhs), rhs))))
        scale = jnp.maximum(nrm, 1.0)
        target = tol_eff * scale
        lo_eff = lo_tol if tol_hint is None else jnp.maximum(tol_eff, 2e-5)

        def ir_body(carry):
            X, it, rn, stall, _ = carry
            R = rhs - apply_shift(z, X)
            safe = jnp.where(rn > 0, rn, 1.0)
            Rn = (R / safe[None, :]).astype(lo)
            dX, _ = krylov(lambda V: apply_shift_lo(z_lo, V), Rn,
                           lo_eff, prec)
            X_new = X + dX.astype(hi) * safe[None, :].astype(hi)
            Rf = rhs - apply_shift(z, X_new)
            rn_new = jnp.sqrt(jnp.real(_psum_k(
                jnp.einsum("nk,nk->k", jnp.conj(Rf), Rf))))
            improved = rn_new < rn
            X = jnp.where(improved[None, :], X_new, X)
            rn_best = jnp.minimum(rn_new, rn)
            # a single < 2x step is legal near-breakdown behavior of the
            # c64 inner solve; abort only after TWO consecutive ones (the
            # one-step exit is chaotically sensitive to rounding order)
            stalled_now = ~jnp.any(rn_new < 0.5 * rn)
            stall_new = jnp.where(stalled_now, stall + 1, 0).astype(jnp.int32)
            go = _sync_any((it + 1 < ir_max) & jnp.any(rn_best > target)
                           & (stall_new < 2))
            return X, it + 1, rn_best, stall_new, go

        def ir_cond(carry):
            *_, go = carry
            return go

        X0 = jnp.zeros_like(rhs)
        rn0 = nrm
        if X0g is not None:
            X0, rn0 = _guard_guess(X0g.astype(hi), rhs,
                                   lambda V: apply_shift(z, V))
        X, _, rn, _, _ = jax.lax.while_loop(
            ir_cond, ir_body,
            (X0, jnp.int32(0), rn0, jnp.int32(0),
             _sync_any((ir_max > 0) & jnp.any(rn0 > target))))
        cert = jnp.maximum(tol_eff, flag_tol) if flag_tol is not None \
            else tol_eff
        return X, rn <= 10.0 * cert * scale

    stA, stB = _unpack_stencil(mg_A), _unpack_stencil(mg_B)
    mg_n_levels = mg_A[3] if (mg_A is not None and len(mg_A) > 3) else None

    nu_pre, nu_post, mg_omega, mg_cycles = mg_opts

    def node_prec(z):
        if precond == "mg" and stA is not None:
            lo = jnp.complex64 if mixed else None
            dt = lo or (jnp.complex64 if z.dtype == jnp.complex64
                        else jnp.complex128)
            return _wrap_prec(make_shifted_vcycle(
                stA, stB, z.astype(dt), dtype=dt, n_levels=mg_n_levels,
                nu_pre=nu_pre, nu_post=nu_post, omega=mg_omega,
                n_cycles=mg_cycles))
        if precond == "jacobi" and diagA is not None:
            dA, dB = diagA, diagB
            if mixed:
                dA = _cast_values(dA, jnp.complex64)
                dB = None if dB is None else _cast_values(dB, jnp.complex64)
                z = z.astype(jnp.complex64)
            else:
                dA = _cast_values(dA, z.dtype)
                dB = None if dB is None else _cast_values(dB, z.dtype)
            dshift = (z - dA) if (standard or dB is None) \
                else (z * dB - dA)
            dsafe = jnp.where(jnp.abs(dshift) > 1e-30, dshift, 1.0)
            return lambda X: X / dsafe[:, None]
        return None

    def _chunked(solve_fn, rhs, aux=None):
        """Apply solve_fn over column chunks of rhs (Krylov memory bound);
        solve_fn maps (N, cb)[, aux chunk] -> (X-like pytree, conv (cb,)).
        Uneven column counts are zero-padded to a chunk multiple (a zero
        column solves to zero instantly under the per-column done flags).
        ``aux``: optional pytree of (N, K) arrays chunked alongside rhs
        (warm-start guesses)."""
        K = rhs.shape[1]
        cb = col_block if (col_block and col_block < K) else None
        if cb is None:
            return solve_fn(rhs) if aux is None else solve_fn(rhs, aux)
        K_pad = -(-K // cb) * cb

        def to_blocks(X):
            Xp = X if K_pad == K else jnp.concatenate(
                [X, jnp.zeros((X.shape[0], K_pad - K), X.dtype)], axis=1)
            return Xp.T.reshape(K_pad // cb, cb, -1).transpose(0, 2, 1)

        blocks = to_blocks(rhs)
        if aux is None:
            out, convb = jax.lax.map(solve_fn, blocks)
        else:
            aux_b = jax.tree_util.tree_map(to_blocks, aux)
            out, convb = jax.lax.map(lambda t: solve_fn(t[0], t[1]),
                                     (blocks, aux_b))
        remap = lambda Xb: Xb.transpose(0, 2, 1).reshape(K_pad, -1).T[:, :K]
        out = jax.tree_util.tree_map(remap, out)
        return out, convb.reshape(-1)[:K]

    def filter_partial(Zall, Wall, rhs, Q=None, lam=None, tol_hint=None):
        """Q, lam: optional Ritz warm-start data — per node the guess is
        X0 = Q diag(1/(z - lam)) (the resolvent's action on near-eigenpairs),
        guarded per column inside solve_cols. tol_hint: optional adaptive
        inner tolerance for every node's solve (clamped by _eff_tol)."""
        warm = Q is not None and lam is not None

        def one(acc, zw):
            z, w = zw
            prec = node_prec(z)
            if warm:
                s = 1.0 / (z - lam.astype(rhs.dtype))
                X0g = Q.astype(rhs.dtype) * s[None, :]
                X, conv = _chunked(
                    lambda b, g: solve_cols(z, b, prec, X0g=g,
                                            tol_hint=tol_hint), rhs, X0g)
            else:
                X, conv = _chunked(
                    lambda b: solve_cols(z, b, prec, tol_hint=tol_hint),
                    rhs)
            return acc + w * X, conv

        acc0 = jnp.zeros(rhs.shape, rhs.dtype)
        acc, conv = jax.lax.scan(one, acc0, (Zall, Wall))
        return acc, conv

    # ------------------------------------------------------------------
    # Real-pair mixed filter: the c128-FREE realization of the mixed path
    # for REAL symmetric pencils. The TPU x64 rewriter cannot compile
    # programs carrying complex128 tensors (RET_CHECK in x64_rewriter.cc on
    # loop carries), so the f64 iterate is carried as explicit (re, im)
    # float64 pairs; only the inner Krylov runs in native complex64. The
    # contour enters as f64 component arrays — the whole program contains
    # no 128-bit complex value anywhere.
    # ------------------------------------------------------------------

    def shift_pair(zr, zi, Xr, Xi):
        """(zB - A) applied to Xr + i Xi with real A, B: f64 arithmetic
        through the NATURAL (real) operator applications."""
        BXr = Xr if standard else apply_B_re(Xr)
        BXi = Xi if standard else apply_B_re(Xi)
        Sr = zr * BXr - zi * BXi - apply_A_re(Xr)
        Si = zr * BXi + zi * BXr - apply_A_re(Xi)
        return Sr, Si

    def _cn2(X):
        return _psum_k(jnp.einsum("nk,nk->k", X, X))

    # Per-IR-step Krylov budget: each refinement step only needs the c64
    # floor (~2e-5); a near-singular node that cannot reach it stalls out
    # quickly instead of burning hundreds of iterations inside one device
    # dispatch. The cap exists for REMOTE-ATTACHMENT watchdogs (multi-
    # minute dispatches get killed); elsewhere the user's budget stands.
    pair_maxiter = min(int(solver_maxiter), 90) \
        if cio.complex_io_required() else int(solver_maxiter)

    def krylov_pair(apply_op, rhs, tol, prec):
        if solver == "gmres":
            return gmres_block(apply_op, rhs, tol=tol,
                               restart=min(solver_restart, pair_maxiter),
                               maxiter=pair_maxiter, apply_prec=prec,
                               flag_tol=flag_tol, axis_name=axis_name,
                               sync_axes=sync_axes)
        return bicgstab_block(apply_op, rhs, tol=tol, maxiter=pair_maxiter,
                              apply_prec=prec, flag_tol=flag_tol,
                              axis_name=axis_name, sync_axes=sync_axes)

    def solve_cols_pair(zr, zi, prec, rhs, X0g=None, tol_hint=None):
        """IR solve of (zB - A)(Xr + i Xi) = rhs (real rhs), pair-carried.
        Returns ((Xr, Xi), conv). X0g: optional (Xr0, Xi0) warm-start guess,
        accepted per column only where it beats the zero iterate. tol_hint:
        optional adaptive inner tolerance (clamped by _eff_tol)."""
        tol_eff = _eff_tol(tol_hint)
        z_lo = jax.lax.complex(zr.astype(jnp.float32),
                               zi.astype(jnp.float32))
        nrm = jnp.sqrt(_cn2(rhs))
        scale = jnp.maximum(nrm, 1.0)
        target = tol_eff * scale
        lo_eff = lo_tol if tol_hint is None else jnp.maximum(tol_eff, 2e-5)

        def residual(Xr, Xi):
            Sr, Si = shift_pair(zr, zi, Xr, Xi)
            Rr = rhs - Sr
            Ri = -Si
            return Rr, Ri, jnp.sqrt(_cn2(Rr) + _cn2(Ri))

        def ir_body(carry):
            Xr, Xi, it, rn, stall, _ = carry
            Rr, Ri, _ = residual(Xr, Xi)
            safe = jnp.where(rn > 0, rn, 1.0)
            Rn = jax.lax.complex((Rr / safe[None, :]).astype(jnp.float32),
                                 (Ri / safe[None, :]).astype(jnp.float32))
            dX, _ = krylov_pair(lambda V: apply_shift_lo(z_lo, V), Rn,
                                lo_eff, prec)
            Xr_new = Xr + jnp.real(dX).astype(rhs.dtype) * safe[None, :]
            Xi_new = Xi + jnp.imag(dX).astype(rhs.dtype) * safe[None, :]
            _, _, rn_new = residual(Xr_new, Xi_new)
            improved = rn_new < rn
            Xr = jnp.where(improved[None, :], Xr_new, Xr)
            Xi = jnp.where(improved[None, :], Xi_new, Xi)
            rn_best = jnp.minimum(rn_new, rn)
            # two consecutive < 2x steps before giving up (see solve_cols)
            stalled_now = ~jnp.any(rn_new < 0.5 * rn)
            stall_new = jnp.where(stalled_now, stall + 1, 0).astype(jnp.int32)
            go = _sync_any((it + 1 < ir_max) & jnp.any(rn_best > target)
                           & (stall_new < 2))
            return Xr, Xi, it + 1, rn_best, stall_new, go

        def ir_cond(carry):
            *_, go = carry
            return go

        Z = jnp.zeros_like(rhs)
        Xr0, Xi0, rn0 = Z, Z, nrm
        if X0g is not None:
            Xr0g, Xi0g = (X0g[0].astype(rhs.dtype),
                          X0g[1].astype(rhs.dtype))
            _, _, rn_g = residual(Xr0g, Xi0g)
            good = rn_g < nrm
            Xr0 = jnp.where(good[None, :], Xr0g, 0.0)
            Xi0 = jnp.where(good[None, :], Xi0g, 0.0)
            rn0 = jnp.minimum(rn_g, nrm)
        Xr, Xi, _, rn, _, _ = jax.lax.while_loop(
            ir_cond, ir_body,
            (Xr0, Xi0, jnp.int32(0), rn0, jnp.int32(0),
             _sync_any((ir_max > 0) & jnp.any(rn0 > target))))
        cert = jnp.maximum(tol_eff, flag_tol) if flag_tol is not None \
            else tol_eff
        return (Xr, Xi), rn <= 10.0 * cert * scale

    def node_prec_pair(zr, zi):
        z_lo = jax.lax.complex(zr.astype(jnp.float32), zi.astype(jnp.float32))
        if precond == "mg" and stA is not None:
            return _wrap_prec(make_shifted_vcycle(
                stA, stB, z_lo, dtype=jnp.complex64, n_levels=mg_n_levels,
                nu_pre=nu_pre, nu_post=nu_post, omega=mg_omega,
                n_cycles=mg_cycles))
        if precond == "jacobi" and diagA is not None:
            dA = jnp.real(diagA).astype(jnp.float32) if jnp.iscomplexobj(diagA) \
                else diagA.astype(jnp.float32)
            dB = None
            if not (standard or diagB is None):
                dB = jnp.real(diagB).astype(jnp.float32) if jnp.iscomplexobj(diagB) \
                    else diagB.astype(jnp.float32)
            dshift = (z_lo - dA) if dB is None else (z_lo * dB - dA)
            dsafe = jnp.where(jnp.abs(dshift) > 1e-30, dshift, 1.0)
            return lambda X: X / dsafe[:, None]
        return None

    def pair_guess(zr, zi, Q, lam):
        """Pair-carried Ritz guess: Q diag(Re s, Im s), s = 1/(z - lam)."""
        d = (zr - lam) ** 2 + zi ** 2
        ds = jnp.where(d > 0, d, 1.0)
        return (Q * ((zr - lam) / ds)[None, :], Q * ((-zi) / ds)[None, :])

    def filter_partial_pair(Zr, Zi, Wr, Wi, rhs, Q=None, lam=None,
                            tol_hint=None):
        """sum_e Re(W_e X_e) for real rhs; all-f64 pair arithmetic. Q, lam:
        optional Ritz warm-start data; tol_hint: optional adaptive inner
        tolerance (see filter_partial)."""
        warm = Q is not None and lam is not None

        def one(acc, zw):
            zr, zi, wr, wi = zw
            prec = node_prec_pair(zr, zi)
            if warm:
                (Xr, Xi), conv = _chunked(
                    lambda b, g: solve_cols_pair(zr, zi, prec, b, X0g=g,
                                                 tol_hint=tol_hint),
                    rhs, pair_guess(zr, zi, Q.astype(rhs.dtype),
                                    lam.astype(rhs.dtype)))
            else:
                (Xr, Xi), conv = _chunked(
                    lambda b: solve_cols_pair(zr, zi, prec, b,
                                              tol_hint=tol_hint), rhs)
            return acc + wr * Xr - wi * Xi, conv

        acc0 = jnp.zeros(rhs.shape, rhs.dtype)
        acc, conv = jax.lax.scan(one, acc0, (Zr, Zi, Wr, Wi))
        return acc, conv

    filter_partial.pair = filter_partial_pair
    filter_partial.pair_solve = solve_cols_pair
    filter_partial.pair_prec = node_prec_pair
    filter_partial.pair_guess = pair_guess
    filter_partial.col_block = col_block
    return filter_partial


def _sparse_ops(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
                Zr, Zi, Wr, Wi, *, shape, config, standard, hermitian,
                solver, solver_tol, solver_maxiter, solver_restart, offsets_A,
                offsets_B, use_pallas, precond, mg_A=None, mg_B=None,
                allow_pair=True):
    """(apply_A, apply_B, filter_apply) for sparse operands arriving as raw
    (data, indices) [+ optional DIA form]; BCOO/DIA closures rebuilt here.
    A_data keeps its natural dtype (real for the symmetric path).

    The contour arrives as REAL component arrays (Zr, Zi, Wr, Wi): under
    mixed precision on TPU the real-symmetric program must contain no
    complex128 value anywhere (the XLA x64 rewriter cannot compile c128
    loop carries), so complex nodes are only reassembled on paths that
    genuinely need them."""
    cdtype = jnp.complex128 if Zr.dtype == jnp.float64 else jnp.complex64
    mixed = _mixed_enabled(config, cdtype)
    real_pair = mixed and not hermitian and allow_pair
    A_w = jsparse.BCOO((A_data, A_idx), shape=shape)
    apply_A = _make_apply(A_w, A_dia, offsets_A, use_pallas)
    apply_A_c = _make_apply(A_w, A_dia, offsets_A, use_pallas, cast=cdtype)
    apply_A_lo = _make_apply(A_w, A_dia, offsets_A, use_pallas,
                             cast=jnp.complex64) if mixed else None
    apply_B_lo = None
    if standard:
        apply_B = lambda X: X
        apply_B_c = None
    else:
        B_w = jsparse.BCOO((B_data, B_idx), shape=shape)
        apply_B = _make_apply(B_w, B_dia, offsets_B, use_pallas)
        apply_B_c = _make_apply(B_w, B_dia, offsets_B, use_pallas, cast=cdtype)
        if mixed:
            apply_B_lo = _make_apply(B_w, B_dia, offsets_B, use_pallas,
                                     cast=jnp.complex64)

    # bound Krylov memory: (restart+1)*N*cols at the Krylov work itemsize
    # (complex64 under mixed precision, else the work dtype); target
    # <= ~1.5 GB. filter_partial skips chunking when the actual column
    # count is already below the block size.
    N_shape = shape[0]
    itemsize = 8 if mixed else jnp.dtype(cdtype).itemsize
    budget_cols = max(1, int(1.5e9 / (itemsize * (solver_restart + 1)
                                      * N_shape)))
    col_block = max(8, 1 << int(np.log2(budget_cols))) \
        if budget_cols < 4096 else None
    filter_partial = _make_sparse_solve_all(
        apply_A_c, apply_B_c, standard, solver=solver, solver_tol=solver_tol,
        solver_maxiter=solver_maxiter, solver_restart=solver_restart,
        diagA=diagA, diagB=None if standard else diagB,
        precond=precond, col_block=col_block, flag_tol=config.tol,
        mg_A=mg_A, mg_B=mg_B, mixed=mixed, ir_max=config.ir_max,
        mg_opts=(config.mg_nu_pre, config.mg_nu_post, config.mg_omega,
                 config.mg_cycles),
        apply_A_lo=apply_A_lo, apply_B_lo=apply_B_lo,
        apply_A_re=apply_A, apply_B_re=None if standard else apply_B)

    warm = bool(getattr(config, "warm_start", 1))
    adaptive = bool(getattr(config, "adaptive_inner_tol", 1))
    if real_pair:
        # half-contour with 2x real-part weights, all-f64 pair arithmetic
        def filter_apply(Q, lam=None, tol_hint=None):
            acc, conv = filter_partial.pair(Zr, Zi, 2.0 * Wr, 2.0 * Wi,
                                            apply_B(Q), Q=Q, lam=lam,
                                            tol_hint=tol_hint)
            return acc, jnp.all(conv)
        filter_apply.pair_partial = filter_partial.pair
        filter_apply.pair_solve = filter_partial.pair_solve
        filter_apply.pair_prec = filter_partial.pair_prec
        filter_apply.pair_guess = filter_partial.pair_guess
        filter_apply.col_block = filter_partial.col_block
    elif hermitian:
        Zne = jax.lax.complex(Zr, Zi)
        Wne = jax.lax.complex(Wr, Wi)
        Zall = jnp.concatenate([Zne, jnp.conj(Zne)])
        Wall = jnp.concatenate([Wne, jnp.conj(Wne)])

        def filter_apply(Q, lam=None, tol_hint=None):
            acc, conv = filter_partial(Zall, Wall, apply_B(Q), Q=Q, lam=lam,
                                       tol_hint=tol_hint)
            return acc, jnp.all(conv)
    else:
        Zall = jax.lax.complex(Zr, Zi)
        Wall = 2.0 * jax.lax.complex(Wr, Wi)

        def filter_apply(Q, lam=None, tol_hint=None):
            acc, conv = filter_partial(Zall, Wall, apply_B(Q).astype(cdtype),
                                       Q=Q, lam=lam, tol_hint=tol_hint)
            return jnp.real(acc).astype(Q.dtype), jnp.all(conv)

    filter_apply.takes_ritz = warm
    filter_apply.takes_tol = adaptive
    return apply_A, apply_B, filter_apply


_SPARSE_STATICS = ("shape", "config", "standard", "hermitian", "solver",
                   "solver_tol", "solver_maxiter", "solver_restart",
                   "offsets_A", "offsets_B", "use_pallas", "precond",
                   "mg_A", "mg_B", "allow_pair")


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_hermitian_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                          diagA, diagB, Zr, Zi, Wr, Wi, Q0,
                          Emin, Emax, *, shape, config, standard, hermitian,
                          solver, solver_tol, solver_maxiter, solver_restart,
                          offsets_A=None, offsets_B=None, use_pallas=False,
                          precond="jacobi", mg_A=None, mg_B=None):
    apply_A, apply_B, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        Zr, Zi, Wr, Wi,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    return feast_hermitian_core(
        apply_A, apply_B, filter_apply, Q0, Emin, Emax,
        tol=config.tol, max_loops=config.max_loops,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1))


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_body_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                     diagA, diagB, Zr, Zi, Wr, Wi, state, Emin, Emax, *, shape,
                     config, standard, hermitian, solver, solver_tol,
                     solver_maxiter, solver_restart, offsets_A=None,
                     offsets_B=None, use_pallas=False, precond="jacobi",
                     mg_A=None, mg_B=None):
    """One refinement iteration (host-driven loop: keeps each device
    execution short — long fused programs trip the tunnel's execution
    watchdog and crash the worker)."""
    apply_A, apply_B, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        Zr, Zi, Wr, Wi,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    body = make_hermitian_body(
        apply_A, apply_B, filter_apply, Emin, Emax, tol=config.tol,
        convergence_criterion=config.convergence_criterion)
    return body(state)


@cjit(static_argnames=_SPARSE_STATICS + ("final_mode",))
def _sparse_finalize_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                         diagA, diagB, Zr, Zi, Wr, Wi, state, *, shape, config,
                         standard, hermitian, solver, solver_tol,
                         solver_maxiter, solver_restart, offsets_A=None,
                         offsets_B=None, use_pallas=False, precond="jacobi",
                         mg_A=None, mg_B=None, final_mode="verify"):
    apply_A, apply_B, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        Zr, Zi, Wr, Wi,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    if final_mode == "subspace":
        from ..core.tools import orthonormalize
        from ..kernel.hermitian import _filter_with_ok
        Qp, ok = _filter_with_ok(filter_apply, state.Q)
        U, _, _ = orthonormalize(Qp)
        return state._replace(Q=U, loop=jnp.int32(1), inner_ok=ok)
    return verify_spurious(state, filter_apply)


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_filter_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                       diagA, diagB, Zr, Zi, Wr, Wi, V, *, shape, config, standard,
                       hermitian, solver, solver_tol, solver_maxiter,
                       solver_restart, offsets_A=None, offsets_B=None,
                       use_pallas=False, precond="jacobi",
                       mg_A=None, mg_B=None, allow_pair=True):
    """Raw filtered application P V (stochastic-estimate probes,
    fpm[14]=2)."""
    _, _, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        Zr, Zi, Wr, Wi,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B, allow_pair=allow_pair)
    out = filter_apply(V)
    return out[0] if isinstance(out, tuple) else out


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_node_pair_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                          diagA, diagB, Zr, Zi, Wr, Wi, zr, zi, wr, wi, rhs,
                          *, shape, config, standard, hermitian, solver,
                          solver_tol, solver_maxiter, solver_restart,
                          offsets_A=None, offsets_B=None, use_pallas=False,
                          precond="jacobi", mg_A=None, mg_B=None,
                          allow_pair=True):
    """ONE contour node's weighted filtered contribution (host-granular
    mode: at very large N a whole refinement loop in one dispatch trips the
    remote execution watchdog; the host loops over nodes and accumulates).
    Weights arrive pre-doubled (half-contour 2x)."""
    _, _, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        Zr, Zi, Wr, Wi,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    acc, conv = filter_apply.pair_partial(zr[None], zi[None],
                                          wr[None], wi[None], rhs)
    return acc, jnp.all(conv)


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_group_pair_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                           diagA, diagB, Zr, Zi, Wr, Wi, zr_g, zi_g,
                           wr_g, wi_g, rhs, Q_ws=None, lam_ws=None,
                           tol_hint=None,
                           *, shape, config, standard, hermitian, solver,
                           solver_tol, solver_maxiter, solver_restart,
                           offsets_A=None, offsets_B=None, use_pallas=False,
                           precond="jacobi", mg_A=None, mg_B=None,
                           allow_pair=True):
    """A GROUP of contour nodes solved in one dispatch, node-vmapped.

    On the remote-attachment chip the V-cycle is dispatch-overhead-bound
    (hundreds of small stencil kernels); vmapping g nodes multiplies every
    op's work g-fold at the same overhead — near-g-fold wall-clock
    amortization. The weighted accumulation happens IN the program, so only
    the (N, K) f64 partial sum returns. Weights arrive pre-doubled.

    Q_ws / lam_ws: optional Ritz warm-start data for the same columns as
    rhs (FeastConfig.warm_start) — per node the pair solve starts from
    Q diag(1/(z - lam)), guarded per column. tol_hint: optional adaptive
    inner tolerance (FeastConfig.adaptive_inner_tol), clamped in
    solve_cols_pair.

    The Pallas DIA kernel cannot be vmapped (ANY-memory BlockSpec
    limitation), so the group path always uses the XLA shifted-add matvec —
    batched (g, N, K) elementwise work that utilizes the VPU well anyway."""
    _, _, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        Zr, Zi, Wr, Wi,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=False, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    solve = filter_apply.pair_solve
    precf = filter_apply.pair_prec
    guessf = filter_apply.pair_guess
    cb = filter_apply.col_block
    K = rhs.shape[1]
    warm = (Q_ws is not None and lam_ws is not None
            and bool(getattr(config, "warm_start", 1)))

    hint = tol_hint if bool(getattr(config, "adaptive_inner_tol", 1)) \
        else None

    def run_cols(rhs_cb, Q_cb=None, lam_cb=None):
        def one_node(zr, zi):
            g = None if Q_cb is None else guessf(
                zr, zi, Q_cb.astype(rhs.dtype), lam_cb.astype(rhs.dtype))
            return solve(zr, zi, precf(zr, zi), rhs_cb, X0g=g,
                         tol_hint=hint)
        (Xr, Xi), conv = jax.vmap(one_node)(zr_g, zi_g)
        acc = (jnp.einsum("g,gnk->nk", wr_g, Xr)
               - jnp.einsum("g,gnk->nk", wi_g, Xi))
        return acc, conv.reshape(-1)

    if cb is None or cb >= K:
        return run_cols(rhs, Q_ws if warm else None,
                        lam_ws if warm else None)
    K_pad = -(-K // cb) * cb

    def to_blocks(X):
        Xp = X if K_pad == K else jnp.concatenate(
            [X, jnp.zeros((X.shape[0], K_pad - K), X.dtype)], axis=1)
        return Xp.T.reshape(K_pad // cb, cb, -1).transpose(0, 2, 1)

    blocks = to_blocks(rhs)
    if warm:
        lam_p = lam_ws if K_pad == K else jnp.concatenate(
            [lam_ws, jnp.zeros((K_pad - K,), lam_ws.dtype)])
        accb, convb = jax.lax.map(
            lambda t: run_cols(t[0], t[1], t[2]),
            (blocks, to_blocks(Q_ws), lam_p.reshape(K_pad // cb, cb)))
    else:
        accb, convb = jax.lax.map(run_cols, blocks)
    # chunks carve the COLUMN axis: (n_chunks, N, cb) -> (N, K)
    acc = accb.transpose(0, 2, 1).reshape(K_pad, -1).T[:, :K]
    return acc, convb.reshape(-1)


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_rhs_pair_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                         diagA, diagB, Zr, Zi, Wr, Wi, Q, *, shape, config,
                         standard, hermitian, solver, solver_tol,
                         solver_maxiter, solver_restart, offsets_A=None,
                         offsets_B=None, use_pallas=False, precond="jacobi",
                         mg_A=None, mg_B=None, allow_pair=True):
    _, apply_B, _ = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        Zr, Zi, Wr, Wi,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    return apply_B(Q)


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_outer_pair_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                           diagA, diagB, Zr, Zi, Wr, Wi, state, Qproj, ok,
                           Emin, Emax, *, shape, config, standard, hermitian,
                           solver, solver_tol, solver_maxiter, solver_restart,
                           offsets_A=None, offsets_B=None, use_pallas=False,
                           precond="jacobi", mg_A=None, mg_B=None,
                           allow_pair=True):
    """Rayleigh-Ritz half of a refinement loop from an accumulated Qproj."""
    from ..kernel.hermitian import make_rayleigh_ritz_update
    apply_A, apply_B, _ = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        Zr, Zi, Wr, Wi,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    update = make_rayleigh_ritz_update(
        apply_A, apply_B, Emin, Emax, tol=config.tol,
        convergence_criterion=config.convergence_criterion)
    return update(state, Qproj, ok)


@cjit()
def _sparse_verify_from_jit(state, Qproj, ok):
    from ..kernel.hermitian import verify_spurious_from
    return verify_spurious_from(state, Qproj, ok)


# ---------------------------------------------------------------------------
# Chebyshev polynomial-filter path (solver="cheb"): solve-free FEAST for
# symmetric/Hermitian STANDARD interval problems. The spectral projector is
# approximated by a Jackson-damped Chebyshev expansion of the interval
# indicator (ops/chebfilter.py) evaluated by the three-term recurrence —
# ~degree sparse MATVECS per filter application instead of ne preconditioned
# Krylov solves, the ideal bandwidth-bound TPU workload. No reference
# counterpart (FeastKit.jl is contour-only); the outer FEAST machinery
# (orthonormalize + Rayleigh-Ritz + residuals + spurious verification) is
# shared unchanged with the contour path, so the convergence contract is
# certified identically (residuals are exact operator applications).

_CHEB_STATICS = ("shape", "config", "offsets_A", "use_pallas", "offsets_B")


def _cheb_apply_A(A_data, A_idx, A_dia, *, shape, offsets_A, use_pallas):
    A_w = jsparse.BCOO((A_data, A_idx), shape=shape)
    return _make_apply(A_w, A_dia, offsets_A, use_pallas)


def _cheb_ops(A_data, A_idx, A_dia, barrs, *, shape, offsets_A,
              offsets_B=None, use_pallas=False):
    """(apply_A, apply_B, filter operator). With ``barrs`` (generalized
    sparse-SPD B after the unit-diagonal congruence) the RECURRENCE runs
    on the polynomial-inverse composite q(B)A ~= B^-1 A
    (ops/chebfilter.make_apply_binv_a) while Rayleigh-Ritz/residuals use
    the exact pencil (apply_A, apply_B)."""
    from ..ops.chebfilter import make_apply_binv_a
    apply_A = _cheb_apply_A(A_data, A_idx, A_dia, shape=shape,
                            offsets_A=offsets_A, use_pallas=use_pallas)
    if barrs is None:
        return apply_A, (lambda X: X), apply_A
    B_data, B_idx, B_dia, b_lohi, qc = barrs
    B_w = jsparse.BCOO((B_data, B_idx), shape=shape)
    apply_B = _make_apply(B_w, B_dia, offsets_B, use_pallas)
    apply_C = make_apply_binv_a(apply_A, apply_B, b_lohi[0], b_lohi[1], qc)
    return apply_A, apply_B, apply_C


@cjit(static_argnames=_CHEB_STATICS)
def _sparse_cheb_jit(A_data, A_idx, A_dia, lohi, coeffs, Q0, Emin, Emax, *,
                     shape, config, offsets_A=None, use_pallas=False,
                     barrs=None, offsets_B=None):
    """Fused full FEAST run with the polynomial filter."""
    from ..ops.chebfilter import make_cheb_filter
    apply_A, apply_B, op = _cheb_ops(
        A_data, A_idx, A_dia, barrs, shape=shape, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas)
    filt = make_cheb_filter(op, lohi[0], lohi[1], coeffs)
    return feast_hermitian_core(
        apply_A, apply_B, filt, Q0, Emin, Emax,
        tol=config.tol, max_loops=config.max_loops,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1))


@cjit(static_argnames=_CHEB_STATICS)
def _sparse_cheb_init_jit(A_data, A_idx, A_dia, lohi, c01, Q, *, shape,
                          config, offsets_A=None, use_pallas=False,
                          barrs=None, offsets_B=None):
    """Recurrence carry after the k=0,1 terms (host-driven chunking)."""
    from ..ops.chebfilter import _cheb_init
    _, _, op = _cheb_ops(
        A_data, A_idx, A_dia, barrs, shape=shape, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas)
    return _cheb_init(op, lohi[0], lohi[1], Q, c01)


@cjit(static_argnames=_CHEB_STATICS)
def _sparse_cheb_chunk_jit(A_data, A_idx, A_dia, lohi, coeffs_chunk, carry, *,
                           shape, config, offsets_A=None, use_pallas=False,
                           barrs=None, offsets_B=None):
    """Advance the recurrence over one coefficient chunk (fixed static
    length: the LAST chunk is zero-padded — extra steps leave acc unchanged
    and the carry is discarded, so padding only wastes a few matvecs while
    keeping a single compiled program for all chunks)."""
    from ..ops.chebfilter import make_cheb_stepper
    _, _, op = _cheb_ops(
        A_data, A_idx, A_dia, barrs, shape=shape, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas)
    step = make_cheb_stepper(op, lohi[0], lohi[1])
    carry, _ = jax.lax.scan(lambda c, ck: (step(c, ck), None),
                            carry, coeffs_chunk)
    return carry


@cjit(static_argnames=_CHEB_STATICS)
def _sparse_cheb_outer_jit(A_data, A_idx, A_dia, state, Qproj, Emin, Emax, *,
                           shape, config, offsets_A=None, use_pallas=False,
                           barrs=None, offsets_B=None):
    """Rayleigh-Ritz half of a refinement loop from an accumulated Qproj.
    With ``barrs`` this is the exact GENERALIZED Rayleigh-Ritz of the true
    pencil (the polynomial-inverse approximation only shaped the
    subspace)."""
    from ..kernel.hermitian import make_rayleigh_ritz_update
    apply_A, apply_B, _ = _cheb_ops(
        A_data, A_idx, A_dia, barrs, shape=shape, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas)
    update = make_rayleigh_ritz_update(
        apply_A, apply_B, Emin, Emax, tol=config.tol,
        convergence_criterion=config.convergence_criterion)
    return update(state, Qproj, jnp.bool_(True))


@cjit(static_argnames=_CHEB_STATICS)
def _cheb_backxform_jit(A_data, A_idx, A_dia, dscale, Q, lam, *, shape,
                        config, offsets_A=None, use_pallas=False,
                        barrs=None, offsets_B=None):
    """Device-side congruence back-transform + exact-pencil residuals.

    The cheb driver solves the unit-diagonal congruence A_hat = D^-1/2 A
    D^-1/2 (and B_hat for sparse SPD B; B_hat = I for lumped-mass diagonal
    B). For a congruence-space Ritz basis Y with values lam, the ORIGINAL
    pencil's eigenvectors and residuals are (s = diag(D^-1/2) = dscale)

        x_j  = s .* y_j / ||s .* y_j||
        A x_j - lam_j B x_j = s^-1 .* (A_hat y_j - lam_j B_hat y_j)
                               / ||s .* y_j||

    because A = D^1/2 A_hat D^1/2 (same for B). One exact matvec per
    column. Runs ON DEVICE so the full (N, M0) basis never has to leave
    HBM before trimming (the former host scipy pass forced fetching all
    M0 columns — ~600 MB at the 1M north-star through the tunnel)."""
    apply_A, apply_B, _ = _cheb_ops(
        A_data, A_idx, A_dia, barrs, shape=shape, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas)
    s = dscale[:, None].astype(jnp.result_type(Q.dtype))
    nrm = jnp.linalg.norm(s * Q, axis=0)
    nrm = jnp.where(nrm > 0, nrm, 1.0)
    X = (s * Q) / nrm[None, :]
    lamr = lam.astype(jnp.result_type(Q.dtype))[None, :]
    R = (apply_A(Q) - apply_B(Q) * lamr) / (s * nrm[None, :])
    res = jnp.linalg.norm(R, axis=0) / jnp.maximum(jnp.abs(lam), 1.0)
    return X, res


# Double-single (pair-of-f32) fused recurrence: the f64-phase filter
# applications on TPU run the ops/cheb_pallas.py kernel — ~2^-49 effective
# precision from f32 VPU arithmetic in ONE fused pass per step, instead of
# XLA's per-op f64 emulation across separate matvec/update fusions.

@cjit(static_argnames=("block", "N_tot", "margin"))
def _cheb_ds_diags_jit(A_dia, *, block, N_tot, margin=1):
    from ..ops.cheb_pallas import pack_diags
    return pack_diags(A_dia, dict(block=block, N_tot=N_tot, margin=margin))


@cjit(static_argnames=("block", "N_tot", "Mp", "margin"))
def _cheb_ds_init_jit(Q, c0, *, block, N_tot, Mp, margin=1):
    """(N, M) f64 -> packed carry (T0=0, T1=Q, acc=c0*Q) in DS planes.

    acc is formed in f64 and split — NOT via the DS helpers at XLA level:
    jit-compiled EFT chains lose the lo plane to the backend's FMA
    contraction (see the note in ops/cheb_pallas.py)."""
    from ..ops.cheb_pallas import pack_state
    plan = dict(block=block, N_tot=N_tot, Mp=Mp, margin=margin)
    qh, ql = pack_state(Q, plan)
    ah, al = pack_state(Q * c0.astype(jnp.float64), plan)
    # distinct zero EXPRESSIONS (not two zeros_like of the same operand):
    # the chunk jits donate every carry plane, and XLA CSE would otherwise
    # alias the two zero outputs to one buffer — donating it twice is an
    # execution error
    return qh * 0.0, ql * 0.0, qh, ql, ah, al


@cjit(static_argnames=("block", "n_blocks", "offsets", "interpret",
                       "margin"),
      donate_argnums=(2, 3, 4, 5, 6, 7))
def _cheb_ds_chunk_jit(dgh, dgl, t0h, t0l, t1h, t1l, ach, acl, coeffs_chunk,
                       sc, sh, *, block, n_blocks, offsets, interpret=False,
                       margin=1):
    from ..ops.cheb_pallas import cheb_ds_chunk
    return cheb_ds_chunk(
        dgh, dgl, (t0h, t0l, t1h, t1l, ach, acl), coeffs_chunk, sc, sh,
        plan=dict(block=block, n_blocks=n_blocks, offsets=offsets,
                  margin=margin),
        interpret=interpret)


@cjit(static_argnames=("block", "n_blocks", "offsets", "interpret",
                       "margin"),
      donate_argnums=(2, 3, 4, 5, 6, 7))
def _cheb_ds2_chunk_jit(dgh, dgl, t0h, t0l, t1h, t1l, ach, acl,
                        coeffs_chunk, sc, sh, *, block, n_blocks, offsets,
                        interpret=False, margin=2):
    from ..ops.cheb_pallas import cheb_ds2_chunk
    return cheb_ds2_chunk(
        dgh, dgl, (t0h, t0l, t1h, t1l, ach, acl), coeffs_chunk, sc, sh,
        plan=dict(block=block, n_blocks=n_blocks, offsets=offsets,
                  margin=margin),
        interpret=interpret)


@cjit(static_argnames=("block", "n_blocks", "offsets", "interpret",
                       "margin"),
      donate_argnums=(2, 3, 4, 5, 6, 7))
def _cheb_ds4_chunk_jit(dgh, dgl, t0h, t0l, t1h, t1l, ach, acl,
                        coeffs_chunk, sc, sh, *, block, n_blocks, offsets,
                        interpret=False, margin=4):
    from ..ops.cheb_pallas import cheb_ds4_chunk
    return cheb_ds4_chunk(
        dgh, dgl, (t0h, t0l, t1h, t1l, ach, acl), coeffs_chunk, sc, sh,
        plan=dict(block=block, n_blocks=n_blocks, offsets=offsets,
                  margin=margin),
        interpret=interpret)


@cjit(static_argnames=("block", "N", "M", "margin"))
def _cheb_ds_unpack_jit(hi, lo, *, block, N, M, margin=1):
    from ..ops.cheb_pallas import unpack_state
    return unpack_state(hi, lo, N, M, dict(block=block, margin=margin))


@cjit(static_argnames=("block", "N_tot", "Mp", "margin"))
def _cheb_f32_init_jit(Q, c0, *, block, N_tot, Mp, margin=1):
    """(N, M) -> packed f32 carry (T0=0, T1=Q, acc=c0*Q)."""
    from ..ops.cheb_pallas import pack_state32
    q = pack_state32(Q, dict(block=block, N_tot=N_tot, Mp=Mp,
                             margin=margin))
    return jnp.zeros_like(q), q, c0.astype(jnp.float32) * q


@cjit(static_argnames=("block", "n_blocks", "offsets", "interpret",
                       "margin"),
      donate_argnums=(1, 2, 3))
def _cheb_f32_chunk_jit(dg, t0, t1, ac, coeffs_chunk, sc, sh, *, block,
                        n_blocks, offsets, interpret=False, margin=1):
    from ..ops.cheb_pallas import cheb_f32_chunk
    return cheb_f32_chunk(
        dg, (t0, t1, ac), coeffs_chunk, sc, sh,
        plan=dict(block=block, n_blocks=n_blocks, offsets=offsets,
                  margin=margin),
        interpret=interpret)


@cjit(static_argnames=("block", "n_blocks", "offsets", "interpret",
                       "margin"),
      donate_argnums=(1, 2, 3))
def _cheb_f32_2_chunk_jit(dg, t0, t1, ac, coeffs_chunk, sc, sh, *, block,
                          n_blocks, offsets, interpret=False, margin=2):
    from ..ops.cheb_pallas import cheb_f32_2_chunk
    return cheb_f32_2_chunk(
        dg, (t0, t1, ac), coeffs_chunk, sc, sh,
        plan=dict(block=block, n_blocks=n_blocks, offsets=offsets,
                  margin=margin),
        interpret=interpret)


@cjit(static_argnames=("block", "n_blocks", "offsets", "interpret",
                       "margin"),
      donate_argnums=(1, 2, 3))
def _cheb_f32_4_chunk_jit(dg, t0, t1, ac, coeffs_chunk, sc, sh, *, block,
                          n_blocks, offsets, interpret=False, margin=4):
    from ..ops.cheb_pallas import cheb_f32_4_chunk
    return cheb_f32_4_chunk(
        dg, (t0, t1, ac), coeffs_chunk, sc, sh,
        plan=dict(block=block, n_blocks=n_blocks, offsets=offsets,
                  margin=margin),
        interpret=interpret)


@cjit(static_argnames=("block", "N", "M", "margin"))
def _cheb_f32_unpack_jit(buf, *, block, N, M, margin=1):
    from ..ops.cheb_pallas import unpack_state32
    return unpack_state32(buf, N, M, dict(block=block, margin=margin))


def _cheb_ds_context(arrs, coeffs, lo, hi, N, M, statics):
    """Device-resident DS operands, built once per solve (the diagonals'
    DS planes persist across refinement loops). Picks the two-step-fused
    margin-2 layout whenever either two-step kernel's VMEM working set
    fits (the one-step kernels run unchanged on the wider layout)."""
    from ..ops.cheb_pallas import cheb_plan, cheb_plan_fits
    offs = statics["offsets_A"]
    f32_2 = cheb_plan_fits(offs, N, M, ds=False, steps=2)
    ds_2 = cheb_plan_fits(offs, N, M, ds=True, steps=2)
    f32_4 = cheb_plan_fits(offs, N, M, ds=False, steps=4)
    ds_4 = cheb_plan_fits(offs, N, M, ds=True, steps=4)
    import os as _os
    if _os.environ.get("FEAST_CHEB_FUSE2") in ("0", ""):  # opt-out knob
        f32_2 = ds_2 = False
        f32_4 = ds_4 = False
    if _os.environ.get("FEAST_CHEB_FUSE4") in ("0", ""):  # opt-out knob
        f32_4 = ds_4 = False
    margin = 4 if (f32_4 or ds_4) else 2 if (f32_2 or ds_2) else 1
    plan = cheb_plan(offs, N, M, margin=margin)
    dgh, dgl = _cheb_ds_diags_jit(arrs[2], block=plan["block"],
                                  N_tot=plan["N_tot"], margin=margin)
    return dict(plan=plan, dgh=dgh, dgl=dgl, f32_2=f32_2, ds_2=ds_2,
                f32_4=f32_4, ds_4=ds_4,
                coeffs=np.asarray(coeffs, np.float32),
                sc=np.float32(2.0 / (hi - lo)),
                sh=np.float32((hi + lo) / (hi - lo)),
                interpret=not statics["use_pallas"], N=N, M=M)


def _cheb_sync():
    """FEAST_CHEB_SYNC=1: synchronize + trace every phase of the host-driven
    recurrence (init / chunk / unpack / outer RR). Debugging aid for the
    remote attachment, where async dispatch makes a RESOURCE_EXHAUSTED
    surface at the next fetch instead of at the program that actually
    exhausted HBM."""
    import os as _os
    return _os.environ.get("FEAST_CHEB_SYNC") not in (None, "", "0")


def _run_cheb_chunks(carry, chunk_fn, coeffs, start, budget, nnz, M,
                     mult=1):
    """Shared chunk loop for every host-driven recurrence: fixed static
    chunk length (the LAST chunk zero-padded — padded steps leave acc
    unchanged and the discarded T carry only wastes a few matvecs, keeping
    ONE compiled program for all chunks), sized so each dispatch's work
    stays under the remote execution watchdog while amortizing the
    ~0.1 s per-dispatch tunnel RTT. ``mult`` rounds the chunk length up
    to a multiple (the two-/four-step-fused kernels consume coefficient
    pairs/quads)."""
    m1 = len(coeffs)
    steps = int(max(64, min(m1, budget // max(2 * nnz * M, 1))))
    steps += (-steps) % mult
    sync = _cheb_sync()
    import time as _time
    _t0 = _time.perf_counter()
    for base in range(start, m1, steps):
        chunk = np.zeros(steps, coeffs.dtype)
        take = min(steps, m1 - base)
        chunk[:take] = coeffs[base:base + take]
        carry = chunk_fn(jnp.asarray(chunk), carry)
        if sync:
            jax.block_until_ready(carry)
            print(f"[cheb-sync] chunk @{base}+{take}/{m1} "
                  f"({_time.perf_counter() - _t0:.1f}s)", flush=True)
    return carry


def _sparse_cheb_filter_host_fused(ctx, Q, nnz, *, ds, n_coeffs=None):
    """One filter application rho(A) Q through a fused Pallas kernel
    (ops/cheb_pallas.py): DIA matvec + three-term update + accumulator in
    one VMEM pass per step. ds=False: the single-f32 rung (the DS
    context's hi diagonal plane IS the f32-rounded operator); ds=True:
    double-single pairs (~2^-49). The k=1 init runs one kernel step with
    HALVED map scalars: T2 = 2*(sc/2 A Q - sh/2 Q) - 0 = Ahat Q (scalar
    rounding only perturbs WHICH polynomial in A is applied — the
    eigenvectors are exactly preserved). Budgets: the fused steps are
    ~4x (f32) / ~2x (DS) cheaper than the f64 figure the unfused path's
    4e10 was calibrated for."""
    if ctx.get("gen"):
        return _sparse_cheb_filter_host_fused_gen(ctx, Q, nnz, ds=ds,
                                                  n_coeffs=n_coeffs)
    plan, coeffs = ctx["plan"], ctx["coeffs"]
    if n_coeffs is not None:
        # rung-truncated series (rational contour filters carry a shorter
        # f32-rung truncation — see rational_filter_cheb_coeffs degree_lo)
        coeffs = coeffs[:max(int(n_coeffs), 3)]
    margin = int(plan.get("margin", 1))
    four_step = bool(ctx.get("ds_4" if ds else "f32_4", False))
    two_step = bool(ctx.get("ds_2" if ds else "f32_2", False))
    st = dict(block=plan["block"], n_blocks=plan["n_blocks"],
              offsets=plan["offsets"], interpret=ctx["interpret"],
              margin=margin)
    pk = dict(block=plan["block"], N_tot=plan["N_tot"], Mp=plan["Mp"],
              margin=margin)
    if ds:
        carry = _cheb_ds_init_jit(Q, jnp.asarray(coeffs[0]), **pk)
        chunk = lambda ch, c, s0, s1: _cheb_ds_chunk_jit(   # noqa: E731
            ctx["dgh"], ctx["dgl"], *c, ch, s0, s1, **st)
        chunk2 = lambda ch, c: _cheb_ds2_chunk_jit(          # noqa: E731
            ctx["dgh"], ctx["dgl"], *c, ch, ctx["sc"], ctx["sh"], **st)
        chunk4 = lambda ch, c: _cheb_ds4_chunk_jit(          # noqa: E731
            ctx["dgh"], ctx["dgl"], *c, ch, ctx["sc"], ctx["sh"], **st)
        budget = 8e10 * (4 if four_step else 2 if two_step else 1)
    else:
        carry = _cheb_f32_init_jit(Q, jnp.asarray(coeffs[0]), **pk)
        chunk = lambda ch, c, s0, s1: _cheb_f32_chunk_jit(   # noqa: E731
            ctx["dgh"], *c, ch, s0, s1, **st)
        chunk2 = lambda ch, c: _cheb_f32_2_chunk_jit(        # noqa: E731
            ctx["dgh"], *c, ch, ctx["sc"], ctx["sh"], **st)
        chunk4 = lambda ch, c: _cheb_f32_4_chunk_jit(        # noqa: E731
            ctx["dgh"], *c, ch, ctx["sc"], ctx["sh"], **st)
        budget = 1.6e11 * (4 if four_step else 2 if two_step else 1)
    carry = chunk(jnp.asarray(coeffs[1:2]), carry,
                  ctx["sc"] * np.float32(0.5), ctx["sh"] * np.float32(0.5))
    if four_step:
        carry = _run_cheb_chunks(carry, chunk4, coeffs, 2, budget, nnz,
                                 ctx["M"], mult=4)
    elif two_step:
        carry = _run_cheb_chunks(carry, chunk2, coeffs, 2, budget, nnz,
                                 ctx["M"], mult=2)
    else:
        carry = _run_cheb_chunks(
            carry, lambda ch, c: chunk(ch, c, ctx["sc"], ctx["sh"]),
            coeffs, 2, budget, nnz, ctx["M"])
    if ds:
        # drop the four T-recurrence planes (~1.2 GB at the 1M north-star)
        # before the unpack dispatches: only the accumulator pair is read
        ach, acl = carry[4], carry[5]
        carry = None
        return _cheb_ds_unpack_jit(ach, acl, block=plan["block"],
                                   N=ctx["N"], M=ctx["M"], margin=margin)
    buf = carry[2]
    carry = None
    return _cheb_f32_unpack_jit(buf, block=plan["block"],
                                N=ctx["N"], M=ctx["M"], margin=margin)


@cjit(static_argnames=("block", "n_blocks", "offsets_A", "offsets_B",
                       "interpret", "ds", "margin", "inner_steps"),
      donate_argnums=(3,))
def _cheb_gen_chunk_jit(dgA, dgB, qc, carry, coeffs_chunk, scals_arr, *,
                        block, n_blocks, offsets_A, offsets_B,
                        interpret=False, ds=True, margin=2, inner_steps=2):
    from ..ops.cheb_pallas import cheb_gen_chunk
    scals = dict(sc_C=scals_arr[0], sh_C=scals_arr[1],
                 scB=scals_arr[2], shB=scals_arr[3])
    plan = dict(block=block, n_blocks=n_blocks, offsets_A=offsets_A,
                offsets_B=offsets_B, margin=margin)
    return cheb_gen_chunk(dgA, dgB, qc, carry, coeffs_chunk, scals,
                          plan=plan, ds=ds, inner_steps=inner_steps,
                          interpret=interpret)


@cjit(static_argnames=("block", "n_blocks", "offsets_A", "offsets_B",
                       "interpret", "ds", "margin", "inner_steps"),
      donate_argnums=(3,))
def _cheb_gen_init_jit(dgA, dgB, qc, Qp, c01, scals_arr, *, block,
                       n_blocks, offsets_A, offsets_B, interpret=False,
                       ds=True, margin=2, inner_steps=2):
    from ..ops.cheb_pallas import cheb_gen_init
    scals = dict(sc_C=scals_arr[0], sh_C=scals_arr[1],
                 scB=scals_arr[2], shB=scals_arr[3])
    plan = dict(block=block, n_blocks=n_blocks, offsets_A=offsets_A,
                offsets_B=offsets_B, margin=margin)
    return cheb_gen_init(dgA, dgB, qc, Qp, c01, scals, plan=plan, ds=ds,
                         inner_steps=inner_steps, interpret=interpret)


@cjit(static_argnames=("block", "N_tot", "Mp", "margin"))
def _cheb_pack_jit(Q, *, block, N_tot, Mp, margin=2):
    from ..ops.cheb_pallas import pack_state
    return pack_state(Q, dict(block=block, N_tot=N_tot, Mp=Mp,
                              margin=margin))


@cjit(static_argnames=("block", "N_tot", "Mp", "margin"))
def _cheb_pack32_jit(Q, *, block, N_tot, Mp, margin=2):
    from ..ops.cheb_pallas import pack_state32
    return pack_state32(Q, dict(block=block, N_tot=N_tot, Mp=Mp,
                                margin=margin))


def _cheb_gen_ds_context(A_dia, B_dia, coeffs, lo, hi, b_lo, b_hi, qc, N,
                         M, statics, qc_lo=None):
    """Device-resident operands for the FUSED generalized (sparse SPD B)
    composite recurrence: one margin-2 layout plan from the UNION of both
    offset patterns, DS + f32 packs of both diagonal sets, f32-rounded
    map scalars. Built once per solve. ``qc_lo``: optional shorter inner
    inverse for the f32 rung (see the rung-adaptive note in
    _sparse_cheb_interval) — ds rungs always run the full ``qc``."""
    from ..ops.cheb_pallas import (cheb_gen_plan, cheb_gen_plan_fits,
                                   pack_diags, pack_diags32)
    offsA, offsB = statics["offsets_A"], statics["offsets_B"]
    f32_4 = cheb_gen_plan_fits(offsA, offsB, N, M, ds=False, steps=4)
    ds_4 = cheb_gen_plan_fits(offsA, offsB, N, M, ds=True, steps=4)
    import os as _os
    if _os.environ.get("FEAST_CHEB_FUSE4") in ("0", ""):  # opt-out knob
        f32_4 = ds_4 = False
    margin = 4 if (f32_4 or ds_4) else 2
    plan = cheb_gen_plan(offsA, offsB, N, M, margin=margin)
    pk = dict(block=plan["block"], N_tot=plan["N_tot"], margin=margin)
    A_j = cio.device_operand(np.asarray(A_dia, np.float64))
    B_j = cio.device_operand(np.asarray(B_dia, np.float64))
    dgA = _cheb_ds_diags_jit(A_j, **pk)
    dgB = _cheb_ds_diags_jit(B_j, **pk)
    scals = np.asarray([2.0 / (hi - lo), (hi + lo) / (hi - lo),
                        2.0 / (b_hi - b_lo), (b_hi + b_lo) / (b_hi - b_lo)],
                       np.float32)
    return dict(gen=True, plan=plan, dgA=dgA, dgB=dgB, f32_4=f32_4,
                ds_4=ds_4, dgA32=dgA[0], dgB32=dgB[0],
                qc=np.asarray(qc, np.float32),
                qc_lo=(np.asarray(qc_lo, np.float32)
                       if qc_lo is not None else np.asarray(qc, np.float32)),
                coeffs=np.asarray(coeffs, np.float32), scals=scals,
                interpret=not statics["use_pallas"], N=N, M=M)


def _sparse_cheb_filter_host_fused_gen(ctx, Q, nnz, *, ds, n_coeffs=None):
    """One composite filter application rho(q(B~) A~) Q through the fused
    generalized Pallas kernels (ops/cheb_pallas.py cheb_gen_*): per outer
    step one A-matvec pass, (m_B+1)/2 + 1 inner B passes, one elementwise
    combine — every double-single op in-kernel. ``nnz`` already counts
    the degree-m_B inner Clenshaw (driver's watchdog adjustment)."""
    plan, coeffs = ctx["plan"], ctx["coeffs"]
    if n_coeffs is not None:
        coeffs = coeffs[:max(int(n_coeffs), 3)]
    margin = int(plan.get("margin", 2))
    inner_steps = 4 if ctx.get("ds_4" if ds else "f32_4", False) else 2
    qc = jnp.asarray(ctx["qc"] if ds else ctx.get("qc_lo", ctx["qc"]))
    scals = jnp.asarray(ctx["scals"])
    st = dict(block=plan["block"], n_blocks=plan["n_blocks"],
              offsets_A=plan["offsets_A"], offsets_B=plan["offsets_B"],
              interpret=ctx["interpret"], ds=ds, margin=margin,
              inner_steps=inner_steps)
    pk = dict(block=plan["block"], N_tot=plan["N_tot"], Mp=plan["Mp"],
              margin=margin)
    if ds:
        Qp = _cheb_pack_jit(Q, **pk)
        dgA, dgB = ctx["dgA"], ctx["dgB"]
        budget = 8e10 * (2 if inner_steps == 4 else 1)
    else:
        Qp = _cheb_pack32_jit(Q, **pk)
        dgA, dgB = ctx["dgA32"], ctx["dgB32"]
        budget = 1.6e11 * (2 if inner_steps == 4 else 1)
    carry = _cheb_gen_init_jit(dgA, dgB, qc, Qp,
                               jnp.asarray(coeffs[:2]), scals, **st)
    Qp = None
    carry = _run_cheb_chunks(
        carry,
        lambda ch, c: _cheb_gen_chunk_jit(dgA, dgB, qc, c, ch, scals, **st),
        coeffs, 2, budget, nnz, ctx["M"])
    upk = dict(block=plan["block"], N=ctx["N"], M=ctx["M"],
               margin=int(plan.get("margin", 2)))
    if ds:
        ach, acl = carry[4], carry[5]
        carry = None      # free the four T planes before the unpack runs
        return _cheb_ds_unpack_jit(ach, acl, **upk)
    buf = carry[2]
    carry = None
    return _cheb_f32_unpack_jit(buf, **upk)


def _b_diagonal(B):
    """Host check: B is None/identity -> ("identity", None); a positive
    diagonal matrix -> ("diagonal", d); anything else -> (None, None)."""
    if B is None:
        return "identity", None
    data, idx, shape = sparse_coo_arrays(B)
    if shape[0] != shape[1]:
        return None, None
    off = idx[:, 0] != idx[:, 1]
    if np.any(np.abs(data[off]) > 0):
        return None, None
    diag = np.zeros(shape[0], np.complex128 if np.iscomplexobj(data)
                    else np.float64)
    np.add.at(diag, idx[~off, 0], data[~off])
    if np.iscomplexobj(diag):
        if np.abs(np.imag(diag)).max(initial=0.0) > 0:
            return None, None
        diag = np.real(diag)
    if bool(np.allclose(diag, 1.0, rtol=0, atol=1e-14)):
        return "identity", None
    if np.all(diag > 0):
        return "diagonal", diag
    return None, None


def _b_sparse_spd(B):
    """Host check for a real symmetric positive-diagonal SPARSE B (the
    consistent-mass-matrix class): returns ("spd", diag) or (None, None).
    Positive-definiteness itself is certified downstream by the lowest
    eigenvalue of the unit-diagonal congruence (Gershgorin, refined by a
    host Lanczos when the discs touch zero)."""
    import scipy.sparse as _sp
    data, idx, shape = sparse_coo_arrays(B)
    if shape[0] != shape[1] or np.iscomplexobj(data):
        return None, None
    diag = np.zeros(shape[0], np.float64)
    on = idx[:, 0] == idx[:, 1]
    np.add.at(diag, idx[on, 0], data[on].astype(np.float64))
    if not np.all(diag > 0):
        return None, None
    C = _sp.coo_matrix((data, (idx[:, 0], idx[:, 1])), shape=shape).tocsr()
    d = C - C.T
    if d.nnz and np.abs(d.data).max() > 1e-12 * np.abs(data).max():
        return None, None
    return "spd", diag


def _lanczos_tridiag(apply_op, apply_ip, v0, steps):
    """(alphas, betas) of a fixed-step 3-term Lanczos recurrence on
    ``apply_op`` in the inner product <x, y> = x^T apply_ip(y) (pass the
    identity for plain symmetric Lanczos, apply_B for the generalized
    B-inner-product recurrence on B^-1 A). No reorthogonalization and no
    basis storage: orthogonality loss only duplicates converged extreme
    Ritz values, which is harmless for the spectrum-EDGE estimates these
    feed (interlacing keeps them inside the true spectrum)."""
    def ip(x, y):
        return jnp.sum(x * apply_ip(y))

    q1 = v0 / jnp.sqrt(jnp.maximum(ip(v0, v0), 1e-300))
    alphas = jnp.zeros(steps, v0.dtype)
    betas = jnp.zeros(steps, v0.dtype)

    def body(j, carry):
        q_prev, q, beta_prev, al, be = carry
        u = apply_op(q) - beta_prev * q_prev
        a = ip(u, q)
        u = u - a * q
        b2 = jnp.maximum(ip(u, u), 0.0)
        b = jnp.sqrt(b2)
        q_next = u / jnp.where(b > 1e-30, b, 1.0)
        return q, q_next, b, al.at[j].set(a), be.at[j].set(b)

    _, _, _, alphas, betas = jax.lax.fori_loop(
        0, steps, body, (jnp.zeros_like(q1), q1, jnp.zeros((), v0.dtype),
                         alphas, betas))
    return alphas, betas


@cjit(static_argnames=("steps", "offsets"))
def _lanczos_sym_edges_jit(dia, v0, *, steps, offsets):
    apply_op = _make_apply(None, dia, offsets, False)
    return _lanczos_tridiag(lambda x: apply_op(x), lambda x: x, v0, steps)


@cjit(static_argnames=("steps", "offsets_A", "offsets_B"))
def _lanczos_pencil_edge_jit(A_dia, B_dia, qc, b_lohi, v0, *, steps,
                             offsets_A, offsets_B):
    """Generalized Lanczos on B^-1 A in the B inner product, with the
    polynomial inverse q(B~) (ops/chebfilter.cheb_inverse_coeffs) standing
    in for the B-solve — every op a plain DIA matvec, no Krylov-in-B."""
    from ..ops.chebfilter import make_apply_binv_a
    apply_A = _make_apply(None, A_dia, offsets_A, False)
    apply_B = _make_apply(None, B_dia, offsets_B, False)
    apply_C = make_apply_binv_a(apply_A, apply_B, b_lohi[0], b_lohi[1], qc)
    return _lanczos_tridiag(apply_C, apply_B, v0, steps)


def _lanczos_v0(N):
    # deterministic start vector (determinism-by-shape contract,
    # feast_tools.jl:6-43) — a seeded RNG draw would work too, but this
    # matches the host-eigsh paths' v0 exactly
    return (np.cos(0.7 * np.arange(N)) + 0.5).astype(
        np.float32).reshape(N, 1)


def _tridiag_edges(al, be):
    import scipy.linalg as _sla
    al = np.asarray(al, np.float64)
    be = np.asarray(be, np.float64)[:-1]
    w = _sla.eigh_tridiagonal(al, be, eigvals_only=True,
                              lapack_driver="stev")
    return float(w[0]), float(w[-1])


def _pencil_upper_edge_fast(A_dia, offsets_A, B_dia, offsets_B, qc,
                            b_lo, b_hi, N, steps=96):
    """Measured upper edge of the congruenced pencil via the jitted
    polynomial-inverse Lanczos (_lanczos_pencil_edge_jit) — replaces the
    host scipy eigsh+CG path (a ~10-minute single-threaded phase at 1M dof
    that every solve repaid) with a few seconds of device matvecs. Returns
    None when either operand has no DIA form."""
    if offsets_A is None or offsets_B is None:
        return None
    try:
        al, be = _lanczos_pencil_edge_jit(
            np.asarray(np.real(A_dia), np.float32),
            np.asarray(np.real(B_dia), np.float32),
            np.asarray(qc, np.float32),
            np.asarray([b_lo, b_hi], np.float32),
            _lanczos_v0(N), steps=min(int(steps), N),
            offsets_A=offsets_A, offsets_B=offsets_B)
        return _tridiag_edges(fetch(al), fetch(be))[1]
    except Exception:                                    # noqa: BLE001
        return None


def _b_spd_bounds(B_data, B_idx, N, B_dia=None, offsets_B=None):
    """Spectrum enclosure [b_lo, b_hi] of the unit-diagonal-scaled B.
    Gershgorin first (free); when the discs touch zero (e.g. P1 2D mass
    matrices, where interior off-diagonal row sums EQUAL the diagonal) a
    fixed-step device Lanczos (_lanczos_sym_edges_jit; host scipy eigsh
    when B has no DIA form) refines the ends. Raises when B is not
    positive definite enough for the polynomial inverse."""
    from ..ops.chebfilter import gershgorin_interval
    b_lo, b_hi = gershgorin_interval(B_data, B_idx, N)
    if b_lo <= 0.02 * b_hi and offsets_B is not None:
        try:
            al, be = _lanczos_sym_edges_jit(
                np.asarray(np.real(B_dia), np.float32), _lanczos_v0(N),
                steps=min(128, N), offsets=offsets_B)
            lo_e, hi_e = _tridiag_edges(fetch(al), fetch(be))
            b_lo, b_hi = 0.9 * lo_e, min(1.1 * hi_e, b_hi)
        except Exception:                                # noqa: BLE001
            pass
    elif b_lo <= 0.02 * b_hi:
        import scipy.sparse as _sp
        import scipy.sparse.linalg as _spl
        Bs = _sp.coo_matrix((B_data, (B_idx[:, 0], B_idx[:, 1])),
                            shape=(N, N)).tocsr()
        try:
            # deterministic start vector (determinism-by-shape contract)
            v0 = np.cos(0.7 * np.arange(N)) + 0.5
            lo_e = float(_spl.eigsh(Bs, k=1, which="SA", tol=1e-4, v0=v0,
                                    return_eigenvectors=False)[0])
            hi_e = float(_spl.eigsh(Bs, k=1, which="LA", tol=1e-4, v0=v0,
                                    return_eigenvectors=False)[0])
            b_lo, b_hi = 0.9 * lo_e, min(1.1 * hi_e, b_hi)
        except Exception:
            pass
    if b_lo <= 1e-6 * b_hi:
        raise ValueError(
            "solver='cheb' with a sparse B requires a well-conditioned "
            f"SPD mass matrix; the scaled B's spectrum enclosure "
            f"[{b_lo:.3g}, {b_hi:.3g}] is not safely positive — use the "
            "contour solvers (gmres/bicgstab) for this pencil")
    return b_lo, b_hi


def _pencil_upper_edge(A_data, A_idx, B_data, B_idx, N):
    """Host Lanczos estimate of lambda_max(B^-1 A) for the scaled SPD-B
    pencil (1 Lanczos matvec = 1 A matvec + 1 CG solve in B; B is
    unit-diagonal with kappa <= ~10 after the congruence, so Jacobi-CG
    converges in ~20 steps). The Gershgorin quotient bound a_hi/b_lo that
    binva_enclosure falls back on pairs A's worst disc with B's smallest
    eigenvalue even though no vector attains both — measured 2.2x slack on
    the P1 consistent-mass tensor pencil, i.e. a 1.5x filter-degree tax
    (degree ~ sqrt(enclosure span)). Returns None on any failure."""
    import scipy.sparse as _sp
    import scipy.sparse.linalg as _spl
    try:
        As = _sp.coo_matrix((np.real(A_data).astype(np.float64),
                             (A_idx[:, 0], A_idx[:, 1])),
                            shape=(N, N)).tocsr()
        Bs = _sp.coo_matrix((np.real(B_data).astype(np.float64),
                             (B_idx[:, 0], B_idx[:, 1])),
                            shape=(N, N)).tocsr()
        dinv = 1.0 / Bs.diagonal()
        jac = _spl.LinearOperator((N, N), matvec=lambda v: dinv * v)

        def bsolve(x):
            y, info = _spl.cg(Bs, x, rtol=1e-8, maxiter=200, M=jac)
            if info != 0:
                raise RuntimeError(f"CG in B failed (info={info})")
            return y

        Minv = _spl.LinearOperator((N, N), matvec=bsolve)
        # deterministic start vector: eigsh defaults to a np.random draw,
        # which would break the determinism-by-shape contract
        # (feast_tools.jl:6-43) AND make the filter degree run-dependent
        v0 = np.cos(0.7 * np.arange(N)) + 0.5
        return float(_spl.eigsh(As, k=1, M=Bs, Minv=Minv, which="LA",
                                tol=1e-3, maxiter=150, v0=v0,
                                return_eigenvectors=False)[0])
    except Exception:                                    # noqa: BLE001
        return None


def _sparse_cheb_interval(A, B, Emin, Emax, M0, fpm, *, hermitian,
                          Q0=None, mesh=None, device_q=False,
                          contour=None, route=False) -> FeastResult:
    """solver="cheb" driver: polynomial-filtered FEAST (standard problems).

    ``contour``: optional Contour (Zne/Wne) — when given, the filter is the
    POLYNOMIAL REALIZATION OF THE RATIONAL CONTOUR FILTER (all quadrature
    nodes share the Chebyshev basis T_k(A_hat) Y, so the whole quadrature
    sum is one polynomial; ops/chebfilter.rational_filter_cheb_coeffs).
    This preserves the reference contour engine's quadrature semantics
    (fpm[2]/[16]/[18], custom node sets) while riding the fused Pallas
    recurrence kernels — the TPU-native replacement for the per-node
    cached direct solves of feast_sparse.jl:294,334-348. ``route=True``:
    called from the auto-router — eligibility failures raise
    ChebInfeasible (caught, falls back to the Krylov contour engine)
    instead of user-facing ValueError/RuntimeError.

    Generalized pencils need B-resolvent applications inside the polynomial
    recurrence — that is a contour problem again, so cheb is gated to B=I
    (the CheFSI regime); the contour drivers cover the rest.

    ``mesh``: optional jax.sharding.Mesh — the subspace columns are GSPMD-
    sharded over ALL mesh devices (the recurrence is embarrassingly column-
    parallel: A is replicated, each device filters its column block with
    zero communication; XLA inserts the all-gathers for the M0 x M0
    Rayleigh-Ritz contractions). The polynomial filter has no contour
    nodes, so the mesh's axis STRUCTURE is irrelevant — only its device
    set matters.

    Generalized pencils with POSITIVE DIAGONAL B (lumped mass matrices)
    are solved exactly via the congruence A_hat = D^-1/2 A D^-1/2
    (identical eigenvalues; eigenvectors back-transformed x = D^-1/2 y
    and re-normalized, residuals recomputed for the ORIGINAL pencil)."""
    from ..ops.chebfilter import (build_cheb_filter_coeffs,
                                  gershgorin_interval, ChebInfeasible)
    _elig_err = ChebInfeasible if route else ValueError
    fpm = _ensure_fpm(fpm)
    b_kind, b_diag = _b_diagonal(B)
    if b_kind is None:
        b_kind, b_diag = _b_sparse_spd(B)
    if b_kind is None:
        raise _elig_err(
            "solver='cheb' (polynomial filter) requires a standard problem "
            "(B=None/identity), a positive diagonal B (lumped mass), or a "
            "real symmetric positive-definite sparse B (consistent mass); "
            "indefinite/nonsymmetric pencils need the contour solvers "
            "(gmres/bicgstab)")
    is_complex = np.iscomplexobj(_peek_dtype(A))
    if hermitian is None:
        hermitian = is_complex
    f64 = _is_double(_peek_dtype(A).dtype) and jax.config.jax_enable_x64
    if hermitian and f64:
        from ..ops.splitlu import f64_lu_unavailable
        if cio.complex_io_required() or f64_lu_unavailable():
            # the XLA:TPU x64 pass cannot compile complex128 HLO (platform
            # limit, see ops/splitlu.py) — fail with the remediation
            # instead of a deep XLA RET_CHECK. (The public drivers never
            # reach here: sparse_feast_interval real-embeds complex-
            # Hermitian f64 onto this engine's real path first.)
            raise (ChebInfeasible if route else RuntimeError)(
                "solver='cheb' on a complex Hermitian operator in float64 "
                "cannot compile on this TPU backend (XLA has no complex128 "
                "support); use feast_hcsrev/feast (auto real-embedding), "
                "disable jax_enable_x64 (complex64 work precision), or run "
                "on the CPU backend")
    rdtype = np.float64 if f64 else np.float32
    cdtype = np.complex128 if f64 else np.complex64
    work_dtype = cdtype if hermitian else rdtype

    if b_kind == "spd" and hermitian:
        raise _elig_err(
            "solver='cheb' with a sparse SPD B currently supports real "
            "symmetric A (complex Hermitian A + sparse B: use the contour "
            "solvers)")
    A_data, A_idx, shape = sparse_coo_arrays(A, work_dtype)
    N = shape[0]
    barrs = None
    offsets_B = None
    qinfo = None
    if b_kind in ("diagonal", "spd"):
        dscale = 1.0 / np.sqrt(b_diag.astype(np.float64))
        A_data = (A_data * (dscale[A_idx[:, 0]] * dscale[A_idx[:, 1]])
                  ).astype(work_dtype)
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not Emax > Emin:
        raise ValueError(f"Emin={Emin} must be < Emax={Emax}")
    outA = bcoo_to_dia(A_data, A_idx, N)
    A_dia, offsets_A = outA if outA else (np.zeros((0, N), work_dtype), None)
    try:
        use_pallas = jax.devices()[0].platform == "tpu"
    except Exception:
        use_pallas = False

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    if b_kind == "spd":
        # unit-diagonal congruence of B, polynomial inverse q(B~) ~= B~^-1
        # (ops/chebfilter.py): the recurrence filters the composite
        # q(B~) A~ while Rayleigh-Ritz/residuals use the exact pencil
        from ..ops.chebfilter import binva_enclosure, cheb_inverse_coeffs
        B_data, B_idx, _ = sparse_coo_arrays(B, work_dtype)
        B_data = (B_data * (dscale[B_idx[:, 0]] * dscale[B_idx[:, 1]])
                  ).astype(work_dtype)
        outB = bcoo_to_dia(B_data, B_idx, N)
        B_dia, offsets_B = outB if outB else (np.zeros((0, N), work_dtype),
                                              None)
        try:
            b_lo, b_hi = _b_spd_bounds(B_data, B_idx, N,
                                       B_dia=B_dia, offsets_B=offsets_B)
        except ValueError as _e:
            if route:
                raise ChebInfeasible(str(_e)) from _e
            raise
        inv_tol = float(np.clip(0.01 * config.tol, 1e-14, 1e-6))
        qc, qinfo = cheb_inverse_coeffs(b_lo, b_hi, inv_tol)
        # Rung-adaptive inner inverse: the f32 recurrence's own rounding
        # floor is ~sqrt(degree)*eps_f32 ~ 5e-6, so its composite only
        # needs q to ~1e-5 — roughly HALF the Clenshaw degree of the
        # 1e-10+ inverse the ds/f64 rungs carry (degree ~ log(1/tol) at
        # fixed kappa). A perturbed q changes the FILTER polynomial, not
        # the pencil: Rayleigh-Ritz and residuals stay exact, so the only
        # cost is edge-selection blur ~1e-5 relative, well inside the
        # verify pass's rho threshold.
        qc_lo, qinfo_lo = cheb_inverse_coeffs(b_lo, b_hi,
                                              max(inv_tol, 1e-5))
        a_lo, a_hi = gershgorin_interval(A_data, A_idx, N)
        lo, hi = binva_enclosure(a_lo, a_hi, b_lo, b_hi,
                                 max(qinfo["rel_err"], qinfo_lo["rel_err"]))
        # Tighten the upper edge with a measured pencil eigenvalue: the
        # filter degree scales as sqrt(enclosure span), and the quotient
        # bound above is ~2x slack on consistent-mass pencils. 1.1x margin
        # over the Lanczos estimate (converges from below) + the polynomial
        # -inverse inflation keeps the true spectrum strictly enclosed
        # (Chebyshev amplifies anything OUTSIDE [lo, hi] exponentially, so
        # the margin errs conservative).
        hi_e = _pencil_upper_edge_fast(A_dia, offsets_A, B_dia, offsets_B,
                                       qc, b_lo, b_hi, N)
        if hi_e is None:
            hi_e = _pencil_upper_edge(A_data, A_idx, B_data, B_idx, N)
        if hi_e is not None and hi_e > max(float(Emax), 0.0):
            hi = min(hi, (1.1 + qinfo["rel_err"]) * hi_e)
        barrs = (B_data, B_idx, B_dia,
                 np.asarray([b_lo, b_hi], rdtype), np.asarray(qc, rdtype))
    else:
        qc_lo = None
        qinfo_lo = None
        lo, hi = gershgorin_interval(A_data, A_idx, N)
    # Ladder degree rule (measured: scripts/probe_degree.py sweep at 65k +
    # the 1M north-star, BENCH_LOCAL cheb_probe_degree_n65536): a
    # mixed-precision f64 solve always spends >= 2 rungs (f32 floor, then
    # DS/f64 to tol), and the indicator's log outside-level scales
    # ~linearly with degree, so a 1.5x-sharper filter converts two
    # expensive DS/f64 loops into one at ~constant total matvec count
    # (1M: 27.7 -> 23.3 s warm, 65k: 1.3 -> 1.1 s). Indicator only — the
    # rational realization's contraction is fixed by the quadrature, its
    # degree is a realization-accuracy knob, not a sharpness knob. NOT for
    # the sparse-SPD-B composite: there every recurrence step carries a
    # degree-m_B B-inverse Clenshaw, so 1.5x the outer degree inflates the
    # whole solve 1.5x while removing at most one loop — measured as a
    # 32.3 -> 44.4 s regression on the 65k consistent-mass rung (reverted;
    # the diagonal-B congruence keeps standard per-step cost and scales).
    ladder_scale = (1.5 if (f64 and _mixed_enabled(config, np.complex128)
                            and config.tol <= 1e-6 and b_kind != "spd")
                    else 1.0)
    if contour is not None:
        # rational contour filter, polynomial-realized: exact quadrature
        # semantics (fpm[2]/[16]/[18]/custom node sets) through the same
        # fused recurrence kernels; cheb_degree>0 acts as a degree CAP
        from ..ops.chebfilter import rational_filter_cheb_coeffs
        user_cap = int(getattr(config, "cheb_degree", 0) or 0)
        cap_kw = {"cap": user_cap} if user_cap > 0 else {}
        if route:
            # Cost-based default: the rational realization's degree is set
            # by the quadrature node closest to the real axis — a SEMANTIC
            # fidelity burden the user never asked the default solver to
            # pay. Build both candidates (host, milliseconds) and pick by
            # estimated work = degree x expected refinement loops (the
            # rational filter's geometric outside decay converges in ~3
            # loops, the damped indicator's algebraic decay in ~5). An
            # infeasible rational expansion (e.g. the 1M generalized rung:
            # degree ~35k > cap) falls to the indicator instead of the
            # ~60x-slower Krylov engine; only when BOTH polynomial filters
            # are infeasible does ChebInfeasible reach the router.
            rat = ind = None
            rat_err = None
            try:
                rat = rational_filter_cheb_coeffs(
                    contour.Zne, contour.Wne, lo, hi,
                    float(Emin), float(Emax), **cap_kw)
            except ChebInfeasible as e:
                rat_err = e
            try:
                ind = build_cheb_filter_coeffs(
                    lo, hi, float(Emin), float(Emax),
                    degree=user_cap or None, degree_scale=ladder_scale)
                # Quality gate (auto route only): a cap-bound indicator on
                # a deep interior sliver can pass the plateau check while
                # barely decaying outside (outside@1w ~ 1) — subspace
                # iteration then "converges" onto a SUBSET of the wanted
                # pairs and reports SUCCESS. The explicit solver="cheb"
                # keeps the user's judgment; the router refuses and falls
                # back to the Krylov contour engine instead.
                if ind[1]["outside_at_1w"] > 0.25 * ind[1]["inside_min"]:
                    ind = None
            except ValueError:
                ind = None
            if rat is None and ind is None:
                raise ChebInfeasible(
                    f"neither polynomial filter resolves this "
                    f"configuration ({rat_err})")
            # cost model compares UNSCALED indicator work: the ladder
            # sharpening trades loops for degree at ~constant total
            # matvecs (measured, scripts/probe_degree.py), so it must not
            # bias the rational-vs-indicator choice. A user-pinned degree
            # (user_cap) is never scaled, so divide only when the scaling
            # actually applied.
            ind_div = 1.0 if user_cap else ladder_scale
            if rat is not None and (ind is None
                                    or 3 * rat[1]["degree"]
                                    <= 5 * ind[1]["degree"] / ind_div):
                coeffs, cinfo = rat
            else:
                coeffs, cinfo = ind
        else:
            coeffs, cinfo = rational_filter_cheb_coeffs(
                contour.Zne, contour.Wne, lo, hi, float(Emin),
                float(Emax), **cap_kw)
    else:
        try:
            coeffs, cinfo = build_cheb_filter_coeffs(
                lo, hi, float(Emin), float(Emax),
                degree=getattr(config, "cheb_degree", 0) or None,
                degree_scale=ladder_scale)
        except ValueError as _e:
            if route:
                raise ChebInfeasible(str(_e)) from _e
            raise
    if config.print_level >= 1:
        extra = (f" B-inverse degree={qinfo['degree']} "
                 f"(kappa={qinfo['kappa']:.2f})" if qinfo else "")
        kindname = ("contour-poly" if cinfo.get("kind") == "rational"
                    else "cheb")
        print(f"feast {kindname} filter: degree={cinfo['degree']} "
              f"enclosure=[{lo:.3g},{hi:.3g}] "
              f"outside@1w={cinfo['outside_at_1w']:.2e}{extra}", flush=True)
    from ..core.tools import initial_subspace
    rand_q0 = Q0 is None and int(fpm[5]) == 0    # seeded random subspace
    _q0_arg = Q0

    def _materialize_q0():
        # DEFERRED: the estimate path never reads Q0, and the
        # remote-attachment path generates the random subspace on device —
        # drawing (and holding) a ~600 MB host Gaussian at 1M dof only to
        # discard it would waste seconds and memory on exactly those paths
        return initial_subspace(fpm, _q0_arg, N, M0, work_dtype)
    statics = dict(shape=tuple(shape), config=config, offsets_A=offsets_A,
                   use_pallas=use_pallas, offsets_B=offsets_B)
    lohi = np.asarray([lo, hi], rdtype)
    coeffs_d = np.asarray(coeffs, rdtype)
    arrs = (A_data, A_idx, A_dia, lohi)

    # rung-truncated series for the f32 recurrence (rational contour
    # filters only: the f32 rung stops at epsout ~1e-5, where the
    # lo-truncation's looser tail is invisible — degree_lo is typically
    # ~60% of the full degree, a direct wall-clock saving on that rung)
    n_lo = (int(cinfo["degree_lo"]) + 1
            if cinfo.get("degree_lo") else None)
    # watchdog work budget per step: the spd composite runs one A matvec
    # plus a degree-m_B Clenshaw in B per recurrence step
    nnz = int(len(A_data))
    if barrs is not None:
        nnz += int(qinfo["degree"]) * int(len(barrs[0]))
    if config.mode == 2:
        return _stochastic_estimate_result(
            lambda V: _sparse_cheb_filter_host(
                arrs, coeffs_d, jnp.asarray(V), statics, nnz, barrs=barrs),
            N, fpm, work_dtype)

    # fpm[42] mixed precision for the RECURRENCE: the filter only needs to
    # SPAN the target eigenspace (~1e-7 componentwise noise from an f32
    # recurrence), while Rayleigh-Ritz and residuals stay exact f64 — so
    # early refinement loops run the three-term recurrence in f32 (half the
    # HBM traffic; no f64 emulation; re-enables the Pallas DIA kernel,
    # which Mosaic only supports for 32-bit data) and the last loop(s)
    # switch to f64 once epsout nears the f32 subspace floor. Same
    # inexact-FEAST argument as the contour pair-IR path (fpm[42] there).
    use_lp = f64 and _mixed_enabled(config, jnp.complex128)
    lp_avail = use_lp
    lp_dtype = np.complex64 if hermitian else np.float32
    # Ride the f32 recurrence down to its noise floor, then switch — every
    # f64 loop avoided is ~4.5x an f32 loop on the chip (emulated
    # arithmetic, double the HBM traffic, no Pallas). The floor is the
    # accumulated recurrence rounding ~ sqrt(degree) * eps_f32 (measured:
    # 4.5e-6 at degree 1943, ~2.5e-6 at 469, consistent with C ~ 1.7);
    # switching at 2x that predicted floor saves the one probe loop the
    # stall-switch would otherwise burn discovering it.
    lp_switch = max(2.0 * np.sqrt(float(cinfo["degree"])) * 6e-8,
                    30.0 * float(config.tol))
    if qinfo_lo is not None:
        # Generalized SPD-B composite: the f32 rung runs the SHORTER
        # rung-adaptive inverse q_lo (rel_err ~1e-5), whose approximation
        # error — not recurrence rounding — sets that rung's residual
        # floor (measured 8.9e-6 at the 1M consistent-mass rung vs the
        # sqrt(degree)*eps_f32 prediction of 3.8e-6). Fold it into the
        # predicted floor so the ladder switches to DS without burning a
        # probe loop (~160 s each at 1M dof) discovering the stall.
        lp_switch = max(lp_switch, 2.0 * float(qinfo_lo["rel_err"]))

    if (cio.complex_io_required() or use_lp) and config.mode != 1:
        # tunnel: bound work per dispatch (the remote execution watchdog
        # kills long programs) by chunking the recurrence. The host loop
        # also drives the mixed-precision schedule (per-loop dtype choice).
        from .dense import _host_state
        arrs = tuple(cio.device_operand(a) for a in arrs)
        if barrs is not None:
            barrs = tuple(cio.device_operand(a) for a in barrs)
        # Fused double-single Pallas recurrence (ops/cheb_pallas.py): the
        # middle rung of the f32 -> DS -> f64 precision ladder. Its noise
        # floor is ~ u_ds * degree * U_k-amplification * ||A|| (measured
        # ~2.5e-9 on the 300-dof edge fixture, ~1.5e-9 predicted at the 1M
        # north-star) — ample for tol >= 1e-8 targets at ~1/3 the cost of
        # an emulated-f64 loop; a stall while on the DS rung falls through
        # to true f64 for tighter targets. DIA operators on TPU under the
        # mixed policy; FEAST_CHEB_DS=1/0 forces/disables (interpret mode
        # off-TPU — the CPU-testable path).
        import os as _os
        from ..ops import cheb_pallas as _cp
        _ds_env = _os.environ.get("FEAST_CHEB_DS")
        _is_gen = barrs is not None
        _fuse_base = (not hermitian and f64
                      and statics["offsets_A"] is not None
                      and (statics["offsets_B"] is not None
                           if _is_gen else True)
                      and ((lp_avail and bool(statics["use_pallas"]))
                           if _ds_env is None else _ds_env not in ("0", "")))
        # per-kernel VMEM gates: the f32 kernel's working set is ~half the
        # DS kernel's, so it stays fused on operators where DS cannot
        if _is_gen:
            f32_fused = _fuse_base and _cp.cheb_gen_plan_fits(
                statics["offsets_A"], statics["offsets_B"], N, M0, ds=False)
            ds_on = _fuse_base and _cp.cheb_gen_plan_fits(
                statics["offsets_A"], statics["offsets_B"], N, M0, ds=True)
        else:
            f32_fused = _fuse_base and _cp.cheb_plan_fits(
                statics["offsets_A"], N, M0, ds=False)
            ds_on = _fuse_base and _cp.cheb_plan_fits(
                statics["offsets_A"], N, M0, ds=True)
        if use_lp and not f32_fused:
            # unfused low-precision operand set (hermitian / non-DIA /
            # generalized-spd operators); the fused rungs read the DS
            # context instead, so skip this device upload when they will
            # carry the run
            arrs_lp = tuple(cio.device_operand(a) for a in (
                np.asarray(A_data, lp_dtype), A_idx,
                np.asarray(A_dia, lp_dtype), np.asarray(lohi, np.float32)))
            barrs_lp = None if barrs is None else tuple(
                cio.device_operand(a) for a in (
                    np.asarray(B_data, lp_dtype), B_idx,
                    np.asarray(B_dia, lp_dtype),
                    np.asarray([b_lo, b_hi], np.float32),
                    np.asarray(qc_lo, np.float32)))
            coeffs_lp = np.asarray(
                coeffs_d if n_lo is None else coeffs_d[:n_lo], np.float32)
        ds_ctx = None

        def _fused_ctx():
            nonlocal ds_ctx
            if ds_ctx is None:
                if _is_gen:
                    ds_ctx = _cheb_gen_ds_context(
                        A_dia, B_dia, coeffs_d, lo, hi,
                        b_lo, b_hi, qc, N, M0, statics, qc_lo=qc_lo)
                else:
                    ds_ctx = _cheb_ds_context(arrs, coeffs_d, lo, hi, N,
                                              M0, statics)
            return ds_ctx
        if rand_q0 and f64 and not hermitian:
            # the seeded subspace is Gaussian noise: its f64 mantissa tail
            # carries no information, but uploading it is the largest
            # host->device transfer of the whole solve (~600 MB at 1M dof
            # through the ~30 MB/s tunnel). Through a remote attachment,
            # don't ship it at all — generate deterministically ON DEVICE
            # (keyed by (N, M0), the same determinism contract as
            # seeded_subspace); elsewhere ship the f32 bits and widen.
            if cio.complex_io_required():
                key = jax.random.PRNGKey((N * 1000003 + M0) % (2**31 - 1))
                q0_dev = jax.random.normal(
                    key, (N, M0), jnp.float32).astype(jnp.float64)
            else:
                q0_dev = jax.device_put(
                    np.asarray(_materialize_q0(),
                               np.float32)).astype(np.float64)
            state = _host_state(q0_dev)
            del q0_dev    # the host name would pin the 600 MB initial
            #               subspace in HBM for the whole solve
        else:
            state = _host_state(np.asarray(_materialize_q0(), work_dtype))
        import time as _time
        from ..kernel.hermitian import SPURIOUS_RES
        eps_best, eps_prev, best_state, stall_loops = np.inf, np.inf, None, 0
        gm_prev = np.inf
        _dummy_q = None
        for _loop in range(config.max_loops + 1):
            _t0 = _time.perf_counter()
            # The Rayleigh-Ritz update reads state.Q only for its DTYPE
            # (the new basis comes entirely from Qproj), so the old (N, M0)
            # subspace — a full f64 plane, ~600 MB at the 1M north-star —
            # is dropped from the state as soon as the filter application
            # has consumed it instead of riding through the whole chunk
            # run + Rayleigh-Ritz as dead weight in HBM.
            _Qin = state.Q
            if _dummy_q is None:
                _dummy_q = jnp.zeros((1, 1), jnp.result_type(_Qin.dtype))
            state = state._replace(Q=_dummy_q)
            if use_lp and f32_fused:
                Qp = _sparse_cheb_filter_host_fused(
                    _fused_ctx(), _Qin, nnz, ds=False, n_coeffs=n_lo
                ).astype(work_dtype)
            elif use_lp:
                Qp = _sparse_cheb_filter_host(
                    arrs_lp, coeffs_lp, _Qin.astype(lp_dtype), statics,
                    nnz, barrs=barrs_lp).astype(work_dtype)
            elif ds_on:
                Qp = _sparse_cheb_filter_host_fused(_fused_ctx(), _Qin,
                                                    nnz, ds=True)
            else:
                Qp = _sparse_cheb_filter_host(arrs, coeffs_d, _Qin,
                                              statics, nnz, barrs=barrs)
            _Qin = None
            state = _sparse_cheb_outer_jit(*arrs[:3], state, Qp,
                                           rdtype(Emin), rdtype(Emax),
                                           barrs=barrs, **statics)
            Qp = None    # keeping the filtered block referenced through
            #              the NEXT filter application would add a full
            #              (N, M0) f64 plane (~600 MB at 1M x 72) to the
            #              solve's HBM peak
            if _cheb_sync():
                jax.block_until_ready(state.epsout)
                print(f"[cheb-sync] outer RR done "
                      f"({_time.perf_counter() - _t0:.1f}s)", flush=True)
            conv, eps_now, res_h, ins_h = (
                bool(fetch(state.converged)), float(fetch(state.epsout)),
                fetch(state.res), fetch(state.inside))
            M_now = int(np.sum(ins_h))
            if config.print_level >= 1:
                kind = "f32" if use_lp else ("ds" if ds_on else "f64")
                print(f"feast cheb loop {_loop}: epsout={eps_now:.2e} "
                      f"M={M_now} "
                      f"({kind} recurrence, "
                      f"{_time.perf_counter() - _t0:.1f}s)", flush=True)
            # epsout is max-over-PLAUSIBLE: an M=0 loop reports 0.0 and
            # must never win the best-state race. f32-rung states never
            # compete: best_state only matters on the stall-give-up exit,
            # which can only fire on the top rung (a lower-rung stall
            # SWITCHES rungs), and any ds/f64 loop beats every f32 loop —
            # tracking them would just pin an extra (N, M0) plane in HBM
            # across the f32->ds rung boundary.
            if eps_now < eps_best and M_now > 0 and not use_lp:
                eps_best, best_state = eps_now, state
            if conv:
                break
            # Stall exit (two consecutive non-improving loops, like the
            # contour host loop) — but epsout alone is the WRONG metric
            # here: it is a max over "plausible" columns, and with an
            # arbitrary (non-gap) interval edge the extra M0-M columns sit
            # mid-transition of the polynomial filter, pinning the max at
            # O(1e-2) for many loops while every genuine pair converges
            # steadily underneath (they are removed only by the FINAL
            # rho-based verify pass). Track the GEOMETRIC MEAN of the
            # plausible residuals too: a loop counts as stalled only when
            # NEITHER the max nor the mean log-residual improves.
            pl = ins_h & (res_h < SPURIOUS_RES)
            gm_now = (float(np.exp(np.mean(np.log(np.maximum(
                res_h[pl], 1e-300))))) if pl.any() else np.inf)
            stalled = _loop >= 1 and eps_now >= 0.5 * eps_prev \
                and gm_now >= 0.7 * gm_prev
            # Precision-ladder switches: a stall (or reaching the f32
            # subspace floor) advances f32 -> DS -> f64 instead of
            # aborting; only a stall on the top (f64) rung counts toward
            # the give-up exit.
            if use_lp and (stalled or eps_now <= lp_switch):
                use_lp = False
                stall_loops = 0
                if config.print_level >= 1:
                    print("feast cheb: recurrence switching to "
                          f"{'ds' if ds_on else 'f64'}", flush=True)
            elif ds_on and stalled:
                ds_on = False
                stall_loops = 0
                if config.print_level >= 1:
                    print("feast cheb: recurrence switching to f64",
                          flush=True)
            elif stalled:
                stall_loops += 1
                if stall_loops >= 2:
                    break
            else:
                stall_loops = 0
            eps_prev, gm_prev = eps_now, gm_now
        if best_state is not None:
            state = best_state
        # Spurious-verify filter pass: rho = ||P q|| is judged against the
        # 0.25 threshold (genuine pairs sit >= ~0.5), so ~1e-7 f32 filter
        # noise is irrelevant — under the mixed schedule run it in f32 and
        # save a full f64 filter application.
        if f32_fused:
            Qp = _sparse_cheb_filter_host_fused(
                _fused_ctx(), state.Q, nnz, ds=False,
                n_coeffs=n_lo).astype(work_dtype)
        elif lp_avail:
            Qp = _sparse_cheb_filter_host(
                arrs_lp, coeffs_lp, state.Q.astype(lp_dtype), statics,
                nnz, barrs=barrs_lp).astype(work_dtype)
        else:
            Qp = _sparse_cheb_filter_host(arrs, coeffs_d, state.Q, statics,
                                          nnz, barrs=barrs)
        state = _sparse_verify_from_jit(state, Qp, jnp.bool_(True))
    else:
        Q0_in = np.asarray(_materialize_q0(), work_dtype)
        if mesh is not None and getattr(mesh, "size", 1) > 1 \
                and M0 % mesh.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec
            cols = NamedSharding(mesh, PartitionSpec(None, mesh.axis_names))
            Q0_in = jax.device_put(Q0_in, cols)
        state = _sparse_cheb_jit(*arrs, coeffs_d, Q0_in,
                                 rdtype(Emin), rdtype(Emax), barrs=barrs,
                                 **statics)
    # Fetch the SMALL result leaves in one packed transfer; the (N, M0)
    # basis stays ON DEVICE until trimmed. Through a remote attachment the
    # full f64 basis is the dominant device->host transfer of the whole
    # solve (~600 MB at the 1M north-star, ~20 s at tunnel rates): fetching
    # only the M inside columns drops the (M0 - M) spurious ones, and
    # device_q=True skips the transfer entirely (the TPU-native contract:
    # results are jax Arrays the caller composes with further device work).
    conv, lam, res, inside, epsout, loop, inner_ok = cio.fetch_many(
        [state.converged, state.lam, state.res, state.inside,
         state.epsout, state.loop, state.inner_ok])
    Qdev = state.Q
    if b_kind in ("diagonal", "spd"):
        # back-transform x = D^-1/2 y, re-normalize, and recompute the
        # residuals for the ORIGINAL pencil ||A x - lam B x|| / max(|lam|,1)
        # on device (one exact matvec per column, _cheb_backxform_jit)
        Qdev, res_dev = _cheb_backxform_jit(
            *arrs[:3], jnp.asarray(dscale.astype(
                np.float64 if f64 else np.float32)),
            Qdev, state.lam, barrs=barrs, **statics)
        res = np.asarray(cio.fetch(res_dev))
        ins = np.asarray(inside)
        epsout = float(res[ins].max()) if ins.any() else float(epsout)
    # Post-verify SUCCESS upgrade: the loop's convergence flag is judged on
    # max-over-PLAUSIBLE residuals, which junk mid-transition columns (an
    # interval edge not at a spectral gap) can pin above tol for the whole
    # run; the rho-based verify pass then removes them. If every GENUINE
    # pair sits below tol — residuals are exact f64 operator applications —
    # the convergence contract is met and the result is a SUCCESS.
    ins = np.asarray(inside)
    if (not bool(conv) and ins.any()
            and float(np.max(np.asarray(res)[ins])) <= config.tol):
        conv = True
    info = FeastError.SUCCESS if bool(conv) else FeastError.NO_CONVERGENCE
    M_found = int(ins.sum())
    q_trim = cio.slice_cols(Qdev, M_found)
    if not device_q:
        q_trim = cio.fetch(q_trim)
    return _trim(FeastResult, lam, Qdev, res, inside,
                 int(info), float(epsout), int(loop) - 1,
                 inner_ok=bool(inner_ok), q_trimmed=q_trim)


def _sparse_cheb_filter_host(arrs, coeffs, Q, statics, nnz, barrs=None):
    """One full filter application rho(A) Q driven as chunked dispatches
    (the UNFUSED XLA path: any dtype, any operator form — including the
    generalized polynomial-inverse composite via ``barrs``)."""
    carry = _sparse_cheb_init_jit(*arrs, jnp.asarray(coeffs[:2]), Q,
                                  barrs=barrs, **statics)
    return _run_cheb_chunks(
        carry,
        lambda ch, c: _sparse_cheb_chunk_jit(*arrs[:3], arrs[3], ch, c,
                                             barrs=barrs, **statics),
        coeffs, 2, 4e10, nnz, Q.shape[1])[2]


def _stochastic_estimate_result(filter_fn, N, fpm, work_dtype):
    """Shared fpm[14]=2 driver tail: Rademacher probes through the SAME
    quadrature filter; M_est = E[v^T P v] (feast_parameters.jl:71-75).
    Returns a count-only FeastResult (the reference's estimate mode returns
    no eigenpairs)."""
    trials = max(int(fpm[32]), 1)
    rng_probe = np.random.default_rng((N * 31 + trials) % (2**31 - 1))
    V = rng_probe.choice([-1.0, 1.0], size=(N, trials)).astype(work_dtype)
    PV = np.asarray(fetch(filter_fn(V)))
    est = float(np.einsum("nt,nt->", np.real(V), np.real(PV)) / trials)
    return FeastResult(np.zeros(0), np.zeros((N, 0)), max(int(round(est)), 0),
                       np.zeros(0), FeastError.SUCCESS, float(est), 1)


def _guess_grid(offsets, N):
    """Candidate tensor-grid shapes for a DIA offset pattern (row-major).

    A 5-point 2D stencil on (nx, ny) has offsets within {0,+-1,+-ny}; a
    7-point 3D stencil on (nx, ny, nz) within {0,+-1,+-nz,+-ny*nz}. Returns
    candidates largest-dimension-first; detect_grid_stencil validates."""
    if offsets is None:
        return []
    pos = sorted({int(d) for d in offsets if d > 1})
    cands = []
    for s2 in pos:                                     # 3D: strides (s2*?, s2, s1)
        for s1 in pos:
            if s1 < s2 and s2 % s1 == 0 and N % s2 == 0 \
                    and s2 // s1 >= 3 and N // s2 >= 3 and s1 >= 3:
                cands.append((N // s2, s2 // s1, s1))
    for s in pos:                                      # 2D: strides (s, 1)
        if N % s == 0 and N // s >= 3 and s >= 3:
            cands.append((N // s, s))
    if not pos and all(abs(int(d)) <= 1 for d in offsets):
        cands.append((N,))                             # 1D tridiagonal
    return cands


def _structured_forms(A_data, A_idx, B_data, B_idx, N, standard, dtype,
                      grid=None):
    """Detect DIA structure + extract diagonals (Jacobi preconditioner).

    Returns (A_dia, offsets_A, B_dia, offsets_B, diagA, diagB, use_pallas,
    precond, mg_A, mg_B): DIA arrays are (nd, N) host arrays or (0, N)
    dummies when unstructured. The Pallas kernel runs only on real TPU
    backends; the XLA shifted-add reference covers CPU.

    When the operands form constant-coefficient stencils on a tensor grid
    (``grid`` given, or guessed from the offset pattern), precond='mg' with
    packed stencil statics — geometric multigrid inner preconditioning
    (ops/multigrid.py)."""
    outA = bcoo_to_dia(A_data, A_idx, N)
    A_dia, offsets_A = outA if outA else (np.zeros((0, N), dtype), None)
    if standard:
        B_dia, offsets_B = np.zeros((0, N), dtype), None
    else:
        outB = bcoo_to_dia(B_data, B_idx, N)
        B_dia, offsets_B = outB if outB else (np.zeros((0, N), dtype), None)
    maskA = A_idx[:, 0] == A_idx[:, 1]
    diagA = np.zeros(N, dtype)
    np.add.at(diagA, A_idx[maskA, 0], A_data[maskA])
    if standard:
        diagB = np.ones(N, dtype)
    else:
        maskB = B_idx[:, 0] == B_idx[:, 1]
        diagB = np.zeros(N, dtype)
        np.add.at(diagB, B_idx[maskB, 0], B_data[maskB])
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    use_pallas = plat in ("tpu",)   # axon: pending kernel validation
    # Jacobi preconditioning only helps when the pencil is diagonally
    # dominant; on indefinite spectra it slows GMRES down. Gate on a host
    # dominance measure of A (the shift z only adds to the diagonal).
    rowsum = np.zeros(N, np.float64)
    np.add.at(rowsum, A_idx[:, 0], np.abs(A_data))
    offdiag = rowsum - np.abs(diagA)
    dominant = np.mean(np.abs(diagA) >= 0.5 * offdiag) > 0.9
    precond = "jacobi" if dominant else "none"

    # Multigrid detection: constant stencils on a tensor grid make a V-cycle
    # preconditioner AVAILABLE (decisive for near-singular shifted systems
    # where Jacobi is useless — the BASELINE Laplacian configs). Whether it
    # is USED is decided by the driver via _plan_mg (the search region is
    # needed to judge indefiniteness).
    mg_A = mg_B = None
    if offsets_A is not None and (standard or offsets_B is not None):
        cands = [tuple(int(g) for g in grid)] if grid is not None \
            else _guess_grid(offsets_A, N)
        for cand in cands:
            stA = detect_grid_stencil(A_dia, offsets_A, cand)
            if stA is None:
                continue
            if standard:
                mg_A, mg_B = _pack_stencil(stA), None
                break
            stB = detect_grid_stencil(B_dia, offsets_B, cand)
            if stB is not None:
                mg_A, mg_B = _pack_stencil(stA), _pack_stencil(stB)
                break
    return (A_dia.astype(dtype), offsets_A, B_dia.astype(dtype), offsets_B,
            diagA, diagB, use_pallas, precond, mg_A, mg_B)


def _narrow_band(offsets, N, max_half_bw=16, max_n=16384):
    """(kl, ku) when a DIA offset pattern fits a NARROW band, else None.

    Narrow-banded sparse pencils at modest N are solved EXACTLY by the
    banded block-cyclic-reduction engine (ops/banded.py) — the TPU-native
    stand-in for the reference's per-node UMFPACK factorization
    (feast_sparse.jl:294). Restarted Krylov at the near-machine inner
    tolerances a 1e-12 outer target demands routinely stagnates on
    indefinite shifted systems with crowded spectra, where one direct
    factor per contour node is both faster and unconditionally accurate.
    Gated to max(kl, ku) <= ``max_half_bw`` and N <= ``max_n``: beyond
    that the BCR hierarchy's (nb, b, b) block memory (b is MXU-shaped 128
    on TPU) times the contour-node vmap stops paying for itself against
    the MG-preconditioned iterative path."""
    if offsets is None or len(offsets) == 0:
        return None
    kl = max((-d for d in offsets if d < 0), default=0)
    ku = max((d for d in offsets if d > 0), default=0)
    if max(kl, ku) > max_half_bw or N > max_n:
        return None
    return int(kl), int(ku)


def _is_double(dt) -> bool:
    """True when the operand's REAL-component precision is 64-bit: float64 /
    complex128 (complex64 has itemsize 8 but is SINGLE precision)."""
    dt = np.dtype(dt)
    if dt.kind == "c":
        return np.finfo(dt).dtype.itemsize >= 8
    if dt.kind == "f":
        return dt.itemsize >= 8
    return True          # integer / exotic inputs promote to double


def _peek_dtype(A):
    if isinstance(A, jsparse.BCOO):
        return np.zeros((), A.data.dtype)
    try:
        import scipy.sparse as sp
        if sp.issparse(A):
            return np.zeros((), A.dtype)
    except ImportError:
        pass
    return np.zeros((), np.asarray(A).dtype)


def _contour_poly_default():
    """Auto-routing default for the contour-polynomial realization
    (FEAST_CONTOUR_POLY=0 restores the always-Krylov contour engine)."""
    import os as _os
    return _os.environ.get("FEAST_CONTOUR_POLY", "1") not in ("0", "")


def _densify(X):
    """Any sparse/dense operand -> dense numpy (small-N direct fallback)."""
    data, idx, shape = sparse_coo_arrays(X)
    D = np.zeros(shape, data.dtype)
    np.add.at(D, (idx[:, 0], idx[:, 1]), data)
    return D


def _quick_narrow_band(A, B, max_half_bw=16, max_n=16384):
    """Cheap host probe mirroring _narrow_band's gate so the auto-router
    leaves narrow-banded small pencils to the exact BCR direct delegation
    (direct solves per contour node — the closest match to the
    reference's UMFPACK semantics) instead of the polynomial route."""
    try:
        _, idx, shape = sparse_coo_arrays(A)
    except Exception:                                    # noqa: BLE001
        return False
    if shape[0] > max_n:
        return False
    d = idx[:, 0].astype(np.int64) - idx[:, 1].astype(np.int64)
    if int(np.abs(d).max(initial=0)) > max_half_bw:
        return False
    if B is not None:
        try:
            _, bi, _ = sparse_coo_arrays(B)
        except Exception:                                # noqa: BLE001
            return False
        db = bi[:, 0].astype(np.int64) - bi[:, 1].astype(np.int64)
        if int(np.abs(db).max(initial=0)) > max_half_bw:
            return False
    return True


def _sparse_embedded_hermitian(A, B, Emin, Emax, M0, fpm, *, solver=None,
                               solver_tol=None, solver_maxiter=None,
                               solver_restart=30, Q0=None,
                               precond=None, driver=None) -> FeastResult:
    """Complex-Hermitian sparse f64 on a c128-less platform via the
    interleaved real embedding (see sparse_feast_interval). ``grid`` /
    ``precond`` describe the ORIGINAL N-space and do not transfer to the
    2N embedding; they are dropped (the embedded pencil re-derives its own
    structured forms). Eigenvectors collapse host-side, so ``device_q`` is
    not honored on this path.

    ``driver``: the real-path interval driver to run the embedded pencil
    through — defaults to :func:`sparse_feast_interval`; the sharded
    pfeast_sparse passes itself (with the mesh bound) so serial and
    sharded embeddings share this one implementation."""
    import scipy.sparse as sp
    from ..ops.splitlu import (embed_hermitian_sparse,
                               finish_embedded_interval,
                               map_embedded_subspace)
    data, idx, shape = sparse_coo_arrays(A)
    N = shape[0]
    Acsr = sp.csr_matrix((data, (idx[:, 0], idx[:, 1])), shape=shape)
    EA = embed_hermitian_sparse(Acsr)
    standard = B is None
    Bcsr = None
    EB = None
    if not standard:
        db, ib, shb = sparse_coo_arrays(B)
        Bcsr = sp.csr_matrix((db, (ib[:, 0], ib[:, 1])), shape=shb)
        EB = embed_hermitian_sparse(Bcsr)
    M0e = min(2 * M0, 2 * N)
    Q0e = None if Q0 is None else map_embedded_subspace(
        np.asarray(Q0), M0e, interleaved=True)
    run = driver if driver is not None else sparse_feast_interval
    r = run(EA, EB, Emin, Emax, M0e, fpm,
            hermitian=False, solver=solver,
            solver_tol=solver_tol,
            solver_maxiter=solver_maxiter,
            solver_restart=solver_restart, Q0=Q0e)
    return finish_embedded_interval(
        r, N, M0, fpm, interleaved=True,
        apply_A=lambda X: Acsr @ X,
        apply_B=None if standard else (lambda X: Bcsr @ X))


def sparse_feast_interval(A, B, Emin, Emax, M0, fpm=None, *, hermitian=None,
                          solver=None, solver_tol=None, solver_maxiter=None,
                          solver_restart=30, Q0=None, grid=None,
                          precond=None, device_q=False) -> FeastResult:
    """Shared sparse symmetric/Hermitian interval driver
    (parity: feast_scsrgv!/hcsrgv! families, feast_sparse.jl:713-871).

    Inner-solver defaults honor the IFEAST knobs when fpm[43]=1
    (ifeast_solver_options); otherwise GMRES at ~outer-tol accuracy.

    ``device_q=True`` (solver='cheb' path): return the eigenvectors as a
    DEVICE jax.Array instead of fetching to host numpy — the TPU-native
    result contract for callers composing further device work (and, through
    a remote attachment, skipping the dominant device->host transfer)."""
    fpm = _ensure_fpm(fpm)
    # Complex-Hermitian f64 where XLA cannot compile c128 HLO (every TPU
    # backend): run the INTERLEAVED real embedding (kron(Ar,I2)+kron(Ai,J2),
    # ops/splitlu.py — DIA structure preserved, offsets d -> {2d-1,2d,2d+1})
    # through THIS driver's real-f64 engines (contour-poly/cheb/Krylov, all
    # certified c128-free on chip), then collapse the doubled eigenpairs.
    # Parity: feast_hcsrev!/hcsrgv! (feast_sparse.jl:759-871) at f64.
    _in_complex = np.iscomplexobj(_peek_dtype(A)) or (
        B is not None and np.iscomplexobj(_peek_dtype(B)))
    _in_f64 = _is_double(_peek_dtype(A).dtype) and jax.config.jax_enable_x64
    if _in_f64 and (hermitian or (hermitian is None and _in_complex)):
        from ..ops.splitlu import f64_lu_unavailable
        if f64_lu_unavailable():
            if not _in_complex:
                # real data declared Hermitian: same math on the real path
                hermitian = False
            else:
                return _sparse_embedded_hermitian(
                    A, B, Emin, Emax, M0, fpm, solver=solver,
                    solver_tol=solver_tol, solver_maxiter=solver_maxiter,
                    solver_restart=solver_restart, Q0=Q0, precond=precond)
    if solver in ("cheb", ":cheb"):
        # polynomial-filtered FEAST (solve-free): no contour, no inner
        # Krylov — see _sparse_cheb_interval / ops/chebfilter.py
        return _sparse_cheb_interval(A, B, Emin, Emax, M0, fpm,
                                     hermitian=hermitian, Q0=Q0,
                                     device_q=device_q)
    if solver in ("contour_poly", ":contour_poly"):
        # explicit request for the polynomial-realized contour engine
        # (infeasible configurations raise ChebInfeasible, a ValueError)
        from ..core.aux import feast_get_custom_contour
        contour_r = (feast_get_custom_contour(fpm)
                     or feast_contour(Emin, Emax, fpm))
        return _sparse_cheb_interval(A, B, Emin, Emax, M0, fpm,
                                     hermitian=hermitian, Q0=Q0,
                                     device_q=device_q, contour=contour_r)
    iopts = ifeast_solver_options(fpm) or {}
    # nothing pinned the inner solve to an ITERATIVE method: banded-direct
    # delegation below stays available
    auto_inner = (solver is None and not iopts and solver_tol is None
                  and solver_maxiter is None and precond is None)
    if auto_inner and grid is None and _contour_poly_default() \
            and not _quick_narrow_band(A, B):
        # Auto route: realize the RATIONAL CONTOUR FILTER as one Chebyshev
        # polynomial over the shared basis T_k(A_hat) Y and apply it with
        # the fused Pallas recurrence kernels — exact quadrature semantics
        # at the polynomial path's speed (the contour engine's answer to
        # the reference's cached per-node direct solves,
        # feast_sparse.jl:294,334-348). Ineligible pencils (indefinite /
        # nonsymmetric B, nodes on the real axis, degree beyond the cap —
        # e.g. narrow interior intervals deep in a wide spectrum) raise
        # ChebInfeasible and fall back to the Krylov contour engine below.
        from ..ops.chebfilter import ChebInfeasible
        from ..core.aux import feast_get_custom_contour
        contour_r = (feast_get_custom_contour(fpm)
                     or feast_contour(Emin, Emax, fpm))
        try:
            return _sparse_cheb_interval(
                A, B, Emin, Emax, M0, fpm, hermitian=hermitian, Q0=Q0,
                device_q=device_q, contour=contour_r, route=True)
        except ChebInfeasible as e:
            # Tiny pencils that fall off the polynomial route are usually
            # there because the configuration is Krylov-HOSTILE too (e.g.
            # an ultra-narrow interval puts quadrature nodes ~1e-7 from
            # the spectrum: cond(zB - A) ~ 1e8 stalls GMRES outright,
            # while a direct factorization shrugs). Densify and take the
            # dense direct engine — exact per-node factorizations, the
            # closest match to the reference's UMFPACK-backed default
            # (feast_sparse.jl:294,334-348). Memory: (ne, N, N) complex
            # pencils at the 2048 cap = ~270 MB.
            try:
                _shape_n = sparse_coo_arrays(A)[2][0]
            except Exception:                            # noqa: BLE001
                _shape_n = 1 << 30
            import os as _os
            if _shape_n <= int(_os.environ.get("FEAST_SPARSE_DENSE_N",
                                               "2048")):
                if int(fpm[1]) >= 1:
                    print(f"feast sparse: contour-polynomial route "
                          f"unavailable ({e}); N={_shape_n} small — "
                          f"densifying onto the dense direct engine",
                          flush=True)
                from .dense import dense_hermitian_feast
                return dense_hermitian_feast(
                    _densify(A), None if B is None else _densify(B),
                    Emin, Emax, M0, fpm, Q0=Q0, hermitian=hermitian)
            if int(fpm[1]) >= 1:
                print(f"feast sparse: contour-polynomial route "
                      f"unavailable ({e}); using the Krylov contour "
                      f"engine", flush=True)
    solver = _solver_fn(solver or iopts.get("solver", "gmres"))
    solver_tol = solver_tol if solver_tol is not None else iopts.get("solver_tol")
    solver_maxiter = (solver_maxiter if solver_maxiter is not None
                      else iopts.get("solver_maxiter", 500))

    is_complex = np.iscomplexobj(_peek_dtype(A)) or (
        B is not None and np.iscomplexobj(_peek_dtype(B)))
    if hermitian is None:
        hermitian = is_complex
    f64 = _is_double(_peek_dtype(A).dtype) and jax.config.jax_enable_x64
    rdtype = np.float64 if f64 else np.float32
    cdtype = np.complex128 if f64 else np.complex64
    work_dtype = cdtype if hermitian else rdtype

    A_data, A_idx, shape = sparse_coo_arrays(A, work_dtype)
    N = shape[0]
    standard = B is None
    if standard:
        B_data, B_idx = A_data, A_idx     # dummies (static 'standard' gates)
    else:
        B_data, B_idx, _ = sparse_coo_arrays(B, work_dtype)
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not Emax > Emin:
        raise ValueError(f"Emin={Emin} must be < Emax={Emax}")
    (A_dia, offsets_A, B_dia, offsets_B, diagA, diagB, use_pallas,
     precond_auto, mg_A, mg_B) = _structured_forms(
         A_data, A_idx, B_data, B_idx, N, standard, work_dtype, grid=grid)
    if auto_inner and grid is None:
        bwA = _narrow_band(offsets_A, N)
        bwB = (0, 0) if standard else _narrow_band(offsets_B, N)
        if bwA is not None and bwB is not None:
            # narrow-banded pencil: exact BCR factor/solve per contour node
            # (direct-solver semantics, matching the reference's UMFPACK
            # sparse path) — see _narrow_band
            from .banded import _banded_interval_driver
            from ..ops.banded import dia_to_banded
            A_bands = dia_to_banded(A_dia, offsets_A, *bwA)
            B_bands = None if standard else dia_to_banded(
                B_dia, offsets_B, *bwB)
            return _banded_interval_driver(
                A_bands, bwA[0], bwA[1], B_bands, bwB[0], bwB[1],
                Emin, Emax, M0, fpm, hermitian, Q0=Q0)
    precond, mg_A, mg_B = _plan_mg(mg_A, mg_B, float(Emax), precond_auto,
                                   precond)

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    if solver_tol is None:
        # the refinement floor sits ~10x above the inner target (error
        # components along outside-spectrum directions); 0.02x leaves the
        # converged residual safely below tol
        solver_tol = max(config.tol * 0.02,
                         10 * float(np.finfo(rdtype).eps))
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_contour(Emin, Emax, fpm)
    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, work_dtype)
    statics = dict(
        shape=tuple(shape), config=config, standard=standard,
        hermitian=bool(hermitian), solver=solver,
        solver_tol=float(solver_tol), solver_maxiter=int(solver_maxiter),
        solver_restart=int(solver_restart), offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    rcomp = np.float64 if f64 else np.float32
    arrs = (A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
            np.ascontiguousarray(np.real(contour.Zne), rcomp),
            np.ascontiguousarray(np.imag(contour.Zne), rcomp),
            np.ascontiguousarray(np.real(contour.Wne), rcomp),
            np.ascontiguousarray(np.imag(contour.Wne), rcomp))
    if config.mode == 2:
        return _stochastic_estimate_result(
            lambda V: _sparse_filter_jit(*arrs, V, **statics),
            N, fpm, work_dtype)
    if cio.complex_io_required() and config.mode != 1:
        from .dense import _host_state
        # Pin operands on device ONCE: the tunnel's host->device path runs
        # at ~30 MB/s, so re-uploading numpy operands on every dispatch of
        # the host-driven loop would dominate wall time by 100x. Complex
        # operand data (Hermitian path) cannot cross the tunnel as complex
        # arrays — device_operand splits it into device-resident
        # (re, im) pairs that cjit recombines on device.
        arrs = tuple(cio.device_operand(a) for a in arrs)
        state = _host_state(np.asarray(Q0, work_dtype))
        pair_mode = (_mixed_enabled(config, np.complex128 if f64
                                    else np.complex64) and not hermitian)
        if pair_mode and N >= (1 << 15):
            # Host-granular driving: ONE device dispatch per contour node.
            # At this scale a whole refinement loop in one program exceeds
            # the remote execution watchdog; per-node dispatches stay short
            # and the f64 accumulation runs as tiny eager adds on device.
            Zr_, Zi_, Wr_, Wi_ = [np.asarray(a) for a in arrs[-4:]]
            ne_n = len(Zr_)
            # group size: amortize per-op dispatch overhead by node-vmapping
            # as many nodes per dispatch as memory and the execution
            # watchdog allow (pair iterate is 2 f64 (N, K) arrays per node).
            # Bound the WORK PER DISPATCH (the remote execution watchdog
            # kills multi-minute dispatches): node-group size and a
            # host-level column chunk chosen so group * cols * N stays
            # under a calibrated budget (hard contour nodes at the
            # spectrum edge run their full Krylov budget). Knobs live in
            # FeastConfig (env overrides FEAST_DISPATCH_BUDGET /
            # FEAST_GROUP_MAX applied at config construction).
            K_cols = Q0.shape[1]
            budget = float(config.dispatch_budget)
            group = max(1, min(ne_n, int(config.group_max),
                               int(2e9 // max(2 * 8 * N * K_cols, 1))))
            # shrink the node group while the UNCLAMPED per-dispatch column
            # budget falls below 8 (the minimum useful chunk); only then
            # clamp — otherwise the work budget is silently exceeded
            cols_raw = int(budget // max(group * N, 1))
            while group > 1 and cols_raw < 8:
                group -= 1
                cols_raw = int(budget // max(group * N, 1))
            cols_d = max(8, min(K_cols, -(-cols_raw // 8) * 8))

            def host_filter(Q, lam=None, tol_hint=None):
                rhs = Q if standard else _sparse_rhs_pair_jit(
                    *arrs, Q, **statics)
                warm = lam is not None and bool(config.warm_start)
                hint = None if tol_hint is None else np.float64(tol_hint)
                acc, okk = None, None
                for cb in range(0, K_cols, cols_d):
                    hi = min(cb + cols_d, K_cols)
                    rhs_cb = jax.lax.slice_in_dim(rhs, cb, hi, axis=1)
                    Q_cb = jax.lax.slice_in_dim(Q, cb, hi, axis=1) \
                        if warm else None
                    lam_cb = jax.lax.slice_in_dim(lam, cb, hi, axis=0) \
                        if warm else None
                    for base in range(0, ne_n, group):
                        g = slice(base, min(base + group, ne_n))
                        c, conv = _sparse_group_pair_jit(
                            *arrs, Zr_[g], Zi_[g],
                            2.0 * Wr_[g], 2.0 * Wi_[g], rhs_cb,
                            Q_cb, lam_cb, hint, **statics)
                        if acc is None:
                            acc = jnp.zeros(
                                (N, K_cols), c.dtype)
                        acc = jax.lax.dynamic_update_slice_in_dim(
                            acc, jax.lax.dynamic_slice_in_dim(
                                acc, cb, c.shape[1], axis=1) + c, cb, axis=1)
                        ok_g = jnp.all(conv)
                        okk = ok_g if okk is None else (okk & ok_g)
                return acc, okk

            import time as _time
            eps_best = np.inf
            eps_prev = np.inf
            best_state = None
            stall_loops = 0
            for _loop in range(config.max_loops + 1):
                _t0 = _time.perf_counter()
                # inexact-FEAST hint: 0.1 * epsout^2 of the previous loop,
                # capped at the kernel's LOOP_TOL_CAP (rank-deflation
                # safety); loop 0 starts at the cap
                hint = LOOP_TOL_CAP if _loop == 0 else min(
                    0.1 * float(eps_prev if np.isfinite(eps_prev)
                                else 1.0) ** 2, LOOP_TOL_CAP)
                Qp, okk = host_filter(state.Q,
                                      state.lam if _loop > 0 else None,
                                      tol_hint=hint)
                state = _sparse_outer_pair_jit(
                    *arrs, state, Qp, okk, rdtype(Emin), rdtype(Emax),
                    **statics)
                conv = bool(fetch(state.converged))
                eps_now = float(fetch(state.epsout))
                M_now = int(np.sum(fetch(state.inside)))
                if config.print_level >= 1:
                    print(f"feast sparse loop {_loop}: "
                          f"epsout={eps_now:.2e} "
                          f"M={M_now} "
                          f"({_time.perf_counter() - _t0:.1f}s, "
                          f"group={group})", flush=True)
                # an M=0 loop reports epsout 0.0 — never "best"
                if eps_now < eps_best and M_now > 0:
                    eps_best, best_state = eps_now, state
                if conv:
                    break
                # Refinement is limited by inner-solve accuracy: once
                # epsout stops improving LOOP OVER LOOP the remaining loops
                # only burn wall time at the same floor. A single
                # slowly-contracting loop is legal (crowded interval edges
                # contract by ~2x/loop), so require TWO CONSECUTIVE loops
                # with < 2x reduction before giving up. Return the BEST
                # state seen (inexact solves make epsout oscillate around
                # the floor); the result carries NO_CONVERGENCE.
                if _loop >= 1 and eps_now >= 0.5 * eps_prev:
                    stall_loops += 1
                    if stall_loops >= 2:
                        break
                else:
                    stall_loops = 0
                eps_prev = eps_now
            if best_state is not None:
                state = best_state
            Qp, okk = host_filter(state.Q, state.lam,
                                  tol_hint=VERIFY_FILTER_TOL)
            state = _sparse_verify_from_jit(state, Qp, okk)
        else:
            for _ in range(config.max_loops + 1):
                state = _sparse_body_jit(*arrs, state, rdtype(Emin),
                                         rdtype(Emax), **statics)
                if bool(fetch(state.converged)):
                    break
            state = _sparse_finalize_jit(*arrs, state, **statics)
    else:
        state = _sparse_hermitian_jit(
            *arrs, np.asarray(Q0, work_dtype), rdtype(Emin), rdtype(Emax),
            **statics)
    conv, lam, Q, res, inside, epsout, loop, inner_ok = cio.fetch_many(
        [state.converged, state.lam, state.Q, state.res, state.inside,
         state.epsout, state.loop, state.inner_ok])
    info = FeastError.SUCCESS if bool(conv) else FeastError.NO_CONVERGENCE
    return _trim(FeastResult, lam, Q, res, inside,
                 int(info), float(epsout), int(loop) - 1,
                 inner_ok=bool(inner_ok))


def _sparse_general_ops(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                        diagA, diagB, cdtype, *, shape, config, standard,
                        solver, solver_tol, solver_maxiter, solver_restart,
                        offsets_A=None, offsets_B=None, use_pallas=False,
                        precond="jacobi", mg_A=None, mg_B=None):
    """(apply_A, apply_B, filter_partial) full-strength general-contour
    machinery (DIA fast paths, Jacobi/multigrid preconditioning, mixed-
    precision complex64 Krylov + iterative refinement under fpm[42]) —
    shared by the serial and the contour-sharded general drivers so the
    sharded path is exactly as strong per device as the serial one
    (the reference's per-rank solves are full UMFPACK,
    feast_mpi.jl:288-420)."""
    mixed = _mixed_enabled(config, cdtype)
    A_bc = jsparse.BCOO((A_data.astype(cdtype), A_idx), shape=shape)
    apply_A = _make_apply(A_bc, A_dia.astype(cdtype), offsets_A, use_pallas)
    apply_A_lo = _make_apply(A_bc, A_dia, offsets_A, use_pallas,
                             cast=jnp.complex64) if mixed else None
    apply_B_lo = None
    if standard:
        apply_B = (lambda X: X)
        apply_B_c = None
    else:
        B_bc = jsparse.BCOO((B_data.astype(cdtype), B_idx), shape=shape)
        apply_B = _make_apply(B_bc, B_dia.astype(cdtype), offsets_B, use_pallas)
        apply_B_c = apply_B
        if mixed:
            apply_B_lo = _make_apply(B_bc, B_dia, offsets_B, use_pallas,
                                     cast=jnp.complex64)
    filter_partial = _make_sparse_solve_all(
        apply_A, apply_B_c, standard, solver=solver, solver_tol=solver_tol,
        solver_maxiter=solver_maxiter, solver_restart=solver_restart,
        diagA=diagA.astype(cdtype),
        diagB=None if standard else diagB.astype(cdtype), precond=precond,
        flag_tol=config.tol, mg_A=mg_A, mg_B=mg_B, mixed=mixed,
        ir_max=config.ir_max,
        mg_opts=(config.mg_nu_pre, config.mg_nu_post, config.mg_omega,
                 config.mg_cycles),
        apply_A_lo=apply_A_lo, apply_B_lo=apply_B_lo)
    return apply_A, apply_B, filter_partial


@cjit(static_argnames=("shape", "config", "standard", "bilinear",
                       "eig_method", "solver", "solver_tol", "solver_maxiter",
                       "solver_restart", "offsets_A", "offsets_B",
                       "use_pallas", "precond", "mg_A", "mg_B"))
def _sparse_general_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                        diagA, diagB, Zne, Wne, Q0, Emid, r,
                        *, shape, config, standard, bilinear, eig_method,
                        solver, solver_tol, solver_maxiter, solver_restart,
                        offsets_A=None, offsets_B=None, use_pallas=False,
                        precond="jacobi", mg_A=None, mg_B=None):
    apply_A, apply_B, filter_partial = _sparse_general_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB, Zne.dtype,
        shape=shape, config=config, standard=standard, solver=solver,
        solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)

    def filter_apply(Q, lam=None, tol_hint=None):
        acc, conv = filter_partial(Zne, Wne, apply_B(Q), Q=Q, lam=lam,
                                   tol_hint=tol_hint)
        return acc, jnp.all(conv)

    filter_apply.takes_ritz = bool(config.warm_start)
    filter_apply.takes_tol = bool(config.adaptive_inner_tol)
    return feast_general_core(
        apply_A, apply_B, filter_apply, Q0, Emid, r,
        tol=config.tol, max_loops=config.max_loops,
        aspect_ratio=config.aspect_ratio, rotation_deg=config.rotation_deg,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1), bilinear=bilinear,
        eig_method=eig_method)


def sparse_feast_general(A, B, Emid, r, M0, fpm=None, *, bilinear=False,
                         eig_method=None, solver=None,
                         solver_tol=None, solver_maxiter=None,
                         solver_restart=30, Q0=None, grid=None,
                         precond=None) -> FeastGeneralResult:
    """Shared sparse general/complex-symmetric driver
    (parity: feast_gcsrgv!/gcsrev! RCI-loop drivers, feast_sparse.jl:873-1006,
    complex-symmetric :509-711)."""
    fpm = _ensure_fpm(fpm)
    eig_method_arg = eig_method
    if eig_method is None:
        # host zgeev callbacks are unsupported through the axon tunnel —
        # pick the on-device QR eig there, host callback elsewhere
        eig_method = "qr" if cio.complex_io_required() else "callback"
    iopts = ifeast_solver_options(fpm) or {}
    # see sparse_feast_interval: banded-direct delegation stays available
    # only when no ITERATIVE inner-solve knob was pinned by the caller
    auto_inner = (solver is None and not iopts and solver_tol is None
                  and solver_maxiter is None and precond is None)
    solver = _solver_fn(solver or iopts.get("solver", "gmres"))
    solver_tol = solver_tol if solver_tol is not None else iopts.get("solver_tol")
    solver_maxiter = (solver_maxiter if solver_maxiter is not None
                      else iopts.get("solver_maxiter", 500))

    f64 = _is_double(_peek_dtype(A).dtype) and jax.config.jax_enable_x64
    if f64:
        from ..ops.splitlu import f64_lu_unavailable, demote_f64_general
        if f64_lu_unavailable():
            demote_f64_general("feast_gcsr*/scsr*_complex (sparse general/"
                               "complex-symmetric contour engine)")
            f64 = False
    rdtype = np.float64 if f64 else np.float32
    cdtype = np.complex128 if f64 else np.complex64
    A_data, A_idx, shape = sparse_coo_arrays(A, cdtype)
    N = shape[0]
    standard = B is None
    if standard:
        B_data, B_idx = A_data, A_idx
    else:
        B_data, B_idx, _ = sparse_coo_arrays(B, cdtype)
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not r > 0:
        raise ValueError(f"Contour radius must be positive, got {r}")
    (A_dia, offsets_A, B_dia, offsets_B, diagA, diagB, use_pallas,
     precond_auto, mg_A, mg_B) = _structured_forms(
         A_data, A_idx, B_data, B_idx, N, standard, cdtype, grid=grid)
    if auto_inner and grid is None:
        bwA = _narrow_band(offsets_A, N)
        bwB = (0, 0) if standard else _narrow_band(offsets_B, N)
        if bwA is not None and bwB is not None:
            # narrow-banded pencil: exact BCR factor/solve per contour node
            # (direct-solver semantics; see _narrow_band)
            from .banded import _banded_general_driver
            from ..ops.banded import dia_to_banded
            A_bands = dia_to_banded(A_dia, offsets_A, *bwA)
            B_bands = None if standard else dia_to_banded(
                B_dia, offsets_B, *bwB)
            return _banded_general_driver(
                A_bands, bwA[0], bwA[1], B_bands, bwB[0], bwB[1],
                Emid, r, M0, fpm, bilinear, eig_method=eig_method_arg,
                Q0=Q0)
    precond, mg_A, mg_B = _plan_mg(
        mg_A, mg_B, float(np.real(complex(Emid))) + float(r), precond_auto,
        precond)
    config = FeastConfig.from_fpm(fpm, dtype=cdtype, full_contour=True)
    if solver_tol is None:
        solver_tol = max(config.tol * 0.1, 10 * float(np.finfo(rdtype).eps))
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_gcontour(
        complex(Emid), float(r), fpm)
    gen_statics = dict(
        shape=tuple(shape), config=config, standard=standard,
        hermitian=False, solver=solver, solver_tol=float(solver_tol),
        solver_maxiter=int(solver_maxiter),
        solver_restart=int(solver_restart), offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    if config.mode == 2:
        # General contours: replace the half-contour doubling with the raw
        # full-contour quadrature sum (trace(P) = M for oblique projectors).
        Zg = np.asarray(contour.Zne, np.complex128)
        Wg = 0.5 * np.asarray(contour.Wne, np.complex128)
        res = _stochastic_estimate_result(
            lambda V: _sparse_filter_jit(
                A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
                np.ascontiguousarray(Zg.real, rdtype),
                np.ascontiguousarray(Zg.imag, rdtype),
                np.ascontiguousarray(Wg.real, rdtype),
                np.ascontiguousarray(Wg.imag, rdtype),
                np.asarray(V, cdtype), allow_pair=False, **gen_statics),
            N, fpm, cdtype)
        return FeastGeneralResult(np.zeros(0, cdtype), np.zeros((N, 0), cdtype),
                                  res.M, np.zeros(0), res.info, res.epsout,
                                  res.loop)
    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, cdtype, general=True)
    state = _sparse_general_jit(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
        np.asarray(contour.Zne, cdtype), np.asarray(contour.Wne, cdtype),
        Q0, np.asarray(complex(Emid), cdtype)[()], rdtype(float(r)),
        shape=tuple(shape), config=config, standard=standard,
        bilinear=bilinear, eig_method=eig_method, solver=solver,
        solver_tol=float(solver_tol), solver_maxiter=int(solver_maxiter),
        solver_restart=int(solver_restart), offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B)
    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastGeneralResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)),
                 int(fetch(state.loop)) - 1,
                 inner_ok=bool(fetch(state.inner_ok)))


# --- Reference-named wrappers (CSR-family) ---------------------------------

def feast_scsrev(A, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Sparse real-symmetric standard problem (feast_scsrev!)."""
    return sparse_feast_interval(A, None, Emin, Emax, M0, fpm,
                                 hermitian=False, **kw)


def feast_scsrgv(A, B, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Sparse real-symmetric generalized problem (feast_scsrgv!,
    feast_sparse.jl:713-757)."""
    return sparse_feast_interval(A, B, Emin, Emax, M0, fpm,
                                 hermitian=False, **kw)


def feast_hcsrev(A, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Sparse complex-Hermitian standard problem (feast_hcsrev!)."""
    return sparse_feast_interval(A, None, Emin, Emax, M0, fpm,
                                 hermitian=True, **kw)


def feast_hcsrgv(A, B, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Sparse complex-Hermitian generalized problem (feast_hcsrgv!)."""
    return sparse_feast_interval(A, B, Emin, Emax, M0, fpm,
                                 hermitian=True, **kw)


def feast_gcsrev(A, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Sparse general standard problem (feast_gcsrev!)."""
    return sparse_feast_general(A, None, Emid, r, M0, fpm, **kw)


def feast_gcsrgv(A, B, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Sparse general generalized problem (feast_gcsrgv!)."""
    return sparse_feast_general(A, B, Emid, r, M0, fpm, **kw)


def feast_scsrev_complex(A, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Sparse complex-symmetric standard problem (feast_scsrev_complex!,
    feast_sparse.jl:1038-1147): transpose-bilinear pairing."""
    return sparse_feast_general(A, None, Emid, r, M0, fpm, bilinear=True, **kw)


def feast_scsrgv_complex(A, B, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Sparse complex-symmetric generalized problem (feast_scsrgv_complex!)."""
    return sparse_feast_general(A, B, Emid, r, M0, fpm, bilinear=True, **kw)


def feast_scsrpev(coeffs, Emid, r, M0, fpm=None, **kw):
    """Sparse polynomial EVP: densify coefficients and linearize
    (parity: feast_scsrpev!/hcsrpev!/gcsrpev! densify-and-forward,
    feast_sparse.jl:1228-1274)."""
    from .dense_general import feast_pep

    def _densify(c):
        try:
            import scipy.sparse as _sps
            if _sps.issparse(c):
                return c.toarray()
        except ImportError:
            pass
        if isinstance(c, jsparse.BCOO):
            return np.asarray(c.todense())
        return np.asarray(c)

    return feast_pep([_densify(c) for c in coeffs], Emid, r, M0, fpm, **kw)


feast_hcsrpev = feast_scsrpev
feast_gcsrpev = feast_scsrpev
