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
from ..kernel.hermitian import (HermitianState, feast_hermitian_core,
                                make_hermitian_body, verify_spurious)
from ..ops.gmres import bicgstab_block, gmres_block
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
        return lambda X: dia_matvec_any(diags, X, offsets,
                                        use_pallas=use_pallas)
    A = bcoo_mat if cast is None else jsparse.BCOO(
        (_cast_values(bcoo_mat.data, cast), bcoo_mat.indices),
        shape=bcoo_mat.shape)
    return lambda X: A @ X


def _make_sparse_solve_all(apply_A_c, apply_B_c, standard, *, solver,
                           solver_tol, solver_maxiter, solver_restart,
                           diagA=None, diagB=None, precond="jacobi",
                           col_block=None, flag_tol=None):
    """filter_partial(Zall, Wall, rhs) -> (sum_e W_e X_e, conv (ne,K)):
    sequential scan over contour nodes with the weighted accumulation FUSED
    into the scan carry (stacking all (ne, N, K) solves would cost ne x the
    subspace memory), batched block-iterative solve per node, optional
    Jacobi preconditioning, optional column chunking (the Krylov basis is
    (restart+1, N, cols))."""

    def apply_shift(z, X):
        BX = X if standard else apply_B_c(X)
        return z * BX - apply_A_c(X)

    def solve_cols(z, rhs, prec):
        if solver == "gmres":
            X, info = gmres_block(lambda X: apply_shift(z, X), rhs,
                                  tol=solver_tol, restart=solver_restart,
                                  maxiter=solver_maxiter, apply_prec=prec,
                                  flag_tol=flag_tol)
        else:
            X, info = bicgstab_block(lambda X: apply_shift(z, X), rhs,
                                     tol=solver_tol, maxiter=solver_maxiter,
                                     apply_prec=prec, flag_tol=flag_tol)
        return X, info.converged

    def filter_partial(Zall, Wall, rhs):
        K = rhs.shape[1]
        cb = col_block if (col_block and col_block < K) else None
        if cb is not None and K % cb != 0:
            cb = None       # uneven split: fall back to whole-block solves

        def one(acc, zw):
            z, w = zw
            prec = None
            if precond == "jacobi" and diagA is not None:
                dshift = (z - diagA) if (standard or diagB is None) \
                    else (z * diagB - diagA)
                dsafe = jnp.where(jnp.abs(dshift) > 1e-30, dshift, 1.0)
                prec = lambda X: X / dsafe[:, None]
            if cb is None:
                X, conv = solve_cols(z, rhs, prec)
            else:
                blocks = rhs.T.reshape(K // cb, cb, -1).transpose(0, 2, 1)
                Xb, convb = jax.lax.map(
                    lambda b: solve_cols(z, b, prec), blocks)
                X = Xb.transpose(0, 2, 1).reshape(K, -1).T
                conv = convb.reshape(-1)
            return acc + w * X, conv

        acc0 = jnp.zeros(rhs.shape, rhs.dtype)
        acc, conv = jax.lax.scan(one, acc0, (Zall, Wall))
        return acc, conv

    return filter_partial


def _sparse_ops(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
                Zne, Wne, *, shape, config, standard, hermitian, solver,
                solver_tol, solver_maxiter, solver_restart, offsets_A,
                offsets_B, use_pallas, precond):
    """(apply_A, apply_B, filter_apply) for sparse operands arriving as raw
    (data, indices) [+ optional DIA form]; BCOO/DIA closures rebuilt here.
    A_data keeps its natural dtype (real for the symmetric path)."""
    cdtype = Zne.dtype
    A_w = jsparse.BCOO((A_data, A_idx), shape=shape)
    apply_A = _make_apply(A_w, A_dia, offsets_A, use_pallas)
    apply_A_c = _make_apply(A_w, A_dia, offsets_A, use_pallas, cast=cdtype)
    if standard:
        apply_B = lambda X: X
        apply_B_c = None
    else:
        B_w = jsparse.BCOO((B_data, B_idx), shape=shape)
        apply_B = _make_apply(B_w, B_dia, offsets_B, use_pallas)
        apply_B_c = _make_apply(B_w, B_dia, offsets_B, use_pallas, cast=cdtype)

    if hermitian:
        Zall = jnp.concatenate([Zne, jnp.conj(Zne)])
        Wall = jnp.concatenate([Wne, jnp.conj(Wne)])
    else:
        Zall, Wall = Zne, 2.0 * Wne

    # bound Krylov memory: (restart+1)*N*cols at the complex work itemsize
    # (16 bytes in x64); target <= ~1.5 GB. filter_partial skips chunking
    # when the actual column count is already below the block size.
    N_shape = shape[0]
    itemsize = jnp.dtype(cdtype).itemsize
    budget_cols = max(1, int(1.5e9 / (itemsize * (solver_restart + 1)
                                      * N_shape)))
    col_block = max(8, 1 << int(np.log2(budget_cols))) \
        if budget_cols < 4096 else None
    filter_partial = _make_sparse_solve_all(
        apply_A_c, apply_B_c, standard, solver=solver, solver_tol=solver_tol,
        solver_maxiter=solver_maxiter, solver_restart=solver_restart,
        diagA=diagA.astype(cdtype), diagB=None if standard else diagB.astype(cdtype),
        precond=precond, col_block=col_block, flag_tol=config.tol)

    if hermitian:
        def filter_apply(Q):
            acc, conv = filter_partial(Zall, Wall, apply_B(Q))
            return acc, jnp.all(conv)
    else:
        def filter_apply(Q):
            acc, conv = filter_partial(Zall, Wall, apply_B(Q).astype(cdtype))
            return jnp.real(acc).astype(Q.dtype), jnp.all(conv)

    return apply_A, apply_B, filter_apply


_SPARSE_STATICS = ("shape", "config", "standard", "hermitian", "solver",
                   "solver_tol", "solver_maxiter", "solver_restart",
                   "offsets_A", "offsets_B", "use_pallas", "precond")


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_hermitian_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                          diagA, diagB, Zne, Wne, Q0,
                          Emin, Emax, *, shape, config, standard, hermitian,
                          solver, solver_tol, solver_maxiter, solver_restart,
                          offsets_A=None, offsets_B=None, use_pallas=False,
                          precond="jacobi"):
    apply_A, apply_B, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB, Zne, Wne,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond)
    return feast_hermitian_core(
        apply_A, apply_B, filter_apply, Q0, Emin, Emax,
        tol=config.tol, max_loops=config.max_loops,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1))


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_body_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                     diagA, diagB, Zne, Wne, state, Emin, Emax, *, shape,
                     config, standard, hermitian, solver, solver_tol,
                     solver_maxiter, solver_restart, offsets_A=None,
                     offsets_B=None, use_pallas=False, precond="jacobi"):
    """One refinement iteration (host-driven loop: keeps each device
    execution short — long fused programs trip the tunnel's execution
    watchdog and crash the worker)."""
    apply_A, apply_B, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB, Zne, Wne,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond)
    body = make_hermitian_body(
        apply_A, apply_B, filter_apply, Emin, Emax, tol=config.tol,
        convergence_criterion=config.convergence_criterion)
    return body(state)


@cjit(static_argnames=_SPARSE_STATICS + ("final_mode",))
def _sparse_finalize_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                         diagA, diagB, Zne, Wne, state, *, shape, config,
                         standard, hermitian, solver, solver_tol,
                         solver_maxiter, solver_restart, offsets_A=None,
                         offsets_B=None, use_pallas=False, precond="jacobi",
                         final_mode="verify"):
    apply_A, apply_B, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB, Zne, Wne,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond)
    if final_mode == "subspace":
        from ..core.tools import orthonormalize
        from ..kernel.hermitian import _filter_with_ok
        Qp, ok = _filter_with_ok(filter_apply, state.Q)
        U, _, _ = orthonormalize(Qp)
        return state._replace(Q=U, loop=jnp.int32(1), inner_ok=ok)
    return verify_spurious(state, filter_apply)


@cjit(static_argnames=_SPARSE_STATICS)
def _sparse_filter_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                       diagA, diagB, Zne, Wne, V, *, shape, config, standard,
                       hermitian, solver, solver_tol, solver_maxiter,
                       solver_restart, offsets_A=None, offsets_B=None,
                       use_pallas=False, precond="jacobi"):
    """Raw filtered application P V (stochastic-estimate probes,
    fpm[14]=2)."""
    _, _, filter_apply = _sparse_ops(
        A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB, Zne, Wne,
        shape=shape, config=config, standard=standard, hermitian=hermitian,
        solver=solver, solver_tol=solver_tol, solver_maxiter=solver_maxiter,
        solver_restart=solver_restart, offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond)
    out = filter_apply(V)
    return out[0] if isinstance(out, tuple) else out


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


def _structured_forms(A_data, A_idx, B_data, B_idx, N, standard, dtype):
    """Detect DIA structure + extract diagonals (Jacobi preconditioner).

    Returns (A_dia, offsets_A, B_dia, offsets_B, diagA, diagB, use_pallas):
    DIA arrays are (nd, N) host arrays or (0, N) dummies when unstructured.
    The Pallas kernel runs only on real TPU backends; the XLA shifted-add
    reference covers CPU."""
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
    return (A_dia.astype(dtype), offsets_A, B_dia.astype(dtype), offsets_B,
            diagA, diagB, use_pallas, precond)


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


def sparse_feast_interval(A, B, Emin, Emax, M0, fpm=None, *, hermitian=None,
                          solver=None, solver_tol=None, solver_maxiter=None,
                          solver_restart=30, Q0=None) -> FeastResult:
    """Shared sparse symmetric/Hermitian interval driver
    (parity: feast_scsrgv!/hcsrgv! families, feast_sparse.jl:713-871).

    Inner-solver defaults honor the IFEAST knobs when fpm[43]=1
    (ifeast_solver_options); otherwise GMRES at ~outer-tol accuracy."""
    fpm = _ensure_fpm(fpm)
    iopts = ifeast_solver_options(fpm) or {}
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
     precond) = _structured_forms(A_data, A_idx, B_data, B_idx, N,
                                  standard, work_dtype)

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    if solver_tol is None:
        solver_tol = max(config.tol * 0.1,
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
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond)
    arrs = (A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
            np.asarray(contour.Zne, cdtype), np.asarray(contour.Wne, cdtype))
    if config.mode == 2:
        return _stochastic_estimate_result(
            lambda V: _sparse_filter_jit(*arrs, V, **statics),
            N, fpm, work_dtype)
    if cio.complex_io_required() and config.mode != 1:
        from .dense import _host_state
        state = _host_state(np.asarray(Q0, work_dtype))
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
    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)),
                 int(fetch(state.loop)) - 1,
                 inner_ok=bool(fetch(state.inner_ok)))


@cjit(static_argnames=("shape", "config", "standard", "bilinear",
                       "eig_method", "solver", "solver_tol", "solver_maxiter",
                       "solver_restart", "offsets_A", "offsets_B",
                       "use_pallas", "precond"))
def _sparse_general_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                        diagA, diagB, Zne, Wne, Q0, Emid, r,
                        *, shape, config, standard, bilinear, eig_method,
                        solver, solver_tol, solver_maxiter, solver_restart,
                        offsets_A=None, offsets_B=None, use_pallas=False,
                        precond="jacobi"):
    cdtype = Zne.dtype
    A_bc = jsparse.BCOO((A_data.astype(cdtype), A_idx), shape=shape)
    apply_A = _make_apply(A_bc, A_dia.astype(cdtype), offsets_A, use_pallas)
    if standard:
        apply_B = (lambda X: X)
        apply_B_c = None
    else:
        B_bc = jsparse.BCOO((B_data.astype(cdtype), B_idx), shape=shape)
        apply_B = _make_apply(B_bc, B_dia.astype(cdtype), offsets_B, use_pallas)
        apply_B_c = apply_B
    filter_partial = _make_sparse_solve_all(
        apply_A, apply_B_c, standard, solver=solver, solver_tol=solver_tol,
        solver_maxiter=solver_maxiter, solver_restart=solver_restart,
        diagA=diagA.astype(cdtype),
        diagB=None if standard else diagB.astype(cdtype), precond=precond,
        flag_tol=config.tol)

    def filter_apply(Q):
        acc, conv = filter_partial(Zne, Wne, apply_B(Q))
        return acc, jnp.all(conv)

    return feast_general_core(
        apply_A, apply_B, filter_apply, Q0, Emid, r,
        tol=config.tol, max_loops=config.max_loops,
        aspect_ratio=config.aspect_ratio, rotation_deg=config.rotation_deg,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1), bilinear=bilinear,
        eig_method=eig_method)


def sparse_feast_general(A, B, Emid, r, M0, fpm=None, *, bilinear=False,
                         eig_method="callback", solver=None,
                         solver_tol=None, solver_maxiter=None,
                         solver_restart=30, Q0=None) -> FeastGeneralResult:
    """Shared sparse general/complex-symmetric driver
    (parity: feast_gcsrgv!/gcsrev! RCI-loop drivers, feast_sparse.jl:873-1006,
    complex-symmetric :509-711)."""
    fpm = _ensure_fpm(fpm)
    iopts = ifeast_solver_options(fpm) or {}
    solver = _solver_fn(solver or iopts.get("solver", "gmres"))
    solver_tol = solver_tol if solver_tol is not None else iopts.get("solver_tol")
    solver_maxiter = (solver_maxiter if solver_maxiter is not None
                      else iopts.get("solver_maxiter", 500))

    f64 = _is_double(_peek_dtype(A).dtype) and jax.config.jax_enable_x64
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
     precond) = _structured_forms(A_data, A_idx, B_data, B_idx, N,
                                  standard, cdtype)
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
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond)
    if config.mode == 2:
        # General contours: replace the half-contour doubling with the raw
        # full-contour quadrature sum (trace(P) = M for oblique projectors).
        Zg = np.asarray(contour.Zne, cdtype)
        Wg = np.asarray(contour.Wne, cdtype)
        res = _stochastic_estimate_result(
            lambda V: _sparse_filter_jit(
                A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
                Zg, 0.5 * Wg, np.asarray(V, cdtype), **gen_statics),
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
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond)
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
