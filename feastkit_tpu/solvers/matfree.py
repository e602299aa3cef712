"""Matrix-free FEAST: operator protocol + interval/general drivers.

Counterpart of the reference's ``src/interfaces/feast_matfree.jl``: the
``MatrixFreeOperator``/``MatrixVecFunction``/``LinearOperator`` protocol
(:13-134), the matrix-free RCI drivers (feast_matfree_srci!/grci!,
:157-380), the high-level matfree ``feast``/``feast_general`` (:442-509),
and the iterative-solver factory semantics (create_iterative_solver
:668-739, including the explicit :cg rejection).

Operators here are jax-traceable callables on (N, K) blocks — the TPU-native
analog of mul! callbacks. Users may instead supply their own shifted solver
``solve_shifted(z, RHS) -> X`` (the RCI linear_solver(Y, z, X) contract,
feast_matfree.jl:157-263).
"""
from __future__ import annotations

import functools
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..core.contour import feast_contour, feast_gcontour
from ..core.parameters import FeastConfig, _ensure_fpm
from ..core.tools import seeded_subspace
from ..core.types import FeastError, FeastGeneralResult, FeastResult, _trim
from ..kernel.general import feast_general_core
from ..kernel.hermitian import VERIFY_FILTER_TOL, feast_hermitian_core
from ..ops.gmres import bicgstab_block, gmres_block
from ..utils.cio import cjit, fetch

__all__ = [
    "polynomial_companion_operators", "feast_polynomial_matvec",
    "LinearOperator", "MatrixVecFunction", "feast_matvec",
    "feast_matvec_general", "create_iterative_solver",
    "operator_spectrum_bounds"]


class LinearOperator:
    """Matrix-free operator over (N, K) blocks.

    Parity with the reference protocol (feast_matfree.jl:13-134): a matvec,
    a shape, a dtype, and structure flags. ``matvec`` must be jax-traceable
    and accept a 2-D block (columns = vectors). ``rmatvec`` (adjoint) is
    optional; for symmetric/hermitian operators it defaults to matvec.
    """

    def __init__(self, matvec: Callable, shape, dtype, *, rmatvec=None,
                 symmetric: bool = False, hermitian: bool = False,
                 posdef: bool = False):
        self._matvec = matvec
        self.shape = tuple(shape)
        self.dtype = jnp.dtype(dtype)
        self.symmetric = bool(symmetric)
        self.hermitian = bool(hermitian)
        self.posdef = bool(posdef)
        if rmatvec is None and (symmetric or hermitian):
            rmatvec = matvec
        self._rmatvec = rmatvec

    def __call__(self, X):
        squeeze = X.ndim == 1
        Y = self._matvec(X[:, None] if squeeze else X)
        return Y[:, 0] if squeeze else Y

    __matmul__ = __call__

    def adjoint(self, X):
        if self._rmatvec is None:
            raise ValueError("This LinearOperator has no adjoint (rmatvec)")
        squeeze = X.ndim == 1
        Y = self._rmatvec(X[:, None] if squeeze else X)
        return Y[:, 0] if squeeze else Y

    @staticmethod
    def from_matrix(A, **flags):
        A = jnp.asarray(A)
        return LinearOperator(lambda X: A @ X, A.shape, A.dtype,
                              rmatvec=lambda X: A.conj().T @ X, **flags)


def MatrixVecFunction(matvec, shape, dtype=jnp.float64, *, issymmetric=False,
                      ishermitian=False, isposdef=False) -> LinearOperator:
    """Constructor-name parity with MatrixVecFunction{T,F}
    (feast_matfree.jl:24-56)."""
    return LinearOperator(matvec, shape, dtype, symmetric=issymmetric,
                          hermitian=ishermitian, posdef=isposdef)


def create_iterative_solver(A_op, B_op=None, method="gmres", *, tol=1e-12,
                            restart=30, maxiter=500, flag_tol=None):
    """Factory: ``solve_shifted(z, RHS) -> X`` solving (z B - A) X = RHS.

    Parity with create_iterative_solver (feast_matfree.jl:668-739),
    including the :cg rejection (shifted systems are not HPD for complex z).
    """
    if str(method).lstrip(":") == "cg":
        raise ValueError(
            "CG is not valid for FEAST shifted systems (z B - A is never "
            "Hermitian positive definite for complex z); use gmres/bicgstab")
    method = str(method).lstrip(":")
    if method not in ("gmres", "bicgstab"):
        raise ValueError(f"Unknown iterative solver {method!r}")

    def solve_shifted_guess(z, RHS, X0=None, tol_hint=None):
        """(X, all_converged) with optional Ritz warm start X0 (accepted
        per column only where it beats the zero iterate) and optional
        adaptive tolerance hint (clamped to [tol, VERIFY_FILTER_TOL]; the
        tighter refinement-loop cap is enforced by the kernel on the hints
        it emits) — the matfree analog of the sparse drivers'
        warm_start/adaptive_inner_tol."""
        def op(X):
            BX = X if B_op is None else B_op(X)
            return z * BX - A_op(X)
        t = tol if tol_hint is None else jnp.clip(
            jnp.asarray(tol_hint), float(tol),
            max(float(tol), VERIFY_FILTER_TOL))
        x0 = None
        if X0 is not None:
            X0 = X0.astype(RHS.dtype)
            R0 = RHS - op(X0)
            n0 = jnp.real(jnp.einsum("nk,nk->k", jnp.conj(R0), R0))
            nb = jnp.real(jnp.einsum("nk,nk->k", jnp.conj(RHS), RHS))
            x0 = jnp.where((n0 < nb)[None, :], X0, 0)
        if method == "gmres":
            X, info = gmres_block(op, RHS, tol=t, restart=restart,
                                  maxiter=maxiter, x0=x0, flag_tol=flag_tol)
        else:
            X, info = bicgstab_block(op, RHS, tol=t, maxiter=maxiter,
                                     x0=x0, flag_tol=flag_tol)
        return X, jnp.all(info.converged)

    def solve_shifted_info(z, RHS):
        return solve_shifted_guess(z, RHS)

    def solve_shifted(z, RHS):
        return solve_shifted_info(z, RHS)[0]

    solve_shifted.with_info = solve_shifted_info
    solve_shifted.with_guess = solve_shifted_guess
    return solve_shifted


def _as_op(A, dtype=None):
    if isinstance(A, LinearOperator):
        return A
    if callable(A):
        raise ValueError(
            "Wrap bare callables in LinearOperator(matvec, shape, dtype)")
    return LinearOperator.from_matrix(A if dtype is None
                                      else jnp.asarray(A, dtype))


def operator_spectrum_bounds(A_op, N, dtype, *, steps=192, pad=1e-3):
    """Spectrum enclosure [lo, hi] of a symmetric/Hermitian matrix-free
    operator by fixed-step device Lanczos (deterministic start vector,
    full tridiagonal eigrange + residual-based Ostrowski pad). The pad
    errs OUTWARD: a polynomial filter only needs an enclosure — an
    overestimate costs a slightly higher degree, an underestimate
    diverges the recurrence."""
    rdt = jnp.float64 if jnp.issubdtype(jnp.dtype(dtype), jnp.floating) \
        and jnp.dtype(dtype).itemsize >= 8 else jnp.float32
    v = jnp.asarray(np.cos(0.7 * np.arange(N)) + 0.5, rdt)
    v = v / jnp.linalg.norm(v)
    steps = int(min(steps, N))

    @jax.jit
    def lanczos(v):
        def body(carry, _):
            v_prev, v_cur, beta = carry
            w = A_op(v_cur[:, None])[:, 0].astype(rdt) - beta * v_prev
            alpha = jnp.vdot(v_cur, w).real
            w = w - alpha * v_cur
            # one full re-orthogonalization step against the 2 carried
            # vectors (enough for EDGE estimates; interior accuracy is
            # not needed here)
            w = w - jnp.vdot(v_cur, w) * v_cur - jnp.vdot(v_prev, w) * v_prev
            beta_n = jnp.linalg.norm(w)
            v_next = w / jnp.where(beta_n > 0, beta_n, 1.0)
            return (v_cur, v_next, beta_n), (alpha, beta_n)
        _, (al, be) = jax.lax.scan(body, (jnp.zeros_like(v), v,
                                          jnp.asarray(0.0, rdt)),
                                   None, length=steps)
        return al, be

    al, be = lanczos(v)
    al = np.asarray(fetch(al), np.float64)
    be = np.asarray(fetch(be), np.float64)
    import scipy.linalg as sla
    T = np.diag(al) + np.diag(be[:-1], 1) + np.diag(be[:-1], -1)
    w, V = sla.eigh(T)
    # Lanczos edges converge from inside; the PER-RITZ-VALUE residual
    # |beta_m * v_T[last, i]| bounds each edge's miss (the raw last beta
    # stays O(1) without full reorthogonalization and would inflate the
    # enclosure enough to blow the filter degree)
    r_lo = float(abs(be[-1] * V[-1, 0]))
    r_hi = float(abs(be[-1] * V[-1, -1]))
    lo_e, hi_e = float(w[0]), float(w[-1])
    span = max(hi_e - lo_e, 1e-30)
    return lo_e - r_lo - pad * span, hi_e + r_hi + pad * span


def feast_matvec(A_op, B_op, interval, M0, fpm=None, *, solver="gmres",
                 solver_tol=None, solver_maxiter=500, solver_restart=30,
                 solve_shifted=None, hermitian=None, Q0=None,
                 bounds=None) -> FeastResult:
    """Matrix-free symmetric/Hermitian FEAST on [Emin, Emax].

    Parity surface: feast_sparse_matvec!/feast(A_op, B_op, interval)
    (feast_sparse.jl:1276-1496, feast_matfree.jl:442-481). The reference's
    MatrixFreeShiftedOperator real-callback-over-complex splitting
    (feast_sparse.jl:36-91) is unnecessary here: real-valued jax callables
    trace fine with complex inputs via linearity of the promoted ops, and we
    promote the basis explicitly instead.

    ``solver="cheb"`` / ``solver="contour_poly"``: SOLVE-FREE filters for
    STANDARD problems (B=None) — the operator enters only through forward
    applications T_k(Â)Q (the CheFSI regime extended to the operator
    protocol; no reference counterpart — feast_matfree.jl is contour+
    user-solver only). ``bounds=(lo, hi)``: spectrum enclosure of A; when
    omitted it is estimated by fixed-step device Lanczos on the operator
    (``operator_spectrum_bounds``) — supply it when the operator's edges
    are known (it must ENCLOSE the spectrum: the recurrence diverges on
    anything outside).
    """
    fpm = _ensure_fpm(fpm)
    A_op = _as_op(A_op)
    standard = B_op is None
    if not standard:
        B_op = _as_op(B_op)
    N = A_op.shape[0]
    Emin, Emax = float(interval[0]), float(interval[1])
    if not Emax > Emin:
        raise ValueError(f"Emin={Emin} must be < Emax={Emax}")
    M0 = int(M0)

    is_complex = jnp.issubdtype(A_op.dtype, jnp.complexfloating)
    if hermitian is None:
        hermitian = A_op.hermitian or is_complex
    from .sparse import _is_double
    f64 = _is_double(A_op.dtype) and jax.config.jax_enable_x64
    pair_f64 = False
    if f64 and not (solver in ("cheb", ":cheb", "contour_poly",
                               ":contour_poly") and not hermitian):
        # c128 cannot compile on XLA:TPU (ops/splitlu.py). The real-f64
        # CheFSI path is c128-free and stays. REAL operators on the
        # Krylov contour engine take the pair-carried realization below
        # (c64 GMRES inner + f64 (re, im) refinement — the TPU-native
        # analog of the reference's MatrixFreeShiftedOperator
        # real-callback split, feast_sparse.jl:36-91). Complex-Hermitian
        # operators and user-supplied solve_shifted callables demote with
        # a warning — a callable's traced dtype is the user's contract
        # and cannot be re-wrapped into the real embedding.
        from ..ops.splitlu import f64_lu_unavailable, demote_f64_general
        if f64_lu_unavailable():
            if not hermitian and not is_complex and solve_shifted is None:
                pair_f64 = True
            else:
                demote_f64_general(
                    "feast_matvec (matrix-free contour engine)")
                f64 = False
    rdtype = jnp.float64 if f64 else jnp.float32
    cdtype = jnp.complex128 if f64 else jnp.complex64
    work_dtype = cdtype if hermitian else rdtype

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    if solver_tol is None:
        solver_tol = max(config.tol * 0.1, 10 * float(jnp.finfo(rdtype).eps))
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_contour(Emin, Emax, fpm)
    rdtype_np = np.float32 if np.dtype(str(jnp.dtype(cdtype))) == np.complex64 else np.float64
    cdtype_np = np.complex64 if rdtype_np == np.float32 else np.complex128
    Zne = np.asarray(contour.Zne, cdtype_np)
    Wne = np.asarray(contour.Wne, cdtype_np)
    if hermitian:
        Zall = np.concatenate([Zne, np.conj(Zne)])
        Wall = np.concatenate([Wne, np.conj(Wne)])
    else:
        Zall, Wall = Zne, 2.0 * Wne

    apply_A = lambda X: A_op(X)
    apply_B = (lambda X: X) if standard else (lambda X: B_op(X))

    if solver in ("cheb", ":cheb", "contour_poly", ":contour_poly"):
        if not standard:
            raise ValueError(
                "matrix-free polynomial filters require a standard "
                "problem (B=None); generalized operators need the "
                "contour solvers (gmres/bicgstab)")
        if solve_shifted is not None:
            raise ValueError("solve_shifted and a polynomial solver are "
                             "mutually exclusive")
        from ..ops.chebfilter import (build_cheb_filter_coeffs,
                                      rational_filter_cheb_coeffs,
                                      make_cheb_filter)
        wd0 = np.complex64 if str(jnp.dtype(work_dtype)) == 'complex64' \
            else (np.complex128 if str(jnp.dtype(work_dtype)) == 'complex128'
                  else (np.float32 if str(jnp.dtype(work_dtype)) == 'float32'
                        else np.float64))
        lo, hi = (float(bounds[0]), float(bounds[1])) if bounds is not None \
            else operator_spectrum_bounds(A_op, N, wd0)
        if solver in ("contour_poly", ":contour_poly"):
            coeffs, cinfo = rational_filter_cheb_coeffs(
                contour.Zne, contour.Wne, lo, hi, Emin, Emax)
        else:
            coeffs, cinfo = build_cheb_filter_coeffs(lo, hi, Emin, Emax)
        if cinfo["outside_at_1w"] > 0.25 * cinfo.get("inside_min", 1.0):
            raise ValueError(
                f"the polynomial filter cannot resolve this interval on "
                f"the enclosure [{lo:.3g}, {hi:.3g}] (outside level "
                f"{cinfo['outside_at_1w']:.2g} one width out) — pass a "
                f"tighter bounds=(lo, hi) or use an iterative solver")
        if config.print_level >= 1:
            kindname = ("contour-poly" if cinfo.get("kind") == "rational"
                        else "cheb")
            print(f"feast matvec {kindname} filter: "
                  f"degree={cinfo['degree']} enclosure=[{lo:.3g},{hi:.3g}] "
                  f"outside@1w={cinfo['outside_at_1w']:.2e}", flush=True)
        from ..core.tools import initial_subspace as _isub
        Q0p = np.asarray(_isub(fpm, Q0, N, M0, wd0), wd0)
        coeffs_w = np.asarray(coeffs, np.float32 if wd0 in (np.float32,
                              np.complex64) else np.float64)
        filt = make_cheb_filter(apply_A, lo, hi, coeffs_w)
        if config.mode == 2:
            from .sparse import _stochastic_estimate_result
            return _stochastic_estimate_result(
                cjit(filt), N, fpm, np.dtype(wd0))

        @cjit
        def run_poly(Q0, Emin, Emax):
            def filter_apply(Q, lam=None, tol_hint=None):
                return filt(Q), jnp.asarray(True)
            return feast_hermitian_core(
                apply_A, apply_B, filter_apply, Q0, Emin, Emax,
                tol=config.tol, max_loops=config.max_loops,
                convergence_criterion=config.convergence_criterion,
                subspace_only=(config.mode == 1))

        state = run_poly(Q0p, rdtype_np(Emin), rdtype_np(Emax))
        info = FeastError.SUCCESS if bool(fetch(state.converged)) \
            else FeastError.NO_CONVERGENCE
        return _trim(FeastResult, fetch(state.lam), fetch(state.Q),
                     fetch(state.res), fetch(state.inside),
                     int(info), float(fetch(state.epsout)),
                     int(fetch(state.loop)) - 1,
                     inner_ok=bool(fetch(state.inner_ok)))

    if pair_f64:
        # c128-free f64 contour engine for REAL operators: per node, a c64
        # GMRES/BiCGStab inner solve wrapped in f64 (re, im) pair-carried
        # iterative refinement (ops/splitlu.pair_refined_solve) — each
        # sweep contracts by the inner solve's relative accuracy (~1e-7),
        # so 2-3 sweeps reach f64 backward error with the user's REAL
        # callables applied twice per sweep. Reference parity: the
        # real-callback complex-solve split of MatrixFreeShiftedOperator
        # (feast_sparse.jl:36-91) at full double precision.
        from ..ops.splitlu import pair_refined_solve
        from ..core.tools import initial_subspace
        method = str(solver).lstrip(":")
        if method not in ("gmres", "bicgstab"):
            raise ValueError(f"Unknown iterative solver {solver!r}")
        sig = np.ascontiguousarray(np.real(Zne))
        tau = np.ascontiguousarray(np.imag(Zne))
        W2r = np.ascontiguousarray(2.0 * np.real(Wne))
        W2i = np.ascontiguousarray(2.0 * np.imag(Wne))
        # per-sweep target for the c64 inner solve. Measured on the
        # tridiagonal fixture: restart-30 c64 GMRES STALLS at ~1e-5 while
        # restart-64 reaches the c64 Arnoldi floor (~5e-7) reliably — the
        # pair path widens the restart memory and targets 1e-6; two to
        # three refinement sweeps then reach f64 backward error
        inner_tol = 1e-6
        pair_restart = max(int(solver_restart), 64)
        # attainable-accuracy floor, same convention as the f32 sqrt(eps)
        # tolerance floor: the refinement's per-sweep contraction is the
        # c64 inner solve's achieved accuracy, and at the contour nodes
        # closest to the real axis restarted c64 GMRES attains ~1e-6
        # rather than its target — measured fixture floor 2.3e-8; 1e-7
        # keeps an order of margin. Tighter requests report honestly
        # (info=5 + the stalled-inner warning).
        pair_tol = max(float(config.tol), 1e-7)

        def _pair_solve_all(Fr):
            Fi = jnp.zeros_like(Fr)

            def one(st):
                s, t = st

                def apply_shift(Xr, Xi):
                    BXr = Xr if standard else B_op(Xr)
                    BXi = Xi if standard else B_op(Xi)
                    return (s * BXr - A_op(Xr) - t * BXi,
                            s * BXi - A_op(Xi) + t * BXr)

                def op(X):
                    # the user's operator is FLOAT64 data — applying it to
                    # a c64 block would promote to c128 (the HLO class
                    # this path exists to avoid). Apply to the real and
                    # imaginary parts separately (the pair identity) and
                    # reassemble in c64 for the Krylov internals.
                    Rr, Ri = apply_shift(jnp.real(X).astype(jnp.float64),
                                         jnp.imag(X).astype(jnp.float64))
                    return jax.lax.complex(Rr.astype(jnp.float32),
                                           Ri.astype(jnp.float32))

                def solve_c64(Z):
                    if method == "gmres":
                        X, _ = gmres_block(op, Z, tol=inner_tol,
                                           restart=pair_restart,
                                           maxiter=solver_maxiter)
                    else:
                        X, _ = bicgstab_block(op, Z, tol=inner_tol,
                                              maxiter=solver_maxiter)
                    return X

                return pair_refined_solve(solve_c64, apply_shift, Fr, Fi)

            Xr, Xi, ok = jax.lax.map(one, (sig_j, tau_j))
            return Xr, Xi, jnp.all(ok)

        sig_j = jnp.asarray(sig)
        tau_j = jnp.asarray(tau)

        if config.mode == 2:
            from .sparse import _stochastic_estimate_result

            @cjit
            def filt_pair(V):
                Xr, Xi, _ = _pair_solve_all(apply_B(V))
                return (jnp.einsum("e,enm->nm", jnp.asarray(W2r), Xr)
                        - jnp.einsum("e,enm->nm", jnp.asarray(W2i), Xi))

            return _stochastic_estimate_result(
                lambda V: filt_pair(jnp.asarray(V, jnp.float64)),
                N, fpm, np.float64)

        Q0p = initial_subspace(fpm, Q0, N, M0, np.float64)

        @cjit
        def run_pair(Q0, Emin, Emax):
            def filter_apply(Q):
                Xr, Xi, ok = _pair_solve_all(apply_B(Q))
                return (jnp.einsum("e,enm->nm", jnp.asarray(W2r), Xr)
                        - jnp.einsum("e,enm->nm", jnp.asarray(W2i), Xi)), ok

            return feast_hermitian_core(
                apply_A, apply_B, filter_apply, Q0, Emin, Emax,
                tol=pair_tol, max_loops=config.max_loops,
                convergence_criterion=config.convergence_criterion,
                subspace_only=(config.mode == 1))

        state = run_pair(Q0p, np.float64(Emin), np.float64(Emax))
        info = FeastError.SUCCESS if bool(fetch(state.converged)) \
            else FeastError.NO_CONVERGENCE
        return _trim(FeastResult, fetch(state.lam), fetch(state.Q),
                     fetch(state.res), fetch(state.inside),
                     int(info), float(fetch(state.epsout)),
                     int(fetch(state.loop)) - 1,
                     inner_ok=bool(fetch(state.inner_ok)))

    if solve_shifted is None:
        solve_shifted = create_iterative_solver(
            A_op, None if standard else B_op, solver, tol=solver_tol,
            restart=solver_restart, maxiter=solver_maxiter,
            flag_tol=config.tol)

    from ..core.tools import initial_subspace
    wd = np.complex64 if str(jnp.dtype(work_dtype)) == 'complex64' else (
        np.complex128 if str(jnp.dtype(work_dtype)) == 'complex128' else (
            np.float32 if str(jnp.dtype(work_dtype)) == 'float32' else np.float64))
    Q0 = initial_subspace(fpm, Q0, N, M0, wd)

    solve_info = getattr(solve_shifted, "with_info",
                         lambda z, RHS: (solve_shifted(z, RHS), jnp.asarray(True)))

    if config.mode == 2:
        from .sparse import _stochastic_estimate_result

        @cjit
        def filt(V, Zall, Wall):
            X, _ = jax.lax.map(lambda z: solve_info(z, apply_B(V).astype(Zall.dtype)
                                                     if not hermitian else apply_B(V)),
                               Zall)
            acc = jnp.einsum("e,enm->nm", Wall, X)
            return acc if hermitian else jnp.real(acc).astype(V.dtype)

        wd = np.dtype(str(jnp.dtype(work_dtype)))
        return _stochastic_estimate_result(
            lambda V: filt(V, Zall, Wall), N, fpm, wd)

    solve_guess = getattr(solve_shifted, "with_guess", None)
    rich = (solve_guess is not None
            and (bool(config.warm_start) or bool(config.adaptive_inner_tol)))

    @cjit
    def run(Q0, Emin, Emax, Zall, Wall):
        def solve_nodes(rhs, Q=None, lam=None, tol_hint=None):
            if not rich:
                return jax.lax.map(lambda z: solve_info(z, rhs), Zall)
            hint = tol_hint if bool(config.adaptive_inner_tol) else None

            def one(z):
                X0 = None
                if lam is not None and bool(config.warm_start):
                    X0 = Q.astype(rhs.dtype) \
                        * (1.0 / (z - lam.astype(rhs.dtype)))[None, :]
                return solve_guess(z, rhs, X0, hint)
            return jax.lax.map(one, Zall)

        if hermitian:
            def filter_apply(Q, lam=None, tol_hint=None):
                X, ok = solve_nodes(apply_B(Q), Q, lam, tol_hint)
                return jnp.einsum("e,enm->nm", Wall, X), jnp.all(ok)
        else:
            def filter_apply(Q, lam=None, tol_hint=None):
                X, ok = solve_nodes(apply_B(Q).astype(Zall.dtype),
                                    Q, lam, tol_hint)
                return (jnp.real(jnp.einsum("e,enm->nm", Wall, X)).astype(Q.dtype),
                        jnp.all(ok))

        filter_apply.takes_ritz = rich and bool(config.warm_start)
        filter_apply.takes_tol = rich and bool(config.adaptive_inner_tol)
        return feast_hermitian_core(
            apply_A, apply_B, filter_apply, Q0, Emin, Emax,
            tol=config.tol, max_loops=config.max_loops,
            convergence_criterion=config.convergence_criterion,
            subspace_only=(config.mode == 1))

    state = run(np.asarray(Q0, np.dtype(str(jnp.dtype(work_dtype)))),
                rdtype_np(Emin), rdtype_np(Emax), Zall, Wall)
    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)),
                 int(fetch(state.loop)) - 1,
                 inner_ok=bool(fetch(state.inner_ok)))


def polynomial_companion_operators(coeff_ops):
    """Matrix-free first-companion linearization of a polynomial pencil.

    Parity: _matrix_free_polynomial_companion_operators
    (feast_matfree.jl:511-647). Given operators [A_0, ..., A_d] for
    P(lam) = sum lam^k A_k, build (A_op, B_op) of size d*N with

        A = [[0,    I,    ...      ],        B = diag(I, ..., I, A_d)
             [ ...             I   ],
             [-A_0, -A_1, ..., -A_{d-1}]]

    so A y = lam B y reproduces P(lam) x = 0 with y = (x, lam x, ...,
    lam^{d-1} x) — the companion matrices are NEVER materialized; each
    matvec costs d coefficient applications."""
    ops = [_as_op(c) for c in coeff_ops]
    d = len(ops) - 1
    if d < 1:
        raise ValueError("polynomial needs at least degree 1 (two coefficients)")
    N = ops[0].shape[0]
    dtype = ops[0].dtype

    def A_mv(Y):
        # Y: (d*N, K) blocks y_0..y_{d-1}
        blocks = [Y[k * N:(k + 1) * N] for k in range(d)]
        out_top = [blocks[k + 1] for k in range(d - 1)]
        last = -ops[0](blocks[0])
        for k in range(1, d):
            last = last - ops[k](blocks[k])
        return jnp.concatenate(out_top + [last], axis=0)

    def B_mv(Y):
        blocks = [Y[k * N:(k + 1) * N] for k in range(d)]
        return jnp.concatenate(blocks[:-1] + [ops[d](blocks[-1])], axis=0)

    A_op = LinearOperator(A_mv, (d * N, d * N), dtype)
    B_op = LinearOperator(B_mv, (d * N, d * N), dtype)
    return A_op, B_op


def feast_polynomial_matvec(coeff_ops, Emid, r, M0, fpm=None, **kw):
    """Matrix-free polynomial FEAST: companion linearization by OPERATORS
    (no densification), solved by the matrix-free general driver; the
    returned eigenvectors are the leading N rows of the companion vectors,
    renormalized (the reference's matfree feast_polynomial,
    feast_matfree.jl:511-647)."""
    ops = [_as_op(c) for c in coeff_ops]
    N = ops[0].shape[0]
    A_op, B_op = polynomial_companion_operators(coeff_ops)
    res = feast_matvec_general(A_op, B_op, Emid, r, M0, fpm, **kw)
    import dataclasses
    q = np.asarray(res.q)[:N]
    nrm = np.linalg.norm(q, axis=0)
    q = q / np.where(nrm > 0, nrm, 1.0)[None, :]
    return dataclasses.replace(res, q=q)


def feast_matvec_general(A_op, B_op, Emid, r, M0, fpm=None, *,
                         solver="gmres", solver_tol=None, solver_maxiter=500,
                         solver_restart=30, solve_shifted=None,
                         bilinear=False, eig_method=None, Q0=None
                         ) -> FeastGeneralResult:
    """Matrix-free general FEAST inside the ellipse (Emid, r)
    (parity: feast_matfree_grci! + feast_general(A_op, ...),
    feast_matfree.jl:275-380, :488-509)."""
    fpm = _ensure_fpm(fpm)
    if eig_method is None:
        # host zgeev callbacks are unsupported through the axon tunnel
        from ..utils import cio as _cio
        eig_method = "qr" if _cio.complex_io_required() else "callback"
    A_op = _as_op(A_op)
    standard = B_op is None
    if not standard:
        B_op = _as_op(B_op)
    N = A_op.shape[0]
    from .sparse import _is_double
    f64 = _is_double(A_op.dtype) and jax.config.jax_enable_x64
    rdtype = jnp.float64 if f64 else jnp.float32
    cdtype = jnp.complex128 if f64 else jnp.complex64
    config = FeastConfig.from_fpm(fpm, dtype=cdtype, full_contour=True)
    if solver_tol is None:
        solver_tol = max(config.tol * 0.1, 10 * float(jnp.finfo(rdtype).eps))
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_gcontour(complex(Emid), float(r), fpm)
    rdtype_np = np.float32 if str(jnp.dtype(rdtype)) == 'float32' else np.float64
    cdtype_np = np.complex64 if rdtype_np == np.float32 else np.complex128
    Zne = np.asarray(contour.Zne, cdtype_np)
    Wne = np.asarray(contour.Wne, cdtype_np)
    if solve_shifted is None:
        solve_shifted = create_iterative_solver(
            A_op, None if standard else B_op, solver, tol=solver_tol,
            restart=solver_restart, maxiter=solver_maxiter,
            flag_tol=config.tol)

    apply_A = lambda X: A_op(X)
    apply_B = (lambda X: X) if standard else (lambda X: B_op(X))

    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, cdtype_np, general=True)

    solve_info = getattr(solve_shifted, "with_info",
                         lambda z, RHS: (solve_shifted(z, RHS), jnp.asarray(True)))

    solve_guess = getattr(solve_shifted, "with_guess", None)
    rich = (solve_guess is not None
            and (bool(config.warm_start) or bool(config.adaptive_inner_tol)))

    @cjit
    def run(Q0, Emid, r, Zne, Wne):
        def filter_apply(Q, lam=None, tol_hint=None):
            rhs = apply_B(Q)
            if not rich:
                X, ok = jax.lax.map(lambda z: solve_info(z, rhs), Zne)
            else:
                hint = tol_hint if bool(config.adaptive_inner_tol) else None

                def one(z):
                    X0 = None
                    if lam is not None and bool(config.warm_start):
                        X0 = Q * (1.0 / (z - lam))[None, :]
                    return solve_guess(z, rhs, X0, hint)
                X, ok = jax.lax.map(one, Zne)
            return jnp.einsum("e,enm->nm", Wne, X), jnp.all(ok)

        filter_apply.takes_ritz = rich and bool(config.warm_start)
        filter_apply.takes_tol = rich and bool(config.adaptive_inner_tol)
        return feast_general_core(
            apply_A, apply_B, filter_apply, Q0, Emid, r,
            tol=config.tol, max_loops=config.max_loops,
            aspect_ratio=config.aspect_ratio,
            rotation_deg=config.rotation_deg,
            convergence_criterion=config.convergence_criterion,
            subspace_only=(config.mode == 1), bilinear=bilinear,
            eig_method=eig_method)

    state = run(Q0, np.asarray(complex(Emid), cdtype_np)[()],
                rdtype_np(float(r)), Zne, Wne)
    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastGeneralResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)),
                 int(fetch(state.loop)) - 1,
                 inner_ok=bool(fetch(state.inner_ok)))
