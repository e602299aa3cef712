"""Functional FEAST subspace-iteration core for symmetric/Hermitian problems.

TPU-native re-design of the reference's RCI state machine ``feast_srci!`` /
``feast_hrci!`` (src/kernel/feast_kernel.jl:7-293, :397-644) and of the
self-contained Hermitian loop drivers (_feast_dense_complex_hermitian,
src/dense/feast_dense.jl:78-351):

* The Fortran "reverse communication" inversion-of-control exists because
  Fortran cannot take closures. Here the core is a pure function
  parameterized by ``apply_A``, ``apply_B`` and ``filter_apply`` callables.
* Dynamic quantities of the reference (found count M, shrinking active_dim)
  become static M0-sized buffers + masks.
* One body iteration == one FEAST refinement loop: filtered subspace,
  SVD orthonormalization with rank deflation (replaces pivoted-QR
  compression), Rayleigh-Ritz reduced pencil, robust reduced eigh,
  inside-interval masking, relative residuals, convergence on max inside
  residual (fpm[6]=1) or trace stagnation (fpm[6]=0).

Two driving modes share the same body:
  - ``feast_hermitian_core``: fused ``lax.while_loop`` (one compiled
    program for the whole refinement) — the default;
  - ``make_hermitian_body`` + ``init_hermitian_state`` +
    ``verify_spurious``: building blocks for a HOST-driven loop (one jitted
    body per refinement iteration, convergence checked on the host). Used
    where enormous single programs are hostile to the compiler (the axon
    remote-compile path times out on the fused program) and for early exit.

Correctness note vs the reference: the reference accumulates the *complex*
half-contour sum Q_proj = sum_e 2 W_e X_e and uses it directly
(feast_kernel.jl:143, feast_dense.jl:231). For a real eigenvalue lam the
effective scalar filter of that sum is g(lam) = sum_e 2 W_e/(z_e - lam),
whose imaginary part does NOT decay outside the interval (|g| ~ 0.2-0.6),
so subspace iteration contracts slowly (~0.5/loop) when eigenvalues crowd
the interval edges. Only Re(g) is the true rational filter. This framework
therefore mirrors the original Fortran FEAST instead: the real-symmetric
driver keeps a REAL basis and takes Re(sum 2 W_e X_e) (dfeast_srci's real
``work`` array), and the Hermitian driver adds the conjugate-node solves
(z_e^* B - A)^{-1} = ((z_e B - A)^{-1})^H obtained from the SAME factorization
(zfeast_hrci's ijob=20/21 adjoint solves) — restoring the fast filter at
equal factorization cost.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core.tools import (gram_accurate, inside_first_order, matmul_accurate,
                          orthonormalize, reduced_hermitian_gevp, residuals,
                          _f64_matmul_weak)

__all__ = ["HermitianState", "feast_hermitian_core", "make_hermitian_body",
           "make_rayleigh_ritz_update", "init_hermitian_state",
           "verify_spurious", "verify_spurious_from"]

# In-loop plausibility cut: Ritz pairs with O(1) residual are never counted
# toward convergence (noise-space pairs that land inside the interval);
# counterpart of fpm[38] spurious detection.
SPURIOUS_RES = 0.1


class HermitianState(NamedTuple):
    """Carried through the refinement loop (all arrays static-shape)."""

    loop: jax.Array          # i32: refinement loops completed
    Q: jax.Array             # (N, M0) current subspace (real or complex)
    lam: jax.Array           # (M0,) Ritz values (real), inside-first order
    res: jax.Array           # (M0,) relative residuals
    inside: jax.Array        # (M0,) bool validity mask
    epsout: jax.Array        # max residual over inside eigenpairs
    trace: jax.Array         # sum of inside Ritz values (trace criterion)
    converged: jax.Array     # bool
    inner_ok: jax.Array = True   # bool: every inner iterative shifted solve
    #   reached its tolerance (sticky AND across loops). Always True for
    #   direct-factorization drivers. Counterpart of the reference's
    #   inner-solve failure policy (feast_parallel.jl:266-273 degraded
    #   contributions + warning; feast_mpi.jl:508-511 success consensus).


# The spurious-verification filter pass only feeds the projector-norm test
# rho = ||P q|| > 0.25, so 2e-3 inner accuracy is ample (adaptive-tol
# drivers honor this; full-accuracy drivers ignore it). Drivers clamp
# incoming hints to [solver_tol, VERIFY_FILTER_TOL].
VERIFY_FILTER_TOL = 2e-3

# Refinement-loop hints are capped tighter: the filtered subspace feeds the
# rank-deflation cut (eps^0.25 ~ 1.2e-4 in f64, see make_rayleigh_ritz_update)
# and inner errors must stay a decade below it so noise cannot blur the
# kept/deflated separation. The KERNEL enforces this cap on the hints it
# emits for loop filter applications; the verify pass is exempt (it feeds
# only rho).
LOOP_TOL_CAP = 3e-5


def _filter_with_ok(filter_apply, Q, lam=None, tol_hint=None):
    """filter_apply may return Qproj or (Qproj, ok): iterative drivers
    report whether all inner solves converged; direct drivers return the
    bare array (ok=True).

    Ritz warm-start protocol: a filter_apply carrying ``takes_ritz=True``
    accepts the current Ritz values (``lam=``) and uses
    X0 = Q diag(1/(z - lam)) as the per-node inner-solve initial guess
    (FeastConfig.warm_start) — the iterative analog of the reference's LU
    factor cache across refinement loops (feast_dense.jl:147-213).

    Adaptive-tolerance protocol: ``takes_tol=True`` filters accept
    ``tol_hint=`` — the relative inner accuracy THIS application actually
    needs (FeastConfig.adaptive_inner_tol); the driver clamps it to
    [solver_tol, cap]."""
    kwargs = {}
    if lam is not None and getattr(filter_apply, "takes_ritz", False):
        kwargs["lam"] = lam
    if tol_hint is not None and getattr(filter_apply, "takes_tol", False):
        kwargs["tol_hint"] = tol_hint
    out = filter_apply(Q, **kwargs)
    if isinstance(out, tuple):
        Qproj, ok = out
        return Qproj, jnp.asarray(ok)
    return out, jnp.asarray(True)


def init_hermitian_state(Q0) -> HermitianState:
    M0 = Q0.shape[1]
    rdtype = jnp.real(jnp.zeros((), Q0.dtype)).dtype
    return HermitianState(
        loop=jnp.int32(0),
        Q=Q0,
        lam=jnp.zeros((M0,), rdtype),
        res=jnp.full((M0,), jnp.inf, rdtype),
        inside=jnp.zeros((M0,), bool),
        epsout=jnp.asarray(jnp.inf, rdtype),
        trace=jnp.asarray(jnp.nan, rdtype),   # NaN: first trace check never
        converged=jnp.asarray(False),         # passes (inf<=inf would)
        inner_ok=jnp.asarray(True),
    )


def make_hermitian_body(apply_A: Callable, apply_B: Callable,
                        filter_apply: Callable, Emin, Emax, *, tol: float,
                        convergence_criterion: int = 1,
                        rank_cut: float | None = None,
                        nsum: Callable | None = None) -> Callable:
    """One FEAST refinement iteration as a pure state -> state function."""
    update = make_rayleigh_ritz_update(
        apply_A, apply_B, Emin, Emax, tol=tol,
        convergence_criterion=convergence_criterion, rank_cut=rank_cut,
        nsum=nsum)

    def body(state: HermitianState) -> HermitianState:
        # inexact-FEAST inner target: the next loop's error is
        # ~ gamma*epsout + C*tau; tau = 0.1*epsout^2 tracks an order below
        # the worst case, capped at LOOP_TOL_CAP (epsout = inf on loop 0
        # -> exactly the cap)
        hint = jnp.minimum(0.1 * state.epsout * state.epsout, LOOP_TOL_CAP)
        Qproj, solves_ok = _filter_with_ok(filter_apply, state.Q, state.lam,
                                           hint)
        return update(state, Qproj, solves_ok)

    return body


def make_rayleigh_ritz_update(apply_A: Callable, apply_B: Callable,
                              Emin, Emax, *, tol: float,
                              convergence_criterion: int = 1,
                              rank_cut: float | None = None,
                              nsum: Callable | None = None) -> Callable:
    """The non-filter half of a refinement iteration:
    (state, Qproj, solves_ok) -> state. Split out so host-granular drivers
    (one device dispatch per contour node at very large N) can accumulate
    Qproj across separate dispatches and still share the exact
    orthonormalize/Rayleigh-Ritz/residual logic.

    nsum: reduction over the row (N) dimension when it is SHARDED over a
    mesh axis (the "model" axis, SURVEY.md section 5 scalability axis 3):
    a callable psum-ing its argument over that axis. With nsum set the
    orthonormalization switches from thin SVD to the Gram route (G = Q^H Q
    psum-reduced, eigh of the replicated M0 x M0 Gram, U = Q V s^-1) so
    every cross-row contraction is an explicit collective."""

    def update(state: HermitianState, Qproj, solves_ok) -> HermitianState:
        rdtype = jnp.real(jnp.zeros((), state.Q.dtype)).dtype
        cut = rank_cut
        if cut is None:
            # Rank-deflation threshold on the singular spectrum of the
            # filtered subspace. Counterpart of _feast_qr_compress!'s rank
            # tolerance (feast_aux.jl:101-131), but more aggressive
            # (eps^(1/4) vs sqrt(eps)): once the extra M0-M columns converge
            # onto duplicates of inside eigenvectors, their orthogonal
            # complement is numerical noise stuck around eps^(1/2..2/3) that
            # produces spurious in-interval Ritz pairs with O(1) residuals;
            # eps^(1/4) cuts cleanly above that floor while staying far below
            # genuine directions (s >~ |filter| ~ 1e-2).
            cut = float(jnp.finfo(rdtype).eps) ** 0.25
        # Deflated directions get Ritz value BIG, just outside the interval.
        # BIG must stay O(spectrum scale): a huge marker inflates ||S|| and
        # the reduced-eigh eigenvector error (~eps*||S||/gap) wrecks f32
        # convergence (observed 1e-2 stall on TPU with BIG ~ 1e3).
        BIG = (Emax + 2.0 * (Emax - Emin)).astype(rdtype)

        f64_weak = (_f64_matmul_weak()
                    and jnp.dtype(Qproj.dtype).itemsize >= 8)
        if rank_cut is None and f64_weak:
            # The Gram route squares singular values: a direction kept at
            # s = cut*s[0] has Gram eigenvalue cut^2*s[0]^2, which must stay
            # ABOVE the backend's eigh backward error (~5e-8*||G|| measured
            # on the chip's emulated f64) or the whitening amplifies eigh
            # noise — filter-rounding junk rich in outside-spectrum content
            # — into O(1) basis corruption (observed as alternating 1e-2
            # residual loops). cut = 2e-3 puts the kept Gram spectrum ~80x
            # above that floor; genuine FEAST directions carry s >~ 1e-2.
            cut = max(cut, 2e-3)
        if nsum is None and not f64_weak:
            U, s, _ = jnp.linalg.svd(Qproj, full_matrices=False)
        else:
            # Gram-based thin factorization. Two reasons to take it over
            # the thin SVD: (a) rows sharded over a model axis (nsum psums
            # the M0 x M0 Gram); (b) f64 on TPU, where the MXU's f32
            # products floor the SVD's orthogonality at ~3e-5 — the Gram
            # route with VPU-accurate contractions keeps full f64.
            if nsum is not None:
                G0 = nsum(Qproj.conj().T @ Qproj)
            else:
                G0 = gram_accurate(Qproj, Qproj)
            lamG, Vg = jnp.linalg.eigh(G0)
            s = jnp.sqrt(jnp.maximum(lamG[::-1], 0.0)).astype(rdtype)
            Vg = Vg[:, ::-1]
            s_safe = jnp.where(s > 0, s, 1.0)
            W = Vg / s_safe[None, :].astype(Vg.dtype)
            U = matmul_accurate(Qproj, W) if nsum is None else Qproj @ W
        m = (s >= cut * s[0]).astype(rdtype)
        Um = U * m[None, :]
        red = (lambda x: x) if nsum is None else nsum
        mm = (lambda X, Wm: matmul_accurate(X, Wm)) if nsum is None \
            else (lambda X, Wm: X @ Wm)
        gr = (lambda X, Y: gram_accurate(X, Y)) if nsum is None \
            else (lambda X, Y: X.conj().T @ Y)
        if nsum is not None or f64_weak:
            # Re-orthonormalization pass. The Gram route's single pass
            # leaves orthonormality error ~ (eigh backward error) / (kept
            # Gram eigenvalue) — measured ~1e-2 on the chip, flooring
            # residuals at 1e-2..1e-7 depending on the loop. A second pass
            # via eigh would re-introduce the chip's ~5e-8 eigh error
            # (measured floor 7.9e-8); instead use the Newton-Schulz
            # inverse square root X <- X (3I - G1 X^2)/2 -> G1^{-1/2},
            # which is MATMULS ONLY (f64-accurate on chip, ~3e-15) and
            # converges quadratically for ||I - G1|| < 1 (true after pass
            # one). Masked columns are zero with unit G1 diagonal, so they
            # stay zero and X acts as identity on them.
            G1 = red(gr(Um, Um)) + jnp.diag(1.0 - m).astype(Um.dtype)
            G1 = 0.5 * (G1 + G1.conj().T)
            eye = jnp.eye(G1.shape[0], dtype=G1.dtype)
            X = eye
            for _ in range(6):
                X = 0.5 * (X @ (3.0 * eye - G1 @ X @ X))
            Um = mm(Um, X) * m[None, :]
        # Deflation: masked directions are exactly decoupled with eigenpair
        # (BIG, e_i) and zero Ritz vector -> excluded by the inside mask.
        S = red(gr(Um, apply_A(Um))) \
            + BIG * jnp.diag(1.0 - m).astype(U.dtype)
        G = red(gr(Um, apply_B(Um))) + jnp.diag(1.0 - m).astype(U.dtype)
        lam, V = reduced_hermitian_gevp(S, G)
        q = mm(Um, V)
        nrm2 = red(jnp.real(jnp.einsum("nk,nk->k", jnp.conj(q), q)))
        nrm = jnp.sqrt(nrm2)
        q = q / jnp.where(nrm > 0, nrm, 1.0)[None, :]
        lam = lam.astype(rdtype)

        if nsum is None:
            res = residuals(apply_A, apply_B, lam, q)
        else:
            r = apply_A(q) - lam[None, :].astype(q.dtype) * apply_B(q)
            res = jnp.sqrt(nsum(jnp.real(
                jnp.einsum("nk,nk->k", jnp.conj(r), r)))) \
                / jnp.maximum(jnp.abs(lam), 1.0)
        inside = (lam >= Emin) & (lam <= Emax)
        order = inside_first_order(lam, inside)
        lam, q, res, inside = lam[order], q[:, order], res[order], inside[order]
        plausible = inside & (res < SPURIOUS_RES)
        M = jnp.sum(plausible)
        epsout = jnp.max(jnp.where(plausible, res, 0.0))
        trace = jnp.sum(jnp.where(plausible, lam, 0.0))
        if convergence_criterion == 1:
            conv = (epsout <= tol) & (M > 0)
        else:
            scale = jnp.maximum(jnp.abs(state.trace), 1.0)
            conv = (jnp.abs(trace - state.trace) <= tol * scale) & (M > 0)
        return HermitianState(
            loop=state.loop + 1, Q=q, lam=lam, res=res, inside=inside,
            epsout=epsout.astype(rdtype), trace=trace.astype(rdtype),
            converged=conv,
            inner_ok=jnp.asarray(state.inner_ok) & jnp.asarray(solves_ok),
        )

    return update


def verify_spurious(state: HermitianState, filter_apply: Callable
                    ) -> HermitianState:
    """Final spurious verification (one extra contour application): the
    spectral-projector norm rho_j = ||P q_j|| of a genuine inside eigenpair
    is ~|f(lam_j)| >= ~0.5, while noise/duplicate pairs carry mostly
    outside-spectrum mass (rho <= the filter's outside level). This is the
    filter-value test FEAST's stochastic estimator is built on, applied as
    an acceptance oracle. Kills e.g. Zolotarev-quadrature noise pairs whose
    equioscillating outside response never decays with distance."""
    Qproj, ok = _filter_with_ok(filter_apply, state.Q, state.lam,
                                jnp.asarray(VERIFY_FILTER_TOL,
                                            state.epsout.dtype))
    return verify_spurious_from(state, Qproj, ok)


def verify_spurious_from(state: HermitianState, Qproj, ok,
                         nsum: Callable | None = None) -> HermitianState:
    """verify_spurious with a caller-supplied filtered subspace (host-granular
    drivers accumulate Qproj across per-node dispatches; nsum reduces over
    a sharded row axis)."""
    rdtype = jnp.real(jnp.zeros((), state.Q.dtype)).dtype
    if nsum is None:
        rho = jnp.linalg.norm(Qproj, axis=0)
    else:
        rho = jnp.sqrt(nsum(jnp.real(
            jnp.einsum("nk,nk->k", jnp.conj(Qproj), Qproj))))
    genuine = state.inside & (rho > 0.25) & (state.res < SPURIOUS_RES)
    order = inside_first_order(state.lam, genuine)
    return state._replace(
        lam=state.lam[order], Q=state.Q[:, order], res=state.res[order],
        inside=genuine[order],
        epsout=jnp.max(jnp.where(genuine, state.res, 0.0)).astype(rdtype),
        inner_ok=jnp.asarray(state.inner_ok) & ok)


def feast_hermitian_core(
    apply_A: Callable,
    apply_B: Callable,
    filter_apply: Callable,
    Q0,
    Emin,
    Emax,
    *,
    tol: float,
    max_loops: int,
    convergence_criterion: int = 1,
    subspace_only: bool = False,
    rank_cut: float | None = None,
    nsum: Callable | None = None,
) -> HermitianState:
    """Fused-while_loop FEAST refinement; fully jittable.

    Args:
      apply_A / apply_B: (N, M0) -> (N, M0) operator applications, same dtype
        as Q0 (real for the real-symmetric path, complex for Hermitian).
      filter_apply: Q (N, M0) -> Q_proj (N, M0): the full spectral-projector
        quadrature sum_e 2 Re[W_e (z_e B - A)^{-1} B] Q in whichever form the
        driver realizes it. Factorization caching across refinement loops
        (fpm[10], factor_cache of feast_dense.jl:147-213) is the driver's
        choice: bake factors into this closure (cached) or refactor inside
        it (uncached).
      Q0: (N, M0) initial subspace.
      Emin/Emax: search interval (traced scalars are fine).
      tol: convergence tolerance (10^-fpm[3], dtype-floored).
      max_loops: fpm[4]; the body runs at most max_loops+1 times, matching
        the reference's ``for loop in 0:fpm[4]`` (feast_dense.jl:161).
      convergence_criterion: fpm[6] — 1 residual (default), 0 trace.
      subspace_only: fpm[14]=1 — return after the first filtered subspace.
    """
    init = init_hermitian_state(Q0)

    if subspace_only:
        Qproj, ok = _filter_with_ok(filter_apply, init.Q)
        if nsum is None:
            U, _, _ = orthonormalize(Qproj)
        else:
            G0 = nsum(Qproj.conj().T @ Qproj)
            lamG, Vg = jnp.linalg.eigh(G0)
            s = jnp.sqrt(jnp.maximum(lamG[::-1], 0.0))
            Vg = Vg[:, ::-1]
            U = Qproj @ (Vg / jnp.where(s > 0, s, 1.0)[None, :].astype(Vg.dtype))
        return init._replace(Q=U, loop=jnp.int32(1), inner_ok=ok)

    body = make_hermitian_body(apply_A, apply_B, filter_apply, Emin, Emax,
                               tol=tol,
                               convergence_criterion=convergence_criterion,
                               rank_cut=rank_cut, nsum=nsum)

    def cond(state: HermitianState):
        return (~state.converged) & (state.loop < max_loops + 1)

    final = jax.lax.while_loop(cond, body, init)
    Qproj, ok = _filter_with_ok(filter_apply, final.Q, final.lam,
                                jnp.asarray(VERIFY_FILTER_TOL,
                                            final.epsout.dtype))
    return verify_spurious_from(final, Qproj, ok, nsum=nsum)
