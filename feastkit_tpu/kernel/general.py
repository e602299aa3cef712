"""Functional FEAST core for general (non-Hermitian) and complex-symmetric
problems: full elliptical contour, complex Ritz values.

TPU-native re-design of ``feast_grci!`` (src/kernel/feast_kernel.jl:646-962)
and the complex-symmetric loop drivers (_feast_dense_complex_symmetric,
feast_dense.jl:1018-1285):

* full-contour quadrature, subspace-only accumulation q += W_e X_e
  (feast_kernel.jl:760-768) — no conjugate doubling;
* Rayleigh-Ritz on the SVD-orthonormalized filtered basis with either the
  adjoint pairing S = U^H A U (general, feast_kernel.jl:787-812) or the
  transpose-bilinear pairing S = U^T A U (complex-symmetric,
  feast_dense.jl:1183-1186);
* reduced general pencil solved by ops.eig.generalized_eig (host zgeev
  callback or native on-device shifted-QR Schur);
* rotated-ellipse membership (feast_inside_gcontour, feast_tools.jl:623-650)
  with the same deflation/spurious machinery as the Hermitian core.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.tools import inside_first_order
from ..ops.eig import generalized_eig
from .hermitian import _filter_with_ok, LOOP_TOL_CAP, VERIFY_FILTER_TOL

__all__ = ["GeneralState", "feast_general_core", "make_general_body",
           "init_general_state", "verify_spurious_general"]


class GeneralState(NamedTuple):
    loop: jax.Array
    Q: jax.Array             # (N, M0) complex subspace
    lam: jax.Array           # (M0,) complex Ritz values
    res: jax.Array           # (M0,) real residuals
    inside: jax.Array        # (M0,) bool
    epsout: jax.Array
    trace: jax.Array         # complex
    converged: jax.Array
    inner_ok: jax.Array = True   # see kernel/hermitian.HermitianState


def feast_general_core(
    apply_A: Callable,
    apply_B: Callable,
    filter_apply: Callable,
    Q0,
    Emid,
    r,
    *,
    tol: float,
    max_loops: int,
    aspect_ratio: float = 1.0,
    rotation_deg: float = 0.0,
    convergence_criterion: int = 1,
    subspace_only: bool = False,
    bilinear: bool = False,
    eig_method: str = "callback",
    rank_cut: float | None = None,
) -> GeneralState:
    """Run the general FEAST refinement iteration; fully jittable.

    Args mirror :func:`feast_hermitian_core`, except the search region is the
    rotated ellipse (Emid, r, aspect_ratio, rotation_deg) and ``bilinear``
    selects the complex-symmetric transpose pairing.
    """
    init = init_general_state(Q0)

    if subspace_only:
        Qproj, ok = _filter_with_ok(filter_apply, init.Q)
        U, _, _ = jnp.linalg.svd(Qproj, full_matrices=False)
        return init._replace(Q=U, loop=jnp.int32(1), inner_ok=ok)

    body = make_general_body(
        apply_A, apply_B, filter_apply, Emid, r, tol=tol,
        aspect_ratio=aspect_ratio, rotation_deg=rotation_deg,
        convergence_criterion=convergence_criterion, bilinear=bilinear,
        eig_method=eig_method, rank_cut=rank_cut)

    final = jax.lax.while_loop(
        lambda s: (~s.converged) & (s.loop < max_loops + 1), body, init)
    return verify_spurious_general(final, filter_apply)


SPURIOUS_RES = 0.1


def init_general_state(Q0) -> GeneralState:
    M0 = Q0.shape[1]
    cdtype = Q0.dtype
    rdtype = jnp.finfo(cdtype).dtype
    return GeneralState(
        loop=jnp.int32(0),
        Q=Q0,
        lam=jnp.zeros((M0,), cdtype),
        res=jnp.full((M0,), jnp.inf, rdtype),
        inside=jnp.zeros((M0,), bool),
        epsout=jnp.asarray(jnp.inf, rdtype),
        trace=jnp.asarray(jnp.nan, cdtype),
        converged=jnp.asarray(False),
        inner_ok=jnp.asarray(True),
    )


def make_general_body(apply_A, apply_B, filter_apply, Emid, r, *, tol,
                      aspect_ratio=1.0, rotation_deg=0.0,
                      convergence_criterion=1, bilinear=False,
                      eig_method="callback", rank_cut=None):
    """One general-FEAST refinement iteration as a pure state -> state fn."""
    pair = (lambda U: U.T) if bilinear else (lambda U: U.conj().T)
    rot = np.exp(-1j * (rotation_deg / 180.0) * np.pi)

    def inside_region(lam):
        w = (lam - Emid) * rot
        x = w.real / r
        y = w.imag / (r * aspect_ratio)
        return x * x + y * y <= 1.0

    def body(state: GeneralState) -> GeneralState:
        cdtype = state.Q.dtype
        rdtype = jnp.finfo(cdtype).dtype
        cut = rank_cut if rank_cut is not None \
            else float(jnp.finfo(rdtype).eps) ** 0.25
        # Deflated directions' Ritz marker: outside the ellipse but O(scale)
        # (a huge marker inflates the reduced pencil norm and the small-eig
        # eigenvector error; see kernel/hermitian.py BIG).
        marker = Emid + (3.0 * r) * (1.0 + 0.0j)

        hint = jnp.minimum(0.1 * state.epsout * state.epsout, LOOP_TOL_CAP)
        Qproj, solves_ok = _filter_with_ok(filter_apply, state.Q, state.lam,
                                           hint)
        U, s, _ = jnp.linalg.svd(Qproj, full_matrices=False)
        m = (s >= cut * s[0]).astype(rdtype)
        Um = U * m[None, :]
        dead = jnp.diag(1.0 - m).astype(cdtype)
        S = pair(Um) @ apply_A(Um) + marker * dead
        G = pair(Um) @ apply_B(Um) + dead
        lam, V = generalized_eig(S, G, method=eig_method)
        q = Um @ V
        nrm = jnp.linalg.norm(q, axis=0)
        q = q / jnp.where(nrm > 0, nrm, 1.0)[None, :]

        Rm = apply_A(q) - lam[None, :] * apply_B(q)
        res = jnp.linalg.norm(Rm, axis=0) / jnp.maximum(jnp.abs(lam), 1.0)
        inside = inside_region(lam)
        order = inside_first_order(lam, inside, general=True)
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
        return GeneralState(state.loop + 1, q, lam, res, inside,
                            epsout.astype(rdtype), trace.astype(cdtype), conv,
                            jnp.asarray(state.inner_ok) & solves_ok)

    return body


def verify_spurious_general(state: GeneralState, filter_apply) -> GeneralState:
    """Final projector-norm spurious acceptance (see kernel/hermitian.py)."""
    rdtype = jnp.finfo(state.Q.dtype).dtype
    Qproj, ok = _filter_with_ok(filter_apply, state.Q, state.lam,
                                jnp.asarray(VERIFY_FILTER_TOL, rdtype))
    rho = jnp.linalg.norm(Qproj, axis=0)
    genuine = state.inside & (rho > 0.25) & (state.res < SPURIOUS_RES)
    order = inside_first_order(state.lam, genuine, general=True)
    return state._replace(
        lam=state.lam[order], Q=state.Q[:, order], res=state.res[order],
        inside=genuine[order],
        epsout=jnp.max(jnp.where(genuine, state.res, 0.0)).astype(rdtype),
        inner_ok=jnp.asarray(state.inner_ok) & ok)
