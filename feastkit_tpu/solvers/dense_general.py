"""Dense general (non-Hermitian), complex-symmetric, and polynomial drivers.

Counterparts of the reference's feast_gegv!/geev! RCI-loop drivers
(feast_dense.jl:402-593), the complex-symmetric core (:1018-1285), and
feast_pep! companion linearization (:714-772).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..core.contour import feast_gcontour
from ..core.parameters import FeastConfig, _ensure_fpm
from ..core.tools import seeded_subspace
from ..core.types import FeastError, FeastGeneralResult, _trim
from ..kernel.general import (feast_general_core, GeneralState,
                              init_general_state, make_general_body,
                              verify_spurious_general)
from ..utils import cio
from ..utils.cio import cjit, fetch
from .dense import _make_solve_all

__all__ = ["feast_gegv", "feast_geev", "feast_gegv_complex_sym",
           "feast_geev_complex_sym", "feast_pep", "feast_pep_direct",
           "dense_general_feast"]


def _gate_general_cdtype(cdtype, what: str):
    """Platform-feasibility gate (ops/splitlu.demote_f64_general): c128
    work precision cannot compile on XLA:TPU — demote with a warning (or
    raise under FEAST_STRICT_F64=1) instead of crashing the compiler."""
    if np.dtype(cdtype) == np.dtype(np.complex128):
        from ..ops.splitlu import f64_lu_unavailable, demote_f64_general
        if f64_lu_unavailable():
            demote_f64_general(what)
            return np.dtype(np.complex64)
    return np.dtype(cdtype)


def _cdtype_of(*arrays):
    dt = jnp.result_type(*[a.dtype for a in arrays])
    return jnp.complex64 if dt in (jnp.float32, jnp.complex64) else jnp.complex128


def _general_ops(A, B, Zne, Wne, *, standard, store_factorization,
                 lu_piv=None):
    # allow_block=False: general pencils carry no accretive structure, so
    # the blocked (locally-pivoted) LU's stability argument does not apply
    solve_all, _ = _make_solve_all(A, B, Zne, standard, store_factorization,
                                   lu_piv, allow_block=False)
    apply_A = lambda X: A @ X
    apply_B = (lambda X: X) if standard else (lambda X: B @ X)

    def filter_apply(Q):
        rhs = apply_B(Q)
        X = solve_all(rhs)
        return jnp.einsum("e,enm->nm", Wne, X)

    return apply_A, apply_B, filter_apply


@cjit(static_argnames=("config", "standard", "bilinear", "eig_method"))
def _dense_general_jit(A, B, Zne, Wne, Q0, Emid, r, *, config: FeastConfig,
                       standard: bool, bilinear: bool, eig_method: str):
    apply_A, apply_B, filter_apply = _general_ops(
        A, B, Zne, Wne, standard=standard,
        store_factorization=config.store_factorization)
    return feast_general_core(
        apply_A, apply_B, filter_apply, Q0, Emid, r,
        tol=config.tol, max_loops=config.max_loops,
        aspect_ratio=config.aspect_ratio, rotation_deg=config.rotation_deg,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1), bilinear=bilinear,
        eig_method=eig_method)


@cjit(static_argnames=("standard",))
def _general_factor_jit(A, B, Zne, *, standard: bool):
    from .dense import _shifted_pencils
    shifted = _shifted_pencils(A, B, Zne, standard)
    return jax.vmap(jsl.lu_factor)(shifted)


@cjit(static_argnames=("config", "standard", "bilinear", "eig_method"))
def _general_body_jit(A, B, lu, piv, Zne, Wne, state, Emid, r, *,
                      config: FeastConfig, standard: bool, bilinear: bool,
                      eig_method: str):
    apply_A, apply_B, filter_apply = _general_ops(
        A, B, Zne, Wne, standard=standard,
        store_factorization=config.store_factorization,
        lu_piv=(lu, piv) if config.store_factorization else None)
    body = make_general_body(
        apply_A, apply_B, filter_apply, Emid, r, tol=config.tol,
        aspect_ratio=config.aspect_ratio, rotation_deg=config.rotation_deg,
        convergence_criterion=config.convergence_criterion, bilinear=bilinear,
        eig_method=eig_method)
    return body(state)


@cjit(static_argnames=("config", "standard", "mode"))
def _general_finalize_jit(A, B, lu, piv, Zne, Wne, state, *, config,
                          standard: bool, mode: str = "verify"):
    apply_A, apply_B, filter_apply = _general_ops(
        A, B, Zne, Wne, standard=standard,
        store_factorization=config.store_factorization,
        lu_piv=(lu, piv) if config.store_factorization else None)
    if mode == "subspace":
        U, _, _ = jnp.linalg.svd(filter_apply(state.Q), full_matrices=False)
        return state._replace(Q=U, loop=jnp.int32(1))
    return verify_spurious_general(state, filter_apply)


@cjit(static_argnames=("config", "standard"))
def _general_filter_jit(A, B, Zne, Wne, V, *, config, standard):
    """Raw filtered application P V (fpm[14]=2 probes, full contour)."""
    _, _, filter_apply = _general_ops(
        A, B, Zne, Wne, standard=standard,
        store_factorization=config.store_factorization)
    out = filter_apply(V)
    return out[0] if isinstance(out, tuple) else out


def _general_host_state(Q0):
    M0 = Q0.shape[1]
    rdtype = np.float32 if Q0.dtype == np.dtype(np.complex64) else np.float64
    cdtype = Q0.dtype
    return GeneralState(
        loop=np.int32(0), Q=Q0,
        lam=np.zeros(M0, cdtype), res=np.full(M0, np.inf, rdtype),
        inside=np.zeros(M0, bool), epsout=rdtype(np.inf),
        trace=np.asarray(np.nan, cdtype)[()], converged=np.bool_(False))


def _run_general_host_loop(A, B, Zne, Wne, Q0, Emid, r, *, config, standard,
                           bilinear, eig_method):
    # Remote-link protocol (see solvers/dense.py): operands device-resident
    # once, two refinement bodies + speculative finalize per host
    # synchronization, all result leaves in one packed fetch.
    same = B is A
    A = cio.device_operand(A)
    B = A if same else cio.device_operand(B)
    if config.store_factorization:
        lu, piv = _general_factor_jit(A, B, Zne, standard=standard)
    else:
        lu = piv = None
    state = _general_host_state(Q0)
    if config.mode == 1:
        return _general_finalize_jit(A, B, lu, piv, Zne, Wne, state,
                                     config=config, standard=standard,
                                     mode="subspace"), None
    return cio.run_pipelined_loop(
        state,
        lambda s: _general_body_jit(A, B, lu, piv, Zne, Wne, s, Emid, r,
                                    config=config, standard=standard,
                                    bilinear=bilinear,
                                    eig_method=eig_method),
        lambda s: _general_finalize_jit(A, B, lu, piv, Zne, Wne, s,
                                        config=config, standard=standard),
        max_loops=config.max_loops)


def dense_general_feast(A, B, Emid, r, M0, fpm=None, *, contour=None, Q0=None,
                        bilinear=False, eig_method=None
                        ) -> FeastGeneralResult:
    """Shared dense general/complex-symmetric driver.

    eig_method: 'callback' (host zgeev) or 'qr' (on-device Schur). Defaults
    to 'callback' except on the axon tunnel, where host callbacks cannot run
    in the remote executor -> 'qr'."""
    if eig_method is None:
        eig_method = "qr" if cio.complex_io_required() else "callback"
    fpm = _ensure_fpm(fpm)
    # Host numpy or device-resident forms from cio.device_operand (see
    # solvers/dense.py — skips the per-dispatch re-upload on slow links).
    A = A if cio.is_operand(A) else np.asarray(A)
    standard = B is None
    shA = cio.op_shape(A)
    if not standard:
        B = B if cio.is_operand(B) else np.asarray(B)
        if cio.op_shape(B) != shA:
            raise ValueError(f"B must match A: {shA} vs {cio.op_shape(B)}")
    N = shA[0]
    if len(shA) != 2 or shA[1] != N:
        raise ValueError(f"A must be square, got {shA}")
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not r > 0:
        raise ValueError(f"Contour radius must be positive, got {r}")

    dt_in = [cio.op_dtype(A)] + ([] if standard else [cio.op_dtype(B)])
    cdtype = np.dtype(np.complex64) \
        if jnp.result_type(*dt_in) in (jnp.float32, jnp.complex64) \
        else np.dtype(np.complex128)
    cdtype = _gate_general_cdtype(cdtype, "feast_general (dense general/"
                                  "complex-symmetric contour engine)")
    A = cio.op_astype(A, cdtype)
    if not standard:
        B = cio.op_astype(B, cdtype)
    config = FeastConfig.from_fpm(fpm, dtype=cdtype, full_contour=True)
    if contour is None:
        from ..core.aux import feast_get_custom_contour
        contour = feast_get_custom_contour(fpm)  # fpm[29] registry
    if contour is None:
        contour = feast_gcontour(complex(Emid), float(r), fpm)
    Zne = np.asarray(contour.Zne, cdtype)
    Wne = np.asarray(contour.Wne, cdtype)
    # General problems seed with a fully complex subspace (the reference
    # uses complex randn for grci, feast_kernel.jl:719); fpm[5]=1 + Q0 warm
    # starts (feast_kernel.jl:67-79).
    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, cdtype, general=True)

    rdtype = np.float32 if cdtype == np.complex64 else np.float64
    B_arg = B if not standard else A
    if config.mode == 2:
        # Stochastic count estimate for the oblique projector: trace(P) = M
        # still holds (P is a spectral projector, not orthogonal), so real
        # Rademacher probes estimate the inside count (fpm[14]=2, fpm[32]).
        from .sparse import _stochastic_estimate_result
        res = _stochastic_estimate_result(
            lambda V: _general_filter_jit(A, B_arg, Zne, Wne,
                                          np.asarray(V, cdtype),
                                          config=config, standard=standard),
            N, fpm, cdtype)
        return FeastGeneralResult(np.zeros(0, cdtype), np.zeros((N, 0), cdtype),
                                  res.M, np.zeros(0), res.info, res.epsout,
                                  res.loop)
    fetched = None
    if cio.complex_io_required():
        state, fetched = _run_general_host_loop(
            A, B_arg, Zne, Wne, Q0, np.asarray(complex(Emid), cdtype)[()],
            rdtype(float(r)), config=config, standard=standard,
            bilinear=bilinear, eig_method=eig_method)
    else:
        state = _dense_general_jit(
            A, B_arg, Zne, Wne, Q0,
            np.asarray(complex(Emid), cdtype)[()], rdtype(float(r)),
            config=config, standard=standard, bilinear=bilinear,
            eig_method=eig_method)

    conv, lam, Q, res, inside, epsout, loop = fetched or cio.fetch_many(
        [state.converged, state.lam, state.Q, state.res, state.inside,
         state.epsout, state.loop])
    info = FeastError.SUCCESS if bool(conv) else FeastError.NO_CONVERGENCE
    return _trim(FeastGeneralResult, lam, Q, res, inside,
                 int(info), float(epsout), int(loop) - 1)


def feast_gegv(A, B, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Dense general generalized A x = lam B x inside the ellipse (Emid, r)
    (parity: feast_gegv!, feast_dense.jl:402-593)."""
    return dense_general_feast(A, B, Emid, r, M0, fpm, **kw)


def feast_geev(A, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Dense general standard problem (feast_geev!)."""
    return dense_general_feast(A, None, Emid, r, M0, fpm, **kw)


def feast_gegv_complex_sym(A, B, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Dense complex-symmetric generalized problem: transpose-bilinear
    Rayleigh-Ritz Q^T A Q (parity: feast_gegv_complex_sym!,
    feast_dense.jl:1026-1285, esp. :1183-1186)."""
    return dense_general_feast(A, B, Emid, r, M0, fpm, bilinear=True, **kw)


def feast_geev_complex_sym(A, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Dense complex-symmetric standard problem (feast_geev_complex_sym!)."""
    return dense_general_feast(A, None, Emid, r, M0, fpm, bilinear=True, **kw)


@cjit(static_argnames=("config", "degree", "eig_method"))
def _pep_direct_jit(coeffs, Zne, Wne, V0, Emid, r, *, config, degree,
                    eig_method):
    """Direct polynomial FEAST (moment/Beyn scheme — the TPU-native
    counterpart of _feast_poly_grci!, feast_kernel.jl:964-1261):

      Y_e = P(z_e)^{-1} V;  A0 = sum w_e Y_e;  A1 = sum w_e z_e Y_e
      thin SVD A0 = U S W^H (rank-deflated);  B = U^H A1 W S^{-1}
      eig(B) -> Ritz values inside the contour, vectors x = U s.

    One refinement loop replaces V by the Ritz vectors (subspace iteration
    through the polynomial resolvent)."""
    from ..ops.eig import general_eig
    cdtype = Zne.dtype
    N, M0 = V0.shape
    rdtype = jnp.finfo(cdtype).dtype
    # Moment-matrix rank cut: the Beyn pencil's trailing singular values are
    # quadrature leakage (~filter outside level, 1e-3..1e-2 for the default
    # trapezoid), far above machine noise - cut aggressively; genuine inside
    # directions sit at O(1).
    rank_cut = 1e-2
    marker = Emid + 3.0 * r

    # P(z_e) for all nodes by Horner: (ne, N, N)
    def pencil(z):
        acc = jnp.zeros((N, N), cdtype) + coeffs[degree]
        for k in range(degree - 1, -1, -1):
            acc = acc * z + coeffs[k]
        return acc
    P_all = jax.vmap(pencil)(Zne)
    lu, piv = jax.vmap(jsl.lu_factor)(P_all)

    def apply_P(lam, X):
        """P(lam_j) x_j columnwise (for residuals)."""
        acc = coeffs[degree] @ X
        for k in range(degree - 1, -1, -1):
            acc = acc * lam[None, :] + coeffs[k] @ X
        return acc

    def body(state):
        loop, V, lam_p, res_p, inside_p, eps_p, conv = state
        Y = jax.vmap(lambda l, p: jsl.lu_solve((l, p), V))(lu, piv)
        A0 = jnp.einsum("e,enm->nm", Wne, Y)
        A1 = jnp.einsum("e,enm->nm", Wne * Zne, Y)
        U, s, Wv = jnp.linalg.svd(A0, full_matrices=False)
        m = (s >= rank_cut * s[0]).astype(rdtype)
        s_inv = jnp.where(m > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
        Bred = (U.conj().T @ A1) @ (Wv.conj().T * s_inv[None, :])
        # deflated directions -> decoupled marker eigenvalues
        Bred = Bred * (m[:, None] * m[None, :])             + marker * jnp.diag(1.0 - m).astype(cdtype)
        lam, Sv = general_eig(Bred, method=eig_method)
        x = U @ Sv
        nrm = jnp.linalg.norm(x, axis=0)
        x = x / jnp.where(nrm > 0, nrm, 1.0)[None, :]
        Rm = apply_P(lam, x)
        res = jnp.linalg.norm(Rm, axis=0) / jnp.maximum(jnp.abs(lam), 1.0)
        w = (lam - Emid)
        xs = w.real / r
        ys = w.imag / (r * config.aspect_ratio)
        inside = xs * xs + ys * ys <= 1.0
        order = inside_first_order(lam, inside, general=True)
        lam, x, res, inside = lam[order], x[:, order], res[order], inside[order]
        plausible = inside & (res < 0.1)
        eps = jnp.max(jnp.where(plausible, res, 0.0))
        conv = (eps <= config.tol) & (jnp.sum(plausible) > 0)
        return (loop + 1, x, lam, res, inside, eps.astype(rdtype), conv)

    from ..core.tools import inside_first_order
    init = (jnp.int32(0), V0, jnp.zeros((M0,), cdtype),
            jnp.full((M0,), jnp.inf, rdtype), jnp.zeros((M0,), bool),
            jnp.asarray(jnp.inf, rdtype), jnp.asarray(False))
    out = jax.lax.while_loop(
        lambda st: (~st[-1]) & (st[0] < config.max_loops + 1), body, init)
    return out


def feast_pep_direct(coeffs, Emid, r, M0, fpm=None,
                     eig_method=None, Q0=None) -> FeastGeneralResult:
    """Direct (linearization-free) polynomial eigensolver: memory N x M0
    instead of the companion's dN x dM0. See _pep_direct_jit.

    Accuracy is quadrature-limited (Beyn-type moment method): the eigenvalue
    error scales with the contour leakage (~(distance ratio)^ne for the
    trapezoid), so the node count dominates; defaults to >= 32 full-contour
    nodes. Use the companion path (feast_pep) when machine-precision
    eigenpairs are required and d*N memory is affordable."""
    fpm = _ensure_fpm(fpm)
    if fpm[8] < 32:
        fpm = fpm.copy()
        fpm[8] = 32
    coeffs = [np.asarray(c) for c in coeffs]
    d = len(coeffs) - 1
    N = coeffs[0].shape[0]
    cdtype = _gate_general_cdtype(
        np.dtype(str(jnp.dtype(_cdtype_of(*coeffs)))),
        "feast_pep_direct (polynomial contour engine)")
    coeffs = tuple(c.astype(cdtype) for c in coeffs)
    if eig_method is None:
        eig_method = "qr" if cio.complex_io_required() else "callback"
    config = FeastConfig.from_fpm(fpm, dtype=cdtype, full_contour=True)
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_gcontour(
        complex(Emid), float(r), fpm)
    rdtype = np.float32 if cdtype == np.complex64 else np.float64
    from ..core.tools import initial_subspace
    V0 = initial_subspace(fpm, Q0, N, M0, cdtype, general=True)
    loop, x, lam, res, inside, eps, conv = _pep_direct_jit(
        coeffs, np.asarray(contour.Zne, cdtype),
        np.asarray(contour.Wne, cdtype), V0,
        np.asarray(complex(Emid), cdtype)[()], rdtype(float(r)),
        config=config, degree=d, eig_method=eig_method)
    info = FeastError.SUCCESS if bool(fetch(conv)) else FeastError.NO_CONVERGENCE
    return _trim(FeastGeneralResult, fetch(lam), fetch(x), fetch(res),
                 fetch(inside), int(info), float(fetch(eps)),
                 int(fetch(loop)) - 1)


def feast_pep(coeffs, Emid, r, M0, fpm=None, Q0=None, **kw) -> FeastGeneralResult:
    """Polynomial eigenproblem P(lam) x = (sum_k lam^k A_k) x = 0 via
    first-companion linearization to a (d*N)-dim generalized pencil
    (parity: feast_pep!, feast_dense.jl:714-772).

    coeffs: [A_0, A_1, ..., A_d] (degree d). Linearization:
      Ac = [[0, I, 0...], [0, 0, I, ...], [-A0, -A1, ..., -A_{d-1}]],
      Bc = diag(I, ..., I, A_d);  eigenvector x = first N rows.
    """
    coeffs = [np.asarray(c) for c in coeffs]
    d = len(coeffs) - 1
    if d < 1:
        raise ValueError("Polynomial eigenproblem needs degree >= 1")
    N = coeffs[0].shape[0]
    for c in coeffs:
        if c.shape != (N, N):
            raise ValueError("All coefficient matrices must be square and equal size")
    cdtype = np.dtype(str(jnp.dtype(_cdtype_of(*coeffs))))
    coeffs = [c.astype(cdtype) for c in coeffs]
    if d == 1:
        # linear pencil: A0 + lam A1 -> A x = lam B x with A=-A0, B=A1
        res = dense_general_feast(-coeffs[0], coeffs[1], Emid, r, M0, fpm,
                                  Q0=Q0, **kw)
        return res
    import scipy.linalg as _sla
    eye = np.eye(N, dtype=cdtype)
    zero = np.zeros((N, N), cdtype)
    rows = []
    for i in range(d - 1):
        rows.append(np.concatenate(
            [zero] * (i + 1) + [eye] + [zero] * (d - i - 2), axis=1))
    rows.append(np.concatenate([-c for c in coeffs[:d]], axis=1))
    Ac = np.concatenate(rows, axis=0)
    Bc = _sla.block_diag(*([eye] * (d - 1) + [coeffs[d]]))
    # Warm start (fpm[5]): an (N, M0) Q0 from a previous run / checkpoint is
    # lifted into the companion space by vertical tiling (the checkpointed
    # eigenvector block is the first N rows of the companion eigenvector).
    Q0c = None
    if Q0 is not None and np.asarray(Q0).shape[0] == N:
        Q0c = np.tile(np.asarray(Q0, cdtype), (d, 1))
        nrm = np.linalg.norm(Q0c, axis=0, keepdims=True)
        Q0c = Q0c / np.where(nrm > 0, nrm, 1.0)
    elif Q0 is not None:
        Q0c = np.asarray(Q0, cdtype)
    res = dense_general_feast(Ac, Bc, Emid, r, M0, fpm, Q0=Q0c, **kw)
    # Project eigenvectors back to the first N rows, renormalized.
    if res.M:
        q = res.q[:N, :]
        nrm = np.linalg.norm(q, axis=0)
        res.q = q / np.where(nrm > 0, nrm, 1.0)[None, :]
    res.q_full = res.q_full[:N, :]
    return res
