"""Banded FEAST drivers (LAPACK band storage, BCR shifted solves).

Counterpart of the reference's ``src/banded/feast_banded.jl``: RCI-loop
symmetric driver (feast_sbgv!/sbev! :9-201), Hermitian / complex-symmetric /
general loop cores (:561-1284), band fill helpers (:216-296, :511-559) and
converters (:423-483, :1286-1330). The LAPACK ``gbtrf!/gbtrs!`` factor cache
becomes a vmapped block-cyclic-reduction hierarchy per contour node
(ops/banded.py), and the band matvecs become diagonal-shifted multiplies.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.contour import feast_contour, feast_gcontour
from ..core.parameters import FeastConfig, _ensure_fpm
from ..core.tools import seeded_subspace
from ..core.types import FeastError, FeastGeneralResult, FeastResult, _trim
from ..kernel.general import feast_general_core
from ..kernel.hermitian import feast_hermitian_core
from ..ops.banded import (banded_matvec, banded_to_blocktridiag, bcr_factor,
                          bcr_solve)
from ..utils.cio import cjit, fetch

__all__ = ["feast_sbev", "feast_sbgv", "feast_hbev", "feast_hbgv",
           "feast_gbev", "feast_gbgv", "feast_sbev_complex",
           "feast_sbgv_complex", "identity_bands"]


def identity_bands(N, kl, ku, dtype):
    """Band storage of the identity in a (kl+ku+1, N) layout."""
    bands = np.zeros((kl + ku + 1, N), dtype)
    bands[ku, :] = 1.0
    return jnp.asarray(bands)


def _common_layout(bands, kl, ku, KL, KU, N, dtype):
    """Re-pad a band array into the common (KL+KU+1, N) layout."""
    out = jnp.zeros((KL + KU + 1, N), dtype)
    return out.at[KU - ku:KU - ku + kl + ku + 1, :].set(
        jnp.asarray(bands, dtype))


def _banded_machinery(A_bands, kl, ku, B_bands, klb, kub, Zne, cdtype,
                      work_dtype):
    """Build (apply_A, apply_B, solve_all) over band storage.

    solve_all: rhs (N, M0) work_dtype -> (ne, N, M0) cdtype, via a cached
    vmapped BCR hierarchy of the shifted pencils z_e B - A.
    """
    A_bands = jnp.asarray(A_bands)
    N = A_bands.shape[1]
    standard = B_bands is None
    KL = max(kl, 0 if standard else klb)
    KU = max(ku, 0 if standard else kub)
    Ac = _common_layout(A_bands, kl, ku, KL, KU, N, cdtype)
    if standard:
        Bc = identity_bands(N, KL, KU, cdtype)
    else:
        Bc = _common_layout(B_bands, klb, kub, KL, KU, N, cdtype)
    shifted = Zne[:, None, None] * Bc[None] - Ac[None]    # (ne, KL+KU+1, N)

    def factor_one(bands_e):
        D, L, U, b, _ = banded_to_blocktridiag(bands_e, KL, KU)
        return bcr_factor(D, L, U)

    hier = jax.vmap(factor_one)(shifted)
    # padded length from the block-tridiag of one node:
    D0, _, _, b, _ = banded_to_blocktridiag(shifted[0], KL, KU)
    Npad = D0.shape[0] * b

    def solve_all(rhs):
        M = rhs.shape[1]
        rhs_p = jnp.zeros((Npad, M), cdtype).at[:N].set(rhs.astype(cdtype))
        blocks = rhs_p.reshape(Npad // b, b, M)

        def one(levels_root):
            levels, rlu, rpiv = levels_root
            x = bcr_solve(levels, rlu, rpiv, blocks)
            return x.reshape(Npad, M)[:N]

        return jax.vmap(one)(hier)

    A_work = _common_layout(A_bands, kl, ku, KL, KU, N, work_dtype)
    B_work = (None if standard
              else _common_layout(B_bands, klb, kub, KL, KU, N, work_dtype))
    apply_A = lambda X: banded_matvec(A_work, X, KL, KU)
    if standard:
        apply_B = lambda X: X
    else:
        apply_B = lambda X: banded_matvec(B_work, X, KL, KU)
    return apply_A, apply_B, solve_all, N


def _banded_pair_machinery(A_bands, kl, ku, B_bands, klb, kub, sig, tau,
                           hier=None):
    """Pair-mode (f64 on TPU, c128-free) banded machinery: c64 BCR factors
    + f64 pair-carried iterative refinement (ops/splitlu.py). The band
    matvecs that evaluate the refinement residual are diagonal-shifted
    elementwise multiplies — genuinely f64-accurate on the VPU. Parity:
    the reference's f64 gbtrf/gbtrs factor cache (feast_banded.jl:94-161)
    at full double accuracy without any c128 HLO."""
    from ..ops.splitlu import pair_refined_solve
    A_bands = jnp.asarray(A_bands)
    N = A_bands.shape[1]
    standard = B_bands is None
    KL = max(kl, 0 if standard else klb)
    KU = max(ku, 0 if standard else kub)
    A32 = _common_layout(A_bands, kl, ku, KL, KU, N, jnp.float32)
    B32 = (identity_bands(N, KL, KU, jnp.float32) if standard
           else _common_layout(B_bands, klb, kub, KL, KU, N, jnp.float32))
    if hier is None:
        re = sig[:, None, None].astype(jnp.float32) * B32[None] - A32[None]
        im = jnp.broadcast_to(
            tau[:, None, None].astype(jnp.float32) * B32[None], re.shape)
        shifted = jax.lax.complex(re, im)

        def factor_one(bands_e):
            D, L, U, b, _ = banded_to_blocktridiag(bands_e, KL, KU)
            return bcr_factor(D, L, U)

        hier = jax.vmap(factor_one)(shifted)
    dummy = jnp.zeros((KL + KU + 1, N), jnp.complex64)
    D0, _, _, b, _ = banded_to_blocktridiag(dummy, KL, KU)
    Npad = D0.shape[0] * b

    A64 = _common_layout(A_bands, kl, ku, KL, KU, N, jnp.float64)
    B64 = (None if standard
           else _common_layout(B_bands, klb, kub, KL, KU, N, jnp.float64))
    apply_A = lambda X: banded_matvec(A64, X, KL, KU)
    apply_B = (lambda X: X) if standard else (
        lambda X: banded_matvec(B64, X, KL, KU))

    def apply_shift(s, t, Xr, Xi):
        AXr, AXi = apply_A(Xr), apply_A(Xi)
        BXr, BXi = apply_B(Xr), apply_B(Xi)
        return s * BXr - AXr - t * BXi, s * BXi - AXi + t * BXr

    def solve_all(Fr):
        M = Fr.shape[1]
        Fi = jnp.zeros_like(Fr)

        def one(levels_root, s, t):
            levels, rlu, rpiv = levels_root

            def solve_c64(Z):
                Zp = jnp.zeros((Npad, M), jnp.complex64).at[:N].set(Z)
                x = bcr_solve(levels, rlu, rpiv,
                              Zp.reshape(Npad // b, b, M))
                return x.reshape(Npad, M)[:N]

            return pair_refined_solve(
                solve_c64, lambda Xr, Xi: apply_shift(s, t, Xr, Xi), Fr, Fi)

        Xr, Xi, ok = jax.vmap(one)(hier, sig, tau)
        return Xr, Xi, jnp.all(ok)

    return apply_A, apply_B, solve_all, hier, N


def _banded_pair_filter(A_bands, kl, ku, B_bands, klb, kub, Zne, Wne,
                        hier=None):
    """(apply_A, apply_B, filter_apply, hier) for pair mode; filter_apply
    returns (Qproj, ok)."""
    sig, tau = Zne
    Wr, Wi = Wne
    apply_A, apply_B, solve_all, hier, N = _banded_pair_machinery(
        A_bands, kl, ku, B_bands, klb, kub, jnp.asarray(sig),
        jnp.asarray(tau), hier=hier)

    def filter_apply(Q):
        Xr, Xi, ok = solve_all(apply_B(Q))
        # Re(sum_e 2 W_e X_e) with the mirrored half-contour folded in
        return (jnp.einsum("e,enm->nm", 2.0 * jnp.asarray(Wr), Xr)
                - jnp.einsum("e,enm->nm", 2.0 * jnp.asarray(Wi), Xi)), ok

    return apply_A, apply_B, filter_apply, hier


@cjit(static_argnames=("kl", "ku", "klb", "kub", "config", "hermitian"))
def _banded_hermitian_jit(A_bands, B_bands, Zne, Wne, Q0, Emin, Emax, *,
                          kl, ku, klb, kub, config: FeastConfig,
                          hermitian: bool):
    if isinstance(Zne, tuple):          # pair mode (real iteration only)
        apply_A, apply_B, filter_apply, _ = _banded_pair_filter(
            A_bands, kl, ku, B_bands, klb, kub, Zne, Wne)
        return feast_hermitian_core(
            apply_A, apply_B, filter_apply, Q0, Emin, Emax,
            tol=config.tol, max_loops=config.max_loops,
            convergence_criterion=config.convergence_criterion,
            subspace_only=(config.mode == 1))
    cdtype = Zne.dtype
    work_dtype = Q0.dtype
    A_bands = jnp.asarray(A_bands)
    Bb = None if B_bands is None else jnp.asarray(B_bands)

    if hermitian:
        # Conjugate-node doubling: the Hermitian filter needs solves at both
        # z_e and conj(z_e) (see kernel/hermitian.py). BCR has no cheap
        # adjoint solve, so factor the mirrored nodes too.
        Zfull = jnp.concatenate([Zne, jnp.conj(Zne)])
        Wfull = jnp.concatenate([Wne, jnp.conj(Wne)])
    else:
        Zfull, Wfull = Zne, (2.0 * Wne)

    apply_A, apply_B, solve_all, N = _banded_machinery(
        A_bands, kl, ku, Bb, klb, kub, Zfull, cdtype, work_dtype)

    if hermitian:
        def filter_apply(Q):
            X = solve_all(apply_B(Q))
            return jnp.einsum("e,enm->nm", Wfull.astype(cdtype), X)
    else:
        def filter_apply(Q):
            X = solve_all(apply_B(Q).astype(cdtype))
            return jnp.real(
                jnp.einsum("e,enm->nm", Wfull.astype(cdtype), X)).astype(Q.dtype)

    return feast_hermitian_core(
        apply_A, apply_B, filter_apply, Q0, Emin, Emax,
        tol=config.tol, max_loops=config.max_loops,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1))


@cjit(static_argnames=("kl", "ku", "klb", "kub", "config", "hermitian"))
def _banded_factor_jit(A_bands, B_bands, Zne, Wne, *, kl, ku, klb, kub,
                       config: FeastConfig, hermitian: bool):
    """Factor the BCR hierarchies once (host-driven mode): returns the
    pytree of per-node elimination operators, reused by every refinement
    dispatch — the fpm[10] factor-cache contract across host-level calls."""
    if isinstance(Zne, tuple):          # pair mode: c64 hierarchy
        sig, tau = Zne
        _, _, _, hier, _ = _banded_pair_machinery(
            A_bands, kl, ku, B_bands, klb, kub, jnp.asarray(sig),
            jnp.asarray(tau))
        return hier
    cdtype = Zne.dtype
    A_bands = jnp.asarray(A_bands)
    Bb = None if B_bands is None else jnp.asarray(B_bands)
    if hermitian:
        Zfull = jnp.concatenate([Zne, jnp.conj(Zne)])
    else:
        Zfull = Zne
    N = A_bands.shape[1]
    standard = Bb is None
    KL = max(kl, 0 if standard else klb)
    KU = max(ku, 0 if standard else kub)
    Ac = _common_layout(A_bands, kl, ku, KL, KU, N, cdtype)
    Bc = identity_bands(N, KL, KU, cdtype) if standard else \
        _common_layout(Bb, klb, kub, KL, KU, N, cdtype)
    shifted = Zfull[:, None, None] * Bc[None] - Ac[None]

    def factor_one(bands_e):
        D, L, U, b, _ = banded_to_blocktridiag(bands_e, KL, KU)
        return bcr_factor(D, L, U)

    return jax.vmap(factor_one)(shifted)


@cjit(static_argnames=("kl", "ku", "klb", "kub", "config", "hermitian",
                       "final"))
def _banded_body_jit(A_bands, B_bands, Zne, Wne, hier, state, Emin, Emax, *,
                     kl, ku, klb, kub, config: FeastConfig, hermitian: bool,
                     final: bool = False):
    """One refinement iteration from a PRE-FACTORED hierarchy (host-driven
    loop for remote-attachment runtimes whose compile budget / execution
    watchdog rejects the fused whole-refinement program)."""
    from ..kernel.hermitian import (make_hermitian_body,
                                    verify_spurious_from, _filter_with_ok)
    if isinstance(Zne, tuple):          # pair mode (real iteration only)
        apply_A, apply_B, filter_apply, _ = _banded_pair_filter(
            A_bands, kl, ku, B_bands, klb, kub, Zne, Wne, hier=hier)
        if final:
            Qp, ok = _filter_with_ok(filter_apply, state.Q)
            return verify_spurious_from(state, Qp, ok)
        body = make_hermitian_body(
            apply_A, apply_B, filter_apply, Emin, Emax, tol=config.tol,
            convergence_criterion=config.convergence_criterion)
        return body(state)
    cdtype = Zne.dtype
    work_dtype = state.Q.dtype
    A_bands = jnp.asarray(A_bands)
    Bb = None if B_bands is None else jnp.asarray(B_bands)
    if hermitian:
        Wfull = jnp.concatenate([Wne, jnp.conj(Wne)])
    else:
        Wfull = 2.0 * Wne
    N = A_bands.shape[1]
    standard = Bb is None
    KL = max(kl, 0 if standard else klb)
    KU = max(ku, 0 if standard else kub)
    A_work = _common_layout(A_bands, kl, ku, KL, KU, N, work_dtype)
    B_work = (None if standard
              else _common_layout(Bb, klb, kub, KL, KU, N, work_dtype))
    apply_A = lambda X: banded_matvec(A_work, X, KL, KU)
    apply_B = (lambda X: X) if standard else \
        (lambda X: banded_matvec(B_work, X, KL, KU))
    # padded length from re-deriving one node's block structure (static)
    dummy = jnp.zeros((KL + KU + 1, N), cdtype)
    D0, _, _, b, _ = banded_to_blocktridiag(dummy, KL, KU)
    Npad = D0.shape[0] * b

    def solve_all(rhs):
        M = rhs.shape[1]
        rhs_p = jnp.zeros((Npad, M), cdtype).at[:N].set(rhs.astype(cdtype))
        blocks = rhs_p.reshape(Npad // b, b, M)

        def one(levels_root):
            levels, rlu, rpiv = levels_root
            x = bcr_solve(levels, rlu, rpiv, blocks)
            return x.reshape(Npad, M)[:N]

        return jax.vmap(one)(hier)

    if hermitian:
        def filter_apply(Q):
            X = solve_all(apply_B(Q))
            return jnp.einsum("e,enm->nm", Wfull.astype(cdtype), X)
    else:
        def filter_apply(Q):
            X = solve_all(apply_B(Q).astype(cdtype))
            return jnp.real(jnp.einsum("e,enm->nm", Wfull.astype(cdtype),
                                       X)).astype(Q.dtype)

    if final:
        Qp, ok = _filter_with_ok(filter_apply, state.Q)
        return verify_spurious_from(state, Qp, ok)
    body = make_hermitian_body(
        apply_A, apply_B, filter_apply, Emin, Emax, tol=config.tol,
        convergence_criterion=config.convergence_criterion)
    return body(state)


@cjit(static_argnames=("kl", "ku", "klb", "kub", "config", "hermitian"))
def _banded_first_jit(A_bands, B_bands, Zne, Wne, Q0, Emin, Emax, *,
                      kl, ku, klb, kub, config: FeastConfig,
                      hermitian: bool):
    """Fused FIRST CHUNK of the host-driven loop: BCR factor + one
    refinement body + the speculative spurious-verify finalize in ONE
    device program. Banded problems routinely converge in a single
    refinement loop, so the common case becomes one dispatch + one packed
    fetch (the axon tunnel pipelines async dispatch sends well enough
    that the measured n=2048 win is within noise — the fusion pays on
    links where each dispatch costs a genuine round trip, and it lets XLA
    schedule factor/body/finalize as one program).
    Returns (fin_state, mid_state, hier); an unconverged run continues the
    chunked body/finalize protocol from mid_state with the same hier."""
    from ..kernel.hermitian import init_hermitian_state
    st = dict(kl=kl, ku=ku, klb=klb, kub=kub, config=config,
              hermitian=hermitian)
    hier = _banded_factor_jit(A_bands, B_bands, Zne, Wne, **st)
    state = init_hermitian_state(jnp.asarray(Q0))
    mid = _banded_body_jit(A_bands, B_bands, Zne, Wne, hier, state,
                           Emin, Emax, **st)
    fin = _banded_body_jit(A_bands, B_bands, Zne, Wne, hier, mid,
                           Emin, Emax, final=True, **st)
    return fin, mid, hier


@cjit(static_argnames=("kl", "ku", "klb", "kub", "config", "bilinear",
      "eig_method"))
def _banded_general_jit(A_bands, B_bands, Zne, Wne, Q0, Emid, r, *,
                        kl, ku, klb, kub, config: FeastConfig,
                        bilinear: bool, eig_method: str):
    cdtype = Zne.dtype
    apply_A, apply_B, solve_all, N = _banded_machinery(
        jnp.asarray(A_bands), kl, ku,
        None if B_bands is None else jnp.asarray(B_bands), klb, kub,
        Zne, cdtype, cdtype)

    def filter_apply(Q):
        X = solve_all(apply_B(Q))
        return jnp.einsum("e,enm->nm", Wne, X)

    return feast_general_core(
        apply_A, apply_B, filter_apply, Q0, Emid, r,
        tol=config.tol, max_loops=config.max_loops,
        aspect_ratio=config.aspect_ratio, rotation_deg=config.rotation_deg,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1), bilinear=bilinear,
        eig_method=eig_method)


@cjit(static_argnames=("kl", "ku", "klb", "kub", "config", "hermitian"))
def _banded_filter_jit(A_bands, B_bands, Zne, Wne, V, *, kl, ku, klb, kub,
                       config: FeastConfig, hermitian: bool):
    """Raw filtered application P V (fpm[14]=2 probes)."""
    if isinstance(Zne, tuple):          # pair mode (real probes)
        _, _, filter_apply, _ = _banded_pair_filter(
            A_bands, kl, ku, B_bands, klb, kub, Zne, Wne)
        return filter_apply(jnp.asarray(V))[0]
    cdtype = Zne.dtype
    Bb = None if B_bands is None else jnp.asarray(B_bands)
    if hermitian:
        Zfull = jnp.concatenate([Zne, jnp.conj(Zne)])
        Wfull = jnp.concatenate([Wne, jnp.conj(Wne)])
    else:
        Zfull, Wfull = Zne, (2.0 * Wne)
    apply_A, apply_B, solve_all, N = _banded_machinery(
        jnp.asarray(A_bands), kl, ku, Bb, klb, kub, Zfull, cdtype, V.dtype)
    X = solve_all(apply_B(V).astype(cdtype))
    acc = jnp.einsum("e,enm->nm", Wfull.astype(cdtype), X)
    return acc if hermitian else jnp.real(acc).astype(V.dtype)


@cjit(static_argnames=("kl", "ku", "klb", "kub", "config"))
def _banded_gfilter_jit(A_bands, B_bands, Zne, Wne, V, *, kl, ku, klb, kub,
                        config: FeastConfig):
    """Raw FULL-contour filtered application P V (fpm[14]=2 probes on
    general contours). The raw quadrature sum of the oblique projector has
    trace(P) = M, so the driver passes the contour weights UNSCALED."""
    cdtype = Zne.dtype
    apply_A, apply_B, solve_all, N = _banded_machinery(
        jnp.asarray(A_bands), kl, ku,
        None if B_bands is None else jnp.asarray(B_bands), klb, kub,
        Zne, cdtype, cdtype)
    X = solve_all(apply_B(V).astype(cdtype))
    return jnp.einsum("e,enm->nm", Wne.astype(cdtype), X)


def _banded_embedded_hermitian(A_bands, kl, ku, B_bands, klb, kub, Emin,
                               Emax, M0, fpm, Q0=None) -> FeastResult:
    """Complex-Hermitian banded f64 where c128 HLO cannot compile
    (XLA:TPU): solve the INTERLEAVED real embedding (half-bandwidths
    2kl+1 / 2ku+1, ops/splitlu.py) on the real-f64 pair BCR engine, then
    collapse the doubled eigenpairs. Parity: feast_hbev!/hbgv!
    (feast_banded.jl:326-418) at full f64 on the chip."""
    from ..ops.splitlu import (embed_hermitian_banded,
                               finish_embedded_interval,
                               map_embedded_subspace)
    import scipy.sparse as sp
    A_bands = np.asarray(A_bands)
    N = A_bands.shape[1]
    EA, KLa, KUa = embed_hermitian_banded(A_bands, kl, ku)
    if B_bands is None:
        EB, KLb, KUb = None, 0, 0
    else:
        EB, KLb, KUb = embed_hermitian_banded(np.asarray(B_bands), klb, kub)
    M0e = min(2 * M0, 2 * N)
    Q0e = None if Q0 is None else map_embedded_subspace(
        np.asarray(Q0), M0e, interleaved=True)
    r = _banded_interval_driver(EA, KLa, KUa, EB, KLb, KUb, Emin, Emax,
                                M0e, fpm, hermitian=False, Q0=Q0e)
    # scipy's DIA convention matches band storage exactly:
    # data[k, j] = A[j - offset[k], j] with offset[k] = ku - k
    offs = np.asarray([ku - k for k in range(kl + ku + 1)])
    Asp = sp.dia_matrix((A_bands.astype(np.complex128), offs),
                        shape=(N, N)).tocsr()
    Bsp = None
    if B_bands is not None:
        offsB = np.asarray([kub - k for k in range(klb + kub + 1)])
        Bsp = sp.dia_matrix((np.asarray(B_bands, np.complex128), offsB),
                            shape=(N, N)).tocsr()
    return finish_embedded_interval(
        r, N, M0, _ensure_fpm(fpm), interleaved=True,
        apply_A=lambda X: Asp @ X,
        apply_B=None if Bsp is None else (lambda X: Bsp @ X))


def _banded_interval_driver(A_bands, kl, ku, B_bands, klb, kub, Emin, Emax,
                            M0, fpm, hermitian, Q0=None) -> FeastResult:
    fpm = _ensure_fpm(fpm)
    A_bands = np.asarray(A_bands)
    N = A_bands.shape[1]
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not Emax > Emin:
        raise ValueError(f"Emin={Emin} must be < Emax={Emax}")
    if A_bands.shape[0] != kl + ku + 1:
        raise ValueError(
            f"A band array must have kl+ku+1={kl+ku+1} rows, got {A_bands.shape[0]}")
    is_c = np.iscomplexobj(A_bands) or (
        B_bands is not None and np.iscomplexobj(np.asarray(B_bands)))
    hermitian = is_c if hermitian is None else hermitian
    # double-precision WORK requires x64: without it jnp silently casts
    # to f32 while the tolerance still targets 1e-12 (guaranteed info=5)
    f64 = (A_bands.dtype in (np.dtype(np.float64), np.dtype(np.complex128))
           and jax.config.jax_enable_x64)
    rdtype = np.float64 if f64 else np.float32
    cdtype = np.complex128 if f64 else np.complex64
    work_dtype = cdtype if hermitian else rdtype
    # f64 where XLA cannot compile c128 / f64 LU (every TPU backend):
    # Hermitian operands run via the interleaved real embedding; real
    # operands run the c64-BCR + f64 pair-refinement engine (splitlu)
    from ..ops.splitlu import f64_lu_unavailable
    pair_f64 = f64 and f64_lu_unavailable()
    if pair_f64 and hermitian:
        if not is_c:
            # real bands declared hermitian: same math on the real pair
            # engine — no need to double the problem via the embedding
            hermitian = False
        else:
            return _banded_embedded_hermitian(A_bands, kl, ku, B_bands,
                                              klb, kub, Emin, Emax, M0,
                                              fpm, Q0=Q0)
    if pair_f64:
        work_dtype = rdtype

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_contour(Emin, Emax, fpm)
    # Auto route at throughput scale: an eligible symmetric/Hermitian
    # banded pencil IS a DIA sparse operator, so the rational contour
    # filter can be realized polynomially over the shared Chebyshev basis
    # and applied by the fused Pallas recurrence kernels (exact quadrature
    # semantics, no per-node factorizations) — the banded analog of the
    # sparse driver's contour-polynomial route. The BCR direct engine
    # keeps: the small-N latency regime (factor-once beats ~degree
    # matvecs below ~4k dof), ineligible pencils (indefinite B, nodes on
    # the real axis, cap-bound interior intervals), and the general /
    # complex-symmetric drivers. Match: feast_banded.jl:94-161 gbtrf/
    # gbtrs per node (semantics preserved through the quadrature filter).
    from .sparse import _contour_poly_default
    if N >= 4096 and _contour_poly_default():
        from .sparse import _sparse_cheb_interval
        from ..ops.chebfilter import ChebInfeasible
        import scipy.sparse as _sp
        offs = np.asarray([ku - k for k in range(kl + ku + 1)])
        Asp = _sp.dia_matrix((np.asarray(A_bands, work_dtype), offs),
                             shape=(N, N)).tocsr()
        Bsp = None
        if B_bands is not None:
            offsB = np.asarray([kub - k for k in range(klb + kub + 1)])
            Bsp = _sp.dia_matrix((np.asarray(B_bands, work_dtype), offsB),
                                 shape=(N, N)).tocsr()
        try:
            return _sparse_cheb_interval(Asp, Bsp, Emin, Emax, M0, fpm,
                                         hermitian=hermitian, Q0=Q0,
                                         contour=contour, route=True)
        except ChebInfeasible as e:
            if config.print_level >= 1:
                print(f"feast banded: contour-polynomial route "
                      f"unavailable ({e}); using the BCR direct engine",
                      flush=True)
    if config.mode == 2:
        from .sparse import _stochastic_estimate_result
        Zp = np.asarray(contour.Zne, cdtype)
        Wp = np.asarray(contour.Wne, cdtype)
        if pair_f64:
            Zp = (np.ascontiguousarray(Zp.real),
                  np.ascontiguousarray(Zp.imag))
            Wp = (np.ascontiguousarray(Wp.real),
                  np.ascontiguousarray(Wp.imag))
        return _stochastic_estimate_result(
            lambda V: _banded_filter_jit(
                jnp.asarray(A_bands.astype(work_dtype)),
                None if B_bands is None else jnp.asarray(
                    np.asarray(B_bands, work_dtype)),
                Zp, Wp, jnp.asarray(V),
                kl=kl, ku=ku, klb=klb, kub=kub, config=config,
                hermitian=bool(hermitian)),
            N, fpm, work_dtype)
    from ..core.tools import initial_subspace
    from ..utils import cio
    Q0 = initial_subspace(fpm, Q0, N, M0, work_dtype)
    Zne_a = np.asarray(contour.Zne, cdtype)
    Wne_a = np.asarray(contour.Wne, cdtype)
    if pair_f64:
        Zne_a = (np.ascontiguousarray(Zne_a.real),
                 np.ascontiguousarray(Zne_a.imag))
        Wne_a = (np.ascontiguousarray(Wne_a.real),
                 np.ascontiguousarray(Wne_a.imag))
    args = (A_bands.astype(work_dtype),
            None if B_bands is None else np.asarray(B_bands, work_dtype),
            Zne_a, Wne_a)
    statics = dict(kl=kl, ku=ku, klb=klb, kub=kub, config=config,
                   hermitian=bool(hermitian))
    if cio.complex_io_required() and config.mode != 1:
        # Host-driven loop (remote-attachment compile budget / execution
        # watchdog): factor the BCR hierarchies ONCE, then one bounded
        # dispatch per refinement iteration. Dispatches are PIPELINED in
        # chunks: the tunnel's ~30 ms round trip applies per host
        # synchronization, not per dispatch, so issuing two refinement
        # bodies back-to-back and fetching the converged flag once halves
        # the RTT bill (worst case wastes one contractive extra iteration).
        # Operands are device_put ONCE so chained dispatches skip the
        # per-call host->device re-upload.
        from .dense import _host_state
        dargs = tuple(None if a is None else cio.device_operand(a)
                      for a in args)
        state = _host_state(np.asarray(Q0, work_dtype))
        # Shared pipelining protocol (cio.run_pipelined_loop). first_chunk=1:
        # banded problems routinely converge in one refinement loop and a
        # BCR body is cheap, so a speculative second body in the first
        # chunk would usually be wasted work. The first chunk runs FUSED
        # (factor + body + finalize in one program, _banded_first_jit) —
        # the common case is one dispatch + one packed fetch.
        hier_box = {}

        def first_fused(s):
            fin, mid, hier = _banded_first_jit(
                *dargs, s.Q, rdtype(Emin), rdtype(Emax), **statics)
            hier_box["h"] = hier
            return fin, mid

        _, fetched = cio.run_pipelined_loop(
            state,
            lambda s: _banded_body_jit(*dargs, hier_box["h"], s,
                                       rdtype(Emin), rdtype(Emax),
                                       **statics),
            lambda s: _banded_body_jit(*dargs, hier_box["h"], s,
                                       rdtype(Emin), rdtype(Emax),
                                       final=True, **statics),
            max_loops=config.max_loops, first_chunk=1,
            first_fused=first_fused)
        conv, lam, Q, res, inside, epsout, loop = fetched
        info = FeastError.SUCCESS if bool(conv) else FeastError.NO_CONVERGENCE
        return _trim(FeastResult, lam, Q, res, inside,
                     int(info), float(epsout), int(loop) - 1)
    else:
        state = _banded_hermitian_jit(
            *args, Q0, rdtype(Emin), rdtype(Emax), **statics)
    from ..utils.cio import fetch_many
    conv, lam, Q, res, inside, epsout, loop = fetch_many(
        [state.converged, state.lam, state.Q, state.res, state.inside,
         state.epsout, state.loop])
    info = FeastError.SUCCESS if bool(conv) else FeastError.NO_CONVERGENCE
    return _trim(FeastResult, lam, Q, res, inside,
                 int(info), float(epsout), int(loop) - 1)


def feast_sbev(A_bands, kl, ku, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Banded real-symmetric standard problem (parity: feast_sbev!,
    feast_banded.jl:1410-1447). A_bands: full (kl+ku+1, N) band storage."""
    return _banded_interval_driver(A_bands, kl, ku, None, 0, 0,
                                   Emin, Emax, M0, fpm, hermitian=False, **kw)


def feast_sbgv(A_bands, kl, ku, B_bands, klb, kub, Emin, Emax, M0,
               fpm=None, **kw) -> FeastResult:
    """Banded real-symmetric generalized problem (feast_sbgv!,
    feast_banded.jl:9-201)."""
    return _banded_interval_driver(A_bands, kl, ku, B_bands, klb, kub,
                                   Emin, Emax, M0, fpm, hermitian=False, **kw)


def feast_hbev(A_bands, kl, ku, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Banded complex-Hermitian standard problem (feast_hbev!,
    feast_banded.jl:326-418)."""
    return _banded_interval_driver(A_bands, kl, ku, None, 0, 0,
                                   Emin, Emax, M0, fpm, hermitian=True, **kw)


def feast_hbgv(A_bands, kl, ku, B_bands, klb, kub, Emin, Emax, M0,
               fpm=None, **kw) -> FeastResult:
    """Banded complex-Hermitian generalized problem (feast_hbgv!)."""
    return _banded_interval_driver(A_bands, kl, ku, B_bands, klb, kub,
                                   Emin, Emax, M0, fpm, hermitian=True, **kw)


def _banded_general_driver(A_bands, kl, ku, B_bands, klb, kub, Emid, r, M0,
                           fpm, bilinear, eig_method=None, Q0=None
                           ) -> FeastGeneralResult:
    fpm = _ensure_fpm(fpm)
    if eig_method is None:
        # host zgeev callbacks are unsupported through the axon tunnel
        from ..utils import cio as _cio
        eig_method = "qr" if _cio.complex_io_required() else "callback"
    A_bands = np.asarray(A_bands)
    N = A_bands.shape[1]
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not r > 0:
        raise ValueError(f"Contour radius must be positive, got {r}")
    # double-precision WORK requires x64: without it jnp silently casts
    # to f32 while the tolerance still targets 1e-12 (guaranteed info=5)
    f64 = (A_bands.dtype in (np.dtype(np.float64), np.dtype(np.complex128))
           and jax.config.jax_enable_x64)
    if f64:
        from ..ops.splitlu import f64_lu_unavailable, demote_f64_general
        if f64_lu_unavailable():
            demote_f64_general("feast_gb*/sb*_complex (banded general/"
                               "complex-symmetric contour engine)")
            f64 = False
    rdtype = np.float64 if f64 else np.float32
    cdtype = np.complex128 if f64 else np.complex64
    config = FeastConfig.from_fpm(fpm, dtype=cdtype, full_contour=True)
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_gcontour(complex(Emid), float(r), fpm)
    if config.mode == 2:
        # stochastic estimate: the RAW full-contour quadrature sum already
        # has trace(P) = M (feast_parameters.jl:71-75) — weights unscaled
        from .sparse import _stochastic_estimate_result
        Zg = np.asarray(contour.Zne, cdtype)
        Wg = np.asarray(contour.Wne, cdtype)
        res = _stochastic_estimate_result(
            lambda V: _banded_gfilter_jit(
                A_bands.astype(cdtype),
                None if B_bands is None else np.asarray(B_bands, cdtype),
                Zg, Wg, np.asarray(V, cdtype),
                kl=kl, ku=ku, klb=klb, kub=kub, config=config),
            N, fpm, cdtype)
        return FeastGeneralResult(
            np.zeros(0, cdtype), np.zeros((N, 0), cdtype), res.M,
            np.zeros(0), res.info, res.epsout, res.loop)
    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, cdtype, general=True)
    state = _banded_general_jit(
        A_bands.astype(cdtype),
        None if B_bands is None else np.asarray(B_bands, cdtype),
        np.asarray(contour.Zne, cdtype), np.asarray(contour.Wne, cdtype),
        Q0, np.asarray(complex(Emid), cdtype)[()], rdtype(float(r)),
        kl=kl, ku=ku, klb=klb, kub=kub, config=config, bilinear=bilinear,
        eig_method=eig_method)
    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastGeneralResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)), int(fetch(state.loop)) - 1)


def feast_gbev(A_bands, kl, ku, Emid, r, M0, fpm=None, **kw) -> FeastGeneralResult:
    """Banded general standard problem (feast_gbev!, feast_banded.jl:1548-1622)."""
    return _banded_general_driver(A_bands, kl, ku, None, 0, 0, Emid, r, M0,
                                  fpm, bilinear=False, **kw)


def feast_gbgv(A_bands, kl, ku, B_bands, klb, kub, Emid, r, M0, fpm=None,
               **kw) -> FeastGeneralResult:
    """Banded general generalized problem (feast_gbgv!)."""
    return _banded_general_driver(A_bands, kl, ku, B_bands, klb, kub, Emid,
                                  r, M0, fpm, bilinear=False, **kw)


def feast_sbev_complex(A_bands, kl, ku, Emid, r, M0, fpm=None, **kw
                       ) -> FeastGeneralResult:
    """Banded complex-symmetric standard problem (feast_sbev_complex!,
    feast_banded.jl:1469-1545): transpose-bilinear pairing."""
    return _banded_general_driver(A_bands, kl, ku, None, 0, 0, Emid, r, M0,
                                  fpm, bilinear=True, **kw)


def feast_sbgv_complex(A_bands, kl, ku, B_bands, klb, kub, Emid, r, M0,
                       fpm=None, **kw) -> FeastGeneralResult:
    """Banded complex-symmetric generalized problem (feast_sbgv_complex!)."""
    return _banded_general_driver(A_bands, kl, ku, B_bands, klb, kub, Emid,
                                  r, M0, fpm, bilinear=True, **kw)
