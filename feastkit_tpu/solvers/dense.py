"""Dense FEAST drivers: symmetric / Hermitian, standard and generalized.

Counterpart of the reference's ``src/dense/feast_dense.jl`` Hermitian core
(_feast_dense_complex_hermitian :78-351) and its real wrappers
(feast_syev!/sygv! :356-400).

TPU design: the ne shifted matrices (z_e B - A) are factored as ONE batched
(ne, N, N) LU via vmap(lu_factor) — computed once, which is exactly the
reference's ``factor_cache`` reuse semantics (feast_dense.jl:147-148,
190-213). Per refinement loop the hot path is a batched multi-RHS triangular
solve (ne, N, M0) + one einsum for the moment accumulation — MXU-friendly.

Filter realization (see kernel/hermitian.py docstring):
* real symmetric: REAL basis, Q_proj = Re(sum_e 2 W_e X_e) — the mirrored
  half-contour collapses to a real-part extraction because the basis is real
  (Fortran dfeast_srci's real ``work`` array);
* complex Hermitian: Q_proj = sum_e (W_e X_e + conj(W_e) X'_e) where
  X'_e = (conj(z_e) B - A)^{-1} rhs = adjoint-solve on the SAME LU factors
  (Fortran zfeast_hrci ijob=20/21).

Driving modes: fused lax.while_loop program by default; on the axon tunnel
(utils/cio.complex_io_required) the refinement loop runs on the HOST with
three small jitted programs (factor / one-iteration body / spurious verify)
— the fused program exceeds that service's compile budget.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..core.contour import feast_contour
from ..core.parameters import FeastConfig, _ensure_fpm
from ..core.tools import seeded_subspace
from ..core.types import FeastError, FeastResult, _trim
from ..kernel.hermitian import (HermitianState, feast_hermitian_core,
                                init_hermitian_state, make_hermitian_body,
                                verify_spurious)
from ..utils import cio
from ..utils.cio import cjit, fetch

__all__ = ["feast_sygv", "feast_syev", "feast_hegv", "feast_heev",
           "dense_hermitian_feast"]


def _dtypes_of(*arrays):
    """(real_dtype, complex_dtype) for the solve, from input dtypes."""
    dt = jnp.result_type(*[a.dtype for a in arrays])
    if dt in (jnp.float32, jnp.complex64):
        return jnp.float32, jnp.complex64
    return jnp.float64, jnp.complex128


def _shifted_pencils(A, B, Zne, standard: bool):
    """(ne, N, N) stack of z_e B - A in the complex dtype of Zne."""
    N = A.shape[0]
    cdtype = Zne.dtype
    Ac = A.astype(cdtype)
    if standard:
        eye = jnp.eye(N, dtype=cdtype)
        return Zne[:, None, None] * eye[None] - Ac[None]
    return Zne[:, None, None] * B.astype(cdtype)[None] - Ac[None]


def _refine_iters_for(cdtype) -> int:
    """LU iterative-refinement sweeps. The TPU expansion of LU/triangular
    solve carries a ~1e-3 relative backward error in complex64 (bf16-level
    internal products), far above the f32 residual floor; 1-2 refinement
    sweeps with HIGHEST-precision residual matmuls restore ~1e-7. LAPACK
    paths (CPU) don't need it."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    if plat == "cpu":
        return 0
    return 2 if jnp.dtype(cdtype) == jnp.complex64 else 1


def _make_solve_all(A, B, Zne, standard, store_factorization, lu_piv=None,
                    allow_block=True):
    """rhs (N, M0) complex -> X (ne, N, M0) complex, plus the adjoint
    variant. Reuses a single batched LU when store_factorization (fpm[10]=1;
    precomputed factors may be supplied via lu_piv); otherwise factors are
    recomputed per call inside a lax.map (fpm[10]=0 low-memory mode).
    Solves are iteratively refined (see _refine_iters_for).

    ``allow_block``: Hermitian pencils (zB - A with A, B Hermitian and
    Im z != 0 — accretive, growth-bounded without row exchanges) may take
    the MXU-blocked LU (ops/blocklu.py, ~10x the builtin's factor
    throughput at the BASELINE shapes); the general drivers pass False —
    their pencils carry no definiteness structure, so they keep the
    builtin's partial pivoting."""
    cdtype = Zne.dtype
    Ac = A.astype(cdtype)
    Bc = None if standard else B.astype(cdtype)
    n_ref = _refine_iters_for(cdtype)

    def apply_shift(z, X, adjoint=False):
        zz = jnp.conj(z) if adjoint else z
        BX = X if standard else Bc @ X
        return zz * BX - Ac @ X

    def refined(solve1, z, rhs, adjoint):
        X = solve1(rhs)
        for _ in range(n_ref):
            R = rhs - apply_shift(z, X, adjoint)
            X = X + solve1(R)
        return X

    from ..ops.blocklu import block_lu_factor, block_lu_solve, use_block_lu
    if store_factorization and allow_block and use_block_lu(A.shape[0],
                                                            cdtype):
        if lu_piv is None:
            shifted = _shifted_pencils(A, B, Zne, standard)
            lu, piv = block_lu_factor(shifted)
        else:
            lu, piv = lu_piv
        ne = Zne.shape[0]

        def _refined_batch(rhs, adjoint):
            trans = 2 if adjoint else 0
            rhs_b = jnp.broadcast_to(rhs[None].astype(cdtype),
                                     (ne,) + rhs.shape)
            X = block_lu_solve(lu, piv, rhs_b, trans=trans)
            for _ in range(n_ref):
                R = rhs[None].astype(cdtype) - jax.vmap(
                    lambda z, Xe: apply_shift(z, Xe, adjoint))(Zne, X)
                X = X + block_lu_solve(lu, piv, R, trans=trans)
            return X

        return (lambda rhs: _refined_batch(rhs, False),
                lambda rhs: _refined_batch(rhs, True))

    if store_factorization:
        if lu_piv is None:
            shifted = _shifted_pencils(A, B, Zne, standard)
            lu, piv = jax.vmap(jsl.lu_factor)(shifted)
        else:
            lu, piv = lu_piv

        def solve_all(rhs):
            return jax.vmap(lambda l, p, z: refined(
                lambda r: jsl.lu_solve((l, p), r), z, rhs, False))(lu, piv, Zne)

        def solve_all_adjoint(rhs):
            # trans=2 solves (z_e B - A)^H X = (conj(z_e) B - A) X for
            # Hermitian A, B — no second factorization needed.
            return jax.vmap(lambda l, p, z: refined(
                lambda r: jsl.lu_solve((l, p), r, trans=2), z, rhs,
                True))(lu, piv, Zne)
    else:
        shifted = _shifted_pencils(A, B, Zne, standard)

        def solve_all(rhs):
            def one(mz):
                m, z = mz
                f = jsl.lu_factor(m)
                return refined(lambda r: jsl.lu_solve(f, r), z, rhs, False)
            return jax.lax.map(one, (shifted, Zne))

        def solve_all_adjoint(rhs):
            def one(mz):
                m, z = mz
                f = jsl.lu_factor(m)
                return refined(lambda r: jsl.lu_solve(f, r, trans=2), z, rhs,
                               True)
            return jax.lax.map(one, (shifted, Zne))
    return solve_all, solve_all_adjoint


def _make_ops(A, B, Zne, Wne, *, standard, hermitian, store_factorization,
              lu_piv=None):
    """(apply_A, apply_B, filter_apply) for the given operands.

    Pair mode (f64 on TPU, where c128 HLO cannot compile — see
    ops/splitlu.py): ``Zne``/``Wne`` arrive as PLAIN TUPLES of real f64
    arrays ``(sig, tau)`` / ``(Wr, Wi)`` instead of complex arrays; the
    shifted solves run as batched c64 LU + f64 pair-carried iterative
    refinement and the whole program stays c128-free. Only the
    real-symmetric iteration takes this branch (complex-Hermitian f64
    operands are real-embedded by the driver first)."""
    if isinstance(Zne, tuple):
        assert not hermitian, "pair mode serves the real iteration only"
        from ..ops.splitlu import make_pair_solve_all_dense
        from ..core.tools import matmul_accurate
        sig, tau = Zne
        Wr, Wi = Wne
        solve_all, _ = make_pair_solve_all_dense(
            A, B, sig, tau, standard, lu_piv=lu_piv)
        apply_A = lambda X: matmul_accurate(A, X)
        apply_B = (lambda X: X) if standard else \
            (lambda X: matmul_accurate(B, X))

        def filter_apply(Q):
            Xr, Xi, ok = solve_all(apply_B(Q))
            # Re(sum_e 2 W_e X_e) = sum_e 2 (Wr_e Xr_e - Wi_e Xi_e)
            return (jnp.einsum("e,enm->nm", 2.0 * Wr, Xr)
                    - jnp.einsum("e,enm->nm", 2.0 * Wi, Xi)), ok

        return apply_A, apply_B, filter_apply
    cdtype = Zne.dtype
    solve_all, solve_all_adj = _make_solve_all(
        A, B, Zne, standard, store_factorization, lu_piv)
    apply_A = lambda X: A @ X
    apply_B = (lambda X: X) if standard else (lambda X: B @ X)

    if hermitian:
        W = Wne.astype(cdtype)
        Wc = jnp.conj(W)

        def filter_apply(Q):
            rhs = apply_B(Q).astype(cdtype)
            X = solve_all(rhs)
            Xa = solve_all_adj(rhs)
            return (jnp.einsum("e,enm->nm", W, X)
                    + jnp.einsum("e,enm->nm", Wc, Xa))
    else:
        W2 = (2.0 * Wne).astype(cdtype)

        def filter_apply(Q):
            rhs = apply_B(Q).astype(cdtype)
            X = solve_all(rhs)
            return jnp.real(jnp.einsum("e,enm->nm", W2, X)).astype(Q.dtype)

    return apply_A, apply_B, filter_apply


# ---------------------------------------------------------------------------
# Fused path: one program for the whole refinement
# ---------------------------------------------------------------------------

@cjit(static_argnames=("config", "standard", "hermitian"))
def _dense_hermitian_jit(A, B, Zne, Wne, Q0, Emin, Emax, *,
                         config: FeastConfig, standard: bool, hermitian: bool):
    apply_A, apply_B, filter_apply = _make_ops(
        A, B, Zne, Wne, standard=standard, hermitian=hermitian,
        store_factorization=config.store_factorization)
    return feast_hermitian_core(
        apply_A, apply_B, filter_apply, Q0, Emin, Emax,
        tol=config.tol, max_loops=config.max_loops,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1))


# ---------------------------------------------------------------------------
# Host-driven path: three small programs (factor / body / verify)
# ---------------------------------------------------------------------------

@cjit(static_argnames=("config", "standard", "hermitian"))
def _dense_estimate_jit(A, B, Zne, Wne, V, *, config, standard, hermitian):
    """Filtered application P V on Rademacher probes (fpm[14]=2)."""
    _, _, filter_apply = _make_ops(
        A, B, Zne, Wne, standard=standard, hermitian=hermitian,
        store_factorization=config.store_factorization)
    out = filter_apply(V)
    return out[0] if isinstance(out, tuple) else out


@cjit(static_argnames=("standard",))
def _dense_factor_jit(A, B, Zne, *, standard: bool):
    if isinstance(Zne, tuple):           # pair mode: c64 factors (splitlu)
        from ..ops.splitlu import _pair_factor_dense
        sig, tau = Zne
        return _pair_factor_dense(A, B, sig, tau, standard)
    from ..ops.blocklu import block_lu_factor, use_block_lu
    shifted = _shifted_pencils(A, B, Zne, standard)
    if use_block_lu(A.shape[0], Zne.dtype):
        return block_lu_factor(shifted)
    return jax.vmap(jsl.lu_factor)(shifted)


@cjit(static_argnames=("config", "standard", "hermitian"))
def _dense_body_jit(A, B, lu, piv, Zne, Wne, state, Emin, Emax, *,
                    config: FeastConfig, standard: bool, hermitian: bool):
    apply_A, apply_B, filter_apply = _make_ops(
        A, B, Zne, Wne, standard=standard, hermitian=hermitian,
        store_factorization=config.store_factorization,
        lu_piv=(lu, piv) if config.store_factorization else None)
    body = make_hermitian_body(
        apply_A, apply_B, filter_apply, Emin, Emax, tol=config.tol,
        convergence_criterion=config.convergence_criterion)
    return body(state)


@cjit(static_argnames=("config", "standard", "hermitian", "mode"))
def _dense_finalize_jit(A, B, lu, piv, Zne, Wne, state, *, config,
                        standard: bool, hermitian: bool, mode: str = "verify"):
    apply_A, apply_B, filter_apply = _make_ops(
        A, B, Zne, Wne, standard=standard, hermitian=hermitian,
        store_factorization=config.store_factorization,
        lu_piv=(lu, piv) if config.store_factorization else None)
    if mode == "subspace":
        from ..core.tools import orthonormalize
        from ..kernel.hermitian import _filter_with_ok
        Qp, ok = _filter_with_ok(filter_apply, state.Q)
        U, _, _ = orthonormalize(Qp)
        return state._replace(Q=U, loop=jnp.int32(1),
                              inner_ok=jnp.asarray(state.inner_ok) & ok)
    return verify_spurious(state, filter_apply)


def _host_state(Q0):
    """Initial HermitianState with host-numpy leaves."""
    M0 = Q0.shape[1]
    rdtype = np.float32 if Q0.dtype in (np.dtype(np.float32),
                                        np.dtype(np.complex64)) else np.float64
    return HermitianState(
        loop=np.int32(0), Q=Q0,
        lam=np.zeros(M0, rdtype), res=np.full(M0, np.inf, rdtype),
        inside=np.zeros(M0, bool), epsout=rdtype(np.inf),
        trace=rdtype(np.nan), converged=np.bool_(False))


def _run_host_loop(A, B, Zne, Wne, Q0, Emin, Emax, *, config, standard,
                   hermitian):
    # Device-resident operands: chained dispatches below reuse them without
    # per-call host->device re-upload (the dominant warm-solve cost through
    # slow links).
    same = B is A                  # standard problems pass A as the dummy B
    A = cio.device_operand(A)
    B = A if same else cio.device_operand(B)
    if config.store_factorization:
        lu, piv = _dense_factor_jit(A, B, Zne, standard=standard)
    else:
        lu = piv = None
    state = _host_state(Q0)
    if config.mode == 1:     # subspace-only
        return _dense_finalize_jit(A, B, lu, piv, Zne, Wne, state,
                                   config=config, standard=standard,
                                   hermitian=hermitian,
                                   mode="subspace"), None
    # Chunked pipelining protocol shared with the general/banded drivers —
    # see cio.run_pipelined_loop.
    return cio.run_pipelined_loop(
        state,
        lambda s: _dense_body_jit(A, B, lu, piv, Zne, Wne, s, Emin, Emax,
                                  config=config, standard=standard,
                                  hermitian=hermitian),
        lambda s: _dense_finalize_jit(A, B, lu, piv, Zne, Wne, s,
                                      config=config, standard=standard,
                                      hermitian=hermitian),
        max_loops=config.max_loops)


def _host_complex(X):
    """Materialize an operand as host numpy: exactly cio.fetch (ComplexPair
    forms reassemble from their f64 parts, which transfer fine even on
    complex-I/O-limited links)."""
    return np.asarray(fetch(X))


def _dense_embedded_hermitian(A, B, Emin, Emax, M0, fpm, *, contour,
                              Q0) -> FeastResult:
    """Complex-Hermitian f64 where c128 HLO cannot compile (XLA:TPU):
    solve the real-symmetric block embedding ``[[Ar, -Ai], [Ai, Ar]]``
    (same spectrum, doubled multiplicity) on the c128-free real-f64 pair
    engine, then collapse the doubled eigenpairs to complex ones
    (ops/splitlu.py). Parity target: feast_heev!/hegv! at full f64 on the
    chip (reference: feast_dense.jl:78-351 via LAPACK zgetrf)."""
    from ..ops.splitlu import (embed_hermitian_dense,
                               finish_embedded_interval,
                               map_embedded_subspace)
    Ah = _host_complex(A).astype(np.complex128)
    N = Ah.shape[0]
    standard = B is None
    EA = embed_hermitian_dense(Ah)
    Bh = None if standard else _host_complex(B).astype(np.complex128)
    EB = None if standard else embed_hermitian_dense(Bh)
    M0e = min(2 * M0, 2 * N)
    Q0e = None if Q0 is None else map_embedded_subspace(
        _host_complex(Q0), M0e, interleaved=False)
    r = dense_hermitian_feast(EA, EB, Emin, Emax, M0e, fpm,
                              contour=contour, Q0=Q0e, hermitian=False)
    return finish_embedded_interval(
        r, N, M0, _ensure_fpm(fpm), interleaved=False,
        apply_A=lambda X: Ah @ X,
        apply_B=None if standard else (lambda X: Bh @ X))


def dense_hermitian_feast(A, B, Emin, Emax, M0, fpm=None, *, contour=None,
                          Q0=None, hermitian=None) -> FeastResult:
    """Shared dense symmetric/Hermitian driver (host wrapper around the jits).

    ``hermitian=False`` runs the all-real iteration (feast_sygv!'s
    promote/strip round trip, feast_dense.jl:356-400, without the pointless
    promotion: only the shifted solves are complex)."""
    fpm = _ensure_fpm(fpm)
    # Operands: host numpy (the cjit boundary handles device placement +
    # complex-I/O safety per dispatch) OR device-resident forms from
    # cio.device_operand (jax.Array / ComplexPair) — those skip the
    # per-dispatch host->device re-upload, which dominates warm solve time
    # on slow-link platforms (the axon tunnel moves ~30 MB/s: a 2048^2 f32
    # operand costs ~0.5 s per upload).
    A = A if cio.is_operand(A) else np.asarray(A)
    standard = B is None
    if not standard:
        B = B if cio.is_operand(B) else np.asarray(B)
    shA = cio.op_shape(A)
    N = shA[0]
    if len(shA) != 2 or shA[1] != N:
        raise ValueError(f"A must be square, got {shA}")
    if not standard and cio.op_shape(B) != shA:
        raise ValueError(f"B must match A: {shA} vs {cio.op_shape(B)}")
    if N <= 0:
        return FeastResult(np.zeros(0), np.zeros((0, 0)), 0, np.zeros(0),
                           FeastError.ERROR_N, 0.0, 0)
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not Emax > Emin:
        raise ValueError(f"Emin={Emin} must be < Emax={Emax}")

    dt_in = [cio.op_dtype(A)] + ([] if standard else [cio.op_dtype(B)])
    in_complex = bool(jnp.issubdtype(jnp.result_type(*dt_in),
                                     jnp.complexfloating))
    if jnp.result_type(*dt_in) in (jnp.float32, jnp.complex64):
        rdtype, cdtype = jnp.float32, jnp.complex64
    else:
        rdtype, cdtype = jnp.float64, jnp.complex128
    if hermitian is None:
        hermitian = cio.op_iscomplex(A) or (not standard
                                            and cio.op_iscomplex(B))
    work_dtype = np.dtype(str(jnp.dtype(cdtype if hermitian else rdtype)))
    A = cio.op_astype(A, work_dtype)
    if not standard:
        B = cio.op_astype(B, work_dtype)

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    if contour is None:
        from ..core.aux import feast_get_custom_contour
        contour = feast_get_custom_contour(fpm)  # fpm[29] registry
    if contour is None:
        contour = feast_contour(Emin, Emax, fpm)
    cdtype_np = np.dtype(str(jnp.dtype(cdtype)))
    rdtype_np = np.float32 if cdtype_np == np.complex64 else np.float64
    # f64 on a platform whose XLA cannot compile c128 / f64 LU (every TPU
    # backend): complex-Hermitian operands run via the real block embedding;
    # real-symmetric operands run the c128-free pair engine (ops/splitlu.py)
    from ..ops.splitlu import f64_lu_unavailable
    pair_f64 = cdtype_np == np.complex128 and f64_lu_unavailable()
    if pair_f64 and hermitian:
        if not in_complex:
            # real data declared hermitian: same math on the real pair
            # engine — no need to double the problem via the embedding
            hermitian = False
            work_dtype = np.dtype(str(jnp.dtype(rdtype)))

            def _to_real(X):
                if isinstance(X, cio.ComplexPair):
                    return X.re.astype(work_dtype)
                if isinstance(X, jax.Array):
                    return jnp.real(X).astype(work_dtype)
                return np.ascontiguousarray(np.asarray(X).real,
                                            dtype=work_dtype)

            A = _to_real(A)
            if not standard:
                B = _to_real(B)
        else:
            return _dense_embedded_hermitian(A, B, Emin, Emax, M0, fpm,
                                             contour=contour, Q0=Q0)
    Zne = np.asarray(contour.Zne, dtype=cdtype_np)
    Wne = np.asarray(contour.Wne, dtype=cdtype_np)
    if pair_f64:
        Zne = (np.ascontiguousarray(Zne.real), np.ascontiguousarray(Zne.imag))
        Wne = (np.ascontiguousarray(Wne.real), np.ascontiguousarray(Wne.imag))
    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, work_dtype)

    B_arg = B if not standard else A    # dummy keeps jit signature fixed

    if config.mode == 2:
        # Stochastic eigenvalue-count estimate (fpm[14]=2, fpm[32] trials):
        # M_est = E[v^T P v] over Rademacher probes through the SAME
        # quadrature filter (feast_parameters.jl:71-75, :274-277).
        trials = max(fpm[32], 1)
        rng_probe = np.random.default_rng((N * 31 + trials) % (2**31 - 1))
        V = rng_probe.choice([-1.0, 1.0], size=(N, trials)).astype(work_dtype)
        PV = fetch(_dense_estimate_jit(A, B_arg, Zne, Wne, V, config=config,
                                       standard=standard,
                                       hermitian=bool(hermitian)))
        est = float(np.einsum("nt,nt->", np.real(V), np.real(PV)) / trials)
        M_est = max(int(round(est)), 0)
        return FeastResult(np.zeros(0), np.zeros((N, 0)), M_est, np.zeros(0),
                           FeastError.SUCCESS, float(est), 1)

    # Small problems skip the host-driven loop even on remote attachments:
    # the fused whole-refinement while_loop program compiles fast and
    # executes in microseconds, so the solve costs ONE synchronization
    # round trip instead of one per 2-loop chunk (the round trip, ~30 ms
    # through the tunnel, dominates the wall time at this size).
    fused_small = N <= config.fused_small_n
    fetched = None
    if cio.complex_io_required() and not fused_small:
        state, fetched = _run_host_loop(A, B_arg, Zne, Wne, Q0,
                                        rdtype_np(Emin), rdtype_np(Emax),
                                        config=config, standard=standard,
                                        hermitian=bool(hermitian))
    else:
        state = _dense_hermitian_jit(A, B_arg, Zne, Wne, Q0,
                                     rdtype_np(Emin), rdtype_np(Emax),
                                     config=config, standard=standard,
                                     hermitian=bool(hermitian))

    conv, lam, Q, res, inside, epsout, loop = fetched or cio.fetch_many(
        [state.converged, state.lam, state.Q, state.res, state.inside,
         state.epsout, state.loop])
    info = FeastError.SUCCESS if bool(conv) else FeastError.NO_CONVERGENCE
    return _trim(FeastResult, lam, Q, res, inside,
                 int(info), float(epsout), int(loop) - 1)


def feast_sygv(A, B, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Dense real-symmetric generalized A x = lam B x on [Emin, Emax]
    (parity: feast_sygv!, feast_dense.jl:356-375)."""
    return dense_hermitian_feast(A, B, Emin, Emax, M0, fpm,
                                 hermitian=False, **kw)


def feast_syev(A, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Dense real-symmetric standard problem (feast_syev!)."""
    return dense_hermitian_feast(A, None, Emin, Emax, M0, fpm,
                                 hermitian=False, **kw)


def feast_hegv(A, B, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Dense complex-Hermitian generalized problem (feast_hegv!/hbgv pattern);
    eigenvectors stay complex (feast_kernel.jl:543-547)."""
    return dense_hermitian_feast(A, B, Emin, Emax, M0, fpm,
                                 hermitian=True, **kw)


def feast_heev(A, Emin, Emax, M0, fpm=None, **kw) -> FeastResult:
    """Dense complex-Hermitian standard problem (feast_heev!)."""
    return dense_hermitian_feast(A, None, Emin, Emax, M0, fpm,
                                 hermitian=True, **kw)
