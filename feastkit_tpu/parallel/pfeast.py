"""Contour-sharded FEAST over a device mesh: the PFEAST replacement.

Counterpart of the reference's three parallel backends (src/parallel/
feast_parallel.jl threads, Distributed; feast_mpi.jl MPI) behind one
mechanism — SURVEY.md section 5: "mesh axis `contour` over ICI, shard_map-ed
per-node solves, jax.lax.psum for moments (replaces MPI.Allreduce), reduced
eigensolve replicated on every device (replaces every-rank-solves-redundantly,
which is already the reference's consistency trick, feast_mpi.jl:121-139)".

Design:
* The quadrature nodes are block-partitioned across the mesh axis — the
  analog of MPIFeastState's contour slices (feast_mpi.jl:32-53). ne is padded
  to a multiple of the axis size with zero-weight nodes (a zero weight
  contributes nothing to the moment sum, so padding is exact).
* Every device runs the full refinement while_loop on the replicated
  subspace; the only communication is one psum of the (N, M0) filtered
  subspace per refinement loop — communication volume identical to the
  reference's Allreduce of Q_proj (SURVEY.md section 5).
* The initial subspace is seeded from the same PRNGKey everywhere, so the
  reference's MPI.Bcast! of the seed subspace (feast_mpi.jl:100) is free.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.sharding import Mesh, PartitionSpec as P

from ..core.contour import feast_contour
from ..core.parameters import FeastConfig, _ensure_fpm
from ..core.tools import seeded_subspace
from ..core.types import FeastError, FeastResult, _trim
from ..kernel.hermitian import feast_hermitian_core
from ..solvers.dense import _dtypes_of, _shifted_pencils
from ..utils.cio import cjit, fetch

__all__ = ["contour_mesh", "contour_rhs_mesh", "contour_model_mesh",
           "pad_contour", "pfeast_dense", "pfeast_sparse", "pfeast_general",
           "pfeast_sparse_general"]

AXIS = "contour"
RHS_AXIS = "rhs"
MODEL_AXIS = "model"


def contour_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the contour axis (the reference's L2 communicator,
    fpm[9])."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def contour_rhs_mesh(n_contour: int, n_rhs: int, devices=None) -> Mesh:
    """2-D mesh (contour x rhs): contour nodes on one axis, RHS columns on
    the other — the second scalability axis of SURVEY.md section 5 (the
    reference only exploits M0 implicitly via multi-RHS LAPACK calls)."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_contour * n_rhs]).reshape(n_contour, n_rhs)
    return Mesh(devices, (AXIS, RHS_AXIS))


def contour_model_mesh(n_contour: int, n_model: int, n_rhs: int = 1,
                       devices=None) -> Mesh:
    """Mesh with a MODEL axis sharding the operator rows N — the third
    scalability axis (SURVEY.md section 5 axis 3; the reference's recognized
    PFEAST L3 gap, docs/feast_parity_report.md:21-26). Optional middle rhs
    axis: (contour, rhs, model)."""
    if devices is None:
        devices = jax.devices()
    n = n_contour * n_rhs * n_model
    devices = np.array(devices[:n])
    if n_rhs > 1:
        return Mesh(devices.reshape(n_contour, n_rhs, n_model),
                    (AXIS, RHS_AXIS, MODEL_AXIS))
    return Mesh(devices.reshape(n_contour, n_model), (AXIS, MODEL_AXIS))


def _dia_halo_matvec(diags_loc, X, offsets, axis, n_shards):
    """Row-sharded DIA matvec inside shard_map: the local row block plus
    halo rows exchanged with mesh neighbors over ``axis`` (ppermute; edge
    devices receive zeros = the zero-boundary convention). diags_loc is the
    local (nd, n_loc) slice of the row-aligned diagonals."""
    h = max(max(abs(int(o)) for o in offsets), 1) if offsets else 1
    n_loc = X.shape[0]
    upper, lower = X[:h], X[-h:]
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    from_prev = jax.lax.ppermute(lower, axis, fwd)
    from_next = jax.lax.ppermute(upper, axis, bwd)
    x_ext = jnp.concatenate([from_prev, X, from_next], axis=0)
    y = jnp.zeros(X.shape, jnp.result_type(diags_loc.dtype, X.dtype))
    for k, off in enumerate(offsets):
        o = int(off)
        y = y + diags_loc[k][:, None] * jax.lax.dynamic_slice_in_dim(
            x_ext, h + o, n_loc, axis=0)
    return y


def pad_contour(Zne, Wne, n_shards: int):
    """Pad node/weight arrays to a multiple of the mesh axis size.

    Zero-weight padding is exact (the padded solves are computed and
    discarded by the weighted sum). Padded nodes reuse the first node so the
    padded pencil stays factorizable. This replaces the reference's
    block+remainder partition (distribute_contour_points,
    feast_parallel.jl:433-447) with an even-shard constraint.
    """
    ne = len(Zne)
    pad = (-ne) % n_shards
    if pad:
        Zne = np.concatenate([np.asarray(Zne), np.repeat(np.asarray(Zne[:1]), pad)])
        Wne = np.concatenate([np.asarray(Wne), np.zeros(pad, np.asarray(Wne).dtype)])
    return Zne, Wne


@cjit(static_argnames=("config", "standard", "hermitian", "mesh"))
def _pfeast_dense_jit(A, B, Zne, Wne, Q0, Emin, Emax, *,
                      config: FeastConfig, standard: bool, hermitian: bool,
                      mesh: Mesh):
    """Sharded dense FEAST: contour nodes sharded over the mesh axis, the
    refinement loop replicated, one psum of the filtered subspace per loop."""

    has_rhs_axis = RHS_AXIS in mesh.axis_names
    n_rhs = mesh.shape[RHS_AXIS] if has_rhs_axis else 1

    def device_program(A, B, Zl, Wl, Q0, Emin, Emax):
        # Local factor cache over this device's contour slice.
        shifted = _shifted_pencils(A, B, Zl, standard)
        if config.store_factorization:
            lu, piv = jax.vmap(jsl.lu_factor)(shifted)
            solve = lambda rhs: jax.vmap(
                lambda l, p: jsl.lu_solve((l, p), rhs))(lu, piv)
            solve_adj = lambda rhs: jax.vmap(
                lambda l, p: jsl.lu_solve((l, p), rhs, trans=2))(lu, piv)
        else:
            solve = lambda rhs: jax.lax.map(
                lambda m: jsl.lu_solve(jsl.lu_factor(m), rhs), shifted)
            solve_adj = lambda rhs: jax.lax.map(
                lambda m: jsl.lu_solve(jsl.lu_factor(m), rhs, trans=2), shifted)

        apply_A = lambda X: A @ X
        apply_B = (lambda X: X) if standard else (lambda X: B @ X)
        cdtype = Zl.dtype

        def rhs_local(Q):
            """Slice this device's RHS-column block (2-axis meshes only)."""
            if not has_rhs_axis:
                return Q
            m_loc = Q.shape[1] // n_rhs
            j = jax.lax.axis_index(RHS_AXIS)
            return jax.lax.dynamic_slice_in_dim(Q, j * m_loc, m_loc, axis=1)

        def rhs_gather(Qp):
            if not has_rhs_axis:
                return Qp
            return jax.lax.all_gather(Qp, RHS_AXIS, axis=1, tiled=True)

        if hermitian:
            W = Wl.astype(cdtype)

            def filter_apply(Q):
                rhs = apply_B(rhs_local(Q))
                local = (jnp.einsum("e,enm->nm", W, solve(rhs))
                         + jnp.einsum("e,enm->nm", jnp.conj(W), solve_adj(rhs)))
                return rhs_gather(jax.lax.psum(local, AXIS))
        else:
            W2 = (2.0 * Wl).astype(cdtype)

            def filter_apply(Q):
                rhs = apply_B(rhs_local(Q)).astype(cdtype)
                local = jnp.real(
                    jnp.einsum("e,enm->nm", W2, solve(rhs))).astype(Q.dtype)
                return rhs_gather(jax.lax.psum(local, AXIS))

        return feast_hermitian_core(
            apply_A, apply_B, filter_apply, Q0, Emin, Emax,
            tol=config.tol, max_loops=config.max_loops,
            convergence_criterion=config.convergence_criterion,
            subspace_only=(config.mode == 1),
        )

    sharded = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(), P(), P()),
        out_specs=P(),          # state identical on every device
        check_vma=False,
    )
    return sharded(A, B, Zne, Wne, Q0, Emin, Emax)


@cjit(static_argnames=("config", "standard", "hermitian", "mesh"))
def _pfeast_dense_filter_jit(A, B, Zne, Wne, V, *, config: FeastConfig,
                             standard: bool, hermitian: bool, mesh: Mesh):
    """Raw sharded filtered application P V (stochastic-estimate probes,
    fpm[14]=2 on a contour mesh)."""

    def device_program(A, B, Zl, Wl, V):
        shifted = _shifted_pencils(A, B, Zl, standard)
        lu, piv = jax.vmap(jsl.lu_factor)(shifted)
        solve = lambda rhs: jax.vmap(
            lambda l, p: jsl.lu_solve((l, p), rhs))(lu, piv)
        solve_adj = lambda rhs: jax.vmap(
            lambda l, p: jsl.lu_solve((l, p), rhs, trans=2))(lu, piv)
        apply_B = (lambda X: X) if standard else (lambda X: B @ X)
        cdtype = Zl.dtype
        if hermitian:
            W = Wl.astype(cdtype)
            rhs = apply_B(V)
            local = (jnp.einsum("e,enm->nm", W, solve(rhs))
                     + jnp.einsum("e,enm->nm", jnp.conj(W), solve_adj(rhs)))
        else:
            W2 = (2.0 * Wl).astype(cdtype)
            rhs = apply_B(V).astype(cdtype)
            local = jnp.real(
                jnp.einsum("e,enm->nm", W2, solve(rhs))).astype(V.dtype)
        return jax.lax.psum(local, AXIS)

    sharded = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(A, B, Zne, Wne, V)


def pfeast_dense(A, B, Emin, Emax, M0, fpm=None, *, hermitian=None,
                 contour=None, Q0=None, mesh=None, n_devices=None) -> FeastResult:
    """Dense symmetric/Hermitian FEAST with contour-point parallelism over a
    device mesh (parity surface: pfeast_sygv!/pfeast_scsrgv!/mpi_feast)."""
    fpm = _ensure_fpm(fpm)
    if mesh is None:
        mesh = contour_mesh(n_devices)

    A = np.asarray(A)
    standard = B is None
    if not standard:
        B = np.asarray(B)
    N = A.shape[0]
    rdtype, cdtype = _dtypes_of(A) if standard else _dtypes_of(A, B)
    rdtype, cdtype = np.dtype(str(jnp.dtype(rdtype))), np.dtype(str(jnp.dtype(cdtype)))
    if hermitian is None:
        hermitian = np.iscomplexobj(A) or (
            not standard and np.iscomplexobj(B))
    work_dtype = cdtype if hermitian else rdtype
    if cdtype == np.dtype(np.complex128):
        # the mesh drivers' per-node shifted solves are complex programs;
        # c128 cannot compile on XLA:TPU (ops/splitlu.py). The sharded
        # polynomial engines (solver="cheb"/"contour_poly" via
        # pfeast_sparse) carry f64 natively; this per-node direct engine
        # demotes with a warning (FEAST_STRICT_F64=1 raises).
        from ..ops.splitlu import f64_lu_unavailable, demote_f64_general
        if f64_lu_unavailable():
            demote_f64_general("pfeast_dense (sharded per-node contour "
                               "engine)")
            cdtype = np.dtype(np.complex64)
            rdtype = np.dtype(np.float32)
            work_dtype = cdtype if hermitian else rdtype
    A = A.astype(work_dtype)
    if not standard:
        B = B.astype(work_dtype)

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    if contour is None:
        from ..core.aux import feast_get_custom_contour
        contour = feast_get_custom_contour(fpm)
    if contour is None:
        contour = feast_contour(Emin, Emax, fpm)
    n_contour_shards = mesh.shape[AXIS]
    if RHS_AXIS in mesh.axis_names:
        # pad M0 to a multiple of the rhs axis (extra random columns are
        # harmless oversampling)
        n_rhs = mesh.shape[RHS_AXIS]
        M0 = M0 + ((-M0) % n_rhs)
    Zp, Wp = pad_contour(contour.Zne, contour.Wne, n_contour_shards)
    Zne = np.asarray(Zp, dtype=cdtype)
    Wne = np.asarray(Wp, dtype=cdtype)

    if config.mode == 2:
        # stochastic estimate through the sharded filter (fpm[14]=2)
        if RHS_AXIS in mesh.axis_names:
            raise NotImplementedError(
                "stochastic estimate (fpm[14]=2) is supported on contour "
                "meshes only; drop the rhs axis")
        from ..solvers.sparse import _stochastic_estimate_result

        def filt(V):
            with mesh:
                return _pfeast_dense_filter_jit(
                    A, B if not standard else A, Zne, Wne,
                    np.asarray(V, work_dtype), config=config,
                    standard=standard, hermitian=bool(hermitian), mesh=mesh)
        return _stochastic_estimate_result(filt, N, fpm, work_dtype)

    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, work_dtype)

    with mesh:
        state = _pfeast_dense_jit(
            A, B if not standard else A, Zne, Wne, Q0,
            rdtype.type(Emin), rdtype.type(Emax),
            config=config, standard=standard, hermitian=bool(hermitian),
            mesh=mesh)

    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)),
                 int(fetch(state.loop)) - 1,
                 inner_ok=bool(fetch(state.inner_ok)))


# ---------------------------------------------------------------------------
# Contour-sharded GENERAL FEAST (parity: _mpi_feast_complex_general!,
# feast_mpi.jl:941-1046, dispatch mpi_feast_general :1199-1273)
# ---------------------------------------------------------------------------

@cjit(static_argnames=("config", "standard", "bilinear", "eig_method", "mesh"))
def _pfeast_general_jit(A, B, Zne, Wne, Q0, Emid, r, *, config: FeastConfig,
                        standard: bool, bilinear: bool, eig_method: str,
                        mesh: Mesh):
    """Sharded dense general FEAST: full-contour nodes sharded over the mesh
    axis, Q_proj psum'd per loop, reduced Rayleigh-Ritz replicated on every
    device (the reference's every-rank-solves-redundantly consistency trick,
    feast_mpi.jl:1001-1007)."""
    from ..kernel.general import feast_general_core

    def device_program(A, B, Zl, Wl, Q0, Emid, r):
        shifted = _shifted_pencils(A, B, Zl, standard)
        if config.store_factorization:
            lu, piv = jax.vmap(jsl.lu_factor)(shifted)
            solve = lambda rhs: jax.vmap(
                lambda l, p: jsl.lu_solve((l, p), rhs))(lu, piv)
        else:
            solve = lambda rhs: jax.lax.map(
                lambda m: jsl.lu_solve(jsl.lu_factor(m), rhs), shifted)

        apply_A = lambda X: A @ X
        apply_B = (lambda X: X) if standard else (lambda X: B @ X)

        def filter_apply(Q):
            local = jnp.einsum("e,enm->nm", Wl, solve(apply_B(Q)))
            return jax.lax.psum(local, AXIS)

        return feast_general_core(
            apply_A, apply_B, filter_apply, Q0, Emid, r,
            tol=config.tol, max_loops=config.max_loops,
            aspect_ratio=config.aspect_ratio,
            rotation_deg=config.rotation_deg,
            convergence_criterion=config.convergence_criterion,
            subspace_only=(config.mode == 1), bilinear=bilinear,
            eig_method=eig_method)

    sharded = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(A, B, Zne, Wne, Q0, Emid, r)


@cjit(static_argnames=("config", "standard", "mesh"))
def _pfeast_general_filter_jit(A, B, Zne, Wne, V, *, config: FeastConfig,
                               standard: bool, mesh: Mesh):
    """Raw sharded full-contour filtered application P V (fpm[14]=2 on a
    contour mesh; trace(P) = M holds for oblique projectors too)."""

    def device_program(A, B, Zl, Wl, V):
        shifted = _shifted_pencils(A, B, Zl, standard)
        lu, piv = jax.vmap(jsl.lu_factor)(shifted)
        solve = lambda rhs: jax.vmap(
            lambda l, p: jsl.lu_solve((l, p), rhs))(lu, piv)
        apply_B = (lambda X: X) if standard else (lambda X: B @ X)
        local = jnp.einsum("e,enm->nm", Wl, solve(apply_B(V)))
        return jax.lax.psum(local, AXIS)

    sharded = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(A, B, Zne, Wne, V)


def pfeast_general(A, B, Emid, r, M0, fpm=None, *, bilinear=False,
                   eig_method=None, contour=None, Q0=None, mesh=None,
                   n_devices=None, **kw):
    """Dense general/complex-symmetric FEAST with contour-point parallelism
    over a device mesh (parity: _mpi_feast_complex_general! +
    mpi_feast_general, feast_mpi.jl:941-1046, :1199-1273). Sparse operands
    route to :func:`pfeast_sparse_general`."""
    from ..core.types import FeastGeneralResult
    from ..solvers.sparse import _peek_dtype as _pd

    def _is_sparse(M):
        from jax.experimental import sparse as jsparse
        if isinstance(M, jsparse.BCOO):
            return True
        try:
            import scipy.sparse as sp
            return sp.issparse(M)
        except ImportError:
            return False

    if _is_sparse(A):
        return pfeast_sparse_general(A, B, Emid, r, M0, fpm,
                                     bilinear=bilinear,
                                     eig_method=eig_method, contour=contour,
                                     Q0=Q0, mesh=mesh, n_devices=n_devices,
                                     **kw)
    from ..core.contour import feast_gcontour
    fpm = _ensure_fpm(fpm)
    if mesh is None:
        mesh = contour_mesh(n_devices)
    if eig_method is None:
        from ..utils import cio as _cio
        eig_method = "qr" if _cio.complex_io_required() else "callback"
    A = np.asarray(A)
    standard = B is None
    if not standard:
        B = np.asarray(B)
    N = A.shape[0]
    f64 = A.dtype in (np.dtype(np.float64), np.dtype(np.complex128)) or (
        not standard and B.dtype in (np.dtype(np.float64),
                                     np.dtype(np.complex128)))
    if f64:
        from ..ops.splitlu import f64_lu_unavailable, demote_f64_general
        if f64_lu_unavailable():
            demote_f64_general("pfeast_dense_general (sharded full-contour "
                               "engine)")
            f64 = False
    cdtype = np.complex128 if f64 else np.complex64
    rdtype = np.float64 if f64 else np.float32
    A = A.astype(cdtype)
    if not standard:
        B = B.astype(cdtype)
    config = FeastConfig.from_fpm(fpm, dtype=cdtype, full_contour=True)
    if contour is None:
        from ..core.aux import feast_get_custom_contour
        contour = feast_get_custom_contour(fpm)
    if contour is None:
        contour = feast_gcontour(complex(Emid), float(r), fpm)
    Zp, Wp = pad_contour(contour.Zne, contour.Wne, mesh.shape[AXIS])

    if config.mode == 2:
        # stochastic estimate through the sharded full-contour filter: the
        # RAW quadrature sum of the oblique projector already has
        # trace(P) = M (no half-contour doubling to cancel here)
        from ..core.types import FeastGeneralResult as _FGR
        from ..solvers.sparse import _stochastic_estimate_result
        Zg = np.asarray(Zp, cdtype)
        Wg = np.asarray(Wp, cdtype)

        def filt(V):
            with mesh:
                return _pfeast_general_filter_jit(
                    A, B if not standard else A, Zg, Wg,
                    np.asarray(V, cdtype), config=config,
                    standard=standard, mesh=mesh)
        res = _stochastic_estimate_result(filt, N, fpm, cdtype)
        return _FGR(np.zeros(0, cdtype), np.zeros((N, 0), cdtype), res.M,
                    np.zeros(0), res.info, res.epsout, res.loop)

    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, cdtype, general=True)

    with mesh:
        state = _pfeast_general_jit(
            A, B if not standard else A,
            np.asarray(Zp, cdtype), np.asarray(Wp, cdtype), Q0,
            np.asarray(complex(Emid), cdtype)[()], rdtype(float(r)),
            config=config, standard=standard, bilinear=bool(bilinear),
            eig_method=str(eig_method), mesh=mesh)

    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastGeneralResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)),
                 int(fetch(state.loop)) - 1,
                 inner_ok=bool(fetch(state.inner_ok)))


@cjit(static_argnames=("shape", "config", "standard", "bilinear",
                       "eig_method", "solver", "solver_tol", "solver_maxiter",
                       "solver_restart", "offsets_A", "offsets_B",
                       "use_pallas", "precond", "mg_A", "mg_B", "mesh"))
def _pfeast_sparse_general_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                               diagA, diagB, Zne, Wne, Q0,
                               Emid, r, *, shape, config, standard, bilinear,
                               eig_method, solver, solver_tol, solver_maxiter,
                               solver_restart, offsets_A=None, offsets_B=None,
                               use_pallas=False, precond="jacobi",
                               mg_A=None, mg_B=None, mesh: Mesh = None):
    """Sparse general FEAST with contour nodes sharded over the mesh: each
    device runs the FULL-STRENGTH serial general machinery
    (_sparse_general_ops: DIA fast paths, Jacobi/multigrid preconditioning,
    mixed-precision complex64 Krylov + IR under fpm[42]) on its node slice;
    one psum of the filtered subspace per refinement loop plus a pmin
    success consensus — per-device solves exactly as strong as the serial
    driver's (the reference's per-rank solves are full UMFPACK,
    feast_mpi.jl:288-420)."""
    from ..kernel.general import feast_general_core
    from ..solvers.sparse import _sparse_general_ops

    def device_program(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA,
                       diagB, Zl, Wl, Q0, Emid, r):
        apply_A, apply_B, filter_partial = _sparse_general_ops(
            A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
            Zl.dtype, shape=shape, config=config, standard=standard,
            solver=solver, solver_tol=solver_tol,
            solver_maxiter=solver_maxiter, solver_restart=solver_restart,
            offsets_A=offsets_A, offsets_B=offsets_B, use_pallas=use_pallas,
            precond=precond, mg_A=mg_A, mg_B=mg_B)

        def filter_apply(Q, lam=None, tol_hint=None):
            local, conv = filter_partial(Zl, Wl, apply_B(Q), Q=Q, lam=lam,
                                         tol_hint=tol_hint)
            ok = jnp.all(conv)
            all_ok = jax.lax.pmin(ok.astype(jnp.int32), AXIS) > 0
            return jax.lax.psum(local, AXIS), all_ok

        filter_apply.takes_ritz = bool(config.warm_start)
        filter_apply.takes_tol = bool(config.adaptive_inner_tol)
        return feast_general_core(
            apply_A, apply_B, filter_apply, Q0, Emid, r,
            tol=config.tol, max_loops=config.max_loops,
            aspect_ratio=config.aspect_ratio,
            rotation_deg=config.rotation_deg,
            convergence_criterion=config.convergence_criterion,
            subspace_only=(config.mode == 1), bilinear=bilinear,
            eig_method=eig_method)

    sharded = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(),
                  P(AXIS), P(AXIS), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
                   Zne, Wne, Q0, Emid, r)


def pfeast_sparse_general(A, B, Emid, r, M0, fpm=None, *, bilinear=False,
                          eig_method=None, contour=None, Q0=None, mesh=None,
                          n_devices=None, solver="gmres", solver_tol=None,
                          solver_maxiter=500, solver_restart=30,
                          grid=None, precond=None):
    """Sparse general/complex-symmetric FEAST, contour nodes sharded over
    the mesh (the reference's recognized MPI gap closed the TPU way:
    feast_mpi.jl has no sparse-general driver; here the same psum machinery
    serves it)."""
    from ..core.contour import feast_gcontour
    from ..core.parameters import ifeast_solver_options
    from ..core.types import FeastGeneralResult
    from ..solvers.sparse import (_is_double, _peek_dtype, _solver_fn,
                                  sparse_coo_arrays)
    fpm = _ensure_fpm(fpm)
    iopts = ifeast_solver_options(fpm) or {}
    if iopts:
        solver = iopts["solver"] if solver == "gmres" else solver
        solver_tol = iopts["solver_tol"] if solver_tol is None else solver_tol
        solver_maxiter = iopts["solver_maxiter"] \
            if solver_maxiter == 500 else solver_maxiter
    solver = _solver_fn(solver)
    if int(fpm[14]) == 2:
        # stochastic estimate is a single filter application — the serial
        # sparse-general estimate path serves it at mesh-equivalent cost.
        # Thread EVERY inner-solve hint through; an explicit contour rides
        # the fpm[29] registry (sparse_feast_general has no contour kwarg).
        from ..core.aux import (feast_clear_custom_contour,
                                feast_set_custom_contour)
        from ..solvers.sparse import sparse_feast_general
        scoped = contour is not None
        fpm_est = fpm.copy() if scoped else fpm
        if scoped:
            feast_set_custom_contour(fpm_est, contour)
        try:
            return sparse_feast_general(A, B, Emid, r, M0, fpm_est,
                                        bilinear=bilinear,
                                        eig_method=eig_method or "callback",
                                        solver=solver, solver_tol=solver_tol,
                                        solver_maxiter=solver_maxiter,
                                        solver_restart=solver_restart,
                                        grid=grid, precond=precond)
        finally:
            if scoped:
                feast_clear_custom_contour(fpm_est)
    if mesh is None:
        mesh = contour_mesh(n_devices)
    if eig_method is None:
        from ..utils import cio as _cio
        eig_method = "qr" if _cio.complex_io_required() else "callback"

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
    from ..solvers.sparse import _plan_mg, _structured_forms
    (A_dia, offsets_A, B_dia, offsets_B, diagA, diagB, use_pallas,
     precond_auto, mg_A, mg_B) = _structured_forms(
         A_data, A_idx, B_data, B_idx, N, standard, cdtype, grid=grid)
    precond, mg_A, mg_B = _plan_mg(
        mg_A, mg_B, float(np.real(complex(Emid))) + float(r), precond_auto,
        precond)
    config = FeastConfig.from_fpm(fpm, dtype=cdtype, full_contour=True)
    if solver_tol is None:
        solver_tol = max(config.tol * 0.1, 10 * float(np.finfo(rdtype).eps))
    if contour is None:
        from ..core.aux import feast_get_custom_contour
        contour = feast_get_custom_contour(fpm)
    if contour is None:
        contour = feast_gcontour(complex(Emid), float(r), fpm)
    Zp, Wp = pad_contour(contour.Zne, contour.Wne, mesh.shape[AXIS])
    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, cdtype, general=True)

    with mesh:
        state = _pfeast_sparse_general_jit(
            A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
            np.asarray(Zp, cdtype), np.asarray(Wp, cdtype), Q0,
            np.asarray(complex(Emid), cdtype)[()], rdtype(float(r)),
            shape=tuple(shape), config=config, standard=standard,
            bilinear=bool(bilinear), eig_method=str(eig_method),
            solver=str(solver), solver_tol=float(solver_tol),
            solver_maxiter=int(solver_maxiter),
            solver_restart=int(solver_restart), offsets_A=offsets_A,
            offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
            mg_A=mg_A, mg_B=mg_B, mesh=mesh)

    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastGeneralResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)),
                 int(fetch(state.loop)) - 1,
                 inner_ok=bool(fetch(state.inner_ok)))


# ---------------------------------------------------------------------------
# Contour-sharded sparse FEAST (pfeast_scsrgv!/mpi_feast_scsrgv! parity)
# ---------------------------------------------------------------------------

_PSPARSE_STATICS = ("shape", "config", "standard", "hermitian", "solver",
                    "solver_tol", "solver_maxiter", "solver_restart",
                    "offsets_A", "offsets_B", "use_pallas", "precond",
                    "mg_A", "mg_B", "mesh")


@cjit(static_argnames=_PSPARSE_STATICS)
def _pfeast_sparse_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA,
                       diagB, Zr, Zi, Wr, Wi, Q0, Emin, Emax, *, shape,
                       config, standard, hermitian, solver, solver_tol,
                       solver_maxiter, solver_restart, offsets_A=None,
                       offsets_B=None, use_pallas=False, precond="jacobi",
                       mg_A=None, mg_B=None, mesh: Mesh = None):
    """Sparse FEAST with contour nodes sharded over the mesh: each device
    runs the FULL-STRENGTH serial inner machinery (_sparse_ops: geometric-
    multigrid preconditioning, mixed-precision pair-IR, DIA fast paths) on
    its node slice; one psum of the filtered subspace per refinement loop
    (the MPI.Allreduce analog) plus a pmin success consensus — per-device
    solves are exactly as strong as the reference's per-rank UMFPACK solves
    (feast_mpi.jl:288-420,423-466)."""
    from ..solvers.sparse import _sparse_ops

    def device_program(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA,
                       diagB, Zr, Zi, Wr, Wi, Q0, Emin, Emax):
        apply_A, apply_B, filter_local = _sparse_ops(
            A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
            Zr, Zi, Wr, Wi, shape=shape, config=config, standard=standard,
            hermitian=hermitian, solver=solver, solver_tol=solver_tol,
            solver_maxiter=solver_maxiter, solver_restart=solver_restart,
            offsets_A=offsets_A, offsets_B=offsets_B, use_pallas=use_pallas,
            precond=precond, mg_A=mg_A, mg_B=mg_B)

        def filter_apply(Q, lam=None, tol_hint=None):
            local, ok = filter_local(Q, lam, tol_hint)
            all_ok = jax.lax.pmin(
                jnp.asarray(ok).astype(jnp.int32), AXIS) > 0
            return jax.lax.psum(local, AXIS), all_ok

        filter_apply.takes_ritz = (bool(config.warm_start)
                                   and getattr(filter_local, "takes_ritz",
                                               False))
        filter_apply.takes_tol = (bool(config.adaptive_inner_tol)
                                  and getattr(filter_local, "takes_tol",
                                              False))
        return feast_hermitian_core(
            apply_A, apply_B, filter_apply, Q0, Emin, Emax,
            tol=config.tol, max_loops=config.max_loops,
            convergence_criterion=config.convergence_criterion,
            subspace_only=(config.mode == 1))

    sharded = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(),
                  P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
                   Zr, Zi, Wr, Wi, Q0, Emin, Emax)


@cjit(static_argnames=_PSPARSE_STATICS)
def _pfeast_sparse_filter_jit(A_data, A_idx, B_data, B_idx, A_dia, B_dia,
                              diagA, diagB, Zr, Zi, Wr, Wi, V, *, shape,
                              config, standard, hermitian, solver,
                              solver_tol, solver_maxiter, solver_restart,
                              offsets_A=None, offsets_B=None,
                              use_pallas=False, precond="jacobi",
                              mg_A=None, mg_B=None, mesh: Mesh = None):
    """Raw sharded filtered application P V (stochastic-estimate probes,
    fpm[14]=2, on a contour mesh — feast_parameters.jl:71-75)."""
    from ..solvers.sparse import _sparse_ops

    def device_program(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA,
                       diagB, Zr, Zi, Wr, Wi, V):
        _, _, filter_local = _sparse_ops(
            A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
            Zr, Zi, Wr, Wi, shape=shape, config=config, standard=standard,
            hermitian=hermitian, solver=solver, solver_tol=solver_tol,
            solver_maxiter=solver_maxiter, solver_restart=solver_restart,
            offsets_A=offsets_A, offsets_B=offsets_B, use_pallas=use_pallas,
            precond=precond, mg_A=mg_A, mg_B=mg_B)
        out = filter_local(V)
        acc = out[0] if isinstance(out, tuple) else out
        return jax.lax.psum(acc, AXIS)

    sharded = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(),
                  P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB,
                   Zr, Zi, Wr, Wi, V)


@cjit(static_argnames=("shape", "config", "standard", "hermitian", "solver",
                       "solver_tol", "solver_maxiter", "solver_restart",
                       "offsets_A", "offsets_B", "precond", "mg_A", "mg_B",
                       "mesh"))
def _pfeast_sparse_model_jit(A_dia, B_dia, diagA, diagB, Zr, Zi, Wr, Wi, Q0,
                             Emin, Emax, *, shape, config, standard,
                             hermitian, solver, solver_tol, solver_maxiter,
                             solver_restart, offsets_A, offsets_B, precond,
                             mg_A=None, mg_B=None, mesh: Mesh = None):
    """Sparse FEAST with BOTH contour nodes and operator ROWS sharded
    (contour x model mesh): per-device local row blocks with halo-exchange
    DIA matvecs, psum-reduced Krylov contractions (gmres axis_name), the
    Gram-based Rayleigh-Ritz core (nsum over the model axis), and one psum
    of the filtered subspace over the contour axis per loop. The N-sharding
    axis the reference never built (its PFEAST L3 gap,
    docs/feast_parity_report.md:21-26).

    The full-strength inner machinery composes with the mesh: the
    mixed-precision pair-IR runs collective-aware (residual norms psum'd
    over the model axis, IR trip counts pmax-synchronized over all mesh
    axes) and the multigrid V-cycle preconditioner runs via
    all_gather-over-model + replicated full-grid V-cycle + local-row slice
    (exact math; the stencil tables are compile-time constants)."""
    from ..solvers.sparse import _make_sparse_solve_all, _mixed_enabled

    n_model = mesh.shape[MODEL_AXIS]
    sync = tuple(mesh.axis_names)

    def device_program(A_dia, B_dia, diagA, diagB, Zr, Zi, Wr, Wi, Q0l,
                       Emin, Emax):
        cdtype = jnp.complex128 if Zr.dtype == jnp.float64 else jnp.complex64
        mixed = _mixed_enabled(config, cdtype)
        real_pair = mixed and not hermitian

        def mk(D, offs, dt_d=None, dt_x=None):
            Dd = D if dt_d is None else D.astype(dt_d)

            def f(X):
                Xx = X if dt_x is None else X.astype(dt_x)
                return _dia_halo_matvec(Dd, Xx, offs, MODEL_AXIS, n_model)
            return f

        # real operands stay REAL under complex casts (the halo matvec's
        # result_type handles real-diags x complex-X); the c64 Krylov path
        # needs f32 diags so products stay complex64
        lo_d = (jnp.complex64 if jnp.iscomplexobj(A_dia) else jnp.float32)
        apply_A = mk(A_dia, offsets_A)
        apply_A_c = mk(A_dia, offsets_A, dt_x=cdtype)
        apply_A_lo = mk(A_dia, offsets_A, dt_d=lo_d) if mixed else None
        apply_B_lo = None
        if standard:
            apply_B = lambda X: X
            apply_B_c = None
        else:
            apply_B = mk(B_dia, offsets_B)
            apply_B_c = mk(B_dia, offsets_B, dt_x=cdtype)
            if mixed:
                lo_b = (jnp.complex64 if jnp.iscomplexobj(B_dia)
                        else jnp.float32)
                apply_B_lo = mk(B_dia, offsets_B, dt_d=lo_b)

        filter_partial = _make_sparse_solve_all(
            apply_A_c, apply_B_c, standard, solver=solver,
            solver_tol=solver_tol, solver_maxiter=solver_maxiter,
            solver_restart=solver_restart, diagA=diagA,
            diagB=None if standard else diagB,
            precond=precond, flag_tol=config.tol, mg_A=mg_A, mg_B=mg_B,
            mixed=mixed, ir_max=config.ir_max,
            mg_opts=(config.mg_nu_pre, config.mg_nu_post, config.mg_omega,
                     config.mg_cycles),
            apply_A_lo=apply_A_lo, apply_B_lo=apply_B_lo,
            apply_A_re=apply_A, apply_B_re=None if standard else apply_B,
            axis_name=MODEL_AXIS, sync_axes=sync,
            prec_gather_axis=MODEL_AXIS)

        nsum = lambda x: jax.lax.psum(x, MODEL_AXIS)

        def consensus(conv):
            ok = jnp.all(conv)
            return jax.lax.pmin(ok.astype(jnp.int32), sync) > 0

        if real_pair:
            def filter_apply(Q, lam=None, tol_hint=None):
                acc, conv = filter_partial.pair(Zr, Zi, 2.0 * Wr, 2.0 * Wi,
                                                apply_B(Q), Q=Q, lam=lam,
                                                tol_hint=tol_hint)
                return jax.lax.psum(acc, AXIS), consensus(conv)
        elif hermitian:
            Zne = jax.lax.complex(Zr, Zi)
            Wne = jax.lax.complex(Wr, Wi)
            Zall = jnp.concatenate([Zne, jnp.conj(Zne)])
            Wall = jnp.concatenate([Wne, jnp.conj(Wne)])

            def filter_apply(Q, lam=None, tol_hint=None):
                local, conv = filter_partial(Zall, Wall, apply_B(Q),
                                             Q=Q, lam=lam,
                                             tol_hint=tol_hint)
                return jax.lax.psum(local, AXIS), consensus(conv)
        else:
            Zall = jax.lax.complex(Zr, Zi)
            Wall = 2.0 * jax.lax.complex(Wr, Wi)

            def filter_apply(Q, lam=None, tol_hint=None):
                local, conv = filter_partial(Zall, Wall,
                                             apply_B(Q).astype(cdtype),
                                             Q=Q, lam=lam,
                                             tol_hint=tol_hint)
                return (jax.lax.psum(jnp.real(local).astype(Q.dtype), AXIS),
                        consensus(conv))

        filter_apply.takes_ritz = bool(config.warm_start)
        filter_apply.takes_tol = bool(config.adaptive_inner_tol)
        return feast_hermitian_core(
            apply_A, apply_B, filter_apply, Q0l, Emin, Emax,
            tol=config.tol, max_loops=config.max_loops,
            convergence_criterion=config.convergence_criterion,
            subspace_only=(config.mode == 1), nsum=nsum)

    from ..kernel.hermitian import HermitianState
    out_specs = HermitianState(
        loop=P(), Q=P(MODEL_AXIS), lam=P(), res=P(), inside=P(),
        epsout=P(), trace=P(), converged=P(), inner_ok=P())
    sharded = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(None, MODEL_AXIS), P(MODEL_AXIS),
                  P(MODEL_AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P(MODEL_AXIS), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return sharded(A_dia, B_dia, diagA, diagB, Zr, Zi, Wr, Wi, Q0,
                   Emin, Emax)


def pfeast_sparse(A, B, Emin, Emax, M0, fpm=None, *, hermitian=None,
                  contour=None, Q0=None, mesh=None, n_devices=None,
                  solver="gmres", solver_tol=None, solver_maxiter=500,
                  solver_restart=30, grid=None, precond=None) -> FeastResult:
    """Sparse symmetric/Hermitian FEAST with contour-point parallelism
    (parity: pfeast_scsrgv! threads/Distributed, mpi_feast_scsrgv! MPI).

    Runs the SAME full-strength inner machinery as the serial sparse driver
    (multigrid preconditioning where the operands form grid stencils,
    mixed-precision pair iterative refinement under fpm[42], DIA fast
    paths) with contour nodes block-partitioned over the mesh — matching
    the reference's full-strength per-rank solves (feast_mpi.jl:288-466)."""
    from ..core.parameters import ifeast_solver_options
    from ..solvers.sparse import (_is_double, _peek_dtype, _plan_mg,
                                  _sparse_embedded_hermitian,
                                  _structured_forms, sparse_coo_arrays)
    fpm = _ensure_fpm(fpm)
    # complex-Hermitian f64 cannot exist as c128 HLO on XLA:TPU: run the
    # interleaved real embedding through THIS sharded driver's real path
    # (any solver, incl. cheb/contour_poly) and collapse — the SAME shared
    # implementation as sparse_feast_interval; this gate must sit BEFORE
    # the polynomial-solver early return so solver="cheb" embeds too
    _in_complex = np.iscomplexobj(_peek_dtype(A)) or (
        B is not None and np.iscomplexobj(_peek_dtype(B)))
    _in_f64 = _is_double(_peek_dtype(A).dtype) and jax.config.jax_enable_x64
    if _in_f64 and (hermitian or (hermitian is None and _in_complex)):
        from ..ops.splitlu import f64_lu_unavailable
        if f64_lu_unavailable():
            if not _in_complex:
                hermitian = False        # real data: same math, real path
            else:
                import functools as _ft
                return _sparse_embedded_hermitian(
                    A, B, Emin, Emax, M0, fpm, solver=solver,
                    solver_tol=solver_tol, solver_maxiter=solver_maxiter,
                    solver_restart=solver_restart, Q0=Q0,
                    driver=_ft.partial(pfeast_sparse, mesh=mesh,
                                       n_devices=n_devices,
                                       contour=contour, grid=grid,
                                       precond=precond))
    if solver in ("cheb", ":cheb", "contour_poly", ":contour_poly"):
        # The polynomial filters have no contour nodes to block-partition;
        # their parallel axes are the RHS columns and the row (N)
        # dimension, which the dedicated driver exploits via GSPMD column
        # sharding of the subspace (solvers/sparse._sparse_cheb_interval).
        # "contour_poly" keeps the EXACT quadrature semantics (the
        # rational filter expanded over the shared Chebyshev basis).
        from ..solvers.sparse import _sparse_cheb_interval
        contour_r = None
        if solver in ("contour_poly", ":contour_poly"):
            from ..core.aux import feast_get_custom_contour
            from ..core.contour import feast_contour as _fc
            contour_r = (contour or feast_get_custom_contour(fpm)
                         or _fc(Emin, Emax, fpm))
        return _sparse_cheb_interval(A, B, Emin, Emax, M0, fpm,
                                     hermitian=hermitian, Q0=Q0, mesh=mesh,
                                     contour=contour_r)
    # IFEAST inner-solver knobs (fpm[43..46]) flow to the sharded inner
    # solves exactly as to the serial ones (feast_parameters.jl:321-339)
    iopts = ifeast_solver_options(fpm) or {}
    if iopts:
        solver = iopts["solver"] if solver == "gmres" else solver
        solver_tol = iopts["solver_tol"] if solver_tol is None else solver_tol
        solver_maxiter = iopts["solver_maxiter"] \
            if solver_maxiter == 500 else solver_maxiter
    if mesh is None:
        mesh = contour_mesh(n_devices)

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
        B_data, B_idx = A_data, A_idx
    else:
        B_data, B_idx, _ = sparse_coo_arrays(B, work_dtype)

    (A_dia, offsets_A, B_dia, offsets_B, diagA, diagB, use_pallas,
     precond_auto, mg_A, mg_B) = _structured_forms(
         A_data, A_idx, B_data, B_idx, N, standard, work_dtype, grid=grid)
    precond, mg_A, mg_B = _plan_mg(mg_A, mg_B, float(Emax), precond_auto,
                                   precond)

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    if solver_tol is None:
        solver_tol = max(config.tol * 0.02, 10 * float(np.finfo(rdtype).eps))
    if contour is None:
        from ..core.aux import feast_get_custom_contour
        contour = feast_get_custom_contour(fpm)
    if contour is None:
        contour = feast_contour(Emin, Emax, fpm)
    Zp, Wp = pad_contour(contour.Zne, contour.Wne, mesh.shape[AXIS])
    Zp = np.asarray(Zp, np.complex128)
    Wp = np.asarray(Wp, np.complex128)
    comp = (np.ascontiguousarray(Zp.real, rdtype),
            np.ascontiguousarray(Zp.imag, rdtype),
            np.ascontiguousarray(Wp.real, rdtype),
            np.ascontiguousarray(Wp.imag, rdtype))
    from ..core.tools import initial_subspace
    Q0 = initial_subspace(fpm, Q0, N, M0, work_dtype)

    statics = dict(
        shape=tuple(shape), config=config, standard=standard,
        hermitian=bool(hermitian), solver=str(solver),
        solver_tol=float(solver_tol), solver_maxiter=int(solver_maxiter),
        solver_restart=int(solver_restart), offsets_A=offsets_A,
        offsets_B=offsets_B, use_pallas=use_pallas, precond=precond,
        mg_A=mg_A, mg_B=mg_B, mesh=mesh)
    arrs = (A_data, A_idx, B_data, B_idx, A_dia, B_dia, diagA, diagB) + comp

    if config.mode == 2 and MODEL_AXIS not in mesh.axis_names:
        # stochastic estimate through the SHARDED filter (fpm[14]=2 on a
        # mesh — feast_parameters.jl:71-75 applies the mode per driver)
        from ..solvers.sparse import _stochastic_estimate_result

        def filt(V):
            with mesh:
                return _pfeast_sparse_filter_jit(
                    *arrs, np.asarray(V, work_dtype), **statics)
        return _stochastic_estimate_result(filt, N, fpm, work_dtype)

    if MODEL_AXIS in mesh.axis_names:
        # Row-sharded (model-axis) path: requires DIA structure so halo
        # matvecs are expressible; rows must divide evenly over the axis.
        if offsets_A is None or (not standard and offsets_B is None):
            raise ValueError(
                "model-axis sharding requires operators with DIA "
                "(few-diagonal/stencil) structure; got unstructured sparse")
        nm = mesh.shape[MODEL_AXIS]
        if N % nm != 0:
            raise ValueError(f"N={N} must divide evenly over the model axis "
                             f"({nm} shards)")
        h = max(max(abs(int(o)) for o in offsets_A), 1)
        if N // nm < h:
            raise ValueError("model shards smaller than the operator "
                             "bandwidth; reduce the model axis size")
        if standard:
            B_dia = np.zeros((1, N), work_dtype)
            offsets_B = (0,)
        if config.mode == 2:
            raise NotImplementedError(
                "stochastic estimate (fpm[14]=2) on a model-sharded mesh is "
                "not supported; use a contour-only mesh")
        with mesh:
            state = _pfeast_sparse_model_jit(
                A_dia, B_dia, diagA.astype(work_dtype),
                diagB.astype(work_dtype), *comp,
                np.asarray(Q0, work_dtype), rdtype(Emin), rdtype(Emax),
                shape=tuple(shape), config=config, standard=standard,
                hermitian=bool(hermitian), solver=str(solver),
                solver_tol=float(solver_tol),
                solver_maxiter=int(solver_maxiter),
                solver_restart=int(solver_restart), offsets_A=offsets_A,
                offsets_B=offsets_B, precond=precond, mg_A=mg_A, mg_B=mg_B,
                mesh=mesh)
        info = FeastError.SUCCESS if bool(fetch(state.converged)) \
            else FeastError.NO_CONVERGENCE
        return _trim(FeastResult, fetch(state.lam), fetch(state.Q),
                     fetch(state.res), fetch(state.inside),
                     int(info), float(fetch(state.epsout)),
                     int(fetch(state.loop)) - 1,
                     inner_ok=bool(fetch(state.inner_ok)))

    with mesh:
        state = _pfeast_sparse_jit(
            *arrs, np.asarray(Q0, work_dtype), rdtype(Emin), rdtype(Emax),
            **statics)

    info = FeastError.SUCCESS if bool(fetch(state.converged)) else FeastError.NO_CONVERGENCE
    return _trim(FeastResult, fetch(state.lam), fetch(state.Q),
                 fetch(state.res), fetch(state.inside),
                 int(info), float(fetch(state.epsout)),
                 int(fetch(state.loop)) - 1,
                 inner_ok=bool(fetch(state.inner_ok)))
