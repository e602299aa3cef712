"""Reference-surface compatibility layer.

Every FeastKit.jl export name that is not already provided by the core
modules or the precision-alias table resolves here, mapped onto the
TPU-native machinery (src/FeastKit.jl export list; the MPI surface
feast_mpi.jl:1077-1273, feast_mpi_interface.jl:10-178; the RCI/type
surface feast_types.jl, feast_kernel.jl:296-395; workspace/matfree
surface feast_matfree.jl:157-417; parallel helpers
feast_parallel.jl:299-447, feast_parallel_rci.jl:269-383).

Mapping rules (the TPU-native reinterpretations, stated once):

* MPI communicators -> device meshes. ``comm=None`` means "the default
  contour mesh over all visible devices"; an ``int`` means that many
  devices; a ``jax.sharding.Mesh`` is used as-is. ``root`` is accepted
  and ignored — a jitted mesh program has no rank asymmetry (every
  "rank" computes the reduced problem redundantly in the reference
  anyway, feast_mpi.jl:121-139).
* Threads-per-rank -> a second mesh axis over RHS columns
  (``feast_hybrid``).
* The reference's mutating ``foo!(...)`` convention drops the bang and
  returns results instead of writing into argument arrays.
"""
from __future__ import annotations

import numpy as np

from ..core.types import Contour, FeastError, FeastRCIJob
from ..kernel.rci import (FeastGRCI, FeastHRCI, FeastPolyRCI, FeastPRCI,
                          FeastSRCI)
from ..solvers.matfree import LinearOperator

__all__ = [
    # RCI naming parity
    "FeastSRCIState", "FeastHRCIState", "FeastGRCIState",
    "FeastPolyRCIState", "ParallelFeastState",
    "feast_srci", "feast_hrci", "feast_grci",
    "feast_srcix", "feast_hrcix", "feast_grcix",
    "ifeast_srci", "ifeast_hrci", "ifeast_grci",
    # workspaces / matfree
    "FeastWorkspaceReal", "FeastWorkspaceComplex",
    "allocate_matfree_workspace", "MatrixFreeOperator",
    "feast_matfree_srci", "feast_matfree_grci",
    # validation / info helpers
    "check_feast_srci_input", "feast_banded_info", "feast_sparse_info",
    "full_to_general_banded", "feast_rational_expert",
    # backend conveniences
    "feast_serial", "feast_with_backend", "feast_parallel", "mpi_available",
    # parallel helpers
    "pfeast_sygv", "pfeast_scsrgv", "pfeast_srci",
    "pfeast_compute_all_contour_points", "pfeast_show_distribution",
    "distribute_contour_points",
    # MPI-compat surface
    "MPIFeastState", "mpi_feast", "mpi_feast_general", "feast_hybrid",
    "mpi_feast_heev", "mpi_feast_hegv", "mpi_feast_geev", "mpi_feast_gegv",
    "mpi_feast_hcsrev", "mpi_feast_hcsrgv", "mpi_feast_gcsrev",
    "mpi_feast_gcsrgv",
]


# ---------------------------------------------------------------------------
# RCI naming parity (reference exports both the state structs and the
# step functions; here the state machine class IS both)
# ---------------------------------------------------------------------------

FeastSRCIState = FeastSRCI
FeastHRCIState = FeastHRCI
FeastGRCIState = FeastGRCI
FeastPolyRCIState = FeastPolyRCI
ParallelFeastState = FeastPRCI


def feast_srci(N, M0, Emin, Emax, fpm=None, **kw) -> FeastSRCI:
    """Real-symmetric RCI entry point (parity: feast_srci!,
    feast_kernel.jl:7-293). Returns the state machine; drive it with
    ``job = state.step()`` servicing FACTORIZE/SOLVE/MULT_A/MULT_B."""
    return FeastSRCI(N, M0, Emin, Emax, fpm, **kw)


def feast_hrci(N, M0, Emin, Emax, fpm=None, **kw) -> FeastHRCI:
    """Complex-Hermitian RCI (feast_hrci!, feast_kernel.jl:397-644)."""
    return FeastHRCI(N, M0, Emin, Emax, fpm, **kw)


def feast_grci(N, M0, Emid, r, fpm=None, **kw) -> FeastGRCI:
    """General non-Hermitian RCI (feast_grci!, feast_kernel.jl:646-962)."""
    return FeastGRCI(N, M0, Emid, r, fpm, **kw)


def _rci_x(ctor, args, Zne, Wne, fpm, kw):
    from ..core.aux import with_custom_contour
    from ..core.parameters import _ensure_fpm
    fpm = _ensure_fpm(fpm)
    contour = Contour(np.asarray(Zne, complex), np.asarray(Wne, complex))
    with with_custom_contour(fpm, contour):
        return ctor(*args, fpm, **kw)


def feast_srcix(N, M0, Emin, Emax, fpm, Zne, Wne, **kw) -> FeastSRCI:
    """Custom-contour real-symmetric RCI (feast_srcix!,
    feast_kernel.jl:296-395): the explicit (Zne, Wne) nodes replace the
    elliptical contour for this state machine."""
    return _rci_x(FeastSRCI, (N, M0, Emin, Emax), Zne, Wne, fpm, kw)


def feast_hrcix(N, M0, Emin, Emax, fpm, Zne, Wne, **kw) -> FeastHRCI:
    return _rci_x(FeastHRCI, (N, M0, Emin, Emax), Zne, Wne, fpm, kw)


def feast_grcix(N, M0, Emid, r, fpm, Zne, Wne, **kw) -> FeastGRCI:
    return _rci_x(FeastGRCI, (N, M0, Emid, r), Zne, Wne, fpm, kw)


# The reference's ifeast_*rci are aliases of the direct kernels: the RCI
# protocol already leaves the shifted solve to the CALLER, who chooses
# direct vs iterative (feast_kernel.jl:296-395 "caller chooses").
ifeast_srci = feast_srci
ifeast_hrci = feast_hrci
ifeast_grci = feast_grci


# ---------------------------------------------------------------------------
# Workspaces (feast_types.jl:30-80, feast_matfree.jl:392-417). On TPU the
# drivers are functional (no preallocated buffers needed); these exist for
# callers porting RCI loops that bring their own storage.
# ---------------------------------------------------------------------------

class FeastWorkspaceReal:
    """Preallocated RCI buffers for real-symmetric problems
    (FeastWorkspaceReal{T}, feast_types.jl:30-54)."""

    def __init__(self, N, M0, dtype=np.float64):
        rdt = np.dtype(dtype)
        cdt = np.complex64 if rdt == np.float32 else np.complex128
        self.N, self.M0 = int(N), int(M0)
        self.work = np.zeros((N, M0), rdt)
        self.workc = np.zeros((N, M0), cdt)
        self.Aq = np.zeros((M0, M0), rdt)
        self.Sq = np.zeros((M0, M0), rdt)
        self.lam = np.zeros(M0, rdt)
        self.q = np.zeros((N, M0), rdt)
        self.res = np.zeros(M0, rdt)


class FeastWorkspaceComplex:
    """Preallocated RCI buffers for complex problems
    (FeastWorkspaceComplex{T}, feast_types.jl:56-80)."""

    def __init__(self, N, M0, dtype=np.float64):
        rdt = np.dtype(dtype)
        cdt = np.complex64 if rdt == np.float32 else np.complex128
        self.N, self.M0 = int(N), int(M0)
        self.work = np.zeros((N, M0), rdt)
        self.workc = np.zeros((N, M0), cdt)
        self.zAq = np.zeros((M0, M0), cdt)
        self.zSq = np.zeros((M0, M0), cdt)
        self.lam = np.zeros(M0, rdt)
        self.q = np.zeros((N, M0), cdt)
        self.res = np.zeros(M0, rdt)


def allocate_matfree_workspace(dtype, N, M0):
    """Matrix-free RCI workspace dict (allocate_matfree_workspace,
    feast_matfree.jl:392-417)."""
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        rdt = np.float32 if np.dtype(dtype) == np.complex64 else np.float64
        ws = FeastWorkspaceComplex(N, M0, rdt)
        return dict(work=ws.work, workc=ws.workc,
                    rhs=np.zeros((N, M0), ws.workc.dtype),
                    zAq=ws.zAq, zSq=ws.zSq, lam=ws.lam, q=ws.q, res=ws.res)
    ws = FeastWorkspaceReal(N, M0, dtype)
    return dict(work=ws.work, workc=ws.workc,
                rhs=np.zeros((N, M0), ws.workc.dtype),
                Aq=ws.Aq, Sq=ws.Sq, lam=ws.lam, q=ws.q, res=ws.res)


# Operator-protocol base name: the reference's abstract MatrixFreeOperator
# has exactly one concrete user-facing subtype (LinearOperator,
# feast_matfree.jl:13-134); isinstance checks against either name hold.
MatrixFreeOperator = LinearOperator


def _fpm_with(fpm, maxiter, tol):
    from ..core.parameters import _ensure_fpm
    fpm = _ensure_fpm(fpm)
    if maxiter is not None or tol is not None:
        fpm = fpm.copy()
        if maxiter is not None:
            fpm[4] = int(maxiter)
        if tol is not None:
            fpm[3] = max(int(round(-np.log10(float(tol)))), 1)
    return fpm


def feast_matfree_srci(A_op, B_op, interval, M0, *, fpm=None,
                       linear_solver=None, workspace=None, maxiter=None,
                       tol=None, **kw):
    """Matrix-free symmetric RCI driver (feast_matfree_srci!,
    feast_matfree.jl:157-263). ``linear_solver(z, RHS) -> X`` solves
    (z B - A) X = RHS (the reference's mutating 3-arg callback, returned
    instead of written in place). ``workspace`` is accepted for signature
    parity; the functional driver does not need preallocated buffers."""
    del workspace
    from ..solvers.matfree import feast_matvec
    return feast_matvec(A_op, B_op, interval, M0,
                        _fpm_with(fpm, maxiter, tol),
                        solve_shifted=linear_solver, **kw)


def feast_matfree_grci(A_op, B_op, center, radius, M0, *, fpm=None,
                       linear_solver=None, workspace=None, maxiter=None,
                       tol=None, **kw):
    """Matrix-free general RCI driver (feast_matfree_grci!,
    feast_matfree.jl:275-380)."""
    del workspace
    from ..solvers.matfree import feast_matvec_general
    return feast_matvec_general(A_op, B_op, center, radius, M0,
                                _fpm_with(fpm, maxiter, tol),
                                solve_shifted=linear_solver, **kw)


# ---------------------------------------------------------------------------
# Validation / info helpers
# ---------------------------------------------------------------------------

def check_feast_srci_input(N, M0, Emin, Emax, fpm=None):
    """RCI input validation (check_feast_srci_input,
    feast_aux.jl:369-398)."""
    from ..core.aux import check_feast_input
    check_feast_input(N, M0, Emin=Emin, Emax=Emax)
    if fpm is not None:
        from ..core.parameters import _ensure_fpm
        _ensure_fpm(fpm)
    return True


def feast_banded_info(A_banded, k, N, file=None):
    """Band-storage summary (feast_banded_info, feast_banded.jl:1389-1407).
    Returns (N, bandwidth, stored_elements)."""
    A_banded = np.asarray(A_banded)
    stored = int(A_banded.shape[0] * A_banded.shape[1])
    bandwidth = 2 * int(k) + 1
    pct = stored / float(N * N) * 100.0
    print("Banded Matrix Information:", file=file)
    print(f"  Size: {N} x {N}", file=file)
    print(f"  Bandwidth: {bandwidth}", file=file)
    print(f"  Super-diagonals: {int(k)}", file=file)
    print(f"  Stored elements: {stored}", file=file)
    print(f"  Storage efficiency: {pct:.1f}%", file=file)
    return (int(N), bandwidth, stored)


def feast_sparse_info(A, file=None):
    """Sparse-matrix summary (feast_sparse_info, feast_sparse.jl:1499-1512).
    Returns (N, nnz, density_pct)."""
    N = int(A.shape[0])
    nnz = getattr(A, "nnz", None)        # scipy sparse
    if nnz is None:
        nnz = getattr(A, "nse", None)    # jax BCOO
    if nnz is None:
        nnz = np.count_nonzero(np.asarray(A))
    nnz = int(nnz)
    density = nnz / float(N * N) * 100.0
    print("Sparse Matrix Information:", file=file)
    print(f"  Size: {N} x {N}", file=file)
    print(f"  Non-zeros: {nnz}", file=file)
    print(f"  Density: {density:.2f}%", file=file)
    return (N, nnz, density)


def full_to_general_banded(M, kl, ku):
    """General (kl != ku) band extraction (full_to_general_banded,
    feast_banded.jl:1304); same LAPACK layout as :func:`full_to_banded`,
    which already supports asymmetric bandwidths."""
    from ..ops.banded import full_to_banded
    return full_to_banded(M, kl, ku)


def feast_rational_expert(Zne, Wne, lam):
    """Rational filter at explicit nodes/weights (const feast_rational_expert
    = feast_rationalx, feast_tools.jl:616)."""
    from ..core.contour import feast_rationalx
    return feast_rationalx(Zne, Wne, lam)


# ---------------------------------------------------------------------------
# Backend conveniences (feast_backend_utils.jl:103-209,
# feast_parallel_rci.jl:325-383)
# ---------------------------------------------------------------------------

def feast_serial(A, B, interval, M0, fpm=None, **kw):
    """Serial storage-dispatched solve (feast_serial,
    feast_backend_utils.jl:166-198)."""
    from .feast import feast
    return feast(A, B, interval, M0, fpm, backend="serial", **kw)


def feast_with_backend(backend, A, B, interval, M0, fpm=None, **kw):
    """Explicit-backend solve (feast_with_backend,
    feast_backend_utils.jl:103-121). Reference-era backend names
    (:threads/:distributed/:mpi) all map to the sharded device mesh."""
    from .feast import feast
    return feast(A, B, interval, M0, fpm, backend=backend, **kw)


def feast_parallel(A, B, interval, M0=10, fpm=None, *, use_threads=True,
                   auto_rci=True, **kw):
    """Auto-managed parallel solve (feast_parallel,
    feast_parallel_rci.jl:325-383): the contour-sharded mesh backend with
    serial fallback on single-device attachments."""
    del use_threads, auto_rci          # mesh replaces the thread pool
    from .feast import feast
    backend = "serial" if _n_devices() == 1 else "sharded"
    return feast(A, B, interval, M0, fpm, backend=backend, **kw)


def mpi_available() -> bool:
    """Whether the distributed backend is usable (mpi_available,
    feast_backend_utils.jl:8-10). The mesh backend always is — it degrades
    to a 1-device mesh."""
    return True


def _n_devices() -> int:
    from ..core.backend import _n_devices as nd
    return nd()


# ---------------------------------------------------------------------------
# Parallel helpers (feast_parallel.jl, feast_parallel_rci.jl)
# ---------------------------------------------------------------------------

def pfeast_sygv(A, B, Emin, Emax, M0, fpm=None, **kw):
    """Contour-parallel dense symmetric solve (pfeast_sygv!,
    feast_parallel.jl:58-207) on the device mesh."""
    from ..parallel.pfeast import pfeast_dense
    return pfeast_dense(A, B, Emin, Emax, M0, fpm, **kw)


def pfeast_scsrgv(A, B, Emin, Emax, M0, fpm=None, **kw):
    """Contour-parallel sparse symmetric solve (pfeast_scsrgv!,
    feast_parallel.jl:450-572)."""
    from ..parallel.pfeast import pfeast_sparse
    return pfeast_sparse(A, B, Emin, Emax, M0, fpm, **kw)


def pfeast_srci(N, M0, Emin, Emax, fpm=None, **kw) -> FeastPRCI:
    """Parallel RCI state machine (ParallelFeastState + pfeast_srci!,
    feast_parallel_rci.jl:47-266): one PARALLEL_SOLVE hands the caller all
    contour nodes at once."""
    return FeastPRCI(N, M0, Emin, Emax, fpm, **kw)


def distribute_contour_points(ne, nw):
    """Block partition of ne contour points over nw workers
    (distribute_contour_points, feast_parallel.jl:433-447). Returns a list
    of index ranges (0-based)."""
    ne, nw = int(ne), max(int(nw), 1)
    per = -(-ne // nw)
    return [range(w * per, min((w + 1) * per, ne)) for w in range(nw)
            if w * per < ne]


def pfeast_compute_all_contour_points(state: FeastPRCI, A, B=None):
    """Service a FeastPRCI PARALLEL_SOLVE step on device: batched LU solves
    of every (Z_e B - A) X_e = workc at once (the kernel's
    pfeast_compute_all_contour_points!, feast_parallel_rci.jl:269-322,
    re-expressed as one vmapped MXU factor-solve instead of a thread pool).
    Assigns ``state.Xall`` and returns it."""
    import jax
    A = np.asarray(A)
    N = A.shape[0]
    Bm = np.eye(N, dtype=A.dtype) if B is None else np.asarray(B)
    Z = np.asarray(state.Zall, complex)
    rhs = np.asarray(state.workc, complex)
    if jax.config.jax_enable_x64:
        import jax.numpy as jnp
        pencils = jnp.asarray(Z)[:, None, None] * jnp.asarray(Bm, complex)[None] \
            - jnp.asarray(A, complex)[None]
        X = jnp.linalg.solve(pencils, jnp.broadcast_to(
            jnp.asarray(rhs)[None], (Z.shape[0],) + rhs.shape))
        state.Xall = np.asarray(X)
    else:
        # With x64 off, jnp would silently truncate the complex128 pencils
        # to complex64 and the f64-grade RCI tolerance (10^-fpm[3]) becomes
        # unreachable — service the solves on the host at full precision
        # instead (the RCI contract is exact per-node solves; the reference
        # services them with LAPACK, feast_parallel_rci.jl:269-322).
        pencils = Z[:, None, None] * Bm[None].astype(complex) \
            - A[None].astype(complex)
        state.Xall = np.linalg.solve(
            pencils, np.broadcast_to(rhs[None], (Z.shape[0],) + rhs.shape))
    return state.Xall


def pfeast_show_distribution(ne, *, n_devices=None, use_threads=True,
                             file=None):
    """Print the contour-point -> device partition
    (pfeast_show_distribution, feast_parallel.jl:299-322)."""
    del use_threads                     # devices replace the thread pool
    nd = int(n_devices) if n_devices else _n_devices()
    print(f"Device-mesh distribution for {ne} contour points across "
          f"{nd} devices:", file=file)
    for d, rng in enumerate(distribute_contour_points(ne, nd)):
        print(f"  Device {d}: contour points {rng.start + 1}:{rng.stop}",
              file=file)


# ---------------------------------------------------------------------------
# MPI-compat surface (feast_mpi.jl, feast_mpi_interface.jl): communicators
# become device meshes, Allreduce becomes psum inside the sharded drivers.
# ---------------------------------------------------------------------------

def _mesh_from_comm(comm):
    """None -> default contour mesh; int -> that many devices; Mesh -> as
    is. Anything else (e.g. an mpi4py communicator) is rejected with a
    pointer to the mesh model."""
    if comm is None:
        return None
    if isinstance(comm, (int, np.integer)):
        from ..parallel.pfeast import contour_mesh
        return contour_mesh(int(comm))
    from jax.sharding import Mesh
    if isinstance(comm, Mesh):
        return comm
    raise TypeError(
        f"comm must be None, an int device count, or a jax.sharding.Mesh; "
        f"got {type(comm).__name__}. On TPU the communicator is the device "
        "mesh (SURVEY.md section 5).")


class MPIFeastState:
    """Mesh-backed analog of the reference's per-rank contour bookkeeping
    (MPIFeastState{T}, feast_mpi.jl:9-54): which contour nodes each device
    owns, plus the shared convergence state. ``rank`` is always 0 — the
    host drives every device; per-device slices live in ``local_points``."""

    def __init__(self, N, M0, Zne, Wne, *, comm=None, root=0):
        mesh = _mesh_from_comm(comm)
        self.comm = mesh
        self.size = (int(np.prod(list(mesh.shape.values())))
                     if mesh is not None else _n_devices())
        self.rank = 0
        self.root = int(root)
        self.N, self.M0 = int(N), int(M0)
        Zne = np.asarray(Zne, complex)
        Wne = np.asarray(Wne, complex)
        self.ne = len(Zne)
        parts = distribute_contour_points(self.ne, self.size)
        self.local_points = [list(p) for p in parts]
        self.local_Zne = [Zne[list(p)] for p in parts]
        self.local_Wne = [Wne[list(p)] for p in parts]
        self.converged = False
        self.loop = 0
        self.epsout = np.inf
        self.info = int(FeastError.SUCCESS)


def mpi_feast(A, B=None, interval=None, M0=10, fpm=None, *, comm=None,
              root=0, **kw):
    """Distributed solve, communicator -> device mesh (mpi_feast
    dispatchers, feast_mpi.jl:1077-1197). Accepts the reference's
    2-positional standard form ``mpi_feast(A, interval)``."""
    del root
    if interval is None and isinstance(B, (tuple, list)) and len(B) == 2:
        B, interval = None, B
    if interval is None:
        raise ValueError("interval=(Emin, Emax) is required")
    from .feast import feast
    mesh = _mesh_from_comm(comm)
    if mesh is not None:
        kw["mesh"] = mesh
    return feast(A, B, interval, M0, fpm, backend="mpi", **kw)


def mpi_feast_general(A, B=None, center=0.0 + 0.0j, radius=1.0, M0=10,
                      fpm=None, *, comm=None, root=0, **kw):
    """Distributed general solve (mpi_feast_general,
    feast_mpi.jl:1199-1273)."""
    del root
    from .feast import feast_general
    mesh = _mesh_from_comm(comm)
    if mesh is not None:
        kw["mesh"] = mesh
    return feast_general(A, B, center, radius, M0, fpm, backend="mpi", **kw)


def feast_hybrid(A, B=None, interval=None, M0=10, fpm=None, *, comm=None,
                 use_threads_per_rank=True, **kw):
    """Hybrid MPI x threads -> 2-axis contour x RHS mesh (feast_hybrid,
    feast_mpi_interface.jl:10-178): contour nodes across the first mesh
    axis, RHS columns across the second (the threads-within-a-rank
    analog)."""
    if interval is None and isinstance(B, (tuple, list)) and len(B) == 2:
        B, interval = None, B
    if interval is None:
        raise ValueError("interval=(Emin, Emax) is required")
    from .feast import feast
    mesh = _mesh_from_comm(comm)
    if mesh is None and use_threads_per_rank:
        from ..core.parameters import _ensure_fpm
        from ..parallel.pfeast import contour_rhs_mesh
        nd = _n_devices()
        ne = max(int(_ensure_fpm(fpm)[2]), 1)
        n_contour = 1
        for d in range(min(ne, nd), 0, -1):
            if nd % d == 0:
                n_contour = d
                break
        n_rhs = nd // n_contour
        if n_rhs > 1:
            mesh = contour_rhs_mesh(n_contour, n_rhs)
    if mesh is not None:
        kw["mesh"] = mesh
    return feast(A, B, interval, M0, fpm, backend="mpi", **kw)


def _mpi_kw(comm, root, kw):
    del root
    mesh = _mesh_from_comm(comm)
    if mesh is not None:
        kw["mesh"] = mesh
    return kw


def mpi_feast_hegv(A, B, Emin, Emax, M0, fpm=None, *, comm=None, root=0,
                   **kw):
    """Distributed dense Hermitian generalized solve (mpi_feast_hegv!,
    feast_mpi.jl:925-932) on the contour mesh."""
    from ..parallel.pfeast import pfeast_dense
    return pfeast_dense(A, B, Emin, Emax, M0, fpm, hermitian=True,
                        **_mpi_kw(comm, root, kw))


def mpi_feast_heev(A, Emin, Emax, M0, fpm=None, *, comm=None, root=0, **kw):
    """Distributed dense Hermitian standard solve (mpi_feast_heev!,
    feast_mpi.jl:934-939)."""
    from ..parallel.pfeast import pfeast_dense
    return pfeast_dense(A, None, Emin, Emax, M0, fpm, hermitian=True,
                        **_mpi_kw(comm, root, kw))


def mpi_feast_hcsrgv(A, B, Emin, Emax, M0, fpm=None, *, comm=None, root=0,
                     **kw):
    """Distributed sparse Hermitian generalized solve (mpi_feast_hcsrgv!,
    feast_mpi.jl:911-916)."""
    from ..parallel.pfeast import pfeast_sparse
    return pfeast_sparse(A, B, Emin, Emax, M0, fpm, hermitian=True,
                         **_mpi_kw(comm, root, kw))


def mpi_feast_hcsrev(A, Emin, Emax, M0, fpm=None, *, comm=None, root=0,
                     **kw):
    """Distributed sparse Hermitian standard solve (mpi_feast_hcsrev!,
    feast_mpi.jl:918-923)."""
    from ..parallel.pfeast import pfeast_sparse
    return pfeast_sparse(A, None, Emin, Emax, M0, fpm, hermitian=True,
                         **_mpi_kw(comm, root, kw))


def mpi_feast_gegv(A, B, Emid, r, M0, fpm=None, *, comm=None, root=0, **kw):
    """Distributed dense general solve (mpi_feast_gegv!,
    feast_mpi.jl:1063-1068)."""
    from ..parallel.pfeast import pfeast_general
    return pfeast_general(A, B, Emid, r, M0, fpm,
                          **_mpi_kw(comm, root, kw))


def mpi_feast_geev(A, Emid, r, M0, fpm=None, *, comm=None, root=0, **kw):
    """Distributed dense general standard solve (mpi_feast_geev!,
    feast_mpi.jl:1070-1074)."""
    from ..parallel.pfeast import pfeast_general
    return pfeast_general(A, None, Emid, r, M0, fpm,
                          **_mpi_kw(comm, root, kw))


def mpi_feast_gcsrgv(A, B, Emid, r, M0, fpm=None, *, comm=None, root=0,
                     **kw):
    """Distributed sparse general solve (mpi_feast_gcsrgv!,
    feast_mpi.jl:1048-1053)."""
    from ..parallel.pfeast import pfeast_sparse_general
    return pfeast_sparse_general(A, B, Emid, r, M0, fpm,
                                 **_mpi_kw(comm, root, kw))


def mpi_feast_gcsrev(A, Emid, r, M0, fpm=None, *, comm=None, root=0, **kw):
    """Distributed sparse general standard solve (mpi_feast_gcsrev!,
    feast_mpi.jl:1055-1061)."""
    from ..parallel.pfeast import pfeast_sparse_general
    return pfeast_sparse_general(A, None, Emid, r, M0, fpm,
                                 **_mpi_kw(comm, root, kw))
