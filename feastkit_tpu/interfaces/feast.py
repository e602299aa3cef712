"""High-level user API: ``feast``, ``eigvals_feast``, ``eigen_feast``, etc.

Counterpart of the reference's ``src/interfaces/feast_interfaces.jl``:
feast 4 methods (:143-272), feast_general (:274-379), validation helpers
(_ensure_feast_parameters :6-18, feast_validate_interval :567-641),
feast_summary (:542-561), feast_set_defaults! (:484-512).
"""
from __future__ import annotations

import sys
import warnings

import numpy as np

from ..core.parameters import FeastParameters, _ensure_fpm, feastinit
from ..core.types import FeastResult, FeastGeneralResult
from ..solvers import dense as _dense

__all__ = [
    "feast", "feast_general", "feast_banded", "feast_polynomial",
    "feast_custom_contour", "eigvals_feast",
    "eigen_feast", "feast_summary", "feast_validate_interval",
    "feast_set_defaults",
]

_VALID_BACKENDS = ("auto", "serial", "sharded", "threads", "distributed", "mpi")


def _resolve_backend(backend, parallel, strict_backend, *,
                     auto_sharded=False, operand="dense"):
    """Normalize + strictly select the execution backend for ANY operand
    type (parity: _select_parallel_backend + feast_with_backend,
    feast_backend_utils.jl:52-121).

    auto_sharded: whether backend='auto' may pick the sharded mesh for this
    operand class. Mirrors the reference's supported-problem matrix (sparse
    problems parallelize under :auto; dense requires an explicit backend,
    feast_backend_utils.jl:103-121 'dense threaded disabled').
    """
    from ..core.backend import _n_devices, select_parallel_backend
    backend = _normalize_backend(backend, parallel)
    if backend == "auto":
        return "sharded" if (auto_sharded and _n_devices() > 1) else "serial"
    return select_parallel_backend(backend,
                                   allow_fallback=not strict_backend)


def _normalize_backend(backend, parallel):
    """Reconcile the modern ``backend=`` kwarg with the legacy ``parallel=``
    flag (feast_interfaces.jl:27-47): both set and conflicting -> error."""
    if parallel is not None:
        legacy = "sharded" if parallel else "serial"
        if backend is not None and str(backend) != legacy:
            raise ValueError(
                f"Conflicting parallel={parallel} and backend={backend!r}; "
                "use backend= only")
        backend = legacy
    if backend is None:
        backend = "auto"
    backend = str(backend).lstrip(":")
    if backend not in _VALID_BACKENDS:
        raise ValueError(f"Unknown backend {backend!r}; valid: {_VALID_BACKENDS}")
    # threads/distributed/mpi are reference-era names; on TPU they all map to
    # the sharded contour backend (SURVEY.md section 5 'distributed
    # communication backend').
    if backend in ("threads", "distributed", "mpi"):
        backend = "sharded"
    return backend


def feast_validate_interval(A, Emin, Emax, *, warn=True):
    """Gershgorin-disc sanity check of the search interval
    (feast_interfaces.jl:567-641). Returns (lo, hi) Gershgorin bounds."""
    A = np.asarray(A)
    d = np.real(np.diag(A))
    radii = np.abs(A).sum(axis=1) - np.abs(np.diag(A))
    lo, hi = float((d - radii).min()), float((d + radii).max())
    if warn and (Emax < lo or Emin > hi):
        warnings.warn(
            f"Search interval [{Emin}, {Emax}] lies outside the Gershgorin "
            f"bounds [{lo:.4g}, {hi:.4g}]; no eigenvalues can be found there.",
            stacklevel=3)
    return lo, hi


def _is_sparse(A):
    from jax.experimental import sparse as jsparse
    if isinstance(A, jsparse.BCOO):
        return True
    try:
        import scipy.sparse as sp
        return sp.issparse(A)
    except ImportError:
        return False


def _is_hermitian(A, tol=0.0):
    A = np.asarray(A)
    return np.allclose(A, A.conj().T, atol=tol, rtol=10 * tol if tol else 1e-12)


def feast(A, B=None, interval=None, M0=None, fpm=None, *, backend=None,
          parallel=None, strict_backend=False, contour=None, Q0=None,
          **kw) -> FeastResult:
    """Find all eigenpairs of A x = lam B x with lam in [Emin, Emax].

    Parity with the 4 ``feast`` methods of feast_interfaces.jl:143-272:
    real-symmetric / complex-Hermitian x standard / generalized, with
    symmetry validation, interval validation, fpm normalization, and backend
    selection. Dense operands route to the dense drivers; sparse and
    matrix-free operands route to their engines (later stages).

    Args:
      A, B: dense arrays (B=None for the standard problem).
      interval: (Emin, Emax) search interval — positional for parity with
        ``feast(A, B, (Emin, Emax))``.
      M0: subspace size (default: guessed as 1.5x a stochastic estimate is a
        later stage; currently required).
    """
    if interval is None:
        raise ValueError("interval=(Emin, Emax) is required")
    Emin, Emax = float(interval[0]), float(interval[1])
    if not Emax > Emin:
        raise ValueError(f"Emin={Emin} must be < Emax={Emax}")

    # Route by storage type (the feast_serial dispatch,
    # feast_backend_utils.jl:166-198), with backend selection applied to
    # EVERY operand class (feast_with_backend, feast_backend_utils.jl:103-121;
    # :auto parallelizes sparse problems — the reference's supported matrix —
    # while dense requires an explicit backend).
    from ..solvers.matfree import LinearOperator, feast_matvec
    if isinstance(A, LinearOperator):
        backend = _resolve_backend(backend, parallel, strict_backend,
                                   auto_sharded=False, operand="matfree")
        if backend == "sharded":
            if strict_backend:
                raise RuntimeError(
                    "backend='sharded' is not yet available for matrix-free "
                    "operators (the model-axis sharded matvec path); use the "
                    "serial driver or shard inside your operator callables")
            warnings.warn("backend='sharded' unavailable for matrix-free "
                          "operators; falling back to serial", stacklevel=2)
        N = A.shape[0]
        return feast_matvec(A, B, (Emin, Emax),
                            min(int(M0 or max(8, N // 10)), N), fpm,
                            Q0=Q0, **kw)
    if _is_sparse(A):
        backend = _resolve_backend(backend, parallel, strict_backend,
                                   auto_sharded=True, operand="sparse")
        from ..solvers.sparse import sparse_feast_interval
        N = A.shape[0]
        M0r = min(int(M0 or max(8, N // 10)), N)
        if backend == "sharded":
            from ..parallel.pfeast import pfeast_sparse
            return pfeast_sparse(A, B, Emin, Emax, M0r, fpm, Q0=Q0, **kw)
        return sparse_feast_interval(A, B, Emin, Emax, M0r, fpm, Q0=Q0, **kw)

    A_np = np.asarray(A)
    N = A_np.shape[0]
    if M0 is None:
        M0 = min(N, max(8, N // 10))
    M0 = min(int(M0), N)

    if not _is_hermitian(A_np, tol=1e-10):
        raise ValueError(
            "feast() requires symmetric/Hermitian A; use feast_general() for "
            "non-Hermitian problems")
    if B is not None and not _is_hermitian(np.asarray(B), tol=1e-10):
        raise ValueError("feast() requires symmetric/Hermitian positive "
                         "definite B; use feast_general() otherwise")
    feast_validate_interval(A_np, Emin, Emax)

    fpm = _ensure_fpm(fpm)
    backend = _resolve_backend(backend, parallel, strict_backend,
                               auto_sharded=False, operand="dense")
    hermitian = np.iscomplexobj(A_np) or (B is not None and np.iscomplexobj(B))

    if backend == "sharded":
        from ..parallel.pfeast import pfeast_dense
        return pfeast_dense(A, B, Emin, Emax, M0, fpm,
                            hermitian=hermitian, contour=contour, Q0=Q0, **kw)

    return _dense.dense_hermitian_feast(
        A, B, Emin, Emax, M0, fpm, hermitian=hermitian,
        contour=contour, Q0=Q0, **kw)


def feast_general(A, B=None, Emid=0.0, r=1.0, M0=None, fpm=None, *,
                  backend=None, parallel=None, strict_backend=False,
                  complex_symmetric=None, **kw) -> FeastGeneralResult:
    """Find all eigenpairs of general A x = lam B x inside the rotated
    ellipse (Emid, r, fpm[18], fpm[19]).

    Parity with the 4 ``feast_general`` methods (feast_interfaces.jl:274-379)
    plus the MPI general route (_execute_feast_general,
    feast_interfaces.jl:95-127 -> mpi_feast_general): sparse and dense
    operands both accept ``backend='sharded'`` (contour mesh), and sparse
    operands route to the iterative sparse general engine.
    """
    from ..solvers import dense_general as _dg
    fpm = _ensure_fpm(fpm)
    if _is_sparse(A):
        from ..solvers.sparse import sparse_feast_general
        N = A.shape[0]
        M0r = min(int(M0 or max(8, N // 10)), N)
        backend = _resolve_backend(backend, parallel, strict_backend,
                                   auto_sharded=True, operand="sparse")
        if complex_symmetric is None:
            complex_symmetric = False
        if backend == "sharded":
            from ..parallel.pfeast import pfeast_sparse_general
            return pfeast_sparse_general(A, B, Emid, r, M0r, fpm,
                                         bilinear=bool(complex_symmetric),
                                         **kw)
        return sparse_feast_general(A, B, Emid, r, M0r, fpm,
                                    bilinear=bool(complex_symmetric), **kw)
    from ..solvers.matfree import LinearOperator
    if isinstance(A, LinearOperator):
        from ..solvers.matfree import feast_matvec_general
        backend = _resolve_backend(backend, parallel, strict_backend,
                                   auto_sharded=False, operand="matfree")
        if backend == "sharded":
            if strict_backend:
                raise RuntimeError(
                    "backend='sharded' is not yet available for matrix-free "
                    "operators; use the serial driver")
            warnings.warn("backend='sharded' unavailable for matrix-free "
                          "operators; falling back to serial", stacklevel=2)
        N = A.shape[0]
        return feast_matvec_general(A, B, Emid, r,
                                    min(int(M0 or max(8, N // 10)), N), fpm,
                                    bilinear=bool(complex_symmetric or False),
                                    **kw)
    A_np = np.asarray(A)
    N = A_np.shape[0]
    if M0 is None:
        M0 = min(N, max(8, N // 10))
    M0 = min(int(M0), N)
    backend = _resolve_backend(backend, parallel, strict_backend,
                               auto_sharded=False, operand="dense")
    if complex_symmetric is None:
        complex_symmetric = (np.iscomplexobj(A_np)
                             and np.allclose(A_np, A_np.T)
                             and not np.allclose(A_np, A_np.conj().T))
    if backend == "sharded":
        from ..parallel.pfeast import pfeast_general
        return pfeast_general(A, B, Emid, r, M0, fpm,
                              bilinear=bool(complex_symmetric), **kw)
    if complex_symmetric:
        return _dg.dense_general_feast(A, B, Emid, r, M0, fpm,
                                       bilinear=True, **kw)
    return _dg.dense_general_feast(A, B, Emid, r, M0, fpm, **kw)


def feast_banded(A_bands, kl, ku, interval, M0, fpm=None, *, B_bands=None,
                 klb=0, kub=0, **kw) -> FeastResult:
    """Banded symmetric/Hermitian FEAST on [Emin, Emax]
    (feast_interfaces.jl:381-417 -> feast_sb*/hb* drivers)."""
    from ..solvers import banded as _b
    Emin, Emax = float(interval[0]), float(interval[1])
    A_np = np.asarray(A_bands)
    hermitian = np.iscomplexobj(A_np) or (
        B_bands is not None and np.iscomplexobj(np.asarray(B_bands)))
    if B_bands is None:
        if hermitian:
            return _b.feast_hbev(A_bands, kl, ku, Emin, Emax, M0, fpm, **kw)
        return _b.feast_sbev(A_bands, kl, ku, Emin, Emax, M0, fpm, **kw)
    if hermitian:
        return _b.feast_hbgv(A_bands, kl, ku, B_bands, klb, kub,
                             Emin, Emax, M0, fpm, **kw)
    return _b.feast_sbgv(A_bands, kl, ku, B_bands, klb, kub,
                         Emin, Emax, M0, fpm, **kw)


def feast_custom_contour(A, B, Zne, Wne, M0, fpm=None, *, general=None,
                         Emid=None, r=None, interval=None, **kw):
    """Solve with an explicit user contour (feast_custom_contour,
    feast_interfaces.jl:419-439): registers (Zne, Wne) in the fpm[29]
    registry and routes to feast / feast_general. For interval problems pass
    interval=(Emin, Emax); for general problems pass Emid/r (used only for
    the inside test - the quadrature is the user contour)."""
    from ..core.aux import with_custom_contour
    from ..core.types import Contour
    contour = Contour(np.asarray(Zne, complex), np.asarray(Wne, complex))
    fpm = _ensure_fpm(fpm)
    if general is None:
        general = interval is None
    with with_custom_contour(fpm, contour):
        if general:
            if Emid is None or r is None:
                # derive an enclosing region from the contour nodes
                Emid = complex(contour.Zne.mean())
                r = float(np.abs(contour.Zne - Emid).max())
            return feast_general(A, B, Emid, r, M0, fpm, **kw)
        return feast(A, B, interval, M0, fpm, **kw)


def feast_polynomial(coeffs, Emid, r, M0, fpm=None, *, method="companion",
                     **kw) -> FeastGeneralResult:
    """Polynomial eigenproblem sum_k lam^k A_k x = 0 inside ellipse (Emid, r)
    (feast_interfaces.jl:441-471 -> feast_pep!).

    method: 'companion' (first-companion linearization to a d*N pencil,
    machine-precision) or 'direct' (Beyn moment scheme on the N-dim
    polynomial resolvent - d times less memory, quadrature-limited
    accuracy)."""
    from ..solvers import dense_general as _dg
    from ..solvers import matfree as _mf
    if method == "matfree" or any(
            isinstance(c, _mf.LinearOperator) or callable(getattr(c, "matvec",
                                                                  None))
            for c in coeffs):
        # matrix-free companion linearization by OPERATORS (parity:
        # feast_matfree.jl:511-647) — also chosen automatically when any
        # coefficient is already an operator
        return _mf.feast_polynomial_matvec(coeffs, Emid, r, M0, fpm, **kw)
    if method == "direct":
        return _dg.feast_pep_direct(coeffs, Emid, r, M0, fpm, **kw)
    return _dg.feast_pep(coeffs, Emid, r, M0, fpm, **kw)


def eigvals_feast(A, interval, *, B=None, M0=None, **kw):
    """Eigenvalues-only convenience (feast_interfaces.jl:514-527)."""
    return feast(A, B, interval, M0, **kw).lam


def eigen_feast(A, interval, *, B=None, M0=None, **kw):
    """(eigenvalues, eigenvectors) convenience (feast_interfaces.jl:529-540)."""
    r = feast(A, B, interval, M0, **kw)
    return r.lam, r.q


def feast_set_defaults(fpm=None, *, nodes=None, tol_exp=None, max_loops=None,
                       print_level=None, quadrature=None, aspect_ratio=None,
                       full_nodes=None) -> FeastParameters:
    """Keyword-named veneer over fpm slots (feast_set_defaults!,
    feast_interfaces.jl:484-512)."""
    fpm = feastinit() if fpm is None else FeastParameters(fpm)
    if nodes is not None:
        fpm[2] = nodes
    if full_nodes is not None:
        fpm[8] = full_nodes
    if tol_exp is not None:
        fpm[3] = tol_exp
    if max_loops is not None:
        fpm[4] = max_loops
    if print_level is not None:
        fpm[1] = print_level
    if quadrature is not None:
        fpm[16] = quadrature
    if aspect_ratio is not None:
        fpm[18] = int(round(aspect_ratio * 100))
    return fpm


def feast_summary(result, file=None):
    """Human-readable run summary (feast_summary, feast_interfaces.jl:542-561)."""
    file = file or sys.stdout
    kind = "general" if isinstance(result, FeastGeneralResult) else "Hermitian"
    print(f"FEAST {kind} eigensolver summary", file=file)
    print(f"  eigenvalues found (M) : {result.M}", file=file)
    print(f"  refinement loops      : {result.loop}", file=file)
    print(f"  max relative residual : {result.epsout:.3e}", file=file)
    print(f"  status                : {result.info.name} ({int(result.info)})",
          file=file)
    if result.M:
        lam = np.asarray(result.lam)
        print(f"  lambda range          : [{lam.real.min():.6g}, "
              f"{lam.real.max():.6g}]", file=file)
    return result.info
