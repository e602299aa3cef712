"""Sparse FEAST drivers: BCOO operators + batched iterative shifted solves.

Counterpart of the reference's ``src/sparse/feast_sparse.jl``. The reference's
primary sparse path is a cached UMFPACK LU per contour node
(feast_sparse.jl:294,334-348) with GMRES as the ``zifeast_*`` escape hatch
(:164-236); TPUs have no sparse direct factorization (SURVEY.md section 2.7),
so here the iterative path IS the primary path — batched block GMRES /
BiCGStab (ops/gmres.py) on the shift operator z B - A applied matrix-free
through BCOO matvecs (the shifted matrix is never materialized), sequential
over contour nodes (lax.scan) to bound memory, batched over all M0 RHS.

Supports scipy.sparse inputs (converted once to BCOO) and jax BCOO directly.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from ..core.contour import feast_contour, feast_gcontour
from ..core.parameters import FeastConfig, _ensure_fpm, feast_tolerance
from ..core.tools import seeded_subspace
from ..core.types import FeastError, FeastGeneralResult, FeastResult, _trim
from ..kernel.general import feast_general_core
from ..kernel.hermitian import feast_hermitian_core
from ..ops.gmres import bicgstab_block, gmres_block

__all__ = ["feast_scsrev", "feast_scsrgv", "feast_hcsrev", "feast_hcsrgv",
           "feast_gcsrev", "feast_gcsrgv", "feast_scsrev_complex",
           "feast_scsrgv_complex", "feast_scsrpev", "feast_hcsrpev",
           "feast_gcsrpev", "as_bcoo", "sparse_feast_interval",
           "sparse_feast_general"]


def as_bcoo(A, dtype=None):
    """scipy.sparse / dense / BCOO -> jax BCOO (optionally cast)."""
    if isinstance(A, jsparse.BCOO):
        return A if dtype is None else jsparse.BCOO(
            (A.data.astype(dtype), A.indices), shape=A.shape)
    try:
        import scipy.sparse as sp
        if sp.issparse(A):
            coo = A.tocoo()
            data = jnp.asarray(coo.data if dtype is None
                               else coo.data.astype(dtype))
            idx = jnp.stack([jnp.asarray(coo.row, jnp.int32),
                             jnp.asarray(coo.col, jnp.int32)], axis=1)
            return jsparse.BCOO((data, idx), shape=coo.shape)
    except ImportError:
        pass
    return jsparse.BCOO.fromdense(jnp.asarray(A) if dtype is None
                                  else jnp.asarray(A, dtype))


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


def _make_sparse_solve_all(A, B, standard, *, solver, solver_tol,
                           solver_maxiter, solver_restart, cdtype):
    """solve_all(Zall, rhs): sequential scan over contour nodes, batched
    block-iterative solve per node. A, B are BCOO (complex)."""
    method = _solver_fn(solver)

    def apply_shift(z, X):
        if standard:
            return z * X - A @ X
        return z * (B @ X) - A @ X

    def solve_all(Zall, rhs):
        def one(carry, z):
            op = lambda X: apply_shift(z, X)
            if method == "gmres":
                X, info = gmres_block(op, rhs, tol=solver_tol,
                                      restart=solver_restart,
                                      maxiter=solver_maxiter)
            else:
                X, info = bicgstab_block(op, rhs, tol=solver_tol,
                                         maxiter=solver_maxiter)
            return carry, (X, info.converged)

        _, (X, conv) = jax.lax.scan(one, 0, Zall)
        return X, conv

    return solve_all


@functools.partial(jax.jit, static_argnames=(
    "config", "standard", "hermitian", "solver", "solver_tol",
    "solver_maxiter", "solver_restart"))
def _sparse_hermitian_jit(A, B, A_work, B_work, Zne, Wne, Q0, Emin, Emax, *,
                          config, standard, hermitian, solver, solver_tol,
                          solver_maxiter, solver_restart):
    """A, B: BCOO in the complex dtype (shifted solves); A_work, B_work:
    BCOO in the iteration dtype (real for the symmetric path)."""
    cdtype = Zne.dtype
    if hermitian:
        Zall = jnp.concatenate([Zne, jnp.conj(Zne)])
        Wall = jnp.concatenate([Wne, jnp.conj(Wne)])
    else:
        Zall, Wall = Zne, 2.0 * Wne

    solve_all = _make_sparse_solve_all(
        A, B, standard, solver=solver, solver_tol=solver_tol,
        solver_maxiter=solver_maxiter, solver_restart=solver_restart,
        cdtype=cdtype)

    apply_A = lambda X: A_work @ X
    apply_B = (lambda X: X) if standard else (lambda X: B_work @ X)

    if hermitian:
        def filter_apply(Q):
            X, _ = solve_all(Zall, apply_B(Q))
            return jnp.einsum("e,enm->nm", Wall, X)
    else:
        def filter_apply(Q):
            X, _ = solve_all(Zall, apply_B(Q).astype(cdtype))
            return jnp.real(jnp.einsum("e,enm->nm", Wall, X)).astype(Q.dtype)

    return feast_hermitian_core(
        apply_A, apply_B, filter_apply, Q0, Emin, Emax,
        tol=config.tol, max_loops=config.max_loops,
        convergence_criterion=config.convergence_criterion,
        subspace_only=(config.mode == 1))


def sparse_feast_interval(A, B, Emin, Emax, M0, fpm=None, *, hermitian=None,
                          solver=None, solver_tol=None, solver_maxiter=None,
                          solver_restart=30, Q0=None) -> FeastResult:
    """Shared sparse symmetric/Hermitian interval driver
    (parity: feast_scsrgv!/hcsrgv! families, feast_sparse.jl:713-871).

    Inner-solver defaults honor the IFEAST knobs when fpm[43]=1
    (ifeast_solver_options); otherwise GMRES at ~outer-tol accuracy."""
    fpm = _ensure_fpm(fpm)
    from ..core.parameters import ifeast_solver_options
    iopts = ifeast_solver_options(fpm) or {}
    solver = solver or iopts.get("solver", "gmres")
    solver_tol = solver_tol if solver_tol is not None else iopts.get("solver_tol")
    solver_maxiter = solver_maxiter if solver_maxiter is not None else iopts.get("solver_maxiter", 500)
    _solver_fn(solver)
    is_complex = np.iscomplexobj(_peek_dtype(A)) or (
        B is not None and np.iscomplexobj(_peek_dtype(B)))
    if hermitian is None:
        hermitian = is_complex
    f64 = _peek_dtype(A).itemsize >= 8 and jax.config.jax_enable_x64
    rdtype = jnp.float64 if f64 else jnp.float32
    cdtype = jnp.complex128 if f64 else jnp.complex64
    work_dtype = cdtype if hermitian else rdtype

    Ab = as_bcoo(A, cdtype)
    Aw = as_bcoo(A, work_dtype)
    N = Ab.shape[0]
    standard = B is None
    Bb = Ab if standard else as_bcoo(B, cdtype)
    Bw = Aw if standard else as_bcoo(B, work_dtype)
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not Emax > Emin:
        raise ValueError(f"Emin={Emin} must be < Emax={Emax}")

    config = FeastConfig.from_fpm(fpm, dtype=cdtype)
    if solver_tol is None:
        solver_tol = max(config.tol * 0.1,
                         10 * float(jnp.finfo(rdtype).eps))
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_contour(Emin, Emax, fpm)
    if Q0 is None:
        Q0 = seeded_subspace(N, M0, work_dtype)
    state = _sparse_hermitian_jit(
        Ab, Bb, Aw, Bw, jnp.asarray(contour.Zne, cdtype),
        jnp.asarray(contour.Wne, cdtype), jnp.asarray(Q0, work_dtype),
        jnp.asarray(Emin, rdtype), jnp.asarray(Emax, rdtype),
        config=config, standard=standard, hermitian=bool(hermitian),
        solver=_solver_fn(solver), solver_tol=float(solver_tol),
        solver_maxiter=int(solver_maxiter), solver_restart=int(solver_restart))
    info = FeastError.SUCCESS if bool(state.converged) else FeastError.NO_CONVERGENCE
    return _trim(FeastResult, np.asarray(state.lam), np.asarray(state.Q),
                 np.asarray(state.res), np.asarray(state.inside),
                 int(info), float(state.epsout), int(state.loop) - 1)


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


@functools.partial(jax.jit, static_argnames=(
    "config", "standard", "bilinear", "eig_method", "solver", "solver_tol",
    "solver_maxiter", "solver_restart"))
def _sparse_general_jit(A, B, Zne, Wne, Q0, Emid, r, *, config, standard,
                        bilinear, eig_method, solver, solver_tol,
                        solver_maxiter, solver_restart):
    cdtype = Zne.dtype
    solve_all = _make_sparse_solve_all(
        A, B, standard, solver=solver, solver_tol=solver_tol,
        solver_maxiter=solver_maxiter, solver_restart=solver_restart,
        cdtype=cdtype)
    apply_A = lambda X: A @ X
    apply_B = (lambda X: X) if standard else (lambda X: B @ X)

    def filter_apply(Q):
        X, _ = solve_all(Zne, apply_B(Q))
        return jnp.einsum("e,enm->nm", Wne, X)

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
                         solver_restart=30) -> FeastGeneralResult:
    """Shared sparse general/complex-symmetric driver
    (parity: feast_gcsrgv!/gcsrev! RCI-loop drivers, feast_sparse.jl:873-1006,
    complex-symmetric :509-711)."""
    fpm = _ensure_fpm(fpm)
    from ..core.parameters import ifeast_solver_options
    iopts = ifeast_solver_options(fpm) or {}
    solver = solver or iopts.get("solver", "gmres")
    solver_tol = solver_tol if solver_tol is not None else iopts.get("solver_tol")
    solver_maxiter = solver_maxiter if solver_maxiter is not None else iopts.get("solver_maxiter", 500)
    f64 = _peek_dtype(A).itemsize >= 8 and jax.config.jax_enable_x64
    rdtype = jnp.float64 if f64 else jnp.float32
    cdtype = jnp.complex128 if f64 else jnp.complex64
    Ab = as_bcoo(A, cdtype)
    N = Ab.shape[0]
    standard = B is None
    Bb = Ab if standard else as_bcoo(B, cdtype)
    if not 0 < M0 <= N:
        raise ValueError(f"M0 must be in 1..N={N}, got {M0}")
    if not r > 0:
        raise ValueError(f"Contour radius must be positive, got {r}")
    config = FeastConfig.from_fpm(fpm, dtype=cdtype, full_contour=True)
    if solver_tol is None:
        solver_tol = max(config.tol * 0.1, 10 * float(jnp.finfo(rdtype).eps))
    from ..core.aux import feast_get_custom_contour
    contour = feast_get_custom_contour(fpm) or feast_gcontour(complex(Emid), float(r), fpm)
    key = jax.random.PRNGKey((N * 1000003 + M0 * 101 + 7) % (2**31 - 1))
    k1, k2 = jax.random.split(key)
    Q0 = (jax.random.normal(k1, (N, M0), rdtype)
          + 1j * jax.random.normal(k2, (N, M0), rdtype)).astype(cdtype)
    Q0 = Q0 / jnp.linalg.norm(Q0, axis=0, keepdims=True)
    state = _sparse_general_jit(
        Ab, Bb, jnp.asarray(contour.Zne, cdtype),
        jnp.asarray(contour.Wne, cdtype), Q0,
        jnp.asarray(complex(Emid), cdtype), jnp.asarray(float(r), rdtype),
        config=config, standard=standard, bilinear=bilinear,
        eig_method=eig_method, solver=_solver_fn(solver),
        solver_tol=float(solver_tol), solver_maxiter=int(solver_maxiter),
        solver_restart=int(solver_restart))
    info = FeastError.SUCCESS if bool(state.converged) else FeastError.NO_CONVERGENCE
    return _trim(FeastGeneralResult, np.asarray(state.lam), np.asarray(state.Q),
                 np.asarray(state.res), np.asarray(state.inside),
                 int(info), float(state.epsout), int(state.loop) - 1)


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
    import numpy as _np
    from .dense_general import feast_pep

    def _densify(c):
        try:
            import scipy.sparse as _sps
            if _sps.issparse(c):
                return c.toarray()
        except ImportError:
            pass
        if isinstance(c, jsparse.BCOO):
            return _np.asarray(c.todense())
        return _np.asarray(c)

    return feast_pep([_densify(c) for c in coeffs], Emid, r, M0, fpm, **kw)


feast_hcsrpev = feast_scsrpev
feast_gcsrpev = feast_scsrpev
