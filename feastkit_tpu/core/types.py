"""Core result/contour/state types for the TPU-native FEAST framework.

Counterpart of the reference's ``src/core/feast_types.jl`` (FeastResult,
FeastGeneralResult, FeastContour, FeastRCIJob/FeastError enums,
``feast_types.jl:227-268``), re-designed for JAX: results returned from jitted
solver cores are static-shape pytrees (M0-sized buffers + validity masks); the
host-facing dataclasses trim to the found count M outside of jit.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, NamedTuple, Optional

import numpy as np


class FeastError(enum.IntEnum):
    """FEAST info codes (parity with feast_types.jl:257-268)."""

    SUCCESS = 0
    ERROR_N = 1              # problem size N <= 0
    ERROR_M0 = 2             # subspace size M0 out of range
    ERROR_EMIN_EMAX = 3      # invalid search interval / region
    ERROR_EMID_R = 4         # invalid center/radius
    NO_CONVERGENCE = 5       # reached max refinement loops without converging
    MEMORY = 6               # workspace allocation failure
    INTERNAL_ERROR_1 = 7     # internal error (contour)
    INTERNAL_ERROR_2 = 8     # internal error (reduced eigensolve)
    PROBLEM_SIZE = 9         # subspace exhausted (M0 too small)


class FeastRCIJob(enum.IntEnum):
    """Reverse-communication job codes (parity with feast_types.jl:227-249).

    These remain the contract of the explicit step-function API
    (:mod:`feastkit_tpu.kernel.rci`) for callers that bring non-JAX solvers.
    """

    DONE = 0
    INIT = -1
    FACTORIZE = 10
    SOLVE = 11
    FACTORIZE_TRANSPOSE = 20
    SOLVE_TRANSPOSE = 21
    MULT_A = 30
    MULT_B = 40
    SOLVE_REDUCED = 50
    PARALLEL_SOLVE = 50      # extended parallel codes (feast_parallel_rci.jl:386-390)
    PARALLEL_ACCUMULATE = 51
    EIGEN_SOLVE = 52


class Contour(NamedTuple):
    """Quadrature contour: nodes ``Zne`` and weights ``Wne`` (complex arrays).

    Counterpart of ``FeastContour`` (feast_types.jl). Host-side numpy arrays:
    contours are generated at trace time and baked into the compiled program.
    """

    Zne: np.ndarray
    Wne: np.ndarray

    @property
    def ne(self) -> int:
        return int(self.Zne.shape[0])


@dataclasses.dataclass
class FeastResult:
    """Result of a real-interval (symmetric / Hermitian) FEAST solve.

    Field parity with the reference ``FeastResult`` (feast_types.jl):
    lambda (here ``lam``), q, M, res, info, epsout, loop.
    """

    lam: Any          # (M,) real eigenvalues inside the interval, sorted
    q: Any            # (N, M) eigenvectors
    M: int            # number of eigenvalues found inside
    res: Any          # (M,) relative residuals
    info: FeastError  # status code
    epsout: float     # final convergence indicator (max inside residual)
    loop: int         # refinement loops used

    # Full static-shape buffers (M0-sized) for users who want them.
    lam_full: Any = None
    q_full: Any = None
    res_full: Any = None
    inside: Any = None
    # False when one or more inner iterative shifted solves (GMRES/BiCGStab)
    # failed the 10*tol re-verification at some refinement loop. The outer
    # residual test is still exact (true matvecs), so info may be SUCCESS
    # with inner_converged=False; a warning is emitted in that case.
    inner_converged: bool = True

    @property
    def converged(self) -> bool:
        return self.info == FeastError.SUCCESS

    # Julia-parity alias: result.lambda is a keyword in Python, the reference
    # exposes `.lambda`; we provide `.eigenvalues` and `.lam`.
    @property
    def eigenvalues(self):
        return self.lam

    @property
    def eigenvectors(self):
        return self.q


@dataclasses.dataclass
class FeastGeneralResult:
    """Result of a general (complex contour) FEAST solve; ``lam`` is complex.

    Parity with ``FeastGeneralResult`` (feast_types.jl).
    """

    lam: Any
    q: Any
    M: int
    res: Any
    info: FeastError
    epsout: float
    loop: int

    lam_full: Any = None
    q_full: Any = None
    res_full: Any = None
    inside: Any = None
    inner_converged: bool = True    # see FeastResult.inner_converged

    @property
    def converged(self) -> bool:
        return self.info == FeastError.SUCCESS

    @property
    def eigenvalues(self):
        return self.lam

    @property
    def eigenvectors(self):
        return self.q


def _trim(result_cls, lam_full, q_full, res_full, inside, info, epsout, loop,
          left_q_full=None, inner_ok=True, q_trimmed=None):
    """Host-side: order buffers inside-first (already done in-core) and trim
    to the M valid entries, building the user-facing result object.

    ``inner_ok=False`` marks a run whose inner iterative solves missed their
    tolerance (reference failure policy: degraded contribution + @warn,
    feast_parallel.jl:266-273); the warning is emitted here so every driver
    shares one policy.

    ``q_trimmed``: a pre-trimmed (N, M) eigenvector block supplied by the
    driver — either host numpy or a device jax.Array (the TPU-native
    ``device_q=True`` contract). When given, ``q_full`` is stored AS
    PROVIDED (it may be a device array; ``np.asarray(result.q_full)``
    fetches lazily) instead of being forced to host here, so the full
    M0-column basis never crosses a remote attachment unrequested."""
    lam_full = np.asarray(lam_full)
    if q_trimmed is None:
        q_full = np.asarray(q_full)
    res_full = np.asarray(res_full)
    inside = np.asarray(inside).astype(bool)
    # IFEAST semantics (feast_parameters.jl:326-329: default inner tol is
    # 1e-1): inexact inner solves are a feature — subspace iteration
    # contracts anyway and the outer residual test uses EXACT matvecs. An
    # inner-solve miss is therefore only a failure when the outer iteration
    # ALSO failed: that combination means the filter was too inaccurate to
    # contract, and the fix is more inner iterations, not more loops.
    inner_ok = bool(inner_ok) or FeastError(int(info)) == FeastError.SUCCESS
    M = int(inside.sum())
    if not inner_ok:
        import warnings
        warnings.warn(
            "FEAST did not converge AND the inner iterative solver "
            "(GMRES/BiCGStab) stalled above its certification accuracy at "
            "one or more contour nodes — raise solver_maxiter / "
            "solver_restart, improve preconditioning, or loosen the outer "
            "tolerance", RuntimeWarning, stacklevel=3)
    out = result_cls(
        lam=lam_full[:M],
        q=q_full[:, :M] if q_trimmed is None else q_trimmed,
        M=M,
        res=res_full[:M],
        info=FeastError(int(info)),
        epsout=float(epsout),
        loop=int(loop),
        lam_full=lam_full,
        q_full=q_full,
        res_full=res_full,
        inside=inside,
        inner_converged=inner_ok,
    )
    return out
