"""The 64-slot ``fpm`` FEAST parameter contract.

Re-implements the semantics of the reference's ``src/core/feast_parameters.jl``
(feastinit!, feastdefault!, feast_tolerance) for the TPU framework: the same
sentinel (-111) "unset" convention, the same defaulting and validation rules,
and a typed :class:`FeastConfig` veneer used internally by the JAX solvers.

Slot numbering is **1-based** to match every piece of FEAST documentation
(Fortran, Julia reference, and this repo's SURVEY.md): ``fpm[2]`` is the
half-contour node count, exactly as in the reference.
"""
from __future__ import annotations

import dataclasses
import numpy as np

FEAST_UNINITIALIZED = -111

# Allowed large Gauss node counts (feast_parameters.jl:113, :173)
_ALLOWED_LARGE_HALF = (24, 32, 40, 48, 56)
_ALLOWED_LARGE_FULL = (48, 64, 80, 96, 112)


class FeastParameters:
    """1-based view over a 64-slot int array, mirroring the Julia wrapper
    ``FeastParameters`` (feast_types.jl) that forwards indexing to ``fpm``."""

    __slots__ = ("_fpm",)

    def __init__(self, fpm=None):
        if fpm is None:
            self._fpm = np.full(64, FEAST_UNINITIALIZED, dtype=np.int64)
        elif isinstance(fpm, FeastParameters):
            self._fpm = fpm._fpm.copy()
        else:
            arr = np.asarray(fpm, dtype=np.int64)
            if arr.shape[0] < 64:
                raise ValueError("fpm array must have at least 64 elements")
            self._fpm = arr[:64].copy()

    def __getitem__(self, k: int) -> int:
        if not 1 <= k <= 64:
            raise IndexError(f"fpm index must be in 1..64, got {k}")
        return int(self._fpm[k - 1])

    def __setitem__(self, k: int, v: int) -> None:
        if not 1 <= k <= 64:
            raise IndexError(f"fpm index must be in 1..64, got {k}")
        self._fpm[k - 1] = int(v)

    def __len__(self) -> int:
        return 64

    def __eq__(self, other) -> bool:
        if isinstance(other, FeastParameters):
            return bool(np.array_equal(self._fpm, other._fpm))
        return NotImplemented

    def copy(self) -> "FeastParameters":
        return FeastParameters(self._fpm)

    def to_array(self) -> np.ndarray:
        """Export the raw 64-int array (0-based numpy; slot k is index k-1)."""
        return self._fpm.copy()

    def __repr__(self) -> str:
        set_slots = {
            k + 1: int(v) for k, v in enumerate(self._fpm)
            if v != FEAST_UNINITIALIZED
        }
        return f"FeastParameters({set_slots})"


def feastinit(fpm: FeastParameters | None = None) -> FeastParameters:
    """Fill all 64 slots with the -111 sentinel (feast_parameters.jl:7-18)."""
    if fpm is None:
        fpm = FeastParameters()
    fpm._fpm[:] = FEAST_UNINITIALIZED
    return fpm


def feastinit_driver(N: int, fpm: FeastParameters | None = None) -> FeastParameters:
    """feastinit + suggested node count ne = clamp(ceil(sqrt(N)), 8, 64)
    (feast_parameters.jl:26-34)."""
    fpm = feastinit(fpm)
    if N > 0:
        fpm[2] = int(np.clip(np.ceil(np.sqrt(float(N))), 8, 64))
    return fpm


def _decode_routine_digits(code: int) -> list[int]:
    """fpm[30] six-digit routine code -> digit list d1..d6
    (feast_parameters.jl:49-60). d1: 1=FEAST 2=PFEAST; d2: precision;
    d3: 1=direct 2=iterative; d4: 1=S 2=H 3=G; d5: interface; d6: variant."""
    dig = [0] * 6
    if code > 0:
        rem = code
        for i in range(6):
            dig[5 - i] = rem % 10
            rem //= 10
    return dig


def feastdefault(fpm: FeastParameters) -> FeastParameters:
    """Apply Fortran-matching defaults/validation to still-sentinel slots.

    Semantics of feastdefault! (feast_parameters.jl:41-386): only slots that
    are still -111 (or 0/negative where the reference treats that as unset)
    are overwritten; invalid user-set values raise ValueError.
    """
    f = fpm  # alias
    dig = _decode_routine_digits(f[30] if f[30] != FEAST_UNINITIALIZED else 0)

    # fpm[1]: print level
    if f[1] == FEAST_UNINITIALIZED:
        f[1] = 0
    elif f[1] > 1:
        raise ValueError(f"Invalid fpm[1]={f[1]}: print level must be 0, 1, or negative")

    # fpm[14]: execution mode (0 normal, 1 subspace only, 2 stochastic estimate)
    if f[14] == FEAST_UNINITIALIZED:
        f[14] = 0
    elif not 0 <= f[14] <= 2:
        raise ValueError(f"Invalid fpm[14]={f[14]}: must be 0, 1, or 2")

    # fpm[16]: quadrature (0 Gauss, 1 trapezoid, 2 Zolotarev); defaults depend
    # on problem class (feast_parameters.jl:77-99)
    if f[16] == FEAST_UNINITIALIZED:
        f[16] = 0
        if dig[2] == 2:          # IFEAST
            f[16] = 1
        if dig[3] == 3:          # general non-symmetric
            f[16] = 1
        if dig[3] == 1 and dig[1] == 4:  # complex symmetric
            f[16] = 1
    elif not 0 <= f[16] <= 2:
        raise ValueError(f"Invalid fpm[16]={f[16]}: must be 0, 1, or 2")
    if f[16] == 2 and (dig[3] == 3 or (dig[3] == 1 and dig[1] == 4)):
        raise ValueError("Invalid fpm[16]=2: Zolotarev not allowed for non-Hermitian problems")

    # fpm[2]: half-contour node count
    if f[2] == FEAST_UNINITIALIZED or f[2] <= 0:
        f[2] = 8
        if dig[2] == 2:
            f[2] = 4
        if f[14] == 2:
            f[2] = 3
    elif f[16] in (0, 2) and f[2] > 20 and f[2] not in _ALLOWED_LARGE_HALF:
        raise ValueError(
            f"Invalid fpm[2]={f[2]}: max 20 for Gauss/Zolotarev, or one of {_ALLOWED_LARGE_HALF}")

    # fpm[3]: tolerance exponent
    if f[3] == FEAST_UNINITIALIZED:
        f[3] = 12
    elif not 0 <= f[3] <= 16:
        raise ValueError(f"Invalid fpm[3]={f[3]}: must be between 0 and 16")

    # fpm[4]: max refinement loops
    if f[4] == FEAST_UNINITIALIZED or f[4] <= 0:
        f[4] = 20
        if dig[2] == 2:
            f[4] = 50
    # fpm[5]: initial subspace flag
    if f[5] == FEAST_UNINITIALIZED:
        f[5] = 0
    elif f[5] not in (0, 1):
        raise ValueError(f"Invalid fpm[5]={f[5]}: must be 0 or 1")
    # fpm[6]: convergence criterion (0 trace, 1 residual)
    if f[6] == FEAST_UNINITIALIZED:
        f[6] = 1
    elif f[6] not in (0, 1):
        raise ValueError(f"Invalid fpm[6]={f[6]}: must be 0 or 1")
    # fpm[7]: deprecated single-precision exponent
    if f[7] == FEAST_UNINITIALIZED:
        f[7] = 5
    elif not 0 <= f[7] <= 7:
        raise ValueError(f"Invalid fpm[7]={f[7]}: must be between 0 and 7")

    # fpm[8]: full-contour node count
    if f[8] == FEAST_UNINITIALIZED or f[8] <= 0:
        f[8] = 16
        if dig[2] == 2:
            f[8] = 8
        if f[14] == 2:
            f[8] = 6
    elif f[8] < 2:
        raise ValueError(f"Invalid fpm[8]={f[8]}: must be at least 2")
    elif f[16] == 0 and f[8] > 40 and f[8] not in _ALLOWED_LARGE_FULL:
        raise ValueError(
            f"Invalid fpm[8]={f[8]}: max 40 for Gauss, or one of {_ALLOWED_LARGE_FULL}")

    if f[9] == FEAST_UNINITIALIZED:
        f[9] = 0
    # fpm[10]: store factorizations
    if f[10] == FEAST_UNINITIALIZED:
        f[10] = 0 if dig[4] == 1 else 1
    elif f[10] not in (0, 1):
        raise ValueError(f"Invalid fpm[10]={f[10]}: must be 0 or 1")
    for i in (11, 12):
        if f[i] == FEAST_UNINITIALIZED:
            f[i] = 0
    # fpm[13]: RCI customization
    if f[13] == FEAST_UNINITIALIZED:
        f[13] = 0
    elif not 0 <= f[13] <= 3:
        raise ValueError(f"Invalid fpm[13]={f[13]}: must be 0..3")

    # fpm[15]: contour scheme
    if f[15] == FEAST_UNINITIALIZED:
        f[15] = 2 if dig[3] == 1 else 0
    elif not 0 <= f[15] <= 2:
        raise ValueError(f"Invalid fpm[15]={f[15]}: must be 0, 1, or 2")
    if f[14] == 2:
        f[15] = 1

    if f[17] == FEAST_UNINITIALIZED:
        f[17] = 0

    # fpm[18]: ellipse aspect ratio * 100
    if f[18] == FEAST_UNINITIALIZED:
        f[18] = 100
        if dig[2] == 1 and dig[5] <= 5:
            if dig[3] == 2:      # Hermitian
                f[18] = 30
            if dig[3] == 1 and dig[1] not in (3, 4):  # real symmetric
                f[18] = 30
    elif f[18] < 0:
        raise ValueError(f"Invalid fpm[18]={f[18]}: aspect ratio must be non-negative")

    # fpm[19]: rotation degrees
    if f[19] == FEAST_UNINITIALIZED:
        f[19] = 0
    elif not -180 <= f[19] <= 180:
        raise ValueError(f"Invalid fpm[19]={f[19]}: must be in [-180, 180]")

    for i in range(20, 29):
        if f[i] == FEAST_UNINITIALIZED:
            f[i] = 0
    if f[29] == FEAST_UNINITIALIZED:
        f[29] = 0
    if f[31] == FEAST_UNINITIALIZED:
        f[31] = 40
    if f[32] == FEAST_UNINITIALIZED:
        f[32] = 10
    for i in (33, 34, 35):
        if f[i] == FEAST_UNINITIALIZED:
            f[i] = 0
    if f[36] == FEAST_UNINITIALIZED:
        f[36] = 1
    if f[37] == FEAST_UNINITIALIZED:
        f[37] = 0
    if f[38] == FEAST_UNINITIALIZED:
        f[38] = 1
    if f[39] == FEAST_UNINITIALIZED:
        f[39] = 0
    if f[40] == FEAST_UNINITIALIZED:
        f[40] = 0
    if f[41] == FEAST_UNINITIALIZED:
        f[41] = 1
    if f[42] == FEAST_UNINITIALIZED:
        f[42] = 1
    if f[43] == FEAST_UNINITIALIZED:
        f[43] = 0
    if f[44] == FEAST_UNINITIALIZED:
        f[44] = 0
    if f[45] == FEAST_UNINITIALIZED:
        f[45] = 1
    if f[46] == FEAST_UNINITIALIZED:
        f[46] = 40
    if f[47] == FEAST_UNINITIALIZED:
        f[47] = 0
    if f[48] == FEAST_UNINITIALIZED:
        f[48] = 0
    if f[49] == FEAST_UNINITIALIZED:
        f[49] = 0
    for i in range(50, 59):
        if f[i] == FEAST_UNINITIALIZED:
            f[i] = 0
    if f[59] == FEAST_UNINITIALIZED:
        f[59] = 0
    if f[60] == FEAST_UNINITIALIZED:
        f[60] = 0
    for i in (61, 62, 63):
        if f[i] == FEAST_UNINITIALIZED:
            f[i] = 0
    if f[64] == FEAST_UNINITIALIZED:
        f[64] = 0
    return f


def feast_tolerance(fpm: FeastParameters, dtype=None) -> float:
    """tol = 10^(-fpm[3]); floored at sqrt(eps) for single precision
    (feast_parameters.jl:391-405)."""
    e = fpm[3]
    tol = 1e-12 if not 0 <= e <= 16 else 10.0 ** (-e)
    if dtype is not None:
        dt = np.dtype(dtype)
        if dt in (np.dtype(np.float32), np.dtype(np.complex64)):
            tol = max(tol, float(np.sqrt(np.finfo(np.float32).eps)))
    return tol


def ifeast_solver_options(fpm: FeastParameters) -> dict | None:
    """IFEAST inner-solver knobs -> driver kwargs (fpm[43]=1 switches to
    IFEAST interfaces; fpm[44] solver type 0=BiCGstab, fpm[45] inner accuracy
    10^-fpm[45], fpm[46] max inner iterations; feast_parameters.jl:321-339).
    Returns None when fpm[43]=0 (direct-FEAST semantics)."""
    if fpm[43] != 1:
        return None
    return {
        "solver": "bicgstab" if fpm[44] == 0 else "gmres",
        "solver_tol": 10.0 ** (-max(fpm[45], 0)),
        "solver_maxiter": max(fpm[46], 1),
    }


def feast_use_custom_contour(fpm: FeastParameters) -> bool:
    """fpm[29] > 0 means a registered custom contour is active
    (feast_parameters.jl:422-424)."""
    return fpm[29] > 0


def feast_integration_points(fpm: FeastParameters) -> int:
    return fpm[2]


def _ensure_fpm(fpm) -> FeastParameters:
    """nothing / list / ndarray / FeastParameters -> defaulted FeastParameters
    (feast_interfaces.jl:6-18 `_ensure_feast_parameters`)."""
    if fpm is None:
        out = feastinit()
    elif isinstance(fpm, FeastParameters):
        out = fpm.copy()
    else:
        out = FeastParameters(fpm)
    feastdefault(out)
    return out


@dataclasses.dataclass(frozen=True)
class FeastConfig:
    """Typed, hashable veneer over fpm used as the static argument of the
    jitted solver cores. Everything here is compile-time static."""

    ne: int = 8                  # fpm[2] (half) or fpm[8] (full)
    tol: float = 1e-12           # 10^-fpm[3], dtype-floored
    max_loops: int = 20          # fpm[4]
    use_initial_subspace: bool = False  # fpm[5]
    convergence_criterion: int = 1      # fpm[6]: 0 trace, 1 residual
    quadrature: int = 0          # fpm[16]
    aspect_ratio: float = 1.0    # fpm[18]/100
    rotation_deg: int = 0        # fpm[19]
    store_factorization: bool = True    # fpm[10]
    print_level: int = 0         # fpm[1]
    mode: int = 0                # fpm[14]
    custom_contour_id: int = 0   # fpm[29]
    mixed: int = 1               # fpm[42]: mixed-precision inner solves
    #   (single-precision Krylov + double-precision iterative refinement /
    #   accumulation, iterative drivers in double precision only).
    #   0 = off, 1 = auto (engage where f64 is emulated, i.e. TPU),
    #   2 = force everywhere
    ir_max: int = 5              # max mixed-precision iterative-refinement
    #   steps per contour node (env override FEAST_IR_MAX); each step runs
    #   one c64 Krylov solve and multiplies accuracy by the c64 floor
    #   (~2e-5) — 3 steps reach ~1e-14
    # Multigrid V-cycle shape (compile-relevant: they change the traced
    # preconditioner program). Env overrides FEAST_MG_NU_PRE /
    # FEAST_MG_NU_POST / FEAST_MG_OMEGA / FEAST_MG_CYCLES for on-hardware
    # tuning sweeps; defaults match ops/multigrid.make_shifted_vcycle.
    mg_nu_pre: int = 2           # damped-Jacobi pre-smoothing steps
    mg_nu_post: int = 2          # post-smoothing steps
    mg_omega: float = 0.8        # Jacobi damping factor
    mg_cycles: int = 1           # V-cycles per preconditioner application
    warm_start: int = 1          # Ritz warm starts for ITERATIVE inner
    #   solves (env override FEAST_WARM_START; compile-relevant). After the
    #   first refinement loop the subspace holds Ritz pairs (lam_i, q_i)
    #   with (zB - A)^-1 B q_i ~= q_i / (z - lam_i), so later filter
    #   applications start each Krylov/IR solve from X0 = Q diag(1/(z-lam))
    #   — the guess residual is the EIGEN-residual scaled by 1/|z - lam|.
    #   Guesses are accepted per column only where they beat the zero
    #   iterate (one extra operator application per node). This is the
    #   iterative analog of the reference's cached LU factors reused across
    #   refinement loops (feast_dense.jl:147-213, fpm[10]).
    adaptive_inner_tol: int = 1  # Inexact-FEAST inner tolerances (env
    #   override FEAST_ADAPTIVE_TOL; compile-relevant). FEAST refinement
    #   contracts the subspace error by the filter ratio gamma per loop and
    #   adds the inner-solve error: error_k ~ gamma*error_{k-1} + C*tau_k.
    #   Solving every loop at the final accuracy wastes Krylov iterations
    #   when the subspace is still crude, so iterative inner solves aim at
    #   tau_k = clip(0.1*epsout_{k-1}^2, solver_tol, ~3e-5) — loose on the
    #   first loops, full accuracy when it matters. The final
    #   spurious-verification filter pass only feeds the projector-norm
    #   test (rho > 0.25) and runs at 2e-3. Inner-solve certification
    #   (inner_converged) is judged against each solve's own target.
    cheb_degree: int = 0         # solver="cheb" polynomial-filter degree
    #   (env override FEAST_CHEB_DEGREE; compile-relevant). 0 = auto: pick
    #   from the interval's arccos-span on the Gershgorin spectrum
    #   enclosure (ops/chebfilter.auto_cheb_degree), capped at 8000.
    # Host-side driving knobs: read only OUTSIDE traced code (they pick
    # dispatch chunk sizes / the host-vs-fused path; any behavioral
    # difference reaches the compiler as operand shapes, which are part of
    # the jit cache key already). compare=False keeps them out of the
    # config's __eq__/__hash__ so toggling an env var between solves does
    # NOT invalidate every compiled program.
    dispatch_budget: float = dataclasses.field(default=5e6, compare=False)
    #   host-granular driving only: work budget (group * columns * N) per
    #   device dispatch, sized against remote execution watchdogs (env
    #   override FEAST_DISPATCH_BUDGET)
    group_max: int = dataclasses.field(default=2, compare=False)
    #   host-granular driving only: max contour nodes vmapped into one
    #   dispatch (env override FEAST_GROUP_MAX)
    fused_small_n: int = dataclasses.field(default=256, compare=False)
    #   dense driver on remote attachments: run problems with N <= this
    #   through the single fused whole-refinement program (one
    #   synchronization round trip) instead of the host-driven loop;
    #   0 disables (env override FEAST_FUSED_SMALL_N)

    @staticmethod
    def from_fpm(fpm: FeastParameters, dtype=None, full_contour: bool = False
                 ) -> "FeastConfig":
        import os
        return FeastConfig(
            ne=fpm[8] if full_contour else fpm[2],
            tol=feast_tolerance(fpm, dtype),
            max_loops=fpm[4],
            use_initial_subspace=bool(fpm[5]),
            convergence_criterion=fpm[6],
            quadrature=fpm[16],
            aspect_ratio=fpm[18] / 100.0,
            rotation_deg=fpm[19],
            store_factorization=bool(fpm[10]),
            print_level=fpm[1],
            mode=fpm[14],
            custom_contour_id=fpm[29],
            mixed=int(fpm[42]),
            ir_max=int(os.environ.get("FEAST_IR_MAX", 5)),
            mg_nu_pre=int(os.environ.get("FEAST_MG_NU_PRE", 2)),
            mg_nu_post=int(os.environ.get("FEAST_MG_NU_POST", 2)),
            mg_omega=float(os.environ.get("FEAST_MG_OMEGA", 0.8)),
            mg_cycles=int(os.environ.get("FEAST_MG_CYCLES", 1)),
            warm_start=int(os.environ.get("FEAST_WARM_START", 1)),
            adaptive_inner_tol=int(os.environ.get("FEAST_ADAPTIVE_TOL", 1)),
            cheb_degree=int(os.environ.get("FEAST_CHEB_DEGREE", 0)),
            dispatch_budget=float(os.environ.get("FEAST_DISPATCH_BUDGET",
                                                 5e6)),
            group_max=int(os.environ.get("FEAST_GROUP_MAX", 2)),
            fused_small_n=int(os.environ.get("FEAST_FUSED_SMALL_N", 256)),
        )
