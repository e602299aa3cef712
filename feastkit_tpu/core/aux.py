"""Auxiliary subsystems: custom-contour registry, input validation,
polygon membership, Cauchy weights, info/trace printing, memory estimate,
stochastic eigenvalue-count estimation.

Counterpart of the reference's ``src/core/feast_aux.jl``: the thread-safe
contour registry (:6-21, :259-367), input validation (:369-425), polygon
triangulation membership (:427-483), Cauchy kernel weights (:494-524),
print/info helpers (:529-664), plus the fpm[14]=2 stochastic estimate mode
(feast_parameters.jl:71-75, fpm[32] trials).
"""
from __future__ import annotations

import threading

import numpy as np

from .contour import feast_contour, feast_rationalx
from .parameters import FeastParameters, _ensure_fpm
from .types import Contour

__all__ = [
    "feast_set_custom_contour", "feast_get_custom_contour",
    "feast_clear_custom_contour", "feast_clear_all_contours",
    "with_custom_contour", "feast_inside_contourx", "feast_cauchy_weights",
    "check_feast_input", "validate_contour", "check_complex_symmetric",
    "feast_memory_estimate", "feast_info", "feast_trace_eigenvalues",
    "feast_estimate_count",
]

# ---------------------------------------------------------------------------
# Custom-contour registry (feast_aux.jl:6-21, :259-367): the id lives in
# fpm[29] so copying fpm preserves the association.
# ---------------------------------------------------------------------------

_CUSTOM_CONTOURS: dict[int, Contour] = {}
_REGISTRY_LOCK = threading.Lock()
_NEXT_ID = [1]


def feast_set_custom_contour(fpm, contour: Contour) -> int:
    """Register a contour; stores its id in fpm[29] and returns the id."""
    fpm = fpm if isinstance(fpm, FeastParameters) else FeastParameters(fpm)
    with _REGISTRY_LOCK:
        cid = _NEXT_ID[0]
        _NEXT_ID[0] += 1
        _CUSTOM_CONTOURS[cid] = Contour(np.asarray(contour.Zne, complex),
                                        np.asarray(contour.Wne, complex))
    fpm[29] = cid
    return cid


def feast_get_custom_contour(fpm) -> Contour | None:
    fpm = fpm if isinstance(fpm, FeastParameters) else FeastParameters(fpm)
    cid = fpm[29]
    if cid <= 0:
        return None
    with _REGISTRY_LOCK:
        return _CUSTOM_CONTOURS.get(cid)


def feast_clear_custom_contour(fpm) -> None:
    fpm = fpm if isinstance(fpm, FeastParameters) else FeastParameters(fpm)
    cid = fpm[29]
    with _REGISTRY_LOCK:
        _CUSTOM_CONTOURS.pop(cid, None)
    fpm[29] = 0


def feast_clear_all_contours() -> None:
    with _REGISTRY_LOCK:
        _CUSTOM_CONTOURS.clear()


class with_custom_contour:
    """Scoped registration (with_custom_contour(fpm, contour) as cm:
    feast_aux.jl:339-367): registers on enter, restores fpm[29] + clears on
    exit."""

    def __init__(self, fpm, contour: Contour):
        self.fpm = fpm if isinstance(fpm, FeastParameters) else FeastParameters(fpm)
        self.contour = contour

    def __enter__(self):
        self._saved = self.fpm[29]
        feast_set_custom_contour(self.fpm, self.contour)
        return self.fpm

    def __exit__(self, *exc):
        feast_clear_custom_contour(self.fpm)
        self.fpm[29] = self._saved
        return False


# ---------------------------------------------------------------------------
# Membership / weights for custom polygonal contours
# ---------------------------------------------------------------------------

def feast_inside_contourx(lam, Zne) -> np.ndarray:
    """Point-in-polygon membership for custom contour nodes
    (feast_aux.jl:427-483 uses fan triangulation; we use the equivalent
    winding-number test, robust for any simple polygon)."""
    Z = np.asarray(Zne, complex)
    lam = np.atleast_1d(np.asarray(lam, complex))
    x, y = Z.real, Z.imag
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    px, py = lam.real[:, None], lam.imag[:, None]
    # crossing-number test, vectorized over points x edges
    cond = ((y[None, :] <= py) != (y1[None, :] <= py))
    t = (py - y[None, :]) / np.where(y1 - y == 0, 1e-300, (y1 - y))[None, :]
    xint = x[None, :] + t * (x1 - x)[None, :]
    crossings = np.sum(cond & (px < xint), axis=1)
    return (crossings % 2).astype(bool)


def feast_cauchy_weights(Zne) -> np.ndarray:
    """Cauchy-kernel trapezoid weights for user nodes (feast_aux.jl:494-524):
    central differences normalized by 2*pi*i (see feast_customcontour)."""
    Z = np.asarray(Zne, complex)
    W = (np.roll(Z, -1) - np.roll(Z, 1)) / (2.0 * 2.0j * np.pi)
    area = 0.5 * np.imag(np.sum(np.conj(Z) * np.roll(Z, -1)))
    return -W if area < 0 else W


# ---------------------------------------------------------------------------
# Validation (check_feast_srci_input / check_feast_grci_input,
# feast_aux.jl:369-425; validate_contour :600-622)
# ---------------------------------------------------------------------------

def check_feast_input(N, M0, *, Emin=None, Emax=None, Emid=None, r=None):
    if N <= 0:
        raise ValueError(f"Problem size N must be positive, got {N}")
    if not 0 < M0 <= N:
        raise ValueError(f"Subspace size M0 must be in 1..N={N}, got {M0}")
    if Emin is not None and Emax is not None and not Emax > Emin:
        raise ValueError(f"Invalid interval: Emin={Emin} >= Emax={Emax}")
    if r is not None and not r > 0:
        raise ValueError(f"Contour radius must be positive, got {r}")


def validate_contour(contour: Contour, *, require_closed=False) -> bool:
    """Sanity checks on nodes/weights (feast_aux.jl:600-622)."""
    Z = np.asarray(contour.Zne)
    W = np.asarray(contour.Wne)
    if Z.shape != W.shape or Z.ndim != 1 or Z.size == 0:
        raise ValueError("Contour must have matching 1-D nodes and weights")
    if not (np.isfinite(Z).all() and np.isfinite(W).all()):
        raise ValueError("Contour contains non-finite nodes or weights")
    if np.unique(Z).size != Z.size:
        raise ValueError("Contour nodes must be distinct")
    return True


def check_complex_symmetric(A, tol=1e-12) -> bool:
    """A == A^T (not A^H) — feast_aux.jl:665-668."""
    A = np.asarray(A)
    return np.iscomplexobj(A) and np.allclose(A, A.T, atol=tol)


# ---------------------------------------------------------------------------
# Observability (print_level contract: fpm[1])
# ---------------------------------------------------------------------------

def feast_memory_estimate(N, M0, ne, *, dtype=np.complex128, dense=True,
                          store_factorization=True) -> dict:
    """Rough workspace sizing in bytes (feast_aux.jl:645-664)."""
    isize = np.dtype(dtype).itemsize
    est = {
        "subspace": 2 * N * M0 * isize,           # Q + filtered Q
        "solves": ne * N * M0 * isize,            # batched RHS/solutions
        "reduced": 4 * M0 * M0 * isize,
    }
    if dense:
        est["factors"] = (ne if store_factorization else 1) * N * N * isize
    est["total"] = sum(est.values())
    return est


def feast_info(result, fpm=None, file=None):
    """Run summary gated by fpm[1] print level (feast_info_symmetric/general,
    feast_aux.jl:529-596)."""
    import sys
    file = file or sys.stdout
    if fpm is not None:
        fpm = _ensure_fpm(fpm)
        if fpm[1] == 0:
            return
    print("FEAST run info:", file=file)
    print(f"  M (found)   : {result.M}", file=file)
    print(f"  loops       : {result.loop}", file=file)
    print(f"  epsout      : {result.epsout:.3e}", file=file)
    print(f"  info        : {int(result.info)} ({result.info.name})", file=file)


def feast_trace_eigenvalues(result, file=None):
    """Eigenvalue table (feast_trace_eigenvalues, feast_aux.jl:624-643)."""
    import sys
    file = file or sys.stdout
    print(f"{'idx':>4} {'lambda':>24} {'residual':>12}", file=file)
    for j in range(result.M):
        lam = result.lam[j]
        lam_s = (f"{lam:.12g}" if np.isrealobj(result.lam)
                 else f"{lam.real:+.6g}{lam.imag:+.6g}i")
        print(f"{j:>4} {lam_s:>24} {result.res[j]:>12.3e}", file=file)


# ---------------------------------------------------------------------------
# Stochastic eigenvalue-count estimate (fpm[14]=2)
# ---------------------------------------------------------------------------

def feast_estimate_count(solve_filtered, N, interval_or_contour, fpm=None,
                         *, trials=None, seed=0) -> float:
    """Hutchinson estimate of the eigenvalue count inside the contour.

    M_est = (1/T) sum_t v_t^T (P v_t), P the spectral projector realized by
    the quadrature (the fpm[14]=2 / fpm[32] mode, feast_parameters.jl:71-75,
    :274-277). ``solve_filtered(V) -> P V`` is the same filtered-subspace
    application the solvers use; with Gauss/Zolotarev quadrature P ~ the
    exact projector and E[v^T P v] = trace(P) = M.
    """
    fpm = _ensure_fpm(fpm)
    T = trials if trials is not None else fpm[32]
    rng = np.random.default_rng(seed)
    V = rng.choice([-1.0, 1.0], size=(N, T))      # Rademacher probes
    PV = np.asarray(solve_filtered(V))
    return float(np.einsum("nt,nt->", V, np.real(PV)) / T)
