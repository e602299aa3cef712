"""Legacy FEAST_* constant bindings (parity: src/deprecations.jl).

The reference deprecates SCREAMING_CASE constants in favor of Feast_*-style
names; both resolve here with a DeprecationWarning on the legacy spellings.
"""
from __future__ import annotations

import warnings

from .core.types import FeastError, FeastRCIJob

# Modern names (matching the reference's Feast_* bindings)
Feast_SUCCESS = FeastError.SUCCESS
Feast_ERROR_N = FeastError.ERROR_N
Feast_ERROR_M0 = FeastError.ERROR_M0
Feast_ERROR_EMIN_EMAX = FeastError.ERROR_EMIN_EMAX
Feast_ERROR_EMID_R = FeastError.ERROR_EMID_R
Feast_ERROR_NO_CONVERGENCE = FeastError.NO_CONVERGENCE
Feast_ERROR_MEMORY = FeastError.MEMORY
Feast_ERROR_INTERNAL = FeastError.INTERNAL_ERROR_1
Feast_ERROR_PROBLEM_SIZE = FeastError.PROBLEM_SIZE

Feast_RCI_DONE = FeastRCIJob.DONE
Feast_RCI_INIT = FeastRCIJob.INIT
Feast_RCI_FACTORIZE = FeastRCIJob.FACTORIZE
Feast_RCI_SOLVE = FeastRCIJob.SOLVE
Feast_RCI_FACTORIZE_TRANSPOSE = FeastRCIJob.FACTORIZE_TRANSPOSE
Feast_RCI_SOLVE_TRANSPOSE = FeastRCIJob.SOLVE_TRANSPOSE
Feast_RCI_MULT_A = FeastRCIJob.MULT_A
Feast_RCI_MULT_B = FeastRCIJob.MULT_B

_LEGACY = {
    "FEAST_SUCCESS": Feast_SUCCESS,
    "FEAST_ERROR_N": Feast_ERROR_N,
    "FEAST_ERROR_M0": Feast_ERROR_M0,
    "FEAST_ERROR_EMIN_EMAX": Feast_ERROR_EMIN_EMAX,
    "FEAST_ERROR_EMID_R": Feast_ERROR_EMID_R,
    "FEAST_ERROR_NO_CONVERGENCE": Feast_ERROR_NO_CONVERGENCE,
    "FEAST_ERROR_MEMORY": Feast_ERROR_MEMORY,
    "FEAST_ERROR_INTERNAL": Feast_ERROR_INTERNAL,
    "FEAST_ERROR_PROBLEM_SIZE": Feast_ERROR_PROBLEM_SIZE,
    "FEAST_RCI_DONE": Feast_RCI_DONE,
    "FEAST_RCI_INIT": Feast_RCI_INIT,
    "FEAST_RCI_FACTORIZE": Feast_RCI_FACTORIZE,
    "FEAST_RCI_SOLVE": Feast_RCI_SOLVE,
    "FEAST_RCI_FACTORIZE_TRANSPOSE": Feast_RCI_FACTORIZE_TRANSPOSE,
    "FEAST_RCI_SOLVE_TRANSPOSE": Feast_RCI_SOLVE_TRANSPOSE,
    "FEAST_RCI_MULT_A": Feast_RCI_MULT_A,
    "FEAST_RCI_MULT_B": Feast_RCI_MULT_B,
}


def __getattr__(name):
    if name in _LEGACY:
        warnings.warn(f"{name} is deprecated; use {name.replace('FEAST_', 'Feast_', 1)}",
                      DeprecationWarning, stacklevel=2)
        return _LEGACY[name]
    raise AttributeError(name)
