"""Checkpoint / resume for FEAST runs.

The reference has no on-disk checkpointing; its resumable unit is the RCI
state + fpm[50..53] mirrors and the fpm[5]=1 warm-start contract
(SURVEY.md section 5 'Checkpoint / resume': "checkpoint = (Q basis, loop
counter, fpm) — trivial to serialize; keep warm-start semantics"). This
module is that serialization: save the subspace + counters, resume by
warm-starting any driver with fpm[5]=1 and Q0=checkpoint.Q.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core.parameters import FeastParameters, _ensure_fpm

__all__ = ["FeastCheckpoint", "save_checkpoint", "load_checkpoint",
           "resume_kwargs"]


@dataclasses.dataclass
class FeastCheckpoint:
    Q: np.ndarray          # (N, M0) current subspace (the restart basis)
    fpm: np.ndarray        # 64-slot parameter array (includes counters 50-53)
    loop: int              # refinement loops completed
    region: tuple          # (Emin, Emax) or (Emid_re, Emid_im, r)
    kind: str              # 'interval' | 'general'
    lam: np.ndarray | None = None
    res: np.ndarray | None = None


def save_checkpoint(path, result, fpm, region, kind="interval") -> None:
    """Persist a checkpoint from a FeastResult/FeastGeneralResult (uses the
    full static-shape buffers so the restart subspace keeps all M0 slots)."""
    fpm = _ensure_fpm(fpm)
    Q = np.asarray(result.q_full if result.q_full is not None else result.q)
    np.savez(
        path, Q=Q, fpm=fpm.to_array(), loop=np.int64(result.loop),
        region=np.asarray(region, float), kind=np.str_(kind),
        lam=np.asarray(result.lam_full if result.lam_full is not None
                       else result.lam),
        res=np.asarray(result.res_full if result.res_full is not None
                       else result.res))


def load_checkpoint(path) -> FeastCheckpoint:
    with np.load(path, allow_pickle=False) as z:
        return FeastCheckpoint(
            Q=z["Q"], fpm=z["fpm"], loop=int(z["loop"]),
            region=tuple(z["region"].tolist()), kind=str(z["kind"]),
            lam=z["lam"], res=z["res"])


def resume_kwargs(ckpt: FeastCheckpoint) -> dict:
    """Driver kwargs implementing the fpm[5]=1 warm start
    (feast_kernel.jl:67-79): resume iteration from the saved subspace.

    Every driver accepts these kwargs: dense (feast_sy*/he*), dense general
    (feast_ge*), sparse (feast_*csr*), sparse general, banded (feast_*b*),
    matrix-free (feast_matvec*), polynomial (feast_pep/feast_pep_direct —
    an (N, M0) checkpoint basis is lifted into the companion space by
    tiling), and the sharded pfeast_* drivers. Drivers honor fpm[5]=0 by
    ignoring a stale Q0 (core/tools.initial_subspace)."""
    fpm = FeastParameters(ckpt.fpm)
    fpm[5] = 1
    return {"fpm": fpm, "Q0": ckpt.Q}
