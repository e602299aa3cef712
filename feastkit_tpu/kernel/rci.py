"""Explicit step-function RCI API: the reverse-communication parity surface.

Counterpart of the reference's RCI kernels ``feast_srci!/hrci!/grci!``
(src/kernel/feast_kernel.jl) for users who bring NON-JAX solvers (external
factorizations, FORTRAN codes, out-of-core solves). The functional cores in
kernel/hermitian.py / kernel/general.py are the fast path; this state machine
exists because the reference's API contract is "caller owns the linear
algebra" (SURVEY.md section 3.2: the RCI inversion-of-control is the
architectural signature to preserve).

Protocol (mirrors the ijob codes, feast_types.jl:227-249):

    state = FeastSRCI(N, M0, Emin, Emax, fpm)
    job = state.step()                  # -> FACTORIZE with state.Ze
    while job != FeastRCIJob.DONE:
        if job == FeastRCIJob.FACTORIZE:   # factorize (Ze*B - A)
            ...
        elif job == FeastRCIJob.SOLVE:     # state.workc <- (Ze*B-A)^-1 @ state.workc
            state.workc = my_solve(state.Ze, state.workc)
        elif job == FeastRCIJob.MULT_A:    # state.workc <- A @ state.q
            state.workc = A @ state.q
        elif job == FeastRCIJob.MULT_B:    # state.workc <- B @ state.q
            state.workc = B @ state.q
        job = state.step()
    lam, q, res, M = state.lam, state.q, state.res, state.M

Numerics are host-side numpy here (the caller's solver dominates the cost;
the reduced M0 x M0 work is negligible) and follow the same robust
Rayleigh-Ritz machinery as the jitted cores, including the fpm[50..53]
internal counters mirror (feast_kernel.jl:50-54).
"""
from __future__ import annotations

import numpy as np

from ..core.contour import feast_contour, feast_gcontour
from ..core.parameters import (FeastParameters, _ensure_fpm, feast_tolerance)
from ..core.types import FeastError, FeastRCIJob

__all__ = ["FeastSRCI", "FeastHRCI", "FeastGRCI"]


def _seeded_real(N, M0):
    rng = np.random.default_rng((N * 1000003 + M0 * 101) % (2**31 - 1))
    Q = rng.standard_normal((N, M0))
    return Q / np.linalg.norm(Q, axis=0, keepdims=True)


def _seeded_complex(N, M0):
    rng = np.random.default_rng((N * 1000003 + M0 * 101 + 7) % (2**31 - 1))
    Q = rng.standard_normal((N, M0)) + 1j * rng.standard_normal((N, M0))
    return Q / np.linalg.norm(Q, axis=0, keepdims=True)


class _RCIBase:
    """Shared contour sweep + Rayleigh-Ritz machinery."""

    def __init__(self, N, M0, fpm, contour, hermitian, tol_dtype):
        self.N, self.M0 = int(N), int(M0)
        self.fpm = fpm
        self.contour = contour
        self.hermitian = hermitian
        self.tol = feast_tolerance(fpm, tol_dtype)
        self.max_loops = fpm[4]
        self.loop = 0
        self.e = 0                 # contour node index
        self.phase = "init"
        self.Ze = complex(contour.Zne[0])
        self.epsout = np.inf
        self.M = 0
        self.info = FeastError.SUCCESS
        self.lam = None
        self.q = None
        self.res = None
        self._Qproj = None
        self._rank_cut = float(np.finfo(np.float64).eps) ** 0.25

    # -- helpers -------------------------------------------------------
    def _mirror_fpm(self):
        """Internal counters mirrored in fpm[50..53]
        (feast_kernel.jl:50-54)."""
        self.fpm[50] = self.e + 1
        self.fpm[51] = self.loop
        self.fpm[52] = self.M
        self.fpm[53] = int(self.info)

    def _start_sweep(self):
        self._Qproj = np.zeros((self.N, self.M0), complex)
        self.e = 0
        self.Ze = complex(self.contour.Zne[0])
        self.workc = self._rhs_for_node()
        self.phase = "solve"
        self._mirror_fpm()
        return FeastRCIJob.SOLVE


class FeastSRCI(_RCIBase):
    """Real-symmetric RCI (parity: feast_srci!, feast_kernel.jl:7-293).

    Caller services: SOLVE — overwrite ``state.workc`` (complex N x M0) with
    (Ze B - A)^{-1} workc; MULT_A / MULT_B — overwrite ``state.workc`` (real
    part used) with A @ state.q / B @ state.q.
    """

    def __init__(self, N, M0, Emin, Emax, fpm=None, *, Q0=None,
                 standard_B=False):
        fpm = _ensure_fpm(fpm)
        from ..core.aux import feast_get_custom_contour
        contour = feast_get_custom_contour(fpm) or feast_contour(Emin, Emax, fpm)
        super().__init__(N, M0, fpm, contour, False, np.float64)
        self.Emin, self.Emax = float(Emin), float(Emax)
        self.standard_B = standard_B
        if fpm[5] == 1 and Q0 is not None:
            self.Q = np.asarray(Q0, float).copy()
        else:
            self.Q = _seeded_real(N, M0)
        self.workc = None
        self._pending = None

    # caller is expected to have applied B to the basis itself for the RHS;
    # we keep the reference convention: SOLVE's input workc is B @ Q, which
    # the kernel prepares via a MULT_B request unless standard_B.
    def _rhs_for_node(self):
        return (self._BQ if not self.standard_B else self.Q).astype(complex)

    def step(self) -> FeastRCIJob:
        if self.phase == "init":
            if self.standard_B:
                self._BQ = self.Q.copy()
                return self._start_sweep()
            self.phase = "mult_b_init"
            self.workc = self.Q.astype(complex)
            return FeastRCIJob.MULT_B

        if self.phase == "mult_b_init":
            self._BQ = np.real(self.workc).copy()
            return self._start_sweep()

        if self.phase == "solve":
            w = 2.0 * self.contour.Wne[self.e]
            self._Qproj += w * self.workc
            self.e += 1
            self._mirror_fpm()
            if self.e < self.contour.ne:
                self.Ze = complex(self.contour.Zne[self.e])
                self.workc = self._rhs_for_node()
                return FeastRCIJob.SOLVE
            # sweep done: orthonormalize + request A application
            Qp = np.real(self._Qproj)
            U, s, _ = np.linalg.svd(Qp, full_matrices=False)
            m = (s >= self._rank_cut * s[0]).astype(float)
            self._U = U * m[None, :]
            self._mask = m
            self.workc = self._U.astype(complex)
            self.phase = "mult_a_rr"
            return FeastRCIJob.MULT_A

        if self.phase == "mult_a_rr":
            AU = np.real(self.workc)
            if self.standard_B:
                self._rr(AU, self._U.T @ self._U)
                self.workc = np.real(self.q).astype(complex)
                self.phase = "mult_a_res"
                return FeastRCIJob.MULT_A
            self._AU = AU
            self.workc = self._U.astype(complex)
            self.phase = "mult_b_rr"
            return FeastRCIJob.MULT_B

        if self.phase == "mult_b_rr":
            BU = np.real(self.workc)
            self._rr(self._AU, self._U.T @ BU)
            self.workc = self.q.astype(complex)
            self.phase = "mult_a_res"
            return FeastRCIJob.MULT_A

        if self.phase == "mult_a_res":
            self._Aq = np.real(self.workc)
            if self.standard_B:
                return self._finish_loop(self.q.copy())
            self.workc = self.q.astype(complex)
            self.phase = "mult_b_res"
            return FeastRCIJob.MULT_B

        if self.phase == "mult_b_res":
            return self._finish_loop(np.real(self.workc))

        return FeastRCIJob.DONE

    def _rr(self, AU, G):
        U = self._U
        m = self._mask
        BIG = self.Emax + 2.0 * (self.Emax - self.Emin)
        S = U.T @ AU + BIG * np.diag(1 - m)
        G = G + np.diag(1 - m)
        S = (S + S.T) / 2
        G = (G + G.T) / 2
        import scipy.linalg as sla
        lam, V = sla.eigh(S, G)
        q = U @ V
        nrm = np.linalg.norm(q, axis=0)
        q = q / np.where(nrm > 0, nrm, 1.0)[None, :]
        self.lam, self.q = lam, q

    def _finish_loop(self, Bq):
        lam, q = self.lam, self.q
        resid = self._Aq - lam[None, :] * Bq
        res = np.linalg.norm(resid, axis=0) / np.maximum(np.abs(lam), 1.0)
        inside = (lam >= self.Emin) & (lam <= self.Emax)
        order = np.lexsort((lam, ~inside * 1))
        self.lam, self.q, self.res = lam[order], q[:, order], res[order]
        inside = inside[order]
        plausible = inside & (self.res < 0.1)
        self.M = int(plausible.sum())
        self.inside = plausible
        self.epsout = float(np.max(np.where(plausible, self.res, 0.0))) \
            if self.M else 0.0
        self.loop += 1
        self._mirror_fpm()
        if (self.epsout <= self.tol and self.M > 0) or self.loop > self.max_loops:
            if not (self.epsout <= self.tol and self.M > 0):
                self.info = FeastError.NO_CONVERGENCE
            self.phase = "done"
            self.lam = self.lam
            return FeastRCIJob.DONE
        self.Q = np.real(self.q).copy()
        if self.standard_B:
            self._BQ = self.Q.copy()
            return self._start_sweep()
        self.phase = "mult_b_init"
        self.workc = self.Q.astype(complex)
        return FeastRCIJob.MULT_B


class FeastHRCI(FeastSRCI):
    """Complex-Hermitian RCI (parity: feast_hrci!, feast_kernel.jl:397-644).

    Same protocol; additionally issues SOLVE_TRANSPOSE requests: the caller
    must overwrite workc with (Ze B - A)^{-H} workc (the adjoint solve on the
    SAME factorization; zfeast ijob=21).
    """

    def __init__(self, N, M0, Emin, Emax, fpm=None, *, Q0=None,
                 standard_B=False):
        super().__init__(N, M0, Emin, Emax, fpm, Q0=None,
                         standard_B=standard_B)
        if fpm is not None and self.fpm[5] == 1 and Q0 is not None:
            self.Q = np.asarray(Q0, complex).copy()
        else:
            rng = np.random.default_rng(
                (N * 1000003 + M0 * 101 + 1) % (2**31 - 1))
            Q = rng.standard_normal((N, M0)).astype(complex)
            self.Q = Q / np.linalg.norm(Q, axis=0, keepdims=True)
        self._adj = False

    def _rhs_for_node(self):
        return (self._BQ if not self.standard_B else self.Q).astype(complex)

    def step(self) -> FeastRCIJob:
        if self.phase == "solve":
            W = self.contour.Wne[self.e]
            if not self._adj:
                self._Qproj += W * self.workc
                self._adj = True
                self.workc = self._rhs_for_node()
                self._mirror_fpm()
                return FeastRCIJob.SOLVE_TRANSPOSE
            self._Qproj += np.conj(W) * self.workc
            self._adj = False
            self.e += 1
            self._mirror_fpm()
            if self.e < self.contour.ne:
                self.Ze = complex(self.contour.Zne[self.e])
                self.workc = self._rhs_for_node()
                return FeastRCIJob.SOLVE
            Qp = self._Qproj
            U, s, _ = np.linalg.svd(Qp, full_matrices=False)
            m = (s >= self._rank_cut * s[0]).astype(float)
            self._U = U * m[None, :]
            self._mask = m
            self.workc = self._U.copy()
            self.phase = "mult_a_rr"
            return FeastRCIJob.MULT_A

        if self.phase == "mult_b_init":
            self._BQ = self.workc.copy()
            return self._start_sweep()

        if self.phase == "mult_a_rr":
            AU = self.workc
            if self.standard_B:
                self._rr_h(AU, self._U.conj().T @ self._U)
                self.workc = self.q.copy()
                self.phase = "mult_a_res"
                return FeastRCIJob.MULT_A
            self._AU = AU.copy()
            self.workc = self._U.copy()
            self.phase = "mult_b_rr"
            return FeastRCIJob.MULT_B

        if self.phase == "mult_b_rr":
            self._rr_h(self._AU, self._U.conj().T @ self.workc)
            self.workc = self.q.copy()
            self.phase = "mult_a_res"
            return FeastRCIJob.MULT_A

        if self.phase == "mult_a_res":
            self._Aq = self.workc.copy()
            if self.standard_B:
                return self._finish_loop_h(self.q.copy())
            self.workc = self.q.copy()
            self.phase = "mult_b_res"
            return FeastRCIJob.MULT_B

        if self.phase == "mult_b_res":
            return self._finish_loop_h(self.workc.copy())

        if self.phase == "init":
            if self.standard_B:
                self._BQ = self.Q.copy()
                return self._start_sweep()
            self.phase = "mult_b_init"
            self.workc = self.Q.copy()
            return FeastRCIJob.MULT_B

        return FeastRCIJob.DONE

    def _rr_h(self, AU, G):
        import scipy.linalg as sla
        U = self._U
        m = self._mask
        BIG = self.Emax + 2.0 * (self.Emax - self.Emin)
        S = U.conj().T @ AU + BIG * np.diag(1 - m)
        G = G + np.diag(1 - m)
        S = (S + S.conj().T) / 2
        G = (G + G.conj().T) / 2
        lam, V = sla.eigh(S, G)
        q = U @ V
        nrm = np.linalg.norm(q, axis=0)
        q = q / np.where(nrm > 0, nrm, 1.0)[None, :]
        self.lam, self.q = lam.real, q

    def _finish_loop_h(self, Bq):
        lam, q = self.lam, self.q
        resid = self._Aq - lam[None, :] * Bq
        res = np.linalg.norm(resid, axis=0) / np.maximum(np.abs(lam), 1.0)
        inside = (lam >= self.Emin) & (lam <= self.Emax)
        order = np.lexsort((lam, ~inside * 1))
        self.lam, self.q, self.res = lam[order], q[:, order], res[order]
        inside = inside[order]
        plausible = inside & (self.res < 0.1)
        self.M = int(plausible.sum())
        self.inside = plausible
        self.epsout = float(np.max(np.where(plausible, self.res, 0.0))) \
            if self.M else 0.0
        self.loop += 1
        self._mirror_fpm()
        if (self.epsout <= self.tol and self.M > 0) or self.loop > self.max_loops:
            if not (self.epsout <= self.tol and self.M > 0):
                self.info = FeastError.NO_CONVERGENCE
            self.phase = "done"
            return FeastRCIJob.DONE
        self.Q = self.q.copy()
        if self.standard_B:
            self._BQ = self.Q.copy()
            return self._start_sweep()
        self.phase = "mult_b_init"
        self.workc = self.Q.copy()
        return FeastRCIJob.MULT_B


class FeastGRCI(_RCIBase):
    """General non-Hermitian RCI (parity: feast_grci!,
    feast_kernel.jl:646-962): full contour, complex Ritz values, ellipse
    membership. Same caller contract as FeastSRCI with complex data."""

    def __init__(self, N, M0, Emid, r, fpm=None, *, Q0=None,
                 standard_B=False, bilinear=False):
        fpm = _ensure_fpm(fpm)
        from ..core.aux import feast_get_custom_contour
        contour = feast_get_custom_contour(fpm) or feast_gcontour(complex(Emid), float(r), fpm)
        super().__init__(N, M0, fpm, contour, False, np.float64)
        self.Emid, self.r = complex(Emid), float(r)
        self.aspect = fpm[18] / 100.0
        self.rot = fpm[19]
        self.standard_B = standard_B
        self.bilinear = bilinear
        if fpm[5] == 1 and Q0 is not None:
            self.Q = np.asarray(Q0, complex).copy()
        else:
            self.Q = _seeded_complex(N, M0)
        self.workc = None

    def _rhs_for_node(self):
        return (self._BQ if not self.standard_B else self.Q).astype(complex)

    def _inside(self, lam):
        w = (lam - self.Emid) * np.exp(-1j * self.rot / 180.0 * np.pi)
        return (w.real / self.r) ** 2 + (w.imag / (self.r * self.aspect)) ** 2 <= 1.0

    def step(self) -> FeastRCIJob:
        if self.phase == "init":
            if self.standard_B:
                self._BQ = self.Q.copy()
                return self._start_sweep()
            self.phase = "mult_b_init"
            self.workc = self.Q.copy()
            return FeastRCIJob.MULT_B

        if self.phase == "mult_b_init":
            self._BQ = self.workc.copy()
            return self._start_sweep()

        if self.phase == "solve":
            self._Qproj += self.contour.Wne[self.e] * self.workc
            self.e += 1
            self._mirror_fpm()
            if self.e < self.contour.ne:
                self.Ze = complex(self.contour.Zne[self.e])
                self.workc = self._rhs_for_node()
                return FeastRCIJob.SOLVE
            U, s, _ = np.linalg.svd(self._Qproj, full_matrices=False)
            m = (s >= self._rank_cut * s[0]).astype(float)
            self._U = U * m[None, :]
            self._mask = m
            self.workc = self._U.copy()
            self.phase = "mult_a_rr"
            return FeastRCIJob.MULT_A

        if self.phase == "mult_a_rr":
            self._AU = self.workc.copy()
            self.workc = self._U.copy()
            if self.standard_B:
                self._rr_g(self._AU, self._pair(self._U) @ self._U)
                self.workc = self.q.copy()
                self.phase = "mult_a_res"
                return FeastRCIJob.MULT_A
            self.phase = "mult_b_rr"
            return FeastRCIJob.MULT_B

        if self.phase == "mult_b_rr":
            self._rr_g(self._AU, self._pair(self._U) @ self.workc)
            self.workc = self.q.copy()
            self.phase = "mult_a_res"
            return FeastRCIJob.MULT_A

        if self.phase == "mult_a_res":
            self._Aq = self.workc.copy()
            if self.standard_B:
                return self._finish(self.q.copy())
            self.workc = self.q.copy()
            self.phase = "mult_b_res"
            return FeastRCIJob.MULT_B

        if self.phase == "mult_b_res":
            return self._finish(self.workc.copy())

        return FeastRCIJob.DONE

    def _pair(self, U):
        return U.T if self.bilinear else U.conj().T

    def _rr_g(self, AU, G):
        import scipy.linalg as sla
        U = self._U
        m = self._mask
        marker = self.Emid + 3.0 * self.r
        S = self._pair(U) @ AU + marker * np.diag(1 - m)
        G = G + np.diag(1 - m)
        lam, V = sla.eig(S, G)
        q = U @ V
        nrm = np.linalg.norm(q, axis=0)
        q = q / np.where(nrm > 0, nrm, 1.0)[None, :]
        self.lam, self.q = lam, q

    def _finish(self, Bq):
        lam, q = self.lam, self.q
        resid = self._Aq - lam[None, :] * Bq
        res = np.linalg.norm(resid, axis=0) / np.maximum(np.abs(lam), 1.0)
        inside = self._inside(lam)
        order = np.lexsort((np.abs(lam) ** 2, ~inside * 1))
        self.lam, self.q, self.res = lam[order], q[:, order], res[order]
        inside = inside[order]
        plausible = inside & (self.res < 0.1)
        self.M = int(plausible.sum())
        self.inside = plausible
        self.epsout = float(np.max(np.where(plausible, self.res, 0.0))) \
            if self.M else 0.0
        self.loop += 1
        self._mirror_fpm()
        if (self.epsout <= self.tol and self.M > 0) or self.loop > self.max_loops:
            if not (self.epsout <= self.tol and self.M > 0):
                self.info = FeastError.NO_CONVERGENCE
            self.phase = "done"
            return FeastRCIJob.DONE
        self.Q = self.q.copy()
        if self.standard_B:
            self._BQ = self.Q.copy()
            return self._start_sweep()
        self.phase = "mult_b_init"
        self.workc = self.Q.copy()
        return FeastRCIJob.MULT_B
