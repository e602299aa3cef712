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
                                        #    (MULT_B first for generalized B)
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

__all__ = ["FeastSRCI", "FeastHRCI", "FeastGRCI", "FeastPRCI",
           "FeastPolyRCI"]


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
        return self._emit_factorize()

    def _emit_factorize(self):
        """Emit FACTORIZE with the new node's shift in ``state.Ze`` before the
        first SOLVE at each contour node (ijob=10 contract,
        feast_kernel.jl:97: the kernel sets ijob=FACTORIZE with Ze=Zne[e]
        before handing out SOLVE requests for that node)."""
        self.Ze = complex(self.contour.Zne[self.e])
        self.phase = "factorize"
        self._mirror_fpm()
        return FeastRCIJob.FACTORIZE


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

        if self.phase == "factorize":
            self.workc = self._rhs_for_node()
            self.phase = "solve"
            return FeastRCIJob.SOLVE

        if self.phase == "solve":
            w = 2.0 * self.contour.Wne[self.e]
            self._Qproj += w * self.workc
            self.e += 1
            self._mirror_fpm()
            if self.e < self.contour.ne:
                return self._emit_factorize()
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
        # gate on the ENSURED fpm (self.fpm), not the raw argument: the
        # defaulted fpm[5] carries the contract even when the caller
        # passed fpm=None (round-3 advisor note)
        if self.fpm[5] == 1 and Q0 is not None:
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
        if self.phase == "factorize":
            self.workc = self._rhs_for_node()
            self.phase = "solve"
            return FeastRCIJob.SOLVE

        if self.phase == "factorize_adj":
            self.workc = self._rhs_for_node()
            self.phase = "solve"
            return FeastRCIJob.SOLVE_TRANSPOSE

        if self.phase == "solve":
            W = self.contour.Wne[self.e]
            if not self._adj:
                self._Qproj += W * self.workc
                self._adj = True
                self.phase = "factorize_adj"
                self._mirror_fpm()
                # ijob=20 contract (feast_kernel.jl): announce the adjoint
                # factorization (Ze B - A)^H before the adjoint solve; callers
                # reusing the plain factorization with trans may no-op here.
                return FeastRCIJob.FACTORIZE_TRANSPOSE
            self._Qproj += np.conj(W) * self.workc
            self._adj = False
            self.e += 1
            self._mirror_fpm()
            if self.e < self.contour.ne:
                return self._emit_factorize()
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

        if self.phase == "factorize":
            self.workc = self._rhs_for_node()
            self.phase = "solve"
            return FeastRCIJob.SOLVE

        if self.phase == "solve":
            self._Qproj += self.contour.Wne[self.e] * self.workc
            self.e += 1
            self._mirror_fpm()
            if self.e < self.contour.ne:
                return self._emit_factorize()
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


class FeastPRCI(FeastSRCI):
    """Parallel (batch) real-symmetric RCI — parity surface of
    ``ParallelFeastState`` + ``pfeast_srci!`` and the extended ijob codes
    (feast_parallel_rci.jl:5-266, :386-390).

    Instead of one SOLVE per contour node, a single PARALLEL_SOLVE (ijob=50)
    hands the caller ALL nodes at once: read ``state.Zall`` (ne,) and
    ``state.workc`` (N, M0), solve (Zall[e] B - A) X_e = workc for every e
    (in parallel — threads, devices, whatever the caller owns), and assign
    the stacked result to ``state.Xall`` (ne, N, M0). The kernel then
    performs the weighted accumulation itself (the PARALLEL_ACCUMULATE step,
    emitted for observability) and continues with the classic MULT_A/MULT_B
    Rayleigh-Ritz jobs.
    """

    def _start_sweep(self):
        self._Qproj = np.zeros((self.N, self.M0), complex)
        self.Zall = np.asarray(self.contour.Zne, complex)
        self.workc = self._rhs_for_node()
        self.Xall = None
        self.phase = "psolve"
        self._mirror_fpm()
        return FeastRCIJob.PARALLEL_SOLVE

    def step(self) -> FeastRCIJob:
        if self.phase == "psolve":
            if self.Xall is None:
                raise ValueError(
                    "PARALLEL_SOLVE not serviced: assign state.Xall "
                    "(ne, N, M0) before calling step() again")
            X = np.asarray(self.Xall, complex)
            if X.shape != (self.contour.ne, self.N, self.M0):
                raise ValueError(
                    f"state.Xall must be (ne={self.contour.ne}, N={self.N}, "
                    f"M0={self.M0}), got {X.shape}")
            self.e = self.contour.ne
            self._mirror_fpm()
            self.phase = "paccum"
            return FeastRCIJob.PARALLEL_ACCUMULATE

        if self.phase == "paccum":
            X = np.asarray(self.Xall, complex)
            W = np.asarray(self.contour.Wne, complex)
            self._Qproj = np.einsum("e,enm->nm", 2.0 * W, X)
            self.Xall = None
            Qp = np.real(self._Qproj)
            U, s, _ = np.linalg.svd(Qp, full_matrices=False)
            m = (s >= self._rank_cut * s[0]).astype(float)
            self._U = U * m[None, :]
            self._mask = m
            self.workc = self._U.astype(complex)
            self.phase = "mult_a_rr"
            return FeastRCIJob.MULT_A

        return super().step()


class FeastPolyRCI:
    """Polynomial RCI state machine — parity surface of ``_feast_poly_grci!``
    + ``feast_srcipev!/grcipev!`` (feast_kernel.jl:964-1261).

    Caller contract (moment/Beyn scheme on the polynomial resolvent):

        state = FeastPolyRCI(N, d, M0, Emid, r, fpm)
        job = state.step()                     # FACTORIZE with state.Ze
        while job != FeastRCIJob.DONE:
            if job == FeastRCIJob.FACTORIZE:   # factorize P(state.Ze)
                ...
            elif job == FeastRCIJob.SOLVE:     # workc <- P(Ze)^{-1} workc
                state.workc = my_solve(state.Ze, state.workc)
            elif job == FeastRCIJob.MULT_A:    # workc[:, j] <- P(lam[j]) q[:, j]
                state.workc = apply_P_columns(state.lam, state.q)
            job = state.step()

    The kernel accumulates the zeroth/first moments A0 = sum w_e Y_e,
    A1 = sum w_e z_e Y_e over the FULL contour, rank-deflates A0 by SVD,
    solves the small Beyn pencil, and measures residuals through the
    caller-applied P(lam_j) q_j products — the same numerics as
    solvers/dense_general._pep_direct_jit, host-side with caller-owned
    linear algebra.
    """

    def __init__(self, N, d, M0, Emid, r, fpm=None, *, Q0=None):
        fpm = _ensure_fpm(fpm)
        if fpm[8] < 32:
            fpm = fpm.copy()
            fpm[8] = 32     # Beyn accuracy is quadrature-limited
        from ..core.aux import feast_get_custom_contour
        self.contour = (feast_get_custom_contour(fpm)
                        or feast_gcontour(complex(Emid), float(r), fpm))
        # Beyn moments live in the N-dim space: M0 probes beyond N add no
        # information and break the moment shapes — clamp (the companion
        # path feast_pep accepts M0 up to d*N instead).
        self.N, self.d, self.M0 = int(N), int(d), min(int(M0), int(N))
        self.fpm = fpm
        self.Emid, self.r = complex(Emid), float(r)
        self.aspect = fpm[18] / 100.0
        self.tol = feast_tolerance(fpm, np.float64)
        self.max_loops = fpm[4]
        self.loop = 0
        self.e = 0
        self.info = FeastError.SUCCESS
        self.M = 0
        self.epsout = np.inf
        self.lam = None
        self.q = None
        self.res = None
        if fpm[5] == 1 and Q0 is not None:
            self.V = np.asarray(Q0, complex).copy()
        else:
            self.V = _seeded_complex(N, M0)
        self.phase = "init"
        self._rank_cut = 1e-2       # quadrature-leakage cut (see _pep_direct_jit)

    def _mirror_fpm(self):
        self.fpm[50] = self.e + 1
        self.fpm[51] = self.loop
        self.fpm[52] = self.M
        self.fpm[53] = int(self.info)

    def _emit_factorize(self):
        self.Ze = complex(self.contour.Zne[self.e])
        self.phase = "factorize"
        self._mirror_fpm()
        return FeastRCIJob.FACTORIZE

    def _start_sweep(self):
        self._A0 = np.zeros((self.N, self.M0), complex)
        self._A1 = np.zeros((self.N, self.M0), complex)
        self.e = 0
        return self._emit_factorize()

    def _inside(self, lam):
        w = lam - self.Emid
        return ((w.real / self.r) ** 2
                + (w.imag / (self.r * self.aspect)) ** 2) <= 1.0

    def step(self) -> FeastRCIJob:
        if self.phase == "init":
            return self._start_sweep()

        if self.phase == "factorize":
            self.workc = self.V.astype(complex)
            self.phase = "solve"
            return FeastRCIJob.SOLVE

        if self.phase == "solve":
            w = self.contour.Wne[self.e]
            z = self.contour.Zne[self.e]
            Y = np.asarray(self.workc, complex)
            self._A0 += w * Y
            self._A1 += (w * z) * Y
            self.e += 1
            self._mirror_fpm()
            if self.e < self.contour.ne:
                return self._emit_factorize()
            # Beyn pencil on the moments
            U, s, Wv = np.linalg.svd(self._A0, full_matrices=False)
            m = (s >= self._rank_cut * s[0]).astype(float)
            s_inv = np.where(m > 0, 1.0 / np.where(s > 0, s, 1.0), 0.0)
            Bred = (U.conj().T @ self._A1) @ (Wv.conj().T * s_inv[None, :])
            marker = self.Emid + 3.0 * self.r
            Bred = Bred * (m[:, None] * m[None, :]) \
                + marker * np.diag(1.0 - m)
            lam, Sv = np.linalg.eig(Bred)
            x = U @ Sv
            nrm = np.linalg.norm(x, axis=0)
            x = x / np.where(nrm > 0, nrm, 1.0)[None, :]
            self.lam, self.q = lam, x
            self.workc = None
            self.phase = "mult_p"
            return FeastRCIJob.MULT_A

        if self.phase == "mult_p":
            PX = np.asarray(self.workc, complex)   # P(lam_j) q_j columns
            res = (np.linalg.norm(PX, axis=0)
                   / np.maximum(np.abs(self.lam), 1.0))
            inside = self._inside(self.lam)
            order = np.lexsort((np.abs(self.lam) ** 2, ~inside * 1))
            self.lam = self.lam[order]
            self.q = self.q[:, order]
            self.res = res[order]
            inside = inside[order]
            plausible = inside & (self.res < 0.1)
            self.M = int(plausible.sum())
            self.inside = plausible
            self.epsout = (float(np.max(np.where(plausible, self.res, 0.0)))
                           if self.M else np.inf)
            self.loop += 1
            self._mirror_fpm()
            if self.epsout <= self.tol and self.M > 0:
                self.phase = "done"
                return FeastRCIJob.DONE
            if self.loop > self.max_loops:
                self.info = FeastError.NO_CONVERGENCE
                self.phase = "done"
                self._mirror_fpm()
                return FeastRCIJob.DONE
            self.V = self.q.copy()
            return self._start_sweep()

        return FeastRCIJob.DONE
