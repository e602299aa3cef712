"""At-scale measured rungs for the sparse GENERAL and COMPLEX-SYMMETRIC
families (VERDICT round-4 items 2+3): the one reference-covered problem
class that had zero perf evidence.

Fixtures (65k dof at p=8):

* general (feast_gcsrgv, parity feast_sparse.jl:873-1006): 2D
  convection-diffusion operator (upwinded first derivative in x ->
  NONSYMMETRIC), mass-like positive diagonal B, with 20 spiked diagonal
  entries placing isolated eigenvalues near 30 — a circular contour
  (Emid=30, r=3.2) encloses exactly those 20. The full-contour oblique
  projector, two-sided Rayleigh-Ritz, warm-started adaptive-tol GMRES
  machinery runs end-to-end at scale.
* complex-symmetric (feast_scsrgv_complex, parity feast_sparse.jl:
  509-711): A = L + i V (L the 2D Laplacian, V a real diagonal
  potential) — A^T = A, non-Hermitian — same spiked-cluster design with
  complex spikes.

Ground truth: scipy ARPACK shift-invert eigs near the cluster (seconds at
65k). CPU proxy: the reference's own algorithm — cached splu per
full-contour node (UMFPACK stand-in) + oblique subspace iteration at the
measured loop count, threaded BLAS.

Work precision: complex64 on the chip (XLA:TPU compiles no c128 HLO — the
general engines demote, ops/splitlu.demote_f64_general; the proxy runs
c128 LAPACK, which only helps the proxy). Tolerance 1e-5.

Usage: python scripts/scale_general_families.py [p=8] [general|csym|both]
Records SHA-stamped entries in BENCH_LOCAL.json via record_measurement.
"""
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from record_measurement import record

NSPIKE = 20
EMID = 30.0 + 0.0j
RC = 3.2


def _build_general(nx):
    """Nonsymmetric conv-diff + mass diag B + 20 spikes near 30."""
    N = nx * nx
    c = 0.4   # upwind convection strength (|c|<1 keeps the bulk real)
    Dx = sp.diags([-1.0 - c, 2.0, -1.0 + c], [-1, 0, 1], shape=(nx, nx))
    Dy = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    A = (sp.kron(Dx, sp.eye(nx)) + sp.kron(sp.eye(nx), Dy)).tolil()
    rng = np.random.default_rng(21)
    i = np.arange(N)
    d = 1.0 + 0.25 * np.sin(2 * np.pi * i / N)
    pos = rng.choice(N, NSPIKE, replace=False)
    spikes = np.linspace(28.5, 31.5, NSPIKE)
    # generalized eigenvalues are ~ A_ii / B_ii for the spiked directions:
    # scale by d so the cluster lands AT the spike values inside the circle
    for i_, s in zip(pos, spikes):
        A[i_, i_] = s * d[i_]
    A = A.tocsr()
    B = sp.diags(d, 0, format="csr")
    return A, B


def _build_csym(nx):
    """Complex-symmetric A = L + iV with 20 complex spikes near 30+0.5i."""
    N = nx * nx
    D = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    L = (sp.kron(D, sp.eye(nx)) + sp.kron(sp.eye(nx), D)).tocsr()
    rng = np.random.default_rng(22)
    v = 0.3 * rng.random(N)
    A = (L + 1j * sp.diags(v, 0)).tolil()
    pos = rng.choice(N, NSPIKE, replace=False)
    spikes = np.linspace(28.5, 31.5, NSPIKE) + 0.5j
    for i, s in zip(pos, spikes):
        A[i, i] = s
    return A.tocsr(), None


def _truth(A, B, k=NSPIKE):
    w = spla.eigs(A.astype(np.complex128), k=k,
                  M=None if B is None else B.astype(np.float64),
                  sigma=complex(EMID), return_eigenvectors=False)
    return np.sort_complex(w)


def _cpu_proxy(A, B, M0, loops, fpm):
    """Reference algorithm: cached splu per full-contour node + oblique
    subspace iteration (feast_sparse.jl:873-1006 with UMFPACK stand-in)."""
    from feastkit_tpu.core.contour import feast_gcontour
    N = A.shape[0]
    c = feast_gcontour(complex(EMID), float(RC), fpm)
    Ac = A.astype(np.complex128).tocsc()
    Bc = (sp.identity(N, np.complex128, format="csc") if B is None
          else B.astype(np.complex128).tocsc())
    rng = np.random.default_rng(1)
    Q = rng.standard_normal((N, M0)) + 1j * rng.standard_normal((N, M0))
    t0 = time.perf_counter()
    lus = [spla.splu((z * Bc - Ac).tocsc()) for z in c.Zne]
    for _ in range(max(loops, 1) + 1):
        rhs = Bc @ Q
        Qp = np.zeros((N, M0), np.complex128)
        for z, wq, lu in zip(c.Zne, c.Wne, lus):
            Qp += 0.5 * wq * lu.solve(rhs)
        Qo, _ = np.linalg.qr(Qp)
        S = Qo.conj().T @ (Ac @ Qo)
        G = Qo.conj().T @ (Bc @ Qo)
        lam, V = np.linalg.eig(np.linalg.solve(G, S))
        Q = Qo @ V
    return time.perf_counter() - t0


def run_family(name, p):
    import jax
    from feastkit_tpu import feastinit
    from feastkit_tpu.solvers.sparse import (feast_gcsrgv,
                                             feast_scsrgv_complex,
                                             feast_scsrev_complex)
    nx = 2 ** p
    N = nx * nx
    if name == "general":
        A, B = _build_general(nx)
        drv = lambda fpm: feast_gcsrgv(A.astype(np.complex64),
                                       B.astype(np.float32),
                                       EMID, RC, 32, fpm)
        metric = f"sparse_gcsrgv_convdiff_n{N}_20pairs_c64_contour"
    else:
        A, B = _build_csym(nx)
        drv = lambda fpm: feast_scsrev_complex(A.astype(np.complex64),
                                               EMID + 0.5j, RC, 32, fpm)
        metric = f"sparse_scsrev_complex_n{N}_20pairs_c64_contour"
    print(f"[{name}] truth via ARPACK shift-invert ...", flush=True)
    w_true = _truth(A, B)
    fpm = feastinit()
    fpm[3] = 5

    t0 = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        r = drv(fpm)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        r2 = drv(fpm)
    warm = time.perf_counter() - t0
    if warm < cold and int(r2.M) == int(r.M):
        r, dev = r2, warm
    else:
        dev = cold
    lam = np.sort_complex(np.asarray(r.lam))
    match = (int(r.M) == NSPIKE)
    err = float(np.abs(lam - w_true).max()) if match else float("nan")
    print(f"[{name}] M={r.M}/{NSPIKE} info={int(r.info)} "
          f"epsout={float(r.epsout):.2e} loops={int(r.loop)} "
          f"lam_err={err:.2e} dev={dev:.1f}s (cold {cold:.1f}s)",
          flush=True)

    cpu = _cpu_proxy(A, B, 32, int(r.loop), fpm)
    print(f"[{name}] cpu splu proxy: {cpu:.1f}s -> vs {cpu / dev:.2f}x",
          flush=True)
    if jax.default_backend() == "cpu" or os.environ.get("RECORD") == "0":
        print(f"[{name}] CPU backend shakeout — NOT recording", flush=True)
        return int(r.M) == NSPIKE and int(r.info) == 0
    record(metric, round(dev, 2), "s",
           note=(f"LIVE chip run, complex64 work precision (no c128 HLO on "
                 f"XLA:TPU; general engines demote — the splu proxy runs "
                 f"full c128 LAPACK). {NSPIKE} isolated eigenpairs of a "
                 f"{N}-dof {'nonsymmetric conv-diff pencil' if name == 'general' else 'complex-symmetric L+iV operator'} "
                 f"on a circular contour; warm-start + adaptive-tol GMRES "
                 f"contour engine end-to-end. CPU proxy = cached splu per "
                 f"full-contour node at the measured loop count."),
           extra={"vs_baseline": round(cpu / dev, 2),
                  "detail": {"M": int(r.M), "target": NSPIKE,
                             "info": int(r.info),
                             "epsout": float(r.epsout),
                             "loops": int(r.loop), "lam_err": err,
                             "cold_s": round(cold, 2),
                             "cpu_proxy_s": round(cpu, 2)}})
    return match and int(r.info) == 0


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fam = sys.argv[2] if len(sys.argv) > 2 else "both"
    ok = True
    if fam in ("general", "both"):
        ok &= run_family("general", p)
    if fam in ("csym", "both"):
        ok &= run_family("csym", p)
    print("ALL OK" if ok else "SOME RUNS DID NOT CERTIFY", flush=True)


if __name__ == "__main__":
    main()
