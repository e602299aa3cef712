"""North-star 3D rung: the BASELINE config-4 wording reads "2D/3D
Laplacian" — this measures the 3D half on the chip.

7-point-stencil 3D Laplacian on an nx^3 grid (nx = 2^p), lowest ~52
eigenpairs at f64 1e-8 through the polynomial filter (solver="cheb").
Ground truth is exact by tensor structure: lam = wx_i + wy_j + wz_k with
wx = 2 - 2 cos(m pi / (nx+1)).

The 3D offsets (+-1, +-nx, +-nx^2) stress the fused-kernel VMEM gate
(`cheb_plan_fits`): the +-nx^2 offsets force nx^2-lane halo blocks, so
at nx=64 the DS working set is ~19 MB (fits the 32 MB model budget /
64 MB kernel cap) while larger grids fall back to the unfused chunked
ladder — this script exercises and reports whichever path the gate picks.

Usage: python scripts/scale_sparse_3d.py [log2_side ...]   (default 6)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp


def lap3d(nx):
    D = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    I = sp.eye(nx)
    return (sp.kron(sp.kron(D, I), I) + sp.kron(sp.kron(I, D), I)
            + sp.kron(sp.kron(I, I), D)).tocsr()


def lap3d_eigs(nx, kmax=60):
    w1 = 2.0 - 2.0 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
    k = min(kmax, nx)
    w = np.sort((w1[:k, None, None] + w1[None, :k, None]
                 + w1[None, None, :k]).ravel())
    return w[: k * 6]


def main(sides):
    from feastkit_tpu import feastinit
    from feastkit_tpu.solvers.sparse import feast_scsrev

    print("devices:", jax.devices(), flush=True)
    for p in sides:
        nx = 2 ** p
        N = nx ** 3
        A = lap3d(nx)
        w = lap3d_eigs(nx)
        gaps = np.nonzero(np.diff(w) > 1e-12)[0]
        hi = gaps[np.searchsorted(gaps, 50)]
        Emin = float(w[0] * 0.5)
        Emax = float(0.5 * (w[hi] + w[hi + 1]))
        exp = w[(w >= Emin) & (w <= Emax)]
        M0 = int(-(-int(len(exp) * 1.3) // 8) * 8)
        fpm = feastinit()
        fpm[3] = 8
        fpm[1] = 1
        print(f"N={N} ({nx}^3)  target {len(exp)} pairs  M0={M0} "
              f"interval=({Emin:.3e},{Emax:.3e})", flush=True)
        t0 = time.perf_counter()
        r = feast_scsrev(A, Emin, Emax, M0, fpm, solver="cheb")
        t_cold = time.perf_counter() - t0
        ok = r.M == len(exp)
        err = np.abs(np.sort(r.lam) - exp).max() if ok else float("nan")
        print(f"  cold {t_cold:.1f}s  M={r.M}/{len(exp)} info={r.info} "
              f"epsout={r.epsout:.2e} loops={r.loop} lam_err={err:.2e}",
              flush=True)
        t0 = time.perf_counter()
        r = feast_scsrev(A, Emin, Emax, M0, fpm, solver="cheb")
        t_warm = time.perf_counter() - t0
        print(f"  warm {t_warm:.1f}s  M={r.M} epsout={r.epsout:.2e} "
              f"loops={r.loop}", flush=True)


if __name__ == "__main__":
    sides = [int(a) for a in sys.argv[1:]] or [6]
    main(sides)
