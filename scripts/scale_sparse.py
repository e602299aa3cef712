"""North-star scale experiment: 2D Laplacian eigenpairs at 1e-8 on the chip.

Runs BASELINE.json config 4 (sparse generalized/standard symmetric EVP on a
2D Laplacian) at growing N with float64 + mixed precision (fpm[42] auto) +
multigrid-preconditioned GMRES, and reports wall time + residuals.

Usage: python scripts/scale_sparse.py [log2_side ...]   (default 9 10)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp


def lap2d(nx, ny):
    Dx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    Dy = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(ny, ny))
    return (sp.kron(Dx, sp.eye(ny)) + sp.kron(sp.eye(nx), Dy)).tocsr()


def lap2d_eigs(nx, ny, kmax=200):
    wx = 2.0 - 2.0 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
    wy = 2.0 - 2.0 * np.cos(np.arange(1, ny + 1) * np.pi / (ny + 1))
    w = np.sort((wx[:kmax, None] + wy[None, :kmax]).ravel())
    return w[: kmax * 4]


def main(sides):
    from feastkit_tpu import feastinit
    from feastkit_tpu.solvers.sparse import feast_scsrev

    print("devices:", jax.devices(), flush=True)
    for p in sides:
        nx = ny = 2 ** p
        N = nx * ny
        A = lap2d(nx, ny)
        w = lap2d_eigs(nx, ny)
        # lowest ~50 eigenvalues, endpoints at genuine gaps
        gaps = np.nonzero(np.diff(w) > 1e-12)[0]
        hi = gaps[np.searchsorted(gaps, 50)]
        Emin = float(w[0] * 0.5)
        Emax = float(0.5 * (w[hi] + w[hi + 1]))
        exp = w[(w >= Emin) & (w <= Emax)]
        M0 = int(-(-int(len(exp) * 1.3) // 8) * 8)
        import os
        fpm = feastinit()
        fpm[3] = 8
        fpm[1] = 1
        if os.environ.get("FEAST_QUAD"):
            fpm[16] = int(os.environ["FEAST_QUAD"])
        if os.environ.get("FEAST_NE"):
            fpm[2] = int(os.environ["FEAST_NE"])
        solver = sys.argv[2] if len(sys.argv) > 2 else "bicgstab"
        print(f"N={N} ({nx}x{ny})  target {len(exp)} pairs  M0={M0} "
              f"solver={solver} interval=({Emin:.3e},{Emax:.3e})", flush=True)
        t0 = time.perf_counter()
        r = feast_scsrev(A, Emin, Emax, M0, fpm, solver=solver,
                         solver_maxiter=250)
        t_cold = time.perf_counter() - t0
        ok = r.M == len(exp)
        err = np.abs(np.sort(r.lam) - exp).max() if ok else float("nan")
        print(f"  cold {t_cold:.1f}s  M={r.M}/{len(exp)} info={r.info} "
              f"epsout={r.epsout:.2e} loops={r.loop} "
              f"inner={r.inner_converged} lam_err={err:.2e}", flush=True)
        t0 = time.perf_counter()
        r = feast_scsrev(A, Emin, Emax, M0, fpm, solver=solver,
                         solver_maxiter=250)
        t_warm = time.perf_counter() - t0
        print(f"  warm {t_warm:.1f}s  M={r.M} epsout={r.epsout:.2e} "
              f"loops={r.loop}", flush=True)
        if solver == "cheb":
            # TPU-native result contract: eigenvectors stay on device
            # (device_q=True); the separate download number is the
            # tunnel-only device->host transfer a native in-process
            # deployment never pays.
            t0 = time.perf_counter()
            r = feast_scsrev(A, Emin, Emax, M0, fpm, solver=solver,
                             solver_maxiter=250, device_q=True)
            jax.block_until_ready(r.q)
            t_dev = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = np.asarray(r.q)
            t_fetch = time.perf_counter() - t0
            print(f"  warm(device_q) {t_dev:.1f}s  M={r.M} "
                  f"epsout={r.epsout:.2e}  + eigenvector download "
                  f"{t_fetch:.1f}s ({_.nbytes / 1e6:.0f} MB)", flush=True)
            from record_measurement import record
            record(f"sparse_scsrev_2Dlap_n{N}_{len(exp)}pairs_f64_cheb",
                   round(t_dev, 1), "s_warm_device_q",
                   note=(f"NORTH-STAR rung: {N}-dof 2D Laplacian, lowest "
                         f"{len(exp)} eigenpairs, info={int(r.info)}, "
                         f"epsout={r.epsout:.1e}, loops={r.loop}; "
                         f"solver='cheb' with the fused Pallas recurrence "
                         f"kernels; device-resident eigenvectors (the TPU-"
                         f"native contract). host-fetch variant: warm "
                         f"{t_warm:.1f}s cold {t_cold:.1f}s incl. remote "
                         f"compiles; separate eigenvector download through "
                         f"the tunnel {t_fetch:.1f}s "
                         f"({_.nbytes / 1e6:.0f} MB)"),
                   extra={"warm_hostq_s": round(t_warm, 1),
                          "cold_s": round(t_cold, 1),
                          "download_s": round(t_fetch, 1)},
                   script=f"scripts/scale_sparse.py {p} cheb")


if __name__ == "__main__":
    sides = [int(sys.argv[1])] if len(sys.argv) > 1 else [9, 10]
    main(sides)
