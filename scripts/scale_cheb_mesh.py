"""Sharded polynomial-filter scaling curve: solver="cheb" over 1/2/4/8
column shards (GSPMD, subspace columns over all mesh devices).

The recurrence is embarrassingly column-parallel: A is replicated, each
device filters its own column block with ZERO per-step communication (XLA
inserts all-gathers only for the M0 x M0 Rayleigh-Ritz contractions). On
this image the mesh is 8 VIRTUAL CPU devices sharing one physical core, so
wall-clock cannot improve with device count — the curve certifies
correctness + GSPMD program health; the speedup belongs to real multi-chip
hardware, where per-device filter work drops as 1/devices and the 1M-dof
north-star recurrence (~25 GB of HBM traffic per application) rides each
chip's full local bandwidth.

Usage: python scripts/scale_cheb_mesh.py [log2_side] [list,of,counts]
       (default: 7 -> 128x128 = 16384 dof; 1,2,4,8)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp


def lap2d(nx):
    D = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(D, sp.eye(nx)) + sp.kron(sp.eye(nx), D)).tocsr()


def main(p, counts):
    from feastkit_tpu import feastinit
    from feastkit_tpu.parallel.pfeast import contour_mesh, pfeast_sparse
    from feastkit_tpu.solvers.sparse import feast_scsrev

    nx = 2 ** p
    N = nx * nx
    A = lap2d(nx)
    wx = 2.0 - 2.0 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
    w = np.sort((wx[:, None] + wx[None, :]).ravel())
    gaps = np.nonzero(np.diff(w) > 1e-12)[0]
    hi = gaps[np.searchsorted(gaps, 50)]
    Emin = float(w[0] * 0.5)
    Emax = float(0.5 * (w[hi] + w[hi + 1]))
    exp = w[(w >= Emin) & (w <= Emax)]
    M0 = 72
    fpm = feastinit()
    fpm[3] = 8

    t0 = time.perf_counter()
    rs = feast_scsrev(A, Emin, Emax, M0, fpm, solver="cheb")
    t_serial = time.perf_counter() - t0
    print(f"serial: {t_serial:.1f}s M={rs.M}/{len(exp)} info={rs.info} "
          f"epsout={rs.epsout:.2e}", flush=True)

    runs = []
    for nd in counts:
        mesh = contour_mesh(nd)
        t0 = time.perf_counter()
        r = pfeast_sparse(A, None, Emin, Emax, M0, fpm, mesh=mesh,
                          solver="cheb")
        t = time.perf_counter() - t0
        agree = (int(r.M) == int(rs.M)
                 and float(np.abs(np.sort(r.lam) - np.sort(rs.lam)).max())
                 < 1e-10)
        print(f"devices={nd}: {t:.1f}s M={r.M} info={r.info} "
              f"epsout={r.epsout:.2e} agrees={agree}", flush=True)
        runs.append(dict(devices=nd, M=int(r.M), info=int(r.info),
                         epsout=float(r.epsout), t=round(t, 1),
                         agrees_with_serial=bool(agree)))

    # contour-polynomial engine (rational filter, exact quadrature
    # semantics) on the same mesh sizes: serial-equal certification
    t0 = time.perf_counter()
    rp = pfeast_sparse(A, None, Emin, Emax, M0, fpm,
                       mesh=contour_mesh(1), solver="contour_poly")
    t_ps = time.perf_counter() - t0
    print(f"contour_poly serial(1-dev): {t_ps:.1f}s M={rp.M} "
          f"epsout={rp.epsout:.2e}", flush=True)
    poly_runs = [dict(devices=1, M=int(rp.M), info=int(rp.info),
                      epsout=float(rp.epsout), t=round(t_ps, 1),
                      agrees_with_serial=True)]
    for nd in [c for c in counts if c > 1]:
        t0 = time.perf_counter()
        r = pfeast_sparse(A, None, Emin, Emax, M0, fpm,
                          mesh=contour_mesh(nd), solver="contour_poly")
        t = time.perf_counter() - t0
        agree = (int(r.M) == int(rp.M)
                 and float(np.abs(np.sort(r.lam) - np.sort(rp.lam)).max())
                 < 1e-10)
        print(f"contour_poly devices={nd}: {t:.1f}s M={r.M} "
              f"epsout={r.epsout:.2e} agrees={agree}", flush=True)
        poly_runs.append(dict(devices=nd, M=int(r.M), info=int(r.info),
                              epsout=float(r.epsout), t=round(t, 1),
                              agrees_with_serial=bool(agree)))

    out = dict(N=N, pairs=len(exp), M0=M0, solver="cheb",
               nproc_physical=1, runs=runs, contour_poly_runs=poly_runs,
               serial=dict(M=int(rs.M), info=int(rs.info),
                           epsout=float(rs.epsout), t=round(t_serial, 1)))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_CHEB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    counts = ([int(c) for c in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [1, 2, 4, 8])
    main(p, counts)
