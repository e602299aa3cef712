"""Sharded-sparse scaling curve: pfeast_sparse over 1/2/4/8 contour shards.

Validates VERDICT round-2 item 1: the sharded driver runs the NORTH-STAR
recipe (multigrid-preconditioned GMRES + mixed-precision pair-IR, fpm[42])
with contour nodes block-partitioned over the mesh, matching the serial
result, and records the device-count scaling curve.

On this image the mesh is 8 VIRTUAL CPU devices sharing ONE physical core
(nproc=1), so wall-clock cannot improve with device count — the curve here
certifies correctness + communication overhead of the sharded program; the
wall-clock speedup story belongs to real multi-chip hardware where each
shard owns a chip.

Usage: python scripts/scale_mesh.py [log2_side] [list,of,device,counts]
       (default: 6 -> 64x64 = 4096 dof; 1,2,4,8)
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
    M0 = int(-(-int(len(exp) * 1.3) // 8) * 8)
    fpm = feastinit()
    fpm[3] = 8
    fpm[42] = 2          # force the mixed pair-IR even on the CPU mesh
    print(f"N={N} target {len(exp)} pairs M0={M0} "
          f"interval=({Emin:.3e},{Emax:.3e})", flush=True)

    out = {"N": N, "pairs": len(exp), "M0": M0, "nproc_physical": 1,
           "runs": []}

    t0 = time.perf_counter()
    r0 = feast_scsrev(A, Emin, Emax, M0, fpm, solver="gmres",
                      solver_maxiter=250)
    t_serial = time.perf_counter() - t0
    lam0 = np.sort(np.asarray(r0.lam))
    print(f"serial: M={r0.M} info={int(r0.info)} eps={r0.epsout:.2e} "
          f"loops={r0.loop} {t_serial:.1f}s", flush=True)
    out["serial"] = {"M": int(r0.M), "info": int(r0.info),
                     "epsout": float(r0.epsout), "t": round(t_serial, 1)}

    for nd in counts:
        mesh = contour_mesh(nd)
        t0 = time.perf_counter()
        r = pfeast_sparse(A, None, Emin, Emax, M0, fpm, mesh=mesh,
                          solver="gmres", solver_maxiter=250)
        dt = time.perf_counter() - t0
        lam = np.sort(np.asarray(r.lam))
        agree = (r.M == r0.M and r0.M == len(exp)
                 and float(np.abs(lam - lam0).max()) < 1e-8)
        print(f"sharded x{nd}: M={r.M} info={int(r.info)} "
              f"eps={r.epsout:.2e} loops={r.loop} {dt:.1f}s "
              f"agree={agree}", flush=True)
        out["runs"].append({"devices": nd, "M": int(r.M),
                            "info": int(r.info),
                            "epsout": float(r.epsout), "t": round(dt, 1),
                            "agrees_with_serial": bool(agree)})

    path = os.path.join(os.path.dirname(__file__), "..",
                        "SCALING_MESH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path), flush=True)


if __name__ == "__main__":
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    counts = ([int(x) for x in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [1, 2, 4, 8])
    main(p, counts)
