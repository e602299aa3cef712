"""On-hardware sweep of the multigrid V-cycle shape (FeastConfig mg_* knobs).

Runs the BASELINE config-4 sparse rung at a chosen size for each
(nu_pre, nu_post, omega, cycles) variant and reports wall time +
convergence, so the preconditioner shape can be tuned on the actual
target (TPU) rather than guessed. Results print one JSON line per
variant.

Usage: python scripts/sweep_mg.py [log2_side] [variant ...]
  variant: nu_pre,nu_post,omega,cycles   (default sweep below)
"""
import json
import os
import sys
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scale_sparse import lap2d, lap2d_eigs  # noqa: E402

DEFAULT_SWEEP = [
    (2, 2, 0.8, 1),   # current default
    (1, 1, 0.8, 1),   # cheaper cycle
    (3, 3, 0.8, 1),   # heavier smoothing
    (2, 2, 0.7, 1),
    (2, 2, 0.9, 1),
    (2, 2, 0.8, 2),   # two V-cycles per application
    (1, 1, 0.8, 2),
]


def run_variant(A, Emin, Emax, M0, n_exp, nu_pre, nu_post, omega, cycles):
    os.environ["FEAST_MG_NU_PRE"] = str(nu_pre)
    os.environ["FEAST_MG_NU_POST"] = str(nu_post)
    os.environ["FEAST_MG_OMEGA"] = str(omega)
    os.environ["FEAST_MG_CYCLES"] = str(cycles)
    from feastkit_tpu import feastinit
    from feastkit_tpu.solvers.sparse import feast_scsrev
    fpm = feastinit()
    fpm[3] = 8
    t0 = time.perf_counter()
    r = feast_scsrev(A, Emin, Emax, M0, fpm, solver="gmres",
                     solver_maxiter=250)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "variant": [nu_pre, nu_post, omega, cycles],
        "wall_s": round(dt, 1), "M": int(r.M), "target": n_exp,
        "info": int(r.info), "epsout": float(r.epsout),
        "loops": int(r.loop),
    }), flush=True)
    return dt


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nx = 2 ** p
    N = nx * nx
    A = lap2d(nx, nx)
    w = lap2d_eigs(nx, nx)
    gaps = np.nonzero(np.diff(w) > 1e-12)[0]
    hi = gaps[np.searchsorted(gaps, 50)]
    Emin, Emax = float(w[0] * 0.5), float(0.5 * (w[hi] + w[hi + 1]))
    exp = w[(w >= Emin) & (w <= Emax)]
    M0 = int(-(-int(len(exp) * 1.3) // 8) * 8)
    print(f"sweep_mg: N={N} target={len(exp)} M0={M0} "
          f"devices={jax.devices()}", flush=True)
    sweep = DEFAULT_SWEEP
    if len(sys.argv) > 2:
        sweep = []
        for s in sys.argv[2:]:
            a, b, om, c = s.split(",")
            sweep.append((int(a), int(b), float(om), int(c)))
    for v in sweep:
        run_variant(A, Emin, Emax, M0, len(exp), *v)


if __name__ == "__main__":
    main()
