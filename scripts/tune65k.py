"""On-hardware tuning sweep for the BASELINE config-4 65k sparse rung.

Each variant runs the 2D-Laplacian lowest-52-pair f64 solve cold + warm and
prints one JSON line {variant, cold, warm, M, info, epsout, loops}.  Uses
the repo's persistent compilation cache so repeated sweeps only pay compiles
for NEW program shapes.

Usage: python scripts/tune65k.py [variant ...]
  variant: ne=10 restart=16 mg=1,1,0.8,1 maxiter=250 joined by '+'
  e.g. python scripts/tune65k.py ne=10 ne=12+restart=16
"""
import json
import os
import sys
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:                                        # noqa: BLE001
    pass

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scale_sparse import lap2d, lap2d_eigs  # noqa: E402


def parse_variant(txt):
    opts = {}
    for part in txt.split("+"):
        k, v = part.split("=")
        opts[k] = v
    return opts


def run_variant(opts, nx=256):
    if "mg" in opts:
        a, b, om, cy = opts["mg"].split(",")
        os.environ["FEAST_MG_NU_PRE"] = a
        os.environ["FEAST_MG_NU_POST"] = b
        os.environ["FEAST_MG_OMEGA"] = om
        os.environ["FEAST_MG_CYCLES"] = cy
    else:
        for k in ("FEAST_MG_NU_PRE", "FEAST_MG_NU_POST", "FEAST_MG_OMEGA",
                  "FEAST_MG_CYCLES"):
            os.environ.pop(k, None)
    if "degree" in opts:                 # solver=cheb polynomial degree
        os.environ["FEAST_CHEB_DEGREE"] = opts["degree"]
    else:
        os.environ.pop("FEAST_CHEB_DEGREE", None)
    from feastkit_tpu import feastinit
    from feastkit_tpu.solvers.sparse import feast_scsrev

    N = nx * nx
    A = lap2d(nx, nx)
    w = lap2d_eigs(nx, nx)
    gaps = np.nonzero(np.diff(w) > 1e-12)[0]
    hi = gaps[np.searchsorted(gaps, 50)]
    Emin, Emax = float(w[0] * 0.5), float(0.5 * (w[hi] + w[hi + 1]))
    exp = w[(w >= Emin) & (w <= Emax)]
    M0 = int(opts.get("M0", -(-int(len(exp) * 1.3) // 8) * 8))

    fpm = feastinit()
    fpm[3] = 8
    fpm[1] = 1
    if "ne" in opts:
        fpm[2] = int(opts["ne"])
    if "quad" in opts:
        fpm[16] = int(opts["quad"])
    if "aspect" in opts:
        fpm[18] = int(opts["aspect"])
    kw = dict(solver=opts.get("solver", "gmres"),
              solver_maxiter=int(opts.get("maxiter", 250)))
    if "restart" in opts:
        kw["solver_restart"] = int(opts["restart"])
    if "tol" in opts:
        kw["solver_tol"] = float(opts["tol"])

    t0 = time.perf_counter()
    r = feast_scsrev(A, Emin, Emax, M0, fpm, **kw)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    r2 = feast_scsrev(A, Emin, Emax, M0, fpm, **kw)
    warm = time.perf_counter() - t0
    lam = np.sort(np.asarray(r2.lam))
    err = float(np.abs(lam - exp).max()) if r2.M == len(exp) else float("nan")
    print(json.dumps({
        "variant": opts, "cold": round(cold, 1), "warm": round(warm, 1),
        "M": int(r2.M), "target": len(exp), "info": int(r2.info),
        "epsout": float(r2.epsout), "loops": int(r2.loop),
        "lam_err": err}), flush=True)


def main():
    variants = sys.argv[1:] or ["base"]
    for v in variants:
        opts = {} if v == "base" else parse_variant(v)
        run_variant(opts, nx=int(opts.pop("nx", 256)))


if __name__ == "__main__":
    main()
