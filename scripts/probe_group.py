"""Probe: one group-pair dispatch exactly as the host-granular driver
issues it (group size, chunking, statics) with timing, to isolate
watchdog/crash behavior."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp


def main(p, group, M0):
    from feastkit_tpu import feastinit
    from feastkit_tpu.core.contour import feast_contour
    from feastkit_tpu.core.parameters import FeastConfig, feastdefault
    from feastkit_tpu.solvers.sparse import (_sparse_group_pair_jit,
                                             _structured_forms, _plan_mg,
                                             sparse_coo_arrays)
    from feastkit_tpu.utils.cio import fetch

    nx = ny = 2 ** p
    N = nx * ny
    Dx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    A = (sp.kron(Dx, sp.eye(ny)) + sp.kron(sp.eye(nx), Dx)).tocsr()
    wx = 2.0 - 2.0 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
    w = np.sort((wx[:60, None] + wx[None, :60]).ravel())
    Emin, Emax = float(w[0] * 0.5), float(0.5 * (w[50] + w[51]))

    A_data, A_idx, shape = sparse_coo_arrays(A, np.float64)
    out = _structured_forms(A_data, A_idx, A_data, A_idx, N, True, np.float64)
    (A_dia, offsets_A, B_dia, offsets_B, diagA, diagB, use_pallas,
     precond_auto, mg_A, mg_B) = out
    precond, mg_A, mg_B = _plan_mg(mg_A, mg_B, Emax, precond_auto, None)
    print(f"N={N} precond={precond} levels={mg_A[3] if mg_A else None} "
          f"group={group} M0={M0}", flush=True)

    fpm = feastinit()
    fpm[3] = 8
    feastdefault(fpm)
    config = FeastConfig.from_fpm(fpm, dtype=np.complex128)
    c = feast_contour(Emin, Emax, fpm)
    rng = np.random.default_rng(0)
    rhs = jax.device_put(rng.standard_normal((N, M0)))
    statics = dict(shape=shape, config=config, standard=True, hermitian=False,
                   solver="gmres", solver_tol=1e-9, solver_maxiter=int(__import__("os").environ.get("PMAX","60")),
                   solver_restart=30, offsets_A=offsets_A,
                   offsets_B=offsets_B, use_pallas=use_pallas,
                   precond=precond, mg_A=mg_A, mg_B=mg_B)
    arrs = tuple(jax.device_put(a) for a in (
        A_data, A_idx, A_data, A_idx, A_dia, B_dia, diagA, diagB,
        np.real(c.Zne).copy(), np.imag(c.Zne).copy(),
        np.real(c.Wne).copy(), np.imag(c.Wne).copy()))
    Zr_, Zi_ = np.real(c.Zne), np.imag(c.Zne)
    Wr_, Wi_ = np.real(c.Wne), np.imag(c.Wne)
    for base in range(0, len(Zr_), group):
        g = slice(base, base + group)
        t0 = time.perf_counter()
        acc, conv = _sparse_group_pair_jit(
            *arrs, Zr_[g], Zi_[g], 2 * Wr_[g], 2 * Wi_[g], rhs, **statics)
        a = fetch(acc)
        t1 = time.perf_counter()
        print(f"group@{base}: {t1-t0:.1f}s conv={int(np.sum(fetch(conv)))}"
              f"/{np.size(fetch(conv))} |acc|={np.abs(a).max():.3e}",
              flush=True)


if __name__ == "__main__":
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    group = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    M0 = int(sys.argv[3]) if len(sys.argv) > 3 else 72
    main(p, group, M0)
