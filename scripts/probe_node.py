"""Probe: single contour-node pair solve on the chip — timing + convergence.

Isolates _sparse_node_pair_jit at a given grid size so watchdog crashes can
be attributed (compile vs execution length vs solver stall).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp


def main(p):
    from feastkit_tpu import feastinit
    from feastkit_tpu.core.contour import feast_contour
    from feastkit_tpu.core.parameters import FeastConfig
    from feastkit_tpu.solvers.sparse import (_sparse_node_pair_jit,
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
    print(f"N={N} precond={precond} mg_levels={mg_A[3] if mg_A else None} "
          f"use_pallas={use_pallas}", flush=True)

    fpm = feastinit()
    fpm[3] = 8
    from feastkit_tpu.core.parameters import feastdefault
    feastdefault(fpm)
    config = FeastConfig.from_fpm(fpm, dtype=np.complex128)
    c = feast_contour(Emin, Emax, fpm)
    M0 = 16
    rng = np.random.default_rng(0)
    rhs = rng.standard_normal((N, M0))
    statics = dict(shape=shape, config=config, standard=True, hermitian=False,
                   solver="gmres", solver_tol=1e-9, solver_maxiter=120,
                   solver_restart=30, offsets_A=offsets_A,
                   offsets_B=offsets_B, use_pallas=use_pallas,
                   precond=precond, mg_A=mg_A, mg_B=mg_B)
    arrs = (A_data, A_idx, A_data, A_idx, A_dia, B_dia, diagA, diagB,
            np.real(c.Zne).astype(np.float64).copy(),
            np.imag(c.Zne).astype(np.float64).copy(),
            np.real(c.Wne).astype(np.float64).copy(),
            np.imag(c.Wne).astype(np.float64).copy())
    for e in [0, 3]:
        t0 = time.perf_counter()
        acc, conv = _sparse_node_pair_jit(
            *arrs, arrs[-4][e], arrs[-3][e], 2 * arrs[-2][e], 2 * arrs[-1][e],
            rhs, **statics)
        acc_np = fetch(acc)
        t1 = time.perf_counter()
        print(f"node {e}: z={c.Zne[e]:.4e} cold {t1-t0:.1f}s "
              f"conv={bool(fetch(conv))} |acc|={np.abs(acc_np).max():.3e}",
              flush=True)
        t0 = time.perf_counter()
        acc, conv = _sparse_node_pair_jit(
            *arrs, arrs[-4][e], arrs[-3][e], 2 * arrs[-2][e], 2 * arrs[-1][e],
            rhs, **statics)
        fetch(acc)
        print(f"  warm {time.perf_counter()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
