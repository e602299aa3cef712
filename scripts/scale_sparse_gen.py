"""North-star GENERALIZED rung: feast_scsrgv on a 1M-dof lumped-mass pencil.

BASELINE config 4 reads "Sparse CSR generalized feast_scsrgv on 2D/3D
Laplacian"; this script runs the generalized form A x = lam B x with a
smooth positive lumped-mass diagonal B (the FEM mass-lumping shape) through
the polynomial-filter path: the pencil is solved exactly via the
congruence D^-1/2 A D^-1/2, eigenvectors back-transformed and residuals
recomputed for the ORIGINAL pencil.

Ground truth: pass a JSON file of the pencil's lowest eigenvalues
(scipy shift-invert eigsh with M=B — ~7 min on the host CPU at 1M dof):

    python - <<'PY' > /tmp/gen_truth.json
    import numpy as np, scipy.sparse as sp, scipy.sparse.linalg as spla, json
    nx = 1024; n = nx*nx
    Dx = sp.diags([-1.0,2.0,-1.0],[-1,0,1],shape=(nx,nx))
    A = (sp.kron(Dx, sp.eye(nx)) + sp.kron(sp.eye(nx), Dx)).tocsr()
    i = np.arange(n)
    d = 1.0 + 0.25*np.sin(2*np.pi*i/n)*np.cos(6*np.pi*i/n)
    w, _ = spla.eigsh(A, k=64, M=sp.diags(d,0,format="csr"), sigma=0.0)
    print(json.dumps({"w": np.sort(w).tolist()}))
    PY
    python scripts/scale_sparse_gen.py 10 /tmp/gen_truth.json

Without a truth file the run still certifies via exact residuals; the
eigenvalue comparison is skipped.

CONSISTENT-MASS rung (sparse SPD B through the FUSED composite
q(B~)A~ Pallas recurrence, ops/cheb_pallas.cheb_gen_*):

    python scripts/scale_sparse_gen.py 8 consistent

Truth is exact via the tensor structure: K = Dx(x)Mx + Mx(x)Dx,
B = Mx(x)Mx share 1D generalized eigenvectors, so the pencil's
eigenvalues are the pairwise sums mu_i + mu_j of the 1D pencil
Dx v = mu Mx v (one dense nx-by-nx eigh on the host).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp


def main(p, truth_path=None):
    from feastkit_tpu import feastinit
    from feastkit_tpu.solvers.sparse import feast_scsrgv

    nx = 2 ** p
    N = nx * nx
    Dx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    consistent = truth_path == "consistent"
    if consistent:
        import scipy.linalg as sla
        Mx = sp.diags([4 / 6, 1 / 6, 1 / 6], [0, 1, -1], shape=(nx, nx))
        A = (sp.kron(Dx, Mx) + sp.kron(Mx, Dx)).tocsr()
        B = sp.kron(Mx, Mx).tocsr()
        mu = sla.eigh(Dx.toarray(), Mx.toarray(), eigvals_only=True)
        w = np.sort((mu[:64, None] + mu[None, :64]).ravel())
        desc = "consistent-mass (sparse SPD B = Mx x Mx)"
    else:
        A = (sp.kron(Dx, sp.eye(nx)) + sp.kron(sp.eye(nx), Dx)).tocsr()
        i = np.arange(N)
        d = 1.0 + 0.25 * np.sin(2 * np.pi * i / N) * np.cos(6 * np.pi * i / N)
        B = sp.diags(d, 0, format="csr")
        desc = "lumped-mass diag B in [0.75,1.25]"
        w = None
        if truth_path:
            w = np.asarray(json.load(open(truth_path))["w"])

    if w is not None:
        gaps = np.nonzero(np.diff(w) > 1e-12)[0]
        hi = gaps[np.searchsorted(gaps, 50)]
        Emax = float(0.5 * (w[hi] + w[hi + 1]))
        exp = w[w <= Emax]
    else:
        # Gershgorin-free heuristic: the pencil's lowest ~52 eigenvalues of
        # the unit-mass Laplacian scaled by the mass range
        wx = 2.0 - 2.0 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
        wl = np.sort((wx[:, None] + wx[None, :]).ravel())
        Emax = float(1.05 * wl[52])
        exp = None

    fpm = feastinit()
    fpm[1] = 1
    fpm[3] = 8
    print(f"N={N} generalized ({desc}) "
          f"target {len(exp) if exp is not None else '?'} pairs "
          f"interval=(0,{Emax:.3e})", flush=True)
    times = {}
    for tag in ("cold", "warm", "warm(device_q)"):
        dev = tag == "warm(device_q)"
        t0 = time.perf_counter()
        r = feast_scsrgv(A, B, 0.0, Emax, 72, fpm, solver="cheb",
                         device_q=dev)
        if dev:
            jax.block_until_ready(r.q)
        t = time.perf_counter() - t0
        line = (f"  {tag} {t:.1f}s  M={r.M} info={int(r.info)} "
                f"epsout={r.epsout:.2e} loops={r.loop}")
        if exp is not None and r.M == len(exp):
            line += f" lam_err={np.abs(np.sort(np.asarray(r.lam)) - exp).max():.2e}"
        if dev:
            # tunnel-only device->host transfer, absent in-process
            t0 = time.perf_counter()
            q = np.asarray(r.q)
            t_fetch = time.perf_counter() - t0
            line += (f" + eigenvector download {t_fetch:.1f}s "
                     f"({q.nbytes / 1e6:.0f} MB)")
            from record_measurement import record
            tag_m = ("consistentmass" if consistent else "lumpedmass")
            record(f"sparse_scsrgv_{tag_m}_n{N}_f64_cheb",
                   round(t, 1), "s_warm_device_q",
                   note=(f"generalized north-star rung ({desc}): {N}-dof "
                         f"pencil, {r.M} pairs, info={int(r.info)}, "
                         f"epsout={r.epsout:.1e}, loops={r.loop}; "
                         f"device-resident eigenvectors; host-fetch warm "
                         f"{times.get('warm', float('nan')):.1f}s, cold "
                         f"{times.get('cold', float('nan')):.1f}s incl. "
                         f"remote compiles; eigenvector download through "
                         f"the tunnel {t_fetch:.1f}s "
                         f"({q.nbytes / 1e6:.0f} MB)"),
                   extra={"warm_hostq_s": round(times.get("warm", -1), 1),
                          "cold_s": round(times.get("cold", -1), 1),
                          "download_s": round(t_fetch, 1)},
                   script=f"scripts/scale_sparse_gen.py {p}"
                          + (" consistent" if consistent else ""))
        times[tag if not dev else "device_q"] = t
        print(line, flush=True)


if __name__ == "__main__":
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    truth = sys.argv[2] if len(sys.argv) > 2 else None
    main(p, truth)
