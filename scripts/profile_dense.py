"""Phase breakdown of the dense FEAST bench config on the attached chip.

BASELINE config 2 (n=2048, ne=16, M0=32): where do the milliseconds go —
batched LU factor, per-loop filtered solves, Rayleigh-Ritz, transfers?
Feeds docs/performance.md and the vs_baseline>=10 attack plan.

Usage: python scripts/profile_dense.py [n] [ne] [M0]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def main(n, ne, M0):
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    A = (np.diag(2.0 * np.ones(n)) + np.diag(-1.0 * np.ones(n - 1), 1)
         + np.diag(-1.0 * np.ones(n - 1), -1)).astype(np.float32)
    C = rng.standard_normal((n, n)).astype(np.float32) * (0.5 / np.sqrt(n))
    B = (C @ C.T + np.eye(n, dtype=np.float32))

    from feastkit_tpu.core.contour import feast_contour
    from feastkit_tpu.solvers.dense import _shifted_pencils

    c = feast_contour(0.5, 1.5, ne=ne, quadrature=0, aspect_ratio=1.0)
    Zr = jnp.asarray(np.real(c.Zne), jnp.float32)
    Zi = jnp.asarray(np.imag(c.Zne), jnp.float32)
    Ad = jax.device_put(jnp.asarray(A))
    Bd = jax.device_put(jnp.asarray(B))
    Q = jax.device_put(jnp.asarray(
        rng.standard_normal((n, M0)).astype(np.float32)))

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x, out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(ts)*1e3:9.2f} ms", flush=True)
        return out

    @jax.jit
    def build_pencils(A, B, Zr, Zi):
        Z = jax.lax.complex(Zr, Zi)
        return _shifted_pencils(A.astype(jnp.complex64),
                                B.astype(jnp.complex64), Z, False)

    shifted = timeit("build shifted pencils (ne,N,N)", build_pencils,
                     Ad, Bd, Zr, Zi)

    @jax.jit
    def factor(shifted):
        return jax.vmap(jsl.lu_factor)(shifted)

    lu, piv = timeit("batched LU factor x ne", factor, shifted)

    @jax.jit
    def solve(lu, piv, B, Q, Zr):
        rhs = (B @ Q).astype(jnp.complex64)
        X = jax.vmap(lambda l, p: jsl.lu_solve((l, p), rhs))(lu, piv)
        W2 = jax.lax.complex(2.0 * jnp.ones_like(Zr), jnp.zeros_like(Zr))
        return jnp.real(jnp.einsum("e,enm->nm", W2, X))

    Qp = timeit("filtered solve (1 loop, M0 rhs)", solve, lu, piv, Bd, Q, Zr)

    from feastkit_tpu.core.tools import reduced_hermitian_gevp

    @jax.jit
    def rr(Qp, A, B):
        U, s, _ = jnp.linalg.svd(Qp, full_matrices=False)
        S = U.T @ (A @ U)
        G = U.T @ (B @ U)
        lam, V = reduced_hermitian_gevp(S, G)
        return U @ V, lam

    timeit("SVD + Rayleigh-Ritz + eigh", rr, Qp, Ad, Bd)

    @jax.jit
    def resid(Q, A, B, lam):
        lamc = jnp.ones((Q.shape[1],), jnp.float32)
        R = A @ Q - lamc[None, :] * (B @ Q)
        return jnp.linalg.norm(R, axis=0)

    timeit("residual pass", resid, Q, Ad, Bd, None)

    # end-to-end public solve for reference
    from feastkit_tpu.core.parameters import feastinit
    from feastkit_tpu.solvers.dense import feast_sygv
    w = None
    fpm = feastinit()
    fpm[2] = ne
    import scipy.linalg as sla
    w = sla.eigh(A.astype(np.float64), B.astype(np.float64),
                 eigvals_only=True)
    k = n // 2
    Emin = float((w[k - 1] + w[k]) / 2)
    Emax = float((w[k + 23] + w[k + 24]) / 2)
    r = feast_sygv(A, B, Emin, Emax, M0, fpm)
    print("warm solve check: M =", r.M, "loops =", r.loop, flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        feast_sygv(A, B, Emin, Emax, M0, fpm)
        ts.append(time.perf_counter() - t0)
    print(f"{'full public solve (warm)':34s} {min(ts)*1e3:9.2f} ms",
          flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ne = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    M0 = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    main(n, ne, M0)
