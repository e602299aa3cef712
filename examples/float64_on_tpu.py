"""Float64 on TPU: pair-carried solves and real embeddings.

XLA:TPU has no complex128 (and no f64 LU), yet every Hermitian FEAST
family runs at full double precision on the chip:

* real symmetric dense/banded/sparse: complex64 factorizations + f64
  (re, im) pair-carried iterative refinement (~1e-14 backward error);
* complex Hermitian operands: the real embedding [[Ar, -Ai], [Ai, Ar]]
  (interleaved for banded/sparse so bandedness survives) runs on the
  real engines and the doubled eigenpairs are collapsed on return;
* matrix-free REAL operators: c64 GMRES inner solves + pair refinement
  (the real-callback split at double precision, accuracy ~1e-7);
* general / complex-symmetric / polynomial problems have no c128-free
  realization: they demote to complex64 work precision with a
  RuntimeWarning (set FEAST_STRICT_F64=1 to make that an error).

Nothing below is TPU-conditional in USER code — the same calls run the
plain f64 paths on CPU. Run on any backend:

    python examples/float64_on_tpu.py
"""
import numpy as np
import scipy.sparse as sp

import jax
jax.config.update("jax_enable_x64", True)

import feastkit_tpu as fk


def main():
    # --- dense real symmetric, f64 --------------------------------------
    n = 200
    A = (np.diag(2.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1)
         + np.diag(-np.ones(n - 1), -1))
    r = fk.feast(A, None, (0.5, 0.7), M0=30)
    print(f"dense f64:  M={r.M} info={int(r.info)} epsout={r.epsout:.2e}")

    # --- dense complex Hermitian, f64 (real embedding on TPU) -----------
    rng = np.random.default_rng(0)
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2 + 4.0 * np.eye(n)
    ev = np.linalg.eigvalsh(H)
    rh = fk.feast(H, None, (float(ev[90]) - 1e-9, float(ev[100]) + 1e-9),
                  M0=24)
    print(f"herm f64:   M={rh.M} info={int(rh.info)} "
          f"epsout={rh.epsout:.2e}  (vectors are complex: "
          f"{rh.q.dtype})")

    # --- sparse complex Hermitian, f64 (zfeast_hcsrev) ------------------
    m = 400
    d0 = 4.0 + rng.random(m)
    d1 = rng.standard_normal(m - 1) + 1j * rng.standard_normal(m - 1)
    Hs = sp.diags([d0, d1, d1.conj()], [0, 1, -1], format="csr")
    evs = np.linalg.eigvalsh(Hs.toarray())
    rs = fk.zfeast_hcsrev(Hs, float(evs[150]) - 1e-9,
                          float(evs[165]) + 1e-9, 32)
    print(f"zhcsrev:    M={rs.M} info={int(rs.info)} "
          f"epsout={rs.epsout:.2e}")


if __name__ == "__main__":
    main()
