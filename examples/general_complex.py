"""General non-Hermitian spectrum inside a circular contour, plus a
quadratic polynomial eigenproblem (lam^2 M + lam C + K) x = 0."""
import numpy as np

import feastkit_tpu as fk

rng = np.random.default_rng(0)
n = 60
A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
w = np.linalg.eigvals(A)
Emid, r = w[0], 1.0

res = fk.feast_general(A, None, Emid, r, M0=12)
fk.feast_summary(res)

# polynomial EVP
K = np.diag(rng.uniform(0.5, 2.0, 16))
C = 0.1 * np.eye(16)
M = np.eye(16)
poly = fk.feast_polynomial([K, C, M], 0.0 + 1.0j, 0.8, M0=20)
print("polynomial eigenvalues inside:", poly.lam)
