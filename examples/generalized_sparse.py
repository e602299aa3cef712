"""Sparse generalized problem K x = lam M x (FEM-style stiffness/mass pair)
solved matrix-free with batched GMRES shifted solves + Jacobi preconditioning.
"""
import numpy as np
import scipy.sparse as sp

import feastkit_tpu as fk

n = 200
# 1-D Laplace pencil, unscaled (conditioning ~ n^2; the shifted solves are
# Jacobi-preconditioned automatically since the pencil is diag-dominant).
K = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
             [0, 1, -1], format="csr")
M = sp.diags([4 * np.ones(n), np.ones(n - 1), np.ones(n - 1)],
             [0, 1, -1], format="csr") / 6.0

fpm = fk.feast_set_defaults(tol_exp=8)
result = fk.feast(K, M, (0.5, 1.0), M0=24, fpm=fpm, solver_maxiter=300)
fk.feast_summary(result)
print("first eigenvalues:", result.lam[:5])
