"""Quickstart: all eigenpairs of a tridiagonal Laplacian in (0.5, 1.5).

Port of the reference README quickstart (FeastKit.jl README.md): n=100
SymTridiagonal(2, -1), interval (0.5, 1.5).
"""
import numpy as np

import feastkit_tpu as fk

n = 100
A = (np.diag(2.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1)
     + np.diag(-np.ones(n - 1), -1))

result = fk.feast(A, None, (0.5, 1.5), M0=25)
fk.feast_summary(result)
fk.feast_trace_eigenvalues(result)
