"""Reverse-communication (RCI) drive with a caller-owned solver — the
contract for plugging in external factorizations."""
import numpy as np
import scipy.linalg as sla

from feastkit_tpu import FeastRCIJob
from feastkit_tpu.kernel.rci import FeastSRCI

n = 120
A = (np.diag(2.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1)
     + np.diag(-np.ones(n - 1), -1))

state = FeastSRCI(n, 20, 0.5, 1.5, standard_B=True)
factors = {}
job = state.step()
while job != FeastRCIJob.DONE:
    if job == FeastRCIJob.SOLVE:
        z = state.Ze
        if z not in factors:                 # factorization cache (fpm[10])
            factors[z] = sla.lu_factor(z * np.eye(n) - A)
        state.workc = sla.lu_solve(factors[z], state.workc)
    elif job == FeastRCIJob.MULT_A:
        state.workc = A @ np.asarray(state.workc)
    elif job == FeastRCIJob.MULT_B:
        state.workc = np.asarray(state.workc)    # B = I
    job = state.step()

print(f"M={state.M} eigenvalues, epsout={state.epsout:.2e}, "
      f"loops={state.loop}")
print(state.lam[state.inside])
