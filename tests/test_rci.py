"""Step-function RCI API tests (mirrors the RCI kernel smoke/contract tests,
test/runtests.jl:72-118 and test_matrix_free.jl:71-96)."""
import numpy as np
import scipy.linalg as sla

from feastkit_tpu.core.types import FeastRCIJob
from feastkit_tpu.kernel.rci import FeastGRCI, FeastHRCI, FeastSRCI

from conftest import laplacian_1d, laplacian_eigs


def _drive(state, A, B=None):
    """Service the RCI protocol with dense numpy linear algebra."""
    factors = {}
    job = state.step()
    n_steps = 0
    while job != FeastRCIJob.DONE and n_steps < 10000:
        n_steps += 1
        if job in (FeastRCIJob.FACTORIZE, FeastRCIJob.FACTORIZE_TRANSPOSE):
            pass
        elif job == FeastRCIJob.SOLVE:
            z = state.Ze
            if z not in factors:
                M = z * (np.eye(A.shape[0]) if B is None else B) - A
                factors[z] = sla.lu_factor(M)
            state.workc = sla.lu_solve(factors[z], state.workc)
        elif job == FeastRCIJob.SOLVE_TRANSPOSE:
            z = state.Ze
            if z not in factors:
                M = z * (np.eye(A.shape[0]) if B is None else B) - A
                factors[z] = sla.lu_factor(M)
            state.workc = sla.lu_solve(factors[z], state.workc,
                                       trans=2)
        elif job == FeastRCIJob.MULT_A:
            state.workc = (A @ state.q) if state.phase.startswith("mult_a_res") \
                else (A @ np.asarray(state.workc))
        elif job == FeastRCIJob.MULT_B:
            Bm = np.eye(A.shape[0]) if B is None else B
            state.workc = Bm @ np.asarray(state.workc)
        job = state.step()
    assert job == FeastRCIJob.DONE
    return state


def test_srci_first_transition():
    """ijob protocol starts with a MULT_B / SOLVE request (smoke test,
    runtests.jl:72-118)."""
    st = FeastSRCI(20, 6, 0.5, 1.5)
    job = st.step()
    assert job in (FeastRCIJob.MULT_B, FeastRCIJob.SOLVE)


def test_srci_full_drive():
    n = 80
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    st = FeastSRCI(n, len(exp) + 5, 0.5, 1.5, standard_B=True)
    _drive(st, A)
    assert st.M == len(exp)
    lam = st.lam[st.inside]
    assert np.abs(np.sort(lam) - exp).max() < 1e-10
    assert int(st.info) == 0
    # fpm counter mirror
    assert st.fpm[51] == st.loop


def test_srci_generalized_drive(rng):
    n = 50
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    B = rng.standard_normal((n, n))
    B = B @ B.T + n * np.eye(n)
    w = sla.eigh(A, B, eigvals_only=True)
    Emin, Emax = w[15] - 1e-9, w[25] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    st = FeastSRCI(n, len(exp) + 5, Emin, Emax)
    _drive(st, A, B)
    assert st.M == len(exp)
    assert np.abs(np.sort(st.lam[st.inside]) - exp).max() < 1e-9


def test_hrci_drive(rng):
    n = 50
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    w = np.linalg.eigvalsh(H)
    Emin, Emax = w[20] - 1e-9, w[30] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    st = FeastHRCI(n, len(exp) + 5, Emin, Emax, standard_B=True)
    _drive(st, H)
    assert st.M == len(exp)
    assert np.abs(np.sort(st.lam[st.inside].real) - exp).max() < 1e-9


def test_grci_drive(rng):
    n = 40
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    w = np.linalg.eigvals(A)
    Emid, rr = w[0], 1.0
    from feastkit_tpu import feast_inside_gcontour
    exp = w[np.asarray(feast_inside_gcontour(w, Emid, rr))]
    st = FeastGRCI(n, min(len(exp) + 5, n), Emid, rr, standard_B=True)
    _drive(st, A)
    assert st.M == len(exp)


def test_warm_start_subspace():
    """fpm[5]=1 user initial subspace (feast_kernel.jl:67-79): starting from
    converged eigenvectors converges in one loop."""
    n = 80
    A = laplacian_1d(n)
    w, V = np.linalg.eigh(A)
    mask = (w >= 0.5) & (w <= 1.5)
    exp = np.sort(w[mask])
    M0 = len(exp) + 4
    Q0 = np.concatenate([V[:, mask], V[:, :4]], axis=1)
    from feastkit_tpu import feastinit
    fpm = feastinit()
    fpm[5] = 1
    st = FeastSRCI(n, M0, 0.5, 1.5, fpm, Q0=Q0, standard_B=True)
    _drive(st, A)
    assert st.M == len(exp)
    assert st.loop <= 2
