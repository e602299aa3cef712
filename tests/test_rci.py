"""Step-function RCI API tests (mirrors the RCI kernel smoke/contract tests,
test/runtests.jl:72-118 and test_matrix_free.jl:71-96)."""
import numpy as np
import scipy.linalg as sla

from feastkit_tpu.core.types import FeastRCIJob
from feastkit_tpu.kernel.rci import FeastGRCI, FeastHRCI, FeastSRCI

from conftest import laplacian_1d, laplacian_eigs


def _drive(state, A, B=None):
    """Service the RCI protocol with dense numpy linear algebra.

    Factorizations happen ONLY at FACTORIZE jobs (reference-style service
    loop, feast_kernel.jl ijob=10/20): a SOLVE for a shift that was never
    announced via FACTORIZE is a protocol violation and fails the test.
    """
    factors = {}
    job = state.step()
    n_steps = 0
    while job != FeastRCIJob.DONE and n_steps < 10000:
        n_steps += 1
        if job == FeastRCIJob.FACTORIZE:
            z = state.Ze
            M = z * (np.eye(A.shape[0]) if B is None else B) - A
            factors[z] = sla.lu_factor(M)
        elif job == FeastRCIJob.FACTORIZE_TRANSPOSE:
            # adjoint solves reuse the plain factorization with trans=2
            assert state.Ze in factors
        elif job == FeastRCIJob.SOLVE:
            state.workc = sla.lu_solve(factors[state.Ze], state.workc)
        elif job == FeastRCIJob.SOLVE_TRANSPOSE:
            state.workc = sla.lu_solve(factors[state.Ze], state.workc,
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
    """ijob protocol: standard problems emit FACTORIZE first (ijob=10,
    feast_kernel.jl:97); generalized problems request MULT_B to form B@Q,
    then FACTORIZE before any SOLVE (smoke test, runtests.jl:72-118)."""
    st = FeastSRCI(20, 6, 0.5, 1.5, standard_B=True)
    job = st.step()
    assert job == FeastRCIJob.FACTORIZE
    assert st.Ze == complex(st.contour.Zne[0])
    assert st.step() == FeastRCIJob.SOLVE

    st = FeastSRCI(20, 6, 0.5, 1.5)
    assert st.step() == FeastRCIJob.MULT_B
    st.workc = np.asarray(st.workc)      # identity B
    assert st.step() == FeastRCIJob.FACTORIZE
    assert st.step() == FeastRCIJob.SOLVE


def test_hrci_factorize_transpose_sequence():
    """Hermitian protocol announces FACTORIZE_TRANSPOSE (ijob=20) before each
    adjoint solve (ijob=21)."""
    st = FeastHRCI(16, 4, -1.0, 1.0, standard_B=True)
    seq = [st.step()]
    st.workc = np.asarray(st.workc)
    seq.append(st.step())
    st.workc = np.asarray(st.workc)      # pretend-solve
    seq.append(st.step())
    st.workc = np.asarray(st.workc)
    seq.append(st.step())
    assert seq[:4] == [FeastRCIJob.FACTORIZE, FeastRCIJob.SOLVE,
                       FeastRCIJob.FACTORIZE_TRANSPOSE,
                       FeastRCIJob.SOLVE_TRANSPOSE]


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


def test_prci_parallel_solve_protocol():
    """FeastPRCI: one PARALLEL_SOLVE (ijob=50) per sweep hands out all
    contour nodes at once (feast_parallel_rci.jl:47-266,386-390)."""
    from feastkit_tpu.kernel.rci import FeastPRCI
    n = 80
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    st = FeastPRCI(n, len(exp) + 5, 0.5, 1.5, standard_B=True)
    job = st.step()
    n_steps = 0
    saw_parallel = False
    while job != FeastRCIJob.DONE and n_steps < 1000:
        n_steps += 1
        if job == FeastRCIJob.PARALLEL_SOLVE:
            saw_parallel = True
            X = np.stack([
                sla.lu_solve(sla.lu_factor(z * np.eye(n) - A), st.workc)
                for z in st.Zall])
            st.Xall = X
        elif job == FeastRCIJob.PARALLEL_ACCUMULATE:
            pass                    # accumulation is internal
        elif job == FeastRCIJob.MULT_A:
            st.workc = A @ np.asarray(st.workc)
        elif job == FeastRCIJob.MULT_B:
            st.workc = np.asarray(st.workc)
        job = st.step()
    assert saw_parallel
    assert st.M == len(exp)
    assert np.abs(np.sort(st.lam[st.inside]) - exp).max() < 1e-10


def test_poly_rci_drive(rng):
    """FeastPolyRCI full drive on a quadratic EVP, checked against the
    companion spectrum (parity: _feast_poly_grci!,
    feast_kernel.jl:964-1261)."""
    from feastkit_tpu.kernel.rci import FeastPolyRCI
    n = 12
    K = np.diag(rng.uniform(0.5, 2.0, n))
    C = 0.1 * np.eye(n)
    M = np.eye(n)
    coeffs = [K, C, M]

    Acomp = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    w = np.linalg.eigvals(Acomp)
    from feastkit_tpu import feast_inside_gcontour
    exp = w[np.asarray(feast_inside_gcontour(w, 0.0 + 1.0j, 0.22))]
    assert 0 < len(exp) < n           # Beyn scheme needs M0 <= N

    def P(z):
        return K + z * C + z * z * M

    st = FeastPolyRCI(n, 2, min(len(exp) + 4, n), 0.0 + 1.0j, 0.22)
    job = st.step()
    n_steps = 0
    factor = None
    while job != FeastRCIJob.DONE and n_steps < 10000:
        n_steps += 1
        if job == FeastRCIJob.FACTORIZE:
            factor = sla.lu_factor(P(st.Ze))
        elif job == FeastRCIJob.SOLVE:
            st.workc = sla.lu_solve(factor, st.workc)
        elif job == FeastRCIJob.MULT_A:
            # P(lam_j) q_j columnwise
            st.workc = np.stack(
                [P(l) @ st.q[:, j] for j, l in enumerate(st.lam)], axis=1)
        job = st.step()
    assert st.M == len(exp)
    got = st.lam[st.inside]
    for lam in exp:       # sort_complex pairing is unstable for near-ties
        assert np.min(np.abs(got - lam)) < 1e-5
