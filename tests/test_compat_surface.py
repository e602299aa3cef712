"""Reference export parity + compat-layer behavior.

The name list below is the complete `export` surface of the reference
(src/FeastKit.jl, all export statements, bangs stripped). Every one of
these must resolve on the package so that code written against FeastKit.jl
ports name-for-name. Behavioral smoke tests drive the compat wrappers
(interfaces/compat.py) through real solves.
"""
import numpy as np
import pytest

import feastkit_tpu as fk

from conftest import laplacian_1d, laplacian_eigs

# src/FeastKit.jl export list (bangs stripped, sorted, deduped)
REFERENCE_EXPORTS = """
FeastGRCIState FeastGeneralResult FeastHRCIState FeastParameters
FeastPolyRCIState FeastResult FeastSRCIState FeastWorkspaceComplex
FeastWorkspaceReal Feast_ERROR_EMIN_EMAX Feast_ERROR_M0 Feast_ERROR_N
Feast_RCI_DONE Feast_RCI_FACTORIZE Feast_RCI_INIT Feast_RCI_SOLVE
Feast_SUCCESS LinearOperator MPIFeastState MatrixFreeOperator
MatrixVecFunction ParallelFeastState allocate_matfree_workspace
banded_to_full cfeast_heev cfeast_hegv check_feast_srci_input cifeast_gepev
cifeast_gepevx create_iterative_solver determine_parallel_backend
dfeast_syev dfeast_sygv difeast_scsrpev difeast_scsrpevx difeast_sypev
difeast_sypevx distribute_contour_points eigen_feast eigvals_feast feast
feast_banded feast_banded_info feast_clear_all_contours feast_contour
feast_contour_custom_weights feast_contour_expert feast_customcontour
feast_gbev feast_gbevx feast_gbgv feast_gbgvx feast_gcontour feast_gcsrev
feast_gcsrevx feast_gcsrpev feast_gcsrpevx feast_geev feast_geevx
feast_gegv feast_gegvx feast_general feast_gepev feast_gepevx feast_grci
feast_grcix feast_hbev feast_hbevx feast_hbgv feast_hbgvx feast_hcsrev
feast_hcsrevx feast_hcsrgv feast_hcsrgvx feast_hcsrpev feast_hcsrpevx
feast_heev feast_heevx feast_hegv feast_hegvx feast_hepev feast_hepevx
feast_hrci feast_hrcix feast_hybrid feast_inside_contour
feast_inside_gcontour feast_matfree_grci feast_matfree_srci feast_matvec
feast_memory_estimate feast_name feast_parallel feast_parallel_capabilities
feast_parallel_comparison feast_parallel_info feast_pep feast_polynomial
feast_rational_expert feast_sbev feast_sbevx feast_sbgv feast_sbgvx
feast_scsrev feast_scsrevx feast_scsrgv feast_scsrgvx feast_scsrpev
feast_scsrpevx feast_serial feast_set_defaults feast_sparse_info feast_srci
feast_srcix feast_summary feast_syev feast_syevx feast_sygv feast_sygvx
feast_validate_interval feast_with_backend feastdefault feastinit
feastinit_driver full_to_banded full_to_general_banded ifeast_grci
ifeast_hrci ifeast_srci mpi_available mpi_feast mpi_feast_gcsrev
mpi_feast_gcsrgv mpi_feast_geev mpi_feast_gegv mpi_feast_general
mpi_feast_hcsrev mpi_feast_hcsrgv mpi_feast_heev mpi_feast_hegv
pcfeast_hcsrev pcfeast_hcsrgv pcfeast_heev pcfeast_hegv pdfeast_syev
pdfeast_sygv pfeast_compute_all_contour_points pfeast_scsrgv
pfeast_show_distribution pfeast_srci pfeast_sygv psfeast_syev psfeast_sygv
pzfeast_hcsrev pzfeast_hcsrgv pzfeast_heev pzfeast_hegv sfeast_syev
sfeast_sygv sifeast_scsrpev sifeast_scsrpevx sifeast_sypev sifeast_sypevx
zfeast_heev zfeast_hegv zifeast_gcsrev zifeast_gcsrevx zifeast_gepev
zifeast_gepevx
""".split()


def test_reference_export_parity():
    missing = [n for n in REFERENCE_EXPORTS if not hasattr(fk, n)]
    assert not missing, f"reference exports unresolved: {missing}"


def _small_problem(n=60, lo=0.5, hi=1.5):
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= lo) & (w <= hi)])
    return A, exp


def test_mpi_feast_matches_serial():
    A, exp = _small_problem()
    r_serial = fk.feast_serial(A, None, (0.5, 1.5), len(exp) + 3)
    r_mpi = fk.mpi_feast(A, None, (0.5, 1.5), len(exp) + 3)
    assert r_serial.M == r_mpi.M == len(exp)
    assert np.abs(np.sort(r_mpi.lam) - exp).max() < 1e-10
    # the reference's 2-positional standard form mpi_feast(A, interval)
    r_two = fk.mpi_feast(A, (0.5, 1.5), M0=len(exp) + 3)
    assert r_two.M == len(exp)


def test_mpi_feast_comm_as_device_count():
    A, exp = _small_problem()
    r = fk.mpi_feast(A, None, (0.5, 1.5), len(exp) + 3, comm=2)
    assert r.M == len(exp)
    with pytest.raises(TypeError):
        fk.mpi_feast(A, None, (0.5, 1.5), 8, comm=object())


def test_feast_hybrid_contour_rhs_mesh():
    A, exp = _small_problem()
    r = fk.feast_hybrid(A, None, (0.5, 1.5), len(exp) + 3)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10


def test_mpi_feast_sparse_wrappers():
    import scipy.sparse as sp
    n = 120
    main = 2.0 * np.ones(n)
    off = -np.ones(n - 1)
    A = sp.diags([main, off, off], [0, 1, -1], format="csr").astype(complex)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r = fk.mpi_feast_hcsrev(A, 0.5, 0.8, len(exp) + 4)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-8


def test_mpi_feast_general_dense():
    lam_true = np.array([0.5 + 0.1j, 0.7 - 0.2j, 3.0 + 1.0j])
    A = np.diag(lam_true)
    r = fk.mpi_feast_geev(A, 0.6 + 0.0j, 0.4, 3)
    assert r.M == 2


def test_mpi_feast_state_partition():
    c = fk.feast_contour(0.0, 1.0, ne=8)
    st = fk.MPIFeastState(100, 10, c.Zne, c.Wne, comm=4)
    assert st.size == 4 and st.ne == len(c.Zne)
    flat = [p for chunk in st.local_points for p in chunk]
    assert flat == list(range(st.ne))       # complete, disjoint cover
    assert st.rank == 0 and not st.converged


def test_distribute_contour_points_cover():
    parts = fk.distribute_contour_points(8, 3)
    flat = [i for p in parts for i in p]
    assert flat == list(range(8))
    assert fk.distribute_contour_points(2, 8) == [range(0, 1), range(1, 2)]


def test_pfeast_srci_protocol_with_device_solver():
    """Drive the parallel RCI protocol, servicing PARALLEL_SOLVE with the
    batched on-device solver helper."""
    n = 40
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    st = fk.pfeast_srci(n, len(exp) + 3, 0.5, 1.5, standard_B=True)
    job = st.step()
    guard = 0
    while job != fk.FeastRCIJob.DONE:
        guard += 1
        assert guard < 200
        if job == fk.FeastRCIJob.PARALLEL_SOLVE:
            fk.pfeast_compute_all_contour_points(st, A)
        elif job in (fk.FeastRCIJob.MULT_A,):
            st.workc = A @ np.real(st.workc)
        elif job in (fk.FeastRCIJob.MULT_B,):
            st.workc = np.real(st.workc).astype(complex)
        job = st.step()
    assert st.info == fk.Feast_SUCCESS
    assert st.M == len(exp)
    assert np.abs(np.sort(st.lam[:st.M]) - exp).max() < 1e-8


def test_rci_compat_constructors():
    st = fk.feast_srci(50, 10, 0.5, 1.5, standard_B=True)
    assert isinstance(st, fk.FeastSRCIState)
    assert st.step() == fk.Feast_RCI_FACTORIZE
    st2 = fk.ifeast_srci(50, 10, 0.5, 1.5)
    assert isinstance(st2, fk.FeastSRCIState)
    stg = fk.feast_grci(50, 10, 1.0 + 0.0j, 0.5)
    assert isinstance(stg, fk.FeastGRCIState)
    # x-variant pins the custom contour
    theta = np.pi * (2 * np.arange(8) + 1) / 8
    Zne = 1.0 + 0.6 * np.exp(1j * theta)
    fpm = fk.feastinit()
    stx = fk.feast_srcix(50, 10, 0.5, 1.5, fpm, Zne,
                         np.full(8, 0.25 + 0j))
    assert len(stx.contour.Zne) == 8


def test_workspaces_and_matfree_allocation():
    ws = fk.FeastWorkspaceReal(30, 6)
    assert ws.work.shape == (30, 6) and ws.workc.dtype == np.complex128
    wc = fk.FeastWorkspaceComplex(30, 6, np.float32)
    assert wc.zAq.dtype == np.complex64 and wc.q.dtype == np.complex64
    d = fk.allocate_matfree_workspace(np.float64, 30, 6)
    assert set(d) >= {"work", "workc", "rhs", "Aq", "Sq", "lam", "q", "res"}
    dc = fk.allocate_matfree_workspace(np.complex128, 30, 6)
    assert "zAq" in dc and dc["q"].dtype == np.complex128


def test_feast_matfree_srci_drives_matvec():
    import jax.numpy as jnp
    n = 80
    def mv(X):
        return (2.0 * X
                - jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], 0)
                - jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], 0))
    op = fk.LinearOperator(mv, (n, n), np.float64, symmetric=True)
    assert isinstance(op, fk.MatrixFreeOperator)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = fk.feast_matfree_srci(op, None, (0.5, 1.5), len(exp) + 3,
                              tol=1e-10, maxiter=25)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-8


def test_unprefixed_x_variant_and_info_helpers(capsys):
    n = 50
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    c = fk.feast_contour(0.5, 1.5, ne=8)
    r = fk.feast_syevx(A, 0.5, 1.5, len(exp) + 3, c.Zne, c.Wne)
    assert r.M == len(exp)
    # dtype-generic: float32 operand stays float32 precision class
    r32 = fk.feast_syevx(A.astype(np.float32), 0.5, 1.5, len(exp) + 3,
                         c.Zne, c.Wne)
    assert r32.M == len(exp)
    assert r32.lam.dtype == np.float32

    import scipy.sparse as sp
    Asp = sp.diags([2.0 * np.ones(8), -np.ones(7), -np.ones(7)],
                   [0, 1, -1], format="csr")
    N, nnz, dens = fk.feast_sparse_info(Asp)
    assert (N, nnz) == (8, 22)
    bands = fk.full_to_general_banded(np.asarray(Asp.todense()), 1, 1)
    Nb, bw, stored = fk.feast_banded_info(bands, 1, 8)
    assert bw == 3
    out = capsys.readouterr().out
    assert "Sparse Matrix Information" in out
    assert "Banded Matrix Information" in out


def test_backend_conveniences(capsys):
    A, exp = _small_problem()
    r = fk.feast_with_backend("threads", A, None, (0.5, 1.5), len(exp) + 3)
    assert r.M == len(exp)
    r2 = fk.feast_parallel(A, None, (0.5, 1.5), len(exp) + 3)
    assert r2.M == len(exp)
    assert fk.mpi_available() is True
    assert fk.check_feast_srci_input(60, 10, 0.5, 1.5) is True
    with pytest.raises(ValueError):
        fk.check_feast_srci_input(60, 0, 0.5, 1.5)
    fk.pfeast_show_distribution(8)
    assert "contour points" in capsys.readouterr().out
    assert fk.feast_rational_expert is not None
    c = fk.feast_contour(-1.0, 1.0, ne=8)
    f = fk.feast_rational_expert(c.Zne, c.Wne, np.array([0.0, 2.5]))
    assert abs(f[0] - 1.0) < 0.1 and abs(f[1]) < 0.2


def test_sparse_info_zero_nnz():
    """Regression: nnz==0 fell through a falsy-or into np.asarray(sparse)."""
    import scipy.sparse as sp
    N, nnz, dens = fk.feast_sparse_info(sp.csr_matrix((5, 5)))
    assert (N, nnz, dens) == (5, 0, 0.0)


def test_pfeast_compute_points_without_x64():
    """Regression: the PARALLEL_SOLVE device helper silently truncated its
    complex128 pencils to complex64 under x64-off jax, stalling the f64-
    tolerance FeastPRCI at the single-precision floor. With x64 off the
    helper must service the solves at full (host) precision."""
    import jax
    from feastkit_tpu.interfaces.compat import (
        pfeast_compute_all_contour_points)
    from feastkit_tpu.kernel.rci import FeastPRCI, FeastRCIJob

    n = 60
    A = np.asarray(laplacian_1d(n))
    w = np.linalg.eigvalsh(A)
    exp = w[(w >= 0.5) & (w <= 1.5)]
    with jax.enable_x64(False):
        st = FeastPRCI(n, len(exp) + 4, 0.5, 1.5, standard_B=True)
        job = st.step()
        guard = 0
        while job != FeastRCIJob.DONE:
            guard += 1
            assert guard < 400
            if job == FeastRCIJob.PARALLEL_SOLVE:
                pfeast_compute_all_contour_points(st, A)
            elif job == FeastRCIJob.MULT_A:
                st.workc = A @ np.real(st.workc)
            elif job == FeastRCIJob.MULT_B:
                st.workc = np.real(st.workc).astype(complex)
            job = st.step()
    assert st.info == 0 and st.M == len(exp)
    lam = np.sort(np.asarray(st.lam[:st.M]))
    assert np.abs(lam - exp).max() < 1e-10
