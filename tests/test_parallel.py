"""Sharded-backend tests on the 8-virtual-device CPU mesh (the 'fake
backend' SURVEY.md section 4 notes the reference lacks)."""
import numpy as np
import pytest

import jax

from feastkit_tpu import feast
from feastkit_tpu.parallel.pfeast import (contour_mesh, contour_rhs_mesh,
                                          pad_contour, pfeast_dense)

from conftest import laplacian_1d, laplacian_eigs


def test_pad_contour():
    Z = np.arange(5) + 1j
    W = np.ones(5, complex)
    Zp, Wp = pad_contour(Z, W, 4)
    assert len(Zp) == 8 and len(Wp) == 8
    assert np.all(Wp[5:] == 0)          # zero-weight padding is exact


def test_sharded_matches_serial_bitwise():
    n = 80
    A = laplacian_1d(n)
    r1 = feast(A, None, (0.5, 1.5), 20, backend="serial")
    r2 = feast(A, None, (0.5, 1.5), 20, backend="sharded")
    assert r1.M == r2.M
    assert np.array_equal(np.asarray(r1.lam), np.asarray(r2.lam))


def test_contour_rhs_mesh_2d():
    """2-axis (contour x rhs) mesh: 4 contour shards x 2 rhs shards."""
    n = 80
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    mesh = contour_rhs_mesh(4, 2)
    r = pfeast_dense(A, None, 0.5, 1.5, len(exp) + 3, mesh=mesh,
                     hermitian=False)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10
    # and agrees with serial
    r_serial = feast(A, None, (0.5, 1.5), len(exp) + 3, backend="serial")
    assert np.abs(np.sort(r.lam) - np.sort(r_serial.lam)).max() < 1e-10


def test_contour_rhs_mesh_hermitian(rng):
    n = 50
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    w = np.linalg.eigvalsh(H)
    Emin, Emax = w[20] - 1e-9, w[28] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    mesh = contour_rhs_mesh(2, 4)
    r = pfeast_dense(H, None, Emin, Emax, 13, mesh=mesh, hermitian=True)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_odd_m0_padded_on_rhs_axis():
    n = 60
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    mesh = contour_rhs_mesh(2, 2)
    r = pfeast_dense(A, None, 0.5, 1.5, len(exp) + 3, mesh=mesh,
                     hermitian=False)   # M0 odd -> padded internally
    assert r.M == len(exp)


@pytest.mark.slow
def test_pfeast_sparse_matches_serial():
    import scipy.sparse as sp
    from feastkit_tpu import pfeast_sparse
    from feastkit_tpu.solvers.sparse import feast_scsrev
    n = 150
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r1 = pfeast_sparse(A, None, 0.5, 0.8, len(exp) + 4)
    r2 = feast_scsrev(A, 0.5, 0.8, len(exp) + 4)
    assert r1.M == r2.M == len(exp)
    assert np.abs(np.sort(r1.lam) - np.sort(r2.lam)).max() < 1e-9


def test_parallel_sparse_alias():
    import scipy.sparse as sp
    import feastkit_tpu as fk
    n = 100
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.9)])
    r = fk.pdfeast_scsrev(A, 0.5, 0.9, len(exp) + 4)
    assert r.M == len(exp)


def test_pfeast_general_dense(rng):
    """Sharded dense general driver vs serial (parity:
    _mpi_feast_complex_general!, feast_mpi.jl:941-1046)."""
    from feastkit_tpu import feast_general
    n = 60
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    w = np.linalg.eigvals(A)
    Emid, r_c = complex(w[0]), 1.2
    rs = feast_general(A, None, Emid, r_c, 12, backend="serial")
    rp = feast_general(A, None, Emid, r_c, 12, backend="sharded",
                       strict_backend=True)
    assert rp.M == rs.M
    assert np.abs(np.sort_complex(rp.lam) - np.sort_complex(rs.lam)).max() < 1e-8


def test_pfeast_general_sparse(rng):
    """feast_general on sparse operands honors backend='sharded'."""
    import scipy.sparse as sp
    from feastkit_tpu import feast_general
    n = 120
    d = np.concatenate([rng.uniform(-0.5, 0.5, 10)
                        + 1j * rng.uniform(-0.3, 0.3, 10),
                        4.0 + np.arange(n - 10, dtype=float)])
    A = sp.diags(d, 0, format="csr")
    rs = feast_general(A, None, 0.0 + 0.0j, 1.0, 14, backend="serial")
    rp = feast_general(A, None, 0.0 + 0.0j, 1.0, 14, backend="sharded",
                       strict_backend=True)
    assert rp.M == rs.M == 10
    assert np.abs(np.sort_complex(rp.lam) - np.sort_complex(rs.lam)).max() < 1e-7


def test_pfeast_sparse_general_full_strength_stencil():
    """The sharded sparse-general driver runs the SAME full-strength inner
    machinery as the serial one (multigrid preconditioning from stencil
    statics, not precond='none') — per-rank solves in the reference's MPI
    driver are full UMFPACK (feast_mpi.jl:288-420)."""
    import scipy.sparse as sp
    from feastkit_tpu.parallel.pfeast import pfeast_sparse_general
    from feastkit_tpu.solvers.sparse import (_plan_mg, _structured_forms,
                                             sparse_coo_arrays,
                                             sparse_feast_general)
    g = 12
    T = sp.diags([-np.ones(g - 1), 2 * np.ones(g), -np.ones(g - 1)],
                 [-1, 0, 1])
    A = (sp.kron(sp.eye(g), T) + sp.kron(T, sp.eye(g))).tocsr()
    # the structured-forms planner must pick a non-trivial preconditioner
    # for this 2D-Laplacian stencil (the sharded driver now consumes it)
    cd = np.complex128 if jax.config.jax_enable_x64 else np.complex64
    A_data, A_idx, shape = sparse_coo_arrays(A, cd)
    (_, _, _, _, _, _, _, precond_auto, mg_A, mg_B) = _structured_forms(
        A_data, A_idx, A_data, A_idx, shape[0], True, cd, grid=None)
    precond, _, _ = _plan_mg(mg_A, mg_B, 0.6, precond_auto, None)
    assert precond != "none"

    from feastkit_tpu.core.parameters import feastinit
    fpm = feastinit()
    fpm[8] = 8
    rs = sparse_feast_general(A, None, 0.35, 0.25, 10, fpm)
    rp = pfeast_sparse_general(A, None, 0.35, 0.25, 10, fpm)
    assert rs.info == 0 and rp.info == 0
    assert rp.M == rs.M
    assert np.abs(np.sort_complex(rp.lam)
                  - np.sort_complex(rs.lam)).max() < 1e-8


def test_pfeast_sparse_honors_ifeast_knobs():
    """IFEAST inner-solver knobs (fpm[43..46]) flow to the SHARDED inner
    solves exactly as to the serial ones (feast_parameters.jl:321-339):
    with a starvation-level fpm[46] iteration cap the sharded driver must
    flag the inner solves as unconverged, proving the cap reached them."""
    import scipy.sparse as sp
    import warnings
    from feastkit_tpu import pfeast_sparse
    from feastkit_tpu.core.parameters import feastinit
    n = 96
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    fpm = feastinit()
    fpm[43] = 1          # IFEAST semantics on
    fpm[45] = 12         # inner accuracy 1e-12
    fpm[46] = 2          # starve the inner solver: 2 iterations max
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = pfeast_sparse(A, None, 0.5, 1.5, 24, fpm)
    assert not r.inner_converged
    fpm[46] = 500        # proper budget: the same call converges
    r2 = pfeast_sparse(A, None, 0.5, 1.5, 24, fpm)
    assert r2.inner_converged and r2.info == 0


def test_strict_backend_raises_on_single_device():
    """backend='sharded' with strict_backend=True raises when the mesh has
    one device (select_parallel_backend contract,
    feast_backend_utils.jl:52-68)."""
    from unittest import mock
    from feastkit_tpu import feast
    n = 40
    A = laplacian_1d(n)
    with mock.patch("feastkit_tpu.core.backend._n_devices", return_value=1):
        with pytest.raises(RuntimeError, match="sharded"):
            feast(A, None, (0.5, 1.5), 10, backend="sharded",
                  strict_backend=True)
        # non-strict: warns + falls back serial
        with pytest.warns(UserWarning, match="falling back"):
            r = feast(A, None, (0.5, 1.5), 10, backend="sharded")
        assert r.M > 0


def test_auto_backend_selects_sharded_for_sparse():
    """backend='auto' picks the sharded mesh for sparse operands on a
    multi-device mesh (the reference's supported-problem matrix:
    sparse parallelizes under :auto, feast_backend_utils.jl:103-121)."""
    import scipy.sparse as sp
    from feastkit_tpu import feast
    from feastkit_tpu.parallel import pfeast as pf
    n = 150
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    called = {}
    orig = pf.pfeast_sparse

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    from unittest import mock
    with mock.patch.object(pf, "pfeast_sparse", side_effect=spy):
        r = feast(A, None, (0.5, 0.8), len(exp) + 4)     # backend defaults auto
    assert called.get("yes")
    assert r.M == len(exp)


def test_strict_backend_honored_for_sparse():
    import scipy.sparse as sp
    from unittest import mock
    from feastkit_tpu import feast
    n = 60
    A = sp.eye(n, format="csr") * 2.0
    with mock.patch("feastkit_tpu.core.backend._n_devices", return_value=1):
        with pytest.raises(RuntimeError, match="sharded"):
            feast(A, None, (1.5, 2.5), 10, backend="sharded",
                  strict_backend=True)


@pytest.mark.slow
def test_model_axis_sparse_matches_serial():
    """contour x model mesh: operator rows sharded with halo matvecs,
    psum-reduced Krylov and Gram-based Rayleigh-Ritz — must match the
    serial sparse driver (SURVEY.md section 5 scalability axis 3)."""
    import scipy.sparse as sp
    from feastkit_tpu import pfeast_sparse
    from feastkit_tpu.parallel.pfeast import contour_model_mesh
    from feastkit_tpu.solvers.sparse import feast_scsrev
    n = 160
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    mesh = contour_model_mesh(n_contour=2, n_model=4)
    r1 = pfeast_sparse(A, None, 0.5, 0.8, len(exp) + 4, mesh=mesh)
    r2 = feast_scsrev(A, 0.5, 0.8, len(exp) + 4)
    assert r1.info == 0
    assert r1.M == r2.M == len(exp)
    assert np.abs(np.sort(r1.lam) - np.sort(r2.lam)).max() < 1e-9
    assert r1.epsout <= 1e-10


@pytest.mark.slow
def test_model_axis_generalized_three_axes():
    """Full 2x2x2 contour x rhs x model mesh on a generalized pencil."""
    import scipy.sparse as sp
    from feastkit_tpu import pfeast_sparse
    from feastkit_tpu.parallel.pfeast import contour_model_mesh
    import scipy.linalg as sla
    n = 96
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    B = sp.diags([4.0 * np.ones(n), np.ones(n - 1), np.ones(n - 1)],
                 [0, 1, -1], format="csr") / 6.0
    w = np.sort(sla.eigh(A.toarray(), B.toarray(), eigvals_only=True))
    Emin, Emax = 0.5 * (w[9] + w[10]), 0.5 * (w[19] + w[20])
    exp = w[(w >= Emin) & (w <= Emax)]
    mesh = contour_model_mesh(n_contour=2, n_model=2, n_rhs=2)
    r = pfeast_sparse(A, B, Emin, Emax, len(exp) + 4, mesh=mesh)
    assert r.info == 0
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_model_axis_rejects_unstructured():
    import scipy.sparse as sp
    import pytest as _pytest
    from feastkit_tpu import pfeast_sparse
    from feastkit_tpu.parallel.pfeast import contour_model_mesh
    rng = np.random.default_rng(0)
    n = 64
    dense = rng.standard_normal((n, n))
    A = sp.csr_matrix(np.triu(dense) + np.triu(dense).T)
    mesh = contour_model_mesh(n_contour=2, n_model=4)
    with _pytest.raises(ValueError, match="DIA"):
        pfeast_sparse(A, None, 0.0, 1.0, 8, mesh=mesh)
