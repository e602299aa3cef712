"""Sparse + matrix-free engine tests (mirrors test/runtests.jl:442-580
GMRES-vs-direct agreement and test/test_matrix_free.jl)."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.linalg as sla

import jax.numpy as jnp

from feastkit_tpu.ops.gmres import bicgstab_block, gmres_block
from feastkit_tpu.solvers.matfree import (LinearOperator, MatrixVecFunction,
                                          create_iterative_solver,
                                          feast_matvec, feast_matvec_general)
from feastkit_tpu.solvers.sparse import (feast_gcsrev, feast_hcsrev,
                                         feast_scsrev, feast_scsrgv,
                                         feast_scsrev_complex)


def _lap(n):
    return sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                    [0, 1, -1], format="csr")


def _lap_eigs(n):
    return 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))


def test_gmres_solves_shifted(rng):
    n = 150
    A = _lap(n).toarray()
    z = 1.0 + 0.3j
    M = z * np.eye(n) - A
    B = rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4))
    op = lambda X: jnp.asarray(M) @ X
    X, info = gmres_block(op, jnp.asarray(B), tol=1e-10, restart=40,
                          maxiter=400)
    assert bool(info.converged.all())
    assert np.abs(np.asarray(X) - np.linalg.solve(M, B)).max() < 1e-8
    X2, info2 = bicgstab_block(op, jnp.asarray(B), tol=1e-10, maxiter=600)
    assert bool(info2.converged.all())


@pytest.mark.slow
def test_scsrev_laplacian():
    n = 300
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    r = feast_scsrev(A, 0.5, 0.7, len(exp) + 5)
    assert r.info == 0
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10


@pytest.mark.slow
def test_scsrgv_mass_matrix():
    n = 200
    A = _lap(n)
    B = sp.diags([4 * np.ones(n), np.ones(n - 1), np.ones(n - 1)],
                 [0, 1, -1], format="csr") / 6.0
    w = sla.eigh(A.toarray(), B.toarray(), eigvals_only=True)
    exp = np.sort(w[(w >= 1.0) & (w <= 2.0)])
    r = feast_scsrgv(A, B, 1.0, 2.0, len(exp) + 5)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


@pytest.mark.slow
def test_hcsrev_hermitian(rng):
    n = 120
    d = rng.standard_normal(n) * 2
    off = rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)
    A = sp.diags([d, off, off.conj()], [0, 1, -1], format="csr")
    w = np.linalg.eigvalsh(A.toarray())
    Emin, Emax = w[40] - 1e-9, w[55] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_hcsrev(A, Emin, Emax, len(exp) + 6)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-8


def test_gcsrev_general(rng):
    n = 80
    main = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    up = rng.standard_normal(n - 1)
    A = sp.diags([main, up, 0.5 * np.ones(n - 1)], [0, 1, -1], format="csr")
    w = np.linalg.eigvals(A.toarray())
    from feastkit_tpu import feast_inside_gcontour
    Emid, rr = w[0], 0.8
    exp = w[np.asarray(feast_inside_gcontour(w, Emid, rr))]
    r = feast_gcsrev(A, Emid, rr, min(len(exp) + 5, n))
    assert r.M == len(exp)


@pytest.mark.slow
def test_sparse_matches_dense():
    """Cross-engine agreement: sparse iterative vs dense direct
    (the reference's GMRES-vs-direct tests, runtests.jl:442-580)."""
    from feastkit_tpu import feast_syev
    n = 150
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 1.0) & (w <= 1.3)])
    rd = feast_syev(A.toarray(), 1.0, 1.3, len(exp) + 4)
    rs = feast_scsrev(A, 1.0, 1.3, len(exp) + 4)
    assert rd.M == rs.M == len(exp)
    assert np.abs(np.sort(rd.lam) - np.sort(rs.lam)).max() < 1e-9


def test_matfree_operator_protocol():
    n = 100
    A = _lap(n).toarray()
    Aj = jnp.asarray(A)
    op = MatrixVecFunction(lambda X: Aj @ X, (n, n), jnp.float64,
                           issymmetric=True)
    y = op(jnp.ones(n))
    assert y.shape == (n,)
    Y = op @ jnp.ones((n, 3))
    assert Y.shape == (n, 3)
    assert np.abs(np.asarray(Y) - A @ np.ones((n, 3))).max() < 1e-12


@pytest.mark.slow
def test_feast_matvec_symmetric():
    n = 150
    A = _lap(n).toarray()
    Aj = jnp.asarray(A)
    A_op = LinearOperator(lambda X: Aj @ X, (n, n), jnp.float64,
                          symmetric=True)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r = feast_matvec(A_op, None, (0.5, 0.8), len(exp) + 5)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_feast_matvec_custom_solver():
    """User-supplied shifted solver (the RCI linear_solver contract)."""
    n = 100
    A = _lap(n).toarray()
    Aj = jnp.asarray(A)
    A_op = LinearOperator(lambda X: Aj @ X, (n, n), jnp.float64,
                          symmetric=True)

    def my_solver(z, RHS):
        M = z * jnp.eye(n, dtype=RHS.dtype) - Aj.astype(RHS.dtype)
        return jnp.linalg.solve(M, RHS)

    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r = feast_matvec(A_op, None, (0.5, 0.8), len(exp) + 4,
                     solve_shifted=my_solver)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10


@pytest.mark.slow
def test_matfree_general(rng):
    n = 60
    lam_true = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    D = jnp.asarray(np.diag(lam_true))
    A_op = LinearOperator(lambda X: D @ X, (n, n), jnp.complex128)
    from feastkit_tpu import feast_inside_gcontour
    Emid, rr = 0.0 + 0.0j, 0.8
    exp = lam_true[np.asarray(feast_inside_gcontour(lam_true, Emid, rr))]
    r = feast_matvec_general(A_op, None, Emid, rr, min(len(exp) + 5, n))
    assert r.M == len(exp)


def test_cg_rejected():
    n = 10
    A_op = LinearOperator(lambda X: X, (n, n), jnp.float64, symmetric=True)
    with pytest.raises(ValueError, match="CG is not valid"):
        create_iterative_solver(A_op, method="cg")
    with pytest.raises(ValueError):
        feast_scsrev(_lap(20), 0.5, 1.0, 4, solver="cg")


def test_bicgstab_path():
    n = 200
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    r = feast_scsrev(A, 0.5, 0.7, len(exp) + 4, solver="bicgstab",
                     solver_maxiter=800)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-8


# --- mixed precision (fpm[42]) and multigrid-through-driver ----------------

def _lap2d(nx, ny):
    Dx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    Dy = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(ny, ny))
    return (sp.kron(Dx, sp.eye(ny)) + sp.kron(sp.eye(nx), Dy)).tocsr()


def _lap2d_eigs(nx, ny):
    wx = 2.0 - 2.0 * np.cos(np.arange(1, nx + 1) * np.pi / (nx + 1))
    wy = 2.0 - 2.0 * np.cos(np.arange(1, ny + 1) * np.pi / (ny + 1))
    return np.sort((wx[:, None] + wy[None, :]).ravel())


@pytest.mark.slow
def test_mixed_precision_forced_matches_f64():
    """fpm[42]=2 (force single-precision Krylov + f64 iterative refinement,
    even on CPU) must reach the same eigenvalues and a <=1e-10 residual as
    the pure-f64 path — the mixed path is the TPU default for f64 inputs."""
    from feastkit_tpu import feastinit

    n = 300
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    fpm = feastinit()
    fpm[3] = 10                    # 1e-10: safely above the IR floor
    fpm[42] = 2
    r_mix = feast_scsrev(A, 0.5, 0.7, len(exp) + 5, fpm)
    assert r_mix.info == 0
    assert r_mix.M == len(exp)
    assert r_mix.epsout <= 1e-10
    assert np.abs(np.sort(r_mix.lam) - exp).max() < 1e-9

    fpm0 = feastinit()
    fpm0[3] = 10
    fpm0[42] = 0
    r_f64 = feast_scsrev(A, 0.5, 0.7, len(exp) + 5, fpm0)
    assert r_f64.M == r_mix.M
    assert np.abs(np.sort(r_mix.lam) - np.sort(r_f64.lam)).max() < 1e-9


@pytest.mark.slow
def test_mg_engages_on_2d_laplacian_low_modes():
    """2D Laplacian, lowest modes: the grid stencil must be auto-detected
    (grid guessed from the DIA offsets) and the multigrid V-cycle planned;
    the solve must converge to 1e-12 at the default settings."""
    from feastkit_tpu.solvers.sparse import (_structured_forms, _plan_mg,
                                             sparse_coo_arrays)

    nx = ny = 40
    A = _lap2d(nx, ny)
    w = _lap2d_eigs(nx, ny)
    # cut at genuine spectral gaps (the square grid has degenerate pairs;
    # an interval edge must not bisect one)
    gaps = np.nonzero(np.diff(w) > 1e-6)[0]
    lo, hi = gaps[4], gaps[8]
    Emin, Emax = 0.5 * (w[lo] + w[lo + 1]), 0.5 * (w[hi] + w[hi + 1])
    exp = w[(w >= Emin) & (w <= Emax)]

    # the planning layer must pick MG for this operator/region
    A_data, A_idx, shape = sparse_coo_arrays(A, np.float64)
    out = _structured_forms(A_data, A_idx, A_data, A_idx, nx * ny, True,
                            np.float64)
    precond, mg_A, mg_B = _plan_mg(out[8], out[9], Emax, out[7], None)
    assert precond == "mg"
    assert mg_A is not None and len(mg_A) == 4 and mg_A[3] >= 2

    r = feast_scsrev(A, Emin, Emax, len(exp) + 6)
    assert r.info == 0
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10


@pytest.mark.slow
def test_mg_generalized_2d_mass():
    """Generalized pencil with a tensor-product mass matrix through the
    public sparse driver with explicit grid=: both stencils detected."""
    nx, ny = 24, 20
    A = _lap2d(nx, ny)
    Mx = sp.diags([1 / 6, 2 / 3, 1 / 6], [-1, 0, 1], shape=(nx, nx))
    My = sp.diags([1 / 6, 2 / 3, 1 / 6], [-1, 0, 1], shape=(ny, ny))
    B = sp.kron(Mx, My).tocsr()
    w = np.sort(sla.eigh(A.toarray(), B.toarray(), eigvals_only=True))
    Emin, Emax = 0.5 * (w[3] + w[4]), 0.5 * (w[9] + w[10])
    exp = w[(w >= Emin) & (w <= Emax)]
    r = feast_scsrgv(A, B, Emin, Emax, len(exp) + 5, grid=(nx, ny))
    assert r.info == 0
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_mg_rejected_mid_spectrum():
    """Deep-interior intervals are too indefinite for the coarse-grid
    budget: planning must reject MG (fall back) rather than diverge."""
    from feastkit_tpu.solvers.sparse import (_structured_forms, _plan_mg,
                                             sparse_coo_arrays)
    n = 300
    A = _lap(n)
    A_data, A_idx, _ = sparse_coo_arrays(A, np.float64)
    out = _structured_forms(A_data, A_idx, A_data, A_idx, n, True,
                            np.float64)
    precond, mg_A, _ = _plan_mg(out[8], out[9], 0.7, out[7], None)
    assert precond != "mg"


def test_matfree_polynomial_companion():
    """Matrix-free polynomial EVP: companion linearization by operators
    (no densification) — quadratic pencil with known diagonal solution
    (feast_matfree.jl:511-647 parity)."""
    from feastkit_tpu import feast_polynomial

    n = 40
    rng = np.random.default_rng(2)
    d0 = rng.uniform(0.5, 2.0, n)
    d1 = rng.uniform(-1.0, 1.0, n)
    # P(lam) = A0 + lam A1 + lam^2 I with diagonal A0, A1: roots per entry
    roots = np.concatenate([(-d1[i] + np.array([1, -1])
                             * np.sqrt(d1[i] ** 2 - 4 * d0[i] + 0j)) / 2
                            for i in range(n)])
    A0 = jnp.asarray(np.diag(d0) + 0j)
    A1 = jnp.asarray(np.diag(d1) + 0j)
    ops = [
        LinearOperator(lambda X: A0 @ X, (n, n), jnp.complex128),
        LinearOperator(lambda X: A1 @ X, (n, n), jnp.complex128),
        LinearOperator(lambda X: X, (n, n), jnp.complex128),
    ]
    from feastkit_tpu import feast_inside_gcontour
    # region: a disc around one root sized to capture a FEW roots
    center = roots[7]
    dists = np.sort(np.abs(roots - center))
    rr = float((dists[4] + dists[5]) / 2)      # capture ~5 roots
    Emid = complex(center)
    exp = roots[np.asarray(feast_inside_gcontour(roots, Emid, rr))]
    assert 2 <= len(exp) <= 12, len(exp)
    r = feast_polynomial(ops, Emid, rr, len(exp) + 4)
    assert r.M == len(exp), (r.M, len(exp))
    lam = np.asarray(r.lam)
    from scipy.optimize import linear_sum_assignment
    cost = np.abs(np.asarray(exp)[:, None] - lam[None, :])
    ridx, cidx = linear_sum_assignment(cost)
    assert cost[ridx, cidx].max() < 1e-6
    # eigenvectors: leading N rows satisfy P(lam) x ~ 0
    P = lambda l: np.diag(d0) + l * np.diag(d1) + l * l * np.eye(n)
    for j in range(r.M):
        x = np.asarray(r.q)[:, j]
        assert np.linalg.norm(P(lam[j]) @ x) < 1e-6


# --- narrow-band direct delegation ------------------------------------------
# Narrow-banded sparse pencils route to the banded BCR direct engine
# (sparse.py _narrow_band): direct-solver semantics matching the reference's
# UMFPACK sparse path (feast_sparse.jl:294), where restarted Krylov at
# near-machine inner tolerances stalls on crowded indefinite spectra.

def test_narrow_band_delegates_to_banded(monkeypatch):
    import feastkit_tpu.solvers.banded as banded_mod
    calls = []
    orig = banded_mod._banded_interval_driver

    def spy(*a, **k):
        calls.append(a[:2])
        return orig(*a, **k)

    monkeypatch.setattr(banded_mod, "_banded_interval_driver", spy)
    n = 300
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    r = feast_scsrev(A, 0.5, 0.7, len(exp) + 5)
    assert len(calls) == 1            # tridiagonal + auto knobs -> delegated
    assert r.info == 0 and r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10

    # any explicit iterative knob pins the Krylov path (no delegation)
    calls.clear()
    r2 = feast_scsrev(A, 0.5, 0.7, len(exp) + 5, solver="gmres")
    assert not calls
    assert r2.M == len(exp)


def test_narrow_band_crowded_hermitian_spectrum():
    """The reference demo config that STALLS restarted GMRES (eigenvalue
    spacing ~8e-3 against a 1e-12-outer inner target): the banded direct
    path must converge it (parity: F90sparse_zfeast_hcsrev demo driver)."""
    n = 240
    d = np.linspace(-1.0, 1.0, n)
    A = (sp.diags([np.full(n - 1, 0.08 - 0.05j), d.astype(complex),
                   np.full(n - 1, 0.08 + 0.05j)], [-1, 0, 1])
         .tocsr())
    exp_count = int(np.count_nonzero(
        (np.linalg.eigvalsh(A.toarray()) >= -0.35)
        & (np.linalg.eigvalsh(A.toarray()) <= 0.23)))
    r = feast_hcsrev(A, -0.35, 0.23, 90)
    assert r.info == 0
    assert r.M == exp_count
    assert r.inner_converged


def test_dia_to_banded_roundtrip(rng):
    from feastkit_tpu.ops.banded import (banded_to_full, dia_to_banded,
                                         full_to_banded)
    from feastkit_tpu.ops.pallas_kernels import bands_to_dia
    n, kl, ku = 17, 2, 3
    A = rng.standard_normal((n, n))
    A = np.triu(np.tril(A, ku), -kl)       # keep entries within the band
    bands = full_to_banded(A, kl, ku)
    dia, offs = bands_to_dia(bands, kl, ku)
    back = dia_to_banded(dia, offs, kl, ku)
    assert np.array_equal(back, bands)
    assert np.array_equal(banded_to_full(back, kl, ku), A)


@pytest.mark.slow
def test_mg_vcycle_knobs_from_env(monkeypatch):
    """FEAST_MG_* env overrides reshape the V-cycle (compile-relevant
    FeastConfig fields) without changing the converged eigenpairs."""
    from feastkit_tpu.core.parameters import FeastConfig, feastinit

    nx = ny = 40
    A = _lap2d(nx, ny)
    w = _lap2d_eigs(nx, ny)
    gaps = np.nonzero(np.diff(w) > 1e-6)[0]
    lo, hi = gaps[4], gaps[8]
    Emin, Emax = 0.5 * (w[lo] + w[lo + 1]), 0.5 * (w[hi] + w[hi + 1])
    exp = w[(w >= Emin) & (w <= Emax)]

    r_def = feast_scsrev(A, Emin, Emax, len(exp) + 6)
    monkeypatch.setenv("FEAST_MG_NU_PRE", "1")
    monkeypatch.setenv("FEAST_MG_NU_POST", "1")
    monkeypatch.setenv("FEAST_MG_OMEGA", "0.7")
    monkeypatch.setenv("FEAST_MG_CYCLES", "2")
    cfg = FeastConfig.from_fpm(feastinit())
    assert (cfg.mg_nu_pre, cfg.mg_nu_post, cfg.mg_omega,
            cfg.mg_cycles) == (1, 1, 0.7, 2)
    assert cfg != FeastConfig()          # compile-relevant: distinct key
    r_alt = feast_scsrev(A, Emin, Emax, len(exp) + 6)
    assert r_alt.info == 0 and r_alt.M == r_def.M == len(exp)
    assert np.abs(np.sort(np.asarray(r_alt.lam))
                  - np.sort(np.asarray(r_def.lam))).max() < 1e-10


# --- Ritz warm starts (FeastConfig.warm_start) ------------------------------

def test_ritz_guess_exact_eigenpairs_skip_iterations():
    """For exact eigenpairs the Ritz guess X0 = Q diag(1/(z - lam)) solves
    (zI - A) X = Q exactly, so gmres_block certifies convergence without
    running a single Arnoldi cycle — the mechanism behind the warm start's
    near-free final spurious-verification filter application."""
    n = 120
    A = _lap(n).toarray()
    w, V = np.linalg.eigh(A)
    k = 6
    Q = V[:, :k]
    lam = w[:k]
    z = 0.8 + 0.25j
    X0 = Q / (z - lam)[None, :]
    M = z * np.eye(n) - A
    op = lambda X: jnp.asarray(M) @ X
    X, info = gmres_block(op, jnp.asarray(Q, complex), tol=1e-10,
                          restart=30, maxiter=300, x0=jnp.asarray(X0))
    assert bool(info.converged.all())
    assert int(info.iterations) == 0


def test_warm_start_off_matches_on(monkeypatch):
    """FEAST_WARM_START=0 disables the Ritz warm start (compile-relevant
    FeastConfig field); the converged eigenpairs agree either way."""
    from feastkit_tpu.core.parameters import FeastConfig, feastinit

    n = 180
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    r_on = feast_scsrev(A, 0.5, 0.7, len(exp) + 4)
    monkeypatch.setenv("FEAST_WARM_START", "0")
    cfg = FeastConfig.from_fpm(feastinit())
    assert cfg.warm_start == 0
    assert cfg != FeastConfig()          # compile-relevant: distinct key
    r_off = feast_scsrev(A, 0.5, 0.7, len(exp) + 4)
    assert r_on.info == 0 and r_off.info == 0
    assert r_on.M == r_off.M == len(exp)
    assert np.abs(np.sort(np.asarray(r_on.lam))
                  - np.sort(np.asarray(r_off.lam))).max() < 1e-9


@pytest.mark.slow
def test_warm_start_pair_path_forced_mixed():
    """The pair-carried mixed-precision IR path (fpm[42]=2) accepts Ritz
    warm starts per column (solve_cols_pair X0g) and still reaches the
    f64 residual target."""
    from feastkit_tpu import feastinit

    n = 260
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    fpm = feastinit()
    fpm[3] = 10
    fpm[42] = 2                    # force mixed: real pencil -> pair path
    r = feast_scsrev(A, 0.5, 0.7, len(exp) + 5, fpm)
    assert r.info == 0
    assert r.M == len(exp)
    assert r.epsout <= 1e-10
    assert np.abs(np.sort(np.asarray(r.lam)) - exp).max() < 1e-9


def test_group_pair_jit_warm_start_agrees():
    """_sparse_group_pair_jit (host-granular hot path) with Q_ws/lam_ws
    warm-start operands returns the same weighted filtered contribution as
    the cold call — exercised on CPU so the warm branch cannot rot until a
    chip run."""
    from feastkit_tpu.core.contour import feast_contour
    from feastkit_tpu.core.parameters import FeastConfig, feastinit
    from feastkit_tpu.solvers.sparse import (_sparse_group_pair_jit,
                                             _structured_forms)

    n = 150
    A = _lap(n)
    w, V = np.linalg.eigh(A.toarray())
    Emin, Emax = 0.5, 0.7
    k = int(np.sum((w >= Emin) & (w <= Emax))) + 3
    coo = A.tocoo()
    A_data = coo.data.astype(np.float64)
    A_idx = np.stack([coo.row, coo.col], axis=1).astype(np.int32)
    (A_dia, offsets_A, B_dia, offsets_B, diagA, diagB, _, precond,
     mg_A, mg_B) = _structured_forms(A_data, A_idx, A_data, A_idx, n,
                                     True, np.float64)
    fpm = feastinit()
    fpm[3] = 10                    # certify at 1e-10 (c64-IR floor head room)
    fpm[42] = 2
    config = FeastConfig.from_fpm(fpm, dtype=np.complex128)
    statics = dict(shape=(n, n), config=config, standard=True,
                   hermitian=False, solver="gmres", solver_tol=2e-11,
                   solver_maxiter=400, solver_restart=30,
                   offsets_A=offsets_A, offsets_B=offsets_B,
                   use_pallas=False, precond=precond, mg_A=mg_A, mg_B=mg_B)
    c = feast_contour(Emin, Emax, fpm)
    Zr, Zi = np.real(c.Zne), np.imag(c.Zne)
    Wr, Wi = np.real(c.Wne), np.imag(c.Wne)
    arrs = (A_data, A_idx, A_data, A_idx, A_dia, B_dia, diagA, diagB,
            Zr, Zi, Wr, Wi)
    rhs = np.asarray(V[:, :k], np.float64)        # B = I: rhs == Q
    lam = np.asarray(w[:k], np.float64)
    g = slice(0, 2)
    cold, conv_c = _sparse_group_pair_jit(
        *arrs, Zr[g], Zi[g], 2 * Wr[g], 2 * Wi[g], jnp.asarray(rhs),
        **statics)
    warm, conv_w = _sparse_group_pair_jit(
        *arrs, Zr[g], Zi[g], 2 * Wr[g], 2 * Wi[g], jnp.asarray(rhs),
        jnp.asarray(rhs), jnp.asarray(lam), **statics)
    assert bool(jnp.all(conv_c)) and bool(jnp.all(conv_w))
    assert float(jnp.abs(warm - cold).max()) < 1e-7 * float(
        jnp.abs(cold).max())


def test_adaptive_inner_tol_off_matches_on(monkeypatch):
    """FEAST_ADAPTIVE_TOL=0 pins every inner solve to the static
    solver_tol (compile-relevant FeastConfig field); eigenpairs and
    certification agree with the adaptive default."""
    from feastkit_tpu.core.parameters import FeastConfig, feastinit

    n = 180
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    r_on = feast_scsrev(A, 0.5, 0.7, len(exp) + 4)
    assert r_on.info == 0 and r_on.inner_converged
    monkeypatch.setenv("FEAST_ADAPTIVE_TOL", "0")
    cfg = FeastConfig.from_fpm(feastinit())
    assert cfg.adaptive_inner_tol == 0
    assert cfg != FeastConfig()          # compile-relevant: distinct key
    r_off = feast_scsrev(A, 0.5, 0.7, len(exp) + 4)
    assert r_off.info == 0 and r_off.inner_converged
    assert r_on.M == r_off.M == len(exp)
    assert np.abs(np.sort(np.asarray(r_on.lam))
                  - np.sort(np.asarray(r_off.lam))).max() < 1e-9
    assert r_on.epsout <= 1e-11          # adaptive loops still end tight


def test_kernel_hint_protocol_values():
    """The kernel emits LOOP_TOL_CAP-capped hints for refinement loops and
    VERIFY_FILTER_TOL for the spurious-verify pass — pinned eagerly so an
    inert clamp (a hint silently clipped back to solver_tol) fails loudly."""
    from feastkit_tpu.kernel import hermitian as kh

    seen = {}

    def filt(Q, lam=None, tol_hint=None):
        seen["lam"] = lam
        seen["hint"] = tol_hint
        return Q, jnp.asarray(True)

    filt.takes_ritz = True
    filt.takes_tol = True
    state = kh.init_hermitian_state(jnp.asarray(
        np.linalg.qr(np.random.default_rng(0).standard_normal((8, 3)))[0]))
    body = kh.make_hermitian_body(lambda X: 2.0 * X, lambda X: X, filt,
                                  jnp.float64(0.5), jnp.float64(3.5),
                                  tol=1e-10)
    body(state)                    # loop 0: epsout = inf -> hint == cap
    assert float(seen["hint"]) == kh.LOOP_TOL_CAP
    assert seen["lam"] is not None
    kh.verify_spurious(state, filt)
    assert float(seen["hint"]) == kh.VERIFY_FILTER_TOL


def test_adaptive_tol_reaches_inner_solver(monkeypatch):
    """With adaptive_inner_tol on, the sparse driver passes a TRACED
    per-loop tolerance into gmres_block (a static float when off) — proves
    the feature engages rather than being clamped into a no-op."""
    import feastkit_tpu.solvers.sparse as sps

    seen = []
    orig = sps.gmres_block

    def spy(op, B, **kw):
        seen.append(kw.get("tol"))
        return orig(op, B, **kw)

    monkeypatch.setattr(sps, "gmres_block", spy)
    n = 120
    A = _lap(n)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.7)])
    # pin solver=gmres: narrow tridiagonal pencils otherwise delegate to
    # the banded DIRECT engine and never reach the Krylov path
    r = feast_scsrev(A, 0.5, 0.7, len(exp) + 4, solver="gmres")
    assert r.M == len(exp)
    assert seen and any(hasattr(t, "aval") for t in seen if t is not None)


def test_matfree_warm_start_engages(monkeypatch):
    """feast_matvec's factory path threads Ritz guesses (x0) and adaptive
    tolerances into gmres_block."""
    import feastkit_tpu.solvers.matfree as mf

    got = {"x0": False, "traced_tol": False}
    orig = mf.gmres_block

    def spy(op, B, **kw):
        if kw.get("x0") is not None:
            got["x0"] = True
        if hasattr(kw.get("tol"), "aval"):
            got["traced_tol"] = True
        return orig(op, B, **kw)

    monkeypatch.setattr(mf, "gmres_block", spy)
    n = 100
    A = _lap(n).toarray()
    Aj = jnp.asarray(A)
    A_op = LinearOperator(lambda X: Aj @ X, (n, n), jnp.float64,
                          symmetric=True)
    w = _lap_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r = feast_matvec(A_op, None, (0.5, 0.8), len(exp) + 4)
    assert r.M == len(exp)
    assert got["x0"] and got["traced_tol"]


def test_matfree_polynomial_filters():
    """Matrix-free CheFSI: solver='cheb'/'contour_poly' on a pure callable
    (no matrix anywhere), spectrum bounds auto-estimated by device Lanczos
    or user-supplied. No reference counterpart (feast_matfree.jl is
    contour + user-solver only)."""
    import jax.numpy as jnp
    from feastkit_tpu.solvers.matfree import (feast_matvec,
                                              MatrixVecFunction,
                                              operator_spectrum_bounds)
    from feastkit_tpu import feastinit

    n = 400

    def mv(X):
        Xp = jnp.pad(X, ((1, 1), (0, 0)))
        return 2.0 * X - Xp[:-2] - Xp[2:]

    op = MatrixVecFunction(mv, (n, n), jnp.float64, issymmetric=True)
    w = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    Emin, Emax = float(w[0] * 0.5), float(0.5 * (w[9] + w[10]))
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    fpm = feastinit()

    # auto Lanczos bounds must ENCLOSE the spectrum tightly
    lo, hi = operator_spectrum_bounds(op, n, np.float64)
    assert lo <= w[0] and hi >= w[-1]
    assert lo > w[0] - 0.05 * (w[-1] - w[0])
    assert hi < w[-1] + 0.05 * (w[-1] - w[0])

    for sv, kw in (("cheb", {}), ("cheb", {"bounds": (0.0, 4.0001)}),
                   ("contour_poly", {"bounds": (0.0, 4.0001)})):
        r = feast_matvec(op, None, (Emin, Emax), 16, fpm, solver=sv, **kw)
        assert r.M == len(exp) and int(r.info) == 0, (sv, kw, r.M, r.info)
        assert np.abs(np.sort(np.asarray(r.lam)) - exp).max() < 1e-8

    # estimate mode rides the same filter
    fpm2 = feastinit()
    fpm2[14] = 2
    r2 = feast_matvec(op, None, (Emin, Emax), 16, fpm2, solver="cheb",
                      bounds=(0.0, 4.0001))
    assert abs(int(r2.M) - len(exp)) <= 2

    # generalized operators are rejected with the remediation
    opB = MatrixVecFunction(lambda X: 2.0 * X, (n, n), jnp.float64,
                            issymmetric=True)
    with pytest.raises(ValueError, match="standard problem"):
        feast_matvec(op, opB, (Emin, Emax), 16, fpm, solver="cheb")
