"""Generalized-pencil polynomial-filter FEAST (solver="cheb" with sparse
SPD B).

TPU-first extension with no reference counterpart (FeastKit.jl treats
every generalized pencil as a contour problem, feast_sparse.jl:713-757):
the B-resolvent is replaced by a polynomial inverse q(B~) ~= B~^-1 on the
unit-diagonal congruence (ops/chebfilter.cheb_inverse_coeffs — geometric
convergence, m ~ 15..60 for FEM mass matrices), so the filter application
stays solve-free. Rayleigh-Ritz and residuals use the EXACT pencil; the
returned residuals are recomputed for the original (A, B).
"""
import numpy as np
import pytest
import scipy.linalg as sla
import scipy.sparse as sp

from feastkit_tpu import feastinit
from feastkit_tpu.solvers.sparse import feast_scsrgv


def _fem1d(n):
    """P1 stiffness/consistent-mass pair on (0,1) with n interior nodes."""
    h = 1.0 / (n + 1)
    K = sp.diags([2.0 / h * np.ones(n), -1.0 / h * np.ones(n - 1),
                  -1.0 / h * np.ones(n - 1)], [0, 1, -1], format="csr")
    M = sp.diags([4 * h / 6 * np.ones(n), h / 6 * np.ones(n - 1),
                  h / 6 * np.ones(n - 1)], [0, 1, -1], format="csr")
    return K, M


def _fem2d(nx):
    """Bilinear-Q1-style 2D pair: K = 2D Laplacian stencil, M = tensor
    mass (1/6)[1 4 1] x (1/6)[1 4 1]. Interior off-diagonal row sums of
    the scaled M EQUAL the diagonal, so the Gershgorin disc of the
    congruence touches zero — exercises the host Lanczos bound
    refinement (_b_spd_bounds)."""
    h = 1.0 / (nx + 1)
    D = sp.diags([2.0 / h * np.ones(nx), -1.0 / h * np.ones(nx - 1),
                  -1.0 / h * np.ones(nx - 1)], [0, 1, -1])
    Mx = sp.diags([4 * h / 6 * np.ones(nx), h / 6 * np.ones(nx - 1),
                   h / 6 * np.ones(nx - 1)], [0, 1, -1])
    Ix = sp.eye(nx)
    K = (sp.kron(D, Mx) + sp.kron(Mx, D)).tocsr()
    M = sp.kron(Mx, Mx).tocsr()
    return K, M


def test_cheb_generalized_consistent_mass_1d():
    K, M = _fem1d(400)
    w = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    Emax = w[10] * 1.001
    exp = np.sort(w[(w >= 0.0) & (w <= Emax)])
    fpm = feastinit()
    fpm[3] = 10
    r = feast_scsrgv(K, M, 0.0, Emax, len(exp) + 6, fpm, solver="cheb")
    assert r.info == 0 and r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() / exp.max() < 1e-10
    assert r.res.max() < 1e-9
    # residuals are for the ORIGINAL pencil
    x, l0 = r.q[:, 0], r.lam[0]
    rr = float(np.linalg.norm(K @ x - l0 * (M @ x)) / max(abs(l0), 1.0))
    assert abs(rr - r.res[0]) <= 1e-12 + 0.1 * rr


def test_cheb_generalized_2d_mass_gershgorin_zero():
    # tensor mass matrix: Gershgorin disc of the unit-diagonal congruence
    # touches zero -> the eigsh bound refinement must engage (and the
    # solve still converges)
    K, M = _fem2d(24)
    w = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    Emax = w[7] * 1.001
    exp = np.sort(w[(w >= 0.0) & (w <= Emax)])
    fpm = feastinit()
    fpm[3] = 9
    r = feast_scsrgv(K, M, 0.0, Emax, len(exp) + 6, fpm, solver="cheb")
    assert r.info == 0 and r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() / exp.max() < 1e-9
    assert r.res.max() < 1e-8


def test_cheb_generalized_mixed_ladder(monkeypatch, capsys):
    # fpm[42]=2 forces the f32 -> f64 recurrence ladder through the
    # UNFUSED generalized path (the fused Pallas rungs are gated to
    # standard/diagonal operators)
    K, M = _fem1d(300)
    w = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    Emax = w[8] * 1.001
    exp = np.sort(w[(w >= 0.0) & (w <= Emax)])
    fpm = feastinit()
    fpm[1] = 1
    fpm[3] = 10
    fpm[42] = 2
    r = feast_scsrgv(K, M, 0.0, Emax, len(exp) + 5, fpm, solver="cheb")
    out = capsys.readouterr().out
    assert "B-inverse degree=" in out
    assert "f32 recurrence" in out
    assert r.info == 0 and r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() / exp.max() < 1e-10


def test_cheb_generalized_estimate_mode():
    K, M = _fem1d(300)
    w = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    Emax = w[9] * 1.001
    exp = int(np.sum((w >= 0.0) & (w <= Emax)))
    fpm = feastinit()
    fpm[14] = 2
    fpm[32] = 24
    r = feast_scsrgv(K, M, 0.0, Emax, exp + 5, fpm, solver="cheb")
    assert abs(r.M - exp) <= max(3, int(0.35 * exp))


def test_cheb_rejects_indefinite_sparse_b():
    n = 50
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    # symmetric but indefinite B (dominant off-diagonals)
    B = sp.diags([np.ones(n), 2.0 * np.ones(n - 1), 2.0 * np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    with pytest.raises(ValueError, match="positive"):
        feast_scsrgv(A, B, 0.0, 1.0, 8, feastinit(), solver="cheb")


def test_cheb_rejects_nonsymmetric_sparse_b():
    n = 50
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    B = sp.diags([np.ones(n), 0.3 * np.ones(n - 1)], [0, 1], format="csr")
    with pytest.raises(ValueError, match="cheb"):
        feast_scsrgv(A, B, 0.0, 1.0, 8, feastinit(), solver="cheb")


def test_cheb_generalized_fused_kernel_ladder(monkeypatch, capsys):
    """The FUSED generalized rungs (ops/cheb_pallas.cheb_gen_*) carry the
    mixed-precision ladder for sparse-SPD-B pencils: FEAST_CHEB_DS=1
    forces the fused path (interpret mode off-TPU), the spy asserts the
    composite recurrence really ran through the gen kernels, and the
    result matches dense eigh at the f64 rung's accuracy."""
    import scipy.linalg as sla
    import feastkit_tpu.solvers.sparse as sparse_mod

    n = 120
    h = 1.0 / (n + 1)
    K = sp.diags([2.0 / h * np.ones(n), -1.0 / h * np.ones(n - 1),
                  -1.0 / h * np.ones(n - 1)], [0, 1, -1], format="csr")
    M = sp.diags([4 * h / 6 * np.ones(n), h / 6 * np.ones(n - 1),
                  h / 6 * np.ones(n - 1)], [0, 1, -1], format="csr")
    w = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    Emax = w[6] * 1.001
    exp = np.sort(w[(w >= 0.0) & (w <= Emax)])
    fpm = feastinit()
    fpm[1] = 1
    fpm[3] = 10
    fpm[42] = 2
    monkeypatch.setenv("FEAST_CHEB_DS", "1")
    calls = {"gen": 0}
    orig = sparse_mod._sparse_cheb_filter_host_fused_gen

    def spy(ctx, Q, nnz, *, ds, n_coeffs=None):
        calls["gen"] += 1
        return orig(ctx, Q, nnz, ds=ds, n_coeffs=n_coeffs)

    monkeypatch.setattr(sparse_mod, "_sparse_cheb_filter_host_fused_gen",
                        spy)
    r = feast_scsrgv(K, M, 0.0, Emax, len(exp) + 5, fpm, solver="cheb")
    out = capsys.readouterr().out
    assert calls["gen"] >= 2              # fused gen rungs carried the run
    assert "f32 recurrence" in out
    assert "ds recurrence" in out
    assert r.info == 0 and r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() / exp.max() < 1e-10
    assert r.res.max() < 1e-10


def test_cheb_generalized_deterministic_across_rng_state():
    """Determinism-by-shape contract (feast_tools.jl:6-43, tested at
    runtests.jl:1094-1106): identical lam bits regardless of the global
    numpy RNG state. Regression for the host Lanczos bound refinements
    (_b_spd_bounds, _pencil_upper_edge): scipy eigsh defaults to a RANDOM
    start vector, which made the B bounds — and hence the filter degree
    and every downstream bit — run-dependent until pinned with a
    deterministic v0."""
    K, M = _fem2d(24)
    w = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    gaps = np.nonzero(np.diff(w) > 1e-9 * w[-1])[0]
    hi = gaps[np.searchsorted(gaps, 8)]
    Emax = float(0.5 * (w[hi] + w[hi + 1]))
    fpm = feastinit()
    fpm[3] = 9
    np.random.seed(12345)
    r1 = feast_scsrgv(K, M, 0.0, Emax, 16, fpm, solver="cheb")
    np.random.seed(999)
    r2 = feast_scsrgv(K, M, 0.0, Emax, 16, fpm, solver="cheb")
    assert r1.M == r2.M == hi + 1
    assert np.array_equal(np.asarray(r1.lam), np.asarray(r2.lam))
    assert np.array_equal(np.asarray(r1.res), np.asarray(r2.res))


def test_pencil_upper_edge_measured():
    """_pencil_upper_edge returns lambda_max(B^-1 A) of the scaled pencil
    to Lanczos accuracy — the enclosure tightening that cuts the filter
    degree ~1.4x on tensor-mass pencils."""
    from feastkit_tpu.solvers.sparse import (_pencil_upper_edge,
                                             sparse_coo_arrays)
    K, M = _fem2d(24)
    d = 1.0 / np.sqrt(M.diagonal())
    Kd, Ki, _ = sparse_coo_arrays(K, np.float64)
    Md, Mi, _ = sparse_coo_arrays(M, np.float64)
    Kds = Kd * d[Ki[:, 0]] * d[Ki[:, 1]]
    Mds = Md * d[Mi[:, 0]] * d[Mi[:, 1]]
    hi_e = _pencil_upper_edge(Kds, Ki, Mds, Mi, K.shape[0])
    w = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    assert hi_e is not None
    assert abs(hi_e - w[-1]) < 0.02 * w[-1]


def test_pencil_upper_edge_fast_device():
    """_pencil_upper_edge_fast (jitted polynomial-inverse Lanczos, the
    path every DIA-form SPD-B solve now takes) agrees with the dense
    ground truth lambda_max(B^-1 A) — it replaced a host eigsh-with-CG
    phase that cost ~10 single-threaded minutes per solve at 1M dof."""
    from feastkit_tpu.ops.chebfilter import cheb_inverse_coeffs
    from feastkit_tpu.ops.pallas_kernels import bcoo_to_dia
    from feastkit_tpu.solvers.sparse import (_b_spd_bounds,
                                             _pencil_upper_edge_fast,
                                             sparse_coo_arrays)
    K, M = _fem2d(24)
    N = K.shape[0]
    d = 1.0 / np.sqrt(M.diagonal())
    Kd, Ki, _ = sparse_coo_arrays(K, np.float64)
    Md, Mi, _ = sparse_coo_arrays(M, np.float64)
    Kds = Kd * d[Ki[:, 0]] * d[Ki[:, 1]]
    Mds = Md * d[Mi[:, 0]] * d[Mi[:, 1]]
    K_dia, off_K = bcoo_to_dia(Kds, Ki, N)
    M_dia, off_M = bcoo_to_dia(Mds, Mi, N)
    b_lo, b_hi = _b_spd_bounds(Mds, Mi, N, B_dia=M_dia, offsets_B=off_M)
    qc, _ = cheb_inverse_coeffs(b_lo, b_hi, 1e-8)
    hi_e = _pencil_upper_edge_fast(K_dia, off_K, M_dia, off_M, qc,
                                   b_lo, b_hi, N)
    w = sla.eigh(K.toarray(), M.toarray(), eigvals_only=True)
    assert hi_e is not None
    assert abs(hi_e - w[-1]) < 0.02 * w[-1]
    # the B~ bounds the probe ran under must enclose the true B~ spectrum
    wb = np.linalg.eigvalsh((sp.coo_matrix(
        (Mds, (Mi[:, 0], Mi[:, 1])), shape=(N, N)).toarray()))
    assert b_lo <= wb[0] + 1e-9 and b_hi >= wb[-1] - 1e-9
