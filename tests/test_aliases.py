"""Precision-alias layer tests (mirrors runtests.jl:873-1029: isdefined +
numerical-equality vs generics)."""
import numpy as np
import pytest

import feastkit_tpu as fk

from conftest import laplacian_1d, laplacian_eigs

_EXPECTED_NAMES = [
    # serial dense
    "sfeast_sygv", "dfeast_sygv", "sfeast_syev", "dfeast_syev",
    "cfeast_hegv", "zfeast_hegv", "cfeast_heev", "zfeast_heev",
    "cfeast_gegv", "zfeast_gegv", "cfeast_geev", "zfeast_geev",
    "cfeast_sygv", "zfeast_sygv",      # complex symmetric
    # banded
    "sfeast_sbev", "dfeast_sbgv", "cfeast_hbev", "zfeast_hbgv",
    "zfeast_gbev", "zfeast_sbev",
    # sparse
    "sfeast_scsrev", "dfeast_scsrgv", "zfeast_hcsrev", "zfeast_gcsrgv",
    "zfeast_scsrev",
    # polynomial
    "dfeast_sypev", "zfeast_gepev", "zfeast_hepev",
    # iterative
    "difeast_sygv", "zifeast_hcsrgv", "zifeast_gcsrev",
    # parallel
    "pdfeast_sygv", "pdfeast_scsrgv", "pzfeast_hegv", "pzfeast_hcsrev",
    "pzifeast_gcsrgv",
    # custom-contour x
    "dfeast_sygvx", "zfeast_heevx", "zfeast_gegvx",
]


def test_all_expected_names_defined():
    for name in _EXPECTED_NAMES:
        assert hasattr(fk, name), f"missing alias {name}"
        assert callable(getattr(fk, name))


def test_alias_matches_generic_exactly():
    n = 80
    A = laplacian_1d(n)
    r1 = fk.dfeast_syev(A, 0.5, 1.5, 20)
    r2 = fk.feast_syev(A, 0.5, 1.5, 20)
    assert np.array_equal(r1.lam, r2.lam)
    assert np.array_equal(np.asarray(r1.q), np.asarray(r2.q))


def test_single_precision_alias():
    n = 60
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = fk.sfeast_syev(A, 0.5, 1.5, len(exp) + 5)
    assert r.lam.dtype == np.float32
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-5


def test_complex_symmetric_alias_is_general(rng):
    C = rng.standard_normal((30, 30)) + 1j * rng.standard_normal((30, 30))
    C = (C + C.T) / 2
    w = np.linalg.eigvals(C)
    r = fk.zfeast_syev(C, w[0], 1.0, 10)
    from feastkit_tpu import FeastGeneralResult, feast_inside_gcontour
    assert isinstance(r, FeastGeneralResult)
    exp = w[np.asarray(feast_inside_gcontour(w, w[0], 1.0))]
    assert r.M == len(exp)


def test_parallel_alias_matches_serial():
    n = 60
    A = laplacian_1d(n)
    r1 = fk.pdfeast_syev(A, 0.5, 1.5, 16)
    r2 = fk.dfeast_syev(A, 0.5, 1.5, 16)
    assert r1.M == r2.M
    assert np.abs(np.sort(r1.lam) - np.sort(r2.lam)).max() < 1e-12


@pytest.mark.slow
def test_iterative_alias(rng):
    n = 60
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.0)])
    r = fk.difeast_syev(A, 0.5, 1.0, len(exp) + 4)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-8


def test_custom_contour_x_variant():
    n = 60
    A = laplacian_1d(n)
    c = fk.feast_contour(0.5, 1.5, ne=10)
    r = fk.dfeast_syevx(A, 0.5, 1.5, 16, c.Zne, c.Wne)
    r_def = fk.dfeast_syev(A, 0.5, 1.5, 16)
    assert r.M == r_def.M
    assert np.abs(np.sort(r.lam) - np.sort(r_def.lam)).max() < 1e-12


def test_full_reference_name_surface():
    """Every alias name the reference's @eval loops generate (mirrored to
    d/z) exists here (feast_precision_aliases.jl, 194 names)."""
    import re
    import feastkit_tpu.interfaces.aliases as al
    fams_real = ["feast_sygv", "feast_syev", "feast_sbgv", "feast_sbev",
                 "feast_scsrgv", "feast_scsrev", "feast_sypev",
                 "feast_scsrpev", "feast_srcipev"]
    fams_cplx = ["feast_hegv", "feast_heev", "feast_hbgv", "feast_hbev",
                 "feast_hcsrgv", "feast_hcsrev", "feast_sygv", "feast_syev",
                 "feast_sbgv", "feast_sbev", "feast_scsrgv", "feast_scsrev",
                 "feast_gegv", "feast_geev", "feast_gbgv", "feast_gbev",
                 "feast_gcsrgv", "feast_gcsrev", "feast_hepev", "feast_gepev",
                 "feast_hcsrpev", "feast_gcsrpev", "feast_grcipev"]
    names = set()
    for p in ("s", "d"):
        names.update(p + f for f in fams_real)
        names.update(p + f + "x" for f in fams_real)
        names.update(p + "ifeast_" + f for f in
                     ("sypev", "scsrpev", "srcipev"))
        names.update(p + "ifeast_" + f + "x" for f in
                     ("sypev", "scsrpev", "srcipev"))
        names.update("p" + p + "feast_" + f for f in
                     ("sygv", "syev", "scsrgv", "scsrev", "srci"))
    for p in ("c", "z"):
        names.update(p + f for f in fams_cplx)
        names.update(p + f + "x" for f in fams_cplx)
        names.update(p + "ifeast_" + f for f in
                     ("hepev", "gepev", "hcsrpev", "gcsrpev", "grcipev"))
        names.update(p + "ifeast_" + f + "x" for f in
                     ("hepev", "gepev", "hcsrpev", "gcsrpev", "grcipev"))
        names.update("p" + p + "feast_" + f for f in
                     ("hegv", "heev", "gegv", "geev", "hcsrgv", "hcsrev",
                      "gcsrgv", "gcsrev"))
        names.update("p" + p + "ifeast_" + f for f in
                     ("hegv", "heev", "gegv", "geev", "hcsrgv", "hcsrev",
                      "gcsrgv", "gcsrev"))
    missing = sorted(n for n in names if n not in al.__all__)
    assert not missing, f"missing aliases: {missing}"
    assert len(al.__all__) >= 194


def test_parallel_general_alias_is_parallel():
    """pzfeast_gcsrgv must run the SHARDED engine, not a serial fallback
    (round-1 defect: serial code behind parallel names)."""
    import scipy.sparse as sp
    from unittest import mock
    from feastkit_tpu.parallel import pfeast as pf
    rng = np.random.default_rng(5)
    n = 100
    d = np.concatenate([rng.uniform(-0.5, 0.5, 8)
                        + 1j * rng.uniform(-0.3, 0.3, 8),
                        4.0 + np.arange(n - 8, dtype=float)])
    A = sp.diags(d, 0, format="csr")
    B = sp.eye(n, format="csr").astype(complex)
    called = {}
    orig = pf.pfeast_sparse_general

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    with mock.patch.object(pf, "pfeast_sparse_general", side_effect=spy):
        r = fk.pzfeast_gcsrgv(A, B, 0.0 + 0.0j, 1.0, 12)
    assert called.get("yes")
    assert r.M == 8


def test_rcipev_alias(rng):
    """{s,d}feast_srcipev drives the polynomial RCI machine and agrees with
    the companion spectrum."""
    n = 12
    K = np.diag(rng.uniform(0.5, 2.0, n))
    C = 0.1 * np.eye(n)
    M = np.eye(n)
    Acomp = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    w = np.linalg.eigvals(Acomp)
    exp = w[np.asarray(fk.feast_inside_gcontour(w, 0.0 + 1.0j, 0.22))]
    r = fk.dfeast_srcipev([K, C, M], 0.0 + 1.0j, 0.22,
                          min(len(exp) + 4, n))
    assert r.M == len(exp)
    for lam in exp:
        assert np.min(np.abs(r.lam - lam)) < 1e-5


def test_banded_x_variant():
    """sfeast_sbevx: custom contour through the banded driver."""
    from feastkit_tpu.core.contour import feast_contour
    from feastkit_tpu.ops.banded import full_to_banded
    n = 100
    A = laplacian_1d(n)
    bands = full_to_banded(A, 1, 1)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    c = feast_contour(0.5, 0.8, ne=10, quadrature=0, aspect_ratio=1.0)
    r = fk.dfeast_sbevx(bands, 1, 1, 0.5, 0.8, len(exp) + 4,
                        c.Zne, c.Wne)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_parallel_rci_alias():
    """pdfeast_srci returns the batch-parallel RCI state machine."""
    from feastkit_tpu.kernel.rci import FeastPRCI
    st = fk.pdfeast_srci(40, 8, 0.5, 1.5)
    assert isinstance(st, FeastPRCI)


def test_ifeast_banded_iterative_vs_direct():
    """difeast_sbgv ~ dfeast_sbgv with the ITERATIVE path actually
    exercised (inner_converged present and True): the reference's
    GMRES-vs-direct banded agreement block (runtests.jl:605-681)."""
    from feastkit_tpu.ops.banded import full_to_banded
    n = 120
    A = laplacian_1d(n)
    B = (np.diag(4.0 * np.ones(n)) + np.diag(np.ones(n - 1), 1)
         + np.diag(np.ones(n - 1), -1)) / 6.0
    Ab = full_to_banded(A, 1, 1)
    Bb = full_to_banded(B, 1, 1)
    import scipy.linalg as sla
    w = np.sort(sla.eigh(A, B, eigvals_only=True))
    Emin, Emax = 0.5 * (w[9] + w[10]), 0.5 * (w[19] + w[20])
    exp = w[(w >= Emin) & (w <= Emax)]
    r_dir = fk.dfeast_sbgv(Ab, 1, 1, Bb, 1, 1, Emin, Emax, len(exp) + 4)
    # prove the i-name takes the KRYLOV path: the narrow-band auto
    # delegation (direct BCR) must NOT fire for the iterative alias
    import feastkit_tpu.solvers.banded as _bd

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("ifeast alias delegated to the DIRECT engine")

    orig = _bd._banded_interval_driver
    _bd._banded_interval_driver = _boom
    try:
        r_it = fk.difeast_sbgv(Ab, 1, 1, Bb, 1, 1, Emin, Emax, len(exp) + 4)
    finally:
        _bd._banded_interval_driver = orig
    assert r_it.M == r_dir.M == len(exp)
    assert np.abs(np.sort(r_it.lam) - np.sort(r_dir.lam)).max() < 1e-8
    # the iterative path reports inner-solve certification
    assert r_it.inner_converged is True


def test_ifeast_banded_standard_iterative():
    from feastkit_tpu.ops.banded import full_to_banded
    n = 100
    A = laplacian_1d(n)
    bands = full_to_banded(A, 1, 1)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r_dir = fk.dfeast_sbev(bands, 1, 1, 0.5, 0.8, len(exp) + 4)
    r_it = fk.difeast_sbev(bands, 1, 1, 0.5, 0.8, len(exp) + 4)
    assert r_it.M == r_dir.M == len(exp)
    assert np.abs(np.sort(r_it.lam) - np.sort(r_dir.lam)).max() < 1e-8


def test_ifeast_pep_iterative_vs_direct(rng):
    """difeast_sypev runs the matrix-free companion ITERATIVE path and
    agrees with the direct companion driver (runtests.jl:965-1029)."""
    n = 12
    K = np.diag(rng.uniform(0.5, 2.0, n))
    C = 0.1 * np.eye(n)
    M = np.eye(n)
    Emid, r = 0.0 + 1.0j, 0.22
    r_dir = fk.dfeast_sypev([K, C, M], Emid, r, n)
    r_it = fk.difeast_sypev([K, C, M], Emid, r, n)
    assert r_it.M == r_dir.M
    for lam in np.asarray(r_dir.lam):      # set agreement (ordering differs)
        assert np.min(np.abs(np.asarray(r_it.lam) - lam)) < 1e-5
    assert r_it.inner_converged is True


def test_ifeast_rcipev_iterative(rng):
    """difeast_srcipev: the RCI pump answered with GMRES solves must agree
    with the LU-answered dfeast_srcipev."""
    n = 10
    K = np.diag(rng.uniform(0.5, 2.0, n))
    C = 0.1 * np.eye(n)
    M = np.eye(n)
    r_dir = fk.dfeast_srcipev([K, C, M], 0.0 + 1.0j, 0.22, n)
    r_it = fk.difeast_srcipev([K, C, M], 0.0 + 1.0j, 0.22, n)
    assert r_it.M == r_dir.M
    for lam in np.asarray(r_dir.lam):      # set agreement (ordering differs)
        assert np.min(np.abs(np.asarray(r_it.lam) - lam)) < 1e-5


def test_ifeast_sparse_csr_pins_iterative():
    """Regression: i-prefixed CSR aliases must pin the Krylov inner solve —
    the narrow-band auto-delegation (direct BCR, matching the reference's
    UMFPACK path for NON-i names) must not fire for ifeast_*csr* names
    (runtests.jl:605-681 iterative-vs-direct contract)."""
    import scipy.sparse as sp
    n = 200
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    Emin, Emax = 0.5, 0.7
    exp = w[(w >= Emin) & (w <= Emax)]
    r_dir = fk.dfeast_scsrev(A, Emin, Emax, len(exp) + 4)
    import feastkit_tpu.solvers.banded as _bd

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("ifeast CSR alias delegated to the DIRECT "
                             "banded engine")

    orig = _bd._banded_interval_driver
    _bd._banded_interval_driver = _boom
    try:
        r_it = fk.difeast_scsrev(A, Emin, Emax, len(exp) + 4)
        # general/Hermitian i-names share the pin through their factories
        rg = fk.zifeast_gcsrev(A.astype(np.complex128), 0.6 + 0.0j, 0.1,
                               len(exp) + 4)
    finally:
        _bd._banded_interval_driver = orig
    assert r_it.M == r_dir.M == len(exp)
    assert np.abs(np.sort(r_it.lam) - np.sort(r_dir.lam)).max() < 1e-8
    assert r_it.inner_converged is True
    assert rg.M == len(exp)
