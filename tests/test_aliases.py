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
