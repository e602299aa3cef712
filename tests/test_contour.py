"""Contour generation + rational filter tests (mirrors test/runtests.jl:39-58
and the filter-oracle technique from SURVEY.md section 7 stage 1)."""
import numpy as np
import pytest

from feastkit_tpu import (feast_contour, feast_contour_expert,
                          feast_customcontour, feast_gcontour,
                          feast_grationalx, feast_inside_contour,
                          feast_inside_gcontour, feast_rational,
                          feast_rationalx, feastdefault, feastinit,
                          zolotarev_quadrature)


def test_contour_point_counts():
    for ne in (4, 8, 12, 16, 20):
        c = feast_contour(0.0, 1.0, ne=ne)
        assert c.ne == ne
    fpm = feastdefault(feastinit())
    assert feast_contour(0.0, 1.0, fpm).ne == 8
    assert feast_gcontour(0.0, 1.0, fpm).ne == 16


def test_contour_symmetry_and_location():
    c = feast_contour(-2.0, 4.0, ne=8)
    # Half-contour: all nodes in the upper half plane, centered on Emid=1, r=3
    assert (c.Zne.imag > 0).all()
    assert np.allclose(abs(c.Zne - 1.0), 3.0, atol=1e-12)   # circle (aspect 1)
    # Gauss symmetry: nodes mirror about the center
    x = np.sort(c.Zne.real - 1.0)
    assert np.allclose(x, -x[::-1])


def test_rational_filter_gauss():
    lam = np.array([-0.9, -0.5, 0.0, 0.5, 0.9])
    inside = feast_rationalx(*feast_contour(-1.0, 1.0, ne=8), lam)
    assert np.all(np.abs(inside - 1.0) < 0.05)
    lam_out = np.array([1.6, 2.0, 5.0, -3.0])
    outside = feast_rationalx(*feast_contour(-1.0, 1.0, ne=8), lam_out)
    assert np.all(np.abs(outside) < 5e-3)


def test_rational_filter_trapezoid():
    lam_in = np.array([-0.5, 0.0, 0.5])
    f = feast_rational(lam_in, -1.0, 1.0, ne=16, quadrature=1)
    assert np.all(np.abs(f - 1.0) < 1e-3)
    f_out = feast_rational(np.array([2.0, 10.0]), -1.0, 1.0, ne=16, quadrature=1)
    assert np.all(np.abs(f_out) < 1e-2)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 20])
def test_zolotarev_tabulated_degrees(n):
    """Filter quality at every reference-tabulated degree: equioscillating
    error ~ published 'rate' inside AND outside (feast_tools.jl:50-180)."""
    rates = {1: 9.92e-1, 2: 7.18e-1, 3: 3.58e-1, 4: 1.71e-1, 5: 8.39e-2,
             6: 4.23e-2, 7: 2.17e-2, 8: 1.12e-2, 10: 3.04e-3, 12: 8.28e-4,
             16: 6.16e-5, 20: 5.33e-6}
    lam_in = np.linspace(-0.998, 0.998, 500)
    lam_out = np.concatenate([np.linspace(1.002, 50, 500),
                              -np.linspace(1.002, 50, 500)])
    f_in = feast_rational(lam_in, -1.0, 1.0, ne=n, quadrature=2)
    f_out = feast_rational(lam_out, -1.0, 1.0, ne=n, quadrature=2)
    # published rate ~= equioscillation mu = 2*|we0|; allow slack
    assert np.abs(f_in - 1.0).max() <= 1.2 * rates[n]
    assert np.abs(f_out).max() <= 1.2 * rates[n]


def test_zolotarev_matches_published_tables():
    """Derived elliptic-function construction reproduces FEAST libnum.f90
    values (via feast_tools.jl:100-109) at machine precision for n=8."""
    xe, we, we0 = zolotarev_quadrature(8)
    assert abs(xe[0] - (-0.99999758153396057 + 0.0021993013049440135j)) < 1e-13
    assert abs(we[0] - (-0.00089892014626439772 + 1.9770010320296091e-6j)) < 1e-13
    assert abs(we0.real - 0.011099137041258145) < 1e-12
    assert abs(xe[3] - (-0.73983485714849262 + 0.67278851368618764j)) < 1e-13


def test_zolotarev_arbitrary_degree():
    """Degrees outside the reference's tables work too (n=9, n=32)."""
    for n in (9, 14, 32):
        lam_in = np.linspace(-0.99, 0.99, 200)
        f = feast_rational(lam_in, -1.0, 1.0, ne=n, quadrature=2)
        assert np.abs(f - 1.0).max() < 0.9  # valid filter
        lam_out = np.array([1.5, 3.0, 10.0])
        f_out = feast_rational(lam_out, -1.0, 1.0, ne=n, quadrature=2)
        assert np.abs(f_out).max() < 0.5


def test_gcontour_filter():
    c = feast_gcontour(1.0 + 0.5j, 2.0, ne=16)
    lam_in = np.array([1.0 + 0.5j, 0.2 + 0.3j, 1.8 + 0.9j])
    f = feast_grationalx(c.Zne, c.Wne, lam_in)
    assert np.all(np.abs(f - 1.0) < 1e-2)
    lam_out = np.array([4.0 + 0.5j, 1.0 - 3.0j, -2.0 + 2.0j])
    f = feast_grationalx(c.Zne, c.Wne, lam_out)
    assert np.all(np.abs(f) < 1e-2)


def test_gcontour_rotation_and_aspect():
    c = feast_gcontour(0.0, 1.0, ne=16, aspect_ratio=0.5, rotation_deg=30)
    # Rotated-ellipse membership must agree with the contour geometry:
    w = (c.Zne - 0.0) * np.exp(-1j * np.pi / 6)
    assert np.allclose((w.real / 1.0) ** 2 + (w.imag / 0.5) ** 2, 1.0,
                       atol=1e-10)
    assert feast_inside_gcontour(np.array([0.1 + 0.1j]), 0.0, 1.0,
                                 aspect_ratio=0.5, rotation_deg=30).all()


def test_custom_contour_trapezoid_weights():
    for sign in (+1, -1):   # both orientations are normalized
        th = sign * 2 * np.pi * (np.arange(64) + 0.5) / 64
        Zne = np.exp(1j * th)
        c = feast_customcontour(Zne)
        f = feast_grationalx(c.Zne, c.Wne, np.array([0.0 + 0.0j, 3.0 + 0j]))
        # central-difference trapezoid weights: O((2pi/ne)^2) accuracy
        assert abs(f[0] - 1.0) < 2e-3
        assert abs(f[1]) < 1e-6


def test_contour_expert_validation():
    with pytest.raises(ValueError):
        feast_contour_expert(0.0, 1.0, 0)
    with pytest.raises(ValueError):
        feast_contour_expert(0.0, 1.0, 8, integration_type=5)
    with pytest.raises(ValueError):
        feast_contour_expert(0.0, 1.0, 8, ellipse_ratio=-1)


def test_inside_predicates():
    assert feast_inside_contour(0.5, 0.0, 1.0)
    assert not feast_inside_contour(1.5, 0.0, 1.0)
    lam = np.array([0.5 + 0.0j, 0.0 + 1.5j])
    got = feast_inside_gcontour(lam, 0.0 + 0.0j, 1.0)
    assert got[0] and not got[1]
