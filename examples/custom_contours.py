#!/usr/bin/env python
"""Custom contour-integration examples
(parity: examples/custom_contour_integration.jl).

Five flows: quadrature-rule comparison, elliptical aspect ratios, fully
custom node/weight contours, rational-filter evaluation, and an actual
solve driven through a registered custom contour (fpm[29]).

    python examples/custom_contours.py
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import feastkit_tpu as fk


def example_integration_methods():
    """Gauss-Legendre vs trapezoidal vs Zolotarev node placement on the
    same interval (custom_contour_integration.jl:11-28)."""
    print("=== Example 1: Integration Method Comparison ===")
    Emin, Emax, ne = -1.0, 1.0, 8
    gauss = fk.feast_contour_expert(Emin, Emax, ne, 0, 100)
    trap = fk.feast_contour_expert(Emin, Emax, ne, 1, 100)
    zolo = fk.feast_contour_expert(Emin, Emax, ne, 2, 100)
    with np.printoptions(precision=4, suppress=True):
        print("  Gauss-Legendre nodes:", gauss.Zne)
        print("  Trapezoidal nodes:   ", trap.Zne)
        print("  Zolotarev nodes:     ", zolo.Zne)
    return gauss, trap, zolo


def example_elliptical_contours():
    """Ellipse aspect-ratio control via the fpm[18]-style ratio argument
    (a/b * 100; custom_contour_integration.jl:34-62)."""
    print("\n=== Example 2: Elliptical Contour Shapes ===")
    Emin, Emax, ne = -2.0, 2.0, 12
    shapes = {
        "circle (aspect=1.0)": fk.feast_contour_expert(Emin, Emax, ne, 0, 100),
        "flat ellipse (aspect=0.5)": fk.feast_contour_expert(Emin, Emax, ne, 0, 50),
        "tall ellipse (aspect=2.0)": fk.feast_contour_expert(Emin, Emax, ne, 0, 200),
    }
    for name, c in shapes.items():
        pts = ", ".join(f"{z:.3f}" for z in c.Zne[:4])
        print(f"  {name}: {pts} ...")
    return shapes


def example_custom_contour():
    """A rectangular contour from explicit user nodes + weights
    (custom_contour_integration.jl:67-95)."""
    print("\n=== Example 3: Custom User-Defined Contour ===")
    Zne = np.array([-1.0 + 0.5j, 1.0 + 0.5j, 1.0 - 0.5j, -1.0 - 0.5j])
    Wne = np.array([2.0 + 0.0j, 0.0 - 1.0j, -2.0 + 0.0j, 0.0 + 1.0j])
    contour = fk.feast_contour_custom_weights(Zne, Wne)
    for i, (z, w) in enumerate(zip(contour.Zne, contour.Wne)):
        print(f"  node {i}: Z = {z}, W = {w}")
    return contour


def example_rational_function():
    """The FEAST rational filter f(lam) = sum_e w_e/(z_e - lam): ~1 inside
    the contour, ~0 outside (custom_contour_integration.jl:101-123)."""
    print("\n=== Example 4: Rational Function Evaluation ===")
    lam = np.array([-1.5, -0.5, 0.0, 0.5, 1.5, 2.5])
    Emin, Emax = -1.0, 1.0
    contour = fk.feast_contour_expert(Emin, Emax, 16, 0, 100)
    f = fk.feast_rationalx(contour.Zne, contour.Wne, lam)
    for L, v in zip(lam, f):
        tag = "inside" if Emin <= L <= Emax else "outside"
        print(f"  lam = {L:+.1f}: f(lam) = {v:+.6f} ({tag})")
    assert np.all(np.abs(f[np.abs(lam) < 1.0] - 1.0) < 0.1)
    assert np.all(np.abs(f[np.abs(lam) > 1.2]) < 0.2)
    return f


def example_eigenvalue_problem():
    """An end-to-end solve driven by a REGISTERED custom contour: octagonal
    nodes around an interval, fpm[29] id, feast_custom_contour — the part
    the reference example stops short of (it only builds the contours;
    custom_contour_integration.jl:128-159)."""
    print("\n=== Example 5: Eigenvalue Problem with Custom Contour ===")
    n = 10
    A = (np.diag(2.0 * np.ones(n)) + np.diag(-1.0 * np.ones(n - 1), 1)
         + np.diag(-1.0 * np.ones(n - 1), -1))
    k = np.arange(1, n + 1)
    true_lam = 2.0 - 2.0 * np.cos(k * np.pi / (n + 1))
    Emin, Emax = 1.0, 3.0
    expected = np.sort(true_lam[(true_lam >= Emin) & (true_lam <= Emax)])
    print(f"  exact eigenvalues in ({Emin}, {Emax}):",
          np.round(expected, 4))

    # custom polygonal contour around the interval (octagon through the
    # complex plane), registered + solved through the fpm[29] machinery
    mid, rad = 0.5 * (Emin + Emax), 0.5 * (Emax - Emin)
    theta = np.pi * (2.0 * np.arange(16) + 1.0) / 16.0
    Zne = mid + rad * np.cos(theta) + 0.4j * rad * np.sin(theta)
    contour = fk.feast_customcontour(Zne)
    r = fk.feast_custom_contour(A, None, contour.Zne, contour.Wne,
                                M0=len(expected) + 3, interval=(Emin, Emax))
    print(f"  feast_custom_contour: M = {r.M}, info = {int(r.info)}, "
          f"epsout = {r.epsout:.2e}")
    assert r.M == len(expected)
    assert np.abs(np.sort(r.lam) - expected).max() < 1e-8
    print("  matches the analytic spectrum to 1e-8")
    return r


def main():
    example_integration_methods()
    example_elliptical_contours()
    example_custom_contour()
    example_rational_function()
    example_eigenvalue_problem()
    print("\nAll custom-contour examples completed.")


if __name__ == "__main__":
    main()
