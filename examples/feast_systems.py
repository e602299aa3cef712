"""Synthetic stand-ins for the Fortran FEAST demo systems.

The reference's example runner (examples/feast/run_feast_examples.jl) reads
`system1..system5` MatrixMarket fixtures from the original FEAST
distribution — files that are NOT shipped with the reference repo, so its
examples cannot run standalone. These builders produce synthetic systems of
the same mathematical classes, sized so each driver's reference search
region (interval (0.18, 1.0), circle |z-0.59|<0.41, disc |z-4|<3, disc
|z+1.55|<0.05) encloses a known eigenvalue count comfortably below the
reference M0:

* system1/system1B — real symmetric generalized tridiagonal pencil
  (A = 2*tridiag(-1,2,-1), B = mass/6): ~20 pencil eigenvalues inside
  (0.18, 1.0) at n=160 (M0=25).
* system2          — complex Hermitian, spectrum linspace(-1, 1): 69
  eigenvalues inside (-0.35, 0.23) at n=240 (M0=90).
* system3/system3B — real nonsymmetric generalized pencil (convection-
  diffusion vs mass): ~19 inside |z-0.59|<0.41 at n=160 (M0=30).
* system4          — complex symmetric (NOT Hermitian) with exactly 40
  eigenvalues inside |z-4|<3 (M0=60).
* system5          — quadratic real symmetric polynomial (M, C, K) with 12
  overdamped eigenvalues inside |z+1.55|<0.05 (M0=30).
"""
import numpy as np
import scipy.sparse as sp


def tridiag(n, lo, d, up, dtype=float):
    return (np.diag(np.full(n, d).astype(dtype))
            + np.diag(np.full(n - 1, up).astype(dtype), 1)
            + np.diag(np.full(n - 1, lo).astype(dtype), -1))


def system1(n=160):
    """Real symmetric generalized pencil (stand-in for system1/system1B)."""
    A = 2.0 * tridiag(n, -1.0, 2.0, -1.0)
    B = tridiag(n, 1.0, 4.0, 1.0) / 6.0
    return A, B


def system2(n=240):
    """Complex Hermitian with eigenvalues linspace(-1, 1) (system2)."""
    rng = np.random.default_rng(7)
    Z = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Q, _ = np.linalg.qr(Z)
    w = np.linspace(-1.0, 1.0, n)
    return (Q * w) @ Q.conj().T


def system2_banded(n=240):
    """Sparse/banded complex Hermitian tridiagonal, spectrum near
    linspace(-1, 1) (for the CSR and band-storage Hermitian demos)."""
    return tridiag(n, 0.08 - 0.05j, 0.0, 0.08 + 0.05j, complex) \
        + np.diag(np.linspace(-1.0, 1.0, n))


def system3(n=160, inside=24):
    """Real nonsymmetric generalized pencil (system3/system3B): upper-
    bidiagonal A and diagonal SPD B keep the pencil triangular, so its
    spectrum is EXACTLY diag(A)/diag(B) — `inside` eigenvalues in
    (0.23, 0.95), the rest kept >=0.05 clear of the reference's search
    circle |z - 0.59| < 0.41 (margins a contour filter resolves fast
    in float32)."""
    rng = np.random.default_rng(5)
    lam = np.concatenate([
        np.linspace(0.23, 0.95, inside),
        np.linspace(-1.0, 0.13, (n - inside) // 2),
        np.linspace(1.05, 3.0, n - inside - (n - inside) // 2)])
    rng.shuffle(lam)
    b = rng.uniform(0.9, 1.1, n)
    A = np.diag(lam * b) + np.diag(0.02 * rng.standard_normal(n - 1), 1)
    B = np.diag(b)
    return A, B


def system4(n=240, inside=40):
    """Complex symmetric (system4): Q D Q^T with REAL orthogonal Q keeps
    the matrix complex symmetric and the spectrum exactly D — `inside`
    eigenvalues within |z - 4| < 2.6, the rest in an annulus outside 3.4
    (clear margins off the |z-4|=3 search contour)."""
    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    th = rng.uniform(0, 2 * np.pi, n)
    rad = np.concatenate([rng.uniform(0.0, 2.6, inside),
                          rng.uniform(3.4, 5.0, n - inside)])
    d = 4.0 + rad * np.exp(1j * th)
    return (Q * d) @ Q.T


def system4_banded(n=240, inside=40):
    """Banded complex-symmetric stand-in for system4: tridiagonal with
    complex diagonal (`inside` values within |z-4|<2.6, the rest in the
    annulus 3.4..5) and symmetric coupling 0.05 — Gershgorin keeps every
    eigenvalue within 0.1 of its diagonal entry, preserving the 0.4
    margins off the |z-4|=3 search contour."""
    rng = np.random.default_rng(17)
    th = rng.uniform(0, 2 * np.pi, n)
    rad = np.concatenate([rng.uniform(0.0, 2.6, inside),
                          rng.uniform(3.4, 5.0, n - inside)])
    d = 4.0 + rad * np.exp(1j * th)
    rng.shuffle(d)
    return np.diag(d) + tridiag(n, 0.05 + 0.01j, 0.0, 0.05 + 0.01j,
                                complex)


def octagon_vertices(center, inradius):
    """Regular octagon vertices: the tightest polygon family here that can
    enclose the |z-c|<2.6 eigenvalue disc while staying inside the 3.4
    exclusion annulus (a rectangle cannot: it needs corner radius
    sqrt(2)*2.6 > 3.4)."""
    R = inradius / np.cos(np.pi / 8)
    ang = np.pi / 8 + np.arange(8) * np.pi / 4
    return center + R * np.exp(1j * ang)


def system5(n=200):
    """Quadratic symmetric polynomial (M, C, K) = (I, 3.2 I, diag k):
    lambda = -1.6 +/- sqrt(2.56 - k). Twelve k-values in (2.5505, 2.5595)
    put one overdamped branch inside |lambda + 1.55| < 0.05."""
    rng = np.random.default_rng(13)
    k = np.empty(n)
    k[:12] = np.linspace(2.5505, 2.5595, 12)
    k[12:] = rng.uniform(1.0, 2.0, n - 12)
    K = np.diag(k)
    C = 3.2 * np.eye(n)
    M = np.eye(n)
    return [K, C, M]


def to_sparse(M):
    return sp.csr_matrix(M)


def polygonal_contour_nodes(zedge, nedge):
    """Nodes along a closed polygon, nedge[i] per edge (parity with the
    reference's build_polygonal_contour, run_feast_examples.jl:176-194)."""
    zedge = np.asarray(zedge, complex)
    nodes = []
    m = len(zedge)
    for i in range(m):
        a, b = zedge[i], zedge[(i + 1) % m]
        t = np.arange(nedge[i]) / nedge[i]
        nodes.append(a + t * (b - a))
    return np.concatenate(nodes)
