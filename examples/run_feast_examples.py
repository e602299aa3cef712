#!/usr/bin/env python
"""Python counterparts of the FEAST Fortran reference demo drivers.

Mirrors the reference's examples/feast/run_feast_examples.jl driver-for-
driver (18 entry points across dense / sparse / banded storage, standard /
generalized / polynomial problems, default and custom polygonal contours).
The reference reads `system1..5` MatrixMarket fixtures that are NOT shipped
with it; here equivalent synthetic systems (examples/feast_systems.py) make
every driver runnable self-contained:

    python examples/run_feast_examples.py            # all drivers
    python examples/run_feast_examples.py dense      # one family

Each driver prints the same compact summary the reference's
`print_summary` does (info / loops / epsout / eigenpair count / leading
eigenvalues).
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import feastkit_tpu as fk
from examples.feast_systems import (octagon_vertices,
                                    polygonal_contour_nodes, system1,
                                    system2, system2_banded, system3,
                                    system4, system4_banded, system5,
                                    to_sparse)

def _fpm(**slots):
    fpm = fk.feastinit()
    fpm[1] = 1
    for k, v in slots.items():
        fpm[int(k[1:])] = v
    return fpm


def print_summary(label, result, max_values=5):
    lam = np.asarray(result.lam)
    print(label)
    print(f"  info = {result.info}, loops = {result.loop}, "
          f"epsout = {result.epsout:.3e}")
    print(f"  eigenpairs found = {result.M}")
    if result.M > 0:
        head = lam[: min(result.M, max_values)]
        with np.printoptions(precision=6, suppress=True):
            print(f"  eigenvalues: {head}")
    print()


# --- dense ------------------------------------------------------------------

def dense_real_sygv():
    A, B = system1()
    print_summary("F90dense_dfeast_sygv",
                  fk.feast_sygv(A, B, 0.18, 1.0, 25, _fpm()))


def dense_complex_heev():
    A = system2()
    print_summary("F90dense_zfeast_heev",
                  fk.feast_heev(A, -0.35, 0.23, 90, _fpm()))


def dense_real_gegv():
    A, B = system3()
    print_summary("F90dense_dfeast_gegv",
                  fk.feast_gegv(A.astype(complex), B.astype(complex),
                                0.59 + 0.0j, 0.41, 30, _fpm()))


def dense_real_pep():
    coeffs = system5()
    fpm = _fpm(f18=int(round(100 * (0.0035 / 0.05))))
    print_summary("F90dense_dfeast_sypev",
                  fk.dfeast_sypev(coeffs, -1.55 + 0.0j, 0.05, 30, fpm))


def dense_complex_syev():
    A = system4()
    print_summary("F90dense_zfeast_syev (complex-symmetric solver)",
                  fk.feast_geev_complex_sym(A, 4.0 + 0.0j, 3.0, 60, _fpm()))


def dense_complex_syevx():
    A = system4()
    # octagon: tightest polygon separating the inside disc (r<=2.6) from
    # the outside annulus (r>=3.4) — see feast_systems.octagon_vertices
    Zne = polygonal_contour_nodes(octagon_vertices(4.0 + 0.0j, 2.75),
                                  [6] * 8)
    c = fk.feast_customcontour(Zne)
    fpm = _fpm(f8=len(c.Zne))
    print_summary("F90dense_zfeast_syevx (custom polygon contour)",
                  fk.zfeast_geevx(A, 4.0 + 0.0j, 3.0, 60, fpm,
                                  c.Zne, c.Wne))


# --- sparse -----------------------------------------------------------------

def sparse_real_scsrgv():
    A, B = system1()
    print_summary("F90sparse_dfeast_scsrgv",
                  fk.feast_scsrgv(to_sparse(A), to_sparse(B),
                                  0.18, 1.0, 25, _fpm()))


def sparse_real_scsrgv_lowest():
    A, B = system1()
    fpm = _fpm(f40=-1)    # interval option: search lowest (fpm[40],
    #                       defaulted/validated for parity; the reference
    #                       also only threads it through feastdefault!)
    print_summary("F90sparse_dfeast_scsrgv_lowest",
                  fk.feast_scsrgv(to_sparse(A), to_sparse(B),
                                  0.18, 1.0, 40, fpm))


def sparse_real_gcsrgv():
    A, B = system3()
    print_summary("F90sparse_dfeast_gcsrgv",
                  fk.feast_gcsrgv(to_sparse(A.astype(complex)),
                                  to_sparse(B.astype(complex)),
                                  0.59 + 0.0j, 0.41, 30, _fpm()))


def sparse_real_scsrpev():
    coeffs = [to_sparse(c) for c in system5()]
    fpm = _fpm(f18=int(round(100 * (0.0035 / 0.05))))
    print_summary("F90sparse_dfeast_scsrpev",
                  fk.feast_scsrpev(coeffs, -1.55 + 0.0j, 0.05, 30, fpm))


def sparse_complex_hcsrev():
    A = system2_banded()
    print_summary("F90sparse_zfeast_hcsrev",
                  fk.feast_hcsrev(to_sparse(A), -0.35, 0.23, 90, _fpm()))


def sparse_complex_scsrev():
    A = system4_banded()
    print_summary("F90sparse_zfeast_scsrev (general solver)",
                  fk.feast_gcsrev(to_sparse(A), 4.0 + 0.0j, 3.0, 60,
                                  _fpm()))


def sparse_complex_scsrevx():
    A = system4_banded()
    Zne = polygonal_contour_nodes(octagon_vertices(4.0 + 0.0j, 2.75),
                                  [6] * 8)
    c = fk.feast_customcontour(Zne)
    fpm = _fpm(f8=len(c.Zne), f42=0)
    print_summary("F90sparse_zfeast_scsrevx (custom polygon contour)",
                  fk.zfeast_gcsrevx(to_sparse(A), 4.0 + 0.0j, 3.0, 60,
                                    fpm, c.Zne, c.Wne))


# --- banded -----------------------------------------------------------------

def _bands(M, kl, ku):
    from feastkit_tpu.ops.banded import full_to_banded
    return full_to_banded(M, kl, ku)


def banded_real_sbgv():
    A, B = system1()
    print_summary("F90banded_dfeast_sbgv",
                  fk.feast_sbgv(_bands(A, 1, 1), 1, 1, _bands(B, 1, 1),
                                1, 1, 0.18, 1.0, 25, _fpm()))


def banded_real_gbgv():
    A, B = system3()
    print_summary("F90banded_dfeast_gbgv",
                  fk.feast_gbgv(_bands(A.astype(complex), 1, 1), 1, 1,
                                _bands(B.astype(complex), 1, 1), 1, 1,
                                0.59 + 0.0j, 0.41, 30, _fpm()))


def banded_complex_hbev():
    # banded Hermitian: tridiagonal with complex off-diagonal
    n = 240
    A = (np.diag(np.linspace(-1.0, 1.0, n)).astype(complex)
         + np.diag(np.full(n - 1, 0.08 + 0.05j), 1)
         + np.diag(np.full(n - 1, 0.08 - 0.05j), -1))
    print_summary("F90banded_zfeast_hbev",
                  fk.feast_hbev(_bands(A, 1, 1), 1, 1, -0.35, 0.23, 90,
                                _fpm()))


def banded_complex_sbev():
    A = system4_banded()
    print_summary("F90banded_zfeast_sbev (complex-symmetric solver)",
                  fk.feast_sbev_complex(_bands(A, 1, 1), 1, 1,
                                        4.0 + 0.0j, 3.0, 60, _fpm()))


def banded_complex_sbevx():
    A = system4_banded()
    Zne = polygonal_contour_nodes(octagon_vertices(4.0 + 0.0j, 2.75),
                                  [6] * 8)
    c = fk.feast_customcontour(Zne)
    fpm = _fpm(f8=len(c.Zne))
    print_summary("F90banded_zfeast_sbevx (custom polygon contour)",
                  fk.zfeast_gbevx(_bands(A, 1, 1), 1, 1, 4.0 + 0.0j, 3.0,
                                  60, fpm, c.Zne, c.Wne))


FAMILIES = {
    "dense": [dense_real_sygv, dense_complex_heev, dense_real_gegv,
              dense_real_pep, dense_complex_syev, dense_complex_syevx],
    "sparse": [sparse_real_scsrgv, sparse_real_scsrgv_lowest,
               sparse_real_gcsrgv, sparse_real_scsrpev,
               sparse_complex_hcsrev, sparse_complex_scsrev,
               sparse_complex_scsrevx],
    "banded": [banded_real_sbgv, banded_real_gbgv, banded_complex_hbev,
               banded_complex_sbev, banded_complex_sbevx],
}


def main(argv):
    picks = argv[1:] or list(FAMILIES)
    for fam in picks:
        for fn in FAMILIES[fam]:
            fn()


if __name__ == "__main__":
    main(sys.argv)
