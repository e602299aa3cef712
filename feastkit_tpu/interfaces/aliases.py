"""FEAST-compatible precision-prefixed aliases: sfeast_*/dfeast_*/cfeast_*/
zfeast_*, iterative i-variants, parallel p-variants, custom-contour x-variants.

Counterpart of the reference's metaprogrammed alias layer
(src/interfaces/feast_precision_aliases.jl, ~200 @eval-generated wrappers):
table-driven closures instead of macros. Naming grammar (feast_name,
feast_tools.jl:758-832):

    [p] {s|d|c|z} [i] feast_ {sy|he|ge|sb|hb|gb|scsr|hcsr|gcsr} {ev|gv|pev} [x]

* s/d = Float32/Float64; c/z = ComplexF32/ComplexF64
* {s,d}feast_sy* = real symmetric; {c,z}feast_sy* = COMPLEX SYMMETRIC
  (transpose-bilinear, elliptical region) — reference semantics
* i = iterative inner solves; p = device-mesh parallel backend
* x = explicit custom contour (Zne, Wne) arguments
"""
from __future__ import annotations

import numpy as np

from ..core.types import Contour
from ..solvers import banded as _bnd
from ..solvers import dense as _dn
from ..solvers import dense_general as _dg
from ..solvers import matfree as _mf
from ..solvers import sparse as _sp

_REAL = {"s": np.float32, "d": np.float64}
_CPLX = {"c": np.complex64, "z": np.complex128}
_ALL = {**_REAL, **_CPLX}


def _cast(A, dtype):
    if dtype is None:                  # dtype-generic (unprefixed) names
        return A
    try:
        import scipy.sparse as sps
        if sps.issparse(A):
            return A.astype(dtype)
    except ImportError:
        pass
    from jax.experimental import sparse as jsparse
    if isinstance(A, jsparse.BCOO):
        from ..solvers.sparse import as_bcoo
        return as_bcoo(A, dtype)
    return np.asarray(A, dtype)


def _contour_kw(args_contour):
    if args_contour is None:
        return {}
    Zne, Wne = args_contour
    return {"contour": Contour(np.asarray(Zne, complex),
                               np.asarray(Wne, complex))}


def _make_dense_interval(dtype, generalized, hermitian):
    def alias(A, *args, **kw):
        if generalized:
            B, Emin, Emax, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return _dn.dense_hermitian_feast(
                _cast(A, dtype), _cast(B, dtype), Emin, Emax, M0, fpm,
                hermitian=hermitian, **kw)
        Emin, Emax, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return _dn.dense_hermitian_feast(
            _cast(A, dtype), None, Emin, Emax, M0, fpm,
            hermitian=hermitian, **kw)
    return alias


def _make_dense_general(dtype, generalized, bilinear):
    def alias(A, *args, **kw):
        if generalized:
            B, Emid, r, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return _dg.dense_general_feast(
                _cast(A, dtype), _cast(B, dtype), Emid, r, M0, fpm,
                bilinear=bilinear, **kw)
        Emid, r, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return _dg.dense_general_feast(
            _cast(A, dtype), None, Emid, r, M0, fpm, bilinear=bilinear, **kw)
    return alias


def _make_sparse_interval(dtype, generalized, hermitian, iterative=False):
    def alias(A, *args, **kw):
        if iterative:
            # i-name contract: pin the inner solve to Krylov so the
            # narrow-band auto-delegation cannot route to the DIRECT BCR
            # engine (see _iterative_banded_interval)
            kw.setdefault("solver", "gmres")
        if generalized:
            B, Emin, Emax, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return _sp.sparse_feast_interval(
                _cast(A, dtype), _cast(B, dtype), Emin, Emax, M0, fpm,
                hermitian=hermitian, **kw)
        Emin, Emax, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return _sp.sparse_feast_interval(
            _cast(A, dtype), None, Emin, Emax, M0, fpm,
            hermitian=hermitian, **kw)
    return alias


def _make_sparse_general(dtype, generalized, bilinear, iterative=False):
    def alias(A, *args, **kw):
        if iterative:
            # i-name contract (see _make_sparse_interval)
            kw.setdefault("solver", "gmres")
        if generalized:
            B, Emid, r, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return _sp.sparse_feast_general(
                _cast(A, dtype), _cast(B, dtype), Emid, r, M0, fpm,
                bilinear=bilinear, **kw)
        Emid, r, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return _sp.sparse_feast_general(
            _cast(A, dtype), None, Emid, r, M0, fpm, bilinear=bilinear, **kw)
    return alias


def _make_banded_interval(dtype, generalized, hermitian):
    def alias(A_bands, kl, ku, *args, **kw):
        if generalized:
            B_bands, klb, kub, Emin, Emax, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            f = _bnd.feast_hbgv if hermitian else _bnd.feast_sbgv
            return f(_cast(A_bands, dtype), kl, ku, _cast(B_bands, dtype),
                     klb, kub, Emin, Emax, M0, fpm, **kw)
        Emin, Emax, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        f = _bnd.feast_hbev if hermitian else _bnd.feast_sbev
        return f(_cast(A_bands, dtype), kl, ku, Emin, Emax, M0, fpm, **kw)
    return alias


def _make_banded_general(dtype, generalized, bilinear):
    def alias(A_bands, kl, ku, *args, **kw):
        if generalized:
            B_bands, klb, kub, Emid, r, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            f = _bnd.feast_sbgv_complex if bilinear else _bnd.feast_gbgv
            return f(_cast(A_bands, dtype), kl, ku, _cast(B_bands, dtype),
                     klb, kub, Emid, r, M0, fpm, **kw)
        Emid, r, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        f = _bnd.feast_sbev_complex if bilinear else _bnd.feast_gbev
        return f(_cast(A_bands, dtype), kl, ku, Emid, r, M0, fpm, **kw)
    return alias


def _make_pep(dtype):
    def alias(coeffs, Emid, r, M0, fpm=None, **kw):
        return _dg.feast_pep([_cast(c, dtype) for c in coeffs], Emid, r, M0,
                             fpm, **kw)
    return alias


def _bands_to_scipy(bands, kl, ku, dtype):
    """LAPACK band storage -> scipy CSR (the i-variant banded aliases run
    the band operator through the sparse ITERATIVE engine: honest
    Krylov-inner-solve semantics, runtests.jl:605-681)."""
    import scipy.sparse as sps
    from ..ops.pallas_kernels import bands_to_dia
    bands = np.asarray(bands, dtype)
    diags, offsets = bands_to_dia(bands, kl, ku)
    N = diags.shape[1]
    arrs, offs = [], []
    for k, d in enumerate(offsets):
        if abs(d) >= N:
            continue
        arrs.append(diags[k, :N - d] if d >= 0 else diags[k, -d:])
        offs.append(d)
    return sps.diags(arrs, offs, shape=(N, N), format="csr")


def _iterative_banded_interval(dtype, generalized, hermitian):
    """{s,d}ifeast_sb* / {c,z}ifeast_hb*: banded operands, ITERATIVE inner
    solves — the band matrix is a few-diagonals sparse operator, so the
    sparse engine's GMRES path (with DIA fast matvecs) is its natural
    iterative realization (reference: gbtrf-free i-names,
    feast_precision_aliases.jl iterative families)."""
    def alias(A_bands, kl, ku, *args, **kw):
        A = _bands_to_scipy(A_bands, kl, ku, dtype)
        # pin the inner solve to Krylov: an unset solver would let the
        # narrow-band auto-delegation route back to the DIRECT BCR engine,
        # silently voiding the i-name's iterative contract
        kw.setdefault("solver", "gmres")
        if generalized:
            B_bands, klb, kub, Emin, Emax, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            B = _bands_to_scipy(B_bands, klb, kub, dtype)
            return _sp.sparse_feast_interval(A, B, Emin, Emax, M0, fpm,
                                             hermitian=hermitian, **kw)
        Emin, Emax, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return _sp.sparse_feast_interval(A, None, Emin, Emax, M0, fpm,
                                         hermitian=hermitian, **kw)
    return alias


def _iterative_banded_general(dtype, generalized, bilinear):
    """{c,z}ifeast_gb*/sb* (complex): banded general/complex-symmetric with
    iterative inner solves through the sparse general engine."""
    def alias(A_bands, kl, ku, *args, **kw):
        A = _bands_to_scipy(A_bands, kl, ku, dtype)
        # pin the inner solve to Krylov (see _iterative_banded_interval)
        kw.setdefault("solver", "gmres")
        if generalized:
            B_bands, klb, kub, Emid, r, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            B = _bands_to_scipy(B_bands, klb, kub, dtype)
            return _sp.sparse_feast_general(A, B, Emid, r, M0, fpm,
                                            bilinear=bilinear, **kw)
        Emid, r, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return _sp.sparse_feast_general(A, None, Emid, r, M0, fpm,
                                        bilinear=bilinear, **kw)
    return alias


def _coeff_op(c, dtype):
    """Polynomial coefficient -> matvec operator preserving sparsity (the
    iterative pev path must not densify)."""
    try:
        import scipy.sparse as sps
        is_sp = sps.issparse(c)
    except ImportError:
        is_sp = False
    from jax.experimental import sparse as jsparse
    if is_sp or isinstance(c, jsparse.BCOO):
        from ..solvers.sparse import as_bcoo
        Ab = as_bcoo(c, dtype)
        return _mf.LinearOperator(lambda X: Ab @ X, Ab.shape, Ab.data.dtype)
    return np.asarray(c, dtype)


def _make_iter_pep(dtype):
    """*ifeast_*pev: polynomial EVP with ITERATIVE inner solves — the
    matrix-free companion linearization solved by GMRES (the reference's
    iterative polynomial families, runtests.jl:965-1029), instead of the
    direct companion-LU path the non-i names use."""
    def alias(coeffs, Emid, r, M0, fpm=None, **kw):
        return _mf.feast_polynomial_matvec(
            [_coeff_op(c, dtype) for c in coeffs], Emid, r, M0, fpm, **kw)
    return alias


def _make_sparse_pep(dtype):
    def alias(coeffs, Emid, r, M0, fpm=None, **kw):
        return _sp.feast_scsrpev([_cast(c, dtype) for c in coeffs], Emid, r,
                                 M0, fpm, **kw)
    return alias


def _make_rcipev(dtype, iterative=False):
    """*rcipev aliases: drive the polynomial RCI state machine with host
    solves (parity: feast_srcipev!/grcipev!, feast_kernel.jl:990-1050 — the
    reference's RCI-polynomial entry points). ``iterative=True`` answers
    SOLVE requests with restarted GMRES instead of LU — the i-variant's
    "caller chooses direct vs iterative" contract (ifeast_grci! docs,
    feast_kernel.jl:296-395)."""
    def alias(coeffs, Emid, r, M0, fpm=None, **kw):
        import scipy.linalg as sla
        from ..core.types import FeastError, FeastGeneralResult, FeastRCIJob
        from ..kernel.rci import FeastPolyRCI
        coeffs = [np.asarray(c, dtype) for c in coeffs]
        d = len(coeffs) - 1
        N = coeffs[0].shape[0]

        def P(z):
            acc = np.asarray(coeffs[d], complex).copy()
            for k in range(d - 1, -1, -1):
                acc = acc * z + coeffs[k]
            return acc

        def gmres_solve(M, RHS):
            import scipy.sparse.linalg as spla
            out = np.empty_like(RHS)
            for j in range(RHS.shape[1]):
                x, _ = spla.gmres(M, RHS[:, j], rtol=1e-12, atol=1e-12,
                                  restart=min(40, N), maxiter=200)
                out[:, j] = x
            return out

        st = FeastPolyRCI(N, d, M0, Emid, r, fpm, **kw)
        job = st.step()
        factor = None
        guard = 0
        while job != FeastRCIJob.DONE and guard < 100000:
            guard += 1
            if job == FeastRCIJob.FACTORIZE:
                factor = P(st.Ze) if iterative else sla.lu_factor(P(st.Ze))
            elif job == FeastRCIJob.SOLVE:
                st.workc = (gmres_solve(factor, st.workc) if iterative
                            else sla.lu_solve(factor, st.workc))
            elif job == FeastRCIJob.MULT_A:
                st.workc = np.stack(
                    [P(l) @ st.q[:, j] for j, l in enumerate(st.lam)], axis=1)
            job = st.step()
        from ..core.types import _trim
        return _trim(FeastGeneralResult, st.lam, st.q, st.res, st.inside,
                     int(st.info), float(st.epsout), st.loop)
    return alias


def _make_parallel_sparse_general(dtype, generalized, bilinear):
    """Actually-parallel sparse general aliases (contour-sharded mesh) —
    p{c,z}feast_gcsr* route here, never to the serial engine."""
    def alias(A, *args, **kw):
        from ..parallel.pfeast import pfeast_sparse_general
        if generalized:
            B, Emid, r, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return pfeast_sparse_general(_cast(A, dtype), _cast(B, dtype),
                                         Emid, r, M0, fpm,
                                         bilinear=bilinear, **kw)
        Emid, r, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return pfeast_sparse_general(_cast(A, dtype), None, Emid, r, M0, fpm,
                                     bilinear=bilinear, **kw)
    return alias


def _make_parallel_dense_general(dtype, generalized, bilinear):
    def alias(A, *args, **kw):
        from ..parallel.pfeast import pfeast_general
        if generalized:
            B, Emid, r, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return pfeast_general(_cast(A, dtype), _cast(B, dtype), Emid, r,
                                  M0, fpm, bilinear=bilinear, **kw)
        Emid, r, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return pfeast_general(_cast(A, dtype), None, Emid, r, M0, fpm,
                              bilinear=bilinear, **kw)
    return alias


def _make_parallel_iter_interval(dtype, generalized, hermitian):
    """p{c,z}ifeast interval aliases: iterative inner solves on the
    contour-sharded mesh. Dense operands are routed through the sparse
    engine's BCOO matvecs (iterative + parallel, honest semantics)."""
    def alias(A, *args, **kw):
        from ..parallel.pfeast import pfeast_sparse
        if generalized:
            B, Emin, Emax, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return pfeast_sparse(_cast(A, dtype), _cast(B, dtype), Emin, Emax,
                                 M0, fpm, hermitian=hermitian, **kw)
        Emin, Emax, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return pfeast_sparse(_cast(A, dtype), None, Emin, Emax, M0, fpm,
                             hermitian=hermitian, **kw)
    return alias


def _make_parallel_iter_general(dtype, generalized, bilinear):
    def alias(A, *args, **kw):
        from ..parallel.pfeast import pfeast_sparse_general
        if generalized:
            B, Emid, r, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return pfeast_sparse_general(_cast(A, dtype), _cast(B, dtype),
                                         Emid, r, M0, fpm,
                                         bilinear=bilinear, **kw)
        Emid, r, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return pfeast_sparse_general(_cast(A, dtype), None, Emid, r, M0, fpm,
                                     bilinear=bilinear, **kw)
    return alias


def _make_parallel_rci(dtype):
    """p{s,d}feast_srci: construct the batch-parallel RCI state machine
    (parity: pfeast_srci!, feast_parallel_rci.jl:47-266)."""
    def alias(N, M0, Emin, Emax, fpm=None, **kw):
        from ..kernel.rci import FeastPRCI
        return FeastPRCI(N, M0, Emin, Emax, fpm, **kw)
    return alias


def _make_parallel_sparse(dtype, generalized, hermitian):
    def alias(A, *args, **kw):
        from ..parallel.pfeast import pfeast_sparse
        if generalized:
            B, Emin, Emax, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return pfeast_sparse(_cast(A, dtype), _cast(B, dtype), Emin, Emax,
                                 M0, fpm, hermitian=hermitian, **kw)
        Emin, Emax, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return pfeast_sparse(_cast(A, dtype), None, Emin, Emax, M0, fpm,
                             hermitian=hermitian, **kw)
    return alias


def _make_parallel_dense(dtype, generalized, hermitian):
    def alias(A, *args, **kw):
        from ..parallel.pfeast import pfeast_dense
        if generalized:
            B, Emin, Emax, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            return pfeast_dense(_cast(A, dtype), _cast(B, dtype), Emin, Emax,
                                M0, fpm, hermitian=hermitian, **kw)
        Emin, Emax, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return pfeast_dense(_cast(A, dtype), None, Emin, Emax, M0, fpm,
                            hermitian=hermitian, **kw)
    return alias


def _iterative_dense_interval(dtype, generalized, hermitian):
    """i-prefixed dense: inner solves by GMRES through the matrix-free
    engine (the reference's ifeast dense = Krylov inner solves)."""
    def alias(A, *args, **kw):
        import jax.numpy as jnp

        def _matvec(M):
            # enforce the alias PRECISION while preserving complexness:
            # casting a complex Krylov vector to a real dtype would drop
            # its imaginary part (and JAX deprecates the implicit cast)
            def f(X):
                if jnp.iscomplexobj(X) and not jnp.iscomplexobj(M):
                    tgt = (jnp.complex64 if M.dtype == jnp.float32
                           else jnp.complex128)
                else:
                    tgt = M.dtype
                return M @ X.astype(tgt)
            return f

        Aj = jnp.asarray(np.asarray(A, dtype))
        A_op = _mf.LinearOperator(_matvec(Aj),
                                  Aj.shape, Aj.dtype,
                                  symmetric=not hermitian,
                                  hermitian=hermitian)
        if generalized:
            B, Emin, Emax, M0, *rest = args
            fpm = rest[0] if rest else kw.pop("fpm", None)
            Bj = jnp.asarray(np.asarray(B, dtype))
            B_op = _mf.LinearOperator(_matvec(Bj),
                                      Bj.shape, Bj.dtype,
                                      symmetric=not hermitian,
                                      hermitian=hermitian, posdef=True)
            return _mf.feast_matvec(A_op, B_op, (Emin, Emax), M0, fpm,
                                    hermitian=hermitian, **kw)
        Emin, Emax, M0, *rest = args
        fpm = rest[0] if rest else kw.pop("fpm", None)
        return _mf.feast_matvec(A_op, None, (Emin, Emax), M0, fpm,
                                hermitian=hermitian, **kw)
    return alias


def _looks_like_fpm(obj):
    from ..core.parameters import FeastParameters
    if isinstance(obj, FeastParameters):
        return True
    try:
        arr = np.asarray(obj)
    except Exception:
        return False
    return (arr.ndim == 1 and arr.size >= 64
            and np.issubdtype(arr.dtype, np.integer))


def _xify(fn):
    """x-variant: trailing (Zne, Wne) positional args register a custom
    contour in the fpm[29] registry for the call (parity with the
    reference's *x! routines routing through feast_contour_custom_weights)."""
    def xalias(*args, **kw):
        *base, Zne, Wne = args
        from ..core.aux import with_custom_contour
        from ..core.parameters import FeastParameters, feastinit
        contour = Contour(np.asarray(Zne, complex), np.asarray(Wne, complex))
        fpm = kw.pop("fpm", None)
        if fpm is None and base and _looks_like_fpm(base[-1]):
            fpm = base[-1]
            base = base[:-1]
        fpm = feastinit() if fpm is None else (
            fpm if isinstance(fpm, FeastParameters) else FeastParameters(fpm))
        with with_custom_contour(fpm, contour):
            return fn(*base, fpm=fpm, **kw)
    return xalias


def _build():
    out = {}
    # ---- real prefixes s/d -------------------------------------------
    for p, dt in _REAL.items():
        out[f"{p}feast_sygv"] = _make_dense_interval(dt, True, False)
        out[f"{p}feast_syev"] = _make_dense_interval(dt, False, False)
        out[f"{p}feast_sbgv"] = _make_banded_interval(dt, True, False)
        out[f"{p}feast_sbev"] = _make_banded_interval(dt, False, False)
        out[f"{p}feast_scsrgv"] = _make_sparse_interval(dt, True, False)
        out[f"{p}feast_scsrev"] = _make_sparse_interval(dt, False, False)
        out[f"{p}feast_sypev"] = _make_pep(dt)
        out[f"{p}feast_scsrpev"] = _make_sparse_pep(dt)
        out[f"{p}feast_srcipev"] = _make_rcipev(dt)
        # iterative (si/di naming): every i-name switches the inner solve
        # to a genuinely ITERATIVE path (runtests.jl:605-681 tests
        # iterative-vs-direct agreement per family)
        out[f"{p}ifeast_sypev"] = _make_iter_pep(dt)
        out[f"{p}ifeast_scsrpev"] = _make_iter_pep(dt)
        out[f"{p}ifeast_srcipev"] = _make_rcipev(dt, iterative=True)
        out[f"{p}ifeast_sygv"] = _iterative_dense_interval(dt, True, False)
        out[f"{p}ifeast_syev"] = _iterative_dense_interval(dt, False, False)
        out[f"{p}ifeast_scsrgv"] = _make_sparse_interval(dt, True, False,
                                                         iterative=True)
        out[f"{p}ifeast_scsrev"] = _make_sparse_interval(dt, False, False,
                                                         iterative=True)
        out[f"{p}ifeast_sbgv"] = _iterative_banded_interval(dt, True, False)
        out[f"{p}ifeast_sbev"] = _iterative_banded_interval(dt, False, False)
        # parallel
        out[f"p{p}feast_sygv"] = _make_parallel_dense(dt, True, False)
        out[f"p{p}feast_syev"] = _make_parallel_dense(dt, False, False)
        out[f"p{p}feast_scsrgv"] = _make_parallel_sparse(dt, True, False)
        out[f"p{p}feast_scsrev"] = _make_parallel_sparse(dt, False, False)
        out[f"p{p}feast_srci"] = _make_parallel_rci(dt)
    # ---- complex prefixes c/z ----------------------------------------
    for p, dt in _CPLX.items():
        out[f"{p}feast_hegv"] = _make_dense_interval(dt, True, True)
        out[f"{p}feast_heev"] = _make_dense_interval(dt, False, True)
        out[f"{p}feast_hbgv"] = _make_banded_interval(dt, True, True)
        out[f"{p}feast_hbev"] = _make_banded_interval(dt, False, True)
        out[f"{p}feast_hcsrgv"] = _make_sparse_interval(dt, True, True)
        out[f"{p}feast_hcsrev"] = _make_sparse_interval(dt, False, True)
        # complex-symmetric: {c,z}feast_sy*/sb*/scsr* (elliptical, bilinear)
        out[f"{p}feast_sygv"] = _make_dense_general(dt, True, True)
        out[f"{p}feast_syev"] = _make_dense_general(dt, False, True)
        out[f"{p}feast_sbgv"] = _make_banded_general(dt, True, True)
        out[f"{p}feast_sbev"] = _make_banded_general(dt, False, True)
        out[f"{p}feast_scsrgv"] = _make_sparse_general(dt, True, True)
        out[f"{p}feast_scsrev"] = _make_sparse_general(dt, False, True)
        # general
        out[f"{p}feast_gegv"] = _make_dense_general(dt, True, False)
        out[f"{p}feast_geev"] = _make_dense_general(dt, False, False)
        out[f"{p}feast_gbgv"] = _make_banded_general(dt, True, False)
        out[f"{p}feast_gbev"] = _make_banded_general(dt, False, False)
        out[f"{p}feast_gcsrgv"] = _make_sparse_general(dt, True, False)
        out[f"{p}feast_gcsrev"] = _make_sparse_general(dt, False, False)
        # polynomial
        out[f"{p}feast_hepev"] = _make_pep(dt)
        out[f"{p}feast_gepev"] = _make_pep(dt)
        out[f"{p}feast_hcsrpev"] = _make_sparse_pep(dt)
        out[f"{p}feast_gcsrpev"] = _make_sparse_pep(dt)
        out[f"{p}feast_grcipev"] = _make_rcipev(dt)
        # iterative (ci/zi naming): genuinely iterative inner solves
        out[f"{p}ifeast_hepev"] = _make_iter_pep(dt)
        out[f"{p}ifeast_gepev"] = _make_iter_pep(dt)
        out[f"{p}ifeast_hcsrpev"] = _make_iter_pep(dt)
        out[f"{p}ifeast_gcsrpev"] = _make_iter_pep(dt)
        out[f"{p}ifeast_grcipev"] = _make_rcipev(dt, iterative=True)
        # iterative interval/general extras
        out[f"{p}ifeast_hegv"] = _iterative_dense_interval(dt, True, True)
        out[f"{p}ifeast_heev"] = _iterative_dense_interval(dt, False, True)
        out[f"{p}ifeast_hbgv"] = _iterative_banded_interval(dt, True, True)
        out[f"{p}ifeast_hbev"] = _iterative_banded_interval(dt, False, True)
        out[f"{p}ifeast_sbgv"] = _iterative_banded_general(dt, True, True)
        out[f"{p}ifeast_sbev"] = _iterative_banded_general(dt, False, True)
        out[f"{p}ifeast_gbgv"] = _iterative_banded_general(dt, True, False)
        out[f"{p}ifeast_gbev"] = _iterative_banded_general(dt, False, False)
        out[f"{p}ifeast_hcsrgv"] = _make_sparse_interval(dt, True, True,
                                                         iterative=True)
        out[f"{p}ifeast_hcsrev"] = _make_sparse_interval(dt, False, True,
                                                         iterative=True)
        out[f"{p}ifeast_gcsrgv"] = _make_sparse_general(dt, True, False,
                                                        iterative=True)
        out[f"{p}ifeast_gcsrev"] = _make_sparse_general(dt, False, False,
                                                        iterative=True)
        # parallel direct: dense Hermitian + dense general + sparse, all on
        # the contour-sharded mesh (no serial masquerading)
        out[f"p{p}feast_hegv"] = _make_parallel_dense(dt, True, True)
        out[f"p{p}feast_heev"] = _make_parallel_dense(dt, False, True)
        out[f"p{p}feast_gegv"] = _make_parallel_dense_general(dt, True, False)
        out[f"p{p}feast_geev"] = _make_parallel_dense_general(dt, False, False)
        out[f"p{p}feast_hcsrgv"] = _make_parallel_sparse(dt, True, True)
        out[f"p{p}feast_hcsrev"] = _make_parallel_sparse(dt, False, True)
        out[f"p{p}feast_gcsrgv"] = _make_parallel_sparse_general(dt, True, False)
        out[f"p{p}feast_gcsrev"] = _make_parallel_sparse_general(dt, False, False)
        # parallel iterative: GMRES inner solves on the sharded mesh (dense
        # operands run through the BCOO matvec engine)
        out[f"p{p}ifeast_hegv"] = _make_parallel_iter_interval(dt, True, True)
        out[f"p{p}ifeast_heev"] = _make_parallel_iter_interval(dt, False, True)
        out[f"p{p}ifeast_gegv"] = _make_parallel_iter_general(dt, True, False)
        out[f"p{p}ifeast_geev"] = _make_parallel_iter_general(dt, False, False)
        out[f"p{p}ifeast_hcsrgv"] = _make_parallel_iter_interval(dt, True, True)
        out[f"p{p}ifeast_hcsrev"] = _make_parallel_iter_interval(dt, False, True)
        out[f"p{p}ifeast_gcsrgv"] = _make_parallel_iter_general(dt, True, False)
        out[f"p{p}ifeast_gcsrev"] = _make_parallel_iter_general(dt, False, False)

    # ---- x-variants: every serial/iterative name gains an explicit
    # custom-contour form (reference generates *x for all of them) --------
    x_real = ["feast_sygv", "feast_syev", "feast_sbgv", "feast_sbev",
              "feast_scsrgv", "feast_scsrev", "feast_sypev", "feast_scsrpev",
              "feast_srcipev", "ifeast_sypev", "ifeast_scsrpev",
              "ifeast_srcipev", "ifeast_sygv", "ifeast_syev", "ifeast_sbgv",
              "ifeast_sbev", "ifeast_scsrgv", "ifeast_scsrev"]
    x_cplx = ["feast_hegv", "feast_heev", "feast_hbgv", "feast_hbev",
              "feast_hcsrgv", "feast_hcsrev", "feast_sygv", "feast_syev",
              "feast_sbgv", "feast_sbev", "feast_scsrgv", "feast_scsrev",
              "feast_gegv", "feast_geev", "feast_gbgv", "feast_gbev",
              "feast_gcsrgv", "feast_gcsrev", "feast_hepev", "feast_gepev",
              "feast_hcsrpev", "feast_gcsrpev", "feast_grcipev",
              "ifeast_hepev", "ifeast_gepev", "ifeast_hcsrpev",
              "ifeast_gcsrpev", "ifeast_grcipev", "ifeast_hegv",
              "ifeast_heev", "ifeast_hbgv", "ifeast_hbev", "ifeast_sbgv",
              "ifeast_sbev", "ifeast_gbgv", "ifeast_gbev", "ifeast_hcsrgv",
              "ifeast_hcsrev", "ifeast_gcsrgv", "ifeast_gcsrev"]
    for p in _REAL:
        for k in x_real:
            out[f"{p}{k}x"] = _xify(out[f"{p}{k}"])
    for p in _CPLX:
        for k in x_cplx:
            out[f"{p}{k}x"] = _xify(out[f"{p}{k}"])

    # ---- unprefixed dtype-generic names (the reference exports these as
    # the underlying generic methods: feast_syevx! etc. work for any T;
    # here dtype=None keeps the operand dtype) --------------------------
    unpref = {
        "feast_sygv": _make_dense_interval(None, True, False),
        "feast_syev": _make_dense_interval(None, False, False),
        "feast_hegv": _make_dense_interval(None, True, True),
        "feast_heev": _make_dense_interval(None, False, True),
        "feast_gegv": _make_dense_general(None, True, False),
        "feast_geev": _make_dense_general(None, False, False),
        "feast_sbgv": _make_banded_interval(None, True, False),
        "feast_sbev": _make_banded_interval(None, False, False),
        "feast_hbgv": _make_banded_interval(None, True, True),
        "feast_hbev": _make_banded_interval(None, False, True),
        "feast_gbgv": _make_banded_general(None, True, False),
        "feast_gbev": _make_banded_general(None, False, False),
        "feast_scsrgv": _make_sparse_interval(None, True, False),
        "feast_scsrev": _make_sparse_interval(None, False, False),
        "feast_hcsrgv": _make_sparse_interval(None, True, True),
        "feast_hcsrev": _make_sparse_interval(None, False, True),
        "feast_gcsrgv": _make_sparse_general(None, True, False),
        "feast_gcsrev": _make_sparse_general(None, False, False),
        "feast_scsrpev": _make_sparse_pep(None),
        "feast_hcsrpev": _make_sparse_pep(None),
        "feast_gcsrpev": _make_sparse_pep(None),
        "feast_sypev": _make_pep(None),
        "feast_hepev": _make_pep(None),
        "feast_gepev": _make_pep(None),
    }
    # x-variants only for names the package does not already define as
    # its own public API (feast_sygv etc. exist as the typed drivers);
    # gepev/hepev are exported plain AND as x-variants (FeastKit.jl:110)
    for k, fn in unpref.items():
        out[f"{k}x"] = _xify(fn)
    out["feast_gepev"] = unpref["feast_gepev"]
    out["feast_hepev"] = unpref["feast_hepev"]
    return out


_ALIASES = _build()
globals().update(_ALIASES)
__all__ = sorted(_ALIASES)
