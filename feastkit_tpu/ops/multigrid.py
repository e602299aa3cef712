"""Geometric multigrid preconditioner for complex-shifted stencil operators.

The reference's sparse path runs a cached UMFPACK LU per contour node
(feast_sparse.jl:294,334-348); no sparse direct factorization exists on TPU
(SURVEY.md section 2.7), so the iterative inner solves carry the whole
1M-dof target. Unpreconditioned Krylov on (z B - A) stalls: the contour
nodes sit close to the spectrum (distance ~ Im z ~ interval half-width x
aspect),
so kappa ~ spectral_range / dist is 1e4-1e6 for the BASELINE.json Laplacian
configs. The standard cure for exactly this operator class — a complex
shift of an elliptic stencil — is geometric multigrid used as a Krylov
preconditioner (the "complex shifted Laplacian" preconditioner of
Erlangga/Oosterlee/Vuik), and it is TPU-idiomatic: every component is
elementwise stencil arithmetic + 2x pooling on a tensor grid, pure VPU work
that XLA fuses.

Scope (v1): constant-coefficient stencils on a d-dimensional tensor grid
(d = 1, 2, 3), lexicographic (row-major) ordering, zero (Dirichlet-style)
boundary, B either absent (standard problem) or itself a constant stencil
(e.g. a mass matrix). This covers the BASELINE configs (2D/3D Laplacian);
variable-coefficient operators fall back to the Jacobi path in the driver.

Structure:
  * host side: ``detect_grid_stencil`` recognizes (diags, offsets) DIA data
    as a constant grid stencil; ``coarsen_stencil`` Galerkin-coarsens a
    stencil numerically (R A P probed on a small grid), once per level.
  * device side: ``make_shifted_vcycle`` builds ``vcycle(X) -> ~(zB-A)^-1 X``
    for a TRACED complex shift z (the stencil tables are compile-time
    constants; z enters only through scalar combinations and the dense
    coarse-level solve).
"""
from __future__ import annotations

import functools
import itertools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["GridStencil", "detect_grid_stencil", "coarsen_stencil",
           "apply_stencil", "make_shifted_vcycle", "stencil_to_dense",
           "plan_mg_levels"]


class GridStencil(NamedTuple):
    """Constant-coefficient stencil on a tensor grid.

    disps: (ns, ndim) int array of neighbor displacements (each in -1/0/1
           after detection; coarsened stencils may reach +-2).
    coeffs: (ns,) complex/real values.
    grid: tuple of per-axis sizes (row-major flattening).
    """
    disps: np.ndarray
    coeffs: np.ndarray
    grid: tuple


def _strides(grid):
    s = [1] * len(grid)
    for k in range(len(grid) - 2, -1, -1):
        s[k] = s[k + 1] * grid[k + 1]
    return tuple(s)


def detect_grid_stencil(diags, offsets, grid, tol=1e-12):
    """(diags, offsets) DIA data -> GridStencil if it is a constant stencil
    on ``grid``, else None.

    Each flat offset must decompose uniquely as sum_k disp_k * stride_k with
    disp in {-1, 0, 1}; the DIA diagonal must equal the constant coefficient
    at every in-grid position and zero where the displacement crosses a grid
    seam (the row-major wrap positions, where the matrix has no coupling).
    """
    grid = tuple(int(g) for g in grid)
    N = int(np.prod(grid))
    diags = np.asarray(diags)
    if diags.shape[1] != N:
        return None
    strides = _strides(grid)
    ndim = len(grid)
    if any(g < 3 for g in grid):
        return None          # displacement decomposition ambiguous
    # flat offset -> displacement vector
    disp_table = {}
    for combo in itertools.product((-1, 0, 1), repeat=ndim):
        off = sum(c * s for c, s in zip(combo, strides))
        if off in disp_table:
            return None
        disp_table[off] = combo
    disps, coeffs = [], []
    # positions of each grid index along every axis (for seam masks)
    idx = np.arange(N)
    coords = []
    rem = idx
    for k in range(ndim):
        coords.append(rem // strides[k] % grid[k])
    for row, off in zip(diags, offsets):
        if int(off) not in disp_table:
            return None
        disp = disp_table[int(off)]
        # valid positions: i + disp stays inside the grid on every axis
        valid = np.ones(N, bool)
        for k in range(ndim):
            tgt = coords[k] + disp[k]
            valid &= (tgt >= 0) & (tgt < grid[k])
        vals = row[valid]
        if vals.size == 0:
            return None
        c = vals.flat[vals.size // 2]
        scale = max(np.abs(diags).max(), 1e-30)
        if not (np.all(np.abs(vals - c) <= tol * scale)
                and np.all(np.abs(row[~valid]) <= tol * scale)):
            return None
        disps.append(disp)
        coeffs.append(c)
    return GridStencil(np.asarray(disps, np.int64),
                       np.asarray(coeffs), grid)


def _stencil_conv(x, disps, coeffs, grid):
    """Stencil application as ONE XLA convolution (TPU conv units + a
    single op instead of 5-27 shifted adds — the V-cycle is dispatch-
    overhead-bound on remote attachments). Real kernel, 32-bit, reach <= 1,
    2D/3D only; complex x decomposes into re/im convs."""
    ndim = len(grid)
    if jnp.iscomplexobj(x):
        return jax.lax.complex(
            _stencil_conv(jnp.real(x), disps, coeffs, grid),
            _stencil_conv(jnp.imag(x), disps, coeffs, grid))
    kern = np.zeros((3,) * ndim, np.float32)
    for d, c in zip(np.asarray(disps), coeffs):
        kern[tuple(int(dd) + 1 for dd in d)] = np.real(c)
    batch_shape = x.shape[: x.ndim - ndim]
    xb = x.reshape((-1, 1) + tuple(grid))
    dn = jax.lax.conv_dimension_numbers(
        xb.shape, (1, 1) + (3,) * ndim,
        ("NCHW", "OIHW", "NCHW") if ndim == 2
        else ("NCDHW", "OIDHW", "NCDHW"))
    # XLA convs are correlations (no kernel flip): kern[d] multiplies
    # x[i + d - 1] with SAME padding, exactly the zero-boundary stencil
    out = jax.lax.conv_general_dilated(
        xb, jnp.asarray(kern).reshape((1, 1) + kern.shape).astype(x.dtype),
        window_strides=(1,) * ndim, padding="SAME", dimension_numbers=dn)
    return out.reshape(batch_shape + tuple(grid))


def _conv_ok(x, disps, coeffs, grid):
    # Opt-in only: measured on the attached v5e, the conv realization gave
    # NO per-loop speedup and a weaker V-cycle (float32 conv rounding
    # degraded the filter contraction: 4 refinement loops instead of 2 at
    # 65k dof). The shifted-add path stays the default; the kernel is kept
    # behind FEAST_STENCIL_CONV=1 for hardware where convs win.
    import os
    if os.environ.get("FEAST_STENCIL_CONV", "0") != "1":
        return False
    return (len(grid) in (2, 3)
            and not np.iscomplexobj(np.asarray(coeffs))
            and np.abs(np.asarray(disps)).max(initial=0) <= 1
            and jnp.finfo(jnp.real(jnp.zeros((), x.dtype)).dtype).bits <= 32)


def apply_stencil(x, disps, coeffs, grid):
    """y = A x for a constant stencil, zero boundary.

    x: (..., n1, ..., nd) with the grid axes LAST (leading axes = batch).
    disps/coeffs: compile-time constants (tuples / numpy).
    """
    ndim = len(grid)
    if _conv_ok(x, disps, coeffs, grid):
        return _stencil_conv(x, disps, coeffs, grid)
    gaxes = tuple(range(x.ndim - ndim, x.ndim))
    y = jnp.zeros_like(x)
    for disp, c in zip(np.asarray(disps), coeffs):
        # shifted slice: y[i] += c * x[i + disp] (zero outside)
        src, dst = [], []
        ok = True
        for k, d in enumerate(disp):
            n = grid[k]
            d = int(d)
            if abs(d) >= n:
                ok = False
                break
            if d >= 0:
                src.append(slice(d, n))
                dst.append(slice(0, n - d))
            else:
                src.append(slice(0, n + d))
                dst.append(slice(-d, n))
        if not ok:
            continue
        pre = (slice(None),) * (x.ndim - ndim)
        y = y.at[pre + tuple(dst)].add(c * x[pre + tuple(src)])
    return y


def stencil_to_dense(st: GridStencil, dtype=None):
    """Materialize the stencil as a dense (N, N) matrix (coarse solves,
    tests)."""
    grid = st.grid
    N = int(np.prod(grid))
    strides = _strides(grid)
    dtype = dtype or st.coeffs.dtype
    A = np.zeros((N, N), dtype)
    idx = np.arange(N)
    coords = [idx // strides[k] % grid[k] for k in range(len(grid))]
    for disp, c in zip(st.disps, st.coeffs):
        valid = np.ones(N, bool)
        tgt_flat = idx.copy()
        for k, d in enumerate(disp):
            tgt = coords[k] + int(d)
            valid &= (tgt >= 0) & (tgt < grid[k])
            tgt_flat = tgt_flat + int(d) * strides[k]
        A[idx[valid], tgt_flat[valid]] += c
    return A


def _shift_ax(x, ax, d):
    """x shifted by d along axis ax, zero-filled (Dirichlet extension)."""
    n = x.shape[ax]
    sl_src = [slice(None)] * x.ndim
    sl_dst = [slice(None)] * x.ndim
    if d >= 0:
        sl_src[ax] = slice(d, n)
        sl_dst[ax] = slice(0, n - d)
    else:
        sl_src[ax] = slice(0, n + d)
        sl_dst[ax] = slice(-d, n)
    out = jnp.zeros_like(x)
    return out.at[tuple(sl_dst)].set(x[tuple(sl_src)])


def _restrict(x, ndim):
    """Adjoint (scaled x1/2 per axis) of the cell-centered LINEAR
    prolongation below: c_j = (0.25 f_{2j-1} + 0.75 f_{2j} + 0.75 f_{2j+1}
    + 0.25 f_{2j+2}) / 2, zero outside. Order-2 transfers — the
    piecewise-constant pool/repeat pair stalls V-cycle convergence on
    Poisson-class operators once hierarchies get deep (transfer order 1+1
    is only borderline for a 2nd-order PDE)."""
    for ax in range(x.ndim - ndim, x.ndim):
        n = x.shape[ax]
        if n % 2:
            pad = [(0, 0)] * x.ndim
            pad[ax] = (0, 1)
            x = jnp.pad(x, pad)
            n += 1
        fm1 = _shift_ax(x, ax, -1)     # f_{2j-1} at even positions
        fp2 = _shift_ax(x, ax, 2)      # f_{2j+2} at even positions
        fp1 = _shift_ax(x, ax, 1)      # f_{2j+1}
        comb = 0.25 * fm1 + 0.75 * x + 0.75 * fp1 + 0.25 * fp2
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, n, 2)
        x = 0.5 * comb[tuple(sl)]
    return x


def _prolong(x, fine_shape, ndim):
    """Cell-centered linear interpolation per axis, zero (Dirichlet)
    extension: f_{2j} = 0.75 c_j + 0.25 c_{j-1}, f_{2j+1} = 0.75 c_j +
    0.25 c_{j+1}; cropped to the fine shape."""
    for k, ax in enumerate(range(x.ndim - ndim, x.ndim)):
        cm = _shift_ax(x, ax, -1)
        cp = _shift_ax(x, ax, 1)
        f_even = 0.75 * x + 0.25 * cm
        f_odd = 0.75 * x + 0.25 * cp
        f = jnp.stack([f_even, f_odd], axis=ax + 1)
        shp = x.shape[:ax] + (2 * x.shape[ax],) + x.shape[ax + 1:]
        f = f.reshape(shp)
        nf = fine_shape[k]
        if f.shape[ax] != nf:
            sl = [slice(None)] * f.ndim
            sl[ax] = slice(0, nf)
            f = f[tuple(sl)]
        x = f
    return x


def coarsen_stencil(st: GridStencil) -> GridStencil:
    """Galerkin coarse stencil A_c = R A P, probed numerically.

    R/P are the 2x average-pool / nearest-repeat pair above; for a constant
    stencil the composite is again a constant stencil (displacements within
    +-2 after one level... still +-1 for the pool/repeat pair since pooling
    halves reach). Probe on a small grid: apply R A P to unit impulses at
    the center of a 9^d coarse grid and read off the stencil row.
    """
    ndim = len(st.grid)
    # probe grid must keep offsets in [-2, 2] around the center in range:
    # with probe_c=4 (grid dim exactly 8) a +2 displacement reads position
    # 4, out of range, silently dropping a coarse coefficient — floor at 5
    probe_c = tuple(min(9, max(5, (g + 1) // 2)) for g in st.grid)
    probe_f = tuple(2 * g for g in probe_c)
    center = tuple(g // 2 for g in probe_c)
    e = np.zeros(probe_c)
    e[center] = 1.0
    # the probe is host-side compile-time data even when this runs inside a
    # trace (drivers build V-cycle closures under jit/scan)
    with jax.ensure_compile_time_eval():
        ex = jnp.asarray(e.astype(st.coeffs.dtype))
        xf = _prolong(ex, probe_f, ndim)
        yf = apply_stencil(xf, st.disps, st.coeffs, probe_f)
        yc = np.asarray(_restrict(yf, ndim))
    disps, coeffs = [], []
    scale = max(np.abs(yc).max(), 1e-30)
    for off in itertools.product(range(-2, 3), repeat=ndim):
        pos = tuple(c + o for c, o in zip(center, off))
        if not all(0 <= p < g for p, g in zip(pos, probe_c)):
            continue
        v = yc[pos]
        if np.abs(v) > 1e-12 * scale:
            disps.append(off)
            coeffs.append(v)
    grid_c = tuple((g + 1) // 2 for g in st.grid)
    return GridStencil(np.asarray(disps, np.int64),
                       np.asarray(coeffs), grid_c)


def plan_mg_levels(stA: GridStencil, stB, re_max, *, coarse_budget=2048,
                   min_size=4, theta_samples=48):
    """Decide whether multigrid is FEASIBLE for shifts with Re z <= re_max,
    and how many levels to use. Returns level count (>= 2) or None.

    For a constant-coefficient pencil the (Fourier-)symbol eigenvalue of the
    grid mode with per-axis frequency theta is lam(theta) = symA/symB. The
    shifted operator z B - A flips sign on modes with lam < Re z; a V-cycle
    is only a convergent preconditioner if the COARSEST grid still resolves
    every flipped mode (the Helmholtz "kh small on the coarsest level" rule
    of complex-shifted-Laplacian multigrid). Each 2x coarsening doubles the
    effective frequency, so the coarsening depth is capped by
    log2((pi/2) / theta*), theta* = highest flipped frequency per axis.
    The coarsest level must also stay within the dense-solve budget; if the
    two constraints cannot meet, multigrid is rejected (caller falls back
    to Jacobi/plain Krylov)."""
    grid = stA.grid
    ndim = len(grid)
    ths = [np.linspace(np.pi / (g + 1), np.pi * g / (g + 1),
                       min(g, theta_samples)) for g in grid]
    TH = np.meshgrid(*ths, indexing="ij")
    symA = np.zeros(TH[0].shape, np.complex128)
    for disp, c in zip(stA.disps, stA.coeffs):
        phase = np.zeros(TH[0].shape)
        for k, d in enumerate(disp):
            phase = phase + float(d) * TH[k]
        symA = symA + c * np.exp(1j * phase)
    if stB is None:
        symB = np.ones(TH[0].shape)
    else:
        symB = np.zeros(TH[0].shape, np.complex128)
        for disp, c in zip(stB.disps, stB.coeffs):
            phase = np.zeros(TH[0].shape)
            for k, d in enumerate(disp):
                phase = phase + float(d) * TH[k]
            symB = symB + c * np.exp(1j * phase)
        symB = np.where(np.abs(symB) > 1e-12, symB, 1e-12)
    lam = np.real(symA) / np.real(np.where(np.abs(np.real(symB)) > 1e-12,
                                           symB, 1.0))
    flipped = lam < float(re_max)
    # levels needed so the coarse dense solve fits the budget
    need = 0
    g = list(grid)
    while np.prod(g) > coarse_budget and min(g) > min_size:
        g = [(x + 1) // 2 for x in g]
        need += 1
    if np.prod(g) > coarse_budget:
        return None
    if flipped.all() or not flipped.any():
        # definite shifted operator (z beyond either end of the spectrum):
        # classic multigrid regime, coarsen as deep as sizes allow
        cap = need
        while all((x + 1) // 2 >= min_size for x in g) and cap < 12:
            g = [(x + 1) // 2 for x in g]
            cap += 1
        return max(cap, need) + 1
    cap = min(
        int(np.floor(np.log2((np.pi / 2) / max(float(TH[k][flipped].max()),
                                               1e-9))))
        for k in range(ndim))
    s_max, gs = 0, list(grid)
    while min(gs) >= 2 * min_size:
        gs = [(x + 1) // 2 for x in gs]
        s_max += 1
    cap = min(cap, s_max)
    if cap < max(need, 1):
        return None          # cannot both resolve flipped modes and fit budget
    # use the SHALLOWEST hierarchy the dense-solve budget allows: every
    # extra level halves the coarse grid's resolution of the flipped modes,
    # which is exactly what limits V-cycle quality at contour nodes near
    # the spectrum's search edge (observed: edge-node solves stall an order
    # of magnitude earlier per extra level)
    return max(need, 1) + 1


def _stencil_levels(stA: GridStencil, stB, min_size=8, max_levels=12,
                    n_levels=None):
    """Host-side level hierarchy [(stA_l, stB_l), ...] finest first."""
    levels = [(stA, stB)]
    if n_levels is not None:
        while len(levels) < n_levels:
            a, b = levels[-1]
            levels.append((coarsen_stencil(a),
                           coarsen_stencil(b) if b is not None else None))
        return levels
    while (min(levels[-1][0].grid) > min_size
           and int(np.prod(levels[-1][0].grid)) > 4 * min_size ** 2
           and len(levels) < max_levels):
        a, b = levels[-1]
        levels.append((coarsen_stencil(a),
                       coarsen_stencil(b) if b is not None else None))
    return levels


def make_shifted_vcycle(stA: GridStencil, stB, z, *, nu_pre=2, nu_post=2,
                        omega=0.8, dtype=jnp.complex64, n_cycles=1,
                        n_levels=None):
    """vcycle(X: (N, K)) -> approximate (z B - A)^{-1} X.

    z may be a traced scalar (it enters only via scalar stencil
    combinations and the dense coarse solve, re-factored per call site —
    callers should build this closure once per contour node).
    stB=None means B = I. n_levels (from plan_mg_levels) bounds the depth
    for indefinite shifts; default: coarsen while sizes allow.
    """
    levels = _stencil_levels(stA, stB, n_levels=n_levels)
    ndim = len(stA.grid)
    z = jnp.asarray(z, dtype)

    def shifted_apply(x, a, b, grid):
        Ax = apply_stencil(x, a.disps, a.coeffs.astype(dtype), grid)
        Bx = x if b is None else apply_stencil(
            x, b.disps, b.coeffs.astype(dtype), grid)
        return z * Bx - Ax

    def shifted_diag(a, b):
        ca = 0.0
        for disp, c in zip(a.disps, a.coeffs):
            if not np.any(disp):
                ca = c
        cb = 1.0
        if b is not None:
            cb = 0.0
            for disp, c in zip(b.disps, b.coeffs):
                if not np.any(disp):
                    cb = c
        # numpy scalars are strongly typed — cast, or they promote the whole
        # V-cycle to complex128
        return z * jnp.asarray(cb, dtype) - jnp.asarray(ca, dtype)

    # coarsest-level dense operator: z * Bc - Ac (factored per closure use)
    aC, bC = levels[-1]
    # convert constants in NUMPY: an on-device c128->c64 convert is
    # unimplemented in the TPU constant folder
    np_dt = np.dtype(jnp.dtype(dtype).name)
    Ac = jnp.asarray(stencil_to_dense(aC).astype(np_dt))
    Bc = (jnp.eye(Ac.shape[0], dtype=dtype) if bC is None else
          jnp.asarray(stencil_to_dense(bC).astype(np_dt)))
    Sc = z * Bc - Ac
    coarse_lu = jax.scipy.linalg.lu_factor(Sc)

    def level_solve(l, r):
        """V-cycle on level l for S_l e = r; r has grid axes last."""
        a, b = levels[l]
        grid = a.grid
        if l == len(levels) - 1:
            Nc = int(np.prod(grid))
            rf = r.reshape(r.shape[:-ndim] + (Nc,))
            # batched dense solve: (..., Nc) -> move batch to columns
            sol = jax.scipy.linalg.lu_solve(coarse_lu, rf[..., None])[..., 0] \
                if rf.ndim == 1 else \
                jnp.moveaxis(jax.scipy.linalg.lu_solve(
                    coarse_lu, jnp.moveaxis(rf, 0, -1)), -1, 0)
            return sol.reshape(r.shape)
        d = shifted_diag(a, b)
        x = jnp.zeros_like(r)
        for _ in range(nu_pre):
            res = r - shifted_apply(x, a, b, grid)
            x = x + (omega / d) * res
        res = r - shifted_apply(x, a, b, grid)
        rc = _restrict(res, ndim)
        ec = level_solve(l + 1, rc)
        x = x + _prolong(ec, grid, ndim)
        for _ in range(nu_post):
            res = r - shifted_apply(x, a, b, grid)
            x = x + (omega / d) * res
        return x

    grid0 = stA.grid
    N = int(np.prod(grid0))

    def vcycle(X):
        # X: (N, K) columns -> (K, n1, ..., nd) batch-leading grid layout
        K = X.shape[1]
        xg = X.T.reshape((K,) + grid0).astype(dtype)
        out = jnp.zeros_like(xg)
        for _ in range(n_cycles):
            res = xg - shifted_apply(out, levels[0][0], levels[0][1], grid0)
            out = out + level_solve(0, res)
        return out.reshape(K, N).T.astype(X.dtype)

    return vcycle
