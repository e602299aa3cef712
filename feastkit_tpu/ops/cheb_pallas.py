"""Fused Chebyshev-recurrence step in double-single arithmetic (Pallas TPU).

The polynomial-filter FEAST path (ops/chebfilter.py, ``solver="cheb"``)
spends its final refinement loops running the three-term recurrence

    T2 = 2 (sc * A @ T1 - sh * T1) - T0,    acc += c_k * T2

in float64. On TPU, f64 is software-emulated by XLA (double-single
arithmetic compiled per scalar op), each DIA matvec re-reads the operand
once per diagonal, and the recurrence/accumulator updates are separate
fusions — measured ~4.5x the cost of the f32 loops. This kernel removes
both overheads at once:

* **double-single ("DS") arithmetic by hand**: every vector is carried as
  an (hi, lo) pair of f32 planes with |lo| <= ulp(hi)/2, giving ~2^-49
  effective precision (the filter only needs the per-application rounding
  noise below the target residual ~1e-10; true f64's 2^-52 is surplus).
  Only the VECTOR arithmetic needs error-free transformations: rounding
  the scalars sc/sh/c_k merely perturbs which polynomial in A is applied —
  still an exact polynomial in A, hence exactly shares A's eigenvectors —
  while rounding the matrix DIAGONALS would perturb A itself, so the
  diagonals are the one operand also carried as a DS pair.
* **one fused kernel per step**: the DIA matvec (static shifted reads, no
  gather), the three-term update, and the accumulator update run in one
  VMEM-resident pass; T0/acc are aliased in/out (the recurrence's natural
  memory pattern), so the step moves 14 f32 planes instead of the ~20+
  the unfused XLA f64 path streams.

Layout: TRANSPOSED (M, N) with the lane (minor) dimension along the
operator rows. M0 ~ 72 subspace columns would otherwise be padded to the
128-lane DMA granularity (1.8x traffic waste); transposed, the sublane
dimension only pads to 8 and the huge N dimension carries the 128
alignment for free. The halo needed by the shifted reads is one lane
block: state arrays are (Mp, N_tot = N_pad + 2*block) with the data at
lanes [block, block+N), and grid step j reads T1 blocks {j, j+1, j+2}
(BlockSpec-pipelined) while writing T2/acc at block j+1. Margins hold
zeros and are never written (aliasing preserves them), which keeps every
shifted read in range with no masking.

No reference counterpart (FeastKit.jl is contour-only and runs on CPU
LAPACK/UMFPACK); the DS formulation follows the classical Dekker/Knuth
error-free transformations (TwoSum / Split / TwoProd).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:                                  # pragma: no cover
    _PALLAS_OK = False

__all__ = [
    "ds_split", "cheb_plan", "cheb_plan_fits", "pack_state",
    "unpack_state", "pack_diags", "cheb_ds_chunk", "cheb_ds_step_reference",
    "pack_state32", "unpack_state32", "pack_diags32", "cheb_f32_chunk",
]


# ---------------------------------------------------------------- DS math
# Error-free transformations on f32 (Dekker/Knuth). All jnp-generic:
# usable inside a Pallas kernel (VPU elementwise) and as the pure-XLA
# reference implementation.

_SPLITTER = np.float32(4097.0)        # 2^12 + 1 for binary32


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _fast_two_sum(a, b):              # requires |a| >= |b|
    s = a + b
    return s, b - (s - a)


def _split32(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split32(a)
    bh, bl = _split32(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _ds_add(xh, xl, yh, yl):
    """(x) + (y), sloppy renormalization (error O(u^2) relative — ample:
    the recurrence only needs ~2^-45)."""
    s, e = _two_sum(xh, yh)
    return _fast_two_sum(s, e + (xl + yl))


def _ds_mul_f32(xh, xl, c):
    """(x) * c for a plain-f32 scalar/array c."""
    p, e = _two_prod(xh, c)
    return _fast_two_sum(p, e + xl * c)


def _ds_mul_ds(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    return _fast_two_sum(p, e + (xh * yl + xl * yh))


def ds_split(x64):
    """f64 array -> (hi, lo) f32 planes with hi + lo == fl64(x) to ~2^-49."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


# ------------------------------------------------------------------ plan

def cheb_plan(offsets, N, M):
    """Static layout plan. block = lane block = halo (one-block halo keeps
    every BlockSpec index integral); both 128-aligned for the DMA lane
    granularity."""
    max_off = max((abs(int(d)) for d in offsets), default=1)
    block = max(256, -(-max_off // 128) * 128)
    n_blocks = -(-N // block)
    N_pad = n_blocks * block
    Mp = -(-M // 8) * 8
    return dict(block=block, n_blocks=n_blocks, N_pad=N_pad,
                N_tot=N_pad + 2 * block, Mp=Mp,
                offsets=tuple(int(d) for d in offsets))


def cheb_plan_fits(offsets, N, M, *, ds=True, vmem_budget=12 << 20):
    """True when the fused kernel's VMEM working set fits. block = halo =
    the largest |offset| (128-rounded): a 3D Laplacian's +-nx^2 offsets
    force multi-MB lane blocks whose double-buffered f32 planes exceed the
    ~16 MB VMEM — those operators take the unfused chunked path instead
    (correct, just not fused). Plane count per grid step: the DS kernel
    holds 14 (Mp, block) state planes + 2 (nd, block) diagonal planes,
    the f32 kernel 7 + 1; x2 for the pipeline's double buffering."""
    plan = cheb_plan(offsets, N, M)
    nd = len(plan["offsets"])
    rows = (14 * plan["Mp"] + 2 * nd) if ds else (7 * plan["Mp"] + nd)
    return 2 * rows * plan["block"] * 4 <= vmem_budget


def pack_state(X64, plan):
    """(N, M) f64 -> two (Mp, N_tot) f32 planes (transposed, margins 0)."""
    N, M = X64.shape
    Xt = jnp.swapaxes(X64, 0, 1)
    buf = jnp.zeros((plan["Mp"], plan["N_tot"]), jnp.float64)
    buf = jax.lax.dynamic_update_slice(buf, Xt, (0, plan["block"]))
    return ds_split(buf)


def unpack_state(hi, lo, N, M, plan):
    """(hi, lo) planes -> (N, M) f64."""
    b = plan["block"]
    buf = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    return jnp.swapaxes(buf[:M, b:b + N], 0, 1)


def pack_diags(dia64, plan):
    """(nd, N) f64 row-aligned diagonals -> (nd, N_tot) f32 DS planes."""
    nd, N = dia64.shape
    buf = jnp.zeros((nd, plan["N_tot"]), jnp.float64)
    buf = jax.lax.dynamic_update_slice(buf, dia64, (0, plan["block"]))
    return ds_split(buf)


def pack_state32(X, plan):
    """(N, M) real -> one (Mp, N_tot) f32 plane (transposed, margins 0)."""
    Xt = jnp.swapaxes(X.astype(jnp.float32), 0, 1)
    buf = jnp.zeros((plan["Mp"], plan["N_tot"]), jnp.float32)
    return jax.lax.dynamic_update_slice(buf, Xt, (0, plan["block"]))


def unpack_state32(buf, N, M, plan):
    b = plan["block"]
    return jnp.swapaxes(buf[:M, b:b + N], 0, 1)


def pack_diags32(dia, plan):
    nd, N = dia.shape
    buf = jnp.zeros((nd, plan["N_tot"]), jnp.float32)
    return jax.lax.dynamic_update_slice(buf, dia.astype(jnp.float32),
                                        (0, plan["block"]))


# ---------------------------------------------------------------- kernel

def _shifted(left, center, right, off, block):
    """Lanes [block+off, 2*block+off) of the 3-block slab, without
    materializing the concatenation (spans at most two refs). Zero-width
    pieces (|off| == block, e.g. a Laplacian's +-n offset with n <= the
    128-aligned block) must be skipped: Mosaic rejects 0-size vectors."""
    if off == 0:
        return center
    if off > 0:
        if off >= block:
            return right
        return jnp.concatenate(
            [center[:, off:], right[:, :off]], axis=1)
    if -off >= block:
        return left
    return jnp.concatenate(
        [left[:, block + off:], center[:, :block + off]], axis=1)


def _cheb_ds_kernel(scal_ref, dgh_ref, dgl_ref,
                    t0h_ref, t0l_ref, ach_ref, acl_ref,
                    x1h_l, x1h_c, x1h_r, x1l_l, x1l_c, x1l_r,
                    t2h_ref, t2l_ref, a2h_ref, a2l_ref,
                    *, offsets, block):
    sc = scal_ref[0, 0]
    sh = scal_ref[0, 1]
    ck = scal_ref[0, 2]
    hl, hc, hr = x1h_l[...], x1h_c[...], x1h_r[...]
    ll, lc, lr = x1l_l[...], x1l_c[...], x1l_r[...]
    # y = A @ T1 over the static diagonal offsets (DS)
    yh = jnp.zeros(t0h_ref.shape, jnp.float32)
    yl = jnp.zeros(t0h_ref.shape, jnp.float32)
    for k, off in enumerate(offsets):
        xh = _shifted(hl, hc, hr, off, block)
        xl = _shifted(ll, lc, lr, off, block)
        dh = dgh_ref[k, :][None, :]
        dl = dgl_ref[k, :][None, :]
        th, tl = _ds_mul_ds(xh, xl, jnp.broadcast_to(dh, xh.shape),
                            jnp.broadcast_to(dl, xh.shape))
        yh, yl = _ds_add(yh, yl, th, tl)
    # T2 = 2*(sc*y - sh*T1) - T0  (the x2 is exact in binary fp)
    ah, al = _ds_mul_f32(yh, yl, sc)
    bh, bl = _ds_mul_f32(hc, lc, -sh)
    ah, al = _ds_add(ah, al, bh, bl)
    t2h, t2l = _ds_add(2.0 * ah, 2.0 * al, -t0h_ref[...], -t0l_ref[...])
    t2h_ref[...] = t2h
    t2l_ref[...] = t2l
    # acc += ck * T2
    ch, cl = _ds_mul_f32(t2h, t2l, ck)
    a2h, a2l = _ds_add(ach_ref[...], acl_ref[...], ch, cl)
    a2h_ref[...] = a2h
    a2l_ref[...] = a2l


def _cheb_ds_step(scal, dgh, dgl, t0h, t0l, ach, acl, t1h, t1l,
                  *, offsets, block, n_blocks, interpret):
    Mp, N_tot = t0h.shape
    blk = lambda i_off: pl.BlockSpec(       # noqa: E731
        (Mp, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    dblk = lambda: pl.BlockSpec(            # noqa: E731
        (dgh.shape[0], block), lambda j: (0, j + 1),
        memory_space=pltpu.VMEM)
    t2h, t2l, a2h, a2l = pl.pallas_call(
        functools.partial(_cheb_ds_kernel, offsets=offsets, block=block),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # scalars
            dblk(), dblk(),                              # diag DS planes
            blk(1), blk(1), blk(1), blk(1),              # T0, acc
            blk(0), blk(1), blk(2),                      # T1 hi 3-slab
            blk(0), blk(1), blk(2),                      # T1 lo 3-slab
        ],
        out_specs=[blk(1), blk(1), blk(1), blk(1)],
        out_shape=[jax.ShapeDtypeStruct((Mp, N_tot), jnp.float32)] * 4,
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        interpret=interpret,
    )(scal, dgh, dgl, t0h, t0l, ach, acl,
      t1h, t1h, t1h, t1l, t1l, t1l)
    return t2h, t2l, a2h, a2l


def cheb_ds_chunk(dgh, dgl, carry, coeffs_chunk, sc, sh, *, plan,
                  interpret=False):
    """Advance the DS recurrence over one coefficient chunk.

    carry = (t0h, t0l, t1h, t1l, ach, acl) in the packed transposed
    layout; coeffs_chunk is a (steps,) f32 array (zero-padded tails are
    exact no-ops on acc and the discarded T carry). Traced with x64 OFF
    (all-f32 data; Mosaic cannot legalize i64 grid indices)."""
    offsets = plan["offsets"]
    block, n_blocks = plan["block"], plan["n_blocks"]

    def body(c, ck):
        t0h, t0l, t1h, t1l, ach, acl = c
        scal = jnp.stack([jnp.float32(sc), jnp.float32(sh),
                          ck.astype(jnp.float32), jnp.float32(0)])[None, :]
        t2h, t2l, a2h, a2l = _cheb_ds_step(
            scal, dgh, dgl, t0h, t0l, ach, acl, t1h, t1l,
            offsets=offsets, block=block, n_blocks=n_blocks,
            interpret=interpret)
        return (t1h, t1l, t2h, t2l, a2h, a2l), None

    with jax.enable_x64(False):
        carry, _ = jax.lax.scan(body, carry, coeffs_chunk)
    return carry


# -------------------------------------------------------- f32 variant

def _cheb_f32_kernel(scal_ref, dg_ref, t0_ref, ac_ref, x_l, x_c, x_r,
                     t2_ref, a2_ref, *, offsets, block):
    """Plain-f32 fused step: same structure as the DS kernel, one plane
    per vector — DIA matvec + three-term update + accumulator update in a
    single VMEM pass (5 planes of traffic vs the ~7 the unfused XLA path
    streams per step)."""
    sc = scal_ref[0, 0]
    sh = scal_ref[0, 1]
    ck = scal_ref[0, 2]
    xl, xc, xr = x_l[...], x_c[...], x_r[...]
    y = jnp.zeros(t0_ref.shape, jnp.float32)
    for k, off in enumerate(offsets):
        y = y + dg_ref[k, :][None, :] * _shifted(xl, xc, xr, off, block)
    t2 = 2.0 * (sc * y - sh * xc) - t0_ref[...]
    t2_ref[...] = t2
    a2_ref[...] = ac_ref[...] + ck * t2


def _cheb_f32_step(scal, dg, t0, ac, t1, *, offsets, block, n_blocks,
                   interpret):
    Mp, N_tot = t0.shape
    blk = lambda i_off: pl.BlockSpec(       # noqa: E731
        (Mp, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    t2, a2 = pl.pallas_call(
        functools.partial(_cheb_f32_kernel, offsets=offsets, block=block),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((dg.shape[0], block), lambda j: (0, j + 1),
                         memory_space=pltpu.VMEM),
            blk(1), blk(1),                  # T0, acc
            blk(0), blk(1), blk(2),          # T1 3-slab
        ],
        out_specs=[blk(1), blk(1)],
        out_shape=[jax.ShapeDtypeStruct((Mp, N_tot), jnp.float32)] * 2,
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(scal, dg, t0, ac, t1, t1, t1)
    return t2, a2


def cheb_f32_chunk(dg, carry, coeffs_chunk, sc, sh, *, plan,
                   interpret=False):
    """Advance the f32 recurrence over one coefficient chunk; carry =
    (t0, t1, ac) packed planes."""
    offsets = plan["offsets"]
    block, n_blocks = plan["block"], plan["n_blocks"]

    def body(c, ck):
        t0, t1, ac = c
        scal = jnp.stack([jnp.float32(sc), jnp.float32(sh),
                          ck.astype(jnp.float32), jnp.float32(0)])[None, :]
        t2, a2 = _cheb_f32_step(scal, dg, t0, ac, t1, offsets=offsets,
                                block=block, n_blocks=n_blocks,
                                interpret=interpret)
        return (t1, t2, a2), None

    with jax.enable_x64(False):
        carry, _ = jax.lax.scan(body, carry, coeffs_chunk)
    return carry


# ------------------------------------------------------------- reference

def cheb_ds_step_reference(dia64, T0, T1, acc, sc, sh, ck):
    """Pure-XLA f64 oracle of one fused step on (N, M) arrays (tests)."""
    from .pallas_kernels import dia_matvec_reference
    y = dia_matvec_reference(dia64[0], T1, dia64[1])
    T2 = 2.0 * (sc * y - sh * T1) - T0
    return T2, acc + ck * T2
