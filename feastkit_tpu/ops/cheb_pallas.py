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
    # v5e VMEM is 128 MB; Mosaic's default scoped budget (16 MB) rejects
    # large-M0 generalized working sets the hardware holds comfortably
    # (1M-dof consistent-mass DS kernel: 17 MB) — raise the per-kernel cap
    _CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
except Exception:                                  # pragma: no cover
    _PALLAS_OK = False
    _CPARAMS = None

__all__ = [
    "ds_split", "cheb_plan", "cheb_plan_fits", "pack_state",
    "unpack_state", "pack_diags", "cheb_ds_chunk", "cheb_ds_step_reference",
    "pack_state32", "unpack_state32", "pack_diags32", "cheb_f32_chunk",
    "cheb_ds2_chunk", "cheb_f32_2_chunk", "cheb_ds4_chunk",
    "cheb_f32_4_chunk", "cheb_gen_plan",
    "cheb_gen_plan_fits", "cheb_gen_chunk", "cheb_gen_init",
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

def cheb_plan(offsets, N, M, margin=1):
    """Static layout plan. block = lane block = halo (one-block halo keeps
    every BlockSpec index integral); both 128-aligned for the DMA lane
    granularity. ``margin`` is the number of zero blocks padding EACH side
    of the data lanes: 1 for the single-step kernels (shifted reads reach
    one block), 2 for the two-step-fused kernels (the intermediate level's
    shifted reads extend the reach to two blocks)."""
    max_off = max((abs(int(d)) for d in offsets), default=1)
    block = max(256, -(-max_off // 128) * 128)
    n_blocks = -(-N // block)
    N_pad = n_blocks * block
    Mp = -(-M // 8) * 8
    return dict(block=block, n_blocks=n_blocks, N_pad=N_pad,
                N_tot=N_pad + 2 * margin * block, Mp=Mp, margin=margin,
                offsets=tuple(int(d) for d in offsets))


def _margin(plan):
    return int(plan.get("margin", 1))


def _grid_1step(plan):
    """Grid count for the single-step kernels on a margin-m layout: write
    centers are blocks 1..n_blocks+2(m-1), covering all data blocks (the
    extra margin centers compute exact zeros from zero inputs)."""
    return plan["n_blocks"] + 2 * (_margin(plan) - 1)


def cheb_plan_fits(offsets, N, M, *, ds=True, steps=1,
                   vmem_budget=32 << 20):
    """True when the fused kernel's VMEM working set fits. block = halo =
    the largest |offset| (128-rounded): a 3D Laplacian's +-nx^2 offsets
    force multi-MB lane blocks whose double-buffered f32 planes exceed the
    ~16 MB VMEM — those operators take the unfused chunked path instead
    (correct, just not fused). Plane count per grid step: the DS kernel
    holds 14 (Mp, block) state planes + 2 (nd, block) diagonal planes,
    the f32 kernel 7 + 1; x2 for the pipeline's double buffering. The
    two-step kernels (steps=2) trade slab re-reads for VMEM scratch
    rings: DS 12 ring + 12 in + 12 out planes (+ 8 diag rows), f32 6 + 6
    + 6 (+ 4). The four-step kernels (steps=4) stretch the rings to 13
    block slots: DS 26 ring + 12 in + 12 out (+ 16 diag rows), f32 13 +
    6 + 6 (+ 8)."""
    plan = cheb_plan(offsets, N, M)
    nd = len(plan["offsets"])
    if steps == 4:
        rows = (50 * plan["Mp"] + 16 * nd) if ds else (25 * plan["Mp"]
                                                       + 8 * nd)
        return rows * plan["block"] * 4 <= vmem_budget
    if steps == 2:
        rows = (36 * plan["Mp"] + 8 * nd) if ds else (18 * plan["Mp"]
                                                      + 4 * nd)
        return rows * plan["block"] * 4 <= vmem_budget
    rows = (14 * plan["Mp"] + 2 * nd) if ds else (7 * plan["Mp"] + nd)
    return 2 * rows * plan["block"] * 4 <= vmem_budget


def pack_state(X64, plan):
    """(N, M) f64 -> two (Mp, N_tot) f32 planes (transposed, margins 0)."""
    N, M = X64.shape
    Xt = jnp.swapaxes(X64, 0, 1)
    buf = jnp.zeros((plan["Mp"], plan["N_tot"]), jnp.float64)
    buf = jax.lax.dynamic_update_slice(
        buf, Xt, (0, _margin(plan) * plan["block"]))
    return ds_split(buf)


def unpack_state(hi, lo, N, M, plan):
    """(hi, lo) planes -> (N, M) f64."""
    b = _margin(plan) * plan["block"]
    buf = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    return jnp.swapaxes(buf[:M, b:b + N], 0, 1)


def pack_diags(dia64, plan):
    """(nd, N) f64 row-aligned diagonals -> (nd, N_tot) f32 DS planes."""
    nd, N = dia64.shape
    buf = jnp.zeros((nd, plan["N_tot"]), jnp.float64)
    buf = jax.lax.dynamic_update_slice(
        buf, dia64, (0, _margin(plan) * plan["block"]))
    return ds_split(buf)


def pack_state32(X, plan):
    """(N, M) real -> one (Mp, N_tot) f32 plane (transposed, margins 0)."""
    Xt = jnp.swapaxes(X.astype(jnp.float32), 0, 1)
    buf = jnp.zeros((plan["Mp"], plan["N_tot"]), jnp.float32)
    return jax.lax.dynamic_update_slice(
        buf, Xt, (0, _margin(plan) * plan["block"]))


def unpack_state32(buf, N, M, plan):
    b = _margin(plan) * plan["block"]
    return jnp.swapaxes(buf[:M, b:b + N], 0, 1)


def pack_diags32(dia, plan):
    nd, N = dia.shape
    buf = jnp.zeros((nd, plan["N_tot"]), jnp.float32)
    return jax.lax.dynamic_update_slice(
        buf, dia.astype(jnp.float32),
        (0, _margin(plan) * plan["block"]))


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
        compiler_params=_CPARAMS,
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
    block, n_blocks = plan["block"], _grid_1step(plan)

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


# ------------------------------------------------- two-step DS variant
#
# The 1-step kernel's BlockSpec 3-slab fetches every T1 block THREE times
# (as left/center/right of successive grid steps): 14 f32 planes of HBM
# traffic per recurrence step. TPU grid iterations execute sequentially,
# so revolving VMEM scratch rings can hold the trailing blocks instead:
# each T1 block is fetched ONCE, the intermediate level T2 never touches
# HBM except as the carry, and two recurrence steps share one pass —
# 12 planes per TWO steps (T0+T1+acc in, T2+T3+acc out), i.e. 6/step,
# a 2.33x traffic cut on the HBM-bound recurrence. Requires the margin-2
# layout (the fused double step reaches two blocks); grid covers
# n_blocks+2 centers (the two margin centers compute exact zeros).
#
# Ring discipline at grid step j (output center = block j):
#   r1 = T1 blocks [j, j+1, j+2]   (fresh fetch j+2, rotate left)
#   r2 = T2 blocks [j-1, j, j+1]   (computed this step: j+1)
#   T2[j+1] from r1 slabs + diag block j+1 + T0 block j+1 (fresh)
#   T3[j]   from r2 slabs + diag block j   + T1 block j (= r1[0])
#   acc[j] += ck0 T2[j] + ck1 T3[j]; write T2[j] (= r2[1]) and T3[j]
# Outputs alias inputs (T0->T2, T1->T3, acc->acc): the never-written
# right-margin blocks stay zero, which the next chunk's fresh fetches
# rely on.


def _cheb_ds2_kernel(scal_ref, d0h_ref, d0l_ref, d1h_ref, d1l_ref,
                     t0h_ref, t0l_ref, t1h_ref, t1l_ref, ach_ref, acl_ref,
                     t2h_o, t2l_o, t3h_o, t3l_o, a2h_o, a2l_o,
                     r1h, r1l, r2h, r2l, *, offsets, block):
    j = pl.program_id(0)
    sc = scal_ref[0, 0]
    sh = scal_ref[0, 1]
    ck0 = scal_ref[0, 2]
    ck1 = scal_ref[0, 3]

    @pl.when(j == 0)
    def _zero_rings():
        for r in (r1h, r1l, r2h, r2l):
            r[...] = jnp.zeros(r.shape, jnp.float32)

    # advance the T1 ring to [j, j+1, j+2] (fresh block j+2)
    r1h[0], r1l[0] = r1h[1], r1l[1]
    r1h[1], r1l[1] = r1h[2], r1l[2]
    r1h[2], r1l[2] = t1h_ref[...], t1l_ref[...]

    def ds_matvec(dh_ref, dl_ref, xl3, xc3, xr3):
        (hl, ll), (hc, lc), (hr, lr) = xl3, xc3, xr3
        yh = jnp.zeros(t0h_ref.shape, jnp.float32)
        yl = jnp.zeros(t0h_ref.shape, jnp.float32)
        for k, off in enumerate(offsets):
            xh = _shifted(hl, hc, hr, off, block)
            xl = _shifted(ll, lc, lr, off, block)
            dh = dh_ref[k, :][None, :]
            dl = dl_ref[k, :][None, :]
            th, tl = _ds_mul_ds(xh, xl, jnp.broadcast_to(dh, xh.shape),
                                jnp.broadcast_to(dl, xh.shape))
            yh, yl = _ds_add(yh, yl, th, tl)
        return yh, yl

    def step(yh, yl, ch, cl, ph, plo):
        # 2*(sc*y - sh*center) - prev
        ah, al = _ds_mul_f32(yh, yl, sc)
        bh, bl = _ds_mul_f32(ch, cl, -sh)
        ah, al = _ds_add(ah, al, bh, bl)
        return _ds_add(2.0 * ah, 2.0 * al, -ph, -plo)

    # T2 at block j+1
    yh, yl = ds_matvec(d1h_ref, d1l_ref,
                       (r1h[0], r1l[0]), (r1h[1], r1l[1]),
                       (r1h[2], r1l[2]))
    t2h, t2l = step(yh, yl, r1h[1], r1l[1], t0h_ref[...], t0l_ref[...])
    # advance the T2 ring to [j-1, j, j+1]
    r2h[0], r2l[0] = r2h[1], r2l[1]
    r2h[1], r2l[1] = r2h[2], r2l[2]
    r2h[2], r2l[2] = t2h, t2l

    # T3 at block j
    yh, yl = ds_matvec(d0h_ref, d0l_ref,
                       (r2h[0], r2l[0]), (r2h[1], r2l[1]),
                       (r2h[2], r2l[2]))
    gch, gcl = r2h[1], r2l[1]                       # T2 block j
    t3h, t3l = step(yh, yl, gch, gcl, r1h[0], r1l[0])

    t2h_o[...], t2l_o[...] = gch, gcl
    t3h_o[...], t3l_o[...] = t3h, t3l
    # acc[j] += ck0 * T2[j] + ck1 * T3[j]
    p0h, p0l = _ds_mul_f32(gch, gcl, ck0)
    p1h, p1l = _ds_mul_f32(t3h, t3l, ck1)
    sh_, sl_ = _ds_add(ach_ref[...], acl_ref[...], p0h, p0l)
    a2h, a2l = _ds_add(sh_, sl_, p1h, p1l)
    a2h_o[...], a2l_o[...] = a2h, a2l


def _cheb_ds2_step(scal, dgh, dgl, t0h, t0l, ach, acl, t1h, t1l,
                   *, offsets, block, grid_n, interpret):
    Mp, N_tot = t0h.shape
    nd = dgh.shape[0]
    blk = lambda i_off: pl.BlockSpec(        # noqa: E731
        (Mp, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    dblk = lambda i_off: pl.BlockSpec(       # noqa: E731
        (nd, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((3, Mp, block), jnp.float32)] * 4
    t2h, t2l, t3h, t3l, a2h, a2l = pl.pallas_call(
        functools.partial(_cheb_ds2_kernel, offsets=offsets, block=block),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
            dblk(0), dblk(0),                        # diag at block j
            dblk(1), dblk(1),                        # diag at block j+1
            blk(1), blk(1),                          # T0 at j+1
            blk(2), blk(2),                          # T1 fresh at j+2
            blk(0), blk(0),                          # acc at j
        ],
        out_specs=[blk(0)] * 6,
        out_shape=[jax.ShapeDtypeStruct((Mp, N_tot), jnp.float32)] * 6,
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3, 9: 4, 10: 5},
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_CPARAMS,
    )(scal, dgh, dgl, dgh, dgl, t0h, t0l, t1h, t1l, ach, acl)
    return t2h, t2l, t3h, t3l, a2h, a2l


def cheb_ds2_chunk(dgh, dgl, carry, coeffs_chunk, sc, sh, *, plan,
                   interpret=False):
    """Advance the DS recurrence TWO steps per fused kernel pass.

    Requires a margin-2 plan; coeffs_chunk must have EVEN length (the
    shared chunk runner rounds the static chunk length to even and
    zero-pads only the final chunk). Runs on any margin >= 2 layout
    (write centers cover n_blocks + margin blocks; margin centers compute
    exact zeros from the zero-diag padding)."""
    assert _margin(plan) >= 2, "cheb_ds2_chunk requires margin >= 2"
    offsets = plan["offsets"]
    block = plan["block"]
    grid_n = plan["n_blocks"] + _margin(plan)
    pairs = coeffs_chunk.reshape(-1, 2)

    def body(c, ck):
        t0h, t0l, t1h, t1l, ach, acl = c
        scal = jnp.stack([jnp.float32(sc), jnp.float32(sh),
                          ck[0].astype(jnp.float32),
                          ck[1].astype(jnp.float32)])[None, :]
        t2h, t2l, t3h, t3l, a2h, a2l = _cheb_ds2_step(
            scal, dgh, dgl, t0h, t0l, ach, acl, t1h, t1l,
            offsets=offsets, block=block, grid_n=grid_n,
            interpret=interpret)
        return (t2h, t2l, t3h, t3l, a2h, a2l), None

    with jax.enable_x64(False):
        carry, _ = jax.lax.scan(body, carry, pairs)
    return carry


# ------------------------------------------------ four-step DS variant
#
# Same revolving-ring discipline as the two-step kernel, two levels
# deeper: FOUR recurrence steps share one pass over the state, so the
# 12 planes of carry traffic (T0+T1+acc in, T4+T5+acc out) amortize over
# four steps — 3 planes/step, another 2x cut over the two-step kernel's
# 6. The rings stretch to 13 block slots (T1: 3, T2: 4, T3: 3, T4: 3);
# cheb_plan_fits(steps=4) gates on the VMEM working set.
#
# Ring discipline at grid step j (output center = block j):
#   r1 = T1 [j+2, j+3, j+4]  (fresh fetch j+4)
#   T2[j+3] from r1 slab + diag j+3 + T0[j+3] (fresh);  r2 = T2 [j..j+3]
#   T3[j+2] from r2[1:] slab + diag j+2 + T1[j+2] (=r1[0]); r3 = T3 [j..j+2]
#   T4[j+1] from r3 slab + diag j+1 + T2[j+1] (=r2[1]); r4 = T4 [j-1..j+1]
#   T5[j]   from r4 slab + diag j   + T3[j]   (=r3[0])
#   acc[j] += ck0 T2[j] + ck1 T3[j] + ck2 T4[j] + ck3 T5[j]
#   write T4[j] (= r4[1]) and T5[j]
# Requires margin >= 4 (the lookahead reads reach block j+4; the margin
# write centers compute exact zeros from the zero-diag padding).


def _cheb_ds4_kernel(scal_ref, d0h_ref, d0l_ref, d1h_ref, d1l_ref,
                     d2h_ref, d2l_ref, d3h_ref, d3l_ref,
                     t0h_ref, t0l_ref, t1h_ref, t1l_ref, ach_ref, acl_ref,
                     t4h_o, t4l_o, t5h_o, t5l_o, a2h_o, a2l_o,
                     r1h, r1l, r2h, r2l, r3h, r3l, r4h, r4l,
                     *, offsets, block):
    j = pl.program_id(0)
    sc = scal_ref[0, 0]
    sh = scal_ref[0, 1]
    ck0 = scal_ref[0, 2]
    ck1 = scal_ref[0, 3]
    ck2 = scal_ref[0, 4]
    ck3 = scal_ref[0, 5]

    @pl.when(j == 0)
    def _zero_rings():
        for r in (r1h, r1l, r2h, r2l, r3h, r3l, r4h, r4l):
            r[...] = jnp.zeros(r.shape, jnp.float32)

    # advance the T1 ring to [j+2, j+3, j+4] (fresh block j+4)
    r1h[0], r1l[0] = r1h[1], r1l[1]
    r1h[1], r1l[1] = r1h[2], r1l[2]
    r1h[2], r1l[2] = t1h_ref[...], t1l_ref[...]

    def ds_matvec(dh_ref, dl_ref, xl3, xc3, xr3):
        (hl, ll), (hc, lc), (hr, lr) = xl3, xc3, xr3
        yh = jnp.zeros(t0h_ref.shape, jnp.float32)
        yl = jnp.zeros(t0h_ref.shape, jnp.float32)
        for k, off in enumerate(offsets):
            xh = _shifted(hl, hc, hr, off, block)
            xl = _shifted(ll, lc, lr, off, block)
            dh = dh_ref[k, :][None, :]
            dl = dl_ref[k, :][None, :]
            th, tl = _ds_mul_ds(xh, xl, jnp.broadcast_to(dh, xh.shape),
                                jnp.broadcast_to(dl, xh.shape))
            yh, yl = _ds_add(yh, yl, th, tl)
        return yh, yl

    def step(yh, yl, ch, cl, ph, plo):
        ah, al = _ds_mul_f32(yh, yl, sc)
        bh, bl = _ds_mul_f32(ch, cl, -sh)
        ah, al = _ds_add(ah, al, bh, bl)
        return _ds_add(2.0 * ah, 2.0 * al, -ph, -plo)

    # T2 at block j+3
    yh, yl = ds_matvec(d3h_ref, d3l_ref,
                       (r1h[0], r1l[0]), (r1h[1], r1l[1]),
                       (r1h[2], r1l[2]))
    t2h, t2l = step(yh, yl, r1h[1], r1l[1], t0h_ref[...], t0l_ref[...])
    # advance the T2 ring (4 slots) to [j, j+1, j+2, j+3]
    r2h[0], r2l[0] = r2h[1], r2l[1]
    r2h[1], r2l[1] = r2h[2], r2l[2]
    r2h[2], r2l[2] = r2h[3], r2l[3]
    r2h[3], r2l[3] = t2h, t2l

    # T3 at block j+2 (prev = T1[j+2] = r1[0])
    yh, yl = ds_matvec(d2h_ref, d2l_ref,
                       (r2h[1], r2l[1]), (r2h[2], r2l[2]),
                       (r2h[3], r2l[3]))
    t3h, t3l = step(yh, yl, r2h[2], r2l[2], r1h[0], r1l[0])
    # advance the T3 ring to [j, j+1, j+2]
    r3h[0], r3l[0] = r3h[1], r3l[1]
    r3h[1], r3l[1] = r3h[2], r3l[2]
    r3h[2], r3l[2] = t3h, t3l

    # T4 at block j+1 (prev = T2[j+1] = r2[1])
    yh, yl = ds_matvec(d1h_ref, d1l_ref,
                       (r3h[0], r3l[0]), (r3h[1], r3l[1]),
                       (r3h[2], r3l[2]))
    t4h, t4l = step(yh, yl, r3h[1], r3l[1], r2h[1], r2l[1])
    # advance the T4 ring to [j-1, j, j+1]
    r4h[0], r4l[0] = r4h[1], r4l[1]
    r4h[1], r4l[1] = r4h[2], r4l[2]
    r4h[2], r4l[2] = t4h, t4l

    # T5 at block j (prev = T3[j] = r3[0])
    yh, yl = ds_matvec(d0h_ref, d0l_ref,
                       (r4h[0], r4l[0]), (r4h[1], r4l[1]),
                       (r4h[2], r4l[2]))
    t5h, t5l = step(yh, yl, r4h[1], r4l[1], r3h[0], r3l[0])

    t4h_o[...], t4l_o[...] = r4h[1], r4l[1]
    t5h_o[...], t5l_o[...] = t5h, t5l
    # acc[j] += ck0 T2[j] + ck1 T3[j] + ck2 T4[j] + ck3 T5[j]
    p0h, p0l = _ds_mul_f32(r2h[0], r2l[0], ck0)
    p1h, p1l = _ds_mul_f32(r3h[0], r3l[0], ck1)
    p2h, p2l = _ds_mul_f32(r4h[1], r4l[1], ck2)
    p3h, p3l = _ds_mul_f32(t5h, t5l, ck3)
    ah_, al_ = _ds_add(ach_ref[...], acl_ref[...], p0h, p0l)
    ah_, al_ = _ds_add(ah_, al_, p1h, p1l)
    ah_, al_ = _ds_add(ah_, al_, p2h, p2l)
    a2h, a2l = _ds_add(ah_, al_, p3h, p3l)
    a2h_o[...], a2l_o[...] = a2h, a2l


def _cheb_ds4_step(scal, dgh, dgl, t0h, t0l, ach, acl, t1h, t1l,
                   *, offsets, block, grid_n, interpret):
    Mp, N_tot = t0h.shape
    nd = dgh.shape[0]
    blk = lambda i_off: pl.BlockSpec(        # noqa: E731
        (Mp, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    dblk = lambda i_off: pl.BlockSpec(       # noqa: E731
        (nd, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    scratch = ([pltpu.VMEM((3, Mp, block), jnp.float32)] * 2
               + [pltpu.VMEM((4, Mp, block), jnp.float32)] * 2
               + [pltpu.VMEM((3, Mp, block), jnp.float32)] * 4)
    t4h, t4l, t5h, t5l, a2h, a2l = pl.pallas_call(
        functools.partial(_cheb_ds4_kernel, offsets=offsets, block=block),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
            dblk(0), dblk(0),                        # diag at block j
            dblk(1), dblk(1),                        # diag at block j+1
            dblk(2), dblk(2),                        # diag at block j+2
            dblk(3), dblk(3),                        # diag at block j+3
            blk(3), blk(3),                          # T0 at j+3
            blk(4), blk(4),                          # T1 fresh at j+4
            blk(0), blk(0),                          # acc at j
        ],
        out_specs=[blk(0)] * 6,
        out_shape=[jax.ShapeDtypeStruct((Mp, N_tot), jnp.float32)] * 6,
        input_output_aliases={9: 0, 10: 1, 11: 2, 12: 3, 13: 4, 14: 5},
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_CPARAMS,
    )(scal, dgh, dgl, dgh, dgl, dgh, dgl, dgh, dgl,
      t0h, t0l, t1h, t1l, ach, acl)
    return t4h, t4l, t5h, t5l, a2h, a2l


def cheb_ds4_chunk(dgh, dgl, carry, coeffs_chunk, sc, sh, *, plan,
                   interpret=False):
    """Advance the DS recurrence FOUR steps per fused kernel pass.

    Requires margin >= 4; coeffs_chunk length must be a multiple of 4
    (the shared chunk runner rounds the static chunk length and zero-pads
    only the final chunk)."""
    assert _margin(plan) >= 4, "cheb_ds4_chunk requires margin >= 4"
    offsets = plan["offsets"]
    block = plan["block"]
    grid_n = plan["n_blocks"] + _margin(plan)
    quads = coeffs_chunk.reshape(-1, 4)

    def body(c, ck):
        t0h, t0l, t1h, t1l, ach, acl = c
        scal = jnp.concatenate(
            [jnp.stack([jnp.float32(sc), jnp.float32(sh)]),
             ck.astype(jnp.float32),
             jnp.zeros(2, jnp.float32)])[None, :]
        o = _cheb_ds4_step(scal, dgh, dgl, t0h, t0l, ach, acl, t1h, t1l,
                           offsets=offsets, block=block, grid_n=grid_n,
                           interpret=interpret)
        return o, None

    with jax.enable_x64(False):
        carry, _ = jax.lax.scan(body, carry, quads)
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
        compiler_params=_CPARAMS,
    )(scal, dg, t0, ac, t1, t1, t1)
    return t2, a2


def cheb_f32_chunk(dg, carry, coeffs_chunk, sc, sh, *, plan,
                   interpret=False):
    """Advance the f32 recurrence over one coefficient chunk; carry =
    (t0, t1, ac) packed planes."""
    offsets = plan["offsets"]
    block, n_blocks = plan["block"], _grid_1step(plan)

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


def _cheb_f32_2_kernel(scal_ref, d0_ref, d1_ref, t0_ref, t1_ref, ac_ref,
                       t2_o, t3_o, a2_o, r1, r2, *, offsets, block):
    """Two fused f32 steps per pass with revolving scratch rings (same
    discipline as the DS two-step kernel): 6 planes of HBM traffic per
    TWO steps vs the 1-step kernel's 7 per step."""
    j = pl.program_id(0)
    sc = scal_ref[0, 0]
    sh = scal_ref[0, 1]
    ck0 = scal_ref[0, 2]
    ck1 = scal_ref[0, 3]

    @pl.when(j == 0)
    def _zero_rings():
        r1[...] = jnp.zeros(r1.shape, jnp.float32)
        r2[...] = jnp.zeros(r2.shape, jnp.float32)

    r1[0] = r1[1]
    r1[1] = r1[2]
    r1[2] = t1_ref[...]

    def matvec(d_ref, xl, xc, xr):
        y = jnp.zeros(t0_ref.shape, jnp.float32)
        for k, off in enumerate(offsets):
            y = y + d_ref[k, :][None, :] * _shifted(xl, xc, xr, off, block)
        return y

    # T2 at block j+1
    t2 = 2.0 * (sc * matvec(d1_ref, r1[0], r1[1], r1[2]) - sh * r1[1]) \
        - t0_ref[...]
    r2[0] = r2[1]
    r2[1] = r2[2]
    r2[2] = t2
    # T3 at block j
    gc = r2[1]
    t3 = 2.0 * (sc * matvec(d0_ref, r2[0], gc, r2[2]) - sh * gc) - r1[0]
    t2_o[...] = gc
    t3_o[...] = t3
    a2_o[...] = ac_ref[...] + ck0 * gc + ck1 * t3


def _cheb_f32_2_step(scal, dg, t0, ac, t1, *, offsets, block, grid_n,
                     interpret):
    Mp, N_tot = t0.shape
    nd = dg.shape[0]
    blk = lambda i_off: pl.BlockSpec(        # noqa: E731
        (Mp, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    dblk = lambda i_off: pl.BlockSpec(       # noqa: E731
        (nd, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    t2, t3, a2 = pl.pallas_call(
        functools.partial(_cheb_f32_2_kernel, offsets=offsets,
                          block=block),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            dblk(0), dblk(1),                # diag at j, j+1
            blk(1),                          # T0 at j+1
            blk(2),                          # T1 fresh at j+2
            blk(0),                          # acc at j
        ],
        out_specs=[blk(0)] * 3,
        out_shape=[jax.ShapeDtypeStruct((Mp, N_tot), jnp.float32)] * 3,
        input_output_aliases={3: 0, 4: 1, 5: 2},
        scratch_shapes=[pltpu.VMEM((3, Mp, block), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=_CPARAMS,
    )(scal, dg, dg, t0, t1, ac)
    return t2, t3, a2


def cheb_f32_2_chunk(dg, carry, coeffs_chunk, sc, sh, *, plan,
                     interpret=False):
    """Advance the f32 recurrence TWO steps per fused pass; carry =
    (t0, t1, ac) packed planes on a margin >= 2 layout; even chunk
    length."""
    assert _margin(plan) >= 2, "cheb_f32_2_chunk requires margin >= 2"
    offsets = plan["offsets"]
    block = plan["block"]
    grid_n = plan["n_blocks"] + _margin(plan)
    pairs = coeffs_chunk.reshape(-1, 2)

    def body(c, ck):
        t0, t1, ac = c
        scal = jnp.stack([jnp.float32(sc), jnp.float32(sh),
                          ck[0].astype(jnp.float32),
                          ck[1].astype(jnp.float32)])[None, :]
        t2, t3, a2 = _cheb_f32_2_step(scal, dg, t0, ac, t1,
                                      offsets=offsets, block=block,
                                      grid_n=grid_n,
                                      interpret=interpret)
        return (t2, t3, a2), None

    with jax.enable_x64(False):
        carry, _ = jax.lax.scan(body, carry, pairs)
    return carry


def _cheb_f32_4_kernel(scal_ref, d0_ref, d1_ref, d2_ref, d3_ref,
                       t0_ref, t1_ref, ac_ref, t4_o, t5_o, a2_o,
                       r1, r2, r3, r4, *, offsets, block):
    """Four fused f32 steps per pass (same ring discipline as the DS
    four-step kernel): 6 planes of HBM traffic per FOUR steps."""
    j = pl.program_id(0)
    sc = scal_ref[0, 0]
    sh = scal_ref[0, 1]
    ck0 = scal_ref[0, 2]
    ck1 = scal_ref[0, 3]
    ck2 = scal_ref[0, 4]
    ck3 = scal_ref[0, 5]

    @pl.when(j == 0)
    def _zero_rings():
        for r in (r1, r2, r3, r4):
            r[...] = jnp.zeros(r.shape, jnp.float32)

    r1[0] = r1[1]
    r1[1] = r1[2]
    r1[2] = t1_ref[...]

    def matvec(d_ref, xl, xc, xr):
        y = jnp.zeros(t0_ref.shape, jnp.float32)
        for k, off in enumerate(offsets):
            y = y + d_ref[k, :][None, :] * _shifted(xl, xc, xr, off, block)
        return y

    # T2 at block j+3
    t2 = 2.0 * (sc * matvec(d3_ref, r1[0], r1[1], r1[2]) - sh * r1[1]) \
        - t0_ref[...]
    r2[0] = r2[1]
    r2[1] = r2[2]
    r2[2] = r2[3]
    r2[3] = t2
    # T3 at block j+2 (prev = T1[j+2] = r1[0])
    t3 = 2.0 * (sc * matvec(d2_ref, r2[1], r2[2], r2[3]) - sh * r2[2]) \
        - r1[0]
    r3[0] = r3[1]
    r3[1] = r3[2]
    r3[2] = t3
    # T4 at block j+1 (prev = T2[j+1] = r2[1])
    t4 = 2.0 * (sc * matvec(d1_ref, r3[0], r3[1], r3[2]) - sh * r3[1]) \
        - r2[1]
    r4[0] = r4[1]
    r4[1] = r4[2]
    r4[2] = t4
    # T5 at block j (prev = T3[j] = r3[0])
    t5 = 2.0 * (sc * matvec(d0_ref, r4[0], r4[1], r4[2]) - sh * r4[1]) \
        - r3[0]
    t4_o[...] = r4[1]
    t5_o[...] = t5
    a2_o[...] = (ac_ref[...] + ck0 * r2[0] + ck1 * r3[0]
                 + ck2 * r4[1] + ck3 * t5)


def _cheb_f32_4_step(scal, dg, t0, ac, t1, *, offsets, block, grid_n,
                     interpret):
    Mp, N_tot = t0.shape
    nd = dg.shape[0]
    blk = lambda i_off: pl.BlockSpec(        # noqa: E731
        (Mp, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    dblk = lambda i_off: pl.BlockSpec(       # noqa: E731
        (nd, block), lambda j, o=i_off: (0, j + o),
        memory_space=pltpu.VMEM)
    scratch = ([pltpu.VMEM((3, Mp, block), jnp.float32)]
               + [pltpu.VMEM((4, Mp, block), jnp.float32)]
               + [pltpu.VMEM((3, Mp, block), jnp.float32)] * 2)
    t4, t5, a2 = pl.pallas_call(
        functools.partial(_cheb_f32_4_kernel, offsets=offsets,
                          block=block),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            dblk(0), dblk(1), dblk(2), dblk(3),   # diag at j..j+3
            blk(3),                               # T0 at j+3
            blk(4),                               # T1 fresh at j+4
            blk(0),                               # acc at j
        ],
        out_specs=[blk(0)] * 3,
        out_shape=[jax.ShapeDtypeStruct((Mp, N_tot), jnp.float32)] * 3,
        input_output_aliases={5: 0, 6: 1, 7: 2},
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_CPARAMS,
    )(scal, dg, dg, dg, dg, t0, t1, ac)
    return t4, t5, a2


def cheb_f32_4_chunk(dg, carry, coeffs_chunk, sc, sh, *, plan,
                     interpret=False):
    """Advance the f32 recurrence FOUR steps per fused pass; carry =
    (t0, t1, ac) packed planes on a margin >= 4 layout; chunk length a
    multiple of 4."""
    assert _margin(plan) >= 4, "cheb_f32_4_chunk requires margin >= 4"
    offsets = plan["offsets"]
    block = plan["block"]
    grid_n = plan["n_blocks"] + _margin(plan)
    quads = coeffs_chunk.reshape(-1, 4)

    def body(c, ck):
        t0, t1, ac = c
        scal = jnp.concatenate(
            [jnp.stack([jnp.float32(sc), jnp.float32(sh)]),
             ck.astype(jnp.float32),
             jnp.zeros(2, jnp.float32)])[None, :]
        o = _cheb_f32_4_step(scal, dg, t0, ac, t1, offsets=offsets,
                             block=block, grid_n=grid_n,
                             interpret=interpret)
        return o, None

    with jax.enable_x64(False):
        carry, _ = jax.lax.scan(body, carry, quads)
    return carry


# -------------------------------------------- generalized (SPD B) fusion
#
# Consistent-mass pencils (solver="cheb" with sparse SPD B) filter the
# composite operator Chat = sc_C * q(B~) A~ - sh_C * I, where q(B~) is the
# closed-form polynomial inverse (ops/chebfilter.cheb_inverse_coeffs). The
# inner q(B~) y is ITSELF a Chebyshev recurrence-with-accumulator — the
# exact operation the fused kernels implement — so the whole composite
# filter runs on the same Pallas machinery: per outer step, one A-matvec
# kernel pass (halved-scalar trick), one inner-init pass, (m_B-1)/2
# two-step inner passes, and one elementwise combine kernel. Both diagonal
# sets share one layout plan built from the UNION of the offset patterns.
#
# EVERY double-single operation lives inside a Pallas kernel. XLA-level DS
# glue is FORBIDDEN: when XLA compiles (jit/scan) the EFT helper chains,
# its fusion pass duplicates products into consumers and the backend
# contracts mul+add pairs into FMAs, double-counting the two_prod error
# term and collapsing the lo plane to f32 noise (measured: eager 4e-15,
# jit 3.7e-8 on the same _ds_mul_f32 call). Mosaic-compiled kernels do no
# such contraction (verified at 2^-49 effective precision on chip), and
# interpret-mode kernels are likewise stable under jit.


def _zero_like_planes(x):
    return jnp.zeros_like(x)


def _ds_combine_kernel(scal_ref, zh_ref, zl_ref, xh_ref, xl_ref,
                       t0h_ref, t0l_ref, fh_ref, fl_ref,
                       t2h_ref, t2l_ref, f2h_ref, f2l_ref):
    """Elementwise DS combine: C = sc*z - sh*x; T2 = 2C - T0;
    F' = F + ck*T2. Doubles are exact; all EFT stays in-kernel."""
    sc = scal_ref[0, 0]
    sh = scal_ref[0, 1]
    ck = scal_ref[0, 2]
    ah, al = _ds_mul_f32(zh_ref[...], zl_ref[...], sc)
    bh, bl = _ds_mul_f32(xh_ref[...], xl_ref[...], -sh)
    ch, cl = _ds_add(ah, al, bh, bl)
    t2h, t2l = _ds_add(2.0 * ch, 2.0 * cl, -t0h_ref[...], -t0l_ref[...])
    t2h_ref[...] = t2h
    t2l_ref[...] = t2l
    ph, plo = _ds_mul_f32(t2h, t2l, ck)
    f2h, f2l = _ds_add(fh_ref[...], fl_ref[...], ph, plo)
    f2h_ref[...] = f2h
    f2l_ref[...] = f2l


def _ds_combine(scal, zh, zl, xh, xl, t0h, t0l, fh, fl, *, block,
                interpret):
    """(T2, F') from the combine kernel over the full padded layout
    (margin blocks hold zeros and map to zeros)."""
    Mp, N_tot = zh.shape
    blk = pl.BlockSpec((Mp, block), lambda j: (0, j),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _ds_combine_kernel,
        grid=(N_tot // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * 8,
        out_specs=[blk] * 4,
        out_shape=[jax.ShapeDtypeStruct((Mp, N_tot), jnp.float32)] * 4,
        interpret=interpret,
        compiler_params=_CPARAMS,
    )(scal, zh, zl, xh, xl, t0h, t0l, fh, fl)
    return outs


def cheb_gen_plan(offsets_A, offsets_B, N, M, margin=2):
    """Layout plan shared by both operands: block from the UNION of the
    offset patterns (FEM stiffness/mass pairs share sparsity, so this is
    usually the same block either way). margin=2 for the two-step inner
    Clenshaw, 4 when the four-step inner kernels carry it."""
    union = tuple(sorted(set(offsets_A) | set(offsets_B)))
    plan = cheb_plan(union, N, M, margin=margin)
    plan["offsets_A"] = tuple(int(d) for d in offsets_A)
    plan["offsets_B"] = tuple(int(d) for d in offsets_B)
    return plan


def cheb_gen_plan_fits(offsets_A, offsets_B, N, M, *, ds=True, steps=2,
                       vmem_budget=32 << 20):
    """VMEM gate for the generalized fusion: the phases run the standard
    1-/2-/4-step kernels one at a time, so the binding working set is the
    deepest inner kernel's on the union block."""
    union = tuple(sorted(set(offsets_A) | set(offsets_B)))
    return cheb_plan_fits(union, N, M, ds=ds, steps=steps,
                          vmem_budget=vmem_budget)


def cheb_gen_chunk(dgA, dgB, qc, carry, coeffs_chunk, scals, *, plan, ds,
                   inner_steps=2, interpret=False):
    """Advance the OUTER composite recurrence over one coefficient chunk.

    dgA/dgB: packed diagonal planes — (hi, lo) tuples when ds else single
    planes. qc: (m_B+1,) f32 inner inverse coefficients (static length).
    carry: (T0, T1, accF) where each element is an (hi, lo) tuple when ds
    else a plane. scals: dict with sc_C, sh_C (outer affine map) and
    scB, shB (inner B-hat map) — python floats or traced f32 scalars.
    inner_steps: 2 runs the inner Clenshaw as two-step pairs (margin >= 2);
    4 as four-step quads (margin >= 4), halving the inner HBM traffic."""
    assert _margin(plan) >= inner_steps, \
        "cheb_gen_chunk requires margin >= inner_steps"
    offsets_A = plan["offsets_A"]
    offsets_B = plan["offsets_B"]
    block = plan["block"]
    gi = plan["n_blocks"] + _margin(plan)
    g1 = _grid_1step(plan)
    m_b = int(qc.shape[0]) - 1
    sc_C = jnp.float32(scals["sc_C"])
    sh_C = jnp.float32(scals["sh_C"])
    scB = jnp.float32(scals["scB"])
    shB = jnp.float32(scals["shB"])
    qcf = jnp.asarray(qc, jnp.float32)
    # inner steps j = 2..m_B as pairs/quads (+ zero-pad: a 0-coefficient
    # step advances the T carry harmlessly past m_B — the accumulator is
    # untouched and the carry is discarded after the inner loop)
    n_inner = max(m_b - 1, 0)
    n_groups = -(-n_inner // inner_steps) if n_inner else 0
    qpad = jnp.concatenate([qcf[2:], jnp.zeros(
        inner_steps * n_groups - n_inner, jnp.float32)])

    def smem(a, b, c, d=0.0):
        return jnp.stack([jnp.float32(a), jnp.float32(b), jnp.float32(c),
                          jnp.float32(d)])[None, :]

    def smem_n(*vals):
        vals = vals + (0.0,) * (8 - len(vals))
        return jnp.stack([jnp.float32(v) for v in vals])[None, :]

    def apply_q_of_B_ds(yh, yl):
        z = _zero_like_planes(yh)
        # inner init: t1 = Bhat y (halved-scalar 1-step, acc unused), then
        # acc = qc0 y + qc1 t1 via the combine kernel (F' output with
        # sc=qc1, sh=-qc0, T0=F=0, ck=0.5 undoing the kernel's doubling)
        t1h, t1l, _, _ = _cheb_ds_step(
            smem(scB * 0.5, shB * 0.5, 0.0), dgB[0], dgB[1],
            z, z, z, z, yh, yl,
            offsets=offsets_B, block=block, n_blocks=g1,
            interpret=interpret)
        _, _, ah, al = _ds_combine(
            smem(qcf[1], -qcf[0], 0.5), t1h, t1l, yh, yl, z, z, z, z,
            block=block, interpret=interpret)
        c = (yh, yl, t1h, t1l, ah, al)

        if inner_steps == 4:
            def body(c, ck):
                t0h, t0l, t1h, t1l, ah, al = c
                o = _cheb_ds4_step(
                    smem_n(scB, shB, ck[0], ck[1], ck[2], ck[3]),
                    dgB[0], dgB[1], t0h, t0l, ah, al, t1h, t1l,
                    offsets=offsets_B, block=block, grid_n=gi,
                    interpret=interpret)
                return o, None
        else:
            def body(c, ck):
                t0h, t0l, t1h, t1l, ah, al = c
                o = _cheb_ds2_step(
                    smem(scB, shB, ck[0], ck[1]), dgB[0], dgB[1],
                    t0h, t0l, ah, al, t1h, t1l,
                    offsets=offsets_B, block=block, grid_n=gi,
                    interpret=interpret)
                return o, None

        c, _ = jax.lax.scan(body, c, qpad.reshape(-1, inner_steps))
        return c[4], c[5]

    def apply_q_of_B_f32(y):
        z = _zero_like_planes(y)
        t1, a = _cheb_f32_step(
            smem(scB * 0.5, shB * 0.5, qcf[1]), dgB, z, qcf[0] * y, y,
            offsets=offsets_B, block=block, n_blocks=g1,
            interpret=interpret)
        c = (y, t1, a)

        if inner_steps == 4:
            def body(c, ck):
                t0, t1, a = c
                o = _cheb_f32_4_step(
                    smem_n(scB, shB, ck[0], ck[1], ck[2], ck[3]),
                    dgB, t0, a, t1,
                    offsets=offsets_B, block=block, grid_n=gi,
                    interpret=interpret)
                return o, None
        else:
            def body(c, ck):
                t0, t1, a = c
                o = _cheb_f32_2_step(
                    smem(scB, shB, ck[0], ck[1]), dgB, t0, a, t1,
                    offsets=offsets_B, block=block, grid_n=gi,
                    interpret=interpret)
                return o, None

        c, _ = jax.lax.scan(body, c, qpad.reshape(-1, inner_steps))
        return c[2]

    if ds:
        def body(c, ck):
            # T2 = 2*(sc_C*q(B~)(A~ T1) - sh_C*T1) - T0; F += ck*T2 — the
            # affine combine + recurrence + accumulate all in ONE
            # elementwise kernel pass (no XLA-level DS glue, see above)
            t0h, t0l, t1h, t1l, fh, fl = c
            z = _zero_like_planes(t1h)
            yh, yl, _, _ = _cheb_ds_step(
                smem(0.5, 0.0, 0.0), dgA[0], dgA[1], z, z, z, z, t1h, t1l,
                offsets=offsets_A, block=block, n_blocks=g1,
                interpret=interpret)
            zh, zl = apply_q_of_B_ds(yh, yl)
            t2h, t2l, f2h, f2l = _ds_combine(
                smem(sc_C, sh_C, ck.astype(jnp.float32)), zh, zl, t1h, t1l,
                t0h, t0l, fh, fl, block=block, interpret=interpret)
            return (t1h, t1l, t2h, t2l, f2h, f2l), None
    else:
        def chat32(x):
            z = _zero_like_planes(x)
            y, _ = _cheb_f32_step(
                smem(0.5, 0.0, 0.0), dgA, z, z, x,
                offsets=offsets_A, block=block, n_blocks=g1,
                interpret=interpret)
            return sc_C * apply_q_of_B_f32(y) - sh_C * x

        def body(c, ck):
            t0, t1, f = c
            t2 = 2.0 * chat32(t1) - t0
            return (t1, t2, f + ck.astype(jnp.float32) * t2), None

    with jax.enable_x64(False):
        carry, _ = jax.lax.scan(body, carry, coeffs_chunk)
    return carry


def cheb_gen_init(dgA, dgB, qc, Qp, c01, scals, *, plan, ds,
                  inner_steps=2, interpret=False):
    """Outer carry after the k=0,1 terms: T0 = Q, T1 = Chat Q,
    accF = c0 T0 + c1 T1 (packed planes; Qp = packed Q)."""
    # reuse the chunk machinery: one step with ck=0 starting from
    # (T0=0, T1=Q) gives T2 = 2 Chat Q; halve in XLA
    if ds:
        qh, ql = Qp
        z = jnp.zeros_like(qh)
        c = cheb_gen_chunk(dgA, dgB, qc, (z, z, qh, ql, z, z),
                           jnp.zeros(1, jnp.float32), scals, plan=plan,
                           ds=True, inner_steps=inner_steps,
                           interpret=interpret)
        # halving both planes by an exact power of two is safe in XLA;
        # the c0/c1 combine is EFT and must run in-kernel (traced with x64
        # OFF like every kernel here — Mosaic rejects i64 grid indices)
        with jax.enable_x64(False):
            t1h, t1l = 0.5 * c[2], 0.5 * c[3]
            c01f = c01.astype(jnp.float32)
            _, _, ah, al = _ds_combine(
                jnp.stack([c01f[1], -c01f[0], jnp.float32(0.5),
                           jnp.float32(0)])[None, :],
                t1h, t1l, qh, ql, z, z, z, z,
                block=plan["block"], interpret=interpret)
        return qh, ql, t1h, t1l, ah, al
    q = Qp
    z = jnp.zeros_like(q)
    c = cheb_gen_chunk(dgA, dgB, qc, (z, q, z), jnp.zeros(1, jnp.float32),
                       scals, plan=plan, ds=False,
                       inner_steps=inner_steps, interpret=interpret)
    t1 = 0.5 * c[1]
    return q, t1, (c01[0].astype(jnp.float32) * q
                   + c01[1].astype(jnp.float32) * t1)


# ------------------------------------------------------------- reference

def cheb_ds_step_reference(dia64, T0, T1, acc, sc, sh, ck):
    """Pure-XLA f64 oracle of one fused step on (N, M) arrays (tests)."""
    from .pallas_kernels import dia_matvec_reference
    y = dia_matvec_reference(dia64[0], T1, dia64[1])
    T2 = 2.0 * (sc * y - sh * T1) - T0
    return T2, acc + ck * T2
