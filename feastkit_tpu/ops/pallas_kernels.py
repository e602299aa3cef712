"""Pallas TPU kernels for the FEAST hot paths.

Kernel #1: DIA (diagonal-offset) sparse matvec — the inner operation of
every banded/stencil shifted solve (GMRES matvecs dominate the sparse path,
SURVEY.md section 6: "linear solver = 80-95% of total cost"). A BCOO matvec
lowers to gathers/scatters that the TPU hates; for matrices whose nonzeros
live on a few diagonals (banded operators, 2D/3D Laplacian stencils — the
BASELINE.json configs), the matvec is a handful of shifted elementwise
multiply-adds: pure VPU work with unit-stride vector loads, performed
blockwise from VMEM.

Storage: ``diags`` is (nd, N) with an explicit static ``offsets`` tuple;
row k holds diagonal offsets[k] ALIGNED TO ROWS: diags[k, i] = A[i, i +
offsets[k]] (zero where out of range). Offsets need not be contiguous
(2-D Laplacian: (-n, -1, 0, 1, n)).

y[i, :] = sum_k diags[k, i] * x[i + offsets[k], :]

Each grid step owns a row block; x stays in HBM and the needed
(block + 2*halo) slab is DMA'd into VMEM scratch (overlapping halos are not
expressible with disjoint BlockSpec tiling).
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

__all__ = ["dia_matvec", "dia_matvec_any", "dia_matvec_reference",
           "bands_to_dia", "bcoo_to_dia"]


def bands_to_dia(bands, kl: int, ku: int):
    """LAPACK-band layout (ops/banded.py) -> row-aligned (diags, offsets).

    bands[k, j] = A[j - (ku-k), j]  ->  diags[k, i] = A[i, i + d], d = ku-k.
    """
    bands = np.asarray(bands)
    nb, N = bands.shape
    offsets = tuple(ku - k for k in range(nb))
    diags = np.zeros_like(bands)
    for k, d in enumerate(offsets):
        if d >= 0:
            diags[k, : N - d] = bands[k, d:]
        else:
            diags[k, -d:] = bands[k, : N + d]
    return diags, offsets


def bcoo_to_dia(data, indices, N, max_diags: int = 32):
    """COO arrays -> (diags, offsets) if the matrix lives on few diagonals,
    else None. Host-side detection for the structured sparse fast path."""
    data = np.asarray(data)
    indices = np.asarray(indices)
    offs = indices[:, 1].astype(np.int64) - indices[:, 0].astype(np.int64)
    uniq = np.unique(offs)
    if len(uniq) > max_diags:
        return None
    diags = np.zeros((len(uniq), N), data.dtype)
    pos = np.searchsorted(uniq, offs)
    # accumulate duplicates (COO may repeat entries)
    np.add.at(diags, (pos, indices[:, 0]), data)
    return diags, tuple(int(d) for d in uniq)


def dia_matvec_reference(diags, x, offsets):
    """Pure-XLA shifted-add reference (identical math; CPU path + oracle)."""
    diags = jnp.asarray(diags)
    N = diags.shape[1]
    x2 = x if x.ndim == 2 else x[:, None]
    y = jnp.zeros((N, x2.shape[1]), jnp.result_type(diags.dtype, x.dtype))
    for k, d in enumerate(offsets):
        if d >= 0:
            seg = diags[k, : N - d, None] * x2[d:] if d > 0 else \
                diags[k, :, None] * x2
            y = y.at[: N - d].add(seg) if d > 0 else y + seg
        else:
            y = y.at[-d:].add(diags[k, -d:, None] * x2[: N + d])
    return y if x.ndim == 2 else y[:, 0]


def _dia_kernel(diags_ref, x_hbm, y_ref, x_vmem, sem, *, offsets, block, halo):
    """One grid step = one row block; DMA the halo'd x slab, then unrolled
    shifted multiply-adds (static offsets -> pure VPU code, no gather)."""
    i = pl.program_id(0)
    row0 = i * block                    # offset into the halo-padded x
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(row0, block + 2 * halo), :], x_vmem, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros(y_ref.shape, y_ref.dtype)
    xs = x_vmem[...]
    for k, d in enumerate(offsets):
        coeff = diags_ref[k, :]
        lo = d + halo                       # static Python int -> static slice
        xslab = xs[lo:lo + block, :]
        acc = acc + coeff[:, None] * xslab
    y_ref[...] = acc


@functools.lru_cache(maxsize=None)
def _dia_matvec_vmappable(offsets, block, interpret):
    """custom_vmap wrapper: vmapping over x (shared diags) dispatches to the
    BATCHED kernel below instead of failing on the ANY-memory BlockSpec —
    the node-group dispatch of the sparse driver (solvers/sparse.py
    _sparse_group_pair_jit) vmaps the whole shifted solve over contour
    nodes, and with this rule the Pallas fast path survives the vmap."""

    @jax.custom_batching.custom_vmap
    def mv(diags, x):
        return _dia_matvec_32(diags, x, offsets, block=block,
                              interpret=interpret)

    @mv.def_vmap
    def _rule(axis_size, in_batched, diags, x):   # noqa: ANN001
        d_b, x_b = in_batched
        if d_b:
            # batched coefficients: no batched kernel; unroll via map
            x2 = x if x_b else jnp.broadcast_to(x, (axis_size,) + x.shape)
            out = jax.lax.map(
                lambda dx: dia_matvec_reference(dx[0], dx[1], offsets),
                (diags, x2))
            return out, True
        out = _dia_matvec_batched(diags, x, offsets, block=block,
                                  interpret=interpret)
        return out, True

    return mv


@functools.partial(jax.jit, static_argnames=("offsets", "block", "interpret"))
def dia_matvec(diags, x, offsets, *, block: int = 1024,
               interpret: bool = False):
    """DIA matvec as a Pallas TPU kernel; falls back to the XLA reference
    when Pallas is unavailable. vmap over x dispatches to a batched kernel
    (see _dia_matvec_vmappable)."""
    if not _PALLAS_OK:
        return dia_matvec_reference(diags, x, offsets)
    # Under jax_enable_x64 the pallas grid/index arithmetic traces as i64,
    # which Mosaic cannot legalize ("failed to legalize func.return
    # (i64, i32)"). For 32-bit data (the only kind Mosaic accepts anyway)
    # trace the kernel with x64 off; 64-bit data keeps the plain path
    # (CPU/interpret use — the x64-off context would silently downcast it).
    bits = max(jnp.finfo(jnp.asarray(diags).dtype).bits,
               jnp.finfo(jnp.asarray(x).dtype).bits)
    fn = _dia_matvec_vmappable(tuple(int(d) for d in offsets), block,
                               bool(interpret))
    if bits <= 32:
        with jax.enable_x64(False):
            return fn(diags, x)
    return fn(diags, x)


def _dia_matvec_32(diags, x, offsets, *, block, interpret):
    diags = jnp.asarray(diags)
    nd, N = diags.shape
    squeeze = x.ndim == 1
    x2 = x[:, None] if squeeze else x
    M = x2.shape[1]
    # The HBM->VMEM slab DMA requires a 128-aligned lane dimension: pad the
    # column count (the waste is bounded; callers with M ~ 128 pay nothing).
    M_pad = -(-M // 128) * 128
    halo = max((max(abs(d) for d in offsets), 8)) if offsets else 8
    halo = -(-halo // 8) * 8                 # sublane-aligned slab
    block = int(min(block, max(64, N)))
    n_blocks = -(-N // block)
    N_pad = n_blocks * block
    out_dtype = jnp.result_type(diags.dtype, x.dtype)

    diags_pad = jnp.zeros((nd, N_pad), out_dtype).at[:, :N].set(
        diags.astype(out_dtype))
    x_pad = jnp.zeros((N_pad + 2 * halo, M_pad), out_dtype)
    x_pad = x_pad.at[halo:halo + N, :M].set(x2.astype(out_dtype))

    out = pl.pallas_call(
        functools.partial(_dia_kernel, offsets=offsets, block=block,
                          halo=halo),
        out_shape=jax.ShapeDtypeStruct((N_pad, M_pad), out_dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((nd, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((block, M_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block + 2 * halo, M_pad), out_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(diags_pad, x_pad)
    out = out[:N, :M]
    return out[:, 0] if squeeze else out


def _dia_kernel_b(diags_ref, x_hbm, y_ref, x_vmem, sem, *, offsets, block,
                  halo):
    """Batched variant: grid (g, n_blocks); one grid step = one row block of
    one batch member; x stays in HBM, the halo'd slab is DMA'd per step."""
    gidx = pl.program_id(0)
    j = pl.program_id(1)
    row0 = j * block
    dma = pltpu.make_async_copy(
        x_hbm.at[gidx, pl.ds(row0, block + 2 * halo), :], x_vmem, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros(y_ref.shape[1:], y_ref.dtype)
    xs = x_vmem[...]
    for k, d in enumerate(offsets):
        coeff = diags_ref[k, :]
        lo = d + halo
        acc = acc + coeff[:, None] * xs[lo:lo + block, :]
    y_ref[0] = acc


def _dia_matvec_batched(diags, x, offsets, *, block, interpret):
    """(nd, N) diags applied to a BATCH of operands x (g, N, M) -> (g, N, M)
    in one pallas_call with a (g, n_blocks) grid — the kernel behind the
    custom_vmap rule of :func:`dia_matvec`."""
    diags = jnp.asarray(diags)
    nd, N = diags.shape
    squeeze = x.ndim == 2            # batched 1-D operands
    x3 = x[:, :, None] if squeeze else x
    g, _, M = x3.shape
    M_pad = -(-M // 128) * 128
    halo = max((max(abs(d) for d in offsets), 8)) if offsets else 8
    halo = -(-halo // 8) * 8
    block = int(min(block, max(64, N)))
    n_blocks = -(-N // block)
    N_pad = n_blocks * block
    out_dtype = jnp.result_type(diags.dtype, x.dtype)

    diags_pad = jnp.zeros((nd, N_pad), out_dtype).at[:, :N].set(
        diags.astype(out_dtype))
    x_pad = jnp.zeros((g, N_pad + 2 * halo, M_pad), out_dtype)
    x_pad = x_pad.at[:, halo:halo + N, :M].set(x3.astype(out_dtype))

    out = pl.pallas_call(
        functools.partial(_dia_kernel_b, offsets=offsets, block=block,
                          halo=halo),
        out_shape=jax.ShapeDtypeStruct((g, N_pad, M_pad), out_dtype),
        grid=(g, n_blocks),
        in_specs=[
            pl.BlockSpec((nd, block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, block, M_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block + 2 * halo, M_pad), out_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(diags_pad, x_pad)
    out = out[:, :N, :M]
    return out[:, :, 0] if squeeze else out


def dia_matvec_any(diags, x, offsets, *, use_pallas: bool = True,
                   interpret: bool = False):
    """DIA matvec for any real/complex dtype combination.

    Mosaic (Pallas TPU) has no complex support, so complex products are
    decomposed into real kernel calls:
      real A,    complex x: y = A xr + i A xi          (2 calls)
      complex A, complex x: full complex product        (4 calls)
    Falls back to the XLA reference when use_pallas is False.
    """
    if not use_pallas:
        return dia_matvec_reference(diags, x, offsets)
    mv = functools.partial(dia_matvec, offsets=offsets, interpret=interpret)
    a_c = jnp.iscomplexobj(diags)
    x_c = jnp.iscomplexobj(x)
    if not a_c and not x_c:
        return mv(diags, x)
    if not a_c and x_c:
        return jax.lax.complex(mv(diags, jnp.real(x)), mv(diags, jnp.imag(x)))
    dr, di = jnp.real(diags), jnp.imag(diags)
    if a_c and not x_c:
        return jax.lax.complex(mv(dr, x), mv(di, x))
    xr, xi = jnp.real(x), jnp.imag(x)
    return jax.lax.complex(mv(dr, xr) - mv(di, xi), mv(dr, xi) + mv(di, xr))
