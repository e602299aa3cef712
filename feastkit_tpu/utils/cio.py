"""Complex-I/O-safe jit: work around runtimes that cannot transfer complex
arrays across the host<->device boundary.

The axon TPU tunnel (this image's single-chip access path) raises
UNIMPLEMENTED for any host->device or device->host movement of
complex64/complex128 arrays, while complex arithmetic INSIDE compiled
programs is fully supported. ``cjit`` therefore splits every complex leaf of
the inputs into a ``ComplexPair(re, im)`` of float arrays on the host,
reconstructs complex values as the first traced operation, splits complex
outputs back into pairs inside the program, and reassembles them lazily on
the host. On normal platforms (cpu, tpu, gpu) it is exactly ``jax.jit``.

``fetch(x)`` converts any result leaf (ComplexPair or array) to numpy.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ComplexPair", "cjit", "fetch", "fetch_many",
           "complex_io_required", "device_operand", "op_shape", "op_dtype",
           "op_iscomplex", "op_astype", "is_operand"]


class ComplexPair(NamedTuple):
    re: Any
    im: Any


def _is_pair(x):
    return isinstance(x, ComplexPair)


@functools.lru_cache(maxsize=1)
def complex_io_required() -> bool:
    """True when running through the axon tunnel (its devices report
    platform 'tpu', so detect via the jax_platforms config the axon
    sitecustomize pins, plus the active default backend)."""
    try:
        platforms = (jax.config.jax_platforms or "")
        if "axon" not in platforms:
            return False
        # If the user switched to the CPU backend (tests), transfers are fine.
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _split_leaf(x):
    """Host-side: complex array -> ComplexPair of float arrays."""
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        return ComplexPair(np.ascontiguousarray(x.real),
                           np.ascontiguousarray(x.imag))
    if isinstance(x, (complex, np.complexfloating)):
        return ComplexPair(np.asarray(x).real.copy(), np.asarray(x).imag.copy())
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.complexfloating):
        # Device-resident complex: split with device ops (no transfer).
        return ComplexPair(jnp.real(x), jnp.imag(x))
    return x


def _merge_leaf(x):
    """Traced: ComplexPair -> complex array."""
    if _is_pair(x):
        return jax.lax.complex(jnp.asarray(x.re), jnp.asarray(x.im))
    return x


def _split_traced(x):
    if isinstance(x, jax.core.Tracer) or isinstance(x, jax.Array):
        if jnp.issubdtype(jnp.result_type(x), jnp.complexfloating):
            return ComplexPair(jnp.real(x), jnp.imag(x))
    return x


def split_tree(t):
    return jax.tree_util.tree_map(_split_leaf, t)


def merge_tree(t):
    return jax.tree_util.tree_map(_merge_leaf, t, is_leaf=_is_pair)


def fetch(x):
    """Result leaf -> numpy (reassembling ComplexPair)."""
    if _is_pair(x):
        return np.asarray(x.re) + 1j * np.asarray(x.im)
    return np.asarray(x)


def slice_cols(x, m):
    """``x[:, :m]`` preserving ComplexPair structure (device-side slice,
    no transfer) — used by drivers that trim the eigenvector block on
    device before (or instead of) fetching it."""
    if _is_pair(x):
        return ComplexPair(x.re[:, :m], x.im[:, :m])
    return x[:, :m]


@functools.lru_cache(maxsize=None)
def _packer(n_parts: int, dtype_str: str):
    """jit'd concatenate-raveled packer (cached per part-count/dtype; jax
    re-traces on shape changes internally)."""
    dtype = jnp.dtype(dtype_str)

    @jax.jit
    def pack(*xs):
        return jnp.concatenate([jnp.asarray(x).astype(dtype).ravel()
                                for x in xs])
    return pack


def fetch_many(leaves):
    """Fetch several result leaves with ONE device->host transfer.

    Through a remote attachment every ``np.asarray(device_array)`` is a
    full network round trip (~30 ms on the axon tunnel) — fetching a
    result's 7-8 leaves one by one costs more than the solve. Here the
    leaves are packed into a single flat real buffer ON DEVICE (complex
    leaves as re/im parts; ints/bools as floats — exact for the small
    values they hold) and unpacked host-side after a single transfer. On
    platforms without the restriction this is just ``[fetch(x) for x]``.
    """
    leaves = list(leaves)
    if not complex_io_required():
        return [fetch(x) for x in leaves]
    flat, spec = [], []
    widest = np.float32
    for x in leaves:
        if _is_pair(x):
            re, im = jnp.asarray(x.re), jnp.asarray(x.im)
            flat += [re, im]
            if re.dtype == jnp.float64:
                widest = np.float64
            spec.append(("c", tuple(re.shape), np.dtype(str(re.dtype))))
        else:
            xa = jnp.asarray(x)
            if jnp.issubdtype(xa.dtype, jnp.complexfloating):
                flat += [jnp.real(xa), jnp.imag(xa)]
                if xa.dtype == jnp.complex128:
                    widest = np.float64
                spec.append(("c", tuple(xa.shape),
                             np.dtype(np.float32 if xa.dtype == jnp.complex64
                                      else np.float64)))
            else:
                flat.append(xa)
                if xa.dtype == jnp.float64:
                    widest = np.float64
                spec.append(("r", tuple(xa.shape), np.dtype(str(xa.dtype))))
    buf = np.asarray(_packer(len(flat), np.dtype(widest).name)(*flat))
    out, pos = [], 0
    for kind, shape, dt in spec:
        size = int(np.prod(shape)) if shape else 1
        if kind == "c":
            re = buf[pos:pos + size].reshape(shape).astype(dt)
            im = buf[pos + size:pos + 2 * size].reshape(shape).astype(dt)
            pos += 2 * size
            out.append(re + 1j * im)
        else:
            part = buf[pos:pos + size].reshape(shape)
            pos += size
            if np.issubdtype(dt, np.bool_):
                out.append(part != 0.0)
            elif np.issubdtype(dt, np.integer):
                out.append(np.round(part).astype(dt))
            else:
                out.append(part.astype(dt))
    return out


def run_pipelined_loop(state, body, finalize, *, max_loops, first_chunk=2,
                       first_fused=None):
    """Shared remote-link host-driving protocol for refinement loops.

    Issue a chunk of refinement ``body`` dispatches back-to-back,
    SPECULATIVELY issue the ``finalize`` pass with them, and synchronize
    once per chunk on a single packed fetch of the result leaves — the
    ~30 ms tunnel round trip applies per host synchronization, not per
    dispatch. Converged (the common case): one round trip per chunk.
    Unconverged: the wasted finalize costs one body's worth of compute and
    the loop continues from the pre-finalize state.

    ``first_chunk`` sizes the initial chunk (1 for engines that routinely
    converge in one refinement loop, e.g. banded BCR, where a speculative
    second body is usually wasted work; 2 otherwise).

    ``first_fused``: optional callable replacing the FIRST chunk with one
    fully fused device program (setup + ``first_chunk`` bodies + the
    speculative finalize — e.g. the banded driver folds its BCR
    factorization in): called as ``first_fused(state) -> (fin_state,
    carry_state)``; unconverged runs continue from ``carry_state`` with
    the regular body/finalize. Each separate dispatch costs a network
    send through a remote attachment, so the fused first chunk turns the
    common converge-in-one-loop case into one dispatch + one fetch.

    Returns ``(fin_state, fetched)`` with ``fetched = [converged, lam, Q,
    res, inside, epsout, loop]``. Used by the dense, dense-general, and
    banded interval drivers — keep their driving semantics identical here.
    """
    loops_done = 0
    while True:
        if loops_done == 0 and first_fused is not None:
            fin, state = first_fused(state)
            loops_done += first_chunk
        else:
            k = min(first_chunk if loops_done == 0 else 2,
                    max_loops + 1 - loops_done)
            for _ in range(k):
                state = body(state)
            loops_done += k
            fin = finalize(state)
        fetched = fetch_many([fin.converged, fin.lam, fin.Q, fin.res,
                              fin.inside, fin.epsout, fin.loop])
        if bool(fetched[0]) or loops_done > max_loops:
            return fin, fetched


def is_operand(X) -> bool:
    """True for device-resident operand forms drivers accept as-is."""
    return isinstance(X, (jax.Array, ComplexPair))


def op_shape(X):
    return X.re.shape if _is_pair(X) else X.shape


def op_dtype(X):
    """numpy dtype of the operand's VALUES (ComplexPair reads complex)."""
    if _is_pair(X):
        r = np.dtype(str(X.re.dtype))
        return np.dtype(np.complex64 if r == np.float32 else np.complex128)
    return np.dtype(str(X.dtype))


def op_iscomplex(X) -> bool:
    return np.issubdtype(op_dtype(X), np.complexfloating)


def op_astype(X, dtype):
    """astype that stays device-resident (ComplexPair casts its parts)."""
    dtype = np.dtype(str(jnp.dtype(dtype)))
    if _is_pair(X):
        if not np.issubdtype(dtype, np.complexfloating):
            raise TypeError(
                f"cannot cast a complex ComplexPair operand to {dtype}")
        r = np.float32 if dtype == np.complex64 else np.float64
        return ComplexPair(X.re.astype(r), X.im.astype(r))
    return X.astype(dtype)


def device_operand(X):
    """Upload an operand ONCE for repeated solves.

    Drivers re-upload host (numpy) operands on every dispatch — through a
    slow host<->device link (the axon tunnel moves ~30 MB/s) that dominates
    warm solve time for large dense operands. Passing the value returned
    here keeps the operand device-resident across dispatches AND across
    repeated solves. Complex operands on a complex-I/O-restricted platform
    come back as a device-resident ComplexPair (accepted by the dense
    drivers); everything else is a jax.Array.
    """
    if isinstance(X, jax.Array):
        return X
    if type(X) is tuple:
        # plain tuples (e.g. the split-complex (sig, tau) contour arrays of
        # the f64 pair engines, ops/splitlu.py) upload member-wise
        return tuple(device_operand(x) for x in X)
    if _is_pair(X):
        # parts already on device stay there — ascontiguousarray on a
        # jax.Array would round-trip the data through the (slow) host link
        def _part(p):
            return p if isinstance(p, jax.Array) else jax.device_put(
                np.ascontiguousarray(p))
        return ComplexPair(_part(X.re), _part(X.im))
    X = np.asarray(X)
    if np.iscomplexobj(X) and complex_io_required():
        return ComplexPair(jax.device_put(np.ascontiguousarray(X.real)),
                           jax.device_put(np.ascontiguousarray(X.imag)))
    return jax.device_put(X)


def cjit(fun=None, *, static_argnames=(), donate_argnums=()):
    """jax.jit drop-in that is complex-I/O safe on the axon platform.

    The wrapped callable accepts the same arguments; complex array arguments
    may be numpy or device arrays. Results may contain ComplexPair leaves on
    axon — use :func:`fetch` on result leaves (it is a no-op reassembly on
    other platforms, where plain arrays come back).

    ``donate_argnums``: positional args whose device buffers XLA may reuse
    for outputs (same contract as jax.jit) — essential for the host-driven
    recurrence chunk loops, where a non-donated (M, N)-plane carry would
    double the solve's HBM peak at every dispatch.
    """
    if fun is None:
        return functools.partial(cjit, static_argnames=static_argnames,
                                 donate_argnums=donate_argnums)

    # TPU matmuls default to bfloat16 inputs (fast, ~3 significant digits per
    # product) — fatal for an eigensolver's residual floor. Pin HIGHEST
    # precision for everything traced through this boundary: full f32
    # arithmetic for f32 operands AND true f64 for f64 operands ("float32"
    # would silently degrade f64 matmuls to f32 on the MXU — measured as a
    # 2.8e-5 orthogonality error in the f64 SVD that floored every
    # mixed-precision solve at ~1e-5 residuals). No effect on CPU.
    def fun_hp(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fun(*a, **k)

    plain = jax.jit(fun_hp, static_argnames=static_argnames,
                    donate_argnums=donate_argnums)

    # split_tree preserves top-level positional structure (complex leaves
    # become pairs WITHIN an arg subtree), so donate_argnums map 1:1
    @functools.partial(jax.jit, static_argnames=static_argnames,
                       donate_argnums=donate_argnums)
    def packed(*args, **kw):
        args = merge_tree(args)
        kw_dyn = {k: v for k, v in kw.items() if k not in static_argnames}
        kw_static = {k: v for k, v in kw.items() if k in static_argnames}
        kw_dyn = merge_tree(kw_dyn)
        out = fun_hp(*args, **kw_dyn, **kw_static)
        return jax.tree_util.tree_map(_split_traced, out)

    @functools.wraps(fun)
    def call(*args, **kw):
        if not complex_io_required():
            return plain(*args, **kw)
        kw_static = {k: v for k, v in kw.items() if k in static_argnames}
        kw_dyn = {k: v for k, v in kw.items() if k not in static_argnames}
        args = split_tree(args)
        kw_dyn = split_tree(kw_dyn)
        return packed(*args, **kw_dyn, **kw_static)

    return call
