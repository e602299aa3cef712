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

__all__ = ["ComplexPair", "cjit", "fetch", "complex_io_required"]


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


def cjit(fun=None, *, static_argnames=()):
    """jax.jit drop-in that is complex-I/O safe on the axon platform.

    The wrapped callable accepts the same arguments; complex array arguments
    may be numpy or device arrays. Results may contain ComplexPair leaves on
    axon — use :func:`fetch` on result leaves (it is a no-op reassembly on
    other platforms, where plain arrays come back).
    """
    if fun is None:
        return functools.partial(cjit, static_argnames=static_argnames)

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

    plain = jax.jit(fun_hp, static_argnames=static_argnames)

    @functools.partial(jax.jit, static_argnames=static_argnames)
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
