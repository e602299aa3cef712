"""Pallas DIA kernel tests (interpret mode on CPU; the same kernel is
validated on the real chip — see PARITY.md TPU status)."""
import numpy as np
import pytest

import jax.numpy as jnp

from feastkit_tpu.ops.banded import full_to_banded
from feastkit_tpu.ops.pallas_kernels import (bands_to_dia, bcoo_to_dia,
                                             dia_matvec, dia_matvec_any,
                                             dia_matvec_reference)


def _banded(rng, N, kl, ku, complex_=False):
    A = np.zeros((N, N), complex if complex_ else float)
    for d in range(-kl, ku + 1):
        v = rng.standard_normal(N - abs(d))
        if complex_:
            v = v + 1j * rng.standard_normal(N - abs(d))
        A += np.diag(v, d)
    return A


def test_bands_to_dia_round_trip(rng):
    A = _banded(rng, 40, 2, 1)
    diags, offs = bands_to_dia(full_to_banded(A, 2, 1), 2, 1)
    x = rng.standard_normal((40, 3))
    y = dia_matvec_reference(jnp.asarray(diags), jnp.asarray(x), offs)
    assert np.abs(np.asarray(y) - A @ x).max() < 1e-12


def test_bcoo_to_dia_detection(rng):
    import scipy.sparse as sp
    n = 50
    A = sp.diags([np.ones(n), 2 * np.ones(n - 5)], [0, 5], format="coo")
    out = bcoo_to_dia(A.data, np.stack([A.row, A.col], 1), n)
    assert out is not None
    diags, offs = out
    assert offs == (0, 5)
    # dense random: too many diagonals -> None
    B = sp.random(50, 50, density=0.5, random_state=0).tocoo()
    assert bcoo_to_dia(B.data, np.stack([B.row, B.col], 1), 50) is None


@pytest.mark.parametrize("shape", [(100, 2, 2, 4), (1000, 1, 3, 8),
                                   (64, 0, 0, 2)])
def test_pallas_kernel_interpret(rng, shape):
    N, kl, ku, M = shape
    A = _banded(rng, N, kl, ku)
    diags, offs = bands_to_dia(full_to_banded(A, kl, ku), kl, ku)
    x = rng.standard_normal((N, M))
    y = dia_matvec(jnp.asarray(diags, jnp.float32),
                   jnp.asarray(x, jnp.float32), offs, block=64,
                   interpret=True)
    assert np.abs(np.asarray(y) - (A @ x)).max() < 1e-4


def test_pallas_complex_decomposition(rng):
    N = 80
    A = _banded(rng, N, 1, 1, complex_=True)
    diags, offs = bands_to_dia(full_to_banded(A, 1, 1), 1, 1)
    x = rng.standard_normal((N, 4)) + 1j * rng.standard_normal((N, 4))
    y = dia_matvec_any(jnp.asarray(diags), jnp.asarray(x), offs,
                       use_pallas=True, interpret=True)
    assert np.abs(np.asarray(y) - A @ x).max() < 1e-12
    # real A, complex x (the symmetric-path case)
    Ar = A.real
    diags_r, _ = bands_to_dia(full_to_banded(Ar, 1, 1), 1, 1)
    y2 = dia_matvec_any(jnp.asarray(diags_r), jnp.asarray(x), offs,
                        use_pallas=True, interpret=True)
    assert np.abs(np.asarray(y2) - Ar @ x).max() < 1e-12


def test_non_contiguous_offsets(rng):
    """2-D-Laplacian-style offsets (-10, -1, 0, 1, 10)."""
    N = 200
    offs = (-10, -1, 0, 1, 10)
    diags = np.zeros((5, N))
    A = np.zeros((N, N))
    for k, d in enumerate(offs):
        for i in range(N):
            j = i + d
            if 0 <= j < N:
                v = rng.standard_normal()
                diags[k, i] = v
                A[i, j] = v
    x = rng.standard_normal((N, 3))
    y = dia_matvec(jnp.asarray(diags, jnp.float32),
                   jnp.asarray(x, jnp.float32), offs, block=64,
                   interpret=True)
    assert np.abs(np.asarray(y) - A @ x).max() < 1e-4


def test_batched_kernel_interpret(rng):
    """(g, N, M) batched DIA kernel == per-member reference."""
    import jax
    import jax.numpy as jnp
    from feastkit_tpu.ops.pallas_kernels import _dia_matvec_batched
    N, M, g = 150, 4, 3
    offsets = (-7, -1, 0, 2, 7)
    diags = rng.standard_normal((5, N)).astype(np.float32)
    xb = rng.standard_normal((g, N, M)).astype(np.float32)
    with jax.enable_x64(False):
        out = _dia_matvec_batched(jnp.asarray(diags), jnp.asarray(xb),
                                  offsets, block=64, interpret=True)
    ref = np.stack([np.asarray(dia_matvec_reference(diags, xb[i], offsets))
                    for i in range(g)])
    assert np.abs(np.asarray(out) - ref).max() < 1e-5


def test_vmap_dispatches_to_batched_kernel(rng):
    """vmapping dia_matvec over x must survive (custom_vmap rule) and agree
    with the reference — the node-group dispatch of the sparse driver
    depends on this."""
    import jax
    import jax.numpy as jnp
    from feastkit_tpu.ops.pallas_kernels import dia_matvec
    N, M, g = 120, 5, 4
    offsets = (-10, 0, 10)
    diags = rng.standard_normal((3, N)).astype(np.float32)
    xb = rng.standard_normal((g, N, M)).astype(np.float32)
    out = jax.vmap(lambda x: dia_matvec(diags, x, offsets, block=64,
                                        interpret=True))(jnp.asarray(xb))
    ref = np.stack([np.asarray(dia_matvec_reference(diags, xb[i], offsets))
                    for i in range(g)])
    assert np.abs(np.asarray(out) - ref).max() < 1e-5
