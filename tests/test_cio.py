"""Complex-I/O-safe jit wrapper tests (utils/cio.py): force the packed path
on CPU and verify identical results to the plain path."""
import numpy as np
import pytest

import feastkit_tpu.utils.cio as cio

from conftest import laplacian_1d, laplacian_eigs


@pytest.fixture
def forced_packed(monkeypatch):
    original = cio.complex_io_required
    original.cache_clear()
    monkeypatch.setattr(cio, "complex_io_required", lambda: True)
    yield
    original.cache_clear()


def test_cjit_round_trip(forced_packed):
    import jax.numpy as jnp

    @cio.cjit
    def f(a, b):
        return a @ b, jnp.real(a).sum()

    A = np.random.default_rng(0).standard_normal((8, 8)) \
        + 1j * np.random.default_rng(1).standard_normal((8, 8))
    B = np.ones((8, 2), np.complex128)
    out, s = f(A, B)
    assert isinstance(out, cio.ComplexPair)
    got = cio.fetch(out)
    assert np.abs(got - A @ B).max() < 1e-12
    assert abs(cio.fetch(s) - A.real.sum()) < 1e-12


def test_cjit_static_argnames(forced_packed):
    @cio.cjit(static_argnames=("flag",))
    def f(x, *, flag):
        return x * (2.0 if flag else 3.0)

    assert cio.fetch(f(np.array(1.0 + 1j), flag=True)) == 2.0 + 2.0j
    assert cio.fetch(f(np.array(1.0 + 1j), flag=False)) == 3.0 + 3.0j


def test_dense_solver_through_packed_path(forced_packed):
    """Full dense Hermitian solve with every complex array crossing the jit
    boundary as real pairs."""
    from feastkit_tpu.solvers.dense import feast_heev
    rng = np.random.default_rng(0)
    n = 40
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    w = np.linalg.eigvalsh(H)
    Emin, Emax = w[15] - 1e-9, w[25] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_heev(H, Emin, Emax, 14)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9
    assert np.iscomplexobj(r.q)


def test_sparse_solver_through_packed_path(forced_packed):
    import scipy.sparse as sp
    from feastkit_tpu.solvers.sparse import feast_scsrev
    n = 120
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 0.8)])
    r = feast_scsrev(A, 0.5, 0.8, len(exp) + 4)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_general_solver_through_packed_path(forced_packed):
    from feastkit_tpu.solvers.dense_general import feast_geev
    lam_true = np.array([0.5 + 0.1j, 0.7 - 0.2j, 3.0 + 1.0j])
    A = np.diag(lam_true)
    r = feast_geev(A, 0.6 + 0.0j, 0.4, 3)
    assert r.M == 2
    assert np.iscomplexobj(r.lam)


def test_dense_host_loop_path(forced_packed, monkeypatch):
    """The axon driving mode: host-driven refinement loop with small jitted
    factor/body/verify programs, matching the fused-path results."""
    monkeypatch.setenv("FEAST_FUSED_SMALL_N", "0")   # force the host loop
    from feastkit_tpu.solvers.dense import feast_syev
    import feastkit_tpu.utils.cio as _cio
    n = 60
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = feast_syev(A, 0.5, 1.5, len(exp) + 3)       # host loop (forced)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10


def test_dense_fused_small_matches_host_loop(forced_packed, monkeypatch):
    """On remote attachments, N <= fused_small_n runs the single fused
    whole-refinement program (one synchronization round trip); it must
    agree with the host-driven loop on the same problem."""
    from feastkit_tpu.solvers.dense import feast_syev
    n = 60
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r_fused = feast_syev(A, 0.5, 1.5, len(exp) + 3)  # default: fused (n<=256)
    monkeypatch.setenv("FEAST_FUSED_SMALL_N", "0")
    r_host = feast_syev(A, 0.5, 1.5, len(exp) + 3)   # host loop
    assert r_fused.M == r_host.M == len(exp)
    assert np.abs(np.sort(r_fused.lam) - exp).max() < 1e-10
    assert np.abs(np.sort(r_fused.lam) - np.sort(r_host.lam)).max() < 1e-10


def test_dense_host_loop_hermitian(forced_packed, monkeypatch):
    monkeypatch.setenv("FEAST_FUSED_SMALL_N", "0")   # force the host loop
    from feastkit_tpu.solvers.dense import feast_heev
    rng = np.random.default_rng(1)
    n = 40
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    w = np.linalg.eigvalsh(H)
    Emin, Emax = w[15] - 1e-9, w[25] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    r = feast_heev(H, Emin, Emax, 14)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_device_operand_dense():
    """Device-resident operands (cio.device_operand) produce bitwise the
    same dense result as host numpy operands — the repeated-solve path that
    skips per-dispatch re-uploads on slow-link platforms."""
    from feastkit_tpu.solvers.dense import feast_syev
    n = 60
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = feast_syev(A, 0.5, 1.5, len(exp) + 3)
    r2 = feast_syev(cio.device_operand(A), 0.5, 1.5, len(exp) + 3)
    assert r2.M == r.M == len(exp)
    assert np.array_equal(np.asarray(r.lam), np.asarray(r2.lam))


def test_device_operand_complex_pair(forced_packed, monkeypatch):
    """On complex-I/O-restricted platforms, device_operand returns a
    device-resident ComplexPair; the driver must accept it and match the
    host-operand result through BOTH driving modes (fused small-problem
    program and host-driven loop)."""
    from feastkit_tpu.solvers.dense import feast_heev
    rng = np.random.default_rng(3)
    n = 40
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    w = np.linalg.eigvalsh(H)
    Emin, Emax = w[15] - 1e-9, w[25] + 1e-9
    exp = np.sort(w[(w >= Emin) & (w <= Emax)])
    Hd = cio.device_operand(H)
    assert isinstance(Hd, cio.ComplexPair)
    r = feast_heev(Hd, Emin, Emax, 14)               # fused (n <= 256)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9
    monkeypatch.setenv("FEAST_FUSED_SMALL_N", "0")
    r2 = feast_heev(Hd, Emin, Emax, 14)              # host-driven loop
    assert r2.M == len(exp)
    assert np.abs(np.sort(r2.lam) - exp).max() < 1e-9


def test_fetch_many_packed(forced_packed):
    """fetch_many must round-trip mixed real/complex/int/bool/scalar leaves
    exactly through the single packed transfer."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    lam = jnp.asarray(rng.standard_normal(7).astype(np.float32))
    Q = jnp.asarray((rng.standard_normal((5, 7))
                     + 1j * rng.standard_normal((5, 7))).astype(np.complex64))
    inside = jnp.asarray(np.array([1, 0, 1, 1, 0, 0, 1], np.bool_))
    loop = jnp.asarray(np.int32(4))
    eps = jnp.asarray(np.float32(3.25e-7))
    pair = cio.ComplexPair(jnp.asarray(np.float32([1.5, -2.0])),
                           jnp.asarray(np.float32([0.25, 4.0])))
    out = cio.fetch_many([lam, Q, inside, loop, eps, pair])
    assert np.array_equal(out[0], np.asarray(lam))
    assert np.array_equal(out[1], np.asarray(Q))
    assert out[1].dtype == np.complex64 or np.iscomplexobj(out[1])
    assert np.array_equal(out[2], np.asarray(inside))
    assert out[2].dtype == np.bool_
    assert int(out[3]) == 4
    assert float(out[4]) == float(eps)
    assert np.array_equal(out[5], np.array([1.5 + 0.25j, -2.0 + 4.0j]))


def test_device_operand_general():
    """General (non-Hermitian) driver accepts device-resident operands."""
    from feastkit_tpu.solvers.dense_general import feast_geev
    rng = np.random.default_rng(5)
    n = 40
    d = np.linspace(-1.0, 1.0, n)
    A = np.triu(rng.standard_normal((n, n))
                + 1j * rng.standard_normal((n, n)), 1) * 0.01
    A += np.diag(d)
    r = feast_geev(A, 0.0 + 0.0j, 0.3, 14)
    r2 = feast_geev(cio.device_operand(A.astype(np.complex128)),
                    0.0 + 0.0j, 0.3, 14)
    assert r.M == r2.M > 0
    assert np.abs(np.sort_complex(np.asarray(r.lam))
                  - np.sort_complex(np.asarray(r2.lam))).max() < 1e-8


def test_banded_host_loop_path(forced_packed):
    """The banded remote driving mode: factor-once BCR hierarchy + the
    shared pipelined host loop (first_chunk=1) must match the fused-path
    eigenpairs."""
    from feastkit_tpu.ops.banded import full_to_banded
    from feastkit_tpu.solvers.banded import feast_sbev
    n = 80
    A = laplacian_1d(n)
    Ab = full_to_banded(A, 1, 1)
    w = laplacian_eigs(n)
    exp = np.sort(w[(w >= 0.5) & (w <= 1.5)])
    r = feast_sbev(Ab, 1, 1, 0.5, 1.5, len(exp) + 3)      # host loop (forced)
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-10


def test_general_host_loop_path(forced_packed):
    """The dense-general remote driving mode through the shared pipelined
    host loop (on-device qr eig under forced complex IO)."""
    from feastkit_tpu.solvers.dense_general import feast_geev
    rng = np.random.default_rng(3)
    n = 48
    d = np.linspace(-1.0, 1.0, n)
    A = np.triu(rng.standard_normal((n, n))
                + 1j * rng.standard_normal((n, n)), 1) * (0.01 / np.sqrt(n))
    A = (A + np.diag(d)).astype(np.complex128)
    exp = d[np.abs(d) <= 0.22]
    r = feast_geev(A, 0.0 + 0.0j, 0.22, len(exp) + 6)
    assert r.M == len(exp)
    assert np.abs(np.sort(np.real(r.lam)) - np.sort(exp)).max() < 1e-7


def test_run_pipelined_loop_protocol():
    """Driving semantics of the shared host-loop protocol: chunk sizes,
    speculative finalize per synchronization, max_loops bound."""
    from collections import namedtuple
    S = namedtuple("S", "converged lam Q res inside epsout loop")

    def mk(n_bodies, converge_at):
        calls = {"body": 0, "fin": 0}

        def body(s):
            calls["body"] += 1
            return s._replace(loop=s.loop + 1)

        def fin(s):
            calls["fin"] += 1
            return s._replace(
                converged=np.bool_(s.loop >= converge_at))

        s0 = S(np.bool_(False), np.zeros(2), np.zeros((4, 2)),
               np.zeros(2), np.zeros(2, bool), np.float64(1.0), np.int32(0))
        return s0, body, fin, calls

    # converges within the first 2-body chunk: ONE synchronization
    s0, body, fin, calls = mk(2, converge_at=1)
    _, fetched = cio.run_pipelined_loop(s0, body, fin, max_loops=20)
    assert bool(fetched[0]) and calls == {"body": 2, "fin": 1}

    # first_chunk=1 (banded): converged after one body -> 1 body, 1 finalize
    s0, body, fin, calls = mk(1, converge_at=1)
    _, fetched = cio.run_pipelined_loop(s0, body, fin, max_loops=20,
                                        first_chunk=1)
    assert bool(fetched[0]) and calls == {"body": 1, "fin": 1}

    # never converges: the loop stops once loops_done > max_loops and the
    # body count covers exactly max_loops+1 refinement iterations
    s0, body, fin, calls = mk(0, converge_at=10**9)
    _, fetched = cio.run_pipelined_loop(s0, body, fin, max_loops=3)
    assert not bool(fetched[0]) and calls["body"] == 4

    # first_fused replaces the FIRST chunk only (one fused program =
    # setup + first_chunk bodies + finalize); converged -> no regular
    # body/finalize at all, unconverged -> the regular protocol continues
    # from the carry state
    s0, body, fin, calls = mk(1, converge_at=1)
    fused_calls = {"n": 0}

    def first_fused(s):
        fused_calls["n"] += 1
        mid = s._replace(loop=s.loop + 1)
        return fin(mid), mid

    _, fetched = cio.run_pipelined_loop(s0, body, fin, max_loops=20,
                                        first_chunk=1,
                                        first_fused=first_fused)
    assert bool(fetched[0])
    assert fused_calls == {"n": 1} and calls == {"body": 0, "fin": 1}

    s0, body, fin, calls = mk(1, converge_at=3)
    fused_calls = {"n": 0}
    _, fetched = cio.run_pipelined_loop(s0, body, fin, max_loops=20,
                                        first_chunk=1,
                                        first_fused=first_fused)
    assert bool(fetched[0])
    assert fused_calls == {"n": 1}
    assert calls["body"] == 2        # one regular 2-body chunk after
