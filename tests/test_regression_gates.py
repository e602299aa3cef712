"""Performance regression gates — the analog of the reference's
``@allocated``-ceiling tests (test/runtests.jl:683-870). On a jit-compiled
framework the equivalent guarantees are (a) no recompilation on repeated
same-shape solves (factor/program caches actually hit) and (b) a wall-time
ceiling on the warm path."""
import logging
import time
from contextlib import contextmanager

import numpy as np
import pytest

import jax

from conftest import laplacian_1d, laplacian_eigs


@contextmanager
def count_compiles(out):
    """Count XLA compilations via the jax_log_compiles loggers."""
    loggers = [logging.getLogger(n) for n in
               ("jax._src.dispatch", "jax._src.interpreters.pxla")]

    class H(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "ompil" in msg:      # "Compiling ..." / "Finished XLA compilation"
                out.append(msg)

    h = H(level=logging.DEBUG)
    olds = [(lg.level, lg.propagate) for lg in loggers]
    for lg in loggers:
        lg.addHandler(h)
        lg.setLevel(logging.DEBUG)
    try:
        with jax.log_compiles(True):
            yield out
    finally:
        for lg, (lvl, prop) in zip(loggers, olds):
            lg.removeHandler(h)
            lg.setLevel(lvl)


def _problem(n=128):
    A = laplacian_1d(n)
    w = laplacian_eigs(n)
    exp = w[(w >= 0.5) & (w <= 1.5)]
    return A, exp


def test_compile_logger_capture_works():
    """Control case: a known-cold compile MUST be seen by count_compiles.
    Guards against jax renaming its private logger modules, which would
    silently make every no-recompile gate below vacuous."""
    cold = []
    with count_compiles(cold):
        jax.jit(lambda x: x * 3.0 + 1.0)(np.arange(7.0))
    assert len(cold) >= 1, (
        "compile-log capture saw no compilation in a cold control case — "
        "the jax._src logger names have likely changed; update "
        "count_compiles")


def test_no_recompilation_on_repeated_solve():
    """A second same-shape solve must reuse every compiled program (the
    fpm/config is a hashable static; operands differ only in values)."""
    from feastkit_tpu import feast

    A, exp = _problem()
    feast(A, interval=(0.5, 1.5), M0=24)            # compile + warm
    first, second = [], []
    with count_compiles(first):
        feast(A, interval=(0.5, 1.5), M0=24)
    with count_compiles(second):
        feast(A + 1e-9 * np.eye(A.shape[0]), interval=(0.5, 1.5), M0=24)
    assert len(first) == 0, f"recompiled on identical call: {first[:3]}"
    assert len(second) == 0, f"recompiled on same-shape call: {second[:3]}"


@pytest.mark.slow
def test_warm_solve_wall_time_ceiling():
    """Warm dense solve ceiling — generous (CI machines vary; marked slow
    since shared-runner load makes any wall-clock gate inherently noisy)
    but fails on order-of-magnitude regressions (e.g. a python loop
    sneaking into the hot path or caches stopping to hit)."""
    from feastkit_tpu import feast

    A, exp = _problem()
    M0 = len(exp) + 7
    r = feast(A, interval=(0.5, 1.5), M0=M0)        # warm-up + correctness
    assert r.M == len(exp)
    t0 = time.perf_counter()
    for _ in range(3):
        feast(A, interval=(0.5, 1.5), M0=M0)
    dt = (time.perf_counter() - t0) / 3
    assert dt < 4.0, f"warm dense solve took {dt:.2f}s (ceiling 4.0s)"


@pytest.mark.slow
def test_sparse_warm_no_recompile():
    """The sparse driver's statics (offsets, stencil plan, solver knobs)
    must be stable across same-structure calls — a changed static would
    silently recompile every refinement loop."""
    import scipy.sparse as sp
    from feastkit_tpu.solvers.sparse import feast_scsrev

    n = 200
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    feast_scsrev(A, 0.1, 0.3, 12)
    logs = []
    with count_compiles(logs):
        feast_scsrev(A * 1.0, 0.1, 0.3, 12)
    assert len(logs) == 0, f"sparse driver recompiled: {logs[:3]}"
