"""Profiling / benchmarking utilities.

Strict upgrade over the reference's ad-hoc @elapsed printers
(pfeast_benchmark feast_parallel.jl:754-805, pfeast_rci_benchmark
feast_parallel_rci.jl:393-444, mpi_feast_benchmark feast_mpi.jl:1276-1322,
feast_parallel_comparison feast_mpi_interface.jl:181-249), per SURVEY.md
section 5: jax.profiler traces + per-phase wall timers, keeping the fpm[1]
print_level contract.
"""
from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["phase_timer", "FeastTimer", "trace_to", "feast_benchmark",
           "feast_parallel_comparison"]


class FeastTimer:
    """Accumulates named phase timings (wall clock, device-synced)."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) \
                + (time.perf_counter() - t0)

    def report(self, file=None):
        import sys
        file = file or sys.stdout
        total = sum(self.phases.values())
        print("FEAST phase timings:", file=file)
        for k, v in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * v / total if total else 0.0
            print(f"  {k:<24} {v:9.4f} s  ({pct:5.1f}%)", file=file)
        print(f"  {'total':<24} {total:9.4f} s", file=file)
        return self.phases


@contextlib.contextmanager
def phase_timer(name: str, *, print_level: int = 1, file=None):
    """One-off timer gated by the fpm[1] print-level contract."""
    import sys
    file = file or sys.stdout
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if print_level > 0:
            print(f"[feast] {name}: {time.perf_counter() - t0:.4f} s",
                  file=file)


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace context — view in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(x):
    jax.block_until_ready(x)
    return x


def feast_benchmark(fn, *args, warmup: int = 1, repeats: int = 3, **kw) -> dict:
    """min/mean wall time of fn(*args, **kw) with device sync
    (pfeast_benchmark analog)."""
    for _ in range(warmup):
        _sync(fn(*args, **kw))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return {"min_s": min(times), "mean_s": sum(times) / len(times),
            "repeats": repeats}


def feast_parallel_comparison(A, B, interval, M0, fpm=None, file=None) -> dict:
    """serial vs sharded wall-clock comparison on the same problem
    (feast_parallel_comparison, feast_mpi_interface.jl:181-249)."""
    import sys
    from ..interfaces.feast import feast
    file = file or sys.stdout
    out = {}
    for backend in ("serial", "sharded"):
        t0 = time.perf_counter()
        r = feast(A, B, interval, M0, fpm, backend=backend)
        out[backend] = {"time_s": time.perf_counter() - t0, "M": r.M,
                        "epsout": r.epsout, "loops": r.loop}
    s, p = out["serial"]["time_s"], out["sharded"]["time_s"]
    out["speedup"] = s / p if p > 0 else float("inf")
    print(f"serial {s:.4f} s vs sharded {p:.4f} s -> speedup "
          f"{out['speedup']:.2f}x", file=file)
    return out
