"""Backend selection and capability reporting.

Counterpart of the reference's ``src/core/feast_backend_utils.jl``:
determine_parallel_backend (:17-50), _select_parallel_backend strict/fallback
(:52-68), feast_with_backend routing (:103-121), feast_serial dispatch
(:166-198), feast_parallel_capabilities/info (:212-278).

On TPU the three reference backends (threads / Distributed / MPI) collapse
into ONE: the contour-sharded device mesh (parallel/pfeast.py). Selection
therefore reduces to serial vs sharded, with availability = len(jax.devices())
and the same strict-vs-fallback error-message contract.
"""
from __future__ import annotations

import warnings

import jax

__all__ = ["determine_parallel_backend", "select_parallel_backend",
           "feast_parallel_capabilities", "feast_parallel_info"]

_BACKENDS = ("auto", "serial", "sharded")
_LEGACY = {"threads": "sharded", "distributed": "sharded", "mpi": "sharded"}


def _n_devices() -> int:
    return len(jax.devices())


def determine_parallel_backend(backend="auto") -> str:
    """:auto/:serial/:sharded (legacy :threads/:distributed/:mpi accepted)
    with availability fallback (determine_parallel_backend,
    feast_backend_utils.jl:17-50)."""
    b = str(backend).lstrip(":")
    b = _LEGACY.get(b, b)
    if b not in _BACKENDS:
        raise ValueError(f"Unknown backend {backend!r}; valid: "
                         f"{_BACKENDS + tuple(_LEGACY)}")
    if b == "auto":
        return "sharded" if _n_devices() > 1 else "serial"
    if b == "sharded" and _n_devices() < 2:
        return "serial"
    return b


def select_parallel_backend(backend, *, allow_fallback=True) -> str:
    """Strict selection: throws actionable errors when the requested backend
    is unavailable and fallback is disabled (_select_parallel_backend,
    feast_backend_utils.jl:52-68)."""
    b = str(backend).lstrip(":")
    b = _LEGACY.get(b, b)
    if b not in _BACKENDS:
        raise ValueError(f"Unknown backend {backend!r}")
    if b == "sharded" and _n_devices() < 2:
        if not allow_fallback:
            raise RuntimeError(
                f"backend='sharded' requires >= 2 devices but only "
                f"{_n_devices()} visible. Run under a multi-chip mesh, or "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "with the CPU platform for testing.")
        warnings.warn("backend='sharded' unavailable (single device); "
                      "falling back to serial", stacklevel=2)
        return "serial"
    return "serial" if b == "auto" and _n_devices() < 2 else (
        "sharded" if b == "auto" else b)


def feast_parallel_capabilities() -> dict:
    """Capability report (feast_parallel_capabilities,
    feast_backend_utils.jl:212-278)."""
    devs = jax.devices()
    return {
        "n_devices": len(devs),
        "platform": devs[0].platform if devs else "none",
        "backends": {
            "serial": True,
            "sharded": len(devs) > 1,
        },
        "device_kinds": sorted({d.device_kind for d in devs}),
    }


def feast_parallel_info(file=None):
    import sys
    file = file or sys.stdout
    caps = feast_parallel_capabilities()
    print("FEAST parallel capabilities:", file=file)
    print(f"  platform      : {caps['platform']}", file=file)
    print(f"  devices       : {caps['n_devices']} "
          f"({', '.join(caps['device_kinds'])})", file=file)
    for k, v in caps["backends"].items():
        print(f"  backend {k:<8}: {'available' if v else 'unavailable'}",
              file=file)
    return caps
