"""Contour-point parallelism over a device mesh (the PFEAST replacement).

Run with 8 virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/sharded_contour.py
"""
import numpy as np

import jax

if len(jax.devices()) < 2:
    jax.config.update("jax_platforms", "cpu")

import feastkit_tpu as fk

n = 500
A = (np.diag(2.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1)
     + np.diag(-np.ones(n - 1), -1))

out = fk.feast_parallel_comparison(A, None, (0.5, 1.5), 40)
print(out)
