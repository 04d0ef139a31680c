"""Global compute configuration.

Plotfiles store float64; TPU compute defaults to float32 (f64 is emulated and
slow on TPU).  Tools accept ``dtype=`` overrides; tests validate float32
results against float64 numpy references with appropriate tolerances.
"""
from __future__ import annotations

import jax.numpy as jnp

compute_dtype = jnp.float32


def set_compute_dtype(dtype) -> None:
    global compute_dtype
    compute_dtype = dtype
