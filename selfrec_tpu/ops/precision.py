"""Compute-precision policy for the propagation hot path.

TPU HBM bandwidth is the SpMM bottleneck; casting the gathered embedding
rows to bfloat16 halves the traffic while the einsum accumulates in float32
on the MXU. Policy is process-global, set once at model build from the
``compute.dtype`` config key (``float32`` default, ``bfloat16`` opt-in) —
BEFORE the first trace; changing it later would not invalidate compiled
functions.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_COMPUTE_DTYPE: Optional[jnp.dtype] = None

_NAMES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    if isinstance(dtype, str):
        dtype = _NAMES[dtype.lower()]
    _COMPUTE_DTYPE = None if dtype == jnp.float32 else dtype


def compute_dtype():
    """The reduced dtype for gather/matmul inputs, or None for pure f32."""
    return _COMPUTE_DTYPE
