"""Device mesh + sharding utilities.

The scale-out layer the reference lacks entirely (SURVEY.md §2.4: no
DP/TP/PP/EP, no torch.distributed — single ``.cuda()`` device). TPU-native
design: one global ``jax.sharding.Mesh`` with axes

- ``data``  — batch/edge axis (DP): pairwise batches, sampler lanes, eval
  user blocks are sharded here.
- ``model`` — table-row axis (the RecSys analog of TP/EP): user/item
  embedding tables are row-sharded here; lookups and SpMM gathers become XLA
  all-gathers/all-to-alls over ICI, inserted by GSPMD from the sharding
  annotations rather than hand-written collectives.

Everything goes through NamedSharding + jit (GSPMD) — no per-device
manual code. A ``seq`` axis is reserved in name only (SURVEY.md §5:
sequence length 50 needs no CP/ring attention; the axis can be added to the
mesh without touching model code).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    n_data: Optional[int] = None,
    n_model: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults: all devices on ``data`` (pure DP) — the right default for
    embedding tables that fit one chip; pass ``n_model`` > 1 to row-shard
    tables across chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = n, 1
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    if n_data * n_model > n:
        raise ValueError(f"mesh {n_data}x{n_model} needs more than {n} devices")
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded embedding table placement: (rows/model, emb)."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Per-step batch placement: leading dim over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def scan_batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Whole-epoch batch stack (n_batches, batch, ...): batch dim over
    ``data``; the scanned leading dim stays unsharded."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    """Adjacency edge-array placement: edges over ``data`` (partial
    segment-sums per shard; GSPMD inserts the psum)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]


def place_first_dim(x, mesh: Mesh, axis: str):
    """device_put with the first dim sharded over ``axis`` when divisible;
    replicated otherwise (explicit device_put — unlike GSPMD propagation
    inside jit — requires evenly divisible global shapes)."""
    n = axis_size(mesh, axis)
    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0:
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_params(params, mesh: Mesh):
    """Place a params pytree on the mesh: 2D (rows, emb) leaves row-sharded
    over ``model`` when rows divide evenly, everything else replicated."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim == 2:
            return place_first_dim(x, mesh, MODEL_AXIS)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)
