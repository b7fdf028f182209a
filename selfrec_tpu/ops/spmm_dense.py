"""Dense-bipartite adjacency propagation — the MXU fast path for mid-size graphs.

The symmetric normalized Laplacian every LightGCN-family model propagates over
(reference /root/reference/data/ui_graph.py:58-65, consumed by e.g.
model/graph/LightGCN.py:72) is bipartite: the (U+I)x(U+I) matrix has nonzeros
only in its U-x-I block A and its transpose. Propagation is therefore two
dense matmuls

    out_users = A @ x_items        out_items = A.T @ x_users

over ONE stored (U, I) buffer. Why this beats the sparse paths on TPU:

- The row-split ELL gather chain (ops/spmm_ell.py) is per-slot-overhead
  bound: ~12-20% of v5e HBM peak (BANDWIDTH.json), because a vectorized
  gather never tiles onto the MXU and this toolchain's Mosaic gather is
  broken (ops/spmm_pallas.py).
- A dense matmul streams the adjacency at near-peak HBM bandwidth and the
  cost is INDEPENDENT of the operand width D — every packed/fused
  multi-chain propagation (SimGCL's 3 chains, SGL's views) rides free,
  where the ELL path pays ~1.7x going D=64 -> D=192.
- Stored bf16, accumulated f32 on the MXU (`preferred_element_type`), the
  buffer is U*I*2 bytes — 2.4 GB at yelp2018 scale, well inside one v5e's
  16 GB. `fits_dense` gates on a budget; bigger graphs (douban social
  motifs etc.) stay on ELL.

The matrix is built ON DEVICE by scattering the edge list (nnz * 12 bytes
host->device, not U*I*2), so setup cost is one scatter, and per-epoch
reweighted views (edge dropout) can rebuild it cheaply on device too.

Numerics: adjacency values and the streamed operand are bf16 (~3 significant
decimal digits); accumulation is f32. This is a documented deviation from
the reference's f32 sparse matmul — per-entry relative error ~4e-3 averages
down over node degree in each f32 row-sum, and converged quality is
validated head-to-head in PARITY.md. Set ``SELFREC_TPU_DENSE=0`` (or dtype
``SELFREC_TPU_DENSE_DTYPE=float32``) to fall back.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _dense_dtype():
    name = os.environ.get("SELFREC_TPU_DENSE_DTYPE", "bfloat16")
    return jnp.dtype(name)


@jax.tree_util.register_pytree_node_class
class DenseAdj:
    """Bipartite normalized adjacency held as a dense (U, I) block.

    Carries the original edge arrays so dropout/reweighted views can rebuild
    the dense block on device (see :meth:`reweight`). Pytree children are
    the device arrays; (n_users, n_items) are static so jitted consumers
    specialise on the shapes.
    """

    def __init__(self, a_ui: jnp.ndarray, edge_users: jnp.ndarray,
                 edge_items: jnp.ndarray, edge_w: jnp.ndarray,
                 n_users: int, n_items: int):
        self.a_ui = a_ui
        self.edge_users = edge_users
        self.edge_items = edge_items
        self.edge_w = edge_w  # f32 per-edge weights, original edge order
        self.n_users = n_users
        self.n_items = n_items
        self.n_nodes = n_users + n_items

    def tree_flatten(self):
        return ((self.a_ui, self.edge_users, self.edge_items, self.edge_w),
                (self.n_users, self.n_items))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    def reweight(self, w: jnp.ndarray) -> "DenseAdj":
        """New DenseAdj with per-edge weights ``w`` (original edge order) —
        the dense analog of EllAdj.reweight, used by adj_dropout and
        per-epoch renormalized views. One on-device scatter."""
        a = _scatter_dense(self.edge_users, self.edge_items, w,
                           self.n_users, self.n_items, self.a_ui.dtype)
        return DenseAdj(a, self.edge_users, self.edge_items, w,
                        self.n_users, self.n_items)

    def __repr__(self):
        return (f"DenseAdj(U={self.n_users}, I={self.n_items}, "
                f"dtype={self.a_ui.dtype}, "
                f"{self.a_ui.nbytes / 1e9:.2f} GB)")


def _scatter_dense(edge_users, edge_items, w, n_users, n_items, dtype):
    zeros = jnp.zeros((n_users, n_items), dtype=dtype)
    return zeros.at[edge_users, edge_items].set(w.astype(dtype))


def dense_adj_from_edges(edge_users, edge_items, w, n_users: int,
                         n_items: int, dtype=None) -> DenseAdj:
    """Build the dense block on device from (user, item, weight) edges."""
    dtype = _dense_dtype() if dtype is None else dtype
    eu = jnp.asarray(edge_users, dtype=jnp.int32)
    ei = jnp.asarray(edge_items, dtype=jnp.int32)
    w = jnp.asarray(w, dtype=jnp.float32)
    a = _scatter_dense(eu, ei, w, n_users, n_items, dtype)
    return DenseAdj(a, eu, ei, w, n_users, n_items)


def fits_dense(n_users: int, n_items: int) -> bool:
    """Whether the dense block fits the configured budget (default 5 GB)."""
    budget_gb = float(os.environ.get("SELFREC_TPU_DENSE_BUDGET_GB", "5"))
    return n_users * n_items * _dense_dtype().itemsize <= budget_gb * 1e9


def bipartite_blocks(coo, n_users: int):
    """Split a unified (U+I)x(U+I) COO Laplacian into bipartite (u, i, w)
    edge arrays, or None if any nonzero lives in a diagonal block (not
    bipartite — e.g. social or motif graphs)."""
    import numpy as np

    row, col, dat = coo.row, coo.col, coo.data
    upper = (row < n_users) & (col >= n_users)
    lower = (row >= n_users) & (col < n_users)
    if not np.all(upper | lower):
        return None
    eu = row[upper].astype(np.int32)
    ei = (col[upper] - n_users).astype(np.int32)
    return eu, ei, dat[upper].astype(np.float32)


def dense_spmm(adj: DenseAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Unified-node-space propagation: x is ((U+I), D) in [users; items]
    order (same contract as the sparse paths); returns [A @ x_i ; A.T @ x_u].

    Both matmuls stream the SAME (U, I) buffer; the operand is cast to the
    adjacency dtype so the MXU runs native bf16 x bf16 -> f32 (a f32
    operand would force XLA to decompose the matmul into 3x bf16 passes
    and triple the FLOPs for no accuracy it keeps)."""
    xu = x[: adj.n_users].astype(adj.a_ui.dtype)
    xi = x[adj.n_users :].astype(adj.a_ui.dtype)
    out_u = jnp.dot(adj.a_ui, xi, preferred_element_type=jnp.float32)
    out_i = jnp.dot(adj.a_ui.T, xu, preferred_element_type=jnp.float32)
    return jnp.concatenate([out_u, out_i], axis=0).astype(x.dtype)
