"""Top-k shrunk-cosine neighbor build on the MXU.

Replaces the per-block edge-scatter SpMM build used by UserKNN/ItemKNN
(reference O(N^2) per-pair Python dict loops:
/root/reference/model/graph/UserKNN.py:14-57, ItemKNN.py:14-56) with a
TPU-native formulation:

- the binary incidence R (n_dst x n_src) is scattered ONCE on device as
  int8 (1 byte/elem — yelp2018-scale R is ~1.2 GB HBM);
- co-occurrence counts for a row block are a native s8 x s8 MXU matmul
  ``R[block] @ R^T`` with exact int32 accumulation (counts are small
  integers, so the f32 cast afterwards is exact — bitwise-identical to
  the scatter-add build it replaces);
- the shrunk cosine ``C/(C+shrink) * C/(sqrt(d_i) sqrt(d_j) + 1e-8)``,
  self-exclusion, and ``lax.top_k`` fuse into the same scan step, so the
  whole build is ONE device dispatch with no host work in the loop.

The old per-block host-row-build + edge-scatter path stays in the models
as the fallback when the dense R exceeds the HBM budget
(``fits_dense``); exact-output parity vs the reference's own loops is
locked by tests/test_knn_reference_h2h.py either way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from selfrec_tpu.ops.spmm_dense import fits_dense_elems

BLOCK = 1024


def dense_available(n_dst: int, n_src: int, block: int = BLOCK) -> bool:
    """HBM gate: int8 R plus the (block, n_dst) f32 scan transient."""
    n_pad = -(-n_dst // block) * block
    return fits_dense_elems(n_pad * n_src, dtype=jnp.int8) and fits_dense_elems(
        block * n_pad, dtype=jnp.float32
    )


@partial(jax.jit, static_argnames=("n_dst", "n_src", "k", "block"))
def _topk_scan(edge_dst, edge_src, degrees, shrinkage, n_dst, n_src, k, block):
    n_blocks = -(-n_dst // block)
    n_pad = n_blocks * block
    r = jnp.zeros((n_pad, n_src), jnp.int8).at[edge_dst, edge_src].set(1)
    sqrt_deg = jnp.sqrt(
        jnp.pad(degrees.astype(jnp.float32), (0, n_pad - n_dst))
    )

    def body(_, b):
        rows = jax.lax.dynamic_slice_in_dim(r, b * block, block, 0)
        common = jax.lax.dot_general(
            rows, r, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)[:, :n_dst]
        ids = b * block + jnp.arange(block)
        # expression order matches the edge-scatter build bit for bit
        raw = common / (
            sqrt_deg[ids][:, None] * sqrt_deg[None, :n_dst] + 1e-8
        )
        sim = common / (common + shrinkage) * raw
        sim = sim.at[
            jnp.arange(block), jnp.clip(ids, 0, n_dst - 1)
        ].set(-jnp.inf)
        top_sim, top_ids = jax.lax.top_k(sim, k)
        return None, (jnp.where(top_sim > 0, top_sim, 0.0), top_ids)

    _, (sims, ids) = jax.lax.scan(body, None, jnp.arange(n_blocks))
    return (
        sims.reshape(n_pad, k)[:n_dst],
        ids.reshape(n_pad, k)[:n_dst].astype(jnp.int32),
    )


def topk_shrunk_cosine(
    edge_dst: np.ndarray,
    edge_src: np.ndarray,
    n_dst: int,
    n_src: int,
    degrees: jnp.ndarray,
    shrinkage: float,
    k: int,
    block: int = BLOCK,
):
    """``(sims, ids)`` of each dst entity's top-``k`` positive shrunk-cosine
    neighbors, or ``None`` when the dense incidence exceeds the HBM budget
    (callers fall back to their blocked edge-scatter build)."""
    if not dense_available(n_dst, n_src, block):
        return None
    return _topk_scan(
        jnp.asarray(edge_dst, jnp.int32),
        jnp.asarray(edge_src, jnp.int32),
        degrees,
        jnp.float32(shrinkage),
        int(n_dst),
        int(n_src),
        int(k),
        int(block),
    )
