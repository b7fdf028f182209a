"""Distributed full-rank top-k (SURVEY.md §2.4 "distributed full-rank
eval" row).

With the item table row-sharded over the ``model`` axis, naive
``top_k(U @ Vᵀ)`` forces XLA to materialise each user block's FULL score row
on every device (all-gather of B x n_items floats). This shard_map kernel
keeps scores shard-local: each model-shard scores its item slice, applies
its slice of the rated-item mask, takes a LOCAL top-k, and only the k
(score, global-id) pairs per shard cross the ICI — an n_items/k traffic
reduction — before a final merge top-k over the concatenated candidates.

Correctness does not depend on shard balance: local ids are offset by the
shard's row start, and the global top-k is contained in the union of local
top-ks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from selfrec_tpu.parallel.mesh import MODEL_AXIS
from selfrec_tpu.ops.ranking import MASK_VALUE


def make_sharded_topk(mesh, n_items: int, k: int):
    """Returns fn(user_block (B,D) replicated, item_emb (I,D) row-sharded,
    mask_rows, mask_cols, -> (scores (B,k), ids (B,k))). ``n_items`` must be
    divisible by the model-axis size (caller falls back otherwise)."""
    n_shards = mesh.shape[MODEL_AXIS]
    shard_rows = n_items // n_shards

    def local_fn(u_block, item_shard, mask_rows, mask_cols):
        # shard-local scores on the MXU
        scores = jnp.dot(
            u_block, item_shard.T, preferred_element_type=jnp.float32
        )
        shard_id = jax.lax.axis_index(MODEL_AXIS)
        lo = shard_id * shard_rows
        # rated-item mask entries belonging to this shard
        local_cols = mask_cols - lo
        in_shard = (local_cols >= 0) & (local_cols < shard_rows)
        rows = jnp.where(in_shard, mask_rows, u_block.shape[0])  # drop
        cols = jnp.where(in_shard, local_cols, 0)
        scores = scores.at[rows, cols].set(MASK_VALUE, mode="drop")
        top_s, top_i = jax.lax.top_k(scores, k)
        return top_s, (top_i + lo).astype(jnp.int32)

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P(), P()),
        out_specs=(P(None, MODEL_AXIS), P(None, MODEL_AXIS)),
    )

    @jax.jit
    def sharded_topk(u_block, item_emb, mask_rows, mask_cols):
        cand_s, cand_i = mapped(u_block, item_emb, mask_rows, mask_cols)
        # (B, n_shards*k) candidates -> global top-k
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return top_s, top_i

    return sharded_topk
