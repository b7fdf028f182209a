"""On-device sequence batch ops: negative sampling + CL4SRec/BERT4Rec
augmentations.

Replaces the reference's host loops in util/sampler.py:84-112 (per-sequence
``sample`` of negatives rejected against the input window) and
data/augmentor.py:43-74 / BERT4Rec.py:46-55 (crop / reorder / mask), with
vectorised static-shape jnp ops keyed by threaded PRNG. Distributional notes:
- negatives: the reference draws a without-replacement sample per sequence
  and redraws the whole sample until it has NO overlap with the window; we
  draw per-position uniforms in [1, item_num] and redraw colliding positions
  for a fixed number of rounds (window membership checked by direct
  comparison against the <=50-item window). Within-sequence duplicates are
  possible but rare (window << catalog); collision probability after R
  rounds is (L/|I|)^R.
- mask/crop/reorder use rank-of-uniform tricks to pick exact reference
  counts (floor(len*ratio) etc.) with distinct positions.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("item_num", "n_rounds"))
def sample_seq_negatives(
    key: jax.Array, seq: jnp.ndarray, item_num: int, n_rounds: int = 4
) -> jnp.ndarray:
    """Per-position negatives in [1, item_num], not present in the row's
    window; 0 at pad positions. seq: (B, L) with 0 = pad."""
    b, l = seq.shape
    keys = jax.random.split(key, n_rounds)
    neg = jax.random.randint(keys[0], (b, l), 1, item_num + 1, dtype=seq.dtype)

    def in_window(cand):
        return jnp.any(cand[:, :, None] == seq[:, None, :], axis=-1)

    def body(r, neg):
        fresh = jax.random.randint(
            jax.random.fold_in(keys[-1], r), (b, l), 1, item_num + 1, dtype=seq.dtype
        )
        return jnp.where(in_window(neg), fresh, neg)

    neg = jax.lax.fori_loop(1, n_rounds, body, neg)
    return jnp.where(seq != 0, neg, 0)


def _rand_starts(key, seq_len, span):
    """start ~ U{0, .., seq_len - span - 1} per row (reference
    augmentor.py:52,64: sample(range(len - floor(len*ratio)), 1))."""
    hi = jnp.maximum(seq_len - span, 1)
    u = jax.random.uniform(key, seq_len.shape)
    return (u * hi).astype(jnp.int32)


def item_crop(key, seq, seq_len, crop_ratio) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Contiguous crop of floor(len*ratio)+1 items starting uniformly, new
    positions 1..crop_len (reference augmentor.py:48-58).
    Returns (aug_seq, aug_pos, aug_len)."""
    b, l = seq.shape
    span = jnp.floor(seq_len * crop_ratio).astype(jnp.int32)
    crop_len = span + 1
    start = _rand_starts(key, seq_len, span)
    idx = jnp.arange(l)[None, :] + start[:, None]
    gathered = jnp.take_along_axis(seq, jnp.clip(idx, 0, l - 1), axis=1)
    keep = jnp.arange(l)[None, :] < crop_len[:, None]
    aug_seq = jnp.where(keep, gathered, 0)
    aug_pos = jnp.where(keep, jnp.arange(1, l + 1)[None, :], 0)
    return aug_seq, aug_pos, crop_len


def item_reorder(key, seq, seq_len, reorder_ratio) -> jnp.ndarray:
    """Shuffle a random span of floor(len*ratio)+1 items in place
    (reference augmentor.py:61-66)."""
    b, l = seq.shape
    k_start, k_perm = jax.random.split(key)
    span = jnp.floor(seq_len * reorder_ratio).astype(jnp.int32)
    start = _rand_starts(k_start, seq_len, span)
    posn = jnp.arange(l)[None, :].astype(jnp.float32)
    in_span = (posn >= start[:, None]) & (posn <= (start + span)[:, None])
    u = jax.random.uniform(k_perm, (b, l))
    # composite sort key: random rank inside the span, identity outside
    sort_key = jnp.where(in_span, start[:, None] + u * (span[:, None] + 1), posn)
    order = jnp.argsort(sort_key, axis=1)
    return jnp.take_along_axis(seq, order, axis=1)


def _pick_k_positions(key, seq_len, k_counts, l):
    """Boolean (B, L) mask with exactly k_counts[b] distinct positions chosen
    uniformly from [0, seq_len[b]) per row."""
    u = jax.random.uniform(key, (seq_len.shape[0], l))
    u = jnp.where(jnp.arange(l)[None, :] < seq_len[:, None], u, jnp.inf)
    rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)  # rank of each position
    return rank < k_counts[:, None]


def item_mask(key, seq, seq_len, mask_ratio, mask_idx) -> jnp.ndarray:
    """Replace floor(len*ratio) random positions with the mask token
    (reference augmentor.py:69-74)."""
    k = jnp.floor(seq_len * mask_ratio).astype(jnp.int32)
    chosen = _pick_k_positions(key, seq_len, k, seq.shape[1])
    return jnp.where(chosen, mask_idx, seq)


def bert_mask(key, seq, seq_len, mask_ratio, mask_idx):
    """BERT4Rec's masking (BERT4Rec.py:46-55): max(floor(len*ratio), 1)
    positions; returns (aug_seq, masked_flags)."""
    k = jnp.maximum(jnp.floor(seq_len * mask_ratio).astype(jnp.int32), 1)
    chosen = _pick_k_positions(key, seq_len, k, seq.shape[1])
    return jnp.where(chosen, mask_idx, seq), chosen
