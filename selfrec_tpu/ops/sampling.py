"""On-device negative sampling.

Replaces the reference's single-threaded host rejection loop
(/root/reference/util/sampler.py:23-27: resample while the candidate is in
the user's training set) with a vectorised, jit-compiled sampler: draw
uniform candidates, test membership with a batched binary search over the
per-user sorted rated-item CSR, and redraw colliding lanes for a fixed
number of rounds. With per-user interaction density p, the probability a
lane still collides after R rounds is p^(R+1) — statistically
indistinguishable from exact rejection sampling for recommendation densities
(SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def searchsorted_in_segments(
    flat_sorted: jnp.ndarray,
    offsets: jnp.ndarray,
    seg_ids: jnp.ndarray,
    values: jnp.ndarray,
    n_search_steps: int,
) -> jnp.ndarray:
    """Vectorised membership test: values[k] in flat_sorted[offsets[s]:offsets[s+1])
    where s = seg_ids[k]. Binary search, ``n_search_steps`` >= ceil(log2(max
    segment length + 1)) iterations (static).
    """
    lo = offsets[seg_ids]
    hi = offsets[seg_ids + 1]
    hi0 = hi
    size = flat_sorted.shape[0]

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        mid_val = flat_sorted[jnp.clip(mid, 0, size - 1)]
        go_right = mid_val < values
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_search_steps, body, (lo, hi))
    in_range = lo < hi0
    found = jnp.where(in_range, flat_sorted[jnp.clip(lo, 0, size - 1)] == values, False)
    return found


@partial(jax.jit, static_argnames=("n_items", "n_rounds", "n_search_steps", "shape"))
def sample_negatives(
    key: jax.Array,
    user_idx: jnp.ndarray,
    rated_items: jnp.ndarray,
    rated_offsets: jnp.ndarray,
    n_items: int,
    shape: Tuple[int, ...],
    n_rounds: int = 8,
    n_search_steps: int = 16,
) -> jnp.ndarray:
    """Uniform negatives for each (user, slot) in ``shape`` = (B,) or (B, n_negs).

    Resamples lanes that hit a rated item for ``n_rounds`` rounds.
    """
    users = user_idx.reshape(-1)
    if len(shape) == 2:
        users = jnp.repeat(users, shape[1])
    keys = jax.random.split(key, n_rounds + 1)
    cand = jax.random.randint(keys[0], users.shape, 0, n_items, dtype=jnp.int32)

    def round_fn(r, cand):
        bad = searchsorted_in_segments(
            rated_items, rated_offsets, users, cand, n_search_steps
        )
        fresh = jax.random.randint(
            jax.random.fold_in(keys[-1], r), users.shape, 0, n_items, dtype=jnp.int32
        )
        return jnp.where(bad, fresh, cand)

    cand = jax.lax.fori_loop(0, n_rounds, round_fn, cand)
    return cand.reshape(shape)


def pack_rated_bitmap(rated_offsets, rated_items, n_users: int,
                      n_items: int):
    """Host-side one-time pack of the per-user rated-item sets into a
    (U, ceil(I/32)) uint32 bitmap.

    Membership then costs ONE 32-bit gather + bit test per candidate
    instead of a ~log2(nnz)-step binary search over the CSR — for
    wide-negative samplers (MixGCF n_negs=64: 131k lanes/batch) that is
    ~22x less random-gather traffic on the TPU, whose gathers are
    latency-bound (BASELINE.md round 2). Yelp-scale cost: 31,668 x 1,189
    uint32 = 150 MB HBM."""
    import numpy as np

    words = (n_items + 31) // 32
    bm = np.zeros((n_users, words), np.uint32)
    items = np.asarray(rated_items)
    rows = np.repeat(np.arange(n_users), np.diff(np.asarray(rated_offsets)))
    np.bitwise_or.at(
        bm, (rows, items >> 5),
        (np.uint32(1) << (items & 31).astype(np.uint32)))
    return bm


@partial(jax.jit, static_argnames=("n_items", "n_rounds", "shape"))
def sample_negatives_bitmap(
    key: jax.Array,
    user_idx: jnp.ndarray,
    rated_bitmap: jnp.ndarray,
    n_items: int,
    shape: Tuple[int, ...],
    n_rounds: int = 8,
) -> jnp.ndarray:
    """``sample_negatives`` with the packed-bitmap membership test — same
    rejection semantics (reference sampler.py:23-27; residual collision
    probability p^(n_rounds+1) per lane), one gather+mask per candidate
    instead of a binary search. Preferred for wide-negative models when
    the bitmap fits (models/base.py gates by SELFREC_TPU_NEG_BITMAP_MB).

    COMPACTED rejection for wide lane counts (round 4): at recommendation
    densities only ~p*n of the n lanes fail the first probe (yelp scale:
    ~155 of 131k for MixGCF n_negs=64), yet the dense loop re-gathered
    ALL n lanes every round — 8 full random-gather passes, 13.6 ms of a
    37.5 ms MixGCF step. Large-n path: ONE full probe, then
    ``jnp.nonzero(size=K)`` compacts the failing lanes into a fixed-K
    buffer and the remaining rounds probe/redraw only those K lanes
    (K = max(2048, n/16) static), scattered back with out-of-bounds pad
    drops. If MORE than K lanes fail the first probe (pathological
    density — Poisson(155) mass above 2048 is ~e^-1000 at yelp scale) a
    ``lax.cond`` falls back to the dense all-lanes loop, so the semantics
    match the dense loop exactly at EVERY density."""
    users = user_idx.reshape(-1)
    if len(shape) == 2:
        users = jnp.repeat(users, shape[1])
    n = users.shape[0]
    keys = jax.random.split(key, 2)
    cand = jax.random.randint(keys[0], users.shape, 0, n_items,
                              dtype=jnp.int32)

    def bad_of(u, c):
        word = rated_bitmap[u, c >> 5]
        return ((word >> (c & 31).astype(jnp.uint32)) & 1) != 0

    def dense_rounds(cand):
        def round_fn(r, cand):
            fresh = jax.random.randint(
                jax.random.fold_in(keys[1], r), users.shape, 0, n_items,
                dtype=jnp.int32)
            return jnp.where(bad_of(users, cand), fresh, cand)

        return jax.lax.fori_loop(0, n_rounds, round_fn, cand)

    compact_k = max(2048, n // 16)
    if n <= 4 * compact_k:
        # narrow batches: the dense loop is already gather-cheap
        return dense_rounds(cand).reshape(shape)

    bad = bad_of(users, cand)

    def compact_rounds(cand):
        (idx,) = jnp.nonzero(bad, size=compact_k, fill_value=n)
        valid = idx < n
        safe = jnp.minimum(idx, n - 1)
        sub_u = users[safe]
        sub_c = cand[safe]

        def round_fn(r, sub_c):
            sbad = bad_of(sub_u, sub_c) & valid
            fresh = jax.random.randint(
                jax.random.fold_in(keys[1], r), sub_c.shape, 0, n_items,
                dtype=jnp.int32)
            return jnp.where(sbad, fresh, sub_c)

        sub_c = jax.lax.fori_loop(0, n_rounds, round_fn, sub_c)
        # pad slots carry idx == n and are dropped by the scatter
        return cand.at[idx].set(sub_c, mode="drop")

    cand = jax.lax.cond(bad.sum() <= compact_k, compact_rounds,
                        dense_rounds, cand)
    return cand.reshape(shape)


def unique_with_mask(idx: jnp.ndarray, size: int):
    """Deduplicate a 1D index array under jit (static output size).

    Returns (padded unique ids, validity mask). Matches the semantics of the
    reference's ``torch.unique`` in SimGCL.cal_cl_loss (SimGCL.py:44-45):
    contrastive anchors are the distinct users/items of the batch.
    """
    uniq = jnp.unique(idx, size=size, fill_value=-1)
    mask = uniq >= 0
    return jnp.where(mask, uniq, 0), mask


def epoch_pointwise_batches(
    rng,
    edge_users,
    edge_items,
    n_items: int,
    batch_size: int,
    n_negs: int = 4,
):
    """Pointwise epoch batches: each positive followed by ``n_negs``
    uniform negatives labeled 0 (reference util/sampler.py:31-55 — unused by
    the shipped models but part of the public sampler surface). Returns
    (users, items, labels, mask) of shape (n_batches, batch_size). Negatives
    here are uniform over the catalog; exact rated-item exclusion is applied
    on device by ops.sampling.sample_negatives when needed."""
    import numpy as np

    n = len(edge_users)
    perm = rng.permutation(n)
    group = 1 + n_negs
    users = np.repeat(edge_users[perm], group)
    items = np.empty(n * group, dtype=np.int32)
    items[::group] = edge_items[perm]
    labels = np.zeros(n * group, dtype=np.float32)
    labels[::group] = 1.0
    for k in range(1, group):
        items[k::group] = rng.integers(0, n_items, n, dtype=np.int32)
    total = n * group
    n_batches = -(-total // batch_size)
    pad = n_batches * batch_size - total
    users = np.concatenate([users, np.zeros(pad, np.int32)])
    items = np.concatenate([items, np.zeros(pad, np.int32)])
    labels = np.concatenate([labels, np.zeros(pad, np.float32)])
    mask = np.concatenate([np.ones(total, np.float32), np.zeros(pad, np.float32)])
    shape = (n_batches, batch_size)
    return (
        users.reshape(shape),
        items.reshape(shape),
        labels.reshape(shape),
        mask.reshape(shape),
    )


def epoch_pairwise_batches(
    rng,
    edge_users,
    edge_items,
    batch_size: int,
):
    """Host-side epoch batching: shuffle the edge list once per epoch and cut
    into fixed-size batches (last batch padded, with a validity mask).

    Returns numpy arrays of shape (n_batches, batch_size) for users, items,
    and a float mask — designed to be transferred to device once per epoch
    and consumed by a lax.scan over batches.
    Mirrors reference util/sampler.py:5-18 (shuffle + sequential slices).
    """
    import numpy as np

    n = len(edge_users)
    perm = rng.permutation(n)
    n_batches = -(-n // batch_size)
    padded = n_batches * batch_size
    pad = padded - n
    users = np.concatenate([edge_users[perm], np.zeros(pad, dtype=np.int32)])
    items = np.concatenate([edge_items[perm], np.zeros(pad, dtype=np.int32)])
    mask = np.concatenate(
        [np.ones(n, dtype=np.float32), np.zeros(pad, dtype=np.float32)]
    )
    return (
        users.reshape(n_batches, batch_size),
        items.reshape(n_batches, batch_size),
        mask.reshape(n_batches, batch_size),
    )


@partial(jax.jit, static_argnames=("batch_size",))
def epoch_pairwise_batches_device(key, edge_users, edge_items,
                                  batch_size: int):
    """Device-side twin of :func:`epoch_pairwise_batches`: uniform
    permutation of the resident edge arrays + fixed-size batch reshape,
    entirely on device — the host version shipped ~12 bytes/example over
    the (slow) host link every epoch, which dominated the lightest
    models' epochs (MF: ~0.5 s of a 1.2 s epoch at yelp scale, round 4).

    Same distribution (uniform shuffle) as the host path; the RNG stream
    moves from numpy to jax.random, keyed as a pure function of
    (seed, epoch) by the caller, so checkpoint-resume exactness is
    preserved. `SELFREC_TPU_HOST_BATCHES=1` forces the host path back on
    for A/B comparison.
    """
    n = edge_users.shape[0]
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    perm = jax.random.permutation(key, n)
    users = jnp.pad(edge_users.astype(jnp.int32)[perm], (0, pad))
    items = jnp.pad(edge_items.astype(jnp.int32)[perm], (0, pad))
    mask = jnp.pad(jnp.ones(n, jnp.float32), (0, pad))
    return (
        users.reshape(n_batches, batch_size),
        items.reshape(n_batches, batch_size),
        mask.reshape(n_batches, batch_size),
    )
