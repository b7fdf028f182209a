"""Dense rated-mask eval path vs the scatter path (EVAL_ROOFLINE.json fix).

The rated-pair scatter in the eval scan costs 53 ms/eval at yelp2018 scale;
the resident int8 incidence + where-select replaces it EXACTLY (same
set-to--1e9 semantics as the reference, graph_recommender.py:49). These
tests lock output equality between the two paths, the budget/env gating,
and the opt-in approx top-k plumbing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from selfrec_tpu.config import ModelConf
from selfrec_tpu.data.interaction import Interaction
from selfrec_tpu.ops import ranking
from selfrec_tpu.utils.synth import synth_graph_mapped


@pytest.fixture(scope="module")
def small_interaction():
    conf = ModelConf({
        "training.set": "<synthetic>", "test.set": "<synthetic>",
        "model": {"name": "MF", "type": "graph"},
        "item.ranking.topN": [10, 20], "embedding.size": 16,
        "max.epoch": 1, "batch.size": 128, "learning.rate": 0.001,
        "reg.lambda": 0.0001, "MF": {}, "output": "/tmp/selfrec_test/",
        "seed": 0,
    })
    train, test = synth_graph_mapped(300, 400, 6000, seed=7)
    return Interaction(conf, train, test)


def _fresh(data):
    if hasattr(data, "_rated_dense_cache"):
        del data._rated_dense_cache
    return data


def test_dense_mask_matches_scatter(monkeypatch, small_interaction):
    data = small_interaction
    rng = np.random.default_rng(0)
    ue = rng.normal(size=(data.user_num, 16)).astype(np.float32)
    ie = rng.normal(size=(data.item_num, 16)).astype(np.float32)

    monkeypatch.setenv("SELFREC_TPU_EVAL_MASK", "scatter")
    ids_scatter = ranking.topk_ids_from_embeddings(
        _fresh(data), ue, ie, 10, block_size=64)

    monkeypatch.setenv("SELFREC_TPU_EVAL_MASK", "dense")
    assert ranking.get_rated_dense(_fresh(data)) is not None
    ids_dense = ranking.topk_ids_from_embeddings(data, ue, ie, 10,
                                                 block_size=64)
    np.testing.assert_array_equal(ids_scatter, ids_dense)

    # rec-list assembly path too (string eval artifact)
    rl_dense = ranking.rec_list_from_embeddings(data, ue, ie, 10,
                                                block_size=64)
    monkeypatch.setenv("SELFREC_TPU_EVAL_MASK", "scatter")
    rl_scatter = ranking.rec_list_from_embeddings(_fresh(data), ue, ie, 10,
                                                  block_size=64)
    assert rl_dense == rl_scatter


def test_dense_mask_masks_every_rated_pair(monkeypatch, small_interaction):
    """No rated training item may appear in any user's top-k (the whole
    point of the mask) on the dense path."""
    data = _fresh(small_interaction)
    monkeypatch.setenv("SELFREC_TPU_EVAL_MASK", "dense")
    rng = np.random.default_rng(1)
    ue = rng.normal(size=(data.user_num, 16)).astype(np.float32)
    ie = rng.normal(size=(data.item_num, 16)).astype(np.float32)
    ids = ranking.topk_ids_from_embeddings(data, ue, ie, 10, block_size=64)
    offsets, items = np.asarray(data.rated_offsets), np.asarray(
        data.rated_items)
    for r, u in enumerate(np.asarray(data.test_user_ids)):
        rated = set(items[offsets[u]:offsets[u + 1]].tolist())
        assert not rated.intersection(ids[r].tolist())


def test_budget_gate_falls_back(monkeypatch, small_interaction):
    data = _fresh(small_interaction)
    monkeypatch.setenv("SELFREC_TPU_EVAL_MASK", "auto")
    monkeypatch.setenv("SELFREC_TPU_DENSE_BUDGET_GB", "0.00001")
    assert ranking.get_rated_dense(data) is None
    monkeypatch.setenv("SELFREC_TPU_DENSE_BUDGET_GB", "5")
    assert ranking.get_rated_dense(_fresh(data)) is not None


def test_approx_topk_env(monkeypatch, small_interaction):
    monkeypatch.delenv("SELFREC_TPU_EVAL_TOPK", raising=False)
    assert ranking._eval_topk_recall() is None
    monkeypatch.setenv("SELFREC_TPU_EVAL_TOPK", "approx")
    assert ranking._eval_topk_recall() == 0.95
    monkeypatch.setenv("SELFREC_TPU_EVAL_TOPK", "approx:0.99")
    assert ranking._eval_topk_recall() == 0.99

    # the approx path must run end-to-end and return valid ids
    data = _fresh(small_interaction)
    rng = np.random.default_rng(2)
    ue = rng.normal(size=(data.user_num, 16)).astype(np.float32)
    ie = rng.normal(size=(data.item_num, 16)).astype(np.float32)
    ids = ranking.topk_ids_from_embeddings(data, ue, ie, 10, block_size=64)
    assert ids.shape == (len(data.test_user_ids), 10)
    assert (ids >= 0).all() and (ids < data.item_num).all()
