"""Metric parity tests: hand-computed values following the reference's exact
conventions (insertion-ordered IDCG, interaction-level hit ratio, 5-decimal
rounding — /root/reference/util/evaluation.py)."""

import math

import pytest

from selfrec_tpu.utils import metrics


@pytest.fixture
def toy():
    origin = {
        "u1": {"a": 1, "b": 1, "c": 1},
        "u2": {"d": 1},
    }
    res = {
        "u1": [("a", 0.9), ("x", 0.8), ("b", 0.7)],
        "u2": [("y", 0.9), ("z", 0.8), ("d", 0.7)],
    }
    return origin, res


def test_hits(toy):
    origin, res = toy
    h = metrics.hits(origin, res)
    assert h == {"u1": 2, "u2": 1}


def test_hit_ratio_is_interaction_level(toy):
    origin, res = toy
    h = metrics.hits(origin, res)
    # 3 hit interactions / 4 test interactions
    assert metrics.hit_ratio(origin, h) == round(3 / 4, 5)


def test_precision_recall(toy):
    origin, res = toy
    h = metrics.hits(origin, res)
    assert metrics.precision(h, 3) == round(3 / 6, 5)
    assert metrics.recall(h, origin) == round((2 / 3 + 1 / 1) / 2, 5)


def test_ndcg_insertion_order_idcg(toy):
    origin, res = toy
    # u1: DCG = 1/log2(2) + 1/log2(4); IDCG over first 3 insertion-order items
    dcg1 = 1 / math.log2(2) + 1 / math.log2(4)
    idcg1 = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    dcg2 = 1 / math.log2(4)
    idcg2 = 1 / math.log2(2)
    expected = round((dcg1 / idcg1 + dcg2 / idcg2) / 2, 5)
    assert metrics.ndcg(origin, res, 3) == expected


def test_idcg_truncated_by_n():
    # user has 5 test items but N=2: IDCG uses only first 2
    origin = {"u": {f"i{k}": 1 for k in range(5)}}
    res = {"u": [("i0", 0.9), ("i1", 0.8)]}
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    dcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert metrics.ndcg(origin, res, 2) == round(dcg / idcg, 5)


def test_ranking_evaluation_format(toy):
    origin, res = toy
    out = metrics.ranking_evaluation(origin, res, [2, 3])
    assert out[0] == "Top 2\n"
    assert out[5] == "Top 3\n"
    assert any(line.startswith("Hit Ratio:") for line in out)
    perf = metrics.parse_measure(out[5:])
    assert set(perf) == {"Hit Ratio", "Precision", "Recall", "NDCG"}


def test_length_mismatch_raises(toy):
    origin, res = toy
    with pytest.raises(ValueError):
        metrics.ranking_evaluation(origin, {"u1": res["u1"]}, [2])


def test_recall_at_catalog_is_one():
    # property: with the full catalog recommended, recall == 1
    origin = {"u": {"a": 1, "b": 1}}
    res = {"u": [(x, 1.0) for x in ["a", "b", "c", "d"]]}
    h = metrics.hits(origin, res)
    assert metrics.recall(h, origin) == 1.0


def test_ranking_evaluation_ids_exact_equal_random():
    """The id-based vectorized path produces byte-identical measure strings
    to the reference-convention string path on randomized data."""
    import numpy as np

    rng = np.random.default_rng(0)
    n_users, n_items, K = 200, 500, 20
    origin, res = {}, {}
    offsets = np.zeros(n_users + 1, dtype=np.int64)
    gt_items, top_rows = [], []
    for u in range(n_users):
        uname = f"u{u}"
        n_gt = int(rng.integers(1, 30))
        gt = rng.choice(n_items, size=n_gt, replace=False)
        origin[uname] = {f"i{i}": 1 for i in gt}
        gt_items.extend(gt)
        offsets[u + 1] = len(gt_items)
        # bias top lists toward ground truth so hits are plentiful
        pool = np.concatenate([gt, rng.integers(0, n_items, K)])
        top = []
        for i in rng.permutation(pool):
            if i not in top:
                top.append(int(i))
            if len(top) == K:
                break
        res[uname] = [(f"i{i}", 1.0 - r * 0.01) for r, i in enumerate(top)]
        top_rows.append(top)
    top_ids = np.asarray(top_rows, dtype=np.int64)

    for top_ns in ([5], [10, 20], [1, 7, 20]):
        want = metrics.ranking_evaluation(origin, res, top_ns)
        got = metrics.ranking_evaluation_ids(
            offsets, np.asarray(gt_items), top_ids, top_ns, n_items)
        assert got == want


def test_ranking_evaluation_ids_length_mismatch():
    import numpy as np

    with pytest.raises(ValueError):
        metrics.ranking_evaluation_ids(
            np.array([0, 1, 2]), np.array([0, 1]),
            np.zeros((3, 5), np.int64), [5], 10)


def test_graph_fast_measure_matches_string_path(tiny_graph_dataset):
    """GraphRecommender._fast_measure (id path) == the rec-list string path
    on a trained model."""
    from tests.test_models_e2e import run_model
    from selfrec_tpu.utils import metrics as m

    model, _ = run_model("MF", tiny_graph_dataset)
    want = m.ranking_evaluation(
        model.data.test_set, model.test(), [model.max_N])
    got = model._fast_measure()
    assert got == want


def test_ranking_evaluation_ids_zero_gt_raises():
    """A test user with zero ground-truth items must fail loudly (the
    reference raises ZeroDivisionError in its per-user recall/NDCG), not
    propagate NaN into the measure strings."""
    import numpy as np

    offsets = np.array([0, 2, 2])  # user 1 has no ground truth
    items = np.array([1, 2])
    top = np.zeros((2, 3), np.int64)
    with pytest.raises(ZeroDivisionError):
        metrics.ranking_evaluation_ids(offsets, items, top, [3], 10)
