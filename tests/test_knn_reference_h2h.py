"""KNN deterministic exact-output h2h vs the reference's own code
(VERDICT r3 item 2: "KNN as deterministic exact-output equality").

UserKNN/ItemKNN have no training stochasticity — similarity build and
prediction are pure functions of the data — so the h2h contract against the
reference's O(N^2) Python loops (/root/reference/model/graph/UserKNN.py:32-80,
ItemKNN.py:32-81) is:

1. top-k similarity VALUE multisets identical for every user/item, and
2. per-user prediction score vectors identical for every entity whose k-th
   and (k+1)-th similarities differ (no tie spanning the top-k boundary).

Boundary ties are intrinsic to binary data (sims quantize to
c/(c+s) * c/sqrt(du*dv)); there the reference's heapq.nlargest breaks ties
by NAME STRING while our lax.top_k breaks by index — the one documented KNN
deviation (same class as the numba-heap tie-break note in
utils/similarity.py). Ties strictly inside the top-k don't diverge (same
SET either way), so the condition is exactly the boundary.
"""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_env():
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (lambda f: f)
    sys.modules.setdefault("numba", numba)
    return REF


def _tiny_triples(n_users=60, n_items=45, n_inter=700, seed=11):
    rng = np.random.default_rng(seed)
    seen = set()
    while len(seen) < n_inter:
        seen.add((int(rng.integers(n_users)), int(rng.integers(n_items))))
    triples = [(f"u{u}", f"i{i}", 1.0) for u, i in sorted(seen)]
    test = triples[::17]
    train = [t for t in triples if t not in set(test)]
    return train, test


def _conf_dict(name):
    return {
        "training.set": "<mem>", "test.set": "<mem>",
        "model": {"name": name, "type": "graph"},
        "item.ranking.topN": [10, 20], "embedding.size": 16,
        "max.epoch": 1, "batch.size": 256, "learning.rate": 0.001,
        "reg.lambda": 0.0001, name: {}, "output": "/tmp/selfrec_test/",
        "topK": 10, "shrinkage": 5, "seed": 0,
    }


def _full_sims(R, shrink):
    """f64 closed form of the reference's _cosine_similarity for binary
    data (UserKNN.py:14-30): rows of R are the entities."""
    C = R @ R.T
    d = R.sum(1)
    raw = C / (np.sqrt(d)[:, None] * np.sqrt(d)[None, :] + 1e-8)
    sim = C / (C + shrink) * raw
    np.fill_diagonal(sim, -np.inf)
    return sim


@pytest.mark.parametrize("model_name", ["UserKNN", "ItemKNN"])
def test_knn_scores_match_reference_exactly(ref_env, model_name):
    import os

    train, test = _tiny_triples()
    k, shrink = 10, 5

    # --- reference side: its own loops, unmodified ---
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    try:
        os.chdir(REF)
        from util.conf import ModelConf as RefConf

        mod = __import__(f"model.graph.{model_name}",
                         fromlist=[model_name])
        conf = RefConf(f"./conf/{model_name}.yaml")
        conf.config["topK"] = k
        conf.config["shrinkage"] = shrink
        ref = getattr(mod, model_name)(
            conf, [list(t) for t in train], [list(t) for t in test])
        ref.train()
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)

    # --- our side: blocked MXU build on the same triples ---
    import jax.numpy as jnp

    from selfrec_tpu.config import ModelConf
    from selfrec_tpu.models import get_model_class

    ours = get_model_class(model_name)(
        ModelConf(_conf_dict(model_name)), train, test)
    ours.build()
    ours.train()
    assert ours.data.item == ref.data.item
    assert ours.data.user == ref.data.user
    n_u, n_i = ours.data.user_num, ours.data.item_num

    # dense binary R in f64, entity rows matching the model's sim axis
    R = np.zeros((n_u, n_i))
    off, items = np.asarray(ours.data.rated_offsets), np.asarray(
        ours.data.rated_items)
    for u in range(n_u):
        R[u, items[off[u]:off[u + 1]]] = 1.0
    sims = _full_sims(R if model_name == "UserKNN" else R.T, shrink)
    srt = np.sort(sims, axis=1)[:, ::-1]
    boundary_tied = np.isclose(srt[:, k - 1], srt[:, k],
                               rtol=0, atol=1e-12) & (srt[:, k - 1] > 0)

    # 1. top-k sim multisets equal for EVERY entity
    ref_sim_attr = ref.user_sim if model_name == "UserKNN" else ref.item_sim
    name_of = (ours.data.id2user if model_name == "UserKNN"
               else ours.data.id2item)
    if model_name == "UserKNN":
        arr = np.asarray(ours.neighbor_sims)
        our_sims_by_entity = [
            sorted(s for s in arr[e].tolist() if s > 0)
            for e in range(sims.shape[0])]
    else:  # ItemKNN keeps its top-k as similarity-graph edges (src owns)
        src = np.asarray(ours._sim_adj.src)
        w = np.asarray(ours._sim_adj.w)
        our_sims_by_entity = [[] for _ in range(sims.shape[0])]
        for s_, w_ in zip(src.tolist(), w.tolist()):
            our_sims_by_entity[s_].append(w_)
        our_sims_by_entity = [sorted(v) for v in our_sims_by_entity]
    for e in range(sims.shape[0]):
        ref_vals = sorted(s for s, _ in ref_sim_attr[name_of[e]])
        np.testing.assert_allclose(our_sims_by_entity[e], ref_vals,
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"entity {e}")

    # 2. exact score equality for every test user not touched by a
    # boundary tie; the suite fails if ties disqualify everyone
    test_users = sorted({t[0] for t in test})
    uids = np.asarray([ours.data.user[u] for u in test_users], np.int32)
    pad_n = -len(uids) % 8
    pad = np.concatenate([uids, np.full(pad_n, uids[-1], np.int32)])
    our_scores = np.asarray(ours._score_block(jnp.asarray(pad)))[:len(uids)]

    compared = 0
    for row, uname in enumerate(test_users):
        u = uids[row]
        if model_name == "UserKNN":
            affected = boundary_tied[u]
        else:
            rated = items[off[u]:off[u + 1]]
            affected = boundary_tied[rated].any()
        if affected:
            continue
        ref_vec = ref.predict(uname)
        np.testing.assert_allclose(
            our_scores[row], ref_vec, rtol=2e-4, atol=2e-5,
            err_msg=f"{model_name} scores diverge for {uname}")
        compared += 1
    if model_name == "UserKNN":
        assert compared >= max(2, len(test_users) // 3), (
            compared, len(test_users))

    # 3. aggregation exactness for ALL users through the REFERENCE'S OWN
    # predict loop: substitute our (index-tie-broken) neighbor sets into
    # the reference model and demand exact equality everywhere — isolates
    # the documented tie-break as the ONLY divergence
    if model_name == "UserKNN":
        arr_s = np.asarray(ours.neighbor_sims)
        arr_i = np.asarray(ours.neighbor_ids)
        for e in range(n_u):
            ref.user_sim[ours.data.id2user[e]] = [
                (float(s), ours.data.id2user[int(j)])
                for s, j in zip(arr_s[e], arr_i[e]) if s > 0]
    else:
        src = np.asarray(ours._sim_adj.src)
        dst = np.asarray(ours._sim_adj.dst)
        w = np.asarray(ours._sim_adj.w)
        by_src = {}
        for s_, d_, w_ in zip(src.tolist(), dst.tolist(), w.tolist()):
            by_src.setdefault(s_, []).append(
                (float(w_), ours.data.id2item[int(d_)]))
        for e in range(n_i):
            ref.item_sim[ours.data.id2item[e]] = by_src.get(e, [])
    for row, uname in enumerate(test_users):
        ref_vec = ref.predict(uname)
        np.testing.assert_allclose(
            our_scores[row], ref_vec, rtol=2e-4, atol=2e-5,
            err_msg=f"{model_name} tie-aligned scores diverge for {uname}")
