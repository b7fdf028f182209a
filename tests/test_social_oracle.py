"""Fixed-weight numeric oracles for the social models (MHCN / SEPT).

The reference implements both in TF1 (/root/reference/model/graph/MHCN.py,
SEPT.py) and TF1 is not installed in this image, so the reference code cannot
be executed for a head-to-head. Instead the TF1 math is ported to DENSE numpy
here, line-for-line from the cited reference sources, and compared against
our JAX implementations on identical weights, graphs, batches and random
permutations — the same oracle strength as the torch-backed parity tests
(tests/test_reference_parity.py) give every other model family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfrec_tpu.config import ModelConf
from selfrec_tpu.models import get_model_class


# ---------------------------------------------------------------- fixtures
def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _l2norm(x):
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-12)


@pytest.fixture(scope="module")
def social_dataset():
    rng = np.random.default_rng(42)
    n_users, n_items = 24, 30
    train, test = [], []
    for u in range(n_users):
        items = rng.choice(n_items, size=7, replace=False)
        for i in items[:6]:
            train.append((f"u{u}", f"i{i}", 1.0))
        test.append((f"u{u}", f"i{items[6]}", 1.0))
    trust = []
    for _ in range(70):
        a, b = rng.choice(n_users, size=2, replace=False)
        trust.append((f"u{a}", f"u{b}", 1.0))
    return train, test, trust


def _conf(name, extra):
    return ModelConf({
        "training.set": "<memory>", "test.set": "<memory>",
        "model": {"name": name, "type": "graph"},
        "item.ranking.topN": [5, 10], "embedding.size": 16,
        "max.epoch": 3, "batch.size": 16, "learning.rate": 0.01,
        "reg.lambda": 0.0001, name: extra, "social.data": "<memory>",
        "output": "/tmp/selfrec_tpu_test_results/", "seed": 7,
    })


@pytest.fixture(scope="module")
def mhcn_model(social_dataset):
    train, test, trust = social_dataset
    m = get_model_class("MHCN")(
        _conf("MHCN", {"n_layer": 2, "ss_rate": 0.01}), train, test,
        **{"social.data": trust})
    m.build()
    return m


@pytest.fixture(scope="module")
def sept_model(social_dataset):
    train, test, trust = social_dataset
    m = get_model_class("SEPT")(
        _conf("SEPT", {"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3,
                       "ins_cnt": 3}), train, test,
        **{"social.data": trust})
    m.build()
    return m


# ------------------------------------------------------------- MHCN oracle
def np_motifs(S, Y):
    """build_hyper_adj_mats ported dense (reference MHCN.py:27-55)."""
    B = S * S.T
    U = S - B
    C1 = (U @ U) * U.T
    A1 = C1 + C1.T
    C2 = (B @ U) * U.T + (U @ B) * U.T + (U @ U) * B
    A2 = C2 + C2.T
    C3 = (B @ B) * U + (B @ U) * B + (U @ B) * B
    A3 = C3 + C3.T
    A4 = (B @ B) * B
    C5 = (U @ U) * U + (U @ U.T) * U + (U.T @ U) * U
    A5 = C5 + C5.T
    A6 = (U @ B) * U + (B @ U.T) * U.T + (U.T @ U) * B
    A7 = (U.T @ B) * U.T + (B @ U) * U + (U @ U.T) * B
    A8 = (Y @ Y.T) * B
    A9 = (Y @ Y.T) * U
    A9 = A9 + A9.T
    A10 = Y @ Y.T - A8 - A9

    def rownorm(H):
        s = H.sum(axis=1, keepdims=True)
        return H * np.where(s > 0, 1.0 / np.where(s > 0, s, 1.0), 0.0)

    H_s = rownorm(A1 + A2 + A3 + A4 + A5 + A6 + A7)
    H_j = rownorm(A8 + A9)
    H_p = rownorm(A10 * (A10 > 3))
    return H_s, H_j, H_p


def np_gate(em, w, b):
    return em * _sigmoid(em @ w + b)  # MHCN.py:79-83


def np_channel_attention(att, att_mat, *channels):
    """MHCN.py:85-93."""
    weights = np.stack(
        [np.sum(att * (c @ att_mat), axis=1) for c in channels], axis=1)
    score = _softmax(weights, axis=1)
    mixed = sum(score[:, i:i + 1] * c for i, c in enumerate(channels))
    return mixed, score


def np_mhcn_forward(p, H_s, H_j, H_p, R, n_layers):
    """MHCN.py:104-148 dense. R is the D^-1-normalized interaction matrix."""
    c1 = np_gate(p["user_emb"], p["gating1"], p["gating_bias1"])
    c2 = np_gate(p["user_emb"], p["gating2"], p["gating_bias2"])
    c3 = np_gate(p["user_emb"], p["gating3"], p["gating_bias3"])
    simple = np_gate(p["user_emb"], p["gating4"], p["gating_bias4"])
    item = p["item_emb"]
    a1, a2, a3 = [c1], [c2], [c3]
    a_sim, a_it = [simple], [item]
    for _ in range(n_layers):
        mixed = np_channel_attention(
            p["attention"], p["attention_mat"], c1, c2, c3)[0] + simple / 2
        c1 = H_s @ c1
        a1.append(_l2norm(c1))
        c2 = H_j @ c2
        a2.append(_l2norm(c2))
        c3 = H_p @ c3
        a3.append(_l2norm(c3))
        new_item = R.T @ mixed
        a_it.append(_l2norm(new_item))
        simple = R @ item
        a_sim.append(_l2norm(simple))
        item = new_item
    c1s, c2s, c3s = sum(a1), sum(a2), sum(a3)
    final_user = np_channel_attention(
        p["attention"], p["attention_mat"], c1s, c2s, c3s)[0] + sum(a_sim) / 2
    return final_user, sum(a_it)


def np_hierarchical_ss(em, adj_dense, perms):
    """MHCN.py:159-181 with the shuffles supplied as explicit permutations
    (row1, (rowA, colB) for local neg2, (rowC, colD) for global neg1)."""
    edge = adj_dense @ em
    score = lambda a, b: np.sum(a * b, axis=1)
    pos = score(em, edge)
    neg1 = score(em[perms["k1_row"]], edge)
    corrupted = edge[perms["k2_row"]][:, perms["k2_col"]]
    neg2 = score(corrupted, em)
    local = np.sum(-np.log(_sigmoid(pos - neg1)) - np.log(_sigmoid(neg1 - neg2)))
    graph = edge.mean(axis=0)
    pos_g = score(edge, graph[None])
    neg1_g = score(edge[perms["k3_row"]][:, perms["k3_col"]], graph[None])
    return local + np.sum(-np.log(_sigmoid(pos_g - neg1_g)))


def _mhcn_dense_inputs(model):
    S = np.asarray(model.social_data.get_social_mat().todense(), np.float32)
    Y = np.asarray(model.data.interaction_mat.todense(), np.float32)
    rs = Y.sum(axis=1, keepdims=True)
    R = Y * np.where(rs > 0, 1.0 / np.where(rs > 0, rs, 1.0), 0.0)  # D^-1 Y
    return S, Y, R


def _ss_perms(key, n, d):
    """Replicates _hierarchical_ss's key plumbing (models/graph/mhcn.py)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    k2a, k2b = jax.random.split(k2)
    k3a, k3b = jax.random.split(k3)
    return {
        "k1_row": np.asarray(jax.random.permutation(k1, n)),
        "k2_row": np.asarray(jax.random.permutation(k2a, n)),
        "k2_col": np.asarray(jax.random.permutation(k2b, d)),
        "k3_row": np.asarray(jax.random.permutation(k3a, n)),
        "k3_col": np.asarray(jax.random.permutation(k3b, d)),
    }


def test_mhcn_forward_oracle(mhcn_model):
    m = mhcn_model
    p = {k: np.asarray(v, np.float32) for k, v in m.params.items()}
    S, Y, R = _mhcn_dense_inputs(m)
    H_s, H_j, H_p = np_motifs(S, Y)
    ref_u, ref_i = np_mhcn_forward(p, H_s, H_j, H_p, R, m.n_layers)
    got_u, got_i = m.forward(m.params)
    np.testing.assert_allclose(np.asarray(got_u), ref_u, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_i), ref_i, rtol=2e-4, atol=2e-5)


def test_mhcn_channel_attention_oracle(mhcn_model):
    m = mhcn_model
    rng = np.random.default_rng(0)
    chans = [rng.normal(size=(m.data.user_num, m.emb_size)).astype(np.float32)
             for _ in range(3)]
    ref_mixed, ref_score = np_channel_attention(
        np.asarray(m.params["attention"]), np.asarray(m.params["attention_mat"]),
        *chans)
    got_mixed, got_score = m._channel_attention(
        m.params, *[jnp.asarray(c) for c in chans])
    np.testing.assert_allclose(np.asarray(got_score), ref_score, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_mixed), ref_mixed, rtol=1e-4,
                               atol=1e-6)


def test_mhcn_hierarchical_ss_oracle(mhcn_model):
    m = mhcn_model
    rng = np.random.default_rng(1)
    em = rng.normal(size=(m.data.user_num, m.emb_size)).astype(np.float32)
    S, Y, _ = _mhcn_dense_inputs(m)
    H_s = np_motifs(S, Y)[0]
    key = jax.random.PRNGKey(123)
    got = m._hierarchical_ss(key, jnp.asarray(em), m.H[0])
    ref = np_hierarchical_ss(em, H_s, _ss_perms(key, *em.shape))
    np.testing.assert_allclose(float(got), ref, rtol=1e-4)


def test_mhcn_batch_loss_oracle(mhcn_model):
    """Full MHCN.train() loss (MHCN.py:184-189): sum-BPR + reg*l2_loss(all
    gating/attention weights + batch rows) + ss_rate * hierarchical MIM."""
    m = mhcn_model
    rng = np.random.default_rng(2)
    bs = m.batch_size
    u = rng.integers(0, m.data.user_num, bs)
    i = rng.integers(0, m.data.item_num, bs)
    j = rng.integers(0, m.data.item_num, bs)
    batch = {"u": jnp.asarray(u), "i": jnp.asarray(i), "j": jnp.asarray(j),
             "mask": jnp.ones(bs, np.float32), "aux": {}}
    key = jax.random.PRNGKey(5)
    got = float(m.batch_loss(m.params, batch, key))

    p = {k: np.asarray(v, np.float32) for k, v in m.params.items()}
    S, Y, R = _mhcn_dense_inputs(m)
    H_s, H_j, H_p = np_motifs(S, Y)
    fu, fi = np_mhcn_forward(p, H_s, H_j, H_p, R, m.n_layers)
    bu, bp, bn = fu[u], fi[i], fi[j]
    rec = -np.sum(np.log(_sigmoid(np.sum(bu * bp, 1) - np.sum(bu * bn, 1))
                         + 10e-8))  # loss_tf.py:4-7
    l2 = lambda x: 0.5 * np.sum(x * x)  # tf.nn.l2_loss
    reg = sum(l2(p[f"{n}{c+1}"]) for c in range(4)
              for n in ("gating", "gating_bias", "sgating", "sgating_bias"))
    reg += l2(p["attention"]) + l2(p["attention_mat"])
    reg += l2(bu) + l2(bp) + l2(bn)
    reg *= m.reg
    keys = jax.random.split(key, 3)
    ss = 0.0
    for c, H in enumerate((H_s, H_j, H_p)):
        em = np_gate(fu, p[f"sgating{c+1}"], p[f"sgating_bias{c+1}"])
        ss += np_hierarchical_ss(em, H, _ss_perms(keys[c], *em.shape))
    ref = rec + reg + m.ss_rate * ss
    np.testing.assert_allclose(got, ref, rtol=2e-4)


# ------------------------------------------------------------- SEPT oracle
def np_norm_adj_sym(A):
    """D^-1/2 A D^-1/2 (reference data/graph.py:10-17, square case)."""
    d = A.sum(axis=1)
    inv = np.where(d > 0, 1.0 / np.sqrt(np.where(d > 0, d, 1.0)), 0.0)
    return A * inv[:, None] * inv[None, :]


def np_sept_views(S_bi, Y, n_users):
    """get_social_related_views (SEPT.py:33-40). S_bi is the reference's
    ``S.multiply(S)`` bidirectional matrix (social.py:40-43 quirk)."""
    social = (S_bi @ S_bi) * S_bi + np.eye(n_users, dtype=np.float32)
    sharing = (Y @ Y.T) * S_bi + np.eye(n_users, dtype=np.float32)
    return np_norm_adj_sym(social), np_norm_adj_sym(sharing)


def np_sept_encode(adj, emb, n_layers):
    """encoder/social_encoder: sum of l2-normalized hops (SEPT.py:48-64)."""
    total = emb.copy()
    e = emb
    for _ in range(n_layers):
        e = _l2norm(adj @ e)
        total = total + e
    return total


def np_bipartite_laplacian(eu, ei, keep, n_users, n_items):
    """convert_to_laplacian_mat over kept edges (ui_graph.py:58-65): symmetric
    (n+m)^2 bipartite adjacency, D^-1/2 A D^-1/2 with kept degrees."""
    n = n_users + n_items
    A = np.zeros((n, n), np.float32)
    for u, i, k in zip(eu, ei, keep):
        if k:
            A[u, n_users + i] = 1.0
            A[n_users + i, u] = 1.0
    return np_norm_adj_sym(A)


def test_sept_encoder_and_views_oracle(sept_model):
    m = sept_model
    p = {k: np.asarray(v, np.float32) for k, v in m.params.items()}
    nu = m.data.user_num
    # rec encoder over the bipartite norm_adj
    adj_dense = np.asarray(m.data.norm_adj.todense(), np.float32)
    ego = np.concatenate([p["user_emb"], p["item_emb"]], axis=0)
    ref = np_sept_encode(adj_dense, ego, m.n_layers)
    got_u, got_i = m._rec_embeddings(m.params)
    np.testing.assert_allclose(np.asarray(got_u), ref[:nu], rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_i), ref[nu:], rtol=2e-4,
                               atol=2e-5)
    # friend / sharing views
    S_bi = np.asarray(m.social_data.get_birectional_social_mat().todense(),
                      np.float32)
    Y = np.asarray(m.data.interaction_mat.todense(), np.float32)
    social_v, sharing_v = np_sept_views(S_bi, Y, nu)
    # the packed union-layout encode (the production joint-phase path) must
    # match the numpy port of the reference per-view encoders
    friend_got, sharing_got = m._encode_packed(
        m._social_template, m._social_w_stack,
        [m.params["user_emb"], m.params["user_emb"]])
    np.testing.assert_allclose(
        np.asarray(friend_got),
        np_sept_encode(social_v, p["user_emb"], m.n_layers),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(sharing_got),
        np_sept_encode(sharing_v, p["user_emb"], m.n_layers),
        rtol=2e-4, atol=2e-5)


def test_sept_joint_loss_oracle(sept_model):
    """Joint-phase loss (SEPT.py:136-158): sum-BPR + reg*l2_loss(tables) +
    ss_rate * neighbor discrimination over tri-training pseudo-labels."""
    m = sept_model
    from selfrec_tpu.ops.graph import bipartite_renorm_weights

    rng = np.random.default_rng(9)
    n_e = m.data.n_edges
    keep = np.zeros(n_e, dtype=bool)
    keep[rng.choice(n_e, size=int(n_e * 0.7), replace=False)] = True
    w = bipartite_renorm_weights(
        m._edge_users_dev, m._edge_items_dev, jnp.asarray(keep),
        m.data.user_num, m.data.item_num)
    bs = m.batch_size
    u = rng.integers(0, m.data.user_num, bs)
    u[3] = u[0]  # exercise dedup (tf.unique, SEPT.py:99)
    i = rng.integers(0, m.data.item_num, bs)
    j = rng.integers(0, m.data.item_num, bs)
    batch = {"u": jnp.asarray(u), "i": jnp.asarray(i), "j": jnp.asarray(j),
             "mask": jnp.ones(bs, np.float32), "aux": {"aug_w": w}}
    was_joint = m._joint_phase
    m._joint_phase = True
    try:
        got = float(m.batch_loss(m.params, batch, jax.random.PRNGKey(0)))
    finally:
        m._joint_phase = was_joint

    p = {k: np.asarray(v, np.float32) for k, v in m.params.items()}
    nu = m.data.user_num
    ego = np.concatenate([p["user_emb"], p["item_emb"]], axis=0)
    adj_dense = np.asarray(m.data.norm_adj.todense(), np.float32)
    rec_all = np_sept_encode(adj_dense, ego, m.n_layers)
    rec_user, rec_item = rec_all[:nu], rec_all[nu:]
    aug_dense = np_bipartite_laplacian(
        np.asarray(m.data.edge_users), np.asarray(m.data.edge_items), keep,
        nu, m.data.item_num)
    aug_user = np_sept_encode(aug_dense, ego, m.n_layers)[:nu]
    S_bi = np.asarray(m.social_data.get_birectional_social_mat().todense(),
                      np.float32)
    Y = np.asarray(m.data.interaction_mat.todense(), np.float32)
    social_v, sharing_v = np_sept_views(S_bi, Y, nu)
    friend = np_sept_encode(social_v, p["user_emb"], m.n_layers)
    sharing = np_sept_encode(sharing_v, p["user_emb"], m.n_layers)

    bu, bp, bn = rec_user[u], rec_item[i], rec_item[j]
    rec = -np.sum(np.log(_sigmoid(np.sum(bu * bp, 1) - np.sum(bu * bn, 1))
                         + 10e-8))
    rec += m.reg * (0.5 * np.sum(p["user_emb"] ** 2)
                    + 0.5 * np.sum(p["item_emb"] ** 2))

    uniq = np.unique(u)
    aug_n = _l2norm(aug_user[uniq])

    def label_pred(view):  # SEPT.py:98-108
        return _softmax(_l2norm(view[uniq]) @ aug_n.T, axis=1)

    def neighbor_dis(pos_idx, view):  # SEPT.py:118-134
        emb = _l2norm(view[uniq])
        pos_emb = aug_n[pos_idx]
        pos = np.sum(emb[:, None, :] * pos_emb, axis=2)
        pos_score = np.sum(np.exp(pos / 0.1), axis=1)
        ttl_score = np.sum(np.exp(emb @ aug_n.T / 0.1), axis=1)
        return -np.sum(np.log(pos_score / ttl_score))

    probs = {"friend": label_pred(friend), "sharing": label_pred(sharing),
             "rec": label_pred(rec_user)}
    topk = lambda pr: np.argsort(-pr, axis=1, kind="stable")[:, :m.instance_cnt]
    ss = (neighbor_dis(topk((probs["sharing"] + probs["rec"]) / 2), friend)
          + neighbor_dis(topk((probs["friend"] + probs["rec"]) / 2), sharing)
          + neighbor_dis(topk((probs["friend"] + probs["sharing"]) / 2),
                         rec_user))
    ref = rec + m.ss_rate * ss
    np.testing.assert_allclose(got, ref, rtol=3e-4)
