"""Social module tests: Relation, motif matrices, MHCN/SEPT end-to-end."""

import numpy as np
import pytest

from selfrec_tpu.config import ModelConf
from selfrec_tpu.models import get_model_class
from selfrec_tpu.utils import metrics


@pytest.fixture(scope="session")
def tiny_social_dataset(tiny_graph_dataset):
    """Social links mostly within the user groups of tiny_graph_dataset."""
    rng = np.random.default_rng(5)
    train, test = tiny_graph_dataset
    relations = []
    for u in range(40):
        g = u % 4
        peers = [v for v in range(40) if v % 4 == g and v != u]
        for v in rng.choice(peers, size=4, replace=False):
            relations.append((f"u{u}", f"u{v}", 1.0))
        # a couple of cross-group links
        out = rng.choice([v for v in range(40) if v % 4 != g], size=1)
        relations.append((f"u{u}", f"u{out[0]}", 1.0))
    return train, test, relations


def run_social_model(name, dataset, extra=None, **top):
    train, test, relations = dataset
    conf = {
        "training.set": "<memory>",
        "test.set": "<memory>",
        "social.data": "<memory>",
        "model": {"name": name, "type": "graph"},
        "item.ranking.topN": [5, 10],
        "embedding.size": 16,
        "max.epoch": 6,
        "batch.size": 64,
        "learning.rate": 0.05,
        "reg.lambda": 0.0001,
        "output": "/tmp/selfrec_tpu_test_results/",
        "seed": 42,
    }
    conf.update({k.replace("_", "."): v for k, v in top.items()})
    if extra:
        conf[name] = extra
    conf = ModelConf(conf)
    cls = get_model_class(name)
    model = cls(conf, train, test, **{"social.data": relations})
    model.build()
    model.train()
    rec_list = model.test()
    measure = metrics.ranking_evaluation(model.data.test_set, rec_list, [10])
    return model, metrics.parse_measure(measure)


def test_relation_and_motifs(tiny_social_dataset):
    from selfrec_tpu.data.interaction import Interaction
    from selfrec_tpu.data.motifs import mhcn_hypergraphs, sept_views
    from selfrec_tpu.data.social import Relation

    train, test, relations = tiny_social_dataset
    data = Interaction(None, train, test)
    rel = Relation(None, relations, data.user)
    assert rel.size()[1] == len(relations)
    S = rel.get_social_mat()
    assert S.shape == (40, 40)

    H_s, H_j, H_p = mhcn_hypergraphs(S, data.interaction_mat)
    for H in (H_s, H_j, H_p):
        rs = np.asarray(H.sum(axis=1)).ravel()
        nz = rs[rs > 0]
        np.testing.assert_allclose(nz, 1.0, atol=1e-5)  # row-normalized

    social_v, sharing_v = sept_views(
        rel.get_birectional_social_mat(), data.interaction_mat, data.user_num
    )
    assert social_v.shape == (40, 40)
    # the identity was added before normalization -> every diagonal present
    assert (social_v.diagonal() > 0).all()
    # D^-1/2 A D^-1/2 of a 0/1-ish matrix keeps entries in (0, 1]
    assert social_v.data.max() <= 1.0 + 1e-6


def test_mhcn_end_to_end(tiny_social_dataset):
    model, perf = run_social_model(
        "MHCN",
        tiny_social_dataset,
        extra={"n_layer": 2, "ss_rate": 0.01},
        learning_rate=0.02,
    )
    assert perf["Recall"] > 0.2


def test_sept_end_to_end(tiny_social_dataset):
    model, perf = run_social_model(
        "SEPT",
        tiny_social_dataset,
        extra={"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3, "ins_cnt": 5},
        max_epoch=9,  # crosses the 1/3 boundary into the joint phase
    )
    assert model._joint_phase  # tri-training ran
    assert perf["Recall"] > 0.2


def test_sept_packed_encode_equivalence(tiny_social_dataset):
    """The packed formulations must equal the unpacked reference math:
    (a) union-layout friend+sharing == per-adjacency _encode,
    (b) bipartite template + static clean weights == the scipy norm_adj
        chain used by eval/warm phase."""
    import jax.numpy as jnp

    from selfrec_tpu.data.motifs import sept_views
    from selfrec_tpu.ops.graph import norm_adj_from_scipy

    train, test, relations = tiny_social_dataset
    conf = ModelConf(
        {
            "training.set": "<memory>",
            "test.set": "<memory>",
            "social.data": "<memory>",
            "model": {"name": "SEPT", "type": "graph"},
            "item.ranking.topN": [5],
            "embedding.size": 16,
            "max.epoch": 3,
            "batch.size": 64,
            "learning.rate": 0.05,
            "reg.lambda": 0.0001,
            "output": "/tmp/selfrec_tpu_test_results/",
            "seed": 7,
        }
    )
    model = get_model_class("SEPT")(conf, train, test, **{"social.data": relations})
    model.build()

    social_view, sharing_view = sept_views(
        model.social_data.get_birectional_social_mat(),
        model.data.interaction_mat,
        model.data.user_num,
    )
    u_emb = model.params["user_emb"]
    # (a) packed vs separate
    friend_p, sharing_p = model._encode_packed(
        model._social_template, model._social_w_stack, [u_emb, u_emb]
    )
    friend_s = model._encode(norm_adj_from_scipy(social_view), u_emb)
    sharing_s = model._encode(norm_adj_from_scipy(sharing_view), u_emb)
    np.testing.assert_allclose(
        np.asarray(friend_p), np.asarray(friend_s), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sharing_p), np.asarray(sharing_s), rtol=1e-5, atol=1e-5)

    # (b) template + clean weights == scipy norm_adj chain
    ego = jnp.concatenate(
        [model.params["user_emb"], model.params["item_emb"]], axis=0)
    (rec_p,) = model._encode_packed(
        model._view_template, jnp.reshape(model._w_rec, (1, -1)), [ego])
    rec_s = model._encode(model.adj, ego)
    np.testing.assert_allclose(
        np.asarray(rec_p), np.asarray(rec_s), rtol=1e-5, atol=1e-5)


def test_mhcn_e2e_dense_mat_matches_ell(monkeypatch, tiny_social_dataset):
    """MHCN with all five static adjacencies on the generic dense MXU
    backend (DenseMat, forced f32 on CPU) trains to the same metrics as
    the ELL gather path — exercises norm_adj_from_scipy(dense_general=True)
    through a full train/test cycle."""
    from selfrec_tpu.ops.spmm_dense import DenseMat

    monkeypatch.delenv("SELFREC_TPU_DENSE", raising=False)
    _, perf_ell = run_social_model(
        "MHCN", tiny_social_dataset,
        extra={"n_layer": 2, "ss_rate": 0.01}, learning_rate=0.02)

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    model, perf_dense = run_social_model(
        "MHCN", tiny_social_dataset,
        extra={"n_layer": 2, "ss_rate": 0.01}, learning_rate=0.02)
    assert all(isinstance(h, DenseMat) for h in model.H)
    assert isinstance(model.R, DenseMat) and isinstance(model.Rt, DenseMat)
    for k in perf_ell:
        assert abs(perf_ell[k] - perf_dense[k]) < 2e-3, (
            k, perf_ell[k], perf_dense[k])


def test_mhcn_e2e_dense_mat_bf16_quality(monkeypatch, tiny_social_dataset):
    """The production DenseMat arm is bf16 (values rounded in the scatter,
    f32 accumulation). Validate the documented numerics deviation e2e: a
    full MHCN train/test cycle on bf16 dense blocks reaches the same
    quality band as the exact ELL run (same pattern as the bipartite dense
    backend's convergence validation, PARITY.md)."""
    monkeypatch.delenv("SELFREC_TPU_DENSE", raising=False)
    _, perf_ell = run_social_model(
        "MHCN", tiny_social_dataset,
        extra={"n_layer": 2, "ss_rate": 0.01}, learning_rate=0.02)

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.delenv("SELFREC_TPU_DENSE_DTYPE", raising=False)
    _, perf_bf16 = run_social_model(
        "MHCN", tiny_social_dataset,
        extra={"n_layer": 2, "ss_rate": 0.01}, learning_rate=0.02)
    # bf16 rounding shifts individual scores; metric bands must agree
    for k in perf_ell:
        assert abs(perf_ell[k] - perf_bf16[k]) < 0.03, (
            k, perf_ell[k], perf_bf16[k])


def test_sept_e2e_dense_matches_ell(monkeypatch, tiny_social_dataset):
    """SEPT with the dense arm everywhere — social views on DenseMat,
    rec chain on the clean DenseAdj, per-epoch augmented view via
    refactor_view — trains to the same metrics as the packed-ELL path
    (forced f32 on CPU so the comparison is exact up to op order)."""
    from selfrec_tpu.ops.spmm_dense import DenseAdj, DenseMat

    monkeypatch.delenv("SELFREC_TPU_DENSE", raising=False)
    _, perf_ell = run_social_model(
        "SEPT", tiny_social_dataset,
        extra={"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3,
               "ins_cnt": 5},
        learning_rate=0.02, max_epoch=9)

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    model, perf_dense = run_social_model(
        "SEPT", tiny_social_dataset,
        extra={"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3,
               "ins_cnt": 5},
        learning_rate=0.02, max_epoch=9)
    assert isinstance(model._social_d1, DenseMat)
    assert isinstance(model._social_d2, DenseMat)
    assert isinstance(model.adj, DenseAdj)
    assert isinstance(model._aug_view, DenseAdj)  # joint phase ran
    for k in perf_ell:
        assert abs(perf_ell[k] - perf_dense[k]) < 2e-3, (
            k, perf_ell[k], perf_dense[k])


def test_device_motifs_match_scipy_exactly():
    """mhcn_hypergraphs_device / sept_views_device == the scipy route
    element-for-element (Precision.HIGHEST keeps integer motif counts
    exact in f32)."""
    import scipy.sparse as sp

    from selfrec_tpu.data import motifs

    rng = np.random.default_rng(11)
    n_u, n_i = 40, 55
    S = sp.random(n_u, n_u, density=0.12, random_state=4, format="csr")
    S.data[:] = 1.0
    S.setdiag(0)
    S.eliminate_zeros()
    Y = sp.random(n_u, n_i, density=0.15, random_state=5, format="csr")
    Y.data[:] = 1.0

    host = motifs.mhcn_hypergraphs(S, Y)
    dev = motifs.mhcn_hypergraphs_device(S, Y)
    for h_host, h_dev in zip(host, dev):
        np.testing.assert_allclose(
            np.asarray(h_dev), h_host.toarray(), rtol=1e-6, atol=1e-6)

    B = S.multiply(S.T)  # bidirectional quirk surface feeds sept_views
    host_s, host_sh = motifs.sept_views(B, Y, n_u)
    dev_s, dev_sh = motifs.sept_views_device(B, Y, n_u)
    np.testing.assert_allclose(np.asarray(dev_s), host_s.toarray(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev_sh), host_sh.toarray(),
                               rtol=1e-6, atol=1e-6)
