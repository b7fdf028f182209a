"""Multi-device invariants on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded computation must equal the single-device computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfrec_tpu.config import ModelConf
from selfrec_tpu.models import get_model_class
from selfrec_tpu.parallel import mesh as mesh_lib


def make_conf(mesh=None, **kw):
    conf = {
        "training.set": "<memory>",
        "test.set": "<memory>",
        "model": {"name": "SimGCL", "type": "graph"},
        "item.ranking.topN": [5, 10],
        "embedding.size": 16,
        "max.epoch": 2,
        "batch.size": 64,
        "learning.rate": 0.05,
        "reg.lambda": 0.0001,
        "SimGCL": {"n_layer": 2, "lambda": 0.5, "eps": 0.1},
        "output": "/tmp/selfrec_tpu_test_results/",
        "seed": 42,
    }
    if mesh:
        conf["mesh"] = mesh
    conf.update(kw)
    return ModelConf(conf)


def test_mesh_shapes():
    m = mesh_lib.build_mesh()
    assert m.devices.size == 8 and m.axis_names == ("data", "model")
    m2 = mesh_lib.build_mesh(n_data=4, n_model=2)
    assert m2.devices.shape == (4, 2)


def test_sharded_epoch_matches_unsharded(tiny_graph_dataset):
    train, test = tiny_graph_dataset
    cls = get_model_class("SimGCL")

    runs = {}
    for name, mesh in [("single", None), ("dp", {"data": 8, "model": 1}),
                       ("dp_tp", {"data": 4, "model": 2})]:
        model = cls(make_conf(mesh=mesh), train, test)
        assert (model.mesh is None) == (mesh is None)
        model.build()
        model.run_epoch(0)
        runs[name] = np.asarray(model.params["user_emb"])

    # identical PRNG streams + deterministic math -> same params up to
    # cross-shard reduction order
    np.testing.assert_allclose(runs["single"], runs["dp"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(runs["single"], runs["dp_tp"], rtol=2e-4, atol=2e-5)


def test_sharded_eval_matches_unsharded(tiny_graph_dataset):
    train, test = tiny_graph_dataset
    cls = get_model_class("SimGCL")
    single = cls(make_conf(), train, test)
    single.build()
    single.user_emb, single.item_emb = single._compute_emb_jit(single.params)
    rl1 = single.test()

    sharded = cls(make_conf(mesh={"data": 4, "model": 2}), train, test)
    sharded.build()
    sharded.user_emb, sharded.item_emb = sharded._compute_emb_jit(sharded.params)
    rl2 = sharded.test()

    assert rl1.keys() == rl2.keys()
    for u in rl1:
        assert [i for i, _ in rl1[u]] == [i for i, _ in rl2[u]]


def test_shard_params_placement(tiny_graph_dataset):
    mesh = mesh_lib.build_mesh(n_data=4, n_model=2)
    params = {"user_emb": jnp.ones((40, 16)), "bias": jnp.ones((16,))}
    placed = mesh_lib.shard_params(params, mesh)
    from jax.sharding import PartitionSpec as P

    assert placed["user_emb"].sharding.spec == P("model", None)
    assert placed["bias"].sharding.spec == P()


def test_sequential_sharded_matches_unsharded():
    rng = np.random.default_rng(11)
    train, test = {}, {}
    for s in range(64):
        start = int(rng.integers(0, 20))
        length = int(rng.integers(6, 14))
        train[f"s{s}"] = [f"i{(start + k) % 20}" for k in range(length)]
        test[f"s{s}"] = [f"i{(start + length) % 20}"]

    def conf(mesh=None):
        c = {
            "training.set": "<memory>",
            "test.set": "<memory>",
            "model": {"name": "SASRec", "type": "sequential"},
            "item.ranking.topN": [5, 10],
            "embedding.size": 32,
            "max.epoch": 1,
            "batch.size": 32,
            "learning.rate": 0.01,
            "reg.lambda": 0.0001,
            "max.len": 16,
            "SASRec": {"n_blocks": 1, "drop_rate": 0.0, "n_heads": 2},
            "output": "/tmp/selfrec_tpu_test_results/",
            "seed": 3,
        }
        if mesh:
            c["mesh"] = mesh
        return ModelConf(c)

    cls = get_model_class("SASRec")
    m1 = cls(conf(), train, test)
    m1.build()
    m1.run_epoch(0)
    m2 = cls(conf(mesh={"data": 4, "model": 2}), train, test)
    assert m2.mesh is not None
    m2.build()
    m2.run_epoch(0)
    np.testing.assert_allclose(
        np.asarray(m1.params["item_emb"]),
        np.asarray(m2.params["item_emb"]),
        rtol=2e-4,
        atol=2e-5,
    )


def test_sharded_topk_matches_dense(tiny_graph_dataset):
    """Per-shard top-k + merge == full masked top-k, ids and scores."""
    import jax

    from selfrec_tpu.ops import ranking
    from selfrec_tpu.parallel.topk import make_sharded_topk

    train, test = tiny_graph_dataset
    cls = get_model_class("SimGCL")
    model = cls(make_conf(mesh={"data": 4, "model": 2}), train, test)
    model.build()
    model.user_emb, model.item_emb = model._compute_emb_jit(model.params)
    impl = model._sharded_topk_impl()
    assert impl is not None

    rl_sharded = model.test()
    # force the dense path for comparison
    rl_dense = ranking.rec_list_from_embeddings(
        model.data, model.user_emb, model.item_emb, model.max_N,
        block_size=model.eval_block_size, topk_impl=None,
    )
    assert rl_sharded.keys() == rl_dense.keys()
    for u in rl_dense:
        assert [i for i, _ in rl_sharded[u]] == [i for i, _ in rl_dense[u]]
        np.testing.assert_allclose(
            [s for _, s in rl_sharded[u]], [s for _, s in rl_dense[u]], rtol=1e-5
        )


def test_sept_sharded_joint_matches_unsharded(tiny_graph_dataset):
    """SEPT's packed joint phase under a (2,2) mesh: the union-layout
    friend+sharing chain and the template rec+aug chain become HaloAdj
    packed kernels via shard_adj — losses must match the single-device run
    (covers halo_spmm_packed inside a full training step)."""
    rng = np.random.default_rng(5)
    train, test = tiny_graph_dataset
    relations = []
    for u in range(40):
        g = u % 4
        peers = [v for v in range(40) if v % 4 == g and v != u]
        for v in rng.choice(peers, size=3, replace=False):
            relations.append((f"u{u}", f"u{v}", 1.0))

    def run(mesh):
        conf_d = {
            "training.set": "<memory>",
            "test.set": "<memory>",
            "social.data": "<memory>",
            "model": {"name": "SEPT", "type": "graph"},
            "item.ranking.topN": [5],
            "embedding.size": 16,
            "max.epoch": 6,
            "batch.size": 64,
            "learning.rate": 0.05,
            "reg.lambda": 0.0001,
            "SEPT": {"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3,
                     "ins_cnt": 5},
            "output": "/tmp/selfrec_tpu_test_results/",
            "seed": 42,
        }
        if mesh:
            conf_d["mesh"] = mesh
        model = get_model_class("SEPT")(
            ModelConf(conf_d), train, test, **{"social.data": relations})
        model.build()
        losses = []
        for e in range(6):  # crosses the epoch-2 joint boundary
            losses.append(np.asarray(model.run_epoch(e)))
        assert model._joint_phase
        return np.concatenate(losses)

    single = run(None)
    sharded = run({"data": 2, "model": 2})
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-4)


def test_mesh_example_conf_runs(tiny_graph_dataset):
    """conf/SimGCL-mesh.yaml (the documented multi-chip example) builds a
    (4, 2) mesh and runs a full epoch on the 8-virtual-device CPU mesh —
    locks the shipped example config against schema drift."""
    import os

    train, test = tiny_graph_dataset
    conf = ModelConf(os.path.join(os.path.dirname(__file__), "..",
                                  "conf", "SimGCL-mesh.yaml"))
    conf.config["training.set"] = "<mem>"
    conf.config["test.set"] = "<mem>"
    conf.config["max.epoch"] = 1
    conf.config["batch.size"] = 64
    conf.config["seed"] = 3
    model = get_model_class("SimGCL")(conf, train, test)
    assert model.mesh is not None and model.mesh.devices.size == 8
    model.build()
    model.run_epoch(0)
    u, i = model._compute_emb_jit(model.params)
    assert np.all(np.isfinite(np.asarray(u, dtype=np.float32)))


def test_social_dense_sharded_matches_unsharded(monkeypatch,
                                                tiny_graph_dataset):
    """MHCN with its five DenseMat adjacencies row-sharded over a (2, 2)
    mesh (shard_adj DenseMat branch) trains to the same losses as the
    single-device dense run (f32-forced: exact up to op order)."""
    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    rng = np.random.default_rng(5)
    train, test = tiny_graph_dataset
    relations = []
    for u in range(40):
        g = u % 4
        peers = [v for v in range(40) if v % 4 == g and v != u]
        for v in rng.choice(peers, size=3, replace=False):
            relations.append((f"u{u}", f"u{v}", 1.0))

    from selfrec_tpu.ops.spmm_dense import DenseMat
    from selfrec_tpu.parallel.dense_shard import ShardedDenseMat

    def run(mesh):
        conf_d = {
            "training.set": "<memory>",
            "test.set": "<memory>",
            "social.data": "<memory>",
            "model": {"name": "MHCN", "type": "graph"},
            "item.ranking.topN": [5],
            "embedding.size": 16,
            "max.epoch": 3,
            "batch.size": 64,
            "learning.rate": 0.02,
            "reg.lambda": 0.0001,
            "MHCN": {"n_layer": 2, "ss_rate": 0.01},
            "output": "/tmp/selfrec_tpu_test_results/",
            "seed": 42,
        }
        if mesh:
            conf_d["mesh"] = mesh
        model = get_model_class("MHCN")(
            ModelConf(conf_d), train, test, **{"social.data": relations})
        want = ShardedDenseMat if mesh else DenseMat
        assert all(isinstance(h, want) for h in model.H)
        model.build()
        losses = [np.asarray(model.run_epoch(e)) for e in range(3)]
        return np.concatenate(losses)

    single = run(None)
    sharded = run({"data": 2, "model": 2})
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-4)


def test_social_dense_sharded_hlo_no_uxu_collectives(monkeypatch,
                                                     tiny_graph_dataset):
    """The row-sharded DenseMat contract: the compiled MHCN mesh epoch
    must never move a (U, U)-block-sized payload — GSPMD's resolution of
    the local-rows matmul has to stay (n, D) operand-sized."""
    from scripts.audit_collectives import audit_hlo
    from selfrec_tpu.ops import sampling
    from selfrec_tpu.parallel.dense_shard import ShardedDenseMat

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    rng = np.random.default_rng(5)
    train, test = tiny_graph_dataset
    relations = []
    for u in range(40):
        g = u % 4
        peers = [v for v in range(40) if v % 4 == g and v != u]
        for v in rng.choice(peers, size=3, replace=False):
            relations.append((f"u{u}", f"u{v}", 1.0))
    conf_d = {
        "training.set": "<memory>", "test.set": "<memory>",
        "social.data": "<memory>",
        "model": {"name": "MHCN", "type": "graph"},
        "item.ranking.topN": [5], "embedding.size": 16,
        "max.epoch": 1, "batch.size": 64, "learning.rate": 0.02,
        "reg.lambda": 0.0001, "MHCN": {"n_layer": 2, "ss_rate": 0.01},
        "mesh": {"data": 2, "model": 2},
        "output": "/tmp/selfrec_tpu_test_results/", "seed": 0,
    }
    model = get_model_class("MHCN")(
        ModelConf(conf_d), train, test, **{"social.data": relations})
    assert all(isinstance(h, ShardedDenseMat) for h in model.H)
    model.build()
    epoch_fn = model._make_epoch_fn()
    users, items, masks = sampling.epoch_pairwise_batches(
        model.epoch_rng(0), model.data.edge_users, model.data.edge_items,
        model.batch_size)
    aux = model.epoch_setup(0)
    sb = mesh_lib.scan_batch_sharding(model.mesh)
    args = [jax.device_put(jnp.asarray(a), sb) for a in (users, items, masks)]
    hlo = epoch_fn.lower(model.params, model.opt_state, model.key, aux,
                         *args, model._scan_consts()).compile().as_text()
    counts = audit_hlo(hlo)
    n_u, n_i = model.data.user_num, model.data.item_num
    # structural bound: every collective must be OPERAND-sized
    # ((max(U, I), D) f32) — never a (U, U) / (U, I) block (the naive GSPMD
    # resolution all-gathered the whole R block here before the explicit
    # ShardedDenseMat shard_map kernel)
    operand_payload = max(n_u, n_i, model.batch_size) * model.emb_size * 4
    block_payload = n_u * n_i * 4
    assert operand_payload < block_payload  # the bound is meaningful
    import re

    for op, rec in counts.items():
        # fused collectives move TUPLES (e.g. the DP gradient all-reduce)
        # — the invariant is per-TENSOR: no element is an (n, n) block
        for dims in re.findall(r"\[([0-9,]+)\]", rec["largest_shape"]):
            n_elems = 1
            for d in dims.split(","):
                n_elems *= int(d)
            assert n_elems * 4 <= operand_payload, (
                f"{op} moves a {dims} tensor "
                f"({rec['largest_shape']}) — bigger than an operand "
                f"block ({operand_payload}B)")
