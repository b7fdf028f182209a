"""Halo-exchange sharded SpMM (parallel/halo.py): numerical parity with the
single-device kernels and a compiled-HLO guarantee that the model-sharded
training step communicates halo-sized, not nnz-sized, payloads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfrec_tpu.ops.spmm_ell import ell_adj_from_edges, ell_spmm
from selfrec_tpu.parallel.halo import (
    HaloAdj,
    build_halo_adj,
    halo_from_ell,
    halo_spmm,
    halo_spmm_packed,
)
from selfrec_tpu.parallel.mesh import build_mesh


@pytest.fixture(scope="module")
def square_graph():
    rng = np.random.default_rng(0)
    n, e, d = 50, 400, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (dst, src), w)
    return src, dst, w, x, dense


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8), (8, 1)])
def test_halo_fwd_matches_dense(square_graph, mesh_shape):
    src, dst, w, x, dense = square_graph
    mesh = build_mesh(*mesh_shape)
    adj = build_halo_adj(src, dst, w, 50, 50, mesh, k=4)
    out = np.asarray(jax.jit(halo_spmm)(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-5, atol=1e-5)


def test_halo_grad_matches_ell(square_graph):
    src, dst, w, x, _ = square_graph
    mesh = build_mesh(4, 2)
    adj = build_halo_adj(src, dst, w, 50, 50, mesh, k=4)
    ell = ell_adj_from_edges(src, dst, w, 50, 50, k=4)
    gh = jax.grad(lambda x: (halo_spmm(adj, x) ** 2).sum())(jnp.asarray(x))
    ge = jax.grad(lambda x: (ell_spmm(ell, x) ** 2).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gh), np.asarray(ge),
                               rtol=1e-4, atol=1e-5)


def test_halo_rectangular():
    """MHCN's R / Rt are rectangular (n_users x n_items)."""
    rng = np.random.default_rng(3)
    n_rows, n_cols, e, d = 40, 23, 300, 6
    src = rng.integers(0, n_cols, e)
    dst = rng.integers(0, n_rows, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n_cols, d)).astype(np.float32)
    dense = np.zeros((n_rows, n_cols), np.float32)
    np.add.at(dense, (dst, src), w)
    mesh = build_mesh(4, 2)
    adj = build_halo_adj(src, dst, w, n_rows, n_cols, mesh, k=4)
    out = np.asarray(jax.jit(halo_spmm)(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-5, atol=1e-5)


def test_halo_packed_and_reweight(square_graph):
    """3-pass packed (SGL's clean+2 views) == 3 independent reweighted runs."""
    src, dst, w, x, _ = square_graph
    rng = np.random.default_rng(5)
    d = x.shape[1]
    mesh = build_mesh(4, 2)
    adj = build_halo_adj(src, dst, w, 50, 50, mesh, k=4)
    w3 = rng.normal(size=(3, len(src))).astype(np.float32)
    x3 = np.concatenate([x, 2 * x, -x], axis=1)
    packed = np.asarray(
        jax.jit(lambda a, ws, xx: halo_spmm_packed(a, ws, xx, 3))(
            adj, jnp.asarray(w3), jnp.asarray(x3)))
    for p, scale in enumerate((1.0, 2.0, -1.0)):
        single = np.asarray(
            jax.jit(halo_spmm)(adj.reweight(jnp.asarray(w3[p])),
                               jnp.asarray(scale * x)))
        np.testing.assert_allclose(packed[:, p * d:(p + 1) * d], single,
                                   rtol=1e-5, atol=1e-5)


def test_halo_from_ell_roundtrip(square_graph):
    src, dst, w, x, dense = square_graph
    ell = ell_adj_from_edges(src, dst, w, 50, 50, k=4)
    mesh = build_mesh(2, 4)
    halo = halo_from_ell(ell, mesh)
    assert isinstance(halo, HaloAdj)
    out = np.asarray(jax.jit(halo_spmm)(halo, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-5, atol=1e-5)


def test_epoch_hlo_has_no_nnz_sized_collectives(tiny_graph_dataset):
    """The round-1 GSPMD resolution all-reduced the whole (V*K, C) gather
    output across model shards (AUDIT_collectives_before.json). Assert the
    compiled model-sharded epoch never moves a payload within 2x of that
    gather-output size — communication must stay halo/table-sized."""
    from scripts.audit_collectives import audit_hlo
    from selfrec_tpu.config import ModelConf
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.ops import sampling
    from selfrec_tpu.parallel import mesh as mesh_lib

    train, test = tiny_graph_dataset
    conf = ModelConf({
        "training.set": "<memory>", "test.set": "<memory>",
        "model": {"name": "SimGCL", "type": "graph"},
        "item.ranking.topN": [5, 10], "embedding.size": 16,
        "max.epoch": 1, "batch.size": 64, "learning.rate": 0.05,
        "reg.lambda": 0.0001,
        "SimGCL": {"n_layer": 2, "lambda": 0.5, "eps": 0.1},
        "mesh": {"data": 4, "model": 2},
        "output": "/tmp/selfrec_tpu_test_results/", "seed": 0,
    })
    model = get_model_class("SimGCL")(conf, train, test)
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

    # nnz-sized payload: all ELL slots x packed channels (3 SimGCL passes)
    slots = model.adj.fwd.vidx.shape[0] * model.adj.fwd.vidx.shape[1] \
        * model.adj.fwd.vidx.shape[2]
    nnz_payload = slots * 3 * model.emb_size * 4
    for op, rec in counts.items():
        assert rec["largest"] < nnz_payload / 2, (
            f"{op} moves {rec['largest']}B ({rec['largest_shape']}) — "
            f"within 2x of the nnz-sized gather output ({nnz_payload}B)")
    # and the halo design's collectives are actually present
    assert counts, "expected collectives in a model-sharded epoch"
