"""Mesh-sharded dense-bipartite backend (parallel/dense_shard.py): parity
with the exact edge-list formulation on several mesh shapes (forward,
gradient, reweighted views, factored dropped views), budget gating, and a
full jitted training epoch under a mesh with dense forced."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from selfrec_tpu.ops import graph as g_ops
from selfrec_tpu.parallel import dense_shard as ds
from selfrec_tpu.parallel.mesh import build_mesh

MESHES = [(1, 8), (8, 1), (2, 4), (4, 2)]


def bipartite(U, I, nnz, seed=0):
    rng = np.random.default_rng(seed)
    eu = rng.integers(0, U, nnz)
    ei = rng.integers(0, I, nnz)
    key = eu.astype(np.int64) * I + ei
    _, idx = np.unique(key, return_index=True)
    eu, ei = eu[idx].astype(np.int32), ei[idx].astype(np.int32)
    du = np.bincount(eu, minlength=U)
    di = np.bincount(ei, minlength=I)
    w = (1.0 / np.sqrt(np.maximum(du[eu] * di[ei], 1))).astype(np.float32)
    return eu, ei, w


def unified(eu, ei, w, U, I):
    src = np.concatenate([eu, ei + U])
    dst = np.concatenate([ei + U, eu])
    ww = np.concatenate([w, w])
    return sp.csr_matrix((ww, (dst, src)), shape=(U + I, U + I))


def edge_ref(eu, ei, w, U, I, x):
    lap = unified(eu, ei, w, U, I)
    return np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))


@pytest.fixture(autouse=True)
def f32_dense(monkeypatch):
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")


@pytest.mark.parametrize("shape", MESHES)
def test_forward_and_grad_match_edge_list(shape):
    U, I, D = 37, 53, 8
    eu, ei, w = bipartite(U, I, 400)
    x = np.random.default_rng(1).standard_normal((U + I, D)).astype(np.float32)
    mesh = build_mesh(*shape)
    adj = ds.build_sharded_dense(eu, ei, w, U, I, mesh)
    assert adj.factored and adj.b.dtype == jnp.int8

    ref = edge_ref(eu, ei, w, U, I, x)
    out = np.asarray(ds.sharded_dense_spmm(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    lap = unified(eu, ei, w, U, I)
    edge_adj = g_ops.norm_adj_from_scipy(lap, ell=False)
    g_ref = np.asarray(jax.grad(
        lambda xx: jnp.sum(g_ops.spmm(edge_adj, xx) ** 2))(jnp.asarray(x)))
    g_out = np.asarray(jax.grad(
        lambda xx: jnp.sum(ds.sharded_dense_spmm(adj, xx) ** 2))(
            jnp.asarray(x)))
    np.testing.assert_allclose(g_out, g_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_reweight_and_factored_view(shape):
    U, I, D = 30, 44, 8
    eu, ei, w = bipartite(U, I, 350, seed=2)
    x = np.random.default_rng(3).standard_normal((U + I, D)).astype(np.float32)
    mesh = build_mesh(*shape)
    adj = ds.build_sharded_dense(eu, ei, w, U, I, mesh)

    rng = np.random.default_rng(4)
    keep = rng.random(len(w)) > 0.3
    # generic reweight: arbitrary per-edge weights, local scatters only
    w2 = np.where(keep, w * 2, 0).astype(np.float32)
    out2 = np.asarray(ds.sharded_dense_spmm(
        adj.reweight(jnp.asarray(w2)), jnp.asarray(x)))
    np.testing.assert_allclose(out2, edge_ref(eu, ei, w2, U, I, x),
                               rtol=1e-5, atol=1e-5)

    # factored dropped view: symmetric renorm over kept edges stays int8
    view = adj.refactor_view(jnp.asarray(keep))
    assert view.factored and view.b.dtype == jnp.int8
    du = np.bincount(eu[keep], minlength=U)
    di = np.bincount(ei[keep], minlength=I)
    w3 = np.zeros_like(w)
    w3[keep] = 1.0 / np.sqrt(np.maximum(du[eu[keep]] * di[ei[keep]], 1))
    out3 = np.asarray(ds.sharded_dense_spmm(view, jnp.asarray(x)))
    np.testing.assert_allclose(out3, edge_ref(eu, ei, w3, U, I, x),
                               rtol=1e-5, atol=1e-5)


def test_packed_width_rides_free():
    """Multi-chain propagation packs as width (cost independent of D for
    dense): spmm of (n, 3D) == 3 stacked spmm of (n, D)."""
    U, I, D = 25, 31, 4
    eu, ei, w = bipartite(U, I, 200, seed=5)
    mesh = build_mesh(2, 4)
    adj = ds.build_sharded_dense(eu, ei, w, U, I, mesh)
    x = np.random.default_rng(6).standard_normal(
        (U + I, 3 * D)).astype(np.float32)
    packed = np.asarray(ds.sharded_dense_spmm(adj, jnp.asarray(x)))
    for p in range(3):
        single = np.asarray(ds.sharded_dense_spmm(
            adj, jnp.asarray(x[:, p * D:(p + 1) * D])))
        np.testing.assert_allclose(packed[:, p * D:(p + 1) * D], single,
                                   rtol=1e-5, atol=1e-5)


def test_budget_gate_scales_with_devices(monkeypatch):
    U, I = 1000, 1000
    mesh = build_mesh(2, 4)
    # 1 MB budget: 1000*1000*4B = 4 MB total but 0.5 MB per device -> fits
    monkeypatch.setenv("SELFREC_TPU_DENSE_BUDGET_GB", "0.001")
    assert ds.fits_sharded_dense(U, I, mesh)
    from selfrec_tpu.ops.spmm_dense import fits_dense

    assert not fits_dense(U, I)  # single-chip gate correctly refuses
    monkeypatch.setenv("SELFREC_TPU_DENSE_BUDGET_GB", "0.0001")
    assert not ds.fits_sharded_dense(U, I, mesh)


def test_memory_is_partitioned_not_replicated():
    U, I = 64, 96
    eu, ei, w = bipartite(U, I, 500, seed=7)
    mesh = build_mesh(2, 4)
    adj = ds.build_sharded_dense(eu, ei, w, U, I, mesh)
    nd, nm = adj.grid
    # global logical size = one copy of the (padded) block, spread over grid
    assert adj.b.shape == (nd, nm, adj.u_pad, adj.i_blk)
    assert nd * nm * adj.i_blk == adj.i_pad
    # every device holds exactly one (u_pad, i_blk) slice
    for shard in adj.b.addressable_shards:
        assert shard.data.shape == (1, 1, adj.u_pad, adj.i_blk)


def test_model_e2e_sharded_dense_matches_single(monkeypatch, tiny_graph_dataset):
    """SimGCL trained one jitted epoch under (4,2) and (8,1) meshes with the
    sharded dense adjacency matches the single-device DENSE run (same seed,
    same sampler draws) — the round-2 MXU win survives the mesh."""
    from tests.test_parallel import make_conf
    from selfrec_tpu.models import get_model_class

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    train, test = tiny_graph_dataset
    cls = get_model_class("SimGCL")

    runs = {}
    for name, mesh in [("single", None), ("dp_tp", {"data": 4, "model": 2}),
                       ("dp", {"data": 8, "model": 1})]:
        model = cls(make_conf(mesh=mesh), train, test)
        if mesh is None:
            from selfrec_tpu.ops.spmm_dense import DenseAdj

            assert isinstance(model.adj, DenseAdj)
        else:
            assert isinstance(model.adj, ds.ShardedDenseAdj)
        model.build()
        model.run_epoch(0)
        runs[name] = np.asarray(model.params["user_emb"])

    np.testing.assert_allclose(runs["single"], runs["dp_tp"],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(runs["single"], runs["dp"],
                               rtol=2e-4, atol=2e-5)


def test_comm_bytes_model():
    U, I = 64, 96
    eu, ei, w = bipartite(U, I, 300, seed=8)
    mesh = build_mesh(2, 4)
    adj = ds.build_sharded_dense(eu, ei, w, U, I, mesh)
    cb = adj.comm_bytes(n_channels=64)
    # all volumes are embedding-block-sized: << U*I and << nnz*K
    assert max(cb.values()) <= adj.u_pad * 64 * 4
    assert all(v >= 0 for v in cb.values())


def test_sgl_sharded_dense_views_match_single(monkeypatch, tiny_graph_dataset):
    """SGL under a (4,2) mesh with dense forced: per-epoch views are
    refactored SHARDED int8 blocks (local scatters only); one trained epoch
    matches the single-device dense run."""
    from tests.test_parallel import make_conf
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.ops.spmm_dense import DenseAdj

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    train, test = tiny_graph_dataset
    cls = get_model_class("SGL")

    runs = {}
    for name, mesh in [("single", None), ("dp_tp", {"data": 4, "model": 2})]:
        model = cls(make_conf(mesh=mesh), train, test)
        expect = DenseAdj if mesh is None else ds.ShardedDenseAdj
        assert isinstance(model.adj, expect)
        assert model._view_template is None  # dense-views branch active
        model.build()
        model.run_epoch(0)
        assert isinstance(model._view1, expect) and model._view1.factored
        runs[name] = np.asarray(model.params["user_emb"])

    np.testing.assert_allclose(runs["single"], runs["dp_tp"],
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_int8_quantized_sharded_mode(monkeypatch, shape):
    """SELFREC_TPU_DENSE_DTYPE=int8 on a mesh: per-device local per-channel
    quantization, s8 x s8 matmuls, f32 dequant BEFORE the psum. Forward
    within quantization tolerance of the edge-list oracle; VJP is the
    symmetric straight-through apply; generic reweight falls back to bf16
    (never raw-casts floats into the s8 block)."""
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "int8")
    U, I, D = 41, 57, 8
    eu, ei, w = bipartite(U, I, 500, seed=7)
    x = np.random.default_rng(8).standard_normal((U + I, D)).astype(np.float32)
    mesh = build_mesh(*shape)
    adj = ds.build_sharded_dense(eu, ei, w, U, I, mesh)
    assert adj.factored and adj.b.dtype == jnp.int8
    assert adj.mm_dtype == jnp.int8

    ref = edge_ref(eu, ei, w, U, I, x)
    out = np.asarray(ds.sharded_dense_spmm(adj, jnp.asarray(x)))
    col_max = np.abs(ref).max(axis=0, keepdims=True)
    assert np.max(np.abs(out - ref) / np.maximum(col_max, 1e-6)) < 0.02

    # straight-through VJP: pullback == quantized forward of the cotangent
    g = np.random.default_rng(9).standard_normal(ref.shape).astype(np.float32)
    pull = jax.grad(
        lambda xx: jnp.vdot(ds.sharded_dense_spmm(adj, xx), jnp.asarray(g)))(
        jnp.asarray(x))
    expected = ds.sharded_dense_spmm(adj, jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(pull), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)

    # generic reweight must land on bf16, and still be numerically right
    w2 = (w * 1.7).astype(np.float32)
    rw = adj.reweight(jnp.asarray(w2))
    assert rw.b.dtype == jnp.bfloat16 and rw.mm_dtype == jnp.bfloat16
    out2 = np.asarray(ds.sharded_dense_spmm(rw, jnp.asarray(x)))
    ref2 = edge_ref(eu, ei, w2, U, I, x)
    assert np.max(np.abs(out2 - ref2)) < 0.05  # bf16 value-block tolerance

    # factored dropped view keeps the quantized fast path
    keep = np.random.default_rng(10).random(len(w)) > 0.3
    view = adj.refactor_view(jnp.asarray(keep))
    assert view.factored and view.mm_dtype == jnp.int8
