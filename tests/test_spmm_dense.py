"""Dense-bipartite adjacency backend (ops/spmm_dense.py): forward vs the
edge-list/ELL formulations, dropout reweighting, gradients, backend
selection, and e2e model integration with the dense path forced."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from selfrec_tpu.ops import graph as g_ops
from selfrec_tpu.ops import spmm_dense as d_ops


def bipartite_edges(n_users, n_items, nnz, seed=0):
    rng = np.random.default_rng(seed)
    eu = rng.integers(0, n_users, nnz)
    ei = rng.integers(0, n_items, nnz)
    key = eu.astype(np.int64) * n_items + ei
    _, idx = np.unique(key, return_index=True)
    eu, ei = eu[idx].astype(np.int32), ei[idx].astype(np.int32)
    w = rng.random(len(eu)).astype(np.float32)
    return eu, ei, w


def unified_laplacian(eu, ei, w, n_users, n_items):
    src = np.concatenate([eu, ei + n_users])
    dst = np.concatenate([ei + n_users, eu])
    ww = np.concatenate([w, w])
    n = n_users + n_items
    return sp.csr_matrix((ww, (dst, src)), shape=(n, n))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dense_matches_edge_list(dtype):
    U, I = 120, 90
    eu, ei, w = bipartite_edges(U, I, 1500)
    lap = unified_laplacian(eu, ei, w, U, I)
    x = np.random.default_rng(1).standard_normal((U + I, 16)).astype(np.float32)

    ref = np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I, dtype=dtype)
    out = np.asarray(g_ops.spmm(adj, jnp.asarray(x)))
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(out, ref, rtol=tol, atol=tol)


def test_dense_reweight_matches_ell_dropout():
    """DenseAdj.reweight (the per-EPOCH view mechanism) with a dropout-style
    keep-mask == the same weights applied to the exact edge-list formulation."""
    U, I = 60, 45
    eu, ei, w = bipartite_edges(U, I, 600, seed=3)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I, dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    keep = jax.random.uniform(key, (len(eu),)) >= 0.4
    dropped = adj.reweight(jnp.where(keep, adj.edge_w / 0.6, 0.0))

    w_kept = np.where(np.asarray(keep), w / 0.6, 0.0).astype(np.float32)
    lap = unified_laplacian(eu, ei, w_kept, U, I)
    x = np.random.default_rng(2).standard_normal((U + I, 8)).astype(np.float32)
    ref = np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))
    out = np.asarray(g_ops.spmm(dropped, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_adj_dropout_on_sharded_dense_raises():
    """Per-step dropout is unsupported on the SHARDED dense layout —
    adj_dropout refuses it loudly (mesh builds keep ELL/halo for per-step
    dropout models). Single-device DenseAdj takes the dropout_view path
    (test_dense_dropout_view_matches_edge_oracle)."""
    from selfrec_tpu.parallel import dense_shard as ds
    from selfrec_tpu.parallel.mesh import build_mesh

    U, I = 20, 16
    eu, ei, w = bipartite_edges(U, I, 60, seed=4)
    adj = ds.build_sharded_dense(eu, ei, w, U, I, build_mesh(2, 4))
    with pytest.raises(TypeError, match="ShardedDenseAdj"):
        g_ops.adj_dropout(adj, jax.random.PRNGKey(0), 0.3)


def test_bipartite_blocks_rejects_asymmetric():
    """dense_spmm reuses one (U, I) block transposed for the item pass —
    an asymmetric unified matrix (e.g. row-normalized D^-1 A) must be
    rejected so the caller falls back to a layout storing both directions."""
    U, I = 12, 9
    eu, ei, w = bipartite_edges(U, I, 40, seed=5)
    n = U + I
    # symmetric passes
    sym = unified_laplacian(eu, ei, w, U, I).tocoo()
    assert d_ops.bipartite_blocks(sym, U) is not None
    # perturb one lower-block value -> asymmetric -> rejected
    asym = sp.coo_matrix(
        (np.concatenate([w, w * np.where(np.arange(len(w)) == 0, 2.0, 1.0)]),
         (np.concatenate([eu, ei + U]), np.concatenate([ei + U, eu]))),
        shape=(n, n))
    assert d_ops.bipartite_blocks(asym, U) is None
    # structurally asymmetric (missing lower entry) -> rejected
    miss = sp.coo_matrix(
        (np.concatenate([w, w[1:]]),
         (np.concatenate([eu, ei[1:] + U]), np.concatenate([ei + U, eu[1:]]))),
        shape=(n, n))
    assert d_ops.bipartite_blocks(miss, U) is None


def test_duplicate_edges_sum_like_sparse():
    """Duplicate (user, item) edges SUM in every backend: the dense scatter
    uses .add and the factored int8 detection bails to the generic block."""
    U, I = 10, 8
    eu = np.array([0, 0, 2, 5], np.int32)
    ei = np.array([1, 1, 3, 7], np.int32)
    w = np.array([0.5, 0.25, 1.0, 2.0], np.float32)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    assert not adj.factored  # duplicates can't factor into binary incidence
    blk = np.asarray(adj.a_ui, np.float32)
    assert blk[0, 1] == pytest.approx(0.75, rel=1e-2)

    x = np.random.default_rng(6).standard_normal((U + I, 4)).astype(np.float32)
    lap = unified_laplacian(eu, ei, w, U, I)  # scipy COO->CSR sums dups
    ref = np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))
    out = np.asarray(g_ops.spmm(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_dense_gradients_match_edge_list():
    U, I = 50, 40
    eu, ei, w = bipartite_edges(U, I, 400, seed=5)
    lap = unified_laplacian(eu, ei, w, U, I)
    edge_adj = g_ops.norm_adj_from_scipy(lap, ell=False)
    dense_adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((U + I, 8)).astype(np.float32))

    def loss(x, adj):
        return jnp.sum(g_ops.spmm(adj, x) ** 2)

    g_ref = np.asarray(jax.grad(loss)(x, edge_adj))
    g_dense = np.asarray(jax.grad(loss)(x, dense_adj))
    np.testing.assert_allclose(g_dense, g_ref, rtol=1e-4, atol=1e-4)


def test_backend_selection(monkeypatch):
    U, I = 30, 20
    eu, ei, w = bipartite_edges(U, I, 100, seed=6)
    lap = unified_laplacian(eu, ei, w, U, I)

    # forced on (works even on the CPU test backend)
    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    adj = g_ops.norm_adj_from_scipy(lap, n_users=U)
    assert isinstance(adj, d_ops.DenseAdj)
    # weights round-trip: dense block equals the scipy upper block
    blk = np.asarray(adj.a_ui, dtype=np.float32)
    ref_blk = lap[:U, U:].toarray()
    np.testing.assert_allclose(blk, ref_blk, rtol=2e-2, atol=2e-2)

    # disabled -> sparse path
    monkeypatch.setenv("SELFREC_TPU_DENSE", "0")
    adj = g_ops.norm_adj_from_scipy(lap, n_users=U)
    assert not isinstance(adj, d_ops.DenseAdj)

    # auto on CPU -> sparse path
    monkeypatch.delenv("SELFREC_TPU_DENSE", raising=False)
    adj = g_ops.norm_adj_from_scipy(lap, n_users=U)
    assert not isinstance(adj, d_ops.DenseAdj)

    # non-bipartite (diagonal-block nonzero) -> sparse even when forced
    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    social = lap.tolil()
    social[0, 1] = 0.5
    adj = g_ops.norm_adj_from_scipy(social.tocsr(), n_users=U)
    assert not isinstance(adj, d_ops.DenseAdj)

    # over budget -> sparse
    monkeypatch.setenv("SELFREC_TPU_DENSE_BUDGET_GB", "0.000001")
    adj = g_ops.norm_adj_from_scipy(lap, n_users=U)
    assert not isinstance(adj, d_ops.DenseAdj)


def test_lightgcn_e2e_dense_matches_ell(monkeypatch, tiny_graph_dataset):
    """LightGCN trained with the dense path forced (f32) reaches the same
    metrics as the ELL path — the backends are interchangeable inside the
    full jitted epoch (same seed, same sampler draws)."""
    from tests.test_models_e2e import run_model

    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    monkeypatch.setenv("SELFREC_TPU_DENSE", "0")
    _, perf_ell = run_model("LightGCN", tiny_graph_dataset, max_epoch=3)
    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    _, perf_dense = run_model("LightGCN", tiny_graph_dataset, max_epoch=3)
    for k in perf_ell:
        assert abs(perf_ell[k] - perf_dense[k]) < 2e-3, (
            k, perf_ell[k], perf_dense[k])


def laplacian_weights(eu, ei, n_users, n_items):
    du = np.bincount(eu, minlength=n_users).astype(np.float64)
    di = np.bincount(ei, minlength=n_items).astype(np.float64)
    return (1.0 / np.sqrt(du[eu] * di[ei])).astype(np.float32)


def test_factored_int8_detection_and_exactness():
    """Symmetric-normalized weights -> int8-factored mode; f32 matmul mode
    equals the edge-list formulation to f32 tolerance (the normalization is
    exact, not bf16-quantized)."""
    U, I = 100, 80
    eu, ei, _ = bipartite_edges(U, I, 1200, seed=8)
    w = laplacian_weights(eu, ei, U, I)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    assert adj.factored and adj.a_ui.dtype == jnp.int8

    lap = unified_laplacian(eu, ei, w, U, I)
    x = np.random.default_rng(9).standard_normal((U + I, 16)).astype(np.float32)
    ref = np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))

    adj_f32 = d_ops.DenseAdj(
        adj.a_ui, adj.edge_users, adj.edge_items, adj.edge_w, U, I,
        adj.row_scale, adj.col_scale, adj.gain, mm_dtype=jnp.float32)
    out = np.asarray(g_ops.spmm(adj_f32, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # bf16 matmul mode stays within bf16 tolerance
    out_bf16 = np.asarray(g_ops.spmm(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out_bf16, ref, rtol=3e-2, atol=3e-2)


def test_factored_not_triggered_by_arbitrary_weights():
    U, I = 40, 30
    eu, ei, w = bipartite_edges(U, I, 200, seed=10)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    assert not adj.factored


def test_factored_constant_weights():
    U, I = 40, 30
    eu, ei, _ = bipartite_edges(U, I, 200, seed=12)
    w = np.full(len(eu), 0.25, np.float32)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    assert adj.factored
    x = np.random.default_rng(3).standard_normal((U + I, 8)).astype(np.float32)
    lap = unified_laplacian(eu, ei, w, U, I)
    ref = np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))
    out = np.asarray(g_ops.spmm(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_factored_gradients():
    U, I = 50, 40
    eu, ei, _ = bipartite_edges(U, I, 400, seed=13)
    w = laplacian_weights(eu, ei, U, I)
    lap = unified_laplacian(eu, ei, w, U, I)
    edge_adj = g_ops.norm_adj_from_scipy(lap, ell=False)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    adj = d_ops.DenseAdj(adj.a_ui, adj.edge_users, adj.edge_items, adj.edge_w,
                         U, I, adj.row_scale, adj.col_scale, adj.gain,
                         mm_dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(14).standard_normal((U + I, 8)).astype(np.float32))

    def loss(x, a):
        return jnp.sum(g_ops.spmm(a, x) ** 2)

    g_ref = np.asarray(jax.grad(loss)(x, edge_adj))
    g_fac = np.asarray(jax.grad(loss)(x, adj))
    np.testing.assert_allclose(g_fac, g_ref, rtol=1e-4, atol=1e-4)


def test_compute_emb_jit_has_no_baked_adjacency(monkeypatch, tiny_graph_dataset):
    """Regression: jax.jit(compute_embeddings) once closed over the dense
    block as a program CONSTANT — the serialized compile request carried
    the whole adjacency and the axon remote-compile endpoint rejected it
    (HTTP 413). The jitted emb fn must receive scan_const_attrs as
    arguments; its lowered HLO must stay literal-free (small)."""
    import jax as _jax
    from tests.test_models_e2e import make_conf
    from selfrec_tpu.models import get_model_class

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    train, test = tiny_graph_dataset
    conf = make_conf("LightGCN", max_epoch=1)
    model = get_model_class("LightGCN")(conf, train, test)
    model.build()
    assert isinstance(model.adj, d_ops.DenseAdj)

    def emb_fn(params, consts):
        saved = {n: getattr(model, n) for n in consts}
        try:
            for n, v in consts.items():
                setattr(model, n, v)
            return model.compute_embeddings(params)
        finally:
            for n, v in saved.items():
                setattr(model, n, v)

    def max_constant_line(txt):
        return max((len(l) for l in txt.splitlines()
                    if "constant" in l and "dense<" in l), default=0)

    text = _jax.jit(emb_fn).lower(model.params, model._scan_consts()).as_text()
    baked = _jax.jit(model.compute_embeddings).lower(model.params).as_text()
    # the baked version inlines the block as a giant dense<...> literal;
    # the arg-threaded module must carry no large constant at all
    assert max_constant_line(baked) > 2000, "sentinel lost its baked literal"
    assert max_constant_line(text) < 2000, max_constant_line(text)
    # and the driver-facing wrapper is the arg-threaded one
    out = model._compute_emb_jit(model.params)
    assert out[0].shape[0] == model.data.user_num


def test_refactor_view_matches_renorm():
    """DenseAdj.refactor_view == on-device symmetric renorm over kept edges
    (ops/graph.bipartite_renorm_weights math), and stays int8-factored."""
    U, I = 70, 55
    eu, ei, _ = bipartite_edges(U, I, 700, seed=21)
    w = laplacian_weights(eu, ei, U, I)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    assert adj.factored

    keep = np.random.default_rng(22).random(len(eu)) > 0.3
    view = adj.refactor_view(jnp.asarray(keep))
    assert view.factored and view.a_ui.dtype == jnp.int8

    du = np.bincount(eu[keep], minlength=U)
    di = np.bincount(ei[keep], minlength=I)
    w_view = np.zeros_like(w)
    w_view[keep] = 1.0 / np.sqrt(
        np.maximum(du[eu[keep]] * di[ei[keep]], 1)).astype(np.float32)
    lap = unified_laplacian(eu, ei, w_view, U, I)
    x = np.random.default_rng(23).standard_normal((U + I, 8)).astype(np.float32)
    ref = np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))

    view_f32 = d_ops.DenseAdj(
        view.a_ui, view.edge_users, view.edge_items, view.edge_w, U, I,
        view.row_scale, view.col_scale, view.gain, mm_dtype=jnp.float32)
    out = np.asarray(g_ops.spmm(view_f32, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sgl_e2e_dense_views_match_ell(monkeypatch, tiny_graph_dataset):
    """SGL trained with the dense path forced (f32) — per-epoch views as
    refactored int8 blocks — reaches the same metrics as the packed-ELL
    path (same seed, same keep-mask draws)."""
    from tests.test_models_e2e import run_model

    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    monkeypatch.setenv("SELFREC_TPU_DENSE", "0")
    _, perf_ell = run_model("SGL", tiny_graph_dataset, max_epoch=7)
    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    _, perf_dense = run_model("SGL", tiny_graph_dataset, max_epoch=7)
    for k in perf_ell:
        assert abs(perf_ell[k] - perf_dense[k]) < 2e-3, (
            k, perf_ell[k], perf_dense[k])


def test_int8_quantized_mode_accuracy_and_grad():
    """Opt-in int8 x int8 mode (SELFREC_TPU_DENSE_DTYPE=int8): per-channel
    quantized operand, s32-exact accumulate. Forward within per-channel
    quantization tolerance of the f32 oracle; VJP is the symmetric apply
    (straight-through), so grad == int8-forward of the cotangent."""
    U, I = 100, 80
    eu, ei, _ = bipartite_edges(U, I, 1200, seed=8)
    w = laplacian_weights(eu, ei, U, I)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    adj8 = d_ops.DenseAdj(
        adj.a_ui, adj.edge_users, adj.edge_items, adj.edge_w, U, I,
        adj.row_scale, adj.col_scale, adj.gain, mm_dtype=jnp.int8)

    lap = unified_laplacian(eu, ei, w, U, I)
    x = np.random.default_rng(9).standard_normal((U + I, 16)).astype(np.float32)
    ref = np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))
    out = np.asarray(g_ops.spmm(adj8, jnp.asarray(x)))
    # per-channel absolute error bound: row_scale*col_scale sums scale the
    # operand's max/254 step; empirically well under 1% of the column max
    col_max = np.abs(ref).max(axis=0, keepdims=True)
    assert np.max(np.abs(out - ref) / np.maximum(col_max, 1e-6)) < 0.02

    g = np.random.default_rng(10).standard_normal(ref.shape).astype(np.float32)
    pull = jax.grad(
        lambda xx: jnp.vdot(g_ops.spmm(adj8, xx), jnp.asarray(g)))(
        jnp.asarray(x))
    expected = g_ops.spmm(adj8, jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(pull), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_int8_env_does_not_poison_generic_blocks(monkeypatch):
    """SELFREC_TPU_DENSE_DTYPE=int8 must not scatter arbitrary float
    weights into an s8 block — generic mode falls back to bf16."""
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "int8")
    U, I = 40, 30
    eu, ei, w = bipartite_edges(U, I, 200, seed=10)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    assert not adj.factored and adj.a_ui.dtype == jnp.bfloat16
    # reweight of a factored adj likewise lands on bf16
    eu2, ei2, _ = bipartite_edges(U, I, 200, seed=11)
    w2 = laplacian_weights(eu2, ei2, U, I)
    fac = d_ops.dense_adj_from_edges(eu2, ei2, w2, U, I)
    assert fac.factored and fac.mm_dtype == jnp.int8
    rw = fac.reweight(jnp.asarray(w2 * 0.5))
    assert rw.a_ui.dtype == jnp.bfloat16


def test_dense_mat_forward_and_grad_match_edge_list(monkeypatch):
    """Generic DenseMat (square + rectangular): forward equals the
    edge-list segment-sum path, and autodiff's transpose (A^T @ g) is
    exact — no custom VJP, same buffer. f32 forced at BUILD time (the
    bf16 default rounds values in the scatter itself)."""
    import scipy.sparse as sp

    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    rng = np.random.default_rng(12)
    for (M, N) in [(50, 50), (40, 70)]:
        mat = sp.random(M, N, density=0.1, random_state=3, format="csr",
                        dtype=np.float32)
        x = rng.standard_normal((N, 8)).astype(np.float32)
        dm = d_ops.dense_mat_from_scipy(mat)
        assert dm.a.dtype == jnp.float32
        ref = mat @ x
        out = np.asarray(g_ops.spmm(dm, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

        g = rng.standard_normal((M, 8)).astype(np.float32)
        pull = jax.grad(
            lambda xx: jnp.vdot(g_ops.spmm(dm, xx), jnp.asarray(g)))(
            jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(pull), mat.T @ g,
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mask_mode", ["scatter", "fused"])
def test_dense_dropout_view_matches_edge_oracle(monkeypatch, mask_mode):
    """DenseAdj.dropout_view == edge-list dropout with the SAME keep mask
    (reference sparse_dropout semantics: 1/(1-rate) rescale, no renorm),
    for BOTH mask strategies: per-edge scatter (CPU default) and the fused
    per-position stream (TPU default; per-edge restriction of a full
    Bernoulli matrix is distribution-identical since the block is binary).
    The factored form must survive (B x keep stays binary, rescale folds
    into gain). f32-forced for exactness."""
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    monkeypatch.setenv("SELFREC_TPU_DROPOUT_MASK", mask_mode)
    U, I, D = 45, 60, 8
    eu, ei, _ = bipartite_edges(U, I, 600, seed=20)
    w = laplacian_weights(eu, ei, U, I)
    adj = d_ops.dense_adj_from_edges(eu, ei, w, U, I)
    assert adj.factored

    key = jax.random.PRNGKey(7)
    rate = 0.3
    view = adj.dropout_view(key, rate)
    assert view.factored  # still factored: binary block + scaled gain

    # reproduce the mask the op drew (same key, same shape => identical)
    if mask_mode == "fused":
        mask = np.asarray(d_ops._rbg_keep_mask(key, (U, I), jnp.float32(rate)))
        keep = mask[np.asarray(eu), np.asarray(ei)]
        # the uint16 threshold quantizes keep prob to 1/65536 of the asked
        # rate — statistically invisible, checked here at the edge level
        assert abs(keep.mean() - (1 - rate)) < 0.08
    else:
        keep = np.asarray(jax.random.uniform(key, adj.edge_w.shape) >= rate)
    w2 = np.where(keep, w / (1.0 - rate), 0.0).astype(np.float32)
    lap = unified_laplacian(eu, ei, w2, U, I)
    x = np.random.default_rng(21).standard_normal((U + I, D)).astype(np.float32)
    ref = np.asarray(g_ops.spmm(
        g_ops.norm_adj_from_scipy(lap, ell=False), jnp.asarray(x)))
    out = np.asarray(g_ops.spmm(view, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # adj_dropout dispatches DenseAdj to dropout_view (traced rate ok)
    out2 = np.asarray(g_ops.spmm(
        g_ops.adj_dropout(adj, key, jnp.float32(rate)), jnp.asarray(x)))
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)


def test_buir_e2e_dense_dropout_matches_ell_band(monkeypatch,
                                                 tiny_graph_dataset):
    """BUIR trains through per-step dense dropout_view to the same quality
    band as the ELL path (RNG streams differ between the two dropout
    formulations, so bands — not bit-equality — are the contract)."""
    from selfrec_tpu.ops.spmm_dense import DenseAdj

    from tests.test_models_e2e import run_model

    monkeypatch.delenv("SELFREC_TPU_DENSE", raising=False)
    model_ell, perf_ell = run_model(
        "BUIR", tiny_graph_dataset,
        extra={"n_layer": 2, "drop_rate": 0.2, "tau": 0.995})

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "float32")
    model, perf_dense = run_model(
        "BUIR", tiny_graph_dataset,
        extra={"n_layer": 2, "drop_rate": 0.2, "tau": 0.995})
    assert isinstance(model.adj, DenseAdj)
    # the tiny dataset quantizes Hit Ratio in 0.025 steps and the two
    # dropout formulations draw DIFFERENT masks (per-position fused stream
    # vs per-edge), so the cross-path band is loose; the convergence-grade
    # gate is the 30-epoch h2h (results/h2h/our_BUIR_30.log, PARITY.md)
    assert perf_dense["Recall"] > 0.3 and perf_ell["Recall"] > 0.3
    for k in perf_ell:
        assert abs(perf_ell[k] - perf_dense[k]) < 0.15, (
            k, perf_ell[k], perf_dense[k])


def test_simgcl_e2e_int8x8_learns(monkeypatch, tiny_graph_dataset):
    """Full SimGCL train/test cycle with the int8x8 quantized mode forced
    on CPU: the per-channel quantized propagation + straight-through VJP
    must train to the same quality band as the default path (regression
    lock for the opt-in production mode; convergence-grade gates live in
    results/h2h/our_*_int8x8.log / PARITY.md)."""
    from tests.test_models_e2e import run_model

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "int8")
    model, perf = run_model(
        "SimGCL", tiny_graph_dataset,
        extra={"n_layer": 2, "lambda": 0.5, "eps": 0.1})
    assert model.adj.factored and model.adj.mm_dtype == jnp.int8
    assert perf["Recall"] > 0.2
