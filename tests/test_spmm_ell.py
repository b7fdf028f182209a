"""Row-split ELL SpMM correctness: forward vs scipy, gradients vs the
segment-sum formulation, reweighting, model integration."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from selfrec_tpu.ops import graph as g_ops
from selfrec_tpu.ops.spmm_ell import EllAdj, ell_adj_from_edges


def random_graph(n_rows, n_cols, nnz, seed=0, power_law=True):
    rng = np.random.default_rng(seed)
    if power_law:
        p = 1.0 / np.arange(1, n_rows + 1)
        p /= p.sum()
        rows = rng.choice(n_rows, size=nnz, p=p)
    else:
        rows = rng.integers(0, n_rows, nnz)
    cols = rng.integers(0, n_cols, nnz)
    key = rows.astype(np.int64) * n_cols + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    w = rng.random(len(rows)).astype(np.float32)
    return rows.astype(np.int32), cols.astype(np.int32), w


@pytest.mark.parametrize("k", [4, 32])
@pytest.mark.parametrize("shape", [(200, 200), (150, 80)])
def test_ell_matches_scipy(k, shape):
    n_rows, n_cols = shape
    rows, cols, w = random_graph(n_rows, n_cols, 3000)
    mat = sp.csr_matrix((w, (rows, cols)), shape=shape)
    x = np.random.default_rng(1).standard_normal((n_cols, 16)).astype(np.float32)

    adj = ell_adj_from_edges(cols, rows, w, n_rows=n_rows, n_cols=n_cols, k=k)
    out = np.asarray(g_ops.spmm(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, mat @ x, rtol=1e-4, atol=1e-5)


def test_ell_gradients_match_segment_sum():
    n = 120
    rows, cols, w = random_graph(n, n, 1500)
    adj_ell = ell_adj_from_edges(cols, rows, w, n_rows=n, k=8)
    adj_ref = g_ops.NormAdj(
        jnp.asarray(cols), jnp.asarray(rows), jnp.asarray(w), n
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, 8)).astype(np.float32)
    )
    t = jnp.asarray(
        np.random.default_rng(3).standard_normal((n, 8)).astype(np.float32)
    )

    def loss_ell(x):
        return jnp.sum(g_ops.spmm(adj_ell, x) * t)

    def loss_ref(x):
        return jnp.sum(g_ops.spmm(adj_ref, x) * t)

    np.testing.assert_allclose(loss_ell(x), loss_ref(x), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_ell)(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_ell_reweight_and_dropout():
    n = 100
    rows, cols, w = random_graph(n, n, 1200)
    adj = ell_adj_from_edges(cols, rows, w, n_rows=n, k=8)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, 4)).astype(np.float32)
    )
    # reweight with doubled weights == 2x output
    out1 = np.asarray(g_ops.spmm(adj, x))
    out2 = np.asarray(g_ops.spmm(adj.reweight(jnp.asarray(2 * w)), x))
    np.testing.assert_allclose(out2, 2 * out1, rtol=1e-5)

    # dropout at rate ~0 is identity; at rate r the expectation is preserved
    dropped = g_ops.adj_dropout(adj, jax.random.PRNGKey(0), 1e-9)
    np.testing.assert_allclose(
        np.asarray(g_ops.spmm(dropped, x)), out1, rtol=1e-4, atol=1e-5
    )
    r = 0.5
    outs = []
    for s in range(30):
        d = g_ops.adj_dropout(adj, jax.random.PRNGKey(s), r)
        outs.append(np.asarray(g_ops.spmm(d, x)))
    mean_out = np.mean(outs, axis=0)
    np.testing.assert_allclose(
        mean_out, out1, atol=0.25 * np.abs(out1).max() + 0.05
    )


def test_norm_adj_from_scipy_ell_default(tiny_graph_dataset):
    from selfrec_tpu.data.interaction import Interaction

    train, test = tiny_graph_dataset
    data = Interaction(None, train, test)
    adj = g_ops.norm_adj_from_scipy(data.norm_adj)
    assert isinstance(adj, EllAdj)
    adj_ref = g_ops.norm_adj_from_scipy(data.norm_adj, ell=False)
    x = jnp.asarray(
        np.random.default_rng(5)
        .standard_normal((data.user_num + data.item_num, 8))
        .astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(g_ops.spmm(adj, x)),
        np.asarray(g_ops.spmm(adj_ref, x)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_ell_bf16_compute_close_to_f32():
    from selfrec_tpu.ops import precision

    n = 150
    rows, cols, w = random_graph(n, n, 2000)
    adj = ell_adj_from_edges(cols, rows, w, n_rows=n, k=8)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((n, 16)).astype(np.float32)
    )
    out32 = np.asarray(g_ops.spmm(adj, x))
    precision.set_compute_dtype("bfloat16")
    try:
        out16 = np.asarray(g_ops.spmm(adj, x))
        assert out16.dtype == np.float32  # f32 accumulate
    finally:
        precision.set_compute_dtype("float32")
    # bf16 inputs, f32 accumulate: error bounded by a few ulps of the
    # OUTPUT SCALE (entries near zero cancel, so pointwise relative error
    # is the wrong metric)
    scale = np.abs(out32).max()
    assert np.abs(out16 - out32).max() < 0.02 * scale


def test_bipartite_ell_template_reweight_matches_host_renorm(tiny_graph_dataset):
    """Dropped-view fast path == host edge_dropout + convert_to_laplacian_mat
    (the reference SGL pipeline, SGL.py:89-96)."""
    import numpy as np
    import scipy.sparse as sp

    from selfrec_tpu.data.interaction import Interaction
    from selfrec_tpu.ops.graph import (
        bipartite_renorm_weights,
        build_bipartite_ell_template,
    )

    train, test = tiny_graph_dataset
    data = Interaction(None, train, test)
    rng = np.random.default_rng(3)
    keep = rng.random(data.n_edges) > 0.2

    # host reference pipeline
    kept_mat = sp.csr_matrix(
        (
            np.ones(int(keep.sum()), np.float32),
            (data.edge_users[keep], data.edge_items[keep]),
        ),
        shape=(data.user_num, data.item_num),
    )
    host_norm = data.convert_to_laplacian_mat(kept_mat)

    # device fast path
    tmpl = build_bipartite_ell_template(
        data.edge_users, data.edge_items, data.user_num, data.item_num, k=8
    )
    w = bipartite_renorm_weights(
        jnp.asarray(data.edge_users),
        jnp.asarray(data.edge_items),
        jnp.asarray(keep),
        data.user_num,
        data.item_num,
    )
    adj = tmpl.reweight(w)
    n = data.user_num + data.item_num
    x = np.random.default_rng(4).standard_normal((n, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(g_ops.spmm(adj, jnp.asarray(x))),
        host_norm @ x,
        rtol=1e-4,
        atol=1e-5,
    )


def test_chunked_apply_matches_unchunked(monkeypatch):
    """Dense aux graphs (MHCN motifs: V*K ≈ 38M at douban scale) OOM the
    one-shot (V*K, D) gather on a 16GB chip; above _CHUNK_BYTES the apply
    switches to a sequential lax.map over row chunks. Force a tiny budget
    and check both the plain and packed chunked paths agree with scipy."""
    from selfrec_tpu.ops import spmm_ell

    n_rows, n_cols, d, k = 150, 80, 16, 4
    rows, cols, w = random_graph(n_rows, n_cols, 3000)
    mat = sp.csr_matrix((w, (rows, cols)), shape=(n_rows, n_cols))
    x = np.random.default_rng(1).standard_normal((n_cols, d)).astype(np.float32)

    adj = ell_adj_from_edges(cols, rows, w, n_rows=n_rows, n_cols=n_cols, k=k)
    want = mat @ x
    monkeypatch.setattr(spmm_ell, "_CHUNK_BYTES", 4096)  # forces many chunks
    out = np.asarray(g_ops.spmm(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)

    # gradient flows through the chunked backward apply too
    gfn = jax.grad(lambda xx: g_ops.spmm(adj, xx).sum())
    gx = np.asarray(gfn(jnp.asarray(x)))
    np.testing.assert_allclose(gx, np.asarray(mat.sum(axis=0)).ravel()[:, None]
                               * np.ones((1, d), np.float32), rtol=1e-4, atol=1e-5)

    # packed: 2 passes over one layout with different weights
    w2 = (w * 0.5).astype(np.float32)
    w_stack = jnp.stack([jnp.asarray(w), jnp.asarray(w2)])
    x2 = np.concatenate([x, 2 * x], axis=1)
    outp = np.asarray(
        spmm_ell.ell_spmm_packed(adj, w_stack, jnp.asarray(x2), 2))
    want2 = sp.csr_matrix((w2, (rows, cols)), shape=(n_rows, n_cols)) @ (2 * x)
    np.testing.assert_allclose(outp[:, :d], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outp[:, d:], want2, rtol=1e-4, atol=1e-5)
