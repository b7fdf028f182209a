"""Op-level tests: SpMM vs scipy, on-device renormalisation, negative
sampling invariants, losses vs torch-semantics closed forms, top-k eval."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from selfrec_tpu.ops import losses, ranking, sampling
from selfrec_tpu.ops.graph import (
    NormAdj,
    build_norm_adj_from_mask,
    lightgcn_propagate,
    norm_adj_from_scipy,
    perturbed_propagate,
    spmm,
)


@pytest.fixture(scope="module")
def rand_csr():
    rng = np.random.default_rng(3)
    dense = (rng.random((50, 50)) < 0.1).astype(np.float32)
    dense = np.maximum(dense, dense.T)  # symmetric
    return sp.csr_matrix(dense)


def test_spmm_matches_scipy(rand_csr):
    adj = norm_adj_from_scipy(rand_csr)
    x = np.random.default_rng(0).standard_normal((50, 8)).astype(np.float32)
    out = np.asarray(spmm(adj, jnp.asarray(x)))
    expected = rand_csr @ x
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_spmm_identity_is_noop():
    eye = sp.identity(32, format="csr", dtype=np.float32)
    adj = norm_adj_from_scipy(eye)
    x = np.random.default_rng(1).standard_normal((32, 4)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmm(adj, jnp.asarray(x))), x, rtol=1e-6)


def test_lightgcn_propagate_mean_layers(rand_csr):
    adj = norm_adj_from_scipy(rand_csr)
    x = np.random.default_rng(2).standard_normal((50, 8)).astype(np.float32)
    out = np.asarray(lightgcn_propagate(adj, jnp.asarray(x), 2, include_layer0=True))
    a = rand_csr.toarray()
    e1 = a @ x
    e2 = a @ e1
    np.testing.assert_allclose(out, (x + e1 + e2) / 3, rtol=1e-4, atol=1e-5)


def test_build_norm_adj_from_mask_matches_host():
    """On-device renormalisation == scipy convert_to_laplacian_mat on the
    kept-edge submatrix (reference SGL flow)."""
    rng = np.random.default_rng(5)
    n_u, n_i, n_e = 12, 15, 60
    eu = rng.integers(0, n_u, n_e).astype(np.int32)
    ei = rng.integers(0, n_i, n_e).astype(np.int32)
    # dedupe to keep degrees exact
    pairs = np.unique(np.stack([eu, ei], 1), axis=0)
    eu, ei = pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)
    keep = rng.random(len(eu)) > 0.3

    adj = build_norm_adj_from_mask(
        jnp.asarray(eu), jnp.asarray(ei), jnp.asarray(keep), n_u, n_i
    )
    x = rng.standard_normal((n_u + n_i, 6)).astype(np.float32)
    out = np.asarray(spmm(adj, jnp.asarray(x)))

    kept = sp.csr_matrix(
        (np.ones(keep.sum(), np.float32), (eu[keep], ei[keep])), shape=(n_u, n_i)
    )
    from selfrec_tpu.data.graph import normalize_graph_mat

    n = n_u + n_i
    upper = sp.csr_matrix(
        (kept.tocoo().data, (kept.tocoo().row, kept.tocoo().col + n_u)), shape=(n, n)
    )
    lap = normalize_graph_mat(upper + upper.T)
    np.testing.assert_allclose(out, lap @ x, rtol=1e-4, atol=1e-5)


def test_perturbed_propagate_noise_bounded(rand_csr):
    adj = norm_adj_from_scipy(rand_csr)
    x = np.random.default_rng(2).standard_normal((50, 8)).astype(np.float32)
    clean = np.asarray(lightgcn_propagate(adj, jnp.asarray(x), 2, include_layer0=False))
    eps = 0.1
    pert = np.asarray(
        perturbed_propagate(adj, jnp.asarray(x), 2, jax.random.PRNGKey(0), eps)
    )
    assert not np.allclose(clean, pert)
    # each layer adds noise with row-norm <= eps; 2 layers of propagation
    # keep the deviation bounded (loose sanity bound)
    assert np.linalg.norm(pert - clean, axis=1).max() < 10 * eps


def test_negative_sampling_excludes_rated():
    rng = np.random.default_rng(0)
    n_users, n_items = 30, 40
    offsets = [0]
    flat = []
    for u in range(n_users):
        rated = np.sort(rng.choice(n_items, size=rng.integers(1, 20), replace=False))
        flat.extend(rated.tolist())
        offsets.append(len(flat))
    flat = jnp.asarray(np.array(flat, np.int32))
    offsets_a = jnp.asarray(np.array(offsets, np.int32))
    users = jnp.asarray(rng.integers(0, n_users, 512).astype(np.int32))
    negs = sampling.sample_negatives(
        jax.random.PRNGKey(1), users, flat, offsets_a, n_items,
        shape=(512,), n_rounds=32, n_search_steps=8,
    )
    negs = np.asarray(negs)
    offsets = np.array(offsets)
    flat_np = np.asarray(flat)
    for u, j in zip(np.asarray(users), negs):
        rated = set(flat_np[offsets[u] : offsets[u + 1]].tolist())
        assert int(j) not in rated
        assert 0 <= j < n_items


def test_searchsorted_membership():
    flat = jnp.asarray(np.array([1, 5, 9, 2, 2, 7], np.int32))
    offsets = jnp.asarray(np.array([0, 3, 6], np.int32))
    seg = jnp.asarray(np.array([0, 0, 1, 1], np.int32))
    vals = jnp.asarray(np.array([5, 4, 2, 9], np.int32))
    found = sampling.searchsorted_in_segments(flat, offsets, seg, vals, 4)
    np.testing.assert_array_equal(np.asarray(found), [True, False, True, False])


def test_unique_with_mask():
    idx = jnp.asarray(np.array([3, 1, 3, 7, 1], np.int32))
    uniq, mask = sampling.unique_with_mask(idx, 5)
    got = set(np.asarray(uniq)[np.asarray(mask)].tolist())
    assert got == {1, 3, 7}
    assert int(mask.sum()) == 3


# ---- losses ------------------------------------------------------------


def test_bpr_loss_closed_form():
    u = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    p = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    n = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
    val = float(losses.bpr_loss(u, p, n))
    expected = -np.log(1e-5 + 1 / (1 + np.exp(-1.0)))
    np.testing.assert_allclose(val, expected, rtol=1e-5)


def test_bpr_loss_mask_matches_subset():
    rng = np.random.default_rng(0)
    u, p, n = (jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32)) for _ in range(3))
    mask = jnp.asarray(np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32))
    masked = float(losses.bpr_loss(u, p, n, mask=mask))
    subset = float(losses.bpr_loss(u[:5], p[:5], n[:5]))
    np.testing.assert_allclose(masked, subset, rtol=1e-6)


def test_l2_normalize_zero_row_grad_finite():
    """Regression: l2_normalize's VJP must be finite at exactly-zero rows.

    Zero rows are routine (MHCN H_p motif channels with empty rows, cold
    items after propagation). The naive ``x / max(||x||, eps)`` form
    differentiates sqrt at 0 and yields 0*inf = NaN in the backward pass —
    whether XLA's fusion surfaced it depended on the surrounding graph
    (the dense-MXU spmm path hit it; the ELL gather chain happened not
    to), which NaN-froze MHCN training on the dense backend (round 4).
    The rsqrt-of-clamped-sum-of-squares form is forward-identical to
    torch.nn.functional.normalize and has a finite VJP at 0."""
    import torch
    import torch.nn.functional as F

    x_np = np.random.default_rng(3).standard_normal((6, 4)).astype(np.float32)
    x_np[2] = 0.0  # exact zero row
    x_np[5] = 0.0

    # forward parity with torch.F.normalize, incl. the zero rows
    ours = np.asarray(losses.l2_normalize(jnp.asarray(x_np)))
    theirs = F.normalize(torch.from_numpy(x_np), dim=1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)

    # grad finite through a composition that produces the zero rows
    # *inside* the differentiated function (matmul -> normalize -> sum),
    # mirroring the propagate->normalize chain that NaN'd
    sel = jnp.asarray(np.diag([1, 1, 0, 1, 1, 0]).astype(np.float32))

    def f(x):
        return jnp.sum(losses.l2_normalize(sel @ x) * jnp.arange(4.0))

    g = jax.grad(f)(jnp.asarray(x_np))
    assert np.all(np.isfinite(np.asarray(g))), g


def test_l2_reg_loss_frobenius_over_rows():
    e = jnp.asarray(np.ones((4, 3), np.float32))
    val = float(losses.l2_reg_loss(0.5, e))
    np.testing.assert_allclose(val, 0.5 * np.sqrt(12) / 4, rtol=1e-5)


def test_infonce_matches_manual():
    rng = np.random.default_rng(1)
    v1 = rng.standard_normal((6, 4)).astype(np.float32)
    v2 = rng.standard_normal((6, 4)).astype(np.float32)
    val = float(losses.infonce(jnp.asarray(v1), jnp.asarray(v2), 0.2))
    n1 = v1 / np.linalg.norm(v1, axis=1, keepdims=True)
    n2 = v2 / np.linalg.norm(v2, axis=1, keepdims=True)
    logits = n1 @ n2.T / 0.2
    logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    np.testing.assert_allclose(val, -np.diag(logp).mean(), rtol=1e-4)


def test_infonce_mask_matches_subset():
    rng = np.random.default_rng(2)
    v1 = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    v2 = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    mask = jnp.asarray(np.array([1] * 5 + [0] * 3, np.float32))
    masked = float(losses.infonce(v1, v2, 0.2, mask=mask))
    subset = float(losses.infonce(v1[:5], v2[:5], 0.2))
    np.testing.assert_allclose(masked, subset, rtol=1e-4)


def test_uniformity_matches_pdist():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((10, 4)).astype(np.float32)
    val = float(losses.uniformity_loss(jnp.asarray(x)))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    d2 = []
    for i in range(10):
        for j in range(i + 1, 10):
            d2.append(((xn[i] - xn[j]) ** 2).sum())
    expected = np.log(np.mean(np.exp(-2 * np.array(d2))))
    np.testing.assert_allclose(val, expected, rtol=1e-4)


def test_batch_softmax_loss_manual():
    rng = np.random.default_rng(4)
    u = rng.standard_normal((5, 3)).astype(np.float32)
    i = rng.standard_normal((5, 3)).astype(np.float32)
    val = float(losses.batch_softmax_loss(jnp.asarray(u), jnp.asarray(i), 0.5))
    un = u / np.linalg.norm(u, axis=1, keepdims=True)
    iN = i / np.linalg.norm(i, axis=1, keepdims=True)
    pos = np.exp((un * iN).sum(1) / 0.5)
    ttl = np.exp(un @ iN.T / 0.5).sum(1)
    expected = -np.log(pos / ttl + 1e-5).mean()
    np.testing.assert_allclose(val, expected, rtol=1e-4)


# ---- ranking ------------------------------------------------------------


def test_topk_masks_rated_items():
    user_emb = jnp.asarray(np.eye(4, 6, dtype=np.float32))
    item_emb = jnp.asarray(np.eye(6, 6, dtype=np.float32) * 10)
    # user r's best item is item r; mask it for rows 0 and 1
    rows = jnp.asarray(np.array([0, 1, 99], np.int32))  # 99 out of range -> dropped
    cols = jnp.asarray(np.array([0, 1, 0], np.int32))
    scores, ids = ranking.topk_scores(user_emb, item_emb, rows, cols, 2)
    ids = np.asarray(ids)
    assert 0 not in ids[0]
    assert 1 not in ids[1]
    assert np.asarray(scores)[2][0] == 10.0  # unmasked row keeps its max


def test_batched_full_rank_matches_argsort():
    rng = np.random.default_rng(6)
    n_u, n_i, d = 23, 17, 5
    ue = rng.standard_normal((n_u, d)).astype(np.float32)
    ie = rng.standard_normal((n_i, d)).astype(np.float32)
    offsets = [0]
    flat = []
    for u in range(n_u):
        rated = np.sort(rng.choice(n_i, size=rng.integers(0, 5), replace=False))
        flat.extend(rated.tolist())
        offsets.append(len(flat))
    offsets = np.array(offsets, np.int32)
    flat = np.array(flat, np.int32)
    user_ids = np.arange(n_u, dtype=np.int32)
    results = list(
        ranking.batched_full_rank(
            user_ids, lambda uids: jnp.asarray(ue)[uids], jnp.asarray(ie),
            offsets, flat, k=4, block_size=8,
        )
    )
    assert len(results) == n_u
    for uid, ids, scores in results:
        ref_scores = ue[uid] @ ie.T
        ref_scores[flat[offsets[uid] : offsets[uid + 1]]] = -1e9
        expected = np.argsort(-ref_scores)[:4]
        np.testing.assert_array_equal(np.sort(ids), np.sort(expected))
        assert np.all(np.diff(scores) <= 1e-6)


def test_ssm_loss_closed_form():
    """ssm_loss (reference util/loss_tf.py:19-29) on a hand-checkable case:
    orthogonal positive/negatives."""
    import jax.numpy as jnp
    import numpy as np

    from selfrec_tpu.ops import losses

    u = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    p = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])  # cos=1 with user
    n = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])  # cos=0 with user
    # per row: pos=exp(1/.2); ttl=exp(1/.2)+2*exp(0/.2) (pos prepended + 2 negs... 
    # negatives matrix is (2,2): row u0 vs all negs: cos(u0,n0)=0, cos(u0,n1)=1
    pos = np.exp(5.0)
    ttl0 = np.exp(5.0) + np.exp(0.0) + np.exp(5.0)
    expected = -np.mean([np.log(pos / ttl0)] * 2)
    np.testing.assert_allclose(float(losses.ssm_loss(u, p, n)), expected, rtol=1e-5)


def test_fused_simgcl_propagate_matches_clean_chain():
    """With eps=0 the fused width-3D chain must equal the plain clean
    propagation for all three outputs (linearity of spmm)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from selfrec_tpu.ops.graph import fused_simgcl_propagate, lightgcn_propagate
    from selfrec_tpu.ops.spmm_ell import ell_adj_from_edges

    rng = np.random.default_rng(0)
    n, e = 80, 600
    rows = rng.integers(0, n, e).astype(np.int32)
    cols = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    adj = ell_adj_from_edges(cols, rows, w, n_rows=n, k=8)
    ego = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))

    clean_ref = lightgcn_propagate(adj, ego, 3, include_layer0=False)
    c, v1, v2 = fused_simgcl_propagate(adj, ego, 3, jax.random.PRNGKey(0), 0.0)
    for out in (c, v1, v2):
        np.testing.assert_allclose(np.asarray(out), np.asarray(clean_ref), rtol=1e-5)

    # with eps > 0 the perturbed views differ from clean and from each other
    c, v1, v2 = fused_simgcl_propagate(adj, ego, 3, jax.random.PRNGKey(0), 0.1)
    np.testing.assert_allclose(np.asarray(c), np.asarray(clean_ref), rtol=1e-5)
    assert np.abs(np.asarray(v1) - np.asarray(clean_ref)).max() > 1e-3
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-3


def test_bitmap_negative_sampling_excludes_rated():
    """pack_rated_bitmap + sample_negatives_bitmap: bitmap membership is
    exact vs the CSR, and the wide-negative (B, n_negs) sampler rejects
    rated items with the same semantics as the binary-search path."""
    rng = np.random.default_rng(3)
    n_users, n_items = 30, 70
    offsets = [0]
    flat = []
    for u in range(n_users):
        rated = np.sort(rng.choice(n_items, size=rng.integers(1, 25),
                                   replace=False))
        flat.extend(rated.tolist())
        offsets.append(len(flat))
    flat_np = np.array(flat, np.int32)
    offsets_np = np.array(offsets, np.int64)

    bm = sampling.pack_rated_bitmap(offsets_np, flat_np, n_users, n_items)
    assert bm.shape == (n_users, (n_items + 31) // 32)
    # bit-exact membership vs the CSR
    for u in range(n_users):
        rated = set(flat_np[offsets_np[u]:offsets_np[u + 1]].tolist())
        for it in range(n_items):
            bit = (int(bm[u, it >> 5]) >> (it & 31)) & 1
            assert bool(bit) == (it in rated), (u, it)

    users = jnp.asarray(rng.integers(0, n_users, 64).astype(np.int32))
    negs = np.asarray(sampling.sample_negatives_bitmap(
        jax.random.PRNGKey(2), users, jnp.asarray(bm), n_items,
        shape=(64, 8), n_rounds=32))
    assert negs.shape == (64, 8)
    for u, row in zip(np.asarray(users), negs):
        rated = set(flat_np[offsets_np[u]:offsets_np[u + 1]].tolist())
        for j in row:
            assert int(j) not in rated and 0 <= j < n_items


def test_bitmap_built_for_all_pairwise_models(monkeypatch, tiny_graph_dataset, tiny_conf_dict):
    """Round 4: the packed-bitmap membership probe serves EVERY pairwise
    sampler (not just n_negs>1) when it fits the budget, and the CSR
    binary-search fallback engages when it doesn't."""
    from selfrec_tpu.config import ModelConf
    from selfrec_tpu.models import get_model_class

    train, test = tiny_graph_dataset
    conf = dict(tiny_conf_dict)
    conf["model"] = {"name": "MF", "type": "graph"}
    conf["MF"] = {}

    m = get_model_class("MF")(ModelConf(conf), train, test)
    m.build()
    assert m._rated_bitmap is not None  # n_negs == 1, still bitmap

    monkeypatch.setenv("SELFREC_TPU_NEG_BITMAP_MB", "0")
    m2 = get_model_class("MF")(ModelConf(conf), train, test)
    m2.build()
    assert m2._rated_bitmap is None  # budget gate -> CSR fallback
    # both paths still train
    m2.train()


def test_device_epoch_batches_is_a_permutation():
    """epoch_pairwise_batches_device: every edge appears exactly once,
    pad rows are masked out, shapes match the host twin."""
    import numpy as np

    import jax

    eu = np.arange(1000, dtype=np.int32) % 37
    ei = np.arange(1000, dtype=np.int32) % 53
    B = 64
    u, i, m = sampling.epoch_pairwise_batches_device(
        jax.random.PRNGKey(3), jnp.asarray(eu), jnp.asarray(ei), B)
    hu, hi, hm = sampling.epoch_pairwise_batches(
        np.random.default_rng(0), eu, ei, B)
    assert u.shape == hu.shape and m.shape == hm.shape
    u, i, m = np.asarray(u), np.asarray(i), np.asarray(m)
    assert m.sum() == 1000 and m.reshape(-1)[:1000].all()
    # the (u, i) PAIRS are a permutation of the edge list
    got = sorted(zip(u.reshape(-1)[:1000].tolist(),
                     i.reshape(-1)[:1000].tolist()))
    want = sorted(zip(eu.tolist(), ei.tolist()))
    assert got == want
    # and actually shuffled (not identity at this size)
    assert u.reshape(-1)[:1000].tolist() != eu.tolist()


def test_bitmap_compacted_rejection_wide_lanes():
    """Round 4: the wide-lane bitmap sampler compacts failing lanes into
    a fixed-K buffer for the redraw rounds. Force the compacted path
    (16384 lanes > 4*K) on a DENSE tiny catalog (50% rated) so thousands
    of lanes fail the first probe, and assert every returned negative is
    unrated — identical semantics to the dense loop."""
    import numpy as np

    import jax

    n_users, n_items = 64, 400
    rng = np.random.default_rng(5)
    rated = [np.sort(rng.choice(n_items, size=n_items // 2, replace=False))
             for _ in range(n_users)]
    offsets = np.zeros(n_users + 1, np.int64)
    offsets[1:] = np.cumsum([len(r) for r in rated])
    flat = np.concatenate(rated).astype(np.int32)
    bm = jnp.asarray(sampling.pack_rated_bitmap(offsets, flat,
                                                n_users, n_items))
    B, NN = 256, 64  # 16384 lanes -> compacted path
    users = jnp.asarray(rng.integers(0, n_users, B).astype(np.int32))
    negs = np.asarray(sampling.sample_negatives_bitmap(
        jax.random.PRNGKey(0), users, bm, n_items, shape=(B, NN),
        n_rounds=12))
    assert negs.shape == (B, NN)
    assert (negs >= 0).all() and (negs < n_items).all()
    users_np = np.asarray(users)
    rated_sets = [set(r.tolist()) for r in rated]
    bad = sum(int(negs[b, t] in rated_sets[users_np[b]])
              for b in range(B) for t in range(NN))
    # p=0.5, 12 redraw rounds -> residual ~0.5^13 per lane ~ 2 expected
    assert bad <= 16, bad
