"""Coverage for the public surfaces VERDICT round 1 flagged as untested:

- ``ops.sampling.epoch_pointwise_batches`` (reference util/sampler.py:31-55)
- ``utils.metrics.rating_evaluation`` / ``mae`` / ``rmse``
  (reference util/evaluation.py:100-133)
- the ``profile.dir`` tracing hook (models/base._profiler_hook)
- top-k tie-break behavior of ``utils.similarity.find_k_largest`` and the
  device ranking path vs the reference's numba heap semantics
  (reference util/algorithm.py:144-156)
- DirectAU padded-final-batch uniformity deviation quantified
  (reference model/graph/DirectAU.py:37-48)
"""

import heapq
import os

import numpy as np
import pytest

from selfrec_tpu.ops import sampling
from selfrec_tpu.utils import metrics, similarity


# ---------------------------------------------------------------------------
# epoch_pointwise_batches


def test_pointwise_batches_structure():
    rng = np.random.default_rng(0)
    n_edges, n_items, bs, n_negs = 37, 50, 16, 4
    users = rng.integers(0, 9, n_edges).astype(np.int32)
    items = rng.integers(0, n_items, n_edges).astype(np.int32)
    u, i, y, m = sampling.epoch_pointwise_batches(
        rng, users, items, n_items=n_items, batch_size=bs, n_negs=n_negs
    )
    group = 1 + n_negs
    total = n_edges * group
    n_batches = -(-total // bs)
    assert u.shape == i.shape == y.shape == m.shape == (n_batches, bs)
    uf, if_, yf, mf = (a.reshape(-1) for a in (u, i, y, m))
    # mask covers exactly the real rows, pads are zero
    assert mf.sum() == total
    assert (yf[mf == 0] == 0).all()
    # each positive edge appears exactly once with label 1
    pos = yf[:total] == 1
    assert pos.sum() == n_edges
    got = sorted(zip(uf[:total][pos].tolist(), if_[:total][pos].tolist()))
    want = sorted(zip(users.tolist(), items.tolist()))
    assert got == want
    # every positive is followed by n_negs negatives for the same user
    flat_idx = np.flatnonzero(pos)
    assert (flat_idx == np.arange(n_edges) * group).all()
    for k in range(1, group):
        assert (uf[flat_idx[:-1] + k] == uf[flat_idx[:-1]]).all()
    # negatives: label 0, item ids in catalog range
    neg = (yf[:total] == 0)
    assert if_[:total][neg].min() >= 0 and if_[:total][neg].max() < n_items


# ---------------------------------------------------------------------------
# rating_evaluation


def test_rating_evaluation_matches_reference_math():
    # res entries are (user, item, ground_truth, prediction) like the
    # reference's rating predictor output (util/evaluation.py:100-110).
    res = [
        ("u1", "i1", 4.0, 3.5),
        ("u2", "i2", 2.0, 2.25),
        ("u3", "i3", 5.0, 4.0),
    ]
    errs = [0.5, 0.25, 1.0]
    want_mae = round(sum(errs) / 3, 5)
    want_rmse = round((sum(e * e for e in errs) / 3) ** 0.5, 5)
    out = metrics.rating_evaluation(res)
    assert out == [f"MAE:{want_mae}\n", f"RMSE:{want_rmse}\n"]
    assert metrics.mae([]) == 0 and metrics.rmse([]) == 0


# ---------------------------------------------------------------------------
# profiler hook


def test_profiler_hook_writes_trace(tiny_graph_dataset, tmp_path):
    from selfrec_tpu.config import ModelConf
    from selfrec_tpu.models import get_model_class

    train, test = tiny_graph_dataset
    profile_dir = str(tmp_path / "trace")
    conf = ModelConf(
        {
            "training.set": "<memory>",
            "test.set": "<memory>",
            "model": {"name": "MF", "type": "graph"},
            "item.ranking.topN": [5],
            "embedding.size": 8,
            "max.epoch": 3,
            "batch.size": 64,
            "learning.rate": 0.05,
            "reg.lambda": 0.0001,
            "output": "/tmp/selfrec_tpu_test_results/",
            "seed": 3,
            "profile.dir": profile_dir,
        }
    )
    model = get_model_class("MF")(conf, train, test)
    model.build()
    model.train()
    assert not getattr(model, "_trace_active", False)
    # jax.profiler writes <dir>/plugins/profile/<ts>/*.xplane.pb
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(profile_dir)
        for f in fs
    ]
    assert found, "profiler trace produced no files"


# ---------------------------------------------------------------------------
# top-k tie-break vs the reference heap


def reference_find_k_largest(K, candidates):
    """Pure-python port of the reference numba heap
    (util/algorithm.py:144-156): seed heap with first K (score, iid) tuples,
    heapreplace only on strictly-greater score (first-seen kept on ties),
    final sort descending by score (stable → heap order preserved on ties)."""
    n_candidates = []
    for iid, score in enumerate(candidates[:K]):
        n_candidates.append((score, iid))
    heapq.heapify(n_candidates)
    for iid, score in enumerate(candidates[K:]):
        if score > n_candidates[0][0]:
            heapq.heapreplace(n_candidates, (score, iid + K))
    n_candidates.sort(key=lambda d: d[0], reverse=True)
    ids = [item[1] for item in n_candidates]
    k_largest_scores = [item[0] for item in n_candidates]
    return ids, k_largest_scores


def test_find_k_largest_matches_heap_on_distinct_scores():
    rng = np.random.default_rng(11)
    for trial in range(5):
        scores = rng.permutation(200).astype(np.float64)  # all distinct
        ids_ref, sc_ref = reference_find_k_largest(10, scores.tolist())
        ids_our, sc_our = similarity.find_k_largest(10, scores)
        assert ids_our == ids_ref
        assert np.allclose(sc_our, sc_ref)


def test_topk_tie_break_score_sets_equal():
    """With tied scores the reference heap keeps the FIRST-seen candidate
    (strict ``>`` in heapreplace) while argpartition/lax.top_k prefer the
    lowest index. Both return the same score multiset; the id sets may
    legitimately differ within a tie group. Quantified here so the deviation
    is documented rather than silent (VERDICT round-1 missing item 3)."""
    import jax.numpy as jnp
    from selfrec_tpu.ops import ranking

    scores = np.array([1.0, 3.0, 3.0, 2.0, 3.0, 0.5, 2.0, 3.0], np.float32)
    k = 4
    ids_ref, sc_ref = reference_find_k_largest(k, scores.tolist())
    ids_our, sc_our = similarity.find_k_largest(k, scores)
    sc_dev, ids_dev = ranking.topk_scores_unmasked(jnp.asarray(scores), k)
    # score multisets identical across all three paths
    assert sorted(sc_ref) == sorted(sc_our) == sorted(np.asarray(sc_dev).tolist())
    # every returned id scores within the tie group (score >= kth largest)
    kth = sorted(scores)[-k]
    for ids in (ids_ref, ids_our, np.asarray(ids_dev).tolist()):
        assert all(scores[i] >= kth for i in ids)
    # lax.top_k documents lowest-index-first on ties
    assert np.asarray(ids_dev).tolist() == [1, 2, 4, 7]


# ---------------------------------------------------------------------------
# DirectAU padded-batch deviation (VERDICT round-1 weak item 6)


def test_directau_padded_batch_deviation_quantified():
    """Round-1 shipped unmasked uniformity over padded batches with a
    'negligible' claim; measuring it here showed +89% loss deviation on a
    half-padded batch (pad slots duplicate row 0 → zero-distance pairs
    dominate the logsumexp). The fix, ``uniformity_loss_masked``, must (a)
    equal the reference exact-size semantics bit-for-bit on the padded batch
    and (b) reduce to the unmasked loss on a full batch. The unmasked
    deviation is re-measured and asserted large, so the masked path can't be
    silently reverted. (DirectAU.py:37-48; PARITY.md)"""
    import jax.numpy as jnp
    from selfrec_tpu.ops import losses

    rng = np.random.default_rng(5)
    real, pad_to, d = 128, 256, 64
    u = jnp.asarray(rng.normal(size=(real, d)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(real, d)), jnp.float32)
    mask = jnp.ones((real,), jnp.float32)

    def directau_loss(u, p, mask, uniformity, gamma=2.0):
        align = losses.alignment_loss_masked(u, p, mask)
        return align + 0.5 * gamma * (uniformity(u, mask) + uniformity(p, mask))

    masked = losses.uniformity_loss_masked
    unmasked = lambda x, m: losses.uniformity_loss(x)

    exact = float(directau_loss(u, p, mask, masked))
    # full batch: masked == unmasked
    assert np.isclose(
        float(losses.uniformity_loss_masked(u, mask)),
        float(losses.uniformity_loss(u)),
        rtol=1e-6,
    )
    # pad by repeating row 0 (epoch_pairwise_batches pads ids with 0, so the
    # gathered embedding rows duplicate user/item 0)
    u_pad = jnp.concatenate([u, jnp.tile(u[:1], (pad_to - real, 1))])
    p_pad = jnp.concatenate([p, jnp.tile(p[:1], (pad_to - real, 1))])
    mask_pad = jnp.concatenate([mask, jnp.zeros(pad_to - real)])
    # masked path on the padded batch == exact-size reference semantics
    padded_fixed = float(directau_loss(u_pad, p_pad, mask_pad, masked))
    assert np.isclose(padded_fixed, exact, rtol=1e-5), (padded_fixed, exact)
    # the old unmasked path really was badly biased (documents the round-1 bug)
    padded_broken = float(directau_loss(u_pad, p_pad, mask_pad, unmasked))
    rel = abs(padded_broken - exact) / abs(exact)
    assert rel > 0.5, f"expected large unmasked deviation, got {rel:.4f}"


def test_uniformity_masked_degenerate_batch_finite():
    """A final batch with <2 valid rows has zero valid pairs. The reference
    would produce -inf (torch.logsumexp over pdist's empty output) and NaN
    its backward pass; we return 0 with a finite zero gradient (documented
    deviation, PARITY.md)."""
    import jax
    import jax.numpy as jnp
    from selfrec_tpu.ops import losses

    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)), jnp.float32)
    for n_valid in (0, 1):
        mask = jnp.zeros(8).at[:n_valid].set(1.0)
        val = float(losses.uniformity_loss_masked(x, mask))
        assert val == 0.0
        g = jax.grad(lambda xx: losses.uniformity_loss_masked(xx, mask))(x)
        assert np.all(np.isfinite(np.asarray(g))) and np.all(np.asarray(g) == 0)
    # 2 valid rows: one pair, well-defined and finite
    mask2 = jnp.zeros(8).at[:2].set(1.0)
    v2 = float(losses.uniformity_loss_masked(x, mask2))
    d2 = float(jnp.sum((losses.l2_normalize(x[0]) - losses.l2_normalize(x[1])) ** 2))
    assert np.isclose(v2, -2 * d2, rtol=1e-5)


def test_compile_cache_env_wires_jax_config():
    """SELFREC_TPU_COMPILE_CACHE=<dir> must configure JAX's persistent
    compilation cache at package import (selfrec_tpu/__init__.py); unset,
    the config must be left alone. Run in subprocesses so the import-time
    hook actually executes."""
    import subprocess
    import sys

    probe = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import selfrec_tpu;"
        "print(repr(jax.config.jax_compilation_cache_dir))"
    )
    import os
    env = dict(os.environ, SELFREC_TPU_COMPILE_CACHE="/tmp/selfrec_cc_test")
    out = subprocess.run([sys.executable, "-c", probe], env=env,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "/tmp/selfrec_cc_test" in out.stdout, out.stdout

    env_off = {k: v for k, v in os.environ.items()
               if k != "SELFREC_TPU_COMPILE_CACHE"}
    out = subprocess.run([sys.executable, "-c", probe], env=env_off,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "/tmp/selfrec_cc_test" not in out.stdout, out.stdout
