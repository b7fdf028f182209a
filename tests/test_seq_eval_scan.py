"""The one-dispatch sequential eval (SequentialRecommender.test's jitted
lax.scan over padded blocks) must return EXACTLY what the per-block
dispatch path it replaced returned — same ids, same scores, same
post-filter quirk (pad/oov ids dropped AFTER top-k,
/root/reference/base/seq_recommender.py:47-50). Uses batch.size=32 over
60 sequences so the final block is padded."""

import numpy as np

import jax.numpy as jnp

from selfrec_tpu.models import get_model_class
from selfrec_tpu.ops import ranking
from tests.test_sequential import make_conf


def _tiny_seqs():
    """Same generator as tests.test_sequential.tiny_seq_dataset (which is
    a fixture and can't be called directly)."""
    rng = np.random.default_rng(11)
    train, test = {}, {}
    for s in range(60):
        start = int(rng.integers(0, 20))
        length = int(rng.integers(6, 14))
        items = [f"i{(start + k) % 20}" for k in range(length)]
        train[f"s{s}"] = items
        test[f"s{s}"] = [f"i{(start + length) % 20}"]
    return train, test


def test_scan_eval_equals_per_block_path():
    train, test = _tiny_seqs()
    conf = make_conf(
        "SASRec", extra={"n_blocks": 1, "drop_rate": 0.1, "n_heads": 1})
    model = get_model_class("SASRec")(conf, train, test)
    model.build()

    rec_list = model.test()

    # reconstruct through the OLD path: per-block jitted predict + the
    # same unmasked top-k, then the same post-filter
    seq, pos, seq_len = model.data.padded_test_arrays(model.max_len)
    n = seq.shape[0]
    bs = model.batch_size
    item_names = ranking._cached_names(
        model.data, "_item_names_arr", model.data.id2item,
        model.data.item_num + 1)
    exp = {}
    for b0 in range(0, n, bs):
        s, p, sl = (seq[b0:b0 + bs], pos[b0:b0 + bs], seq_len[b0:b0 + bs])
        valid = s.shape[0]
        if valid < bs:
            padk = bs - valid
            s = np.concatenate([s, np.zeros((padk, s.shape[1]), s.dtype)])
            p = np.concatenate([p, np.zeros((padk, p.shape[1]), p.dtype)])
            sl = np.concatenate([sl, np.ones(padk, sl.dtype)])
        scores, ids = ranking.topk_scores_unmasked(
            model._predict_jit(model.params, jnp.asarray(s), jnp.asarray(p),
                               jnp.asarray(sl)), model.max_N)
        ids = np.asarray(ids)[:valid]
        scores = np.asarray(scores, dtype=np.float64)[:valid]
        for r in range(valid):
            name = model.data.original_seq[b0 + r][0]
            exp[name] = [
                (item_names[i], sc)
                for i, sc in zip(ids[r].tolist(), scores[r].tolist())
                if 0 < i <= model.data.item_num
            ]

    # The scan and the per-block jit compile to differently-fused f32
    # programs, so scores can differ in the last ulps and near-ties can
    # swap order; demand (a) same length, (b) scores allclose positionally,
    # (c) identical names wherever the local score margin exceeds the
    # numerical noise, (d) identical name multisets overall.
    TOL = 1e-5
    assert set(rec_list) == set(exp)
    for name in exp:
        got, want = rec_list[name], exp[name]
        assert len(got) == len(want), name
        g_sc = np.array([g[1] for g in got])
        w_sc = np.array([w[1] for w in want])
        np.testing.assert_allclose(g_sc, w_sc, rtol=1e-4, atol=1e-5,
                                   err_msg=name)
        assert sorted(g[0] for g in got) == sorted(w[0] for w in want), name
        for i, (g, w) in enumerate(zip(got, want)):
            lo = w_sc[i + 1] if i + 1 < len(want) else -np.inf
            hi = w_sc[i - 1] if i > 0 else np.inf
            clear_margin = (w_sc[i] - lo > TOL) and (hi - w_sc[i] > TOL)
            if clear_margin:
                assert g[0] == w[0], (name, i)
