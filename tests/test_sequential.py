"""Sequential engine tests: data layer, augmentors, e2e model smoke runs."""

import numpy as np
import pytest

from selfrec_tpu.config import ModelConf
from selfrec_tpu.models import get_model_class
from selfrec_tpu.utils import metrics


@pytest.fixture(scope="session")
def tiny_seq_dataset():
    """Deterministic sequences with a strong next-item pattern: items cycle
    0..19, each sequence walks the cycle from a random offset, so the next
    item is highly predictable."""
    rng = np.random.default_rng(11)
    train, test = {}, {}
    for s in range(60):
        start = int(rng.integers(0, 20))
        length = int(rng.integers(6, 14))
        items = [f"i{(start + k) % 20}" for k in range(length)]
        train[f"s{s}"] = items
        test[f"s{s}"] = [f"i{(start + length) % 20}"]
    return train, test


def make_conf(name, extra=None, **top):
    conf = {
        "training.set": "<memory>",
        "test.set": "<memory>",
        "model": {"name": name, "type": "sequential"},
        "item.ranking.topN": [5, 10],
        "embedding.size": 32,
        "max.epoch": 12,
        "batch.size": 32,
        "learning.rate": 0.01,
        "reg.lambda": 0.0001,
        "max.len": 16,
        "output": "/tmp/selfrec_tpu_test_results/",
        "seed": 3,
    }
    conf.update({k.replace("_", "."): v for k, v in top.items()})
    if extra:
        conf[name] = extra
    return ModelConf(conf)


def run_model(name, dataset, extra=None, **top):
    train, test = dataset
    conf = make_conf(name, extra=extra, **top)
    model = get_model_class(name)(conf, train, test)
    model.build()
    model.train()
    rec_list = model.test()
    measure = metrics.ranking_evaluation(model.data.test_set, rec_list, [10])
    return model, metrics.parse_measure(measure)


def test_sequence_data_layer(tiny_seq_dataset):
    from selfrec_tpu.data.sequence import Sequence

    train, test = tiny_seq_dataset
    data = Sequence(None, train, test)
    assert data.item_num == 20
    assert data.raw_seq_num == 60
    seq, pos, y, seq_len = data.padded_training_arrays(16)
    # y is seq shifted by one
    r = 0
    L = seq_len[r]
    assert L >= 1
    np.testing.assert_array_equal(seq[r, 1:L], y[r, : L - 1])
    assert (seq[r, L:] == 0).all()
    np.testing.assert_array_equal(pos[r, :L], np.arange(1, L + 1))


def test_seq_augmentors_semantics():
    import jax
    import jax.numpy as jnp

    from selfrec_tpu.ops import seq_sampling

    rng = np.random.default_rng(0)
    seq = np.zeros((8, 16), dtype=np.int32)
    seq_len = np.zeros(8, dtype=np.int32)
    for r in range(8):
        L = int(rng.integers(5, 16))
        seq[r, :L] = rng.integers(1, 50, L)
        seq_len[r] = L
    seq_j, len_j = jnp.asarray(seq), jnp.asarray(seq_len)
    key = jax.random.PRNGKey(0)

    aug, pos, lens = seq_sampling.item_crop(key, seq_j, len_j, 0.5)
    aug, pos, lens = map(np.asarray, (aug, pos, lens))
    for r in range(8):
        expect = int(seq_len[r] * 0.5) + 1
        assert lens[r] == expect
        assert (aug[r, expect:] == 0).all()
        # cropped content is a contiguous subsequence of the original
        sub = aug[r, :expect].tolist()
        full = seq[r, : seq_len[r]].tolist()
        assert any(full[s : s + expect] == sub for s in range(len(full)))

    re = np.asarray(seq_sampling.item_reorder(key, seq_j, len_j, 0.5))
    for r in range(8):
        # multiset preserved, pads untouched
        assert sorted(re[r].tolist()) == sorted(seq[r].tolist())
        assert (re[r, seq_len[r] :] == 0).all()

    ma = np.asarray(seq_sampling.item_mask(key, seq_j, len_j, 0.4, 999))
    for r in range(8):
        n_masked = int(np.sum(ma[r] == 999))
        assert n_masked == int(seq_len[r] * 0.4)

    neg = np.asarray(
        seq_sampling.sample_seq_negatives(key, seq_j, item_num=50)
    )
    for r in range(8):
        window = set(seq[r, : seq_len[r]].tolist())
        negs = neg[r, : seq_len[r]].tolist()
        assert all(1 <= v <= 50 for v in negs)
        assert not window & set(negs)
        assert (neg[r, seq_len[r] :] == 0).all()


def test_sasrec_end_to_end(tiny_seq_dataset):
    model, perf = run_model(
        "SASRec", tiny_seq_dataset,
        extra={"n_blocks": 1, "drop_rate": 0.1, "n_heads": 1},
    )
    # 20-item catalog, cyclic pattern: should crush random (10/20 = 0.5)
    assert perf["Recall"] > 0.5


def test_cl4srec_end_to_end(tiny_seq_dataset):
    for aug_type in (0, 1, 2):
        model, perf = run_model(
            "CL4SRec", tiny_seq_dataset,
            extra={
                "n_blocks": 1, "drop_rate": 0.1, "n_heads": 1,
                "aug_type": aug_type, "aug_rate": 0.5, "cl_rate": 0.05,
            },
            max_epoch=6 if aug_type else 12,
        )
        if aug_type == 0:
            assert perf["Recall"] > 0.5


def test_bert4rec_end_to_end(tiny_seq_dataset):
    model, perf = run_model(
        "BERT4Rec", tiny_seq_dataset,
        extra={"n_blocks": 1, "drop_rate": 0.1, "n_heads": 1, "mask_rate": 0.3},
        max_epoch=20,
    )
    assert perf["Recall"] > 0.3


def test_bert4rec_gathered_ce_equals_full_grid(tiny_seq_dataset):
    """The fixed-K gathered masked-CE (batch_loss) must equal the full
    (B, L, vocab) log-softmax formulation it replaced — same masked
    positions, same per-position CE, same double division."""
    import jax
    import jax.numpy as jnp

    from selfrec_tpu.ops import seq_sampling
    from selfrec_tpu.ops.losses import l2_reg_loss

    train, test = tiny_seq_dataset
    conf = make_conf(
        "BERT4Rec",
        extra={"n_blocks": 1, "drop_rate": 0.1, "n_heads": 1,
               "mask_rate": 0.5})
    m = get_model_class("BERT4Rec")(conf, train, test)
    m.build()
    seqs, pos, y, lens = m.data.padded_training_arrays(m.max_len)
    B = 16
    batch = {
        "seq": jnp.asarray(seqs[:B]), "pos": jnp.asarray(pos[:B]),
        "y": jnp.asarray(y[:B]), "seq_len": jnp.asarray(lens[:B]),
        "row_mask": jnp.ones((B,), jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    def full_grid_loss(params, batch, key):
        k_mask, k_enc = jax.random.split(key)
        seq_len = jnp.maximum(batch["seq_len"], 1)
        aug_seq, chosen = seq_sampling.bert_mask(
            k_mask, batch["seq"], seq_len, m.mask_rate, m.data.item_num + 1)
        L = batch["seq"].shape[1]
        chosen = (chosen
                  & (jnp.arange(L)[None, :] < batch["seq_len"][:, None])
                  & (batch["row_mask"][:, None] > 0))
        aug_seq = jnp.where(chosen, aug_seq, batch["seq"])
        seq_emb = m._encode(params, aug_seq, batch["pos"], key=k_enc)
        logits = seq_emb @ params["item_emb"].T
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1),
            batch["seq"][..., None], axis=-1)[..., 0]
        n = jnp.maximum(jnp.sum(chosen), 1.0)
        return (jnp.sum(jnp.where(chosen, ce, 0.0)) / n / n
                + l2_reg_loss(m.reg, params["item_emb"]))

    got = float(m.batch_loss(m.params, batch, key))
    want = float(full_grid_loss(m.params, batch, key))
    assert abs(got - want) <= 1e-5 * max(1.0, abs(want)), (got, want)
