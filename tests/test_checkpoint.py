"""Checkpoint/resume round-trip (beyond-reference capability, SURVEY.md §5)."""

import numpy as np

from selfrec_tpu.config import ModelConf
from selfrec_tpu.models import get_model_class


def _conf(tmp_path, max_epoch):
    return ModelConf(
        {
            "training.set": "<memory>",
            "test.set": "<memory>",
            "model": {"name": "MF", "type": "graph"},
            "item.ranking.topN": [5, 10],
            "embedding.size": 16,
            "max.epoch": max_epoch,
            "batch.size": 64,
            "learning.rate": 0.05,
            "reg.lambda": 0.0001,
            "output": "/tmp/selfrec_tpu_test_results/",
            "seed": 42,
            "checkpoint.dir": str(tmp_path / "ckpt"),
            "checkpoint.interval": 2,
        }
    )


def test_checkpoint_resume_matches_continuous_run(tiny_graph_dataset, tmp_path):
    train, test = tiny_graph_dataset
    cls = get_model_class("MF")

    # continuous 4-epoch run (no checkpointing interference: fresh dir)
    m_full = cls(_conf(tmp_path / "full", 4), train, test)
    m_full.build()
    m_full.train()

    # run 1: stops after 2 epochs (checkpointing every 2)
    m1 = cls(_conf(tmp_path, 2), train, test)
    m1.build()
    m1.train()
    from selfrec_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_step(str(tmp_path / "ckpt")) == 2

    # run 2: resumes from step 2 and finishes to epoch 4
    m2 = cls(_conf(tmp_path, 4), train, test)
    m2.build()
    m2.train()

    # resumed params equal the continuous run's (identical PRNG streams:
    # run 1 consumed epochs 0-1 with the same seed, run 2 restores key+opt)
    np.testing.assert_allclose(
        np.asarray(m2.params["user_emb"]),
        np.asarray(m_full.params["user_emb"]),
        rtol=2e-3,
        atol=2e-4,
    )


def test_checkpoint_preserves_best_tracking(tiny_graph_dataset, tmp_path):
    """Regression: best_performance / best snapshots survive resume."""
    train, test = tiny_graph_dataset
    cls = get_model_class("MF")
    m1 = cls(_conf(tmp_path, 2), train, test)
    m1.build()
    m1.train()
    assert m1.best_performance

    m2 = cls(_conf(tmp_path, 4), train, test)
    m2.build()
    start = m2._maybe_resume()
    assert start == 2
    assert m2.best_performance and m2.best_performance[0] == m1.best_performance[0]
    assert m2.best_performance[1] == m1.best_performance[1]
    np.testing.assert_allclose(
        np.asarray(m2.best_user_emb), np.asarray(m1.best_user_emb)
    )


def test_checkpoint_resume_under_mesh(tiny_graph_dataset, tmp_path):
    """Sharded checkpoint round-trip: a (2,2)-mesh SimGCL run checkpointed
    at epoch 2 and resumed to 4 matches the continuous 4-epoch mesh run
    (orbax restores row-sharded tables + opt state with their shardings)."""
    train, test = tiny_graph_dataset
    cls = get_model_class("SimGCL")

    def conf(dir_, max_epoch):
        c = _conf(dir_, max_epoch)
        c.config["model"]["name"] = "SimGCL"
        c.config["SimGCL"] = {"n_layer": 2, "lambda": 0.5, "eps": 0.1}
        c.config["mesh"] = {"data": 2, "model": 2}
        return c

    m_full = cls(conf(tmp_path / "full", 4), train, test)
    m_full.build()
    m_full.train()

    m1 = cls(conf(tmp_path, 2), train, test)
    m1.build()
    m1.train()
    m2 = cls(conf(tmp_path, 4), train, test)
    m2.build()
    m2.train()
    np.testing.assert_allclose(
        np.asarray(m2.params["user_emb"]),
        np.asarray(m_full.params["user_emb"]),
        rtol=2e-3, atol=2e-4,
    )
