"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4). Must set env before jax import.
"""

import os

# Force CPU regardless of the ambient platform. A sitecustomize.py in this
# image pins the 'axon' TPU platform via jax.config at interpreter startup,
# so env vars alone are ignored — override through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_graph_dataset():
    """Deterministic tiny interaction dataset with learnable block structure:
    40 users in 4 groups, 60 items in 4 groups; a user interacts mostly with
    their group's items, so a trained model must clearly beat random."""
    rng = np.random.default_rng(7)
    train, test = [], []
    for u in range(40):
        g = u % 4
        group_items = np.arange(g * 15, (g + 1) * 15)
        n_in = int(rng.integers(6, 10))
        in_items = rng.choice(group_items, size=n_in, replace=False)
        out_items = rng.choice(
            np.setdiff1d(np.arange(60), group_items), size=2, replace=False
        )
        items = np.concatenate([in_items[:-1], out_items])
        for i in items:
            train.append((f"u{u}", f"i{i}", 1.0))
        test.append((f"u{u}", f"i{in_items[-1]}", 1.0))
    return train, test


@pytest.fixture(scope="session")
def tiny_conf_dict():
    return {
        "training.set": "<memory>",
        "test.set": "<memory>",
        "model": {"name": "MF", "type": "graph"},
        "item.ranking.topN": [10, 20],
        "embedding.size": 16,
        "max.epoch": 3,
        "batch.size": 64,
        "learning.rate": 0.05,
        "reg.lambda": 0.0001,
        "output": "/tmp/selfrec_tpu_test_results/",
        "seed": 42,
    }
