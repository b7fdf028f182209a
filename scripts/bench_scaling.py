#!/usr/bin/env python
"""Weak-scaling harness: SimGCL examples/s at increasing mesh sizes.

On a real pod slice run as-is (devices = all chips). Without one, set
``--virtual N`` to emulate N devices on CPU (functional validation only —
CPU timings say nothing about TPU scaling; the harness exists so the same
command runs unchanged on hardware, per the BASELINE.json >=85% weak-scaling
target).

Usage:
    python scripts/bench_scaling.py [--virtual 8] [--batches 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0, help="force N CPU devices")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--users", type=int, default=8000)
    ap.add_argument("--items", type=int, default=12000)
    ap.add_argument("--interactions", type=int, default=200000)
    ap.add_argument("--max-devices", type=int, default=0,
                    help="cap mesh size (virtual-CPU runs deadlock when "
                    "devices exceed physical cores: blocking collective "
                    "participants can starve the host thread pool)")
    ap.add_argument("--dp-only", action="store_true",
                    help="pure data-parallel meshes (model axis = 1)")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from selfrec_tpu.config import ModelConf
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.ops import sampling
    from selfrec_tpu.utils.synth import synth_graph_mapped

    n_dev = len(jax.devices())
    print(f"devices: {n_dev}", file=sys.stderr)
    train, test = synth_graph_mapped(
        n_users=args.users, n_items=args.items, n_interactions=args.interactions
    )

    results = []
    cap = args.max_devices or n_dev
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= min(n_dev, cap)]
    for n in sizes:
        conf = {
            "training.set": "<synth>",
            "test.set": "<synth>",
            "model": {"name": "SimGCL", "type": "graph"},
            "item.ranking.topN": [10, 20],
            "embedding.size": 64,
            "max.epoch": 1,
            # weak scaling: global batch grows with the mesh
            "batch.size": 1024 * n,
            "learning.rate": 0.001,
            "reg.lambda": 0.0001,
            "SimGCL": {"n_layer": 3, "lambda": 0.5, "eps": 0.1},
            "output": "/tmp/selfrec_tpu_results/",
            "seed": 0,
        }
        if n > 1:
            n_model = 1 if args.dp_only else (2 if n % 2 == 0 else 1)
            conf["mesh"] = {"data": n // n_model, "model": n_model}
        model = get_model_class("SimGCL")(ModelConf(conf), train, test)
        model.build()
        users, items, masks = sampling.epoch_pairwise_batches(
            model.rng, model.data.edge_users, model.data.edge_items, model.batch_size
        )
        m = min(args.batches, len(users))
        cut = lambda a: jnp.asarray(a[:m])
        epoch_fn = model._make_epoch_fn()
        aux = model.epoch_setup(0)
        consts = model._scan_consts()
        state = (model.params, model.opt_state, model.key)
        out = epoch_fn(*state, aux, cut(users), cut(items), cut(masks), consts)
        jax.block_until_ready(out[-1])  # compile + warmup
        t0 = time.time()
        out = epoch_fn(out[0], out[1], out[2], out[3], cut(users), cut(items),
                       cut(masks), consts)
        jax.block_until_ready(out[-1])
        dt = time.time() - t0
        eps_total = m * model.batch_size / dt
        results.append({"devices": n, "examples_per_s": eps_total,
                        "examples_per_s_per_device": eps_total / n})
        print(f"mesh {n}: {eps_total:,.0f} ex/s ({eps_total/n:,.0f}/device)",
              file=sys.stderr)

    base = results[0]["examples_per_s_per_device"]
    for r in results:
        r["weak_scaling_efficiency"] = round(
            r["examples_per_s_per_device"] / base, 3
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
