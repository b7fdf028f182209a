#!/usr/bin/env python
"""FULL-douban-scale social engine measurement (one-off artifact).

The per-round bench runs the social engine at QUARTER douban
(bench.py mhcn/sept — labels say so) because the reference-shaped host
preprocessing is minutes at full scale. Round 3 moved the motif/view
ALGEBRA onto the MXU (data/motifs.py device routes), which makes full
douban (13,024 users / 22,347 items / 792,062 interactions / 169,150
trust relations — the reference douban-book marginals) practical: this
script builds MHCN and SEPT at that scale, reports the build-time split
(host data dicts vs device motifs) and steady-state epoch throughput,
and writes DOUBAN_FULLSCALE.json. Run on the TPU box:

    python scripts/bench_douban_full.py

Not part of the per-round driver bench (build is minutes of linear host
dict work); re-run when the data layer changes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    from bench import _graph_conf
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.utils.synth import (
        DOUBAN_INTERACTIONS, DOUBAN_ITEMS, DOUBAN_USERS,
        synth_graph_triples, synth_social_triples,
    )

    out = {"scale": {"users": DOUBAN_USERS, "items": DOUBAN_ITEMS,
                     "interactions": DOUBAN_INTERACTIONS,
                     "relations": 169150},
           "hardware": str(jax.devices())}

    t0 = time.time()
    train, test = synth_graph_triples(
        DOUBAN_USERS, DOUBAN_ITEMS, DOUBAN_INTERACTIONS, seed=1237)
    social = synth_social_triples(n_users=DOUBAN_USERS, n_relations=169150)
    out["synth_s"] = round(time.time() - t0, 1)
    print("synth", out["synth_s"], "s", flush=True)

    for name, extra, top in (
        ("MHCN", {"n_layer": 2, "ss_rate": 0.01}, {}),
        ("SEPT", {"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3,
                  "ins_cnt": 10}, {"max.epoch": 9}),
    ):
        conf = _graph_conf(name, extra,
                           **{"social.data": "<synthetic>", **top})
        t0 = time.time()
        model = get_model_class(name)(conf, train, test,
                                      **{"social.data": social})
        model.build()
        build_s = time.time() - t0
        print(name, "built", round(build_s, 1), "s", flush=True)

        if name == "SEPT":
            # joint phase (fresh compile at the boundary)
            model.run_epoch(0)
            first = 7
        else:
            first = 0
        t0 = time.time()
        model.run_epoch(first)
        jax.block_until_ready(model.params)
        compile_s = time.time() - t0
        dts = []
        for e in range(first + 1, first + 4):
            t0 = time.time()
            model.run_epoch(e)
            np.asarray(jax.tree_util.tree_leaves(model.params)[0])[:1]
            dts.append(time.time() - t0)
        n_ex = model.data.n_edges
        eps = n_ex / min(dts)
        out[name.lower()] = {
            "build_s": round(build_s, 1),
            "compile_plus_first_epoch_s": round(compile_s, 1),
            "epoch_s": [round(d, 3) for d in dts],
            "examples_per_s": round(eps, 1),
        }
        print(name, out[name.lower()], flush=True)
        del model

    out["measured"] = time.strftime("%Y-%m-%d")
    path = os.path.join(REPO, "DOUBAN_FULLSCALE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
