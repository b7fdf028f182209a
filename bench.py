#!/usr/bin/env python
"""Benchmark matrix: training throughput for all three engines + full-rank
evaluation wall time, single chip.

Workloads (VERDICT round-1 item 5 — one workload per engine):

- ``simgcl``  — the north-star (BASELINE.json): SimGCL, README-leaderboard
  hyperparams (layer=3, lambda=0.5, eps=0.1, batch=2048, emb=64,
  /root/reference/README.md:130-143) on a deterministic yelp2018-scale
  synthetic graph (selfrec_tpu/utils/synth.py — the real yelp2018 files are
  stripped from the reference mount). Device-only epoch timing, matching the
  round-1 methodology.
- ``sasrec``  — sequential engine: SASRec, reference conf/SASRec.yaml
  hyperparams, on the reference's own amazon-beauty sequential dataset.
  Whole run_epoch timing (host batch prep + device scan), the honest
  steady-state number. examples = training sequences.
- ``mhcn``    — social engine: MHCN, douban-book-scale synthetic
  interactions + trust graph (douban train/trust stripped from the mount).
- ``eval``    — batched full-rank evaluation at yelp2018 scale (the
  BASELINE.json third metric): 31,668 users x 38,048 items scoring + top-k +
  rec-list assembly + reference-exact metrics, steady-state wall seconds.

Reference comparators come from REF_BASELINES.json (measured on this box by
scripts/bench_reference.py — the reference's own torch code on host CPU, the
only backend its torch has here); ``vs_baseline`` is null where the
reference cannot run the workload at all (MHCN/SEPT are TF1; no TF1 in the
image. The reference's eval is a per-user numba loop; numba isn't installed).

Writes every workload to BENCH_MATRIX.json and prints the headline SimGCL
line (ONE JSON line, driver contract) to stdout last.
Usage: python bench.py [workload ...]   (default: all)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# Fallback if REF_BASELINES.json is absent: round-1 measured SimGCL
# reference throughput (scripts/bench_reference.py, 2026-08-16).
REF_FALLBACK = {"simgcl": 475.3}

N_BENCH_BATCHES = 50
N_TIMED_REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ref_baselines():
    path = os.path.join(REPO, "REF_BASELINES.json")
    if os.path.exists(path):
        with open(path) as f:
            return {k: v["examples_per_sec"] for k, v in json.load(f).items()}
    return dict(REF_FALLBACK)


def _graph_conf(name, extra, **top):
    from selfrec_tpu.config import ModelConf

    conf = {
        "training.set": "<synthetic>",
        "test.set": "<synthetic>",
        "model": {"name": name, "type": top.pop("type", "graph")},
        "item.ranking.topN": [10, 20],
        "embedding.size": 64,
        "max.epoch": 1,
        "batch.size": 2048,
        "learning.rate": 0.001,
        "reg.lambda": 0.0001,
        name: extra,
        "output": "/tmp/selfrec_tpu_results/",
        "seed": 0,
    }
    conf.update(top)
    return ModelConf(conf)


def bench_simgcl():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.ops import sampling
    from selfrec_tpu.utils.synth import synth_graph_mapped

    t0 = time.time()
    train, test = synth_graph_mapped()
    log(f"[simgcl] synth data ({time.time()-t0:.1f}s)")
    conf = _graph_conf("SimGCL", {"n_layer": 3, "lambda": 0.5, "eps": 0.1})
    t0 = time.time()
    model = get_model_class("SimGCL")(conf, train, test)
    model.build()
    log(f"[simgcl] model built ({time.time()-t0:.1f}s)")

    users, items, masks = sampling.epoch_pairwise_batches(
        model.rng, model.data.edge_users, model.data.edge_items, model.batch_size
    )
    m = min(N_BENCH_BATCHES, len(users))
    users, items, masks = (jnp.asarray(users[:m]), jnp.asarray(items[:m]),
                           jnp.asarray(masks[:m]))
    epoch_fn = model._make_epoch_fn()
    aux = model.epoch_setup(0)
    consts = model._scan_consts()
    params, opt_state, key = model.params, model.opt_state, model.key

    t0 = time.time()
    out = epoch_fn(params, opt_state, key, aux, users, items, masks, consts)
    jax.block_until_ready(out[-1])
    log(f"[simgcl] compile+first: {time.time()-t0:.1f}s,"
        f" loss[0]={float(out[-1][0]):.4f}")

    best_dt = float("inf")
    for _ in range(N_TIMED_REPS):
        t0 = time.time()
        out = epoch_fn(*out[:4], users, items, masks, consts)
        jax.block_until_ready(out[-1])
        best_dt = min(best_dt, time.time() - t0)
    assert np.all(np.isfinite(np.asarray(out[-1])))
    eps_val = m * model.batch_size / best_dt
    log(f"[simgcl] {m} batches x {model.batch_size} in {best_dt:.3f}s")
    return {
        "metric": "simgcl_yelp2018scale_train_throughput",
        "value": round(eps_val, 1),
        "unit": "examples/s",
        "ref_key": "simgcl",
    }


def _timed_run_epochs(model, n_epochs=3):
    """Compile on epoch 0, then best whole-epoch (host prep + device) time."""
    import jax

    t0 = time.time()
    model.run_epoch(0)
    jax.block_until_ready(model.params)
    log(f"  compile+epoch0: {time.time()-t0:.1f}s")
    best = float("inf")
    for e in range(1, 1 + n_epochs):
        t0 = time.time()
        model.run_epoch(e)
        jax.block_until_ready(model.params)
        best = min(best, time.time() - t0)
    return best


def bench_sasrec():
    from selfrec_tpu.data.io import load_data_set
    from selfrec_tpu.models import get_model_class

    train = load_data_set(
        "/root/reference/dataset/amazon-beauty/train.txt", "sequential")
    test = load_data_set(
        "/root/reference/dataset/amazon-beauty/test.txt", "sequential")
    conf = _graph_conf(
        "SASRec", {"n_blocks": 2, "drop_rate": 0.2, "n_heads": 1},
        type="sequential", **{"batch.size": 256, "max.len": 50})
    model = get_model_class("SASRec")(conf, train, test)
    model.build()
    best_dt = _timed_run_epochs(model)
    n_seqs = len(model.data.original_seq)
    log(f"[sasrec] epoch {best_dt:.2f}s, {n_seqs} sequences")
    return {
        "metric": "sasrec_amazonbeauty_train_throughput",
        "value": round(n_seqs / best_dt, 1),
        "unit": "sequences/s",
        "ref_key": "sasrec",
    }


def bench_mhcn():
    # quarter-douban scale: full douban motif precompute takes ~25 host-min
    # (dense H_p/H_j products) — too slow for a per-round bench, and the
    # reference comparator is null regardless (TF1 absent). Throughput is
    # per-edge so the number remains comparable round-over-round.
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.utils.synth import (
        DOUBAN_INTERACTIONS, DOUBAN_ITEMS, DOUBAN_USERS,
        synth_graph_triples, synth_social_triples,
    )

    t0 = time.time()
    train, test = synth_graph_triples(
        DOUBAN_USERS // 4, DOUBAN_ITEMS // 4, DOUBAN_INTERACTIONS // 4,
        seed=1237)
    social = synth_social_triples(
        n_users=DOUBAN_USERS // 4, n_relations=169150 // 4)
    log(f"[mhcn] synth data ({time.time()-t0:.1f}s)")
    conf = _graph_conf(
        "MHCN", {"n_layer": 2, "ss_rate": 0.01}, **{"social.data": "<synthetic>"})
    t0 = time.time()
    model = get_model_class("MHCN")(conf, train, test, **{"social.data": social})
    model.build()
    log(f"[mhcn] built incl. motif precompute ({time.time()-t0:.1f}s)")
    best_dt = _timed_run_epochs(model)
    n_edges = model.data.n_edges
    log(f"[mhcn] epoch {best_dt:.2f}s, {n_edges} edges")
    return {
        "metric": "mhcn_doubanscale_train_throughput",
        "value": round(n_edges / best_dt, 1),
        "unit": "examples/s",
        "ref_key": "mhcn",
    }


def bench_sept():
    # quarter-douban interactions + trust (no motif precompute — SEPT needs
    # only its two social views). Forces the joint tri-training phase so the
    # measured epoch runs the packed 2-chain formulation (models/graph/
    # sept.py batch_loss); no reference comparator (TF1-only).
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.utils.synth import (
        DOUBAN_INTERACTIONS, DOUBAN_ITEMS, DOUBAN_USERS,
        synth_graph_triples, synth_social_triples,
    )

    t0 = time.time()
    train, test = synth_graph_triples(
        DOUBAN_USERS // 4, DOUBAN_ITEMS // 4, DOUBAN_INTERACTIONS // 4,
        seed=1237)
    social = synth_social_triples(
        n_users=DOUBAN_USERS // 4, n_relations=169150 // 4)
    log(f"[sept] synth data ({time.time()-t0:.1f}s)")
    conf = _graph_conf(
        "SEPT",
        {"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3, "ins_cnt": 10},
        **{"social.data": "<synthetic>", "max.epoch": 9})
    t0 = time.time()
    model = get_model_class("SEPT")(conf, train, test, **{"social.data": social})
    model.build()
    log(f"[sept] built incl. view construction ({time.time()-t0:.1f}s)")
    # epochs 0-2 are the warm phase; time steady-state JOINT epochs
    model.run_epoch(0)
    model.run_epoch(7)  # enters joint phase: fresh compile
    import jax

    jax.block_until_ready(model.params)
    best = float("inf")
    for e in (8, 9, 10):
        t0 = time.time()
        model.run_epoch(e)
        jax.block_until_ready(model.params)
        best = min(best, time.time() - t0)
    assert model._joint_phase
    n_edges = model.data.n_edges
    log(f"[sept] joint epoch {best:.2f}s, {n_edges} edges")
    return {
        "metric": "sept_doubanscale_joint_train_throughput",
        "value": round(n_edges / best, 1),
        "unit": "examples/s",
        "ref_key": "sept",
    }


def bench_eval():
    import jax
    import numpy as np

    from selfrec_tpu.config import ModelConf
    from selfrec_tpu.data.interaction import Interaction
    from selfrec_tpu.ops import ranking
    from selfrec_tpu.utils import metrics
    from selfrec_tpu.utils.synth import synth_graph_mapped

    train, test = synth_graph_mapped()
    conf = _graph_conf("MF", {})
    data = Interaction(conf, train, test)
    rng = np.random.default_rng(0)
    user_emb = rng.normal(size=(data.user_num, 64)).astype(np.float32)
    item_emb = rng.normal(size=(data.item_num, 64)).astype(np.float32)

    def once():
        t0 = time.time()
        rl = ranking.rec_list_from_embeddings(data, user_emb, item_emb, 20)
        t_rank = time.time() - t0
        t0 = time.time()
        metrics.ranking_evaluation(data.test_set, rl, [20])
        return t_rank, time.time() - t0

    once()  # compile
    t_rank, t_metrics = min((once() for _ in range(3)), key=sum)
    n_users = len(data.test_set)
    log(f"[eval] {n_users} users full-rank in {t_rank:.2f}s rank"
        f" + {t_metrics:.2f}s metrics ({n_users/t_rank:,.0f} users/s)")
    return {
        "metric": "fullrank_eval_yelp2018scale_walltime",
        "value": round(t_rank + t_metrics, 3),
        "unit": "s",
        "ref_key": None,
        "detail": {"rank_s": round(t_rank, 3), "metrics_s": round(t_metrics, 3),
                   "users_per_s": round(n_users / t_rank, 1)},
    }


WORKLOADS = {
    "simgcl": bench_simgcl,
    "sasrec": bench_sasrec,
    "mhcn": bench_mhcn,
    "sept": bench_sept,
    "eval": bench_eval,
}


def main():
    import jax

    names = sys.argv[1:] or list(WORKLOADS)
    log("devices:", jax.devices())
    refs = ref_baselines()
    matrix_path = os.path.join(REPO, "BENCH_MATRIX.json")
    results = {}
    for name in names:
        log(f"=== {name} ===")
        try:
            r = WORKLOADS[name]()
        except Exception as e:  # one workload must not sink the matrix
            log(f"[{name}] FAILED: {e!r}")
            results[name] = {"error": repr(e)[:300]}
            continue
        ref = refs.get(r.pop("ref_key", None))
        if r["unit"] == "s":
            r["vs_baseline"] = round(ref / r["value"], 2) if ref else None
        else:
            r["vs_baseline"] = round(r["value"] / ref, 2) if ref else None
        results[name] = r
        log(json.dumps(r))
        # write incrementally: a later crash keeps earlier measurements
        existing = {}
        if os.path.exists(matrix_path):
            with open(matrix_path) as f:
                existing = json.load(f)
        existing.update(results)
        with open(matrix_path, "w") as f:
            json.dump(existing, f, indent=2)
    log(f"wrote {matrix_path}")

    ok = {k: v for k, v in results.items() if "metric" in v}
    headline = ok.get("simgcl") or next(iter(ok.values()), {"metric": "none", "value": 0, "unit": "", "vs_baseline": None})
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
