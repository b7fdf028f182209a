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
- ``sgl``     — per-epoch dropped-view family: BOTH backends measured
  (packed-ELL gather chain vs int8-factored dense views).
- ``ncl``     — proto-phase NCL: per-epoch on-device k-means e-step +
  structural/prototype InfoNCE (the reference pays faiss-GPU here).
- ``mixgcf``  — n_negs=64 hard-negative mixing.
- ``mhcn``/``sept`` — social engine on QUARTER-douban synthetic
  interactions + trust (metric names say quarterdouban — what actually
  runs, kept for round-over-round comparability).
- ``mhcn_fulldouban`` — the social engine at the reference's real
  douban-book marginals (round 5; the host data build is ~1 s via the
  array-fast layer — the round-4 "~70 s host build" was actually XLA
  compile wall, which the compile cache absorbs).
- ``eval``    — the PRODUCTION per-epoch eval path at yelp2018 scale:
  device top-k ids + vectorized id metrics (string path in detail).

Further workloads: ``xsimgcl`` (the reference leaderboard's top model,
single perturbed chain), ``buir`` (per-step dense dropout_view),
``bert4rec``/``cl4srec`` (masked-LM / contrastive sequential), and the
round-4 completions — ``mf``, ``lightgcn``, ``directau``, ``ssl4rec``,
``selfcf`` (train throughput), ``knn`` (UserKNN+ItemKNN similarity-build
walltime, one int8 MXU dispatch each), ``seq_eval`` (sequential
full-catalog eval walltime, one scanned dispatch).
Reference comparators come from REF_BASELINES.json (measured on this box
by scripts/bench_reference.py — the reference's own torch code on host
CPU for every torch model, its own Python loops for the KNN build and
sequential eval, op-for-op torch transliterations of the TF1 graphs for
mhcn/sept); ``vs_baseline`` is null only for eval (the reference's graph
eval is a per-user numba loop and numba isn't installed — a pure-Python
stand-in would overstate our multiple).

Writes every workload to BENCH_LAST.json (scratch — truncated at run
start so one file never mixes runs) and prints the headline SimGCL line
(ONE JSON line, driver contract) to stdout the moment the simgcl workload
finishes AND again last, so both stdout-first and tail-parsing drivers
resolve it even if a later workload dies. Driver runs carry a wall-clock
budget (SELFREC_TPU_BENCH_BUDGET_S, default 1000s un-flagged / unlimited
for matrix captures — the round-4 driver capture died at ~20 min, so the
driver window is treated as ~1200s with headroom for the in-flight
workload): workloads that would start past the budget are
skipped cleanly instead of being timeout-killed mid-flight. The committed
matrix of record, BENCH_MATRIX.json, is only rewritten when
``SELFREC_TPU_UPDATE_MATRIX=1`` — doc headlines are bound to the matrix
(scripts/check_doc_numbers.py), so updating it is a deliberate capture
step (run the full matrix, then ``check_doc_numbers.py --fix``), not a
side effect of every ad-hoc or driver bench run whose ±2% run-to-run
variance would otherwise fail tests/test_doc_numbers.py.
Usage: python bench.py [workload ...]   (default: all)
"""

import contextlib
import functools
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
# wall-time workloads whose metric is compile-dominated: always measured
# with the persistent compile cache (warm production posture)
CACHE_ALWAYS = {"knn", "mhcn_fulldouban"}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _log_device_mem():
    """Python-side live-array accounting between workloads: if bytes climb
    monotonically, arrays are being retained (leak); if they stay flat but
    allocations still fail, the device allocator is fragmented/stuck."""
    try:
        import jax

        arrs = jax.live_arrays()
        log(f"[mem] {len(arrs)} live arrays, "
            f"{sum(a.nbytes for a in arrs) / 1e9:.2f} GB python-side")
    except Exception:
        pass


@functools.lru_cache(maxsize=1)
def _synth_yelp():
    """One yelp2018-scale synthetic dataset shared by every workload.

    Safe to share: Interaction's array fast path never mutates the input
    edge arrays in place (all downstream uses are fancy-index copies).
    Regenerating it per workload cost ~3-5s x 12 workloads of the driver
    window (BENCH_r04.json rc=124)."""
    from selfrec_tpu.utils.synth import synth_graph_mapped

    return synth_graph_mapped()


@functools.lru_cache(maxsize=1)
def _synth_quarterdouban():
    """Quarter-douban interactions + trust shared by mhcn and sept."""
    from selfrec_tpu.utils.synth import (
        DOUBAN_INTERACTIONS, DOUBAN_ITEMS, DOUBAN_USERS,
        synth_graph_triples, synth_social_triples,
    )

    train, test = synth_graph_triples(
        DOUBAN_USERS // 4, DOUBAN_ITEMS // 4, DOUBAN_INTERACTIONS // 4,
        seed=1237)
    social = synth_social_triples(
        n_users=DOUBAN_USERS // 4, n_relations=169150 // 4)
    return train, test, social


def ref_baselines():
    path = os.path.join(REPO, "REF_BASELINES.json")
    if os.path.exists(path):
        with open(path) as f:
            # throughput comparators store examples_per_sec; wall-time
            # comparators (userknn build, seq_eval) store seconds
            return {k: v.get("examples_per_sec", v.get("seconds"))
                    for k, v in json.load(f).items()}
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


def _simgcl_mode(train, test, tag):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.ops import sampling

    conf = _graph_conf("SimGCL", {"n_layer": 3, "lambda": 0.5, "eps": 0.1})
    t0 = time.time()
    model = get_model_class("SimGCL")(conf, train, test)
    model.build()
    log(f"[simgcl:{tag}] model built ({time.time()-t0:.1f}s)")

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
    log(f"[simgcl:{tag}] compile+first: {time.time()-t0:.1f}s,"
        f" loss[0]={float(out[-1][0]):.4f}")

    dts = []
    for _ in range(N_TIMED_REPS):
        t0 = time.time()
        out = epoch_fn(*out[:4], users, items, masks, consts)
        np.asarray(out[-1])  # fetch, not block_until_ready (tunnel-honest)
        dts.append(time.time() - t0)
    best_dt = min(dts)
    assert np.all(np.isfinite(np.asarray(out[-1])))
    eps_val = m * model.batch_size / best_dt
    log(f"[simgcl:{tag}] {m} batches x {model.batch_size} in {best_dt:.3f}s")
    return round(eps_val, 1), _spread(dts)


def bench_simgcl():
    """Headline: the int8x8 quantized-operand MXU mode (both propagation
    matmuls native s8 x s8, 394 TOPS on v5e vs 197 TFLOPS bf16) — a REAL
    numerics change, so it ships with 7-model convergence gates vs both
    the bf16 mode and the reference's own torch runs (results/h2h/
    our_*_30_int8x8.log, PARITY.md "Quantized-mode convergence"). The
    framework default stays bf16 (reference-parity mode); its number is
    recorded alongside in detail.modes."""
    t0 = time.time()
    train, test = _synth_yelp()
    log(f"[simgcl] synth data ({time.time()-t0:.1f}s)")

    saved = os.environ.get("SELFREC_TPU_DENSE_DTYPE")
    modes = {}
    try:
        os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
        bf16_val, bf16_spread = _simgcl_mode(train, test, "bf16-default")
        modes["bf16_default"] = {"value": bf16_val, **bf16_spread}
        os.environ["SELFREC_TPU_DENSE_DTYPE"] = "int8"
        int8_val, int8_spread = _simgcl_mode(train, test, "int8x8")
        modes["int8x8"] = {"value": int8_val, **int8_spread}
    finally:
        if saved is None:
            os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
        else:
            os.environ["SELFREC_TPU_DENSE_DTYPE"] = saved
    return {
        "metric": "simgcl_yelp2018scale_train_throughput_int8x8",
        "value": modes["int8x8"]["value"],
        "unit": "examples/s",
        "ref_key": "simgcl",
        "detail": {
            "mode": "int8x8 quantized propagation "
                    "(SELFREC_TPU_DENSE_DTYPE=int8; framework default is "
                    "bf16 — see modes.bf16_default)",
            "quality_gates": "7 models: results/h2h/our_{SGL,XSimGCL,"
                             "MixGCF,NCL,DirectAU}_30_int8x8.log + "
                             "our_simgcl20_int8x8.log + "
                             "our_lightgcn100_int8x8.log, PARITY.md",
            "modes": modes,
        },
    }


def _spread(dts):
    """min + median + all samples — published so every doc number is
    traceable to a driver artifact with its variance (VERDICT r2 weak 3)."""
    s = sorted(dts)
    return {"min_s": round(s[0], 3), "median_s": round(s[len(s) // 2], 3),
            "samples_s": [round(d, 3) for d in dts]}


def _timed_run_epochs(model, n_epochs=3, first_epoch=0):
    """Compile on the first epoch, then whole-epoch (host prep + device)
    times; returns (best_seconds, spread_dict)."""
    import jax
    import numpy as np

    t0 = time.time()
    model.run_epoch(first_epoch)
    jax.block_until_ready(model.params)
    # time by fetching a real slice — block_until_ready through the axon
    # tunnel can return before the work is done
    np.asarray(jax.tree_util.tree_leaves(model.params)[0])[:1]
    log(f"  compile+first: {time.time()-t0:.1f}s")
    dts = []
    for e in range(first_epoch + 1, first_epoch + 1 + n_epochs):
        t0 = time.time()
        model.run_epoch(e)
        np.asarray(jax.tree_util.tree_leaves(model.params)[0])[:1]
        dts.append(time.time() - t0)
    return min(dts), _spread(dts)


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
    best_dt, spread = _timed_run_epochs(model)
    n_seqs = len(model.data.original_seq)
    log(f"[sasrec] epoch {best_dt:.2f}s, {n_seqs} sequences")
    return {
        "metric": "sasrec_amazonbeauty_train_throughput",
        "value": round(n_seqs / best_dt, 1),
        "unit": "sequences/s",
        "ref_key": "sasrec",
        "detail": spread,
    }


def _seq_workload(name, extra, metric):
    from selfrec_tpu.data.io import load_data_set
    from selfrec_tpu.models import get_model_class

    train = load_data_set(
        "/root/reference/dataset/amazon-beauty/train.txt", "sequential")
    test = load_data_set(
        "/root/reference/dataset/amazon-beauty/test.txt", "sequential")
    conf = _graph_conf(name, extra, type="sequential",
                       **{"batch.size": 256, "max.len": 50})
    model = get_model_class(name)(conf, train, test)
    model.build()
    best_dt, spread = _timed_run_epochs(model)
    n_seqs = len(model.data.original_seq)
    log(f"[{metric}] epoch {best_dt:.2f}s, {n_seqs} sequences")
    return {
        "metric": f"{metric}_amazonbeauty_train_throughput",
        "value": round(n_seqs / best_dt, 1),
        "unit": "sequences/s",
        "ref_key": metric,
        "detail": spread,
    }


def bench_bert4rec():
    """BERT4Rec — the masked-LM sequential family: on-device item masking
    + bidirectional encoder + full-softmax CE (reference hosts the masking
    in Python per batch, BERT4Rec.py:31-45)."""
    return _seq_workload(
        "BERT4Rec",
        {"n_blocks": 2, "drop_rate": 0.2, "n_heads": 1, "mask_rate": 0.5},
        "bert4rec")


def bench_cl4srec():
    """CL4SRec — contrastive sequential family: main forward + two
    crop-augmented forwards + InfoNCE per batch (reference crops on host,
    CL4SRec.py:36-60)."""
    return _seq_workload(
        "CL4SRec",
        {"n_blocks": 2, "drop_rate": 0.2, "n_heads": 1, "aug_type": 0,
         "aug_rate": 0.5, "cl_rate": 0.05},
        "cl4srec")


def bench_mhcn():
    # quarter-douban scale (kept for round-over-round comparability; the
    # FULL-douban workload below covers the real marginals — the motif
    # algebra moved on-device in round 3, so build is compile-dominated,
    # not the "~25 host-min" scipy products it once was)
    from selfrec_tpu.models import get_model_class

    t0 = time.time()
    train, test, social = _synth_quarterdouban()
    log(f"[mhcn] synth data ({time.time()-t0:.1f}s)")
    conf = _graph_conf(
        "MHCN", {"n_layer": 2, "ss_rate": 0.01}, **{"social.data": "<synthetic>"})
    t0 = time.time()
    model = get_model_class("MHCN")(conf, train, test, **{"social.data": social})
    model.build()
    log(f"[mhcn] built incl. motif precompute ({time.time()-t0:.1f}s)")
    best_dt, spread = _timed_run_epochs(model)
    n_edges = model.data.n_edges
    log(f"[mhcn] epoch {best_dt:.2f}s, {n_edges} edges")
    return {
        "metric": "mhcn_quarterdouban_train_throughput",
        "value": round(n_edges / best_dt, 1),
        "unit": "examples/s",
        "ref_key": "mhcn",
        "detail": spread,
    }


def bench_mhcn_fulldouban():
    """MHCN at the FULL douban-book marginals (13,024 users / 22,347
    items / 792k interactions / 169k trust — the reference's own social
    dataset scale) — promoted into the per-round matrix (VERDICT r4 item
    6). Practical because the host data layer is array-fast (~1 s; the
    round-4 suspicion that trust+ratings synthesis cost ~70 s was wrong —
    profiled round 5) and the motif algebra runs on the MXU
    (data/motifs.py); the remaining build wall is XLA compiles, which the
    bench's persistent compile cache absorbs on warm runs. Comparator:
    the same op-for-op torch transliteration as mhcn, re-measured at full
    scale (scripts/bench_reference.py mhcn_fulldouban)."""
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.utils.synth import (
        DOUBAN_INTERACTIONS, DOUBAN_ITEMS, DOUBAN_USERS,
        synth_graph_triples, synth_social_triples,
    )

    t0 = time.time()
    train, test = synth_graph_triples(
        DOUBAN_USERS, DOUBAN_ITEMS, DOUBAN_INTERACTIONS, seed=1237)
    social = synth_social_triples(n_users=DOUBAN_USERS, n_relations=169150)
    log(f"[mhcn_fulldouban] synth data ({time.time()-t0:.1f}s)")
    conf = _graph_conf(
        "MHCN", {"n_layer": 2, "ss_rate": 0.01},
        **{"social.data": "<synthetic>"})
    t0 = time.time()
    model = get_model_class("MHCN")(conf, train, test,
                                    **{"social.data": social})
    model.build()
    build_s = round(time.time() - t0, 1)
    log(f"[mhcn_fulldouban] built incl. device motifs ({build_s}s)")
    best_dt, spread = _timed_run_epochs(model)
    spread["build_s"] = build_s
    n_edges = model.data.n_edges
    log(f"[mhcn_fulldouban] epoch {best_dt:.2f}s, {n_edges} edges")
    return {
        "metric": "mhcn_fulldouban_train_throughput",
        "value": round(n_edges / best_dt, 1),
        "unit": "examples/s",
        "ref_key": "mhcn_fulldouban",
        "detail": spread,
    }


def bench_sept():
    # quarter-douban interactions + trust (no motif precompute — SEPT needs
    # only its two social views). Forces the joint tri-training phase so the
    # measured epoch runs the packed 2-chain formulation (models/graph/
    # sept.py batch_loss); no reference comparator (TF1-only).
    from selfrec_tpu.models import get_model_class

    t0 = time.time()
    train, test, social = _synth_quarterdouban()
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
    import numpy as np

    dts = []
    for e in (8, 9, 10):
        t0 = time.time()
        model.run_epoch(e)
        np.asarray(jax.tree_util.tree_leaves(model.params)[0])[:1]
        dts.append(time.time() - t0)
    best = min(dts)
    assert model._joint_phase
    n_edges = model.data.n_edges
    log(f"[sept] joint epoch {best:.2f}s, {n_edges} edges")
    return {
        "metric": "sept_quarterdouban_joint_train_throughput",
        "value": round(n_edges / best, 1),
        "unit": "examples/s",
        "ref_key": "sept",
        "detail": _spread(dts),
    }


def _graph_model(name, extra, **top):
    from selfrec_tpu.models import get_model_class

    train, test = _synth_yelp()
    conf = _graph_conf(name, extra, **top)
    model = get_model_class(name)(conf, train, test)
    model.build()
    return model


def _timed_batches(model, m=N_BENCH_BATCHES):
    """bench_simgcl's capped-batch methodology: one jitted dispatch over m
    batches, best-of-reps examples/s. Used for arms whose FULL epoch is a
    single >60s device program — the axon tunnel's worker kills those
    (observed on sgl's packed-ELL arm and pre-bitmap mixgcf: 'TPU worker
    process crashed or restarted'), so the whole-epoch timing contract
    can't be met for them on this box."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from selfrec_tpu.ops import sampling

    users, items, masks = sampling.epoch_pairwise_batches(
        model.rng, model.data.edge_users, model.data.edge_items,
        model.batch_size)
    m = min(m, len(users))
    users, items, masks = (jnp.asarray(users[:m]), jnp.asarray(items[:m]),
                           jnp.asarray(masks[:m]))
    epoch_fn = model._make_epoch_fn()
    aux = model.epoch_setup(0)
    consts = model._scan_consts()
    out = epoch_fn(model.params, model.opt_state, model.key, aux,
                   users, items, masks, consts)
    jax.block_until_ready(out[-1])
    dts = []
    for _ in range(N_TIMED_REPS):
        t0 = time.time()
        out = epoch_fn(*out[:4], users, items, masks, consts)
        np.asarray(out[-1])
        dts.append(time.time() - t0)
    assert np.all(np.isfinite(np.asarray(out[-1])))
    return m * model.batch_size / min(dts), _spread(dts)


def bench_sgl():
    """SGL, reference conf/SGL.yaml defaults, yelp2018-scale synthetic —
    BOTH adjacency backends (VERDICT r2 weak 4): the packed-ELL gather
    chain vs per-epoch int8-factored dense views
    (ops/spmm_dense.DenseAdj.refactor_view). The dominant cost is the two
    dropped-graph forwards per batch (reference SGL.py:80-96)."""
    extra = {"n_layer": 2, "lambda": 0.1, "drop_rate": 0.1, "temp": 0.2,
             "aug_type": 1}
    results = {}
    saved_dt = os.environ.get("SELFREC_TPU_DENSE_DTYPE")
    # dense (the production backend) FIRST: the ELL arm is the one that has
    # wedged the TPU worker (round-3 prelim run), and a wedged chip poisons
    # everything after it — record the number that matters before risking
    # it. The dense arm runs BOTH numeric modes (refactor_view keeps views
    # int8-factored, so int8x8 + the dual kernel apply to the per-epoch
    # dropped views; gate results/h2h/our_SGL_30_int8x8.log).
    for mode, env, dtype in (("dense_int8x8", "1", "int8"),
                             ("dense", "1", None), ("ell", "0", None)):
        os.environ["SELFREC_TPU_DENSE"] = env
        if dtype is None:
            os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
        else:
            os.environ["SELFREC_TPU_DENSE_DTYPE"] = dtype
        try:
            t0 = time.time()
            model = _graph_model("SGL", extra)
            log(f"[sgl:{mode}] built ({time.time()-t0:.1f}s),"
                f" adj={type(model.adj).__name__}")
            if mode == "ell":
                # the ELL arm's full epoch is a single ~95s device program
                # and the tunnel worker kills programs that long (see
                # _timed_batches) — measure it on the capped-batch
                # methodology instead
                eps, spread = _timed_batches(model)
                results[mode] = {"eps": round(eps, 1), **spread,
                                 "methodology": "50-batch dispatch"}
            else:
                best_dt, spread = _timed_run_epochs(model)
                n_ex = model.data.n_edges
                results[mode] = {"eps": round(n_ex / best_dt, 1), **spread}
            log(f"[sgl:{mode}] {results[mode]['eps']} ex/s")
            del model
        except Exception as e:  # record the surviving arm, not nothing
            log(f"[sgl:{mode}] FAILED: {e!r}")
            results[mode] = {"error": repr(e)[:200]}
        finally:
            os.environ.pop("SELFREC_TPU_DENSE", None)
            if saved_dt is None:
                os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
            else:
                os.environ["SELFREC_TPU_DENSE_DTYPE"] = saved_dt
    if "eps" not in results["dense_int8x8"]:
        raise RuntimeError(f"sgl dense arm failed: {results}")
    value = results["dense_int8x8"]["eps"]
    detail = {"mode": "int8x8 quantized views (bf16 default in "
                      "dense_views_bf16; gate results/h2h/"
                      "our_SGL_30_int8x8.log)",
              "dense_views_int8x8": results["dense_int8x8"],
              "dense_views_bf16": results["dense"],
              "packed_ell": results["ell"]}
    if "eps" in results["ell"] and "eps" in results["dense"]:
        detail["dense_over_ell"] = round(
            results["dense"]["eps"] / results["ell"]["eps"], 2)
    return {
        "metric": "sgl_yelp2018scale_train_throughput_int8x8",
        "value": value,
        "unit": "examples/s",
        "ref_key": "sgl",
        "detail": detail,
    }


@contextlib.contextmanager
def _pinned_bf16():
    """Force the bf16 default for a workload whose detail.mode CLAIMS
    bf16 (the bootstrap family, whose int8x8 gate FAILED — PARITY.md
    round 5): without the pin, an ambient SELFREC_TPU_DENSE_DTYPE=int8
    would measure the quality-failed mode and stamp it 'bf16' into the
    matrix of record."""
    saved = os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
    try:
        yield
    finally:
        if saved is not None:
            os.environ["SELFREC_TPU_DENSE_DTYPE"] = saved


def _dual_mode_workload(metric, build_model, gates, first_epoch=0,
                        mode_hook=None):
    """Measure a D=64 propagation-dominated workload in BOTH numeric
    modes — bf16 default (reference-parity) and int8x8 quantized (now
    riding the dual-direction Pallas kernel, ops/dense_dual.py /
    DUAL_KERNEL.json) — with the int8x8 number as the headline, exactly
    like the simgcl workload. Every such headline carries per-model
    convergence gates (``gates``, PARITY.md "Quantized-mode
    convergence"); the round-5 step breakdowns (*_BREAKDOWN.json) showed
    these models' steps are HBM-bound on the block read at bf16, which
    is the regime the dual kernel halves."""
    saved = os.environ.get("SELFREC_TPU_DENSE_DTYPE")
    modes = {}
    try:
        for mode, env in (("bf16_default", None), ("int8x8", "int8")):
            if env is None:
                os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
            else:
                os.environ["SELFREC_TPU_DENSE_DTYPE"] = env
            model = build_model()
            best_dt, spread = _timed_run_epochs(model,
                                                first_epoch=first_epoch)
            n_ex = model.data.n_edges
            modes[mode] = {"value": round(n_ex / best_dt, 1), **spread}
            log(f"[{metric}:{mode}] epoch {best_dt:.2f}s "
                f"({modes[mode]['value']:,.0f} ex/s)")
            if mode_hook is not None:
                mode_hook(model, modes[mode])
            del model
    finally:
        if saved is None:
            os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
        else:
            os.environ["SELFREC_TPU_DENSE_DTYPE"] = saved
    return {
        "metric": f"{metric}_yelp2018scale_train_throughput_int8x8",
        "value": modes["int8x8"]["value"],
        "unit": "examples/s",
        "ref_key": metric,
        "detail": {
            "mode": "int8x8 quantized propagation via the dual-direction "
                    "Pallas kernel (SELFREC_TPU_DENSE_DTYPE=int8; "
                    "framework default is bf16 — see modes.bf16_default)",
            "quality_gates": gates,
            "modes": modes,
        },
    }


def bench_ncl():
    """NCL in the PROTO phase (epochs >= 20, reference NCL.py:85-117): each
    epoch pays the k-means e-step (on-device Lloyd, ops/kmeans.py — the
    reference pays faiss-GPU here, NCL.py:35-44) plus structural +
    prototype InfoNCE batches. Whole-epoch timing makes the e-step cost
    visible (VERDICT r2 weak 7). Step accounting: NCL_BREAKDOWN.json."""
    import jax
    import numpy as np

    extra = {"n_layer": 3, "ssl_reg": 1e-6, "proto_reg": 1e-7, "tau": 0.05,
             "hyper_layers": 1, "alpha": 1.5, "num_clusters": 2000}

    def estep_hook(model, mode_entry):
        # isolate the per-epoch k-means e-step (2 tables x 25 Lloyd
        # iters, k=2000 — the part the reference pays faiss-GPU for)
        model.epoch_setup(23)  # compile
        t0 = time.time()
        aux = model.epoch_setup(24)
        np.asarray(jax.tree_util.tree_leaves(aux)[0])[:1]
        mode_entry["kmeans_estep_s"] = round(time.time() - t0, 3)

    return _dual_mode_workload(
        "ncl", lambda: _graph_model("NCL", extra),
        "3-seed bands: results/h2h/our_NCL_30_int8x8{,_s1,_s2}.log "
        "(int8x8 mean inside the bf16 seed band, PARITY.md)",
        first_epoch=20, mode_hook=estep_hook)


def bench_mixgcf():
    """MixGCF with n_negs=64 hard-negative mixing (reference
    MixGCF.py:96-114, conf defaults). Step accounting:
    MIXGCF_BREAKDOWN.json."""
    extra = {"n_layer": 2, "n_negs": 64}
    return _dual_mode_workload(
        "mixgcf", lambda: _graph_model("MixGCF", extra),
        "3-seed bands: results/h2h/our_MixGCF_30_int8x8{,_s1,_s2}.log "
        "(int8x8 mean inside the bf16 seed band, PARITY.md)")


def bench_buir():
    """BUIR (negative-free bootstrap family): per-STEP adjacency dropout
    via DenseAdj.dropout_view (scatter-multiply of the keep mask into the
    int8 block; 2.6x the per-step-reweighted ELL chain) plus the momentum
    target-row updates. Capped-batch methodology (see _timed_batches)."""
    extra = {"n_layer": 2, "drop_rate": 0.2, "tau": 0.995}
    with _pinned_bf16():
        model = _graph_model("BUIR", extra)
        eps, spread = _timed_batches(model)
    log(f"[buir] {eps:.1f} ex/s")
    return {
        "metric": "buir_yelp2018scale_train_throughput",
        "value": round(eps, 1),
        "unit": "examples/s",
        "ref_key": "buir",
        "detail": {
            **spread, "methodology": "50-batch dispatch",
            "mode": "bf16 (pinned) — int8x8 gated OFF for the bootstrap "
                    "family (3-seed band FAIL, -2.4% mean, AND 0.81x "
                    "slower: PARITY.md round-5 gate + BASELINE.md "
                    "round 5)",
        },
    }


def bench_xsimgcl():
    """XSimGCL — the reference leaderboard's TOP model (README.md:144) —
    headline hyperparams (layer=3, l_star=1, lambda=0.2, eps=0.2,
    tau=0.15): ONE perturbed propagation chain serves both the rec and cl
    losses, so the whole epoch fits one dispatch well under the tunnel's
    program-kill threshold. Step accounting: XSIMGCL_BREAKDOWN.json (the
    step IS the propagation: perturbation 0.04 ms, CL ~1 ms)."""
    extra = {"n_layer": 3, "l_star": 1, "lambda": 0.2, "eps": 0.2,
             "tau": 0.15}
    return _dual_mode_workload(
        "xsimgcl", lambda: _graph_model("XSimGCL", extra),
        "results/h2h/our_XSimGCL_30_int8x8.log (PARITY.md "
        "Quantized-mode convergence)")


def _simple_graph_workload(name, extra, metric, doc):
    """Whole-epoch timing for the single-chain graph baselines (reference
    train loops are all the same shape: full forward per batch + loss +
    Adam — e.g. /root/reference/model/graph/LightGCN.py:20-35, MF.py:13-31)."""
    model = _graph_model(name, extra)
    best_dt, spread = _timed_run_epochs(model)
    n_ex = model.data.n_edges
    log(f"[{metric}] epoch {best_dt:.2f}s — {doc}")
    return {
        "metric": f"{metric}_yelp2018scale_train_throughput",
        "value": round(n_ex / best_dt, 1),
        "unit": "examples/s",
        "ref_key": metric,
        "detail": spread,
    }


def bench_mf():
    """MF/BPR — the floor baseline (reference MF.py:13-31): embedding
    lookup + BPR + L2 per batch, no propagation."""
    return _simple_graph_workload("MF", {}, "mf", "MF/BPR")


def bench_lightgcn():
    """LightGCN at the leaderboard hyperparams (n_layer=3, README.md:138 —
    same workload fidelity as simgcl, VERDICT r4 weak 5): one full
    propagation chain per batch + BPR (reference LightGCN.py:20-35).
    Comparator re-measured config-matched at n_layer=3."""
    return _dual_mode_workload(
        "lightgcn", lambda: _graph_model("LightGCN", {"n_layer": 3}),
        "results/h2h/our_lightgcn100_int8x8.log (100-epoch convergence, "
        "PARITY.md Quantized-mode convergence)")


def bench_directau():
    """DirectAU (gamma=2, n_layers=3): LGCN forward + alignment/uniformity
    losses — the uniformity term is a batch^2 pdist kernel per batch
    (reference DirectAU.py:17-47). Step accounting:
    DIRECTAU_BREAKDOWN.json (the step is the propagation; uniformity is
    0.4 ms of a 21 ms step)."""
    return _dual_mode_workload(
        "directau", lambda: _graph_model(
            "DirectAU", {"gamma": 2, "n_layers": 3}),
        "results/h2h/our_DirectAU_30_int8x8.log (PARITY.md "
        "Quantized-mode convergence)")


def bench_ssl4rec():
    """SSL4Rec (tau=.07, alpha=.1, drop=.1): two-tower DNN encoders +
    batch-softmax + feature-dropout CL — no graph propagation at all
    (reference SSL4Rec.py:25-46)."""
    return _simple_graph_workload(
        "SSL4Rec", {"tau": 0.07, "alpha": 0.1, "drop": 0.1}, "ssl4rec",
        "SSL4Rec two-tower")


def bench_selfcf():
    """SelfCF-HE (n_layer=2, tau=.05): LGCN forward + history-buffer target
    mixing + predictor cosine losses (reference SelfCF.py:21-47).
    Step-accounted in SELFCF_BREAKDOWN.json: prop_fwd 6.66 ms vs the
    5.88 ms L=2 HBM two-read floor (the floor is 88% of the measured
    pass), history scatter 0.11 ms, loss terms noise — the epoch is AT
    its bf16 floor. The one lever left, int8x8, FAILED the
    bootstrap-family 3-seed quality gate (-1.5% mean below the bf16 band
    despite a measured 1.37x: PARITY.md round-5 gate), so this workload
    PINS bf16 regardless of the ambient SELFREC_TPU_DENSE_DTYPE — the
    detail.mode label must never be able to lie."""
    with _pinned_bf16():
        r = _simple_graph_workload(
            "SelfCF", {"n_layer": 2, "tau": 0.05}, "selfcf",
            "SelfCF-HE")
    r["detail"]["mode"] = (
        "bf16 (pinned) — int8x8 gated OFF for the bootstrap family "
        "(3-seed band FAIL, -1.5% mean at a would-be 1.37x: PARITY.md "
        "round-5 gate + BASELINE.md round 5)")
    return r


def bench_knn():
    """UserKNN similarity BUILD at yelp2018 scale (31.7k users): shrunk
    cosine over all user pairs + top-50 positive neighbors. Ours is a
    blocked C = R R^T on the MXU (models/graph/userknn.py); the reference
    is an O(U^2) per-pair Python dict loop (UserKNN.py:41-57) whose
    comparator is rate-extrapolated (REF_BASELINES.json userknn). ItemKNN
    build recorded in detail (38k items). Walltime basis: WARM persistent
    compile cache (CACHE_ALWAYS — the build is compile-dominated and warm
    is the production posture; cold was 12-16 s, rounds 4-5)."""
    import jax
    import numpy as np

    conf_u = _graph_conf("UserKNN", {}, **{"topK": 50, "shrinkage": 100})
    from selfrec_tpu.models import get_model_class

    train, test = _synth_yelp()
    model = get_model_class("UserKNN")(conf_u, train, test)
    model.build()
    t0 = time.time()
    model.train()
    np.asarray(model.neighbor_ids)[:1]
    dt_user = time.time() - t0
    t0 = time.time()  # jit-cached second build isolates device time
    model.train()
    np.asarray(model.neighbor_ids)[:1]
    dev_user = time.time() - t0
    log(f"[knn] UserKNN build {dt_user:.2f}s (device {dev_user:.2f}s)")
    conf_i = _graph_conf("ItemKNN", {}, **{"topK": 50, "shrinkage": 100})
    model_i = get_model_class("ItemKNN")(conf_i, train, test)
    model_i.build()
    t0 = time.time()
    model_i.train()  # syncs internally (ids_out is host numpy)
    dt_item = time.time() - t0
    t0 = time.time()
    model_i.train()
    dev_item = time.time() - t0
    log(f"[knn] ItemKNN build {dt_item:.2f}s (device {dev_item:.2f}s)")
    return {
        "metric": "userknn_yelp2018scale_similarity_build_walltime",
        "value": round(dt_user, 3),
        "unit": "s",
        "ref_key": "userknn",
        "detail": {"userknn_build_s": round(dt_user, 3),
                   "userknn_device_s": round(dev_user, 3),
                   "itemknn_build_s": round(dt_item, 3),
                   "itemknn_device_s": round(dev_item, 3),
                   "topk": 50, "shrinkage": 100},
    }


def bench_seq_eval():
    """Sequential-engine EVAL path (VERDICT r3 missing 4): SASRec
    full-catalog scoring of every training sequence's last position +
    top-20 + the post-filter quirk, exactly what fast_evaluation runs.
    Reference comparator: the per-user predict + find_k_largest loop
    (/root/reference/base/seq_recommender.py:34-55), measured by
    scripts/bench_reference.py seq_eval."""
    from selfrec_tpu.data.io import load_data_set
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.utils import metrics

    train = load_data_set(
        "/root/reference/dataset/amazon-beauty/train.txt", "sequential")
    test = load_data_set(
        "/root/reference/dataset/amazon-beauty/test.txt", "sequential")
    conf = _graph_conf(
        "SASRec", {"n_blocks": 2, "drop_rate": 0.2, "n_heads": 1},
        type="sequential", **{"batch.size": 256, "max.len": 50})
    model = get_model_class("SASRec")(conf, train, test)
    model.build()
    model.test()  # compile
    dts, dts_m = [], []
    for _ in range(N_TIMED_REPS):
        t0 = time.time()
        rec_list = model.test()
        dts.append(time.time() - t0)
        t0 = time.time()
        metrics.ranking_evaluation(model.data.test_set, rec_list, [20])
        dts_m.append(time.time() - t0)
    best = min(dts)
    n_seqs = len(model.data.original_seq)
    log(f"[seq_eval] {n_seqs} sequences in {best:.2f}s"
        f" (+{min(dts_m):.2f}s metrics)")
    return {
        "metric": "seq_eval_amazonbeauty_walltime",
        "value": round(best, 3),
        "unit": "s",
        "ref_key": "seq_eval",
        "detail": {**_spread(dts), "metrics_s": round(min(dts_m), 3),
                   "sequences": n_seqs,
                   "seqs_per_s": round(n_seqs / best, 1)},
    }


def bench_eval():
    """Times the PRODUCTION per-epoch eval path (what fast_evaluation runs:
    device top-k ids + vectorized id-array metrics, models/base.py
    _fast_measure — VERDICT r2 weak 6); the legacy string path (rec-list
    dict + reference-format strings, used for the final artifact dump) is
    reported as detail."""
    import jax
    import numpy as np

    from selfrec_tpu.config import ModelConf
    from selfrec_tpu.data.interaction import Interaction
    from selfrec_tpu.ops import ranking
    from selfrec_tpu.utils import metrics

    import jax.numpy as jnp

    train, test = _synth_yelp()
    conf = _graph_conf("MF", {})
    data = Interaction(conf, train, test)
    rng = np.random.default_rng(0)
    # device-resident tables, as in production: fast_evaluation ranks the
    # OUTPUT of compute_embeddings, which never leaves the device — the
    # one-time H2D below is bench setup, not a per-eval cost (round 4:
    # the old host-numpy arguments re-shipped 17.8 MB over the tunnel
    # per timed call, ~0.47 s that production never pays)
    t0 = time.time()
    user_emb = jnp.asarray(rng.normal(size=(data.user_num, 64)).astype(np.float32))
    item_emb = jnp.asarray(rng.normal(size=(data.item_num, 64)).astype(np.float32))
    jax.block_until_ready(item_emb)
    h2d_s = time.time() - t0
    offsets, items = data.test_gt_csr()

    def fast_once():
        t0 = time.time()
        top_ids = ranking.topk_ids_from_embeddings(
            data, user_emb, item_emb, 20)
        t_rank = time.time() - t0
        t0 = time.time()
        metrics.ranking_evaluation_ids(offsets, items, top_ids, [20],
                                       data.item_num)
        return t_rank, time.time() - t0

    def string_once():
        t0 = time.time()
        rl = ranking.rec_list_from_embeddings(data, user_emb, item_emb, 20)
        t_rank = time.time() - t0
        t0 = time.time()
        metrics.ranking_evaluation(data.test_set, rl, [20])
        return t_rank, time.time() - t0

    fast_once()  # compile
    t_rank, t_metrics = min((fast_once() for _ in range(3)), key=sum)
    string_once()
    s_rank, s_metrics = min((string_once() for _ in range(3)), key=sum)
    n_users = len(data.test_set)
    log(f"[eval] fast path: {n_users} users in {t_rank:.2f}s rank"
        f" + {t_metrics:.2f}s metrics; string path {s_rank + s_metrics:.2f}s")
    return {
        "metric": "fullrank_eval_yelp2018scale_walltime",
        "value": round(t_rank + t_metrics, 3),
        "unit": "s",
        "ref_key": None,
        "detail": {"rank_s": round(t_rank, 3), "metrics_s": round(t_metrics, 3),
                   "users_per_s": round(n_users / t_rank, 1),
                   "setup_h2d_s": round(h2d_s, 3),
                   "string_path_s": round(s_rank + s_metrics, 3),
                   "string_metrics_s": round(s_metrics, 3)},
    }


# Run order = headline first, then roughly ASCENDING cost, so a
# budget-constrained driver run (SELFREC_TPU_BENCH_BUDGET_S) covers the
# most workloads before the skip kicks in: the round-5 driver-style smoke
# with the old order fit only 8/20 in 1000s because the multi-arm
# workloads (sgl ~400s cold, ncl/mixgcf ~200s each) sat in the middle.
# Deliberate matrix captures run unbudgeted, so order doesn't affect the
# record.
WORKLOADS = {
    "simgcl": bench_simgcl,      # headline — always first
    "eval": bench_eval,
    "sasrec": bench_sasrec,
    "seq_eval": bench_seq_eval,
    "bert4rec": bench_bert4rec,
    "cl4srec": bench_cl4srec,
    "mf": bench_mf,
    "ssl4rec": bench_ssl4rec,
    "knn": bench_knn,
    "buir": bench_buir,
    "mhcn": bench_mhcn,
    "sept": bench_sept,
    "lightgcn": bench_lightgcn,
    "directau": bench_directau,
    "xsimgcl": bench_xsimgcl,
    "selfcf": bench_selfcf,
    "ncl": bench_ncl,
    "mixgcf": bench_mixgcf,
    "sgl": bench_sgl,
    # the social engine at the reference's real douban-book marginals —
    # LAST so a budget-constrained driver run drops it first
    "mhcn_fulldouban": bench_mhcn_fulldouban,
}


def _run_one(name):
    """Per-workload subprocess entry (``bench.py --one <name>``): run ONE
    workload in a fresh process and print its result JSON as the last
    stdout line. Workload isolation is load-bearing: tunnel-side device
    memory accumulates per process across workloads (round-5 full
    captures died RESOURCE_EXHAUSTED at workload 9/20 with ZERO
    python-side live arrays, twice, deterministically — and
    jax.clear_caches + gc did not help), while the same workloads run
    back-to-back in fresh processes pass. The persistent on-disk compile
    cache keeps per-process recompiles cheap."""
    import jax

    log("devices:", jax.devices())
    r = WORKLOADS[name]()
    print(json.dumps(r), flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        _run_one(sys.argv[2])
        return

    import subprocess

    names = sys.argv[1:] or list(WORKLOADS)
    refs = ref_baselines()
    # BENCH_MATRIX.json is the committed matrix of record (doc headlines are
    # bound to it); ad-hoc/driver runs land in BENCH_LAST.json instead so
    # run-to-run variance can't drift the record (see module docstring).
    update_matrix = os.environ.get("SELFREC_TPU_UPDATE_MATRIX", "0") == "1"
    matrix_path = os.path.join(
        REPO, "BENCH_MATRIX.json" if update_matrix else "BENCH_LAST.json"
    )
    if not update_matrix and os.path.exists(matrix_path):
        # scratch file: start clean so one BENCH_LAST.json never mixes
        # measurements from different runs/code states (ADVICE r4); the
        # crash-resilient incremental merge below still applies within
        # THIS run, and always for the matrix-of-record path.
        os.remove(matrix_path)
    # Wall-clock budget: the driver wraps `python bench.py` in a timeout;
    # when the budget runs out, skip remaining workloads CLEANLY so the
    # process still exits 0 with the headline printed (VERDICT r4 item 1).
    # Deliberate matrix captures default to no budget.
    budget_s = float(os.environ.get(
        "SELFREC_TPU_BENCH_BUDGET_S",
        "inf" if update_matrix else "1000"))
    t_start = time.time()
    results = {}
    # failures are reported but NEVER merged into the matrix — an error
    # dict must not clobber a prior round's good entry
    errors = {}
    headline_printed = False
    for name in names:
        elapsed = time.time() - t_start
        if elapsed > budget_s:
            log(f"[budget] {elapsed:.0f}s > {budget_s:.0f}s budget — "
                f"skipping {name} (run `python bench.py {name}` or a "
                f"flagged full capture for it)")
            continue
        log(f"=== {name} ({elapsed:.0f}s elapsed) ===")
        try:
            if os.environ.get("SELFREC_TPU_BENCH_INPROC") == "1":
                # tests/debugging: run the workload in THIS process
                r = WORKLOADS[name]()
                raise StopIteration  # skip the subprocess path
            # one fresh subprocess per workload (see _run_one: per-process
            # tunnel device memory makes in-process multi-workload runs
            # OOM); stderr streams through, result JSON comes via stdout
            env = os.environ.copy()
            if update_matrix and name not in CACHE_ALWAYS:
                # matrix-of-record throughput numbers are measured with
                # the persistent compile cache OFF: cache-DESERIALIZED
                # executables can run measurably slower (ssl4rec epoch
                # 0.92 s fresh-compiled vs 1.53 s cache-loaded, measured
                # 2026-08-20 — a toolchain property, not our code).
                # Driver/unflagged runs keep the cache for window
                # coverage; the wall-time workloads in CACHE_ALWAYS are
                # compile-dominated and keep it always (warm = the
                # production posture, basis noted in their details).
                env["SELFREC_TPU_COMPILE_CACHE"] = ""
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                stdout=subprocess.PIPE, timeout=1800, env=env)
            if proc.returncode != 0:
                raise RuntimeError(f"subprocess rc={proc.returncode}")
            out_lines = proc.stdout.decode().strip().splitlines()
            r = json.loads(out_lines[-1])
        except StopIteration:
            pass  # in-process result already in r
        except Exception as e:  # one workload must not sink the matrix
            log(f"[{name}] FAILED: {e!r}")
            errors[name] = repr(e)[:300]
            continue
        ref = refs.get(r.pop("ref_key", None))
        if r["unit"] == "s":
            r["vs_baseline"] = round(ref / r["value"], 2) if ref else None
        else:
            r["vs_baseline"] = round(r["value"] / ref, 2) if ref else None
        results[name] = r
        log(json.dumps(r))
        if name == "simgcl":
            # driver contract: emit the headline the moment it exists, so
            # even a timeout-killed run carries the SimGCL metric on stdout
            print(json.dumps(r), flush=True)
            headline_printed = True
        # write incrementally: a later crash keeps earlier measurements
        existing = {}
        if os.path.exists(matrix_path):
            with open(matrix_path) as f:
                existing = json.load(f)
        existing.update(results)
        with open(matrix_path, "w") as f:
            json.dump(existing, f, indent=2)
    log(f"wrote {matrix_path} ({time.time()-t_start:.0f}s total)")
    if errors:
        log(f"FAILED workloads (not merged): {json.dumps(errors)}")

    ok = {k: v for k, v in results.items() if "metric" in v}
    headline = ok.get("simgcl") or next(iter(ok.values()), {"metric": "none", "value": 0, "unit": "", "vs_baseline": None})
    # re-print last so tail-parsing drivers also resolve the headline (the
    # per-workload stderr logs would otherwise be the last JSON lines)
    if not (headline_printed and len(ok) == 1):
        print(json.dumps(headline))


if __name__ == "__main__":
    # Persistent XLA compile cache ON for bench runs (VERDICT r4 item 1):
    # timed reps always come AFTER the compile+first dispatch, so the cache
    # never touches a measured number — it only cuts the compile share of
    # total wall so the full matrix fits the driver window (round-4 capture
    # died at workload 18/19, BENCH_r04.json rc=124). Opt out with
    # SELFREC_TPU_COMPILE_CACHE="" (cold-compile walltimes are themselves
    # benched in DENSE_ROOFLINE-style artifacts, not here). Must be set
    # before the first selfrec_tpu import (it wires the cache at import).
    os.environ.setdefault("SELFREC_TPU_COMPILE_CACHE",
                          "/tmp/selfrec_tpu_xla_cache")
    main()
