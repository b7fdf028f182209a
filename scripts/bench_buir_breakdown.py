#!/usr/bin/env python
"""BUIR per-step accounting + A/B of the dropout-view fix (VERDICT r3 item 4).

Round 3 recorded BUIR at 13,669 ex/s (10.7x the reference's own torch code,
the weakest multiple in the matrix) with no step-time breakdown. This script
isolates the step's terms at yelp2018 scale with the marginal-REPS in-loop
methodology of scripts/bench_dense_roofline.py (REPS vs 2*REPS fori_loop under
one jit; the difference cancels dispatch+fetch overhead):

- ``prop_static``   : one 2-layer LightGCN propagation, clean adjacency
                      (the irreducible MXU/HBM term)
- ``view_fused``    : per-step dropout view (NEW fused full-matrix Bernoulli
                      mask, ops/spmm_dense.py dropout_view) + propagation
- ``view_scatter``  : per-step dropout view as shipped in round 3 — a 1.56M
                      random-index scatter-multiply into the 1.2GB block —
                      + propagation (kept inline here as the A/B baseline)
- ``dual_forward``  : the model's real batch_loss (BOTH encoders, two
                      independent fused views, predictor + cosine loss)
- ``grad``          : value_and_grad of batch_loss (forward + backward)
- ``momentum``      : step_update alone (2048-row target-table scatter,
                      reference BUIR.py:69-75 semantics)
- ``full_step``     : the production scan step (sampler + grad + Adam +
                      momentum), via bench._timed_batches on the model's own
                      epoch fn

Reference being accounted: /root/reference/model/graph/BUIR.py:118-144 (two
encoder forwards with per-forward sparse dropout at rate U[0,1)*drop_rate).

Writes BUIR_BREAKDOWN.json. Usage:
    python scripts/bench_buir_breakdown.py [--cpu] [--scale 1.0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_GBS = 819.0
REPS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()
    reps = args.reps

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bench import _graph_conf, _timed_batches
    from selfrec_tpu.models import get_model_class
    from selfrec_tpu.ops import sampling
    from selfrec_tpu.ops.graph import lightgcn_propagate
    from selfrec_tpu.ops.spmm_dense import DenseAdj
    from selfrec_tpu.utils.synth import (
        YELP2018_INTERACTIONS, YELP2018_ITEMS, YELP2018_USERS,
        synth_graph_mapped,
    )

    dev = jax.devices()[0]
    log("device:", dev)
    train, test = synth_graph_mapped(
        max(int(YELP2018_USERS * args.scale), 50),
        max(int(YELP2018_ITEMS * args.scale), 60),
        max(int(YELP2018_INTERACTIONS * args.scale), 500))
    conf = _graph_conf("BUIR", {"n_layer": 2, "drop_rate": 0.2,
                                "tau": 0.995})
    model = get_model_class("BUIR")(conf, train, test)
    model.build()
    adj = model.adj
    assert isinstance(adj, DenseAdj) and adj.factored, adj
    nu, ni = model.data.user_num, model.data.item_num
    d = model.emb_size
    n_layers, drop_rate = model.n_layers, model.drop_rate
    log(f"graph: U={nu} I={ni} nnz={model.data.n_edges} D={d} "
        f"L={n_layers} drop={drop_rate}")

    rng = np.random.default_rng(0)
    x0 = jnp.asarray((rng.normal(size=(nu + ni, d)) * 0.01).astype(np.float32))
    key0 = jax.random.PRNGKey(0)

    users, items, masks = sampling.epoch_pairwise_batches(
        model.rng, model.data.edge_users, model.data.edge_items,
        model.batch_size)
    batch = {"u": jnp.asarray(users[0]), "i": jnp.asarray(items[0]),
             "mask": jnp.asarray(masks[0])}
    aux0 = model.epoch_setup(0)
    params0 = model.params

    # --- adjacency-level arms (adj as ARGUMENT: a 1.2GB closure constant
    # would blow the axon remote-compile body limit, HTTP 413) ------------
    def fused_view(a, k):
        # the TPU-default dropout_view formulation, inlined so the A/B is
        # explicit on any platform: full-matrix RBG Bernoulli fused into
        # one streaming pass over the block
        from selfrec_tpu.ops.spmm_dense import _rbg_keep_mask

        k1, k2 = jax.random.split(k)
        rate = jax.random.uniform(k1) * drop_rate
        mask = _rbg_keep_mask(k2, a.a_ui.shape, rate)
        return DenseAdj(a.a_ui * mask.astype(a.a_ui.dtype),
                        a.edge_users, a.edge_items, a.edge_w,
                        a.n_users, a.n_items, a.row_scale, a.col_scale,
                        a.gain / (1.0 - rate), mm_dtype=a.mm_dtype)

    def scatter_view(a, k):
        # round-3 formulation, kept inline as the A/B baseline: per-edge
        # keep mask scatter-multiplied into the block
        k1, k2 = jax.random.split(k)
        rate = jax.random.uniform(k1) * drop_rate
        keep = jax.random.uniform(k2, a.edge_w.shape) >= rate
        b = a.a_ui.at[a.edge_users, a.edge_items].multiply(
            keep.astype(a.a_ui.dtype))
        return DenseAdj(b, a.edge_users, a.edge_items, a.edge_w,
                        a.n_users, a.n_items, a.row_scale, a.col_scale,
                        a.gain / (1.0 - rate), mm_dtype=a.mm_dtype)

    def arm_prop_static(a, k, xx):
        return lightgcn_propagate(a, xx, n_layers, include_layer0=True)

    def arm_view_fused(a, k, xx):
        return lightgcn_propagate(fused_view(a, k), xx, n_layers,
                                  include_layer0=True)

    def arm_view_scatter(a, k, xx):
        return lightgcn_propagate(scatter_view(a, k), xx, n_layers,
                                  include_layer0=True)

    def timed(fn, *a):
        def fetch():
            # honest completion barrier: fetch a real slice (the axon
            # tunnel's block_until_ready can return early)
            return np.asarray(jax.tree_util.tree_leaves(fn(*a))[0]).ravel()[:1]
        fetch()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fetch()
            best = min(best, time.perf_counter() - t0)
        return best

    def x_loop(stage, n):
        @jax.jit
        def f(a, xx):
            def body(i, acc):
                return stage(a, jax.random.fold_in(key0, i), acc) * 0.999
            return jax.lax.fori_loop(0, n, body, xx)
        return f

    def marginal(make):
        t1 = timed_make(make, reps)
        t2 = timed_make(make, 2 * reps)
        return (t2 - t1) / reps

    made = {}

    def timed_make(make, n):
        if (make, n) not in made:
            made[(make, n)] = make(n)
        return timed(made[(make, n)], *ARGS[make])

    # --- model-level arms (attribute swap exactly like _make_epoch_fn) ---
    consts = model._scan_consts()

    def _swapped(build):
        """Trace ``build`` with the scan-const attributes swapped for the
        traced arguments (models/base.py:536-551 pattern)."""
        def f(cst, params, aux):
            saved = {n: getattr(model, n) for n in cst}
            for n, v in cst.items():
                setattr(model, n, v)
            try:
                return build(params, aux)
            finally:
                for n, v in saved.items():
                    setattr(model, n, v)
        return jax.jit(f)

    def make_fwd(n):
        def build(params, aux):
            def body(i, acc):
                return acc + model.batch_loss(
                    params, dict(batch, aux=aux),
                    jax.random.fold_in(key0, i))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return _swapped(build)

    def make_grad(n):
        def build(params, aux):
            def body(i, acc):
                g = jax.grad(model.batch_loss)(
                    params, dict(batch, aux=aux),
                    jax.random.fold_in(key0, i))
                return jax.tree_util.tree_map(
                    lambda a_, b_: a_ + b_ * 1e-9, acc, g)
            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            return jax.lax.fori_loop(0, n, body, zero)
        return _swapped(build)

    def make_mom(n):
        @jax.jit
        def f(params, aux):
            def body(i, a_):
                return model.step_update(params, a_, dict(batch))
            return jax.lax.fori_loop(0, n, body, aux)
        return f

    ARGS = {}

    def reg(make, *a):
        ARGS[make] = a
        return make

    arms = {
        "prop_static": reg(lambda n: x_loop(arm_prop_static, n), adj, x0),
        "view_fused": reg(lambda n: x_loop(arm_view_fused, n), adj, x0),
        "view_scatter": reg(lambda n: x_loop(arm_view_scatter, n), adj, x0),
        "dual_forward": reg(make_fwd, consts, params0, aux0),
        "grad": reg(make_grad, consts, params0, aux0),
        "momentum": reg(make_mom, params0, aux0),
    }

    ui_gb = nu * ni / 1e9  # int8 block bytes
    results = {"platform": dev.platform, "U": nu, "I": ni,
               "nnz": int(model.data.n_edges), "D": d,
               "batch_size": model.batch_size, "reps_in_loop": reps,
               "block_gb_int8": round(ui_gb, 3),
               # per propagation: L layers x 2 directions read the block;
               # each view writes it once
               "hbm_floor_ms_per_view+prop": round(
                   (1 + 2 * n_layers) * ui_gb / V5E_PEAK_GBS * 1e3, 2),
               "arms_ms": {}, "derived_ms": {}}

    for name, make in arms.items():
        ms = marginal(make) * 1e3
        results["arms_ms"][name] = round(ms, 2)
        log(f"  {name:14s} {ms:8.2f} ms")

    # the production step, via the model's own epoch fn (sampler + Adam
    # + momentum included)
    eps, spread = _timed_batches(model, m=32)
    step_ms = model.batch_size / eps * 1e3
    results["arms_ms"]["full_step"] = round(step_ms, 2)
    results["full_step_examples_per_sec"] = round(eps, 1)
    results["full_step_spread"] = spread
    log(f"  {'full_step':14s} {step_ms:8.2f} ms  ({eps:,.0f} ex/s)")

    a = results["arms_ms"]
    results["derived_ms"] = {
        "dropout_rebuild_fused": round(a["view_fused"] - a["prop_static"], 2),
        "dropout_rebuild_scatter_r3": round(
            a["view_scatter"] - a["prop_static"], 2),
        "second_encoder": round(a["dual_forward"] - a["view_fused"], 2),
        "backward": round(a["grad"] - a["dual_forward"], 2),
        "sampler_adam_overhead": round(
            a["full_step"] - a["grad"] - a["momentum"], 2),
    }
    log("derived:", json.dumps(results["derived_ms"]))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BUIR_BREAKDOWN.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    log("wrote", out)


if __name__ == "__main__":
    main()
