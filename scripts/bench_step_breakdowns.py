#!/usr/bin/env python
"""Per-step accounting for the four slowest matrix workloads (VERDICT r4
item 2): ncl, mixgcf, xsimgcl, directau.

Same marginal-REPS in-loop methodology as scripts/bench_buir_breakdown.py
(time a jitted fori_loop at REPS and 2*REPS iterations; the difference
cancels dispatch+fetch overhead). Each model gets:

- ``prop_fwd``   : the model's eval-path propagation alone (the irreducible
                   MXU term — L layers x 2 block matmuls per layer)
- ablation forwards that add one loss term at a time (model-specific, each
  mirrors the terms of the model's ``batch_loss``)
- ``loss_fwd``   : the full batch_loss forward
- ``grad``       : grad of the full batch_loss (forward + backward)
- ``full_step``  : the production scan step (in-scan negative sampler +
                   Adam included), via bench._timed_batches

and an analytic MXU floor for the propagation matmuls (bf16 197 TFLOPS,
dense int8-factored bipartite block — see DENSE_ROOFLINE.json for why the
block pass is MXU-bound, 87-93% of that floor).

Reference hot spots being accounted:
- NCL.py:57-83   — structural loss contracts the batch against ALL
                   users/items as denominators
- MixGCF.py:96-114 — 64-candidate positive-mix hard-negative synthesis
- XSimGCL.py:83-101 — single perturbed chain serving rec + cl
- DirectAU.py:37-48 — pdist uniformity over the batch

Round 5 adds ``selfcf`` (the largest absolute epoch in the matrix): its
chain isolates the history-buffer scatter (loss_aux_fwd-loss_fwd — the
(loss, new_aux) arm keeps the scatters live, the scalar arm DCEs them) —
and ``simgcl`` (the headline workload): clean chain vs the fused
width-3D 3-chain vs rec-only vs full loss. SIMGCL_BREAKDOWN.json is the
two-mode merge (bf16 + SELFREC_TPU_DENSE_DTYPE=int8 runs).

Writes {NCL,MIXGCF,XSIMGCL,DIRECTAU,SELFCF,SIMGCL}_BREAKDOWN.json. Usage:
    python scripts/bench_step_breakdowns.py [ncl mixgcf xsimgcl directau
    selfcf simgcl] [--cpu] [--scale 1.0] [--reps 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0
REPS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*",
                    default=["ncl", "mixgcf", "xsimgcl", "directau"])
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
    from selfrec_tpu.ops import losses, sampling
    from selfrec_tpu.ops.graph import (
        fused_simgcl_propagate, perturbed_propagate)
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
    key0 = jax.random.PRNGKey(0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run_model(tag, name, extra, n_layers, arms_fn, n_negs=1,
                  setup=None, write=True):
        model = get_model_class(name)(_graph_conf(name, extra), train, test)
        model.build()
        if setup:
            setup(model)
        nu, ni, d = model.data.user_num, model.data.item_num, model.emb_size
        log(f"[{tag}] U={nu} I={ni} nnz={model.data.n_edges} D={d} "
            f"L={n_layers}")

        # one frozen batch: host epoch shuffle + uniform negatives (timing
        # only — the production in-scan rejection sampler is inside
        # full_step, whose cost shows up in sampler_adam_overhead)
        users, items, masks = sampling.epoch_pairwise_batches(
            model.rng, model.data.edge_users, model.data.edge_items,
            model.batch_size)
        rng = np.random.default_rng(0)
        jshape = ((model.batch_size,) if n_negs == 1
                  else (model.batch_size, n_negs))
        batch = {"u": jnp.asarray(users[0]), "i": jnp.asarray(items[0]),
                 "mask": jnp.asarray(masks[0]),
                 "j": jnp.asarray(rng.integers(0, ni, jshape, dtype=np.int32))}
        aux0 = model.epoch_setup(0)
        consts = model._scan_consts()
        params0 = model.params

        def timed(fn, *a):
            def fetch():
                # honest completion barrier: fetch a real slice (the axon
                # tunnel's block_until_ready can return early)
                return np.asarray(
                    jax.tree_util.tree_leaves(fn(*a))[0]).ravel()[:1]
            fetch()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fetch()
                best = min(best, time.perf_counter() - t0)
            return best

        def make_loop(fn, n, want_grad=False):
            """Jit a consts-swapped fori_loop of n iterations of ``fn``.

            The f32 carry feeds back into params each iteration (p +
            acc*1e-30) so loop-invariant forwards (e.g. DirectAU's keyless
            loss) cannot be hoisted out of the loop by XLA; grad arms
            reduce EVERY grad leaf into the carry so no backward path is
            dead code."""
            body_fn = jax.grad(fn) if want_grad else fn

            def f(cst, params, aux):
                saved = {k: getattr(model, k) for k in cst}
                for k, v in cst.items():
                    setattr(model, k, v)
                try:
                    def body(i, acc):
                        p2 = jax.tree_util.tree_map(
                            lambda p: p + acc * 1e-30, params)
                        out = body_fn(p2, aux, jax.random.fold_in(key0, i))
                        return acc + sum(
                            jnp.sum(leaf) * 1e-9
                            for leaf in jax.tree_util.tree_leaves(out))
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
                finally:
                    for k, v in saved.items():
                        setattr(model, k, v)
            return jax.jit(f)

        made = {}

        def marginal(arm_fn, want_grad=False):
            def t(n):
                k = (arm_fn, n, want_grad)
                if k not in made:
                    made[k] = make_loop(arm_fn, n, want_grad)
                return timed(made[k], consts, params0, aux0)
            return (t(2 * reps) - t(reps)) / reps

        arms = arms_fn(model, batch)
        full_loss = arms.pop("_full_loss")
        results = {"platform": dev.platform, "U": nu, "I": ni,
                   "nnz": int(model.data.n_edges), "D": d,
                   "n_layers": n_layers,
                   "batch_size": model.batch_size, "reps_in_loop": reps,
                   "arms_ms": {}, "derived_ms": {}}
        # MXU floor for the propagation: 2 block matmuls (u->i, i->u
        # directions) per layer, 2*U*I*D flops each, bf16 peak; backward
        # re-reads the block transposed the same number of times (the block
        # is constant — only operand grads flow), hence grad floor = 2x.
        mm_flops = 2 * nu * ni * d
        fwd_floor = 2 * n_layers * mm_flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
        results["mxu_floor_ms"] = {
            "prop_fwd": round(fwd_floor, 2),
            "grad": round(2 * fwd_floor, 2),
        }

        for aname, afn in arms.items():
            ms = marginal(afn) * 1e3
            results["arms_ms"][aname] = round(ms, 2)
            log(f"  {aname:16s} {ms:8.2f} ms")
        gms = marginal(full_loss, want_grad=True) * 1e3
        results["arms_ms"]["grad"] = round(gms, 2)
        log(f"  {'grad':16s} {gms:8.2f} ms")

        eps, spread = _timed_batches(model, m=32)
        step_ms = model.batch_size / eps * 1e3
        results["arms_ms"]["full_step"] = round(step_ms, 2)
        results["full_step_examples_per_sec"] = round(eps, 1)
        results["full_step_spread"] = spread
        log(f"  {'full_step':16s} {step_ms:8.2f} ms  ({eps:,.0f} ex/s)")

        a = results["arms_ms"]
        d_ms = {"backward": round(a["grad"] - a["loss_fwd"], 2),
                "sampler_adam_overhead": round(
                    a["full_step"] - a["grad"], 2)}
        names = list(arms)
        for prev, cur in zip(names, names[1:]):  # ablation chain deltas
            d_ms[f"{cur}-{prev}"] = round(a[cur] - a[prev], 2)
        d_ms["prop_fwd_pct_of_mxu_floor"] = round(
            100 * results["mxu_floor_ms"]["prop_fwd"] / a["prop_fwd"], 1)
        d_ms["grad_pct_of_mxu_floor"] = round(
            100 * results["mxu_floor_ms"]["grad"] / a["grad"], 1)
        results["derived_ms"] = d_ms
        log("derived:", json.dumps(d_ms))

        if write:
            out = os.path.join(repo, f"{tag.upper()}_BREAKDOWN.json")
            with open(out, "w") as f:
                json.dump(results, f, indent=2)
            log("wrote", out)
        del model
        return results

    # ---- per-model ablation chains (each fn mirrors the model's own
    # batch_loss with later terms removed; see the model docstrings for the
    # reference citations) -------------------------------------------------

    def ncl_arms(model, batch):
        nu = model.data.user_num

        def prop_fwd(params, aux, key):
            out, _ = model._propagate(params)
            return jnp.sum(out[:1, :1])

        def rec_only(params, aux, key):
            out, _ = model._propagate(params)
            u = out[:nu][batch["u"]]
            p = out[nu:][batch["i"]]
            n = out[nu:][batch["j"]]
            rec = losses.bpr_loss(u, p, n, mask=batch["mask"])
            reg = losses.l2_reg_loss(model.reg, u, p, n,
                                     mask=batch["mask"]) / model.batch_size
            return rec + reg

        def no_proto(params, aux, key):
            out, emb_list = model._propagate(params)
            u = out[:nu][batch["u"]]
            p = out[nu:][batch["i"]]
            n = out[nu:][batch["j"]]
            rec = losses.bpr_loss(u, p, n, mask=batch["mask"])
            reg = losses.l2_reg_loss(model.reg, u, p, n,
                                     mask=batch["mask"]) / model.batch_size
            ssl = model._ssl_layer_loss(
                emb_list[model.hyper_layers * 2], emb_list[0], batch)
            return rec + reg + ssl

        def full(params, aux, key):
            return model.batch_loss(params, dict(batch, aux=aux), key)

        return {"prop_fwd": prop_fwd, "rec_only_fwd": rec_only,
                "no_proto_fwd": no_proto, "loss_fwd": full,
                "_full_loss": full}

    def mixgcf_arms(model, batch):
        def prop_fwd(params, aux, key):
            u_all, i_all = model.compute_embeddings(params)
            return jnp.sum(u_all[:1, :1]) + jnp.sum(i_all[:1, :1])

        def no_mix(params, aux, key):
            # dropout forward + plain first-negative BPR (mixing removed)
            user_layers, item_layers = model._layerwise(params, key)
            user_final = jnp.mean(jnp.stack(user_layers), axis=0)
            item_final = jnp.mean(jnp.stack(item_layers), axis=0)
            u = user_final[batch["u"]]
            p = item_final[batch["i"]]
            n = item_final[batch["j"][:, 0]]
            rec = losses.bpr_loss(u, p, n, mask=batch["mask"])
            reg = losses.l2_reg_loss(model.reg, u, p, n,
                                     mask=batch["mask"]) / model.batch_size
            return rec + reg

        def full(params, aux, key):
            return model.batch_loss(params, batch, key)

        return {"prop_fwd": prop_fwd, "no_mix_fwd": no_mix,
                "loss_fwd": full, "_full_loss": full}

    def xsimgcl_arms(model, batch):
        nu = model.data.user_num

        def prop_clean(params, aux, key):
            u_all, i_all = model.compute_embeddings(params)
            return jnp.sum(u_all[:1, :1]) + jnp.sum(i_all[:1, :1])

        def prop_pert(params, aux, key):
            final, cl_view = perturbed_propagate(
                model.adj, model._ego(params), model.n_layers, key,
                model.eps, cl_layer=model.layer_cl)
            return jnp.sum(final[:1, :1]) + jnp.sum(cl_view[:1, :1])

        def rec_only(params, aux, key):
            final, _ = perturbed_propagate(
                model.adj, model._ego(params), model.n_layers, key,
                model.eps, cl_layer=model.layer_cl)
            u = final[:nu][batch["u"]]
            p = final[nu:][batch["i"]]
            n = final[nu:][batch["j"]]
            rec = losses.bpr_loss(u, p, n, mask=batch["mask"])
            reg = losses.l2_reg_loss(model.reg, u, p, mask=batch["mask"])
            return rec + reg

        def full(params, aux, key):
            return model.batch_loss(params, batch, key)

        return {"prop_fwd": prop_clean, "prop_perturbed_fwd": prop_pert,
                "rec_only_fwd": rec_only, "loss_fwd": full,
                "_full_loss": full}

    def directau_arms(model, batch):
        def prop_fwd(params, aux, key):
            u_all, i_all = model.compute_embeddings(params)
            return jnp.sum(u_all[:1, :1]) + jnp.sum(i_all[:1, :1])

        def align_only(params, aux, key):
            user_all, item_all = model.compute_embeddings(params)
            u = user_all[batch["u"]]
            p = item_all[batch["i"]]
            align = losses.alignment_loss_masked(u, p, batch["mask"])
            reg = losses.l2_reg_loss(model.reg, u, p,
                                     mask=batch["mask"]) / model.batch_size
            return align + reg

        def full(params, aux, key):
            return model.batch_loss(params, batch, key)

        return {"prop_fwd": prop_fwd, "align_only_fwd": align_only,
                "loss_fwd": full, "_full_loss": full}

    def simgcl_arms(model, batch):
        # the HEADLINE workload's own accounting (round 5): the fused
        # width-3D chain (1 clean + 2 perturbed, ops/graph.py
        # fused_simgcl_propagate) vs the clean chain alone, then the
        # BPR/reg and CL terms on top
        nu = model.data.user_num

        def prop_clean(params, aux, key):
            u_all, i_all = model.compute_embeddings(params)
            return jnp.sum(u_all[:1, :1]) + jnp.sum(i_all[:1, :1])

        def prop_fused3(params, aux, key):
            clean, v1, v2 = fused_simgcl_propagate(
                model.adj, model._ego(params), model.n_layers, key,
                model.eps)
            return (jnp.sum(clean[:1, :1]) + jnp.sum(v1[:1, :1])
                    + jnp.sum(v2[:1, :1]))

        def rec_only(params, aux, key):
            # fused propagation + BPR/reg, CL removed — the
            # loss_fwd-rec_only_fwd delta isolates the two InfoNCE terms
            clean, v1, v2 = fused_simgcl_propagate(
                model.adj, model._ego(params), model.n_layers, key,
                model.eps)
            u = clean[:nu][batch["u"]]
            p = clean[nu:][batch["i"]]
            n = clean[nu:][batch["j"]]
            rec = losses.bpr_loss(u, p, n, mask=batch["mask"])
            reg = losses.l2_reg_loss(model.reg, u, p, mask=batch["mask"])
            return rec + reg + 1e-30 * (jnp.sum(v1[:1, :1])
                                        + jnp.sum(v2[:1, :1]))

        def full(params, aux, key):
            return model.batch_loss(params, batch, key)

        return {"prop_fwd": prop_clean, "prop_fused3_fwd": prop_fused3,
                "rec_only_fwd": rec_only, "loss_fwd": full,
                "_full_loss": full}

    def selfcf_arms(model, batch):
        def prop_fwd(params, aux, key):
            u_all, i_all = model._propagate(params)
            return jnp.sum(u_all[:1, :1]) + jnp.sum(i_all[:1, :1])

        def loss_fwd(params, aux, key):
            # scalar loss only: the history-buffer scatter (new_aux) is
            # dead code here and gets DCE'd — its cost is the
            # loss_aux_fwd-loss_fwd delta
            return model.batch_loss(params, dict(batch, aux=aux), key)

        def loss_aux_fwd(params, aux, key):
            # (loss, new_aux) tuple: make_loop reduces EVERY leaf into the
            # carry, so the per-batch history scatters stay live
            return model.batch_loss_aux(params, dict(batch, aux=aux), key)

        return {"prop_fwd": prop_fwd, "loss_fwd": loss_fwd,
                "loss_aux_fwd": loss_aux_fwd, "_full_loss": loss_fwd}

    def ncl_setup(model):
        # measure the PROTO phase (epoch >= 20), same as the matrix workload
        model._proto_phase = True

    specs = {
        "ncl": ("NCL", {"n_layer": 3, "ssl_reg": 1e-6, "proto_reg": 1e-7,
                        "tau": 0.05, "hyper_layers": 1, "alpha": 1.5,
                        "num_clusters": 2000}, 3, ncl_arms, 1, ncl_setup),
        "mixgcf": ("MixGCF", {"n_layer": 2, "n_negs": 64}, 2, mixgcf_arms,
                   64, None),
        "xsimgcl": ("XSimGCL", {"n_layer": 3, "l_star": 1, "lambda": 0.2,
                                "eps": 0.2, "tau": 0.15}, 3, xsimgcl_arms,
                    1, None),
        "directau": ("DirectAU", {"gamma": 2, "n_layers": 3}, 3,
                     directau_arms, 1, None),
        "selfcf": ("SelfCF", {"n_layer": 2, "tau": 0.05}, 2,
                   selfcf_arms, 1, None),
        "simgcl": ("SimGCL", {"n_layer": 3, "lambda": 0.5, "eps": 0.1}, 3,
                   simgcl_arms, 1, None),
    }

    all_results = {}
    for tag in args.models:
        name, extra, nl, arms_fn, n_negs, setup = specs[tag]
        log(f"=== {tag} ===")
        if tag == "simgcl":
            # the headline workload is accounted in BOTH numeric modes;
            # the script itself writes the {bf16_default, int8x8} merge
            # so a re-run can never clobber the committed two-mode
            # artifact with a flat single-mode file
            saved = os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
            try:
                log("--- simgcl: bf16_default mode ---")
                bf = run_model(tag, name, extra, nl, arms_fn,
                               n_negs=n_negs, setup=setup, write=False)
                os.environ["SELFREC_TPU_DENSE_DTYPE"] = "int8"
                log("--- simgcl: int8x8 mode ---")
                i8 = run_model(tag, name, extra, nl, arms_fn,
                               n_negs=n_negs, setup=setup, write=False)
            finally:
                if saved is None:
                    os.environ.pop("SELFREC_TPU_DENSE_DTYPE", None)
                else:
                    os.environ["SELFREC_TPU_DENSE_DTYPE"] = saved
            merged = {
                "note": (
                    "Headline-workload step accounting, both numeric "
                    "modes (scripts/bench_step_breakdowns.py simgcl; "
                    "int8x8 half run with SELFREC_TPU_DENSE_DTYPE=int8). "
                    "The step IS the fused width-3D propagation chain "
                    "(1 clean + 2 perturbed): loss-term deltas "
                    "(rec/reg/CL) are noise-level in both modes; "
                    "full_step examples/s matches the matrix-of-record "
                    "entry."),
                "bf16_default": bf, "int8x8": i8,
            }
            out = os.path.join(repo, "SIMGCL_BREAKDOWN.json")
            with open(out, "w") as f:
                json.dump(merged, f, indent=2)
            log("wrote", out)
            all_results[tag] = i8
        else:
            all_results[tag] = run_model(tag, name, extra, nl, arms_fn,
                                         n_negs=n_negs, setup=setup)
    print(json.dumps({t: r["arms_ms"] for t, r in all_results.items()}))


if __name__ == "__main__":
    main()
