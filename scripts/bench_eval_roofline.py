#!/usr/bin/env python
"""Eval-scan roofline (VERDICT r3 item 9).

The bench matrix's eval workload records rank=1.139s at yelp2018 scale
(31.7k test users x 38k items, D=64, k=20). Round 3's approx_max_k A/B
already showed the DEVICE scan is ~0.25s steady-state; this script closes
the accounting — where do the other ~0.9s and the 0.25s itself go?

Terms isolated (marginal-REPS in-loop where device-side, wall where host):

- ``h2d``          : device_put of the two embedding tables (the tunnel
                     link, not HBM, at this box)
- ``matmul``       : scan over blocks, scores = U_blk @ I^T only
- ``matmul_mask``  : + rated-pair scatter mask
- ``full``         : + lax.top_k (the production _topk_all_blocks)
- ``fetch``        : D2H of the (n_blocks, B, k) id/score stack
- block sizes swept: fewer, bigger blocks amortize per-step overheads

Floors at (31.7k x 38k, D=64, f32): matmul 2*U*I*D = 154 GFLOP; scores
write+read = 2 * U*I*4 bytes = 9.6 GB -> 11.8 ms at 819 GB/s.

Reference being replaced: per-user GPU matmul + D2H + numba heap loop
(/root/reference/base/graph_recommender.py:38-58).

Writes EVAL_ROOFLINE.json. Usage:
    python scripts/bench_eval_roofline.py [--cpu] [--scale 1.0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_F32_TFLOPS = 197.0 / 4  # MXU f32 via 3-pass emulation, conservative
V5E_PEAK_GBS = 819.0
REPS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bench import _graph_conf
    from selfrec_tpu.data.interaction import Interaction
    from selfrec_tpu.ops import ranking
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
    data = Interaction(_graph_conf("MF", {}), train, test)
    nu, ni, d, k = data.user_num, data.item_num, 64, args.k
    rng = np.random.default_rng(0)
    ue_h = rng.normal(size=(nu, d)).astype(np.float32)
    ie_h = rng.normal(size=(ni, d)).astype(np.float32)
    log(f"eval: {len(data.test_user_ids)} test users x {ni} items, "
        f"D={d} k={k}")

    # --- h2d + fetch (wall-clock; these ride the tunnel, not HBM) --------
    def timed_wall(fn, reps=3):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def h2d():
        u = jax.device_put(ue_h)
        i = jax.device_put(ie_h)
        np.asarray(u[0, :1]), np.asarray(i[0, :1])

    t_h2d = timed_wall(h2d)
    ue = jax.device_put(jnp.asarray(ue_h))
    ie = jax.device_put(jnp.asarray(ie_h))

    results = {"platform": dev.platform, "test_users": len(data.test_user_ids),
               "items": ni, "D": d, "k": k,
               "mxu_floor_ms_f32": round(
                   2 * len(data.test_user_ids) * ni * d
                   / (V5E_F32_TFLOPS * 1e12) * 1e3, 2),
               "hbm_floor_ms_scores_rw": round(
                   2 * len(data.test_user_ids) * ni * 4
                   / (V5E_PEAK_GBS * 1e9) * 1e3, 2),
               "h2d_s": round(t_h2d, 3),
               "block_sizes": {}}

    def timed_dev(fn, *a, reps=3):
        def fetch():
            return np.asarray(
                jax.tree_util.tree_leaves(fn(*a))[0]).ravel()[:1]
        fetch()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch()
            best = min(best, time.perf_counter() - t0)
        return best

    from functools import partial

    for bs in (1024, 4096, 8192):
        plan = ranking.get_eval_plan(data, bs)
        uids, rows, cols = plan.uids_all, plan.rows_all, plan.cols_all
        n_blocks = uids.shape[0]

        @partial(jax.jit, static_argnames=("mode", "loops"))
        def scan_arm(u, i, uu, rr, cc, mode="full", loops=1):
            def one_pass(carry):
                # thread the carry into the matmul operand: without a data
                # dependence XLA hoists the whole (loop-invariant) scan out
                # of the fori_loop and the marginal cost measures zero
                u_dep = u * (1.0 + carry * 1e-30)

                def step(_, blk):
                    bu, br, bc = blk
                    scores = jnp.dot(u_dep[bu], i.T,
                                     preferred_element_type=jnp.float32)
                    if mode != "matmul":
                        scores = scores.at[br, bc].set(
                            ranking.MASK_VALUE, mode="drop")
                    if mode == "full":
                        ts, ti = jax.lax.top_k(scores, k)
                        return 0, (ts.sum(), ti.astype(jnp.int32).sum())
                    return 0, (scores.sum(), jnp.int32(0))
                _, (a_, b_) = jax.lax.scan(step, 0, (uu, rr, cc))
                return carry + a_.sum() + b_.sum().astype(jnp.float32)
            return jax.lax.fori_loop(
                0, loops, lambda _, c: one_pass(c) * 0.5, jnp.float32(0))

        arms = {}
        for mode in ("matmul", "matmul_mask", "full"):
            t1 = timed_dev(scan_arm, ue, ie, uids, rows, cols, mode, REPS)
            t2 = timed_dev(scan_arm, ue, ie, uids, rows, cols, mode, 2 * REPS)
            arms[mode] = round((t2 - t1) / REPS * 1e3, 1)
            log(f"  bs={bs:5d} {mode:12s} {arms[mode]:8.1f} ms (in-loop)")

        # the production call end-to-end (dispatch + device + fetch ids)
        def production():
            ids = ranking.topk_ids_from_embeddings(data, ue, ie, k,
                                                   block_size=bs)
            assert ids.shape[0] == len(plan.user_ids)
        t_prod = timed_wall(production)
        log(f"  bs={bs:5d} production  {t_prod * 1e3:8.1f} ms (wall, incl "
            f"dispatch+fetch)")
        results["block_sizes"][bs] = {
            "n_blocks": int(n_blocks), "arms_in_loop_ms": arms,
            "production_wall_ms": round(t_prod * 1e3, 1),
            "topk_ms": round(arms["full"] - arms["matmul_mask"], 1),
            "mask_ms": round(arms["matmul_mask"] - arms["matmul"], 1),
        }

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EVAL_ROOFLINE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    log("wrote", out)


if __name__ == "__main__":
    main()
