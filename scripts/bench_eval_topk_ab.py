#!/usr/bin/env python
"""Eval top-k A/B (VERDICT r4 item 7): EVAL_ROOFLINE.json isolated the
full-rank eval's terms as matmul ~2 ms (MXU floor), dense rated-mask
~2 ms, and top_k ~100 ms per eval — the one non-floor term left. Round 3
A/B'd chunked two-stage top_k, bf16 top_k and chunk-max filtering as
in-code notes (ops/ranking.py:261); this script re-runs the candidates at
the PRODUCTION shape (the real 31-block lax.scan over (1024, 38048)
score blocks, dense rated-mask, marginal-REPS) and RECORDS the verdict
as an artifact (EVAL_TOPK_AB.json).

Arms (full eval pass each):
- no_topk         : matmul + mask only (isolates the top_k share)
- native          : jax.lax.top_k (production)
- two_stage_1024  : per-1024-column-block top_k, then top_k over the
                    merged (n_blocks * k) candidates (EXACT — a global
                    top-20 item is a top-20 item of its column block)
- two_stage_4096  : same at 4096-column blocks
- approx95        : lax.approx_max_k recall_target=0.95 (the opt-in
                    SELFREC_TPU_EVAL_TOPK=approx:0.95 path; NOT exact)

Usage: python scripts/bench_eval_topk_ab.py [--cpu] [--reps 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()
    reps = args.reps

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    U = max(int(31667 * args.scale), 64)
    I = max(int(38048 * args.scale), 64)
    B, D, K = min(1024, U), 64, 20
    n_blocks = U // B
    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.normal(size=(n_blocks, B, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    # dense rated mask rows, ~45 rated items per user (yelp density)
    rated = jnp.asarray(
        (rng.random((n_blocks * B, I)) < 45.0 / I).astype(np.int8))
    dev = jax.devices()[0]
    log("device:", dev, f"U={U} I={I} blocks={n_blocks}x{B}")

    def two_stage(cols):
        n_pad = (-I) % cols

        def f(s):
            sp = jnp.pad(s, ((0, 0), (0, n_pad)),
                         constant_values=-jnp.inf)
            blocks = sp.reshape(B, -1, cols)
            bs, bi = jax.lax.top_k(blocks, K)
            base = (jnp.arange(blocks.shape[1]) * cols)[None, :, None]
            cand_s = bs.reshape(B, -1)
            cand_i = (bi + base).reshape(B, -1)
            ts, ti = jax.lax.top_k(cand_s, K)
            return ts, jnp.take_along_axis(cand_i, ti, axis=1)
        return f

    topks = {
        "no_topk": lambda s: (s[:, :K], jnp.zeros((B, K), jnp.int32)),
        "native": lambda s: jax.lax.top_k(s, K),
        "two_stage_1024": two_stage(1024),
        "two_stage_4096": two_stage(4096),
        "approx95": lambda s: jax.lax.approx_max_k(
            s, K, recall_target=0.95),
    }

    def eval_pass(arm, uu, vv, rated_arg):
        """The production scan shape: ops/ranking._topk_all_blocks_dense.
        ``rated_arg`` is threaded as an ARGUMENT — a closure-constant
        1.2 GB mask bakes into the HLO and blows the axon remote-compile
        body limit (HTTP 413)."""
        def step(c, blk):
            bi, ub = blk
            scores = jnp.dot(ub * (1 + c * 1e-30), vv.T,
                             preferred_element_type=jnp.float32)
            scores = jnp.where(
                jax.lax.dynamic_slice_in_dim(rated_arg, bi * B, B, 0) != 0,
                -1e9, scores)
            ts, ti = topks[arm](scores)
            return c + jnp.sum(ts[:, :1]) * 1e-9 + jnp.sum(
                ti[:, :1]).astype(jnp.float32) * 1e-12, None

        c, _ = jax.lax.scan(
            step, jnp.float32(0),
            (jnp.arange(n_blocks, dtype=jnp.int32), uu))
        return c

    # correctness: two-stage matches native exactly (same masked scores)
    s0 = jnp.where(rated[:B] != 0, -1e9,
                   jnp.dot(ue[0], v.T, preferred_element_type=jnp.float32))
    ref_ids = np.sort(np.asarray(topks["native"](s0)[1]), axis=1)
    exact = {}
    for name in ("two_stage_1024", "two_stage_4096"):
        ids = np.sort(np.asarray(topks[name](s0)[1]), axis=1)
        exact[name] = bool(np.array_equal(ids, ref_ids))
        log(f"{name} exact: {exact[name]}")

    def timed(fn, *a):
        def fetch():
            return np.asarray(
                jax.tree_util.tree_leaves(fn(*a))[0]).ravel()[:1]
        fetch()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fetch()
            best = min(best, time.perf_counter() - t0)
        return best

    made = {}

    def marginal(arm):
        def t(n):
            if (arm, n) not in made:
                @jax.jit
                def f(uu, vv, rr):
                    def body(i, carry):
                        return carry + eval_pass(
                            arm, uu * (1 + carry * 1e-30), vv, rr)
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
                made[(arm, n)] = f
            return timed(made[(arm, n)], ue, v, rated)
        return (t(2 * reps) - t(reps)) / reps

    results = {"platform": dev.platform, "U": U, "I": I, "k": K,
               "n_blocks": n_blocks, "reps_in_loop": reps, "exact": exact,
               "arms_ms_per_eval": {}}
    for name in topks:
        ms = marginal(name) * 1e3
        results["arms_ms_per_eval"][name] = round(ms, 2)
        log(f"  {name:15s} {ms:8.2f} ms/eval ({n_blocks} blocks)")
    a = results["arms_ms_per_eval"]
    results["topk_share_ms"] = round(a["native"] - a["no_topk"], 2)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "EVAL_TOPK_AB.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
