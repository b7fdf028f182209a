#!/usr/bin/env python
"""HBM-bandwidth accounting for the ELL SpMM hot path (VERDICT round-1
item 1; full analysis in BASELINE.md round-2 section).

IMPORTANT methodology: a single isolated ``jit`` dispatch of these ops
costs ~5x its steady-state in-scan time (57ms vs 11ms at D=64 on the
axon-tunneled v5e; RTT is only 0.1ms). Every op here is therefore timed
as REPS iterations inside ONE ``lax.fori_loop`` under one jit call —
matching how the op runs inside the real epoch scan.

Ops, at the exact yelp2018-scale shape of the SimGCL hot op:
- ``gather_sum``   : x[vidx] + slot-sum        — the raw gather chain
- ``xla_spmm``     : full _ell_apply           — gather + einsum + segsum
- both at D=64 (single chain) and D=192 (fused-SimGCL width)

The Pallas VMEM-resident-table kernel (ops/spmm_pallas.py) is correctness
-tested in interpret mode but NOT benchmarked here: every Mosaic
``dynamic_gather`` lowering crashes or hangs this libtpu's remote
compiler (see BASELINE.md). Re-add it to this A/B when the toolchain
catches up.

Byte accounting is app-level minimum useful traffic; cache reuse can only
lower true HBM traffic, so achieved/peak is a lower bound on utilization.

Writes BANDWIDTH.json. Usage:
    python scripts/bench_bandwidth.py [--cpu] [--k 16] [--scale 1.0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_GBS = 819.0
REPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink the synthetic graph (CPU smoke testing)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from selfrec_tpu.ops import spmm_ell
    from selfrec_tpu.utils.synth import (
        YELP2018_ITEMS, YELP2018_USERS, synth_graph_arrays,
    )

    dev = jax.devices()[0]
    log("device:", dev)

    n_users = max(int(YELP2018_USERS * args.scale), 50)
    n_items = max(int(YELP2018_ITEMS * args.scale), 60)
    tu, ti, _, _ = synth_graph_arrays(
        n_users, n_items, max(int(1561406 * args.scale), 500))
    n = n_users + n_items
    r = sp.coo_matrix(
        (np.ones(len(tu), np.float32), (tu, ti)), shape=(n_users, n_items)
    )
    adj = sp.bmat([[None, r], [r.T, None]], format="coo")
    deg = np.asarray(adj.sum(axis=1)).ravel()
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[adj.row] * dinv[adj.col]).astype(np.float32)

    layout, _ = spmm_ell.build_ell_layout(adj.col, adj.row, n, k=args.k)
    w_ell = spmm_ell.ell_weights(layout, jnp.asarray(w))
    v, k = layout.vdst.shape[0], args.k
    log(f"graph: n={n} nnz={adj.nnz} V={v} K={k}")

    def timed(fn, *a, reps=3):
        out = fn(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    def inloop(stage_fn, x0):
        @jax.jit
        def f(x):
            def body(_, acc):
                return stage_fn(acc) * 0.999  # defeat loop-invariant hoist
            return jax.lax.fori_loop(0, REPS, body, x)

        return timed(f, x0) / REPS

    results = {"platform": dev.platform, "n": n, "nnz": int(adj.nnz),
               "V": v, "K": k, "reps_in_loop": REPS, "ops": {}}

    def record(name, dt, bytes_min):
        gbs = bytes_min / dt / 1e9
        row = {
            "time_ms": round(dt * 1e3, 3),
            "bytes_min_MB": round(bytes_min / 1e6, 1),
            "achieved_GBs": round(gbs, 1),
            "pct_of_v5e_peak": round(100 * gbs / V5E_PEAK_GBS, 1),
        }
        results["ops"][name] = row
        log(f"{name:>18}: {row}")

    rng = np.random.default_rng(0)
    for d in (64, 192):
        x = jnp.asarray((rng.normal(size=(n, d)) * 0.01).astype(np.float32))
        t = inloop(
            lambda acc, d=d: acc[layout.vidx].reshape(v, k, d).sum(axis=1)[:n],
            x,
        )
        b = v * k * d * 4 + v * k * 4 + n * d * 4
        record(f"gather_sum_d{d}", t, b)
        t = inloop(lambda acc: spmm_ell._ell_apply(layout, w_ell, acc), x)
        b = v * k * d * 4 + v * k * (4 + 4) + n * d * 4
        record(f"xla_spmm_d{d}", t, b)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BANDWIDTH.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    log("wrote", out_path)
    print(json.dumps({k2: v2["achieved_GBs"] for k2, v2 in
                      results["ops"].items()}))


if __name__ == "__main__":
    main()
