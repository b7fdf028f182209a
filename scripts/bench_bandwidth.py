#!/usr/bin/env python
"""HBM-bandwidth accounting + Pallas A/B for the ELL SpMM hot path
(VERDICT round-1 item 1).

Builds the yelp2018-scale normalized bipartite adjacency (the SimGCL hot
op's exact shape), then times isolated jitted pieces on the current
platform and reports achieved application-level HBM bytes/s against the
v5e peak (819 GB/s):

- ``gather``        : x[vidx]            — the raw latency-bound step
- ``xla_spmm``      : full _ell_apply    — gather + einsum + segment-sum
- ``xla_packed3``   : width-3D packed apply (the fused-SimGCL inner op)
- ``pallas_spmm``   : VMEM-resident-table kernel + segment-sum
- ``pallas_packed3``: same kernel at D=192

Byte accounting is app-level minimum useful traffic (each ELL slot must
read one D-row + write the output once; index/weight reads included).
Cache reuse can only make true HBM traffic LOWER, so achieved/peak is a
LOWER bound on memory-system utilization — if it is far below 1 the op is
latency-bound and a resident-table kernel has headroom.

Writes BANDWIDTH.json at the repo root. Usage:
    python scripts/bench_bandwidth.py [--cpu] [--k 16] [--d 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_GBS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink the synthetic graph (CPU smoke testing)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from selfrec_tpu.ops import spmm_ell
    from selfrec_tpu.utils.synth import (
        YELP2018_ITEMS, YELP2018_USERS, synth_graph_arrays,
    )

    dev = jax.devices()[0]
    log("device:", dev)
    platform = dev.platform

    n_users = max(int(YELP2018_USERS * args.scale), 50)
    n_items = max(int(YELP2018_ITEMS * args.scale), 60)
    tu, ti, _, _ = synth_graph_arrays(
        n_users, n_items, max(int(1561406 * args.scale), 500))
    n = n_users + n_items
    # symmetric normalized bipartite edges (both directions), like
    # Interaction.norm_adj feeding norm_adj_from_scipy
    import scipy.sparse as sp

    r = sp.coo_matrix(
        (np.ones(len(tu), np.float32), (tu, ti)), shape=(n_users, n_items)
    )
    adj = sp.bmat([[None, r], [r.T, None]], format="coo")
    deg = np.asarray(adj.sum(axis=1)).ravel()
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[adj.row] * dinv[adj.col]).astype(np.float32)

    layout, _ = spmm_ell.build_ell_layout(adj.col, adj.row, n, k=args.k)
    w_ell = spmm_ell.ell_weights(layout, jnp.asarray(w))
    v, k, d = layout.vdst.shape[0], args.k, args.d
    log(f"graph: n={n} nnz={adj.nnz} V={v} K={k} D={d}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(size=(n, 3 * d)).astype(np.float32))

    results = {"platform": platform, "n": n, "nnz": int(adj.nnz), "V": v,
               "K": k, "D": d, "ops": {}}

    def record(name, dt, bytes_min, extra=None):
        gbs = bytes_min / dt / 1e9
        row = {
            "time_ms": round(dt * 1e3, 3),
            "bytes_min_MB": round(bytes_min / 1e6, 1),
            "achieved_GBs": round(gbs, 1),
            "pct_of_v5e_peak": round(100 * gbs / V5E_PEAK_GBS, 1),
        }
        if extra:
            row.update(extra)
        results["ops"][name] = row
        log(f"{name:>16}: {row}")

    slot_bytes = 4  # int32 index
    # --- raw gather ---
    gather = jax.jit(lambda xx: xx[layout.vidx])
    dt, _ = timed(gather, x)
    # reads: V*K rows of D f32 + V*K int32 idx; writes (V*K, D)
    b = v * k * d * 4 + v * k * slot_bytes + v * k * d * 4
    record("gather_d64", dt, b)

    # --- full XLA spmm ---
    spmm1 = jax.jit(lambda xx: spmm_ell._ell_apply(layout, w_ell, xx))
    dt, out1 = timed(spmm1, x)
    # minimum useful: read V*K rows + idx + weights, write n_rows out
    b = v * k * d * 4 + v * k * (slot_bytes + 4) + n * d * 4
    record("xla_spmm_d64", dt, b)

    # --- packed 3-pass (fused-SimGCL inner op) ---
    w_stack = jnp.stack([w_ell, w_ell, w_ell])
    packed = jax.jit(
        lambda xx: spmm_ell._ell_apply_packed(layout, w_stack, xx, 3)
    )
    dt, out3 = timed(packed, x3)
    b = v * k * 3 * d * 4 + v * k * (slot_bytes + 3 * 4) + n * 3 * d * 4
    record("xla_packed3_d192", dt, b)

    if not args.no_pallas:
        from selfrec_tpu.ops.spmm_pallas import PallasEll

        interp = platform != "tpu"
        pe = PallasEll(layout, w_ell, tile_v=512)
        try:
            dt, pout1 = timed(
                jax.jit(lambda xx: pe.apply(xx, interpret=interp)), x,
                reps=2 if interp else 5)
            err = float(jnp.max(jnp.abs(pout1 - out1)))
            # HBM traffic: table staged once + idx/w + out write
            b = n * d * 4 + v * k * (slot_bytes + 4) + n * d * 4
            record("pallas_spmm_d64", dt, b, {"max_abs_err_vs_xla": err})
        except Exception as e:  # Mosaic lowering may reject; report it
            log("pallas d64 FAILED:", repr(e)[:500])
            results["ops"]["pallas_spmm_d64"] = {"error": repr(e)[:500]}

        # packed: one layout, 3 weight planes == weights tiled over a 3D-wide
        # table; reuse the same kernel with x3 and per-pass weights equal
        # (w identical across passes here, matching the timing shape only)
        try:
            pe3 = PallasEll(layout, w_ell, tile_v=512)
            dt, pout3 = timed(
                jax.jit(lambda xx: pe3.apply(xx, interpret=interp)), x3,
                reps=2 if interp else 5)
            err = float(jnp.max(jnp.abs(pout3 - out3)))
            b = n * 3 * d * 4 + v * k * (slot_bytes + 4) + n * 3 * d * 4
            record("pallas_packed3_d192", dt, b, {"max_abs_err_vs_xla": err})
        except Exception as e:
            log("pallas d192 FAILED:", repr(e)[:500])
            results["ops"]["pallas_packed3_d192"] = {"error": repr(e)[:500]}

        # bf16 table variant (halves resident footprint and gather traffic)
        try:
            dt, pout1b = timed(
                jax.jit(lambda xx: pe.apply(xx.astype(jnp.bfloat16),
                                            interpret=interp)), x,
                reps=2 if interp else 5)
            err = float(jnp.max(jnp.abs(pout1b - out1)))
            b = n * d * 2 + v * k * (slot_bytes + 4) + n * d * 4
            record("pallas_spmm_d64_bf16", dt, b, {"max_abs_err_vs_xla": err})
        except Exception as e:
            log("pallas bf16 FAILED:", repr(e)[:500])
            results["ops"]["pallas_spmm_d64_bf16"] = {"error": repr(e)[:500]}

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BANDWIDTH.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    log("wrote", out_path)
    print(json.dumps({k2: v2.get("achieved_GBs") for k2, v2 in
                      results["ops"].items() if "achieved_GBs" in v2}))


if __name__ == "__main__":
    main()
