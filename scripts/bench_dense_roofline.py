#!/usr/bin/env python
"""Close the dense-bipartite MXU roofline gap (VERDICT round-2 item 2).

Round 2 measured the int8-factored bidirectional pass at 9.0 ms for D=192 at
yelp2018 scale = 52% of the v5e MXU floor (4.70 ms @ 197 bf16 TFLOPS).
Diagnosed causes: the un-overlapped int8->bf16 convert-on-load, and the
operand layout change between the ``B @ x`` (user) and ``B.T @ x`` (item)
passes (ops/spmm_dense.py).

This script A/Bs the candidate fixes IN-LOOP (same methodology as
scripts/bench_bandwidth.py: REPS iterations inside one ``lax.fori_loop``
under one jit — a lone dispatch costs ~5x steady-state through the axon
tunnel):

- ``baseline``     : current dense_spmm factored path (astype -> dot, .T)
- ``xTB``          : item pass as ``(x_u' .T @ B).T`` — a (D,U)@(U,I)
                     matmul that streams B in its NATIVE (U,I) layout; no
                     transposed operand, zero extra memory
- ``pretransposed``: a second int8 buffer holding B.T (+U*I bytes, ~1.2 GB
                     at yelp scale) so the item pass is layout-native
- ``int8_direct``  : feed the int8 block straight to dot_general (no
                     explicit astype) — probes whether this toolchain has a
                     native int8-operand MXU path
- ``combined``     : xTB + pretransposed best-of both directions

Reference hot op this feeds: /root/reference/model/graph/LightGCN.py:72
(torch.sparse.mm of the normalized Laplacian) — the propagation inside
every LightGCN-family forward.

Writes DENSE_ROOFLINE.json. Usage:
    python scripts/bench_dense_roofline.py [--cpu] [--scale 1.0] [--d 192]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0
V5E_PEAK_GBS = 819.0
REPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--d", type=int, default=192)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from selfrec_tpu.ops.spmm_dense import dense_adj_from_edges
    from selfrec_tpu.utils.synth import (
        YELP2018_ITEMS, YELP2018_USERS, synth_graph_arrays,
    )

    dev = jax.devices()[0]
    log("device:", dev)

    n_users = max(int(YELP2018_USERS * args.scale), 50)
    n_items = max(int(YELP2018_ITEMS * args.scale), 60)
    tu, ti, _, _ = synth_graph_arrays(
        n_users, n_items, max(int(1561406 * args.scale), 500))
    du = np.bincount(tu, minlength=n_users).astype(np.float64)
    di = np.bincount(ti, minlength=n_items).astype(np.float64)
    w = (1.0 / np.sqrt(np.maximum(du[tu], 1.0) * np.maximum(di[ti], 1.0))
         ).astype(np.float32)
    adj = dense_adj_from_edges(tu, ti, w, n_users, n_items)
    assert adj.factored, "expected the int8-factored layout"
    d = args.d
    log(f"graph: U={n_users} I={n_items} nnz={len(tu)} D={d}")

    b8 = adj.a_ui
    # materialized B.T, transposed ON DEVICE (never crosses the tunnel)
    bt8 = jax.jit(lambda b: b.T.copy() if hasattr(b.T, "copy")
                  else jnp.array(b.T))(b8)
    jax.block_until_ready(bt8)
    log("built B.T on device")
    ru = adj.row_scale[:, None] * adj.gain
    ci = adj.col_scale[:, None]
    mmd = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.normal(size=(n_users + n_items, d)) * 0.01).astype(np.float32))

    # every arm takes the big buffers as ARGUMENTS — a closed-over device
    # array is baked into the program as a literal, and a 1.2 GB literal
    # blows the axon remote-compile request limit (HTTP 413); see
    # tests/test_models_e2e.py's adjacency-as-arg regression test.
    def baseline(b, bt, xx):
        xu, xi = xx[:n_users], xx[n_users:]
        bb = b.astype(mmd)
        out_u = ru * jnp.dot(bb, (ci * xi).astype(mmd),
                             preferred_element_type=jnp.float32)
        out_i = ci * jnp.dot(bb.T, (ru * xu).astype(mmd),
                             preferred_element_type=jnp.float32)
        return jnp.concatenate([out_u, out_i], 0).astype(xx.dtype)

    def xTB(b, bt, xx):
        xu, xi = xx[:n_users], xx[n_users:]
        bb = b.astype(mmd)
        out_u = ru * jnp.dot(bb, (ci * xi).astype(mmd),
                             preferred_element_type=jnp.float32)
        # (D, U) @ (U, I): streams B in its native layout
        ti_ = jnp.dot((ru * xu).astype(mmd).T, bb,
                      preferred_element_type=jnp.float32)
        out_i = ci * ti_.T
        return jnp.concatenate([out_u, out_i], 0).astype(xx.dtype)

    def pretransposed(b, bt, xx):
        xu, xi = xx[:n_users], xx[n_users:]
        out_u = ru * jnp.dot(b.astype(mmd), (ci * xi).astype(mmd),
                             preferred_element_type=jnp.float32)
        out_i = ci * jnp.dot(bt.astype(mmd), (ru * xu).astype(mmd),
                             preferred_element_type=jnp.float32)
        return jnp.concatenate([out_u, out_i], 0).astype(xx.dtype)

    def int8_direct(b, bt, xx):
        xu, xi = xx[:n_users], xx[n_users:]
        out_u = ru * jax.lax.dot_general(
            b, (ci * xi).astype(mmd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_i = ci * jax.lax.dot_general(
            b.T, (ru * xu).astype(mmd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.concatenate([out_u, out_i], 0).astype(xx.dtype)

    def combined(b, bt, xx):
        xu, xi = xx[:n_users], xx[n_users:]
        out_u = ru * jnp.dot(b.astype(mmd), (ci * xi).astype(mmd),
                             preferred_element_type=jnp.float32)
        ti_ = jnp.dot((ru * xu).astype(mmd).T, b.astype(mmd),
                      preferred_element_type=jnp.float32)
        out_i = ci * ti_.T
        return jnp.concatenate([out_u, out_i], 0).astype(xx.dtype)

    def int8_xTB(b, bt, xx):
        # s8 operand straight into both dots, item pass layout-native
        xu, xi = xx[:n_users], xx[n_users:]
        out_u = ru * jax.lax.dot_general(
            b, (ci * xi).astype(mmd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ti_ = jax.lax.dot_general(
            (ru * xu).astype(mmd).T, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_i = ci * ti_.T
        return jnp.concatenate([out_u, out_i], 0).astype(xx.dtype)

    def timed(fn, *a, reps=3):
        # IMPORTANT: through the axon tunnel block_until_ready can return
        # before the computation actually finishes — fetching a result
        # slice is the only honest completion barrier (same finding as
        # bench.py round 3).
        _ = np.asarray(fn(*a)[:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(fn(*a)[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    def inloop(stage_fn, x0):
        # marginal-REPS timing: run the loop at REPS and 2*REPS and take
        # the difference, cancelling the fixed dispatch+fetch overhead
        def make(reps):
            @jax.jit
            def f(b, bt, xx):
                def body(_, acc):
                    return stage_fn(b, bt, acc) * 0.999
                return jax.lax.fori_loop(0, reps, body, xx)
            return f
        t1 = timed(make(REPS), b8, bt8, x0)
        t2 = timed(make(2 * REPS), b8, bt8, x0)
        return (t2 - t1) / REPS

    flops = 2 * 2 * n_users * n_items * d  # two matmuls, 2*M*N*K each
    mxu_floor_ms = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
    hbm_floor_ms = 2 * n_users * n_items / (V5E_PEAK_GBS * 1e9) * 1e3
    results = {"platform": dev.platform, "U": n_users, "I": n_items,
               "nnz": int(len(tu)), "D": d, "reps_in_loop": REPS,
               "mxu_floor_ms": round(mxu_floor_ms, 2),
               "hbm_floor_ms_int8": round(hbm_floor_ms, 2), "arms": {}}

    # numerical cross-check vs baseline (device-side max-abs diff; only the
    # scalar crosses the tunnel)
    ref_fn = jax.jit(baseline)
    ref_out = ref_fn(b8, bt8, x)
    ref_max = float(jnp.max(jnp.abs(ref_out)))
    arms = {"baseline": baseline, "xTB": xTB, "pretransposed": pretransposed,
            "int8_direct": int8_direct, "combined": combined,
            "int8_xTB": int8_xTB}
    for name, fn in arms.items():
        try:
            got = jax.jit(fn)(b8, bt8, x)
            err = float(jnp.max(jnp.abs(got - ref_out))) / max(ref_max, 1e-30)
            dt = inloop(fn, x)
            row = {"time_ms": round(dt * 1e3, 3),
                   "pct_of_mxu_floor": round(100 * mxu_floor_ms / (dt * 1e3), 1),
                   "max_rel_err_vs_baseline": float(f"{err:.2e}")}
        except Exception as e:  # e.g. int8 dot unsupported on this toolchain
            row = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        results["arms"][name] = row
        log(f"{name:>14}: {row}")

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DENSE_ROOFLINE.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    log("wrote", out_path)
    print(json.dumps({k: v.get("time_ms") for k, v in results["arms"].items()}))


if __name__ == "__main__":
    main()
