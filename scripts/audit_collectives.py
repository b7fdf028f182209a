"""Audit the collectives GSPMD inserts for the multi-chip training step.

VERDICT round-1 item 2: nobody ever inspected what the compiler actually does
with the model-axis row-sharded embedding tables — the ELL gather
``src[layout.vidx]`` may all-gather the FULL table per layer, destroying the
sharded-SpMM story at scale.

Lowers the real jitted epoch function (models/base.py _make_epoch_fn) for the
tiny SimGCL from __graft_entry__ on an 8-virtual-CPU-device (data=4, model=2)
mesh, then counts collective ops and their payload bytes in the optimized HLO.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/audit_collectives.py [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s64": 8,
               "u64": 8, "pred": 1, "s8": 1, "u8": 1, "f64": 8}

COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
               "collective-permute")


def shape_bytes(shape_str: str) -> int:
    """'f32[3904,32]' -> bytes. Tuple shapes sum their parts."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


_COLLECTIVE_RE = re.compile(
    # '<name> = <shape> <op>(' — shape may be a tuple '(f32[..], f32[..])'
    # (XLA's all-reduce combiner) and the name may carry a ROOT prefix;
    # async pairs appear as op-start/op-done (count -start, skip -done to
    # avoid double counting the same payload).
    r"=\s+(\([^)]*\)|\S+?)\s+"
    r"(all-gather|all-reduce|reduce-scatter|all-to-all|collective-permute)"
    r"(-start|-done)?\("
)


def audit_hlo(hlo_text: str) -> dict:
    counts: dict = {}
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        out_shape, op, suffix = m.group(1), m.group(2), m.group(3)
        if suffix == "-done":
            continue
        b = shape_bytes(out_shape)
        rec = counts.setdefault(op, {"count": 0, "bytes": 0, "largest": 0,
                                     "largest_shape": ""})
        rec["count"] += 1
        rec["bytes"] += b
        if b > rec["largest"]:
            rec["largest"] = b
            rec["largest_shape"] = out_shape
    return counts


def audit_epoch(model) -> dict:
    """Lower the exact run_epoch(0) call and count collectives in the
    optimized HLO."""
    from selfrec_tpu.ops import sampling
    from selfrec_tpu.parallel import mesh as mesh_lib

    epoch_fn = model._make_epoch_fn()
    users, items, masks = sampling.epoch_pairwise_batches(
        model.epoch_rng(0), model.data.edge_users, model.data.edge_items,
        model.batch_size)
    aux = model.epoch_setup(0)
    users, items, masks = map(jnp.asarray, (users, items, masks))
    sb = mesh_lib.scan_batch_sharding(model.mesh)
    users, items, masks = (jax.device_put(users, sb), jax.device_put(items, sb),
                           jax.device_put(masks, sb))

    lowered = epoch_fn.lower(model.params, model.opt_state, model.key, aux,
                             users, items, masks, model._scan_consts())
    return audit_hlo(lowered.compile().as_text())


def main():
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8")

    import __graft_entry__ as ge

    model = ge._make_model(mesh_conf={"data": 4, "model": 2})
    n_u, n_i, d = model.data.user_num, model.data.item_num, model.emb_size
    counts = audit_epoch(model)
    table_bytes = (n_u + n_i) * d * 4
    full_table_ag = [
        (op, rec) for op, rec in counts.items()
        if op == "all-gather" and rec["largest"] >= table_bytes
    ]

    # the sharded dense path (parallel/dense_shard.py): collectives must be
    # embedding-block-sized — never the (U, I) dense block
    os.environ["SELFREC_TPU_DENSE"] = "1"
    try:
        from selfrec_tpu.parallel.dense_shard import ShardedDenseAdj

        dmodel = ge._make_model(mesh_conf={"data": 4, "model": 2})
        assert isinstance(dmodel.adj, ShardedDenseAdj), type(dmodel.adj)
        dense_counts = audit_epoch(dmodel)
        # the invariant that matters at scale: every collective payload is
        # bounded by an embedding BLOCK (rows x packed-width x f32) — the
        # propagation never ships anything proportional to U*I. SimGCL's
        # fused chain is 3 packed passes wide.
        emb_block_bound = max(dmodel.adj.u_pad, dmodel.adj.i_pad) * 3 * d * 4
        oversized = [
            (op, rec["largest_shape"]) for op, rec in dense_counts.items()
            if rec["largest"] > emb_block_bound * 1.5
        ]
    finally:
        os.environ.pop("SELFREC_TPU_DENSE", None)

    report = {
        "mesh": {"data": 4, "model": 2},
        "model_shape": {"users": n_u, "items": n_i, "emb": d,
                        "full_table_bytes": table_bytes},
        "collectives": counts,
        "full_table_all_gather": bool(full_table_ag),
        "sharded_dense": {
            "collectives": dense_counts,
            "emb_block_bound_bytes": emb_block_bound,
            "oversized_collectives": oversized,
        },
    }
    print(json.dumps(report, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
