"""Probe whether the toolchain's Mosaic compiler can lower a dynamic gather.

The Pallas VMEM-resident SpMM kernel (ops/spmm_pallas.py) is blocked on a
libtpu bug: every ``dynamic_gather`` lowering (jnp.take inside a Pallas
kernel) either raises in the Mosaic pass or crashes/hangs the remote
compiler (measured 2026-08-17, BASELINE.md round-2). This probe keeps the
staged kernel's A/B one command away: run it after any toolchain move; if
it prints MOSAIC_GATHER_OK, re-run scripts/bench_bandwidth.py with a
Pallas arm and consider dispatching spmm_pallas from ops/graph.spmm.

The compile attempt runs in a SUBPROCESS with a timeout because the known
failure mode includes wedging the remote compiler — a hang must not take
the parent (or the chip's queue) down with it.

Usage: python scripts/probe_mosaic_gather.py [--timeout 120]
Exit code 0 = gather compiles and executes correctly; 1 = still broken.
"""

from __future__ import annotations

import argparse
import subprocess
import sys

PROBE_SRC = r"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

def kernel(idx_ref, table_ref, out_ref):
    # the minimal shape-preserving dynamic gather Mosaic must lower
    # (input == indices == output rows, the only form tpu.dynamic_gather
    # accepts); mirrors the inner step of ops/spmm_pallas.py
    out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

n, d = 256, 128
table = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)),
                    dtype=jnp.float32)
idx = jnp.asarray(np.random.default_rng(1).integers(0, n, size=n),
                  dtype=jnp.int32)
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
)(idx, table)
np.testing.assert_allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])
print("MOSAIC_GATHER_OK")
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=120)
    args = ap.parse_args()

    try:
        proc = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            capture_output=True, text=True, timeout=args.timeout,
        )
    except subprocess.TimeoutExpired:
        print("MOSAIC_GATHER_BROKEN: compile hung "
              f"(> {args.timeout}s — the known wedge mode)")
        return 1
    if proc.returncode == 0 and "MOSAIC_GATHER_OK" in proc.stdout:
        print("MOSAIC_GATHER_OK — toolchain lowers dynamic_gather; re-run "
              "scripts/bench_bandwidth.py with a Pallas arm "
              "(ops/spmm_pallas.py staging note)")
        return 0
    tail = (proc.stderr or proc.stdout).strip().splitlines()[-6:]
    print("MOSAIC_GATHER_BROKEN: compile failed")
    for line in tail:
        print("  " + line)
    return 1


if __name__ == "__main__":
    sys.exit(main())
