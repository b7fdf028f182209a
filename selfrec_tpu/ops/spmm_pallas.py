"""Pallas row-split ELL SpMM with a VMEM-resident embedding table.

The XLA formulation (ops/spmm_ell._ell_apply) gathers rows from an
HBM-resident table; round-1 measurements showed the chain is LATENCY-bound
(K-sweep flat between K=8..64, bf16 no faster than f32) — the memory system
is underutilized because every ELL slot pays an HBM random-access latency
for a 256-byte row. This kernel removes that latency from the inner loop:

- The full embedding table is staged HBM->VMEM ONCE per kernel launch
  (constant index map — Pallas keeps the block resident across the grid)
  and every gather is then a VMEM-local vector load.
- The ELL slot indices arrive pre-TRANSPOSED as (K, V) so each of the K
  unrolled steps does one contiguous (TILE_V,)-index row-gather
  (``jnp.take`` lowers to Mosaic's dynamic-gather) and a fused
  multiply-accumulate on the VPU — no (V, K, D) intermediate ever exists,
  in VMEM or HBM.
- The segment-sum over sorted virtual-row destinations stays outside the
  kernel (it is a cheap, already-fused XLA op over V rows).

Feasibility bound: an (n, D) table occupies n * roundup(D,128) * bytes
VMEM (lane padding). At yelp2018 scale (n=69,716, D=64) that is 17.9 MB
in f32 / 8.9 MB in bf16 — inside v5e VMEM; ``fits_vmem`` computes the
guard. (Reference hot op this targets: cuSPARSE spmm at
/root/reference/model/graph/LightGCN.py:72.)

STAGING STATUS: NOT wired into the production dispatch (ops/graph.spmm).
On the current libtpu every Mosaic ``dynamic_gather`` lowering either
raises or crashes/hangs the remote compiler (measured 2026-08-17, details
in BASELINE.md round-2 section), so only the interpret-mode correctness
tests exercise this kernel. When a newer toolchain lands: re-run
scripts/bench_bandwidth.py with a Pallas arm and, if it wins, dispatch
from ops/graph.spmm behind ``fits_vmem``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from selfrec_tpu.ops.spmm_ell import EllLayout

# Conservative per-core VMEM budget (bytes) for the resident table plus
# per-program blocks. v5e cores have 128 MiB VMEM; leave ample headroom for
# double-buffered index/weight blocks and the output.
VMEM_BUDGET = 96 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def table_vmem_bytes(n_rows: int, d: int, dtype) -> int:
    return n_rows * _round_up(d, 128) * jnp.dtype(dtype).itemsize


def fits_vmem(n_rows: int, d: int, dtype, budget: int = VMEM_BUDGET) -> bool:
    return table_vmem_bytes(n_rows, d, dtype) <= budget


def _spmm_kernel(vidx_ref, w_ref, x_ref, out_ref, *, k: int):
    """One grid step: TILE_V virtual rows.

    vidx_ref: (K, TILE_V) int32 — slot s of virtual row v at [s, v]
    w_ref:    (K, TILE_V) f32   — matching slot weights
    x_ref:    (n, D)            — whole table, VMEM-resident
    out_ref:  (TILE_V, D) f32   — partial sums (pre segment-sum)
    """
    acc = None
    for s in range(k):
        rows = jnp.take(x_ref[:], vidx_ref[s, :], axis=0)  # (TILE_V, D)
        term = rows.astype(jnp.float32) * w_ref[s, :][:, None]
        acc = term if acc is None else acc + term
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("k", "tile_v", "interpret"))
def _pallas_partial(
    vidx_t: jnp.ndarray,  # (K, Vpad) int32, slot-major
    w_t: jnp.ndarray,  # (K, Vpad) f32
    x: jnp.ndarray,  # (n, D)
    k: int,
    tile_v: int,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vpad = vidx_t.shape[1]
    n, d = x.shape
    grid = (vpad // tile_v,)
    kernel = functools.partial(_spmm_kernel, k=k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            # whole table; constant index map => staged once, stays resident
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_v, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((vpad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vidx_t, w_t, x)


class PallasEll:
    """Precomputed slot-major views of one EllLayout for the Pallas kernel.

    ``vidx_t``/``w_t`` are (K, Vpad) with Vpad rounded up to ``tile_v``; pad
    slots point at row 0 with weight 0 (same convention as the ELL build).
    """

    def __init__(self, layout: EllLayout, w: jnp.ndarray, tile_v: int = 512):
        v, k = layout.vdst.shape[0], layout.k
        vpad = _round_up(v, tile_v)
        vidx = layout.vidx.reshape(v, k)
        vidx_t = jnp.zeros((k, vpad), jnp.int32).at[:, :v].set(vidx.T)
        w_t = jnp.zeros((k, vpad), jnp.float32).at[:, :v].set(w.T)
        self.vidx_t = vidx_t
        self.w_t = w_t
        self.k = k
        self.v = v
        self.tile_v = tile_v
        self.vdst = layout.vdst
        self.n_rows = layout.n_rows

    def apply(self, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
        """SpMM forward: (n, D) -> (n_rows, D), f32 accumulate."""
        partial = _pallas_partial(
            self.vidx_t, self.w_t, x, self.k, self.tile_v, interpret
        )[: self.v]
        return jax.ops.segment_sum(
            partial, self.vdst, num_segments=self.n_rows, indices_are_sorted=True
        )
