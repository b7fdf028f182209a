"""Dual-direction dense bipartite propagation kernel (Pallas TPU).

One LightGCN layer over the dense bipartite block needs BOTH directions:

    out_u = B @ xi        (U, I) x (I, D)
    out_i = B.T @ xu      (I, U) x (U, D)

The XLA formulation (ops/spmm_dense) issues two independent
``dot_general``s, each streaming the full (U, I) block from HBM — at
yelp2018 scale and the production embedding width (D=64,
reference conf/*.yaml ``embedding.size: 64``) that is 2 x 1.2 GB per
layer and the pass is HBM-BOUND at the two-read floor (round-5 step
breakdowns: NCL prop_fwd 8.36 ms vs the 2*3*1.47 ms floor;
DUAL_KERNEL.json xla_two_dot_ms ~2.9-3.4 vs 2.94). This kernel reads
each block tile ONCE and feeds it to both dots.

Measured regimes at yelp scale (DUAL_KERNEL.json, marginal-REPS):

- **int8x8 quantized mode, D=64** (s8 incidence x s8 per-channel-quantized
  operand, s32-exact accumulate): XLA two-dot 3.0 ms -> dual **1.96 ms**
  (1.55x) — int8 MXU peak (394 TOPS) keeps the fused kernel's compute
  under the single-read HBM floor. THIS is the production use; gated to
  ``SELFREC_TPU_DENSE_DTYPE=int8`` (convergence-gated per model,
  PARITY.md "Quantized-mode convergence") at D <= DUAL_MAX_D.
- **int8x8, D=192** (SimGCL's stacked 3-view chain): 3.86 -> 3.32 ms
  (1.16x) standalone, but end-to-end inside the epoch scan the simgcl
  step REGRESSED (81k -> 66k ex/s) — gated OFF (DUAL_MAX_D = 128).
- **bf16, D=64**: XLA already sits ON the two-read floor (2.9 ms) and the
  fused kernel is COMPUTE-bound at D=64's half-lane MXU utilization
  (4.3-4.8 ms measured; bf16 compute floor 2 * 1.57 ms at 50% util) —
  negative result, XLA stays.
- **bf16, D=192**: MXU-bound; sharing the read buys nothing (the round-3
  dual-kernel rejection, reconfirmed) — XLA stays.

Kernel layout — grid = (U-chunks, I-tiles, U-tiles-within-chunk); the
scoped-VMEM limit on this toolchain is 16 MB so nothing full-size can
stay resident:

- ``out_u`` is blocked per U-CHUNK (constant index within a chunk): the
  chunk accumulator stays in VMEM across the whole (gi, gu) sweep and
  flushes when the chunk advances.
- ``out_i`` is blocked by the I-tile and ALIAS-ACCUMULATED through HBM
  across chunks (``input_output_aliases``): at each chunk it is
  re-fetched, added to, and re-flushed — n_chunks * I * 512 bytes of
  extra traffic (~0.1 ms at yelp scale) instead of an impossible VMEM
  residency.
- The item-direction dot is the TRANSPOSE-FREE form
  ``(xu_blk^T-contract tile).T``: contracting both operands on dim 0
  avoids Mosaic materializing a (TU, TI) tile transpose per step
  (measured 2.65 -> 2.18 ms at the 1024x4096 tiling) and the small
  (D, TI) result transpose is VPU-cheap.
- b's block index map CLAMPS at the array's real block count: the
  chunk-padded grid can exceed it, and fully out-of-bounds block fetches
  crash the TPU worker. Clamped (duplicate) tiles multiply zero-padded
  xu rows -> zero contribution; their out_u rows are the sliced-off pad
  region. Partial edge tiles contribute unspecified-but-FINITE values
  (int8) that multiply zero-padded operand rows -> exact.

VJP: d/dxu = B @ g_i and d/dxi = B.T @ g_u — exactly ``dual_matmul(b,
g_u, g_i)`` again, so forward and backward share one kernel (the block
is constant; its tangent is float0, matching spmm_dense's convention).

Replaces (TPU-native redesign, not a translation): the reference's
per-model ``torch.sparse.mm(norm_adj, E)`` calls, e.g.
/root/reference/model/graph/LightGCN.py:72, NCL.py:155, MixGCF.py:76.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# production gate: int8x8 mode only (bf16 loses to XLA — see module
# docstring) at D <= 128. D=192 (SimGCL's stacked 3-view chain) measured
# 1.16x standalone (DUAL_KERNEL.json) but REGRESSED end-to-end inside the
# epoch scan (simgcl int8x8 81k -> 66k ex/s) — XLA stays there.
DUAL_MAX_D = 128
_TU = 2048  # U-tile (inner grid axis)
_TI = 2048  # I-tile (middle grid axis)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk_rows(d: int) -> int:
    """U-chunk rows for the VMEM-resident out accumulator. Empirical
    table (scoped-VMEM limit 16 MB; values measured to compile+run at
    yelp scale, /tmp sweep logs -> DUAL_KERNEL.json): lane-padded D=128
    -> 8192 rows (4.2 MB) alongside the 2x4 MB double-buffered tiles."""
    d_pad = _ceil_to(d, 128)
    if d_pad <= 128:
        return 8192
    if d_pad <= 256:
        return 4096
    return 2048


def dual_supported(d: int, dtype) -> bool:
    """True when the dual kernel beats XLA: int8 operands, D <= 128."""
    return d <= DUAL_MAX_D and jnp.dtype(dtype) == jnp.int8


def dual_enabled() -> str:
    """Env gate: '1' force, '0' off, 'auto' (default) = TPU + supported."""
    return os.environ.get("SELFREC_TPU_DUAL", "auto")


def interpret_mode() -> bool:
    """CPU-test escape hatch: SELFREC_TPU_DUAL_INTERPRET=1 runs the kernel
    in Pallas interpret mode so the integrated int8 path is testable
    without a TPU (tests/test_dense_dual.py)."""
    return os.environ.get("SELFREC_TPU_DUAL_INTERPRET", "") == "1"


def _dual_kernel(b_ref, xu_ref, xi_ref, acc_ref, out_u_ref, out_i_ref):
    gi = pl.program_id(1)  # middle: I tiles
    gu = pl.program_id(2)  # inner: U tiles within the chunk
    acc_dt = out_u_ref.dtype  # s32 for int8x8, f32 otherwise
    tile = b_ref[...]  # ONE read serves both dots
    pu = jax.lax.dot_general(  # (TU, TI) x (TI, D) -> (TU, D)
        tile, xi_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dt)
    # transpose-free item direction: contract dim 0 of both operands,
    # (TU, D) x (TU, TI) -> (D, TI), then a VPU-cheap small transpose
    pi = jax.lax.dot_general(
        xu_ref[...], tile, (((0,), (0,)), ((), ())),
        preferred_element_type=acc_dt).T

    rows = pl.ds(gu * _TU, _TU)

    @pl.when(gi == 0)
    def _():
        out_u_ref[rows, :] = pu

    @pl.when(gi != 0)
    def _():
        out_u_ref[rows, :] += pu

    @pl.when(gu == 0)
    def _():
        out_i_ref[...] = acc_ref[...] + pi

    @pl.when(gu != 0)
    def _():
        out_i_ref[...] += pi


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dual_call(b, xu, xi, interpret=False):
    u, i = b.shape
    d = xu.shape[1]
    cu = min(_chunk_rows(d), _ceil_to(u, _TU))
    u_pad, i_pad = _ceil_to(u, cu), _ceil_to(i, _TI)
    # zero-pad the operands (cheap: KBs-MBs) — this is what makes the
    # unspecified/clamped out-of-range block values harmless (every
    # out-of-range contribution multiplies a zero operand row; int8/bf16
    # garbage is finite so 0 * garbage = 0)
    xu_p = jnp.pad(xu, ((0, u_pad - u), (0, 0)))
    xi_p = jnp.pad(xi, ((0, i_pad - i), (0, 0)))
    # s8 x s8 operands accumulate exactly in s32 (products <= 127, row
    # degrees << 2^24 — same argument as spmm_dense._dense_spmm_int8_apply)
    acc_dt = (jnp.int32 if xu_p.dtype == jnp.int8 else jnp.float32)
    acc0 = jnp.zeros((i_pad, d), acc_dt)
    sub = cu // _TU
    nbu = -(-u // _TU)  # b's real row-block count (see docstring: clamp)
    grid = (u_pad // cu, i_pad // _TI, sub)
    out_u, out_i = pl.pallas_call(
        _dual_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_TU, _TI),
                lambda gc, gi, gu: (jnp.minimum(gc * sub + gu, nbu - 1), gi)),
            pl.BlockSpec((_TU, d), lambda gc, gi, gu: (gc * sub + gu, 0)),
            pl.BlockSpec((_TI, d), lambda gc, gi, gu: (gi, 0)),
            pl.BlockSpec((_TI, d), lambda gc, gi, gu: (gi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((cu, d), lambda gc, gi, gu: (gc, 0)),  # resident
            pl.BlockSpec((_TI, d), lambda gc, gi, gu: (gi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((u_pad, d), acc_dt),
            jax.ShapeDtypeStruct((i_pad, d), acc_dt),
        ],
        input_output_aliases={3: 1},  # acc <-> out_i (HBM accumulation)
        # raise the scoped-VMEM cap: the default 16 MB fits this kernel
        # standalone but the epoch-scan jvp context allocates ~21 MB
        # (Mosaic buffers more aggressively there); v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(b, xu_p, xi_p, acc0)
    return out_u[:u], out_i[:i]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dual_matmul(b, xu, xi, interpret=False):
    """(B @ xi, B.T @ xu) with ONE streaming read of ``b``.

    ``b`` is the (U, I) dense block (int8 incidence in production),
    ``xu``/``xi`` the per-side operands (their dtype is the matmul
    dtype); outputs are s32 for s8 operands, f32 otherwise.
    """
    return _dual_call(b, xu, xi, interpret=interpret)


def _dual_fwd(b, xu, xi, interpret):
    # zero-size dtype markers: residuals must be arrays, and the bwd needs
    # the primal operand dtypes to cast cotangents back
    return _dual_call(b, xu, xi, interpret=interpret), (
        b, jnp.zeros((0,), xu.dtype), jnp.zeros((0,), xi.dtype))


def _dual_bwd(interpret, res, g):
    b, xu_m, xi_m = res
    xu_dt, xi_dt = xu_m.dtype, xi_m.dtype
    g_u, g_i = g
    # d/dxu = B @ g_i, d/dxi = B.T @ g_u — the same dual pass
    gxu, gxi = _dual_call(b, g_u.astype(xu_dt), g_i.astype(xi_dt),
                          interpret=interpret)
    zero_b = (np.zeros(b.shape, jax.dtypes.float0)
              if jnp.issubdtype(b.dtype, jnp.integer)
              else jnp.zeros_like(b))
    return zero_b, gxu.astype(xu_dt), gxi.astype(xi_dt)


dual_matmul.defvjp(_dual_fwd, _dual_bwd)
