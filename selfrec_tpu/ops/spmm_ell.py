"""Row-split ELL SpMM — the TPU fast path for graph propagation.

Why: XLA lowers the naive edge-list formulation (gather + E-length
scatter-add, ops/graph.spmm) to a serialized scatter over ~3M edges — the
dominant cost of every GNN step (the reference's cuSPARSE spmm at
LightGCN.py:72 etc. has no TPU analog). This module reformulates SpMM so no
large scatter ever happens:

- **Row splitting**: destinations' neighbor lists (CSR sorted by dst) are cut
  into virtual rows of at most K source slots, padded to exactly K
  (pad slot -> source 0 with weight 0). A power-law degree distribution
  yields V ≈ nnz/K + n_rows virtual rows with bounded waste.
- **Forward**: partial[v] = Σ_k w[v,k] * x[vidx[v,k]] — a dense gather plus
  an einsum the VPU/MXU eats — followed by a segment-sum over the SORTED
  virtual-row→row map (length V, ≈20x shorter than the edge list, few
  repeats per segment).
- **Backward**: the adjoint of A@x is Aᵀ@g, so the custom VJP runs the SAME
  gather-based kernel with the precomputed transpose layout. The
  scatter-add that autodiff would generate for the gather never appears.

Weights are a separate input so per-step/per-epoch reweighted adjacencies
(edge dropout: SGL.py:28-29, BUIR.py:118-127, SEPT.py:161-167) reuse the
static layout: ``edge_slots`` maps original edge order -> flat ELL slot, so
new weights are one scatter of E scalars (cheap), not a layout rebuild.
Weight cotangents are zero: adjacency weights are graph constants, never
functions of trainable parameters.

On a hand-written Pallas kernel: the irreducible cost of unstructured SpMM
is the random-access row gather, which XLA already lowers to the TPU's
native gather path; a Pallas version would have to either re-express that
gather (scalar row loop — strictly slower) or keep the table resident in
VMEM (~16MB/core caps it at ~100k bf16 rows at D=64, losing generality).
Until profiling on hardware shows the XLA gather leaving bandwidth on the
table, this module IS the TPU kernel strategy; revisit with a measured gap.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class EllLayout(NamedTuple):
    """Static gather layout for one propagation direction. ``vidx`` is kept
    FLAT (V*K,) so no reshape of the large constant happens inside jit
    (XLA would constant-fold the copy on every compile)."""

    vidx: jnp.ndarray  # (V*K,) int32 source ids, pad -> 0
    vdst: jnp.ndarray  # (V,) int32 destination row per virtual row, sorted
    n_rows: int
    k: int
    edge_slots: jnp.ndarray  # (E,) flat position of edge e in vidx/w


def build_ell_layout(
    src: np.ndarray, dst: np.ndarray, n_rows: int, k: int = 32
) -> Tuple[EllLayout, np.ndarray]:
    """Host-side one-time layout build. Returns (layout, slot_order) where
    ``slot_order`` is unused internally but handy for tests.

    Edges need not be pre-sorted; a stable sort by dst defines slot order.
    """
    # int32 throughout — slot indices stay < V*K < 2^31 for any graph that
    # fits one host; int64 temporaries double the memory traffic of the
    # fancy-indexing passes (measured 2x slower builds at 5M+ edges)
    e = len(src)
    order = np.argsort(dst, kind="stable").astype(np.int32)
    s_src = np.ascontiguousarray(np.asarray(src, dtype=np.int32)[order])
    s_dst = np.ascontiguousarray(np.asarray(dst, dtype=np.int32)[order])
    # position of each edge within its destination's run
    counts = np.bincount(s_dst, minlength=n_rows).astype(np.int32)
    run_starts = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=run_starts[1:])
    within = np.arange(e, dtype=np.int32) - run_starts[s_dst]
    # virtual row index: first virtual row of each dst + within // k
    vrows_per_dst = -(-counts // k)  # ceil
    first_vrow = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(vrows_per_dst, out=first_vrow[1:])
    v = int(first_vrow[-1])
    if v * k >= 2**31:  # keep the int32 slot space honest
        raise ValueError(f"ELL slot space {v * k} exceeds int32; lower k or shard")
    vrow = first_vrow[s_dst] + within // k
    slot = within % k
    flat = vrow * k + slot

    vidx = np.zeros(v * k, dtype=np.int32)
    vidx[flat] = s_src
    vdst = np.zeros(v, dtype=np.int32)
    # every dst with count>0 owns vrows [first_vrow[d], first_vrow[d+1])
    nz = np.nonzero(vrows_per_dst)[0]
    vdst_np = np.repeat(nz.astype(np.int32), vrows_per_dst[nz])
    vdst[: len(vdst_np)] = vdst_np

    edge_slots = np.empty(e, dtype=np.int32)
    edge_slots[order] = flat

    layout = EllLayout(
        vidx=jnp.asarray(vidx),
        vdst=jnp.asarray(vdst),
        n_rows=n_rows,
        k=k,
        edge_slots=jnp.asarray(edge_slots),
    )
    return layout, order


def ell_weights(layout: EllLayout, edge_w: jnp.ndarray) -> jnp.ndarray:
    """(V, K) weight matrix from per-edge weights in ORIGINAL edge order."""
    v, k = layout.vdst.shape[0], layout.k
    flat = jnp.zeros(v * k, dtype=edge_w.dtype).at[layout.edge_slots].set(edge_w)
    return flat.reshape(v, k)


import os

# einsum: one (V*K, D) gather + contraction — fewer ops, larger intermediate.
# loop:   K sequential (V, D) gathers with fused multiply-accumulate — no
#         (V, K, D) intermediate in HBM. Which wins is a bandwidth question;
#         A/B per platform via SELFREC_TPU_ELL_MODE.
_ELL_MODE = os.environ.get("SELFREC_TPU_ELL_MODE", "einsum")

# The einsum mode materializes the (V*K, D) gather in HBM. Dense auxiliary
# graphs (MHCN's motif adjacencies reach V*K ≈ 38M at douban scale) push
# that past device memory (observed: a 19.4GB fusion output OOM'ing a 16GB
# v5e). Above this byte budget the virtual rows are processed in a
# sequential lax.map over equal chunks — same math, bounded intermediate.
_CHUNK_BYTES = int(os.environ.get("SELFREC_TPU_ELL_CHUNK_BYTES", 2**30))


def _ell_partial(layout: EllLayout, w_stack: jnp.ndarray, x: jnp.ndarray,
                 p: int) -> jnp.ndarray:
    """(V, P*D) weighted-gather partials shared by the single-pass and
    packed applies. ``w_stack`` is (V, P, K) already in compute dtype;
    ``x`` (n, P*D). Chunks the (V*K, P*D) gather via a sequential lax.map
    above _CHUNK_BYTES (dense aux graphs OOM the one-shot gather — see
    module docstring)."""
    v, k = layout.vdst.shape[0], layout.k
    d = x.shape[-1] // p
    gather_bytes = v * k * p * d * jnp.dtype(x.dtype).itemsize
    if gather_bytes > _CHUNK_BYTES:
        n_chunks = -(-gather_bytes // _CHUNK_BYTES)
        vc = -(-v // n_chunks)
        n_chunks = -(-v // vc)
        vpad = n_chunks * vc
        vidx2 = jnp.pad(layout.vidx, (0, (vpad - v) * k)).reshape(
            n_chunks, vc * k
        )
        w2 = jnp.pad(w_stack, ((0, vpad - v), (0, 0), (0, 0))).reshape(
            n_chunks, vc, p, k
        )

        def chunk(args):
            vi, wc = args
            g = x[vi].reshape(vc, k, p, d)
            return jnp.einsum(
                "vpk,vkpd->vpd", wc, g, preferred_element_type=jnp.float32
            ).reshape(vc, p * d)

        return jax.lax.map(chunk, (vidx2, w2)).reshape(vpad, p * d)[:v]
    g = x[layout.vidx].reshape(v, k, p, d)
    return jnp.einsum(
        "vpk,vkpd->vpd", w_stack, g, preferred_element_type=jnp.float32
    ).reshape(v, p * d)


def _ell_apply(layout: EllLayout, w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    from selfrec_tpu.ops.precision import compute_dtype

    v, k = layout.vdst.shape[0], layout.k
    dt = compute_dtype()
    src = x if dt is None else x.astype(dt)
    ww = w if dt is None else w.astype(dt)
    if _ELL_MODE == "loop":
        partial = jnp.zeros((v, x.shape[-1]), dtype=jnp.float32)
        for kk in range(k):
            # strided slice of the flat layout — no reshape-copy of the
            # large constant inside jit
            col = jax.lax.slice(layout.vidx, (kk,), (v * k,), (k,))
            partial = partial + (
                src[col] * ww[:, kk, None]
            ).astype(jnp.float32)
    else:
        partial = _ell_partial(layout, ww[:, None, :], src, 1)
    return jax.ops.segment_sum(
        partial, layout.vdst, num_segments=layout.n_rows, indices_are_sorted=True
    )


@jax.tree_util.register_pytree_node_class
class EllAdj:
    """Bidirectional ELL adjacency: forward layout + transpose layout with
    their weight matrices, plus the per-edge weights in original edge order
    (for reweighting/dropout). Drop-in for ops.graph.spmm via ell_spmm."""

    def __init__(self, fwd: EllLayout, w_fwd, bwd: EllLayout, w_bwd, edge_w):
        self.fwd = fwd
        self.w_fwd = w_fwd
        self.bwd = bwd
        self.w_bwd = w_bwd
        self.edge_w = edge_w

    def tree_flatten(self):
        return (
            (self.fwd.vidx, self.fwd.vdst, self.fwd.edge_slots, self.w_fwd,
             self.bwd.vidx, self.bwd.vdst, self.bwd.edge_slots, self.w_bwd,
             self.edge_w),
            (self.fwd.n_rows, self.fwd.k, self.bwd.n_rows, self.bwd.k),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (fvi, fvd, fes, fw, bvi, bvd, bes, bw, ew) = children
        return cls(
            EllLayout(fvi, fvd, aux[0], aux[1], fes), fw,
            EllLayout(bvi, bvd, aux[2], aux[3], bes), bw, ew,
        )

    def reweight(self, edge_w: jnp.ndarray) -> "EllAdj":
        """New EllAdj with per-edge weights replaced (original edge order);
        static layouts reused — this is how per-epoch/per-step dropped
        adjacencies stay on the fast path."""
        return EllAdj(
            self.fwd, ell_weights(self.fwd, edge_w),
            self.bwd, ell_weights(self.bwd, edge_w), edge_w,
        )

    def __repr__(self):
        return (
            f"EllAdj(V={self.fwd.vdst.shape[0]}, K={self.fwd.k},"
            f" n_rows={self.fwd.n_rows})"
        )


def ell_adj_from_edges(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n_rows: int,
    n_cols: int = None, k: int = 32,
) -> EllAdj:
    """Build both directions from an edge list (host, one-time). For a square
    adjacency n_cols defaults to n_rows."""
    n_cols = n_rows if n_cols is None else n_cols
    fwd, _ = build_ell_layout(np.asarray(src), np.asarray(dst), n_rows, k)
    bwd, _ = build_ell_layout(np.asarray(dst), np.asarray(src), n_cols, k)
    w = jnp.asarray(np.asarray(w, dtype=np.float32))
    return EllAdj(fwd, ell_weights(fwd, w), bwd, ell_weights(bwd, w), w)


@jax.custom_vjp
def ell_spmm(adj: EllAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out[d] = Σ_{e: dst[e]=d} w[e] * x[src[e]] with gather-only autodiff."""
    return _ell_apply(adj.fwd, adj.w_fwd, x)


def _ell_spmm_fwd(adj, x):
    return _ell_apply(adj.fwd, adj.w_fwd, x), adj


def _ell_spmm_bwd(adj, g):
    dx = _ell_apply(adj.bwd, adj.w_bwd, g)
    # adjacency cotangents: float0 for int leaves (JAX convention), zeros for
    # the weight leaves — weights are graph constants, see module docstring.
    zero_adj = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        adj,
    )
    return zero_adj, dx


ell_spmm.defvjp(_ell_spmm_fwd, _ell_spmm_bwd)


# -- packed multi-pass SpMM ---------------------------------------------------
#
# Several models propagate MULTIPLE embedding sets over adjacencies that
# share one ELL LAYOUT and differ only in weights (SGL's clean graph + two
# dropped views, SGL.py:28-29; BUIR's two dropout draws, BUIR.py:118-135).
# Since the TPU gather is latency-bound in D (see fused_simgcl_propagate),
# packing P passes into one (n, P*D) tensor with per-pass weight planes
# turns P gather chains into one.


def _ell_apply_packed(layout: EllLayout, w_stack: jnp.ndarray, x: jnp.ndarray,
                      n_passes: int) -> jnp.ndarray:
    """w_stack (P, V, K); x (n, P*D) -> (n_rows, P*D)."""
    from selfrec_tpu.ops.precision import compute_dtype

    dt = compute_dtype()
    src = x if dt is None else x.astype(dt)
    ww = w_stack if dt is None else w_stack.astype(dt)
    partial = _ell_partial(layout, ww.transpose(1, 0, 2), src, n_passes)
    return jax.ops.segment_sum(
        partial, layout.vdst, num_segments=layout.n_rows, indices_are_sorted=True
    )


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def ell_spmm_packed(adj: EllAdj, w_edge_stack: jnp.ndarray, x: jnp.ndarray,
                    n_passes: int) -> jnp.ndarray:
    """P-pass packed SpMM over one shared layout.

    ``w_edge_stack`` (P, E) per-pass weights in ORIGINAL edge order (the
    template's); ``x`` (n, P*D). Gradient flows to ``x`` only (weights are
    graph constants)."""
    w_fwd = jax.vmap(lambda w: ell_weights(adj.fwd, w))(w_edge_stack)
    return _ell_apply_packed(adj.fwd, w_fwd, x, n_passes)


def _ell_spmm_packed_fwd(adj, w_edge_stack, x, n_passes):
    return ell_spmm_packed(adj, w_edge_stack, x, n_passes), (adj, w_edge_stack)


def _ell_spmm_packed_bwd(n_passes, res, g):
    adj, w_edge_stack = res
    w_bwd = jax.vmap(lambda w: ell_weights(adj.bwd, w))(w_edge_stack)
    dx = _ell_apply_packed(adj.bwd, w_bwd, g, n_passes)
    zero_adj = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        adj,
    )
    return zero_adj, jnp.zeros_like(w_edge_stack), dx


ell_spmm_packed.defvjp(_ell_spmm_packed_fwd, _ell_spmm_packed_bwd)
