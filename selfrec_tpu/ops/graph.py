"""Graph propagation ops — the hot path of every GNN recommender.

TPU-native replacement for the reference's cuSPARSE ``torch.sparse.mm``
(e.g. /root/reference/model/graph/LightGCN.py:72, SimGCL.py:85). The
normalized adjacency lives as flat edge arrays (src, dst, w); propagation is
a gather + weighted segment-sum, which XLA lowers to dense-friendly fused
ops, is trivially differentiable (transpose of a gather-scatter is a
scatter-gather) and shards cleanly along the edge axis (partial segment sums
+ psum). The production fast path is the row-split ELL layout in
:mod:`selfrec_tpu.ops.spmm_ell` (gather-only forward AND backward via a
custom VJP); this edge-list form remains the fallback and the layout for
dynamically re-normalized views.

Also provides fully on-device normalized-adjacency construction from an edge
keep-mask, replacing the reference's per-epoch host scipy rebuild for SGL
(model/graph/SGL.py:28-29, data/augmentor.py:30-40) with a static-shape,
jit-compatible renormalisation.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class NormAdj:
    """Normalized sparse adjacency in edge-list form.

    out[d] = sum over edges e with dst[e]==d of w[e] * x[src[e]].
    ``n_nodes`` is static (part of the pytree treedef) so jitted consumers
    specialise on it.
    """

    def __init__(self, src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray,
                 n_nodes: int, sorted_by_dst: bool = False):
        self.src = src
        self.dst = dst
        self.w = w
        self.n_nodes = n_nodes
        self.sorted_by_dst = sorted_by_dst

    def tree_flatten(self):
        return (self.src, self.dst, self.w), (self.n_nodes, self.sorted_by_dst)

    @classmethod
    def tree_unflatten(cls, aux, children):
        src, dst, w = children
        return cls(src, dst, w, aux[0], aux[1])

    def __repr__(self):
        return f"NormAdj(E={self.src.shape[0]}, n_nodes={self.n_nodes})"


def spmm(adj, x: jnp.ndarray) -> jnp.ndarray:
    """Sparse (adjacency) @ dense (embeddings).

    Dispatches on layout: EllAdj takes the gather-only row-split fast path
    (ops/spmm_ell.py — the TPU hot path); HaloAdj the sharded halo-exchange
    kernel (parallel/halo.py — model-axis row-sharded tables); NormAdj falls
    back to gather + segment-sum (still used for dynamically re-normalized
    views and by the KNN co-occurrence blocks)."""
    from selfrec_tpu.ops.spmm_dense import (
        DenseAdj, DenseMat, dense_mat_spmm, dense_spmm)
    from selfrec_tpu.ops.spmm_ell import EllAdj, ell_spmm
    from selfrec_tpu.parallel.dense_shard import (
        ShardedDenseAdj, ShardedDenseMat, sharded_dense_mat_spmm,
        sharded_dense_spmm)
    from selfrec_tpu.parallel.halo import HaloAdj, halo_spmm

    if isinstance(adj, DenseAdj):
        return dense_spmm(adj, x)
    if isinstance(adj, DenseMat):
        return dense_mat_spmm(adj, x)
    if isinstance(adj, ShardedDenseMat):
        return sharded_dense_mat_spmm(adj, x)
    if isinstance(adj, ShardedDenseAdj):
        return sharded_dense_spmm(adj, x)
    if isinstance(adj, EllAdj):
        return ell_spmm(adj, x)
    if isinstance(adj, HaloAdj):
        return halo_spmm(adj, x)
    contrib = x[adj.src] * adj.w[:, None]
    return jax.ops.segment_sum(
        contrib, adj.dst, num_segments=adj.n_nodes,
        indices_are_sorted=adj.sorted_by_dst,
    )


def spmm_packed(adj, w_edge_stack: jnp.ndarray, x: jnp.ndarray,
                n_passes: int) -> jnp.ndarray:
    """P propagation passes sharing one layout, packed into one gather chain
    (x is (n, P*D); ``w_edge_stack`` (P, E) per-pass weights in original edge
    order). Dispatches EllAdj -> ell_spmm_packed, HaloAdj -> sharded halo
    kernel. See spmm_ell.py's packing rationale (latency-bound gathers)."""
    from selfrec_tpu.ops.spmm_ell import EllAdj, ell_spmm_packed
    from selfrec_tpu.parallel.halo import HaloAdj, halo_spmm_packed

    if isinstance(adj, EllAdj):
        return ell_spmm_packed(adj, w_edge_stack, x, n_passes)
    if isinstance(adj, HaloAdj):
        return halo_spmm_packed(adj, w_edge_stack, x, n_passes)
    raise TypeError(f"packed SpMM needs a shared layout, got {type(adj)}")


def supports_packed(adj) -> bool:
    from selfrec_tpu.ops.spmm_ell import EllAdj
    from selfrec_tpu.parallel.halo import HaloAdj

    return isinstance(adj, (EllAdj, HaloAdj))


def lightgcn_propagate(
    adj: NormAdj,
    ego: jnp.ndarray,
    n_layers: int,
    include_layer0: bool = True,
    return_layers: bool = False,
):
    """K-layer LightGCN propagation, mean over layer outputs.

    ``include_layer0=True`` matches LightGCN (reference LightGCN.py:68-78:
    the layer list starts with the ego embeddings); SimGCL averages layers
    1..K only (reference SimGCL.py:83-91 starts with an empty list).
    """
    layers: List[jnp.ndarray] = [ego] if include_layer0 else []
    e = ego
    for _ in range(n_layers):
        e = spmm(adj, e)
        layers.append(e)
    out = jnp.mean(jnp.stack(layers, axis=0), axis=0)
    if return_layers:
        all_layers = [ego] + layers[1:] if include_layer0 else [ego] + layers
        return out, all_layers
    return out


def perturbed_propagate(
    adj: NormAdj,
    ego: jnp.ndarray,
    n_layers: int,
    key: jax.Array,
    eps: float,
    cl_layer: Optional[int] = None,
):
    """SimGCL/XSimGCL noise-perturbed propagation.

    After each hop, adds ``sign(e) * eps * l2_normalize(uniform_noise)``
    (reference SimGCL.py:85-88 — noise is U[0,1), row-normalized). Averages
    layers 1..K (layer 0 excluded, SimGCL.py:83). If ``cl_layer`` is given,
    also returns the layer-``cl_layer`` embedding (XSimGCL.py:93-101; with
    ``cl_layer=0`` that is the unperturbed ego embedding, matching
    XSimGCL's initialisation of ``all_embeddings_cl``).
    """
    layers: List[jnp.ndarray] = []
    e = ego
    cl_emb = ego
    keys = jax.random.split(key, n_layers)
    for k in range(n_layers):
        e = spmm(adj, e)
        noise = jax.random.uniform(keys[k], e.shape, dtype=e.dtype)
        noise = noise / (jnp.linalg.norm(noise, axis=-1, keepdims=True) + 1e-12)
        e = e + jnp.sign(e) * noise * eps
        layers.append(e)
        if cl_layer is not None and k == cl_layer - 1:
            cl_emb = e
    out = jnp.mean(jnp.stack(layers, axis=0), axis=0)
    if cl_layer is not None:
        return out, cl_emb
    return out


def bipartite_renorm_weights(
    edge_users: jnp.ndarray,
    edge_items: jnp.ndarray,
    keep: jnp.ndarray,
    n_users: int,
    n_items: int,
) -> jnp.ndarray:
    """(2E,) symmetric-normalized weights over kept edges, ordered
    [u→i edges ; i→u edges] — matching the src/dst concatenation of
    :func:`build_norm_adj_from_mask`. Feed to an EllAdj template built from
    the same ordering (see :func:`build_bipartite_ell_template`) to keep
    per-epoch dropped views (SGL, SEPT) on the gather-only fast path."""
    w_e = keep.astype(jnp.float32)
    du = jax.ops.segment_sum(w_e, edge_users, num_segments=n_users)
    di = jax.ops.segment_sum(w_e, edge_items, num_segments=n_items)
    inv_sqrt_du = jnp.where(du > 0, jax.lax.rsqrt(jnp.maximum(du, 1e-12)), 0.0)
    inv_sqrt_di = jnp.where(di > 0, jax.lax.rsqrt(jnp.maximum(di, 1e-12)), 0.0)
    w = w_e * inv_sqrt_du[edge_users] * inv_sqrt_di[edge_items]
    return jnp.concatenate([w, w])


def build_bipartite_ell_template(
    edge_users, edge_items, n_users: int, n_items: int, k: int = 16
):
    """Static EllAdj over the symmetric bipartite edge list (host, one-time);
    reweight per epoch/step with :func:`bipartite_renorm_weights`."""
    import numpy as np

    from selfrec_tpu.ops.spmm_ell import ell_adj_from_edges

    eu = np.asarray(edge_users)
    ei = np.asarray(edge_items)
    src = np.concatenate([eu, ei + n_users])
    dst = np.concatenate([ei + n_users, eu])
    w = np.ones(2 * len(eu), dtype=np.float32)
    return ell_adj_from_edges(src, dst, w, n_rows=n_users + n_items, k=k)


def union_ell_template(mats, k: int = 16):
    """One shared ELL layout over the UNION sparsity pattern of several
    same-shape scipy matrices + the (P, E_union) per-view weight stack in
    the template's original edge order.

    Views missing a union edge carry weight 0 in that slot, so
    :func:`spmm_packed` runs all P propagations as ONE gather chain. Wins
    whenever patterns overlap heavily — SEPT's friend/sharing views are
    both ``(·)⊙S + I`` patterns (reference SEPT.py:33-40), so their union
    is barely larger than either alone, and the TPU gather is per-slot-
    bound (BASELINE.md round-2 cost model: ~1.5ns/slot fixed, bytes nearly
    free at these widths).

    Returns (template: EllAdj with all-ones weights, w_stack: (P, E) jnp).
    """
    import numpy as np
    import scipy.sparse as sp

    from selfrec_tpu.ops.spmm_ell import ell_adj_from_edges

    n_rows, n_cols = mats[0].shape
    union = None
    for m in mats:
        assert m.shape == (n_rows, n_cols)
        pat = m.tocoo()
        pat = sp.coo_matrix(
            (np.ones(pat.nnz, np.float32), (pat.row, pat.col)),
            shape=m.shape,
        )
        union = pat if union is None else union + pat
    union = union.tocoo()
    rows, cols = union.row.astype(np.int32), union.col.astype(np.int32)
    w_stack = np.stack(
        [np.asarray(m.tocsr()[rows, cols]).ravel().astype(np.float32)
         for m in mats]
    )
    template = ell_adj_from_edges(
        cols, rows, np.ones(len(rows), np.float32),
        n_rows=n_rows, n_cols=n_cols, k=k,
    )
    return template, jnp.asarray(w_stack)


def fused_simgcl_propagate(
    adj,
    ego: jnp.ndarray,
    n_layers: int,
    key: jax.Array,
    eps: float,
):
    """SimGCL's three propagation chains (1 clean + 2 noise-perturbed,
    SimGCL.py:27-47) fused into ONE width-3D propagation.

    TPU rationale: the ELL gather is latency-bound at D=64 — a D=128 row
    costs the same as D=64 and D=192 only ~1.7x (measured on v5e), so
    packing the three passes into one (n, 3D) tensor turns 3 gather chains
    into 1 for a ~1.7x propagation speedup. Propagation is linear, so
    spmm(adj, concat) == concat(spmm(adj, .)) exactly; the per-pass noise
    (sign(e)*eps*rownorm(U[0,1)), SimGCL.py:85-88) is applied to the two
    perturbed slices after each hop. All three outputs average layers 1..K
    (layer 0 excluded, SimGCL.py:83-91).

    Returns (clean, view1, view2), each (n, D).
    """
    d = ego.shape[1]
    x = jnp.concatenate([ego, ego, ego], axis=1)
    keys = jax.random.split(key, 2 * n_layers).reshape(n_layers, 2, -1)
    acc = jnp.zeros_like(x)
    for k in range(n_layers):
        x = spmm(adj, x)
        c, p1, p2 = x[:, :d], x[:, d : 2 * d], x[:, 2 * d :]
        parts = [c]
        for j, p in enumerate((p1, p2)):
            noise = jax.random.uniform(keys[k, j], p.shape, dtype=p.dtype)
            noise = noise / (jnp.linalg.norm(noise, axis=-1, keepdims=True) + 1e-12)
            parts.append(p + jnp.sign(p) * noise * eps)
        x = jnp.concatenate(parts, axis=1)
        acc = acc + x
    out = acc / n_layers
    return out[:, :d], out[:, d : 2 * d], out[:, 2 * d :]


def build_norm_adj_from_mask(
    edge_users: jnp.ndarray,
    edge_items: jnp.ndarray,
    keep: jnp.ndarray,
    n_users: int,
    n_items: int,
) -> NormAdj:
    """Symmetric normalized bipartite adjacency from a kept-edge mask.

    Fully on-device equivalent of edge-dropout → convert_to_laplacian_mat
    (reference SGL.py:89-96 + ui_graph.py:58-65): degrees are recomputed over
    the kept edges and each edge gets weight 1/sqrt(d_u * d_i); dropped edges
    keep their slot with weight 0, so shapes stay static under jit.
    """
    w_e = keep.astype(jnp.float32)
    du = jax.ops.segment_sum(w_e, edge_users, num_segments=n_users)
    di = jax.ops.segment_sum(w_e, edge_items, num_segments=n_items)
    inv_sqrt_du = jnp.where(du > 0, jax.lax.rsqrt(jnp.maximum(du, 1e-12)), 0.0)
    inv_sqrt_di = jnp.where(di > 0, jax.lax.rsqrt(jnp.maximum(di, 1e-12)), 0.0)
    w = w_e * inv_sqrt_du[edge_users] * inv_sqrt_di[edge_items]
    src = jnp.concatenate([edge_users, edge_items + n_users])
    dst = jnp.concatenate([edge_items + n_users, edge_users])
    return NormAdj(src, dst, jnp.concatenate([w, w]), n_users + n_items)


def adj_dropout(adj, key: jax.Array, rate):
    """Per-step sparse dropout of adjacency entries: keep each edge with
    probability 1-rate, scale kept weights by 1/(1-rate). Matches the
    reference's ``sparse_dropout`` (BUIR.py:118-127, MixGCF.py:86-96) which
    rescales but does NOT re-normalize degrees. ``rate`` may be a traced
    scalar (BUIR draws rate = U[0,1) * drop_ratio per forward, BUIR.py:135).
    Static shapes: dropped edges keep their slot with weight 0. EllAdj drops
    per ORIGINAL edge and reweights both directions consistently.
    """
    from selfrec_tpu.ops.spmm_dense import DenseAdj
    from selfrec_tpu.ops.spmm_ell import EllAdj
    from selfrec_tpu.parallel.dense_shard import ShardedDenseAdj
    from selfrec_tpu.parallel.halo import HaloAdj

    if isinstance(adj, DenseAdj):
        # scatter-MULTIPLY of the per-edge keep mask into the existing
        # block; the factored int8 form survives exactly (B ⊙ keep stays
        # binary, the 1/(1-rate) rescale folds into gain) — cheap enough
        # per scan step, unlike reweight's full value re-scatter
        return adj.dropout_view(key, rate)
    if isinstance(adj, ShardedDenseAdj):
        # per-device masked rebuild not implemented; per-step-dropout
        # models under a mesh keep the ELL/halo layout (models/graph/
        # buir.py builds accordingly)
        raise TypeError(
            "adj_dropout on ShardedDenseAdj is unsupported; build per-step "
            "dropout models on the ELL/halo layout under a mesh")
    if isinstance(adj, (EllAdj, HaloAdj)):
        keep = jax.random.uniform(key, adj.edge_w.shape) >= rate
        return adj.reweight(jnp.where(keep, adj.edge_w / (1.0 - rate), 0.0))
    keep = jax.random.uniform(key, adj.w.shape) >= rate
    w = jnp.where(keep, adj.w / (1.0 - rate), 0.0)
    return NormAdj(adj.src, adj.dst, w, adj.n_nodes, adj.sorted_by_dst)


def dense_general_available(m: int, n: int) -> bool:
    """Whether a STATIC (m, n) matrix would take the generic dense MXU
    backend under the current env gates (same conditions
    norm_adj_from_scipy(dense_general=True) applies)."""
    import os

    from selfrec_tpu.ops import spmm_dense

    mode = os.environ.get("SELFREC_TPU_DENSE", "auto")
    if mode == "0":
        return False
    # generic DenseMat blocks allocate in _generic_dtype() (bf16 even under
    # the int8 opt-in), so budget with THAT itemsize, not _dense_dtype()
    return spmm_dense.fits_dense(m, n, spmm_dense._generic_dtype()) and (
        mode == "1" or jax.default_backend() != "cpu")


def norm_adj_from_scipy(norm_adj, ell: Optional[bool] = None, k: int = 16,
                        n_users: Optional[int] = None,
                        dense_general: bool = False):
    """Device adjacency from a host scipy normalized matrix (one-time setup).

    Returns the row-split EllAdj fast path by default (set env
    ``SELFREC_TPU_ELL=0`` or pass ell=False for the edge-list NormAdj).
    Handles rectangular matrices (rows = destinations).

    Passing ``n_users`` for a unified bipartite Laplacian enables the
    dense-bipartite MXU path (ops/spmm_dense.py) on accelerator backends
    when the (U, I) block fits the budget — ``SELFREC_TPU_DENSE=0``
    disables, ``=1`` forces (incl. on CPU, for tests).

    ``dense_general=True`` opts a STATIC square/rectangular matrix (MHCN's
    social channels / rating blocks) into the generic dense MXU backend
    (spmm_dense.DenseMat) under the same env gates and budget. Callers
    that re-drop or reweight per step must not pass it.
    """
    import os

    import numpy as np

    coo = norm_adj.tocoo()
    dense_mode = os.environ.get("SELFREC_TPU_DENSE", "auto")
    if dense_general and n_users is None and dense_mode != "0":
        from selfrec_tpu.ops import spmm_dense

        m, n = norm_adj.shape
        if (spmm_dense.fits_dense(m, n, spmm_dense._generic_dtype())
                and (dense_mode == "1" or jax.default_backend() != "cpu")):
            return spmm_dense.dense_mat_from_scipy(norm_adj)
    if n_users is not None and dense_mode != "0":
        from selfrec_tpu.ops import spmm_dense

        n_items = norm_adj.shape[0] - n_users
        if (norm_adj.shape[0] == norm_adj.shape[1]
                and spmm_dense.fits_dense(n_users, n_items)
                and (dense_mode == "1" or jax.default_backend() != "cpu")):
            blocks = spmm_dense.bipartite_blocks(coo, n_users)
            if blocks is not None:
                eu, ei, w = blocks
                return spmm_dense.dense_adj_from_edges(
                    eu, ei, w, n_users, n_items)

    if ell is None:
        ell = os.environ.get("SELFREC_TPU_ELL", "1") != "0"
    k = int(os.environ.get("SELFREC_TPU_ELL_K", k))
    if ell:
        from selfrec_tpu.ops.spmm_ell import ell_adj_from_edges

        return ell_adj_from_edges(
            coo.col.astype(np.int32),
            coo.row.astype(np.int32),
            coo.data.astype(np.float32),
            n_rows=norm_adj.shape[0],
            n_cols=norm_adj.shape[1],
            k=k,
        )
    order = np.argsort(coo.row, kind="stable")
    return NormAdj(
        jnp.asarray(coo.col[order].astype(np.int32)),
        jnp.asarray(coo.row[order].astype(np.int32)),
        jnp.asarray(coo.data[order].astype(np.float32)),
        norm_adj.shape[0],
        sorted_by_dst=True,
    )
