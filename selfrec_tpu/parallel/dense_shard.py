"""Sharded dense-bipartite SpMM — the MXU fast path scaled over the mesh.

Round 2's single-chip win (ops/spmm_dense.py: int8-factored dense matmuls,
52% of MXU peak, 3.17x over the ELL gather) previously evaporated under a
mesh: make_adj skipped dense and model-parallel propagation reverted to the
halo-ELL gather kernel (12-20% of HBM peak). This module keeps the dense
path at scale by 2D-partitioning the (U, I) incidence over the WHOLE
(data, model) device grid:

- **Column layout**: the padded item axis is split into ``nm`` model blocks
  (matching the row-sharded item table) and each model block into ``nd``
  data sub-blocks, so device (d, s) stores the (U_pad, I_pad/(nd*nm))
  int8 column slice B_{d,s}. Total memory = one copy of B, spread over all
  devices — the dense budget GROWS by the device count.
- **User direction** ``out_u = B @ x_i``: x_i arrives model-sharded
  (replicated over data); device (d, s) multiplies its column slice by its
  local rows of the model block — partials are summed with a
  ``psum_scatter`` over ``model`` (leaving out_u row-sharded exactly like
  the user table) and a ``psum`` over ``data``.
- **Item direction** ``out_i = B^T @ x_u``: one ``all_gather`` of the
  (U_pad/nm, D) user block over ``model``; each device's transposed matmul
  then yields COMPLETE disjoint item rows (its columns are its items), and
  an ``all_gather`` over ``data`` reassembles the model block.

Every collective is sized to an embedding block (U_pad*D or I_pad/nm*D
bytes) — never nnz- or U*I-sized (asserted by scripts/audit_collectives.py).
FLOPs per device are U*I*D*2/(nd*nm) per direction: the propagation
weak-scales on both mesh axes, unlike a replicated dense block.

The exact int8 factoring of spmm_dense carries over unchanged: diagonal
normalizations are applied OUTSIDE the shard_map on the (already sharded)
operand and output, so the kernel itself is a pure int8/bf16 matmul.

The unified Laplacian is symmetric (enforced by spmm_dense.bipartite_blocks),
so the adjoint of the propagation is the propagation itself — the custom VJP
reuses the forward kernel on the cotangent (no transpose plan needed, unlike
parallel/halo.py).

Reference hot op this keeps beating at scale:
/root/reference/model/graph/LightGCN.py:72 (single-device cuSPARSE spmm).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from selfrec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


@jax.tree_util.register_pytree_node_class
class ShardedDenseAdj:
    """Mesh-sharded dense-bipartite adjacency.

    ``b`` is the stacked per-device column slice, shape
    (nd, nm, U_pad, i_blk), placed P(data, model, None, None) — each device
    holds exactly its (U_pad, i_blk) block. Factored mode (int8 incidence +
    exact f32 diagonal scalings) mirrors spmm_dense.DenseAdj; generic mode
    stores arbitrary per-edge values in the matmul dtype.

    Carries the per-device padded edge arrays so per-epoch reweighted views
    (SGL/SEPT dropout) rebuild the block on device with one local scatter
    per device (:meth:`reweight`).
    """

    def __init__(self, b, eu_dev, ei_dev, eid_dev,
                 edge_users, edge_items, edge_w,
                 row_scale, col_scale, gain,
                 n_users: int, n_items: int, u_pad: int, i_pad: int,
                 mesh: Mesh, mm_dtype=jnp.bfloat16):
        self.b = b
        self.eu_dev = eu_dev    # (nd, nm, Emax) int32 user row, pad -> 0
        self.ei_dev = ei_dev    # (nd, nm, Emax) int32 LOCAL col, pad -> 0
        self.eid_dev = eid_dev  # (nd, nm, Emax) int32 global edge id, pad -> E
        self.edge_users = edge_users  # (E,) int32, original order (DenseAdj API)
        self.edge_items = edge_items  # (E,) int32
        self.edge_w = edge_w    # (E,) f32 original edge weights
        self.row_scale = row_scale  # (U,) f32 or None
        self.col_scale = col_scale  # (I,) f32 or None
        self.gain = gain
        self.n_users = n_users
        self.n_items = n_items
        self.n_nodes = n_users + n_items
        self.u_pad = u_pad
        self.i_pad = i_pad
        self.mesh = mesh
        self.mm_dtype = jnp.dtype(mm_dtype)

    @property
    def factored(self) -> bool:
        return self.row_scale is not None

    @property
    def grid(self):
        return self.b.shape[0], self.b.shape[1]

    @property
    def i_blk(self) -> int:
        return self.b.shape[3]

    def tree_flatten(self):
        return ((self.b, self.eu_dev, self.ei_dev, self.eid_dev,
                 self.edge_users, self.edge_items, self.edge_w,
                 self.row_scale, self.col_scale, self.gain),
                (self.n_users, self.n_items, self.u_pad, self.i_pad,
                 self.mesh, self.mm_dtype))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux[:4], mesh=aux[4], mm_dtype=aux[5])

    def reweight(self, w: jnp.ndarray) -> "ShardedDenseAdj":
        """New adjacency with per-edge weights ``w`` (original edge order):
        one LOCAL scatter per device, no cross-device traffic (each device
        rebuilds only its column slice). Generic mode result — arbitrary
        weights never land in an s8 block, so int8 quantized mode falls
        back to bf16 here (mirrors spmm_dense._generic_dtype)."""
        dtype = self.mm_dtype
        if dtype == jnp.int8:
            dtype = jnp.dtype(jnp.bfloat16)
        w_pad = jnp.concatenate([w.astype(dtype), jnp.zeros((1,), dtype)])
        b = _scatter_blocks(self.eu_dev, self.ei_dev, w_pad[self.eid_dev],
                            self.u_pad, self.i_blk, dtype, self.mesh)
        return ShardedDenseAdj(
            b, self.eu_dev, self.ei_dev, self.eid_dev,
            self.edge_users, self.edge_items, w,
            None, None, None, self.n_users, self.n_items,
            self.u_pad, self.i_pad, self.mesh, dtype)

    def refactor_view(self, keep: jnp.ndarray) -> "ShardedDenseAdj":
        """Symmetric-renormalized dropped view that STAYS int8-factored:
        the kept-edge Laplacian's weights are exactly 1/sqrt(du'*di') over
        the new degrees, i.e. a new binary incidence + new diagonal
        scalings — no bf16 value block, no precision loss, same matmul
        speed as the clean graph. ``keep`` is (E,) bool over the original
        edge order (reference SGL.py:89-96 semantics via
        ops/graph.bipartite_renorm_weights math)."""
        kf = keep.astype(jnp.float32)
        eu_g, ei_g = self.edge_users, self.edge_items
        du = jax.ops.segment_sum(kf, eu_g, num_segments=self.n_users)
        di = jax.ops.segment_sum(kf, ei_g, num_segments=self.n_items)
        ru = jnp.where(du > 0, jax.lax.rsqrt(jnp.maximum(du, 1e-12)), 0.0)
        ci = jnp.where(di > 0, jax.lax.rsqrt(jnp.maximum(di, 1e-12)), 0.0)
        keep_pad = jnp.concatenate(
            [keep.astype(jnp.int8), jnp.zeros((1,), jnp.int8)])
        b = _scatter_blocks(self.eu_dev, self.ei_dev, keep_pad[self.eid_dev],
                            self.u_pad, self.i_blk, jnp.int8, self.mesh)
        w = kf * ru[eu_g] * ci[ei_g]
        return ShardedDenseAdj(
            b, self.eu_dev, self.ei_dev, self.eid_dev,
            self.edge_users, self.edge_items, w,
            ru, ci, jnp.float32(1.0), self.n_users, self.n_items,
            self.u_pad, self.i_pad, self.mesh, self.mm_dtype)

    def comm_bytes(self, n_channels: int, dtype_bytes: int = 4) -> dict:
        """Analytic per-device per-call ICI volume (ring algorithms)."""
        nd, nm = self.grid
        up, ipm = self.u_pad, self.i_pad // nm
        c, by = n_channels, dtype_bytes
        return {
            "psum_scatter_model": up * c * by * (nm - 1) // max(nm, 1),
            "psum_data": 2 * (up // nm) * c * by * (nd - 1) // max(nd, 1),
            "all_gather_model": up * c * by * (nm - 1) // max(nm, 1),
            "all_gather_data": ipm * c * by * (nd - 1) // max(nd, 1),
        }

    def __repr__(self):
        nd, nm = self.grid
        mode = "int8-factored" if self.factored else f"{self.b.dtype}"
        return (f"ShardedDenseAdj(U={self.n_users}, I={self.n_items}, "
                f"grid=({nd},{nm}), {mode}, "
                f"{self.b.nbytes / max(nd * nm, 1) / 1e9:.3f} GB/device)")


def _scatter_blocks(eu_dev, ei_dev, val_dev, u_pad, i_blk, dtype, mesh):
    """Per-device scatter of padded local edges into the (U_pad, i_blk)
    column slice. Pad entries carry value 0 at (0, 0) — .add is a no-op."""

    def f(eu, ei, v):
        b = jnp.zeros((u_pad, i_blk), dtype)
        return b.at[eu.reshape(-1), ei.reshape(-1)].add(
            v.reshape(-1))[None, None]

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(DATA_AXIS, MODEL_AXIS, None),) * 3,
        out_specs=P(DATA_AXIS, MODEL_AXIS, None, None),
        check_vma=False,
    )(eu_dev, ei_dev, val_dev.astype(dtype))


def build_sharded_dense(edge_users, edge_items, w, n_users: int,
                        n_items: int, mesh: Mesh) -> ShardedDenseAdj:
    """One-time host plan + on-device scatter build.

    Host work is one O(E) pass (device assignment by item column). Only the
    edge arrays ship host->device (E*16 bytes stacked) — the dense block
    itself is always built on device (never through the transfer tunnel)."""
    from selfrec_tpu.ops.spmm_dense import _dense_dtype, _try_factor

    nd, nm = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
    eu = np.asarray(edge_users, dtype=np.int32)
    ei = np.asarray(edge_items, dtype=np.int32)
    w_np = np.asarray(w, dtype=np.float32)
    e = len(eu)
    u_pad = _ceil_to(max(n_users, nm), nm)
    i_pad = _ceil_to(max(n_items, nd * nm), nd * nm)
    i_blk = i_pad // (nd * nm)

    s_of = ei // (i_pad // nm)
    d_of = (ei % (i_pad // nm)) // i_blk
    dev = d_of.astype(np.int64) * nm + s_of
    order = np.argsort(dev, kind="stable")
    counts = np.bincount(dev, minlength=nd * nm)
    e_max = max(int(counts.max()), 1)
    starts = np.zeros(nd * nm + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    within = np.arange(e, dtype=np.int64) - starts[dev[order]]

    eu_dev = np.zeros((nd * nm, e_max), dtype=np.int32)
    ei_dev = np.zeros((nd * nm, e_max), dtype=np.int32)
    eid_dev = np.full((nd * nm, e_max), e, dtype=np.int32)
    eu_dev[dev[order], within] = eu[order]
    ei_dev[dev[order], within] = (ei % (i_pad // nm))[order] % i_blk
    eid_dev[dev[order], within] = order.astype(np.int32)

    sh = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
    eu_dev = jax.device_put(eu_dev.reshape(nd, nm, e_max), sh)
    ei_dev = jax.device_put(ei_dev.reshape(nd, nm, e_max), sh)
    eid_dev = jax.device_put(eid_dev.reshape(nd, nm, e_max), sh)
    eu_g, ei_g = jnp.asarray(eu), jnp.asarray(ei)
    edge_w = jnp.asarray(w_np)

    fac = _try_factor(eu, ei, w_np, n_users, n_items)
    mm_dtype = _dense_dtype()
    if mm_dtype == jnp.int8 and fac is None:
        # int8 quantized mode only applies to the factored form (binary
        # incidence x per-channel-quantized operand); scattering arbitrary
        # float weights into an s8 block would be garbage, so generic
        # blocks fall back to bf16 (mirrors spmm_dense._generic_dtype)
        mm_dtype = jnp.dtype(jnp.bfloat16)
    if fac is not None:
        ru, ci, gain = fac
        ones = jnp.concatenate(
            [jnp.ones((e,), jnp.int8), jnp.zeros((1,), jnp.int8)])
        b = _scatter_blocks(eu_dev, ei_dev, ones[eid_dev],
                            u_pad, i_blk, jnp.int8, mesh)
        return ShardedDenseAdj(
            b, eu_dev, ei_dev, eid_dev, eu_g, ei_g, edge_w,
            jnp.asarray(ru), jnp.asarray(ci), jnp.float32(gain),
            n_users, n_items, u_pad, i_pad, mesh, mm_dtype)
    w_pad = jnp.concatenate([edge_w.astype(mm_dtype),
                             jnp.zeros((1,), mm_dtype)])
    b = _scatter_blocks(eu_dev, ei_dev, w_pad[eid_dev],
                        u_pad, i_blk, mm_dtype, mesh)
    return ShardedDenseAdj(
        b, eu_dev, ei_dev, eid_dev, eu_g, ei_g, edge_w, None, None, None,
        n_users, n_items, u_pad, i_pad, mesh, mm_dtype)


def sharded_dense_from_dense(adj, mesh: Mesh) -> ShardedDenseAdj:
    """Rebuild a single-device DenseAdj (which carries its edge arrays) as
    the mesh-sharded layout."""
    return build_sharded_dense(
        np.asarray(adj.edge_users), np.asarray(adj.edge_items),
        np.asarray(adj.edge_w), adj.n_users, adj.n_items, mesh)


def fits_sharded_dense(n_users: int, n_items: int, mesh: Mesh) -> bool:
    """Per-DEVICE budget gate: the block is spread over the grid, so the
    effective dense budget scales with the device count."""
    from selfrec_tpu.ops.spmm_dense import _dense_dtype
    import os

    nd, nm = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
    u_pad = _ceil_to(max(n_users, nm), nm)
    i_pad = _ceil_to(max(n_items, nd * nm), nd * nm)
    per_dev = u_pad * (i_pad // (nd * nm))
    budget_gb = float(os.environ.get("SELFREC_TPU_DENSE_BUDGET_GB", "5"))
    return per_dev * _dense_dtype().itemsize <= budget_gb * 1e9


def _mm_apply(adj: ShardedDenseAdj, xu: jnp.ndarray, xi: jnp.ndarray):
    """Raw sharded bidirectional matmul: xu (U_pad, D) model-row-sharded,
    xi (I_pad, D) model-row-sharded -> (out_u (U_pad, D), out_i (I_pad, D)),
    both model-row-sharded, data-replicated. No normalization here.

    int8 quantized mode (factored block + ``mm_dtype == int8``) needs NO
    extra collectives: each device per-channel-quantizes its LOCAL operand
    slice (ops/spmm_dense._quant_per_channel), runs the native s8 x s8 MXU
    matmul with s32-exact accumulation, and dequantizes to f32 with its
    local scale BEFORE the psum — partials sum in f32 exactly as in bf16
    mode, and per-device scales are strictly finer-grained than a global
    amax (no cross-device max reduction needed)."""
    nd, nm = adj.grid
    u_pad, i_blk = adj.u_pad, adj.i_blk
    mmd = adj.mm_dtype
    mesh = adj.mesh

    def f(b, xu_blk, xi_blk):
        from selfrec_tpu.ops.spmm_dense import _quant_per_channel

        b = b.reshape(u_pad, i_blk)
        quant = b.dtype == jnp.int8 and mmd == jnp.int8
        if b.dtype != jnp.int8 or mmd == jnp.float32:
            # generic value block, or forced-f32 comparison mode; the s8
            # incidence otherwise feeds dot_general directly (mixed
            # s8 x bf16 — same as the single-device path, see
            # ops/spmm_dense.dense_spmm)
            b = b.astype(mmd)
        dims = (((1,), (0,)), ((), ()))

        def mm(lhs, y):
            if quant:
                yq, ys = _quant_per_channel(y)
                return jax.lax.dot_general(
                    lhs, yq, dims, preferred_element_type=jnp.int32
                ).astype(jnp.float32) * ys
            return jnp.dot(lhs, y.astype(mmd),
                           preferred_element_type=jnp.float32)

        d_idx = jax.lax.axis_index(DATA_AXIS)
        xi_loc = jax.lax.dynamic_slice_in_dim(
            xi_blk, d_idx * i_blk, i_blk, axis=0)
        pu = mm(b, xi_loc)
        out_u = jax.lax.psum_scatter(
            pu, MODEL_AXIS, scatter_dimension=0, tiled=True)
        out_u = jax.lax.psum(out_u, DATA_AXIS)
        xu_full = jax.lax.all_gather(
            xu_blk, MODEL_AXIS, axis=0, tiled=True)
        pi = mm(b.T, xu_full)
        out_i = jax.lax.all_gather(pi, DATA_AXIS, axis=0, tiled=True)
        return out_u, out_i

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(DATA_AXIS, MODEL_AXIS, None, None),
                  P(MODEL_AXIS, None), P(MODEL_AXIS, None)),
        out_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS, None)),
        check_vma=False,
    )(adj.b, xu, xi)


def _pad_rows(x: jnp.ndarray, n: int) -> jnp.ndarray:
    pad = n - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def _apply(adj: ShardedDenseAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Unified-node-space propagation (same contract as dense_spmm):
    x ((U+I), D) in [users; items] order -> [A @ x_i ; A.T @ x_u]."""
    xu = x[: adj.n_users].astype(jnp.float32)
    xi = x[adj.n_users :].astype(jnp.float32)
    if adj.factored:
        xu = xu * (adj.row_scale[:, None] * adj.gain)
        xi = xi * adj.col_scale[:, None]
    xu = _pad_rows(xu, adj.u_pad)
    xi = _pad_rows(xi, adj.i_pad)
    out_u, out_i = _mm_apply(adj, xu, xi)
    out_u = out_u[: adj.n_users]
    out_i = out_i[: adj.n_items]
    if adj.factored:
        out_u = out_u * (adj.row_scale[:, None] * adj.gain)
        out_i = out_i * adj.col_scale[:, None]
    return jnp.concatenate([out_u, out_i], axis=0).astype(x.dtype)


@jax.custom_vjp
def sharded_dense_spmm(adj: ShardedDenseAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Sharded propagation with the symmetric-reuse VJP: the unified
    Laplacian is symmetric, so d/dx (L @ x)^T g = L @ g — the backward pass
    IS the forward kernel (no transpose plan, no second stored block)."""
    return _apply(adj, x)


def _fwd(adj, x):
    return _apply(adj, x), adj


def _bwd(adj, g):
    zero_adj = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        adj,
    )
    return zero_adj, _apply(adj, g)


sharded_dense_spmm.defvjp(_fwd, _bwd)


# -- generic dense matrix (DenseMat) under the mesh --------------------------


@jax.tree_util.register_pytree_node_class
class ShardedDenseMat:
    """Row-sharded static dense (M, N) matrix (ops/spmm_dense.DenseMat
    under a mesh — MHCN's social channels / rating blocks, SEPT's views).

    ``a`` is (M_pad, N) placed P((data, model), None): each device holds a
    contiguous row block. The matmul runs as an EXPLICIT shard_map (not
    GSPMD resolution — whose cost model happily all-gathers the whole
    block at small sizes, which would be catastrophic at douban scale):
    forward is the local-rows matmul (zero collectives on the block;
    output row-sharded), and the custom VJP computes d_x as a psum over
    the grid of the local a_blk^T @ g_blk partials — every collective is
    (N, D) operand-sized, never (M, N)."""

    def __init__(self, a, n_rows: int, mesh: Mesh):
        self.a = a
        self.n_rows = n_rows
        self.n_nodes = n_rows  # DenseMat API
        self.mesh = mesh

    @property
    def shape(self):
        return (self.n_rows, self.a.shape[1])

    def tree_flatten(self):
        return (self.a,), (self.n_rows, self.mesh)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    def __repr__(self):
        return (f"ShardedDenseMat({self.n_rows}x{self.a.shape[1]}, "
                f"{self.a.dtype}, {self.mesh.devices.size} devices)")


def shard_dense_mat(dm, mesh: Mesh) -> ShardedDenseMat:
    """Place a DenseMat's block row-sharded over the whole device grid
    (rows padded to a multiple of the device count)."""
    ndev = mesh.devices.size
    m = dm.a.shape[0]
    m_pad = _ceil_to(max(m, ndev), ndev)
    a = dm.a
    if m_pad != m:
        a = jnp.concatenate(
            [a, jnp.zeros((m_pad - m, a.shape[1]), a.dtype)])
    sh = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))
    return ShardedDenseMat(jax.device_put(a, sh), m, mesh)


def _mat_apply(adj: ShardedDenseMat, x: jnp.ndarray) -> jnp.ndarray:
    def f(a_blk, xx):
        return jnp.dot(a_blk, xx.astype(a_blk.dtype),
                       preferred_element_type=jnp.float32)

    out = jax.shard_map(
        f, mesh=adj.mesh,
        in_specs=(P((DATA_AXIS, MODEL_AXIS), None), P(None, None)),
        out_specs=P((DATA_AXIS, MODEL_AXIS), None),
        check_vma=False,
    )(adj.a, x)
    return out[: adj.n_rows].astype(x.dtype)


@jax.custom_vjp
def sharded_dense_mat_spmm(adj: ShardedDenseMat, x: jnp.ndarray):
    return _mat_apply(adj, x)


def _mat_fwd(adj, x):
    return _mat_apply(adj, x), adj


def _mat_bwd(adj, g):
    m_pad = adj.a.shape[0]
    pad = m_pad - g.shape[0]
    g32 = g.astype(jnp.float32)
    if pad:
        g32 = jnp.concatenate(
            [g32, jnp.zeros((pad,) + g.shape[1:], jnp.float32)])

    def b(a_blk, g_blk):
        part = jnp.dot(a_blk.T.astype(jnp.float32), g_blk,
                       preferred_element_type=jnp.float32)
        part = jax.lax.psum(part, DATA_AXIS)
        return jax.lax.psum(part, MODEL_AXIS)

    d_x = jax.shard_map(
        b, mesh=adj.mesh,
        in_specs=(P((DATA_AXIS, MODEL_AXIS), None),
                  P((DATA_AXIS, MODEL_AXIS), None)),
        out_specs=P(None, None),
        check_vma=False,
    )(adj.a, g32)
    zero_adj = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        adj,
    )
    return zero_adj, d_x.astype(g.dtype)


sharded_dense_mat_spmm.defvjp(_mat_fwd, _mat_bwd)
