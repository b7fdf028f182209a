"""Halo-exchange sharded SpMM — explicit-collective graph propagation.

SURVEY.md §2.4 "sharded SpMM with halo exchange". Round-1 left this to GSPMD,
which compiles the ELL gather over a ``model``-axis row-sharded table into a
masked local gather + a cross-model **all-reduce of the whole (V·K, C) gather
output** per propagation (see scripts/audit_collectives.py) — nnz-sized ICI
traffic, orders of magnitude above the information floor (the unique halo
rows). This module replaces that with a shard_map kernel whose communication
is exactly the halo:

- **Table layout**: rows block-partitioned over ``model`` (shard s owns rows
  [s·R_src, (s+1)·R_src)); replicated over ``data``.
- **Work layout**: ELL virtual rows (ops/spmm_ell.py row splitting) are owned
  by the ``model`` shard owning their destination row, and round-robin split
  over ``data`` within each owner, so all ND·M devices compute.
- **Halo**: each device's slots reference some remote source rows. The host
  plan precomputes, per (device, owning shard), the **unique** remote rows;
  one ``all_to_all`` over ``model`` per SpMM ships exactly those (padded to
  the static max H). Local rows are indexed directly — never shipped.
- **Reduction**: per-device partial segment-sum over its virtual rows, then a
  ``psum`` over ``data`` of the (R_dst, C) block — output is block-sharded
  exactly like the input, so K-layer chains need no resharding between hops.
- **Backward**: the adjoint of A@x is Aᵀ@g — a custom VJP runs the same
  kernel with the transpose plan (gather-only autodiff, like ell_spmm).

The reference has no distributed analog (single ``.cuda()`` device,
/root/reference/model/graph/LightGCN.py:72); this is the TPU-native design
the reference's cuSPARSE spmm cannot express.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from selfrec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class HaloPlan(NamedTuple):
    """Static per-device gather/exchange plan for one propagation direction.

    All array fields are stacked (ND, M, ...) and placed so device (d, s)
    holds exactly its slice; inside shard_map they arrive as (1, 1, ...).
    """

    vidx: jnp.ndarray       # (ND, M, Vmax*K) int32 in [0, R_src + M*H)
    vdst: jnp.ndarray       # (ND, M, Vmax) int32 local dst row, pad -> R_dst
    slot_edge: jnp.ndarray  # (ND, M, Vmax*K) int32 original edge id, pad -> E
    send_idx: jnp.ndarray   # (ND, M, M*H) int32 local src rows for each peer
    n_rows: int             # true destination count
    n_cols: int             # true source count
    r_dst: int
    r_src: int
    k: int
    h: int
    vmax: int
    n_edges: int

    def comm_bytes(self, n_channels: int, dtype_bytes: int = 4) -> dict:
        """Per-device per-call communication volume."""
        nd, m = self.vidx.shape[0], self.vidx.shape[1]
        a2a = (m - 1) * self.h * n_channels * dtype_bytes
        psum = self.r_dst * n_channels * dtype_bytes if nd > 1 else 0
        return {"all_to_all": a2a, "psum_block": psum}


def build_halo_plan(
    src: np.ndarray,
    dst: np.ndarray,
    n_rows: int,
    n_cols: int,
    nd: int,
    nm: int,
    k: int = 16,
) -> HaloPlan:
    """Host-side one-time plan build (numpy; one O(E_dev) pass per device)."""
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    e = len(src)
    r_dst = -(-n_rows // nm)
    r_src = -(-n_cols // nm)

    # --- row-split virtual rows (same construction as spmm_ell.build_ell_layout)
    order = np.argsort(dst, kind="stable").astype(np.int32)
    s_dst = dst[order]
    counts = np.bincount(s_dst, minlength=n_rows).astype(np.int32)
    run_starts = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=run_starts[1:])
    within = np.arange(e, dtype=np.int32) - run_starts[s_dst]
    vrows_per_dst = -(-counts // k)
    first_vrow = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(vrows_per_dst, out=first_vrow[1:])
    v = int(first_vrow[-1])
    edge_vrow_sorted = first_vrow[s_dst] + within // k
    edge_slot_sorted = within % k
    nz = np.nonzero(vrows_per_dst)[0]
    vdst_g = np.repeat(nz.astype(np.int32), vrows_per_dst[nz])  # (V,) sorted

    # --- device assignment: owner shard by dst block, round-robin over data
    owner = vdst_g // r_dst  # (V,) non-decreasing
    v_data = np.empty(v, dtype=np.int32)
    v_local = np.empty(v, dtype=np.int32)
    vmax = 1
    for s in range(nm):
        vs = np.nonzero(owner == s)[0]
        pos = np.arange(len(vs), dtype=np.int32)
        v_data[vs] = pos % nd
        v_local[vs] = pos // nd
        if len(vs):
            vmax = max(vmax, int(-(-len(vs) // nd)))

    # --- per-edge device coordinates (original edge order)
    inv = np.empty(e, dtype=np.int32)
    inv[order] = np.arange(e, dtype=np.int32)
    edge_vrow = edge_vrow_sorted[inv]
    edge_slot = edge_slot_sorted[inv]
    e_owner = owner[edge_vrow]
    e_data = v_data[edge_vrow]
    e_local = v_local[edge_vrow]

    vdst_arr = np.full((nd, nm, vmax), r_dst, dtype=np.int32)
    vdst_arr[v_data, owner, v_local] = vdst_g - owner * r_dst
    slot_edge = np.full((nd, nm, vmax, k), e, dtype=np.int32)
    slot_edge[e_data, e_owner, e_local, edge_slot] = np.arange(e, dtype=np.int32)
    vidx_g = np.zeros((nd, nm, vmax, k), dtype=np.int64)
    vidx_g[e_data, e_owner, e_local, edge_slot] = src
    src_owner = np.full((nd, nm, vmax, k), -1, dtype=np.int32)
    src_owner[e_data, e_owner, e_local, edge_slot] = src // r_src

    # --- halo: unique remote rows per (device, owning shard)
    uniques = {}
    h = 1
    for d in range(nd):
        for s in range(nm):
            so = src_owner[d, s].ravel()
            sg = vidx_g[d, s].ravel()
            for o in range(nm):
                if o == s:
                    continue
                u = np.unique(sg[so == o])
                uniques[(d, s, o)] = u
                h = max(h, len(u))

    vidx = np.zeros((nd, nm, vmax * k), dtype=np.int32)
    send_idx = np.zeros((nd, nm, nm, h), dtype=np.int32)
    for d in range(nd):
        for s in range(nm):
            so = src_owner[d, s].ravel()
            sg = vidx_g[d, s].ravel()
            out = np.zeros(vmax * k, dtype=np.int32)
            local = so == s
            out[local] = (sg[local] - s * r_src).astype(np.int32)
            for o in range(nm):
                if o == s:
                    continue
                u = uniques[(d, s, o)]
                m = so == o
                if len(u):
                    out[m] = r_src + o * h + np.searchsorted(u, sg[m]).astype(
                        np.int32
                    )
                # device (d, o) serves these requests from ITS block
                send_idx[d, o, s, : len(u)] = (u - o * r_src).astype(np.int32)
            vidx[d, s] = out

    return HaloPlan(
        vidx=jnp.asarray(vidx),
        vdst=jnp.asarray(vdst_arr),
        slot_edge=jnp.asarray(slot_edge.reshape(nd, nm, vmax * k)),
        send_idx=jnp.asarray(send_idx.reshape(nd, nm, nm * h)),
        n_rows=n_rows,
        n_cols=n_cols,
        r_dst=r_dst,
        r_src=r_src,
        k=k,
        h=h,
        vmax=vmax,
        n_edges=e,
    )


def _place_plan(plan: HaloPlan, mesh: Mesh) -> HaloPlan:
    sh = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    return plan._replace(
        vidx=jax.device_put(plan.vidx, sh),
        vdst=jax.device_put(plan.vdst, sh),
        slot_edge=jax.device_put(plan.slot_edge, sh),
        send_idx=jax.device_put(plan.send_idx, sh),
    )


def _halo_apply(plan: HaloPlan, mesh: Mesh, w_pad: jnp.ndarray,
                x: jnp.ndarray, n_passes: int) -> jnp.ndarray:
    """w_pad (P, E+1) per-pass edge weights (original order, 0 at index E);
    x (n_cols, P*D) -> (n_rows, P*D)."""
    from selfrec_tpu.ops.precision import compute_dtype

    nm = mesh.shape[MODEL_AXIS]
    c = x.shape[-1]
    p = n_passes
    d_ch = c // p
    r_src, r_dst, vmax, k, h = plan.r_src, plan.r_dst, plan.vmax, plan.k, plan.h
    dt = compute_dtype()
    if dt is not None:
        x = x.astype(dt)
        w_pad = w_pad.astype(dt)

    # pad sources to the block-partitioned size
    pad = nm * r_src - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, c), dtype=x.dtype)], axis=0)
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(MODEL_AXIS, None))
    )

    def shard_fn(vidx, vdst, slot_edge, send_idx, w_pad, x_loc):
        vidx = vidx.reshape(vmax * k)
        vdst = vdst.reshape(vmax)
        slot_edge = slot_edge.reshape(vmax * k)
        send_idx = send_idx.reshape(nm * h)
        # ship exactly the unique halo rows each peer requested
        send = x_loc[send_idx]
        halo = jax.lax.all_to_all(send, MODEL_AXIS, 0, 0, tiled=True)
        xfull = jnp.concatenate([x_loc, halo], axis=0)
        g = xfull[vidx].reshape(vmax, k, p, d_ch)
        w = w_pad[:, slot_edge].reshape(p, vmax, k)
        part = jnp.einsum(
            "pvk,vkpd->vpd", w, g, preferred_element_type=jnp.float32
        ).reshape(vmax, c)
        out = jax.ops.segment_sum(
            part, vdst, num_segments=r_dst + 1, indices_are_sorted=True
        )[:r_dst]
        return jax.lax.psum(out, DATA_AXIS)

    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, MODEL_AXIS),
            P(DATA_AXIS, MODEL_AXIS),
            P(DATA_AXIS, MODEL_AXIS),
            P(DATA_AXIS, MODEL_AXIS),
            P(),
            P(MODEL_AXIS, None),
        ),
        out_specs=P(MODEL_AXIS, None),
        check_vma=False,
    )(plan.vidx, plan.vdst, plan.slot_edge, plan.send_idx, w_pad, x)
    return out[: plan.n_rows]


@jax.tree_util.register_pytree_node_class
class HaloAdj:
    """Sharded adjacency: forward + transpose halo plans and the per-edge
    weights in original edge order. API-compatible with spmm_ell.EllAdj
    (``edge_w``/``reweight``) so per-epoch dropped views reuse the plans."""

    def __init__(self, fwd: HaloPlan, bwd: HaloPlan, edge_w: jnp.ndarray,
                 mesh: Mesh):
        self.fwd = fwd
        self.bwd = bwd
        self.edge_w = edge_w
        self.mesh = mesh

    def tree_flatten(self):
        f, b = self.fwd, self.bwd
        children = (f.vidx, f.vdst, f.slot_edge, f.send_idx,
                    b.vidx, b.vdst, b.slot_edge, b.send_idx, self.edge_w)
        aux = (f[4:], b[4:], self.mesh)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        f_static, b_static, mesh = aux
        fv, fd, fs, fx, bv, bd, bs, bx, ew = children
        return cls(HaloPlan(fv, fd, fs, fx, *f_static),
                   HaloPlan(bv, bd, bs, bx, *b_static), ew, mesh)

    def reweight(self, edge_w: jnp.ndarray) -> "HaloAdj":
        return HaloAdj(self.fwd, self.bwd, edge_w, self.mesh)

    def comm_bytes(self, n_channels: int) -> dict:
        return {
            "fwd": self.fwd.comm_bytes(n_channels),
            "bwd": self.bwd.comm_bytes(n_channels),
        }

    def __repr__(self):
        return (f"HaloAdj(E={self.fwd.n_edges}, Vmax={self.fwd.vmax},"
                f" K={self.fwd.k}, H={self.fwd.h})")


def build_halo_adj(src, dst, w, n_rows, n_cols, mesh: Mesh, k: int = 16
                   ) -> HaloAdj:
    nd, nm = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
    fwd = _place_plan(
        build_halo_plan(src, dst, n_rows, n_cols, nd, nm, k), mesh)
    bwd = _place_plan(
        build_halo_plan(dst, src, n_cols, n_rows, nd, nm, k), mesh)
    return HaloAdj(fwd, bwd, jnp.asarray(np.asarray(w, dtype=np.float32)),
                   mesh)


def halo_from_ell(ell, mesh: Mesh) -> HaloAdj:
    """Rebuild a HaloAdj from an existing EllAdj (the single-device layout
    carries enough to recover the original edge list)."""
    slots = np.asarray(ell.fwd.edge_slots)
    src = np.asarray(ell.fwd.vidx)[slots]
    dst = np.asarray(ell.fwd.vdst)[slots // ell.fwd.k]
    return build_halo_adj(src, dst, np.asarray(ell.edge_w),
                          ell.fwd.n_rows, ell.bwd.n_rows, mesh, k=ell.fwd.k)


def _w_pad(edge_w: jnp.ndarray) -> jnp.ndarray:
    """(P, E) or (E,) weights -> (P, E+1) with the pad slot zeroed."""
    if edge_w.ndim == 1:
        edge_w = edge_w[None]
    return jnp.pad(edge_w, ((0, 0), (0, 1)))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def halo_spmm_packed(adj: HaloAdj, w_edge_stack: jnp.ndarray, x: jnp.ndarray,
                     n_passes: int) -> jnp.ndarray:
    """P-pass packed sharded SpMM (the HaloAdj analog of ell_spmm_packed).
    Gradient flows to ``x`` only — adjacency weights are graph constants."""
    return _halo_apply(adj.fwd, adj.mesh, _w_pad(w_edge_stack), x, n_passes)


def _halo_packed_fwd(adj, w_edge_stack, x, n_passes):
    return halo_spmm_packed(adj, w_edge_stack, x, n_passes), (adj, w_edge_stack)


def _halo_packed_bwd(n_passes, res, g):
    adj, w_edge_stack = res
    dx = _halo_apply(adj.bwd, adj.mesh, _w_pad(w_edge_stack), g, n_passes)
    zero_adj = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        adj,
    )
    return zero_adj, jnp.zeros_like(w_edge_stack), dx


halo_spmm_packed.defvjp(_halo_packed_fwd, _halo_packed_bwd)


def halo_spmm(adj: HaloAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out[d] = Σ_{e: dst[e]=d} w[e] * x[src[e]], sharded, gather-only VJP."""
    return halo_spmm_packed(adj, adj.edge_w, x, 1)
