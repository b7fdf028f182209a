"""Dense-bipartite adjacency propagation — the MXU fast path for mid-size graphs.

The symmetric normalized Laplacian every LightGCN-family model propagates over
(reference /root/reference/data/ui_graph.py:58-65, consumed by e.g.
model/graph/LightGCN.py:72) is bipartite: the (U+I)x(U+I) matrix has nonzeros
only in its U-x-I block A and its transpose. Propagation is therefore two
dense matmuls

    out_users = A @ x_items        out_items = A.T @ x_users

over ONE stored (U, I) buffer. Why this beats the sparse paths on TPU:

- The row-split ELL gather chain (ops/spmm_ell.py) is per-slot-overhead
  bound: ~12-20% of v5e HBM peak (BANDWIDTH.json), because a vectorized
  gather never tiles onto the MXU and this toolchain's Mosaic gather is
  broken (ops/spmm_pallas.py).
- A dense matmul streams the adjacency at near-peak HBM bandwidth and the
  cost is INDEPENDENT of the operand width D — every packed/fused
  multi-chain propagation (SimGCL's 3 chains, SGL's views) rides free,
  where the ELL path pays ~1.7x going D=64 -> D=192.
- Stored bf16, accumulated f32 on the MXU (`preferred_element_type`), the
  buffer is U*I*2 bytes — 2.4 GB at yelp2018 scale, well inside one v5e's
  16 GB. `fits_dense` gates on a budget; bigger graphs (douban social
  motifs etc.) stay on ELL.

The matrix is built ON DEVICE by scattering the edge list (nnz * 12 bytes
host->device, not U*I*2), so setup cost is one scatter, and per-epoch
reweighted views (edge dropout) can rebuild it cheaply on device too.

Numerics: adjacency values and the streamed operand are bf16 (~3 significant
decimal digits); accumulation is f32. This is a documented deviation from
the reference's f32 sparse matmul — per-entry relative error ~4e-3 averages
down over node degree in each f32 row-sum, and converged quality is
validated head-to-head in PARITY.md. Set ``SELFREC_TPU_DENSE=0`` (or dtype
``SELFREC_TPU_DENSE_DTYPE=float32``) to fall back.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _dense_dtype():
    name = os.environ.get("SELFREC_TPU_DENSE_DTYPE", "bfloat16")
    return jnp.dtype(name)


def _generic_dtype():
    """Value-block dtype for NON-factored mode: the int8 opt-in only makes
    sense for the factored form (binary incidence x quantized operand);
    arbitrary per-edge weights scattered into an s8 block would be garbage,
    so generic blocks fall back to bf16."""
    d = _dense_dtype()
    return jnp.dtype(jnp.bfloat16) if d == jnp.int8 else d


@jax.tree_util.register_pytree_node_class
class DenseAdj:
    """Bipartite normalized adjacency held as a dense (U, I) block.

    Two storage modes:

    - **factored** (``row_scale is not None``): the block is the BINARY
      incidence as int8 and the normalization lives in f32 diagonal
      scalings, ``A = gain * diag(row_scale) @ B @ diag(col_scale)``. The
      symmetric Laplacian's values are exactly ``1/sqrt(du*di)``, so this
      is EXACT (no bf16 quantization of the weights at all) AND halves the
      HBM traffic of the matmul — measured 3.3x faster than the bf16 block
      on v5e (D=192 bidirectional pass: 9.0ms vs 29.7ms).
    - **generic** (``row_scale is None``): arbitrary per-edge weights as a
      bf16 (or configured dtype) block.

    Carries the original edge arrays so dropout/reweighted views can rebuild
    the dense block on device (see :meth:`reweight`). Pytree children are
    the device arrays; (n_users, n_items) are static so jitted consumers
    specialise on the shapes.
    """

    def __init__(self, a_ui: jnp.ndarray, edge_users: jnp.ndarray,
                 edge_items: jnp.ndarray, edge_w: jnp.ndarray,
                 n_users: int, n_items: int,
                 row_scale=None, col_scale=None, gain=None,
                 mm_dtype=jnp.bfloat16):
        self.a_ui = a_ui
        self.edge_users = edge_users
        self.edge_items = edge_items
        self.edge_w = edge_w  # f32 per-edge weights, original edge order
        self.row_scale = row_scale
        self.col_scale = col_scale
        self.gain = gain
        self.mm_dtype = jnp.dtype(mm_dtype)  # matmul compute dtype (factored)
        self.n_users = n_users
        self.n_items = n_items
        self.n_nodes = n_users + n_items

    @property
    def factored(self) -> bool:
        return self.row_scale is not None

    def tree_flatten(self):
        return ((self.a_ui, self.edge_users, self.edge_items, self.edge_w,
                 self.row_scale, self.col_scale, self.gain),
                (self.n_users, self.n_items, self.mm_dtype))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:4], aux[0], aux[1], *children[4:],
                   mm_dtype=aux[2])

    def reweight(self, w: jnp.ndarray) -> "DenseAdj":
        """New DenseAdj with per-edge weights ``w`` (original edge order) —
        the dense analog of EllAdj.reweight, used by adj_dropout and
        per-epoch renormalized views. One on-device scatter; the result is
        generic-mode (arbitrary weights don't factor into diag scalings)."""
        dtype = _generic_dtype() if self.factored else self.a_ui.dtype
        a = _scatter_dense(self.edge_users, self.edge_items, w,
                           self.n_users, self.n_items, dtype)
        return DenseAdj(a, self.edge_users, self.edge_items, w,
                        self.n_users, self.n_items)

    def dropout_view(self, key, rate) -> "DenseAdj":
        """Per-STEP sparse dropout (reference sparse_dropout semantics,
        BUIR.py:118-127: keep each edge w.p. 1-rate, scale kept weights by
        1/(1-rate), NO degree re-normalization; ``rate`` may be traced —
        BUIR draws rate = U[0,1) * drop_ratio per forward).

        On TPU, factored blocks take a FUSED full-matrix mask: ``B ⊙ M``
        with ``M ~ Bernoulli(1-rate)`` per POSITION. Since B is binary,
        masking non-edge positions is a no-op, so the per-EDGE keep
        distribution is identical to a per-edge draw — but XLA compiles
        RNG + compare + multiply + write into ONE streaming pass over the
        block, replacing the 1.56M-random-index scatter-multiply that
        dominated BUIR's step in round 3 (82 ms/view at yelp scale; the
        scatter serializes, the stream rides HBM bandwidth — A/B in
        BUIR_BREAKDOWN.json). The mask bits come from the hardware-friendly
        RBG generator (XLA RngBitGenerator; 3.2x faster than threefry for
        a U*I draw on v5e) as uint16, thresholded at round(rate * 2^16) —
        keep probability is quantized to 1/65536 (≤1.5e-5 absolute, far
        inside any convergence band; gates: results/h2h/our_BUIR_30.log).
        The factored form survives EXACTLY — B ⊙ M is still binary and the
        1/(1-rate) rescale folds into the ``gain`` scalar.

        On CPU the economics invert (U*I draws per view vs nnz), so the
        default there is the per-edge scatter-multiply; override with
        SELFREC_TPU_DROPOUT_MASK=fused|scatter. Generic value blocks
        (duplicate-edge graphs, where per-edge and per-position draws
        differ) always keep the per-edge scatter."""
        inv = 1.0 / (1.0 - rate)
        if self.factored:
            mode = os.environ.get("SELFREC_TPU_DROPOUT_MASK")
            fused = (mode == "fused" or
                     (mode != "scatter" and jax.default_backend() != "cpu"))
            if fused:
                mask = _rbg_keep_mask(key, self.a_ui.shape, rate)
                b = self.a_ui * mask.astype(self.a_ui.dtype)
            else:
                keep = jax.random.uniform(key, self.edge_w.shape) >= rate
                b = self.a_ui.at[self.edge_users, self.edge_items].multiply(
                    keep.astype(self.a_ui.dtype))
            return DenseAdj(b, self.edge_users, self.edge_items,
                            self.edge_w, self.n_users, self.n_items,
                            self.row_scale, self.col_scale,
                            self.gain * inv, mm_dtype=self.mm_dtype)
        keep = jax.random.uniform(key, self.edge_w.shape) >= rate
        b = self.a_ui.at[self.edge_users, self.edge_items].multiply(
            keep.astype(self.a_ui.dtype))
        return DenseAdj(b * jnp.asarray(inv, b.dtype), self.edge_users,
                        self.edge_items, self.edge_w,
                        self.n_users, self.n_items)

    def refactor_view(self, keep: jnp.ndarray) -> "DenseAdj":
        """Symmetric-renormalized dropped view that STAYS int8-factored.

        The kept-edge Laplacian's weights are exactly 1/sqrt(du'*di') over
        the RECOMPUTED degrees (reference edge dropout ->
        convert_to_laplacian_mat, SGL.py:89-96 + ui_graph.py:58-65) — i.e.
        a new binary incidence plus new f32 diagonal scalings. Unlike
        :meth:`reweight` this keeps the view on the int8 MXU fast path with
        zero weight quantization: per-epoch SGL/SEPT views cost one int8
        scatter + two segment-sums, and propagate at clean-graph speed.
        ``keep`` is (E,) bool over the original edge order; fully jittable."""
        kf = keep.astype(jnp.float32)
        du = jax.ops.segment_sum(kf, self.edge_users,
                                 num_segments=self.n_users)
        di = jax.ops.segment_sum(kf, self.edge_items,
                                 num_segments=self.n_items)
        ru = jnp.where(du > 0, jax.lax.rsqrt(jnp.maximum(du, 1e-12)), 0.0)
        ci = jnp.where(di > 0, jax.lax.rsqrt(jnp.maximum(di, 1e-12)), 0.0)
        b = jnp.zeros((self.n_users, self.n_items), jnp.int8).at[
            self.edge_users, self.edge_items].add(keep.astype(jnp.int8))
        w = kf * ru[self.edge_users] * ci[self.edge_items]
        return DenseAdj(b, self.edge_users, self.edge_items, w,
                        self.n_users, self.n_items,
                        ru, ci, jnp.float32(1.0), mm_dtype=self.mm_dtype)

    def __repr__(self):
        mode = "int8-factored" if self.factored else f"{self.a_ui.dtype}"
        return (f"DenseAdj(U={self.n_users}, I={self.n_items}, {mode}, "
                f"{self.a_ui.nbytes / 1e9:.2f} GB)")


def _rbg_keep_mask(key, shape, rate):
    """Bernoulli(1-rate) keep mask over ``shape`` from the RBG generator.

    Derives an RBG key from the caller's threefry key (pure function of it,
    so checkpoint-resume exactness is preserved) and thresholds uint16 bits
    at round(rate * 2^16): P(keep) = (65536 - t)/65536. ``rate`` may be
    traced (BUIR draws rate = U[0,1)*drop_ratio per forward, BUIR.py:135);
    the threshold clamps to 65535 so rate -> 1.0 stays a valid (degenerate)
    mask instead of wrapping to keep-everything."""
    if hasattr(key, "dtype") and jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    else:
        kd = key
    rbg = jax.random.wrap_key_data(
        jnp.concatenate([kd, kd]).astype(jnp.uint32)[:4], impl="rbg")
    thresh = jnp.minimum(
        jnp.round(rate * 65536.0), 65535.0).astype(jnp.uint16)
    return jax.random.bits(rbg, shape, jnp.uint16) >= thresh


def _scatter_dense(edge_users, edge_items, w, n_users, n_items, dtype):
    # .add (not .set) so duplicate (user, item) edges SUM, matching the
    # segment_sum / ELL sparse paths' multigraph semantics.
    zeros = jnp.zeros((n_users, n_items), dtype=dtype)
    return zeros.at[edge_users, edge_items].add(w.astype(dtype))


def _try_factor(edge_users, edge_items, w, n_users, n_items):
    """Detect the symmetric-normalization structure w = 1/sqrt(du*di)
    (or a constant multiple of it) from the edge weights. Returns
    (row_scale, col_scale, gain) numpy arrays, or None."""
    import numpy as np

    eu = np.asarray(edge_users)
    ei = np.asarray(edge_items)
    w = np.asarray(w, dtype=np.float64)
    if len(w) == 0 or np.any(w <= 0):
        return None
    # Duplicate (user, item) edges can't be represented by a binary
    # incidence — fall back to the generic value block, whose scatter
    # SUMS duplicates like the sparse paths.
    if len(np.unique(eu.astype(np.int64) * (n_items + 1) + ei)) != len(eu):
        return None
    du = np.bincount(eu, minlength=n_users).astype(np.float64)
    di = np.bincount(ei, minlength=n_items).astype(np.float64)
    ru = 1.0 / np.sqrt(np.maximum(du, 1.0))
    ci = 1.0 / np.sqrt(np.maximum(di, 1.0))
    expected = ru[eu] * ci[ei]
    ratio = w / expected
    gain = float(ratio[0])
    if np.max(np.abs(ratio - gain)) <= 1e-5 * gain:
        return (ru.astype(np.float32), ci.astype(np.float32), gain)
    # plain constant weights (e.g. unnormalized binary graphs)
    c = float(w[0])
    if np.max(np.abs(w - c)) <= 1e-6 * max(abs(c), 1e-30):
        return (np.ones(n_users, np.float32), np.ones(n_items, np.float32), c)
    return None


def dense_adj_from_edges(edge_users, edge_items, w, n_users: int,
                         n_items: int, dtype=None) -> DenseAdj:
    """Build the dense block on device from (user, item, weight) edges.

    Symmetric-normalized (or constant) weights get the exact int8-factored
    form; anything else falls back to a value block in ``dtype`` (default
    env ``SELFREC_TPU_DENSE_DTYPE``). Pass ``dtype`` explicitly (e.g. in
    tests) to force the generic mode."""
    eu = jnp.asarray(edge_users, dtype=jnp.int32)
    ei = jnp.asarray(edge_items, dtype=jnp.int32)
    w32 = jnp.asarray(w, dtype=jnp.float32)
    if dtype is None:
        fac = _try_factor(edge_users, edge_items, w, n_users, n_items)
        if fac is not None:
            ru, ci, gain = fac
            b = jnp.zeros((n_users, n_items), jnp.int8).at[eu, ei].set(1)
            # matmul runs in the configured dense dtype: bf16 default
            # (int8 block + exact f32 scalings), float32 when forced for
            # bit-level comparisons against the sparse f32 paths
            return DenseAdj(b, eu, ei, w32, n_users, n_items,
                            jnp.asarray(ru), jnp.asarray(ci),
                            jnp.float32(gain), mm_dtype=_dense_dtype())
        dtype = _generic_dtype()
    a = _scatter_dense(eu, ei, w32, n_users, n_items, dtype)
    return DenseAdj(a, eu, ei, w32, n_users, n_items)


def fits_dense_elems(n_elems: int, dtype=None) -> bool:
    """Whether ``n_elems`` dense values of ``dtype`` fit the configured HBM
    budget (default 5 GB). ``dtype=None`` uses ``_dense_dtype()`` — correct
    for factored int8 incidence blocks; callers gating GENERIC value blocks
    (DenseMat, reweighted views) must pass ``_generic_dtype()``, which stays
    bf16 (2 bytes) even under SELFREC_TPU_DENSE_DTYPE=int8."""
    budget_gb = float(os.environ.get("SELFREC_TPU_DENSE_BUDGET_GB", "5"))
    itemsize = (jnp.dtype(dtype) if dtype is not None
                else _dense_dtype()).itemsize
    return n_elems * itemsize <= budget_gb * 1e9


def fits_dense(n_users: int, n_items: int, dtype=None) -> bool:
    """Whether one dense (n_users, n_items) block fits the budget."""
    return fits_dense_elems(n_users * n_items, dtype)


@jax.tree_util.register_pytree_node_class
class DenseMat:
    """General dense (M, N) backend for STATIC square/rectangular
    normalized adjacencies — MHCN's social hypergraph channels
    H_s/H_j/H_p (U x U) and rating blocks R/R^T, which the reference runs
    as TF1 sparse matmuls inside every training step
    (/root/reference/model/graph/MHCN.py:183-201).

    One MXU matmul (values in ``_generic_dtype()``, f32 accumulation)
    replaces the ELL gather chain; autodiff's transpose (A^T @ g) reuses
    the SAME buffer with swapped contracting dims — no second copy, no
    custom VJP needed. Strictly opt-in via
    ``norm_adj_from_scipy(dense_general=True)``: per-step-dropout models
    (BUIR) must stay on ELL (ops/graph.adj_dropout would otherwise
    re-scatter a multi-MB block every scan step), and value blocks are
    bf16 — a documented numerics deviation validated the same way as the
    bipartite dense path (tests/test_social_oracle.py tolerances +
    training-curve parity in tests/test_social.py)."""

    def __init__(self, a: jnp.ndarray):
        self.a = a
        self.n_nodes = a.shape[0]

    @property
    def shape(self):
        return self.a.shape

    def tree_flatten(self):
        return (self.a,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def __repr__(self):
        return (f"DenseMat({self.a.shape[0]}x{self.a.shape[1]}, "
                f"{self.a.dtype}, {self.a.nbytes / 1e9:.3f} GB)")


def dense_mat_spmm(adj: DenseMat, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(adj.a, x.astype(adj.a.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


def adj_edge_perm(adj, edge_users, edge_items, n_items: int):
    """perm[j] = dataset-edge index of the adjacency's j-th edge, so a
    keep-mask drawn in dataset edge order applies to the dense block's
    edge order (DenseAdj/ShardedDenseAdj build from the scipy COO of
    norm_adj, whose order differs). Used by the per-epoch dropped-view
    models (SGL/SEPT) before refactor_view."""
    import numpy as np

    eu = np.asarray(edge_users)
    ei = np.asarray(edge_items)
    data_key = eu.astype(np.int64) * n_items + ei
    adj_key = (np.asarray(adj.edge_users).astype(np.int64) * n_items
               + np.asarray(adj.edge_items))
    order = np.argsort(data_key)
    pos = np.searchsorted(data_key[order], adj_key)
    assert np.array_equal(data_key[order][pos], adj_key), (
        "adjacency edges are not a permutation of the dataset edges")
    return order[pos].astype(np.int32)


def dense_mat_from_scipy(mat) -> DenseMat:
    """Build the dense matrix ON DEVICE from a host scipy sparse matrix:
    only the (nnz x 12 B) edge arrays cross the host->device tunnel, the
    (M, N) block itself is one device scatter (same transfer discipline as
    dense_adj_from_edges / dense_shard)."""
    import numpy as np

    coo = mat.tocoo()
    dtype = _generic_dtype()
    a = jnp.zeros(mat.shape, dtype).at[
        jnp.asarray(coo.row.astype(np.int32)),
        jnp.asarray(coo.col.astype(np.int32)),
    ].add(jnp.asarray(coo.data.astype(np.float32)).astype(dtype))
    return DenseMat(a)


def bipartite_blocks(coo, n_users: int):
    """Split a unified (U+I)x(U+I) COO Laplacian into bipartite (u, i, w)
    edge arrays, or None if any nonzero lives in a diagonal block (not
    bipartite — e.g. social or motif graphs).

    dense_spmm uses ONE stored (U, I) block and its transpose for the item
    direction, which is only valid for a symmetric matrix — so the lower
    (I, U) block is verified to equal the upper block's transpose (an
    asymmetric input, e.g. a row-normalized D^-1 A, would otherwise
    silently propagate wrong item values). Asymmetric → None (caller
    falls back to a sparse layout that stores both directions)."""
    import numpy as np

    row, col, dat = coo.row, coo.col, coo.data
    upper = (row < n_users) & (col >= n_users)
    lower = (row >= n_users) & (col < n_users)
    if not np.all(upper | lower):
        return None
    eu = row[upper].astype(np.int32)
    ei = (col[upper] - n_users).astype(np.int32)
    w = dat[upper].astype(np.float32)
    # symmetry check: sorted (u, i, w) of the lower block's transpose must
    # match the upper block exactly
    lu = col[lower].astype(np.int32)
    li = (row[lower] - n_users).astype(np.int32)
    lw = dat[lower].astype(np.float32)
    if len(lu) != len(eu):
        return None
    ku = np.lexsort((ei, eu))
    kl = np.lexsort((li, lu))
    if not (np.array_equal(eu[ku], lu[kl]) and np.array_equal(ei[ku], li[kl])
            and np.array_equal(w[ku], lw[kl])):
        return None
    return eu, ei, w


def _quant_per_channel(y: jnp.ndarray):
    """Symmetric per-channel (per-D-column) int8 quantization.

    scale_d = max|y[:, d]| / 127; yq = round(y / scale) in [-127, 127].
    Returns (yq int8, scale f32 (1, D)). Zero columns get scale 1 (all-zero
    quantized column -> exact zeros back)."""
    amax = jnp.max(jnp.abs(y), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    yq = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    return yq, scale


def _dense_spmm_int8_apply(adj: "DenseAdj", x: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 MXU propagation (opt-in, ``SELFREC_TPU_DENSE_DTYPE=int8``).

    The binary incidence is ALREADY s8, so quantizing the streamed operand
    per-channel to s8 makes both matmuls native int8 MXU ops — 394 TOPS on
    v5e vs 197 TFLOPS bf16, i.e. a 2x compute-floor drop for the dominant
    cost of every LightGCN-family step (reference hot op LightGCN.py:72).
    Accumulation is s32 and EXACT: products are <= 127 (B is 0/1) and row
    degrees < 2^24, so the only approximation is the operand quantization
    itself (per-channel absolute error <= scale/2 = max|y_d|/254 — same
    order as bf16's relative 0.4%, but absolute across the column; quality
    must be convergence-validated per model, see BASELINE.md round 3).
    """
    xu = x[: adj.n_users]
    xi = x[adj.n_users :]
    ru = adj.row_scale[:, None] * adj.gain
    ci = adj.col_scale[:, None]
    yq, ys = _quant_per_channel(ci * xi)
    zq, zs = _quant_per_channel(ru * xu)
    d = x.shape[1]
    from selfrec_tpu.ops import dense_dual

    env = dense_dual.dual_enabled()
    use_dual = env != "0" and dense_dual.dual_supported(d, jnp.int8) and (
        env == "1" or jax.default_backend() == "tpu")
    if use_dual:
        # dual-direction Pallas kernel: ONE streaming read of the block
        # serves both s8 x s8 dots — 3.3 -> 1.83 ms per layer at yelp
        # scale (DUAL_KERNEL.json); s32 accumulate is bit-identical to
        # the XLA two-dot lowering (int8_exact_match)
        ou_raw, oi_raw = dense_dual.dual_matmul(
            adj.a_ui, zq, yq, dense_dual.interpret_mode())
        out_u = ru * (ou_raw.astype(jnp.float32) * ys)
        out_i = ci * (oi_raw.astype(jnp.float32) * zs)
    else:
        dims = (((1,), (0,)), ((), ()))
        out_u = ru * (jax.lax.dot_general(
            adj.a_ui, yq, dims, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * ys)
        out_i = ci * (jax.lax.dot_general(
            adj.a_ui.T, zq, dims, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * zs)
    return jnp.concatenate([out_u, out_i], axis=0).astype(x.dtype)


@jax.custom_vjp
def _dense_spmm_int8(adj: "DenseAdj", x: jnp.ndarray) -> jnp.ndarray:
    return _dense_spmm_int8_apply(adj, x)


def _int8_fwd(adj, x):
    return _dense_spmm_int8_apply(adj, x), adj


def _int8_bwd(adj, g):
    # the unified Laplacian is symmetric, so the cotangent propagates
    # through the SAME kernel; quantization is handled straight-through
    # (the op is linear in x up to the rounding step)
    import numpy as np

    zero_adj = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        adj,
    )
    return zero_adj, _dense_spmm_int8_apply(adj, g)


_dense_spmm_int8.defvjp(_int8_fwd, _int8_bwd)


def dense_spmm(adj: DenseAdj, x: jnp.ndarray) -> jnp.ndarray:
    """Unified-node-space propagation: x is ((U+I), D) in [users; items]
    order (same contract as the sparse paths); returns [A @ x_i ; A.T @ x_u].

    Both matmuls stream the SAME (U, I) buffer. In factored mode the s8
    binary incidence feeds ``dot_general`` DIRECTLY (mixed s8 x bf16
    operands — the TPU backend converts tiles on load, HBM traffic stays
    1 byte/entry) and the exact f32 normalization wraps the matmul:
        out_u = gain * ru . (B @ (ci . x_i))
        out_i = gain * ci . (B' @ (ru . x_u))
    Measured (tunnel-honest marginal timing, scripts/bench_dense_roofline
    .py, DENSE_ROOFLINE.json): 5.1-5.3 ms for the D=192 bidirectional pass
    at yelp2018 scale = 89-93% of the 4.70 ms MXU floor — i.e. this op runs
    at the bf16 MXU speed of light; an explicitly pipelined dual-direction
    Pallas kernel measured 9.0 ms and lost to XLA's schedule.
    In generic mode the operand is cast to the block dtype so the MXU runs
    native bf16 x bf16 -> f32 (a f32 operand would force XLA to decompose
    the matmul into 3x bf16 passes and triple the FLOPs for no accuracy it
    keeps)."""
    xu = x[: adj.n_users]
    xi = x[adj.n_users :]
    if adj.factored and adj.mm_dtype == jnp.int8:
        return _dense_spmm_int8(adj, x)
    if adj.factored:
        mmd = adj.mm_dtype
        b = adj.a_ui
        if mmd == jnp.float32:
            # forced-f32 comparison mode: convert explicitly so the dot is
            # a true f32 x f32 (mixed s8 x f32 would be lowered bf16-ish)
            b = b.astype(mmd)
        ru = adj.row_scale[:, None] * adj.gain
        ci = adj.col_scale[:, None]
        dims = (((1,), (0,)), ((), ()))
        out_u = ru * jax.lax.dot_general(
            b, (ci * xi).astype(mmd), dims,
            preferred_element_type=jnp.float32)
        out_i = ci * jax.lax.dot_general(
            b.T, (ru * xu).astype(mmd), dims,
            preferred_element_type=jnp.float32)
    else:
        out_u = jnp.dot(adj.a_ui, xi.astype(adj.a_ui.dtype),
                        preferred_element_type=jnp.float32)
        out_i = jnp.dot(adj.a_ui.T, xu.astype(adj.a_ui.dtype),
                        preferred_element_type=jnp.float32)
    return jnp.concatenate([out_u, out_i], axis=0).astype(x.dtype)
