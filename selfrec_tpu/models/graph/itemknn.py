"""ItemKNN — neighborhood baseline.

Capability parity with /root/reference/model/graph/ItemKNN.py: shrunk cosine
item-item similarity over user sets (ItemKNN.py:14-30), top-``topK``
positive neighbors per item (ItemKNN.py:36-56), prediction score[j] =
sum_{i in rated(u)} sim(i,j)*r / (sum sim + 1e-8) over each rated item's
neighbor list (ItemKNN.py:58-81).

Same one-dispatch dense int8 MXU build as UserKNN (`ops/knn.py`, C = Rᵀ R
with exact s32 accumulation, blocked edge-scatter SpMM fallback under HBM
pressure), then user scores via an SpMM of the rated-row block against the
sparse top-k item-similarity edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from selfrec_tpu.models.base import GraphRecommender
from selfrec_tpu.ops import ranking
from selfrec_tpu.ops.graph import NormAdj, spmm

BLOCK = 512


class ItemKNN(GraphRecommender):
    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        self.topk = int(conf["topK"])
        self.shrinkage = int(conf["shrinkage"])
        self.k_eff = min(self.topk, max(self.data.item_num - 1, 1))
        e_u = jnp.asarray(self.data.edge_users)
        e_i = jnp.asarray(self.data.edge_items)
        w = jnp.ones(self.data.n_edges, dtype=jnp.float32)
        # out[j] += x[u]  (dst=item, src=user): C = Rᵀ R blockwise
        self._adj_u2i = NormAdj(e_u, e_i, w, self.data.item_num)
        self._item_deg = jnp.asarray(
            np.bincount(self.data.edge_items, minlength=self.data.item_num).astype(
                np.float32
            )
        )
        # item-side CSC (offsets, users) built once: per-block rows are
        # cheap slices, mirroring UserKNN's rated CSR
        order = np.argsort(self.data.edge_items, kind="stable")
        self._csc_users = self.data.edge_users[order].astype(np.int32)
        counts = np.bincount(self.data.edge_items, minlength=self.data.item_num)
        self._csc_offsets = np.zeros(self.data.item_num + 1, dtype=np.int64)
        np.cumsum(counts, out=self._csc_offsets[1:])
        self._sim_adj = None  # top-k item-similarity edges
        self._score_jit = None

    def _dense_item_block(self, iids: np.ndarray) -> np.ndarray:
        """(B, n_users) dense rows of Rᵀ for an item block (duplicate padded
        ids each get their full row — padded rows are discarded anyway)."""
        block = np.zeros((len(iids), self.data.user_num), dtype=np.float32)
        for r, i in enumerate(iids):
            lo, hi = self._csc_offsets[i], self._csc_offsets[i + 1]
            block[r, self._csc_users[lo:hi]] = 1.0
        return block

    def train(self):
        from selfrec_tpu.ops import knn

        n_i = self.data.item_num
        res = knn.topk_shrunk_cosine(
            self.data.edge_items,
            self.data.edge_users,
            n_i,
            self.data.user_num,
            self._item_deg,
            self.shrinkage,
            self.k_eff,
        )
        if res is not None:
            sims_out, ids_out = (np.asarray(res[0]), np.asarray(res[1]))
        else:
            sims_out, ids_out = self._train_blocked()
        # sparse top-k similarity as spmm edges: out[j] += sim(i,j) * x[i]
        k = self.k_eff
        src = np.repeat(np.arange(n_i, dtype=np.int32), k)
        dst = ids_out.reshape(-1)
        w = sims_out.reshape(-1)
        keep = w > 0
        self._sim_adj = NormAdj(
            jnp.asarray(src[keep]), jnp.asarray(dst[keep]), jnp.asarray(w[keep]), n_i
        )

    def _train_blocked(self):
        """HBM-budget fallback: per-block edge-scatter SpMM build."""
        n_i = self.data.item_num
        deg = self._item_deg
        k = self.k_eff

        @jax.jit
        def sim_block(rt_block, iids):
            common = spmm(self._adj_u2i, rt_block.T).T  # (B, n_i)
            raw = common / (
                jnp.sqrt(deg[iids])[:, None] * jnp.sqrt(deg)[None, :] + 1e-8
            )
            sim = common / (common + self.shrinkage) * raw
            sim = sim.at[jnp.arange(iids.shape[0]), iids].set(-jnp.inf)
            top_sim, top_ids = jax.lax.top_k(sim, k)
            return jnp.where(top_sim > 0, top_sim, 0.0), top_ids

        ids_out = np.zeros((n_i, k), dtype=np.int32)
        sims_out = np.zeros((n_i, k), dtype=np.float32)
        for b0 in range(0, n_i, BLOCK):
            iids = np.arange(b0, min(b0 + BLOCK, n_i), dtype=np.int32)
            valid = len(iids)
            if valid < BLOCK:
                iids = np.concatenate(
                    [iids, np.full(BLOCK - valid, iids[-1], np.int32)]
                )
            ts, ti = sim_block(
                jnp.asarray(self._dense_item_block(iids)), jnp.asarray(iids)
            )
            ids_out[b0 : b0 + valid] = np.asarray(ti)[:valid]
            sims_out[b0 : b0 + valid] = np.asarray(ts)[:valid]
        return sims_out, ids_out

    def _dense_user_rows(self, uids: np.ndarray) -> np.ndarray:
        block = np.zeros((len(uids), self.data.item_num), dtype=np.float32)
        off, items = self.data.rated_offsets, self.data.rated_items
        for r, u in enumerate(uids):
            block[r, items[off[u] : off[u + 1]]] = 1.0
        return block

    def _score_block(self, uids: jnp.ndarray) -> jnp.ndarray:
        if self._score_jit is None:

            def score(r_rows):
                s = spmm(self._sim_adj, r_rows.T).T  # (B, n_i)
                return jnp.where(s > 0, s / (s + 1e-8), 0.0)

            self._score_jit = jax.jit(score)
        r_rows = self._dense_user_rows(np.asarray(uids))
        return self._score_jit(jnp.asarray(r_rows))

    def test(self):
        return ranking.rec_list_from_score_fn(
            self.data, self._score_block, self.max_N, block_size=BLOCK
        )
