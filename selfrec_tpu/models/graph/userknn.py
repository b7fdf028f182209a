"""UserKNN — neighborhood baseline.

Capability parity with /root/reference/model/graph/UserKNN.py: shrunk cosine
user-user similarity sim(u,v) = n_common/(n_common+shrinkage) * dot /
(||u||*||v|| + 1e-8) (UserKNN.py:14-30), top-``topK`` positive neighbors
excluding self (UserKNN.py:41-52), prediction score[i] = sum_v sim*r /
(sum_v sim + 1e-8) over neighbors that rated i (UserKNN.py:61-80).

TPU rebuild of the reference's O(U^2) per-pair Python dict loops: the
similarity build is one device dispatch — dense int8 incidence R scattered
once, co-occurrence C = R Rᵀ per user block as native s8 x s8 MXU matmuls
with exact s32 accumulation, shrunk cosine + top-k fused in the same
`lax.scan` step (`ops/knn.py`). Falls back to a blocked edge-scatter SpMM
build when dense R exceeds the HBM budget; neighbor scores are an SpMM of
the scattered top-k weight block either way — no per-user host work at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from selfrec_tpu.models.base import GraphRecommender
from selfrec_tpu.ops import ranking
from selfrec_tpu.ops.graph import NormAdj, spmm

BLOCK = 512


class UserKNN(GraphRecommender):
    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        self.topk = int(conf["topK"])
        self.shrinkage = int(conf["shrinkage"])
        self.k_eff = min(self.topk, max(self.data.user_num - 1, 1))
        # interaction edges as two spmm layouts (one-time setup)
        e_u = jnp.asarray(self.data.edge_users)
        e_i = jnp.asarray(self.data.edge_items)
        w = jnp.ones(self.data.n_edges, dtype=jnp.float32)
        # out[v] += x[i]  (dst=user, src=item): C = R Rᵀ blockwise
        self._adj_i2u = NormAdj(e_i, e_u, w, self.data.user_num)
        # out[i] += x[v]  (dst=item, src=user): S = Wᵀ R blockwise
        self._adj_u2i = NormAdj(e_u, e_i, w, self.data.item_num)
        self._degrees = jnp.asarray(self.data.rated_counts().astype(np.float32))
        self.neighbor_ids = None
        self.neighbor_sims = None
        self._score_jit = None

    def _dense_user_block(self, uids: np.ndarray) -> np.ndarray:
        block = np.zeros((len(uids), self.data.item_num), dtype=np.float32)
        off, items = self.data.rated_offsets, self.data.rated_items
        for r, u in enumerate(uids):
            block[r, items[off[u] : off[u + 1]]] = 1.0
        return block

    def train(self):
        from selfrec_tpu.ops import knn

        res = knn.topk_shrunk_cosine(
            self.data.edge_users,
            self.data.edge_items,
            self.data.user_num,
            self.data.item_num,
            self._degrees,
            self.shrinkage,
            self.k_eff,
        )
        if res is not None:
            self.neighbor_sims, self.neighbor_ids = res
            return
        self._train_blocked()

    def _train_blocked(self):
        """HBM-budget fallback: per-block edge-scatter SpMM build."""
        n_u = self.data.user_num
        deg = self._degrees
        k = self.k_eff

        @jax.jit
        def sim_block(r_block, uids):
            # common counts: (n_u, B) = sum over edges (v,i) of r_block[:, i]
            common = spmm(self._adj_i2u, r_block.T).T  # (B, n_u)
            raw = common / (
                jnp.sqrt(deg[uids])[:, None] * jnp.sqrt(deg)[None, :] + 1e-8
            )
            sim = common / (common + self.shrinkage) * raw
            # exclude self; keep only positive sims (zero weight otherwise)
            sim = sim.at[jnp.arange(uids.shape[0]), uids].set(-jnp.inf)
            top_sim, top_ids = jax.lax.top_k(sim, k)
            top_sim = jnp.where(top_sim > 0, top_sim, 0.0)
            return top_sim, top_ids

        ids_out = np.zeros((n_u, k), dtype=np.int32)
        sims_out = np.zeros((n_u, k), dtype=np.float32)
        for b0 in range(0, n_u, BLOCK):
            uids = np.arange(b0, min(b0 + BLOCK, n_u), dtype=np.int32)
            valid = len(uids)
            if valid < BLOCK:
                uids = np.concatenate(
                    [uids, np.full(BLOCK - valid, uids[-1], np.int32)]
                )
            ts, ti = sim_block(
                jnp.asarray(self._dense_user_block(uids)), jnp.asarray(uids)
            )
            ids_out[b0 : b0 + valid] = np.asarray(ti)[:valid]
            sims_out[b0 : b0 + valid] = np.asarray(ts)[:valid]
        self.neighbor_ids = jnp.asarray(ids_out)
        self.neighbor_sims = jnp.asarray(sims_out)

    def _score_block(self, uids: jnp.ndarray) -> jnp.ndarray:
        if self._score_jit is None:

            def score(uids, neighbor_ids, neighbor_sims):
                b = uids.shape[0]
                w = jnp.zeros((self.data.user_num, b), dtype=jnp.float32)
                rows = neighbor_ids[uids]  # (B, k)
                sims = neighbor_sims[uids]
                cols = jnp.broadcast_to(jnp.arange(b)[:, None], rows.shape)
                w = w.at[rows.reshape(-1), cols.reshape(-1)].add(sims.reshape(-1))
                s = spmm(self._adj_u2i, w)  # (n_items, B): sum_v sim * R[v, i]
                s = s.T
                return jnp.where(s > 0, s / (s + 1e-8), 0.0)

            self._score_jit = jax.jit(score)
        return self._score_jit(uids, self.neighbor_ids, self.neighbor_sims)

    def test(self):
        return ranking.rec_list_from_score_fn(
            self.data, self._score_block, self.max_N, block_size=BLOCK
        )
