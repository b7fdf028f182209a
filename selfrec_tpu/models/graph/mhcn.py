"""MHCN — multi-channel hypergraph convolution over social motifs.

Capability parity with /root/reference/model/graph/MHCN.py (TF1 in the
reference, unified JAX contract here): three motif hypergraph channels
(H_s/H_j/H_p precomputed on host, data/motifs.py) + a simple R-propagation
channel; per layer the item table is updated from the attention-mixed user
channels through Rᵀ and the simple channel from R (MHCN.py:117-138); layer
lists are reduce-SUMMED, final user = channel_attention(c1,c2,c3) +
simple/2 (MHCN.py:139-148); hierarchical mutual-information self-supervision
with row / row+column shuffles as negatives (MHCN.py:159-181); loss =
sum-BPR + reg*l2_loss(all gating/attention weights) + reg*l2_loss(batch
embeddings) + ss_rate*ss (MHCN.py:184-189).

TPU notes: the TF1 static-graph build/train split collapses into pure jitted
functions; shuffle negatives use jax.random.permutation with per-step keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.data.motifs import mhcn_hypergraphs
from selfrec_tpu.data.social import Relation
from selfrec_tpu.data.graph import normalize_graph_mat
from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.graph import (
    dense_general_available, norm_adj_from_scipy, spmm)
from selfrec_tpu.ops.init import xavier_uniform
from selfrec_tpu.ops.losses import l2_normalize

N_CHANNELS = 4


class MHCN(JAXGraphRecommender):
    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.n_layers = int(args.get("n_layer", 2))
        self.ss_rate = float(args.get("ss_rate", 0.01))
        self.social_data = Relation(conf, kwargs["social.data"], self.data.user)

        # All five adjacencies are STATIC across training, so they ride the
        # generic dense MXU backend (DenseMat: one bf16 matmul per channel
        # per layer instead of an ELL gather chain — reference TF1 sparse
        # matmuls, MHCN.py:183-201), and the motif ALGEBRA itself runs on
        # the MXU (data/motifs.py mhcn_hypergraphs_device — the scipy route
        # took 75.7s of build at quarter-douban, ~25 min at full douban).
        # Under a mesh shard_adj row-shards each block over the device
        # grid; over budget / CPU-auto falls back to scipy + ELL/halo.
        nu = self.data.user_num
        ni = self.data.item_num
        # budget the AGGREGATE resident set (3 UxU motif channels + R +
        # R^T), not each block independently — five individually-passing
        # checks could otherwise admit several times the configured
        # SELFREC_TPU_DENSE_BUDGET_GB (advisor round-3 finding)
        from selfrec_tpu.ops.spmm_dense import (
            _generic_dtype as _gdt, fits_dense_elems)

        dg = (dense_general_available(nu, nu)
              and fits_dense_elems(3 * nu * nu + 2 * nu * ni, _gdt()))
        if dg:
            from selfrec_tpu.data.motifs import mhcn_hypergraphs_device
            from selfrec_tpu.ops.spmm_dense import DenseMat, _generic_dtype

            h_dense = mhcn_hypergraphs_device(
                self.social_data.get_social_mat(), self.data.interaction_mat)
            self.H = [self.shard_adj(DenseMat(h.astype(_generic_dtype())))
                      for h in h_dense]
        else:
            h_s, h_j, h_p = mhcn_hypergraphs(
                self.social_data.get_social_mat(), self.data.interaction_mat
            )
            self.H = [self.shard_adj(norm_adj_from_scipy(h, dense_general=dg))
                      for h in (h_s, h_j, h_p)]
        r_norm = normalize_graph_mat(self.data.interaction_mat)  # D^-1 R
        self.R = self.shard_adj(norm_adj_from_scipy(r_norm, dense_general=dg))
        self.Rt = self.shard_adj(
            norm_adj_from_scipy(r_norm.T.tocsr(), dense_general=dg))

    def print_model_info(self):
        super().print_model_info()
        print(
            "Social data size: (user number: %d, relation number: %d)."
            % self.social_data.size()
        )
        print("=" * 80)

    def init_params(self, key):
        keys = jax.random.split(key, 4 + 4 * N_CHANNELS)
        d = self.emb_size
        params = {
            "user_emb": xavier_uniform(keys[0], (self.data.user_num, d)),
            "item_emb": xavier_uniform(keys[1], (self.data.item_num, d)),
            "attention": xavier_uniform(keys[2], (1, d)),
            "attention_mat": xavier_uniform(keys[3], (d, d)),
        }
        for c in range(N_CHANNELS):
            k0, k1, k2, k3 = jax.random.split(keys[4 + c], 4)
            params[f"gating{c + 1}"] = xavier_uniform(k0, (d, d))
            params[f"gating_bias{c + 1}"] = xavier_uniform(k1, (1, d))
            params[f"sgating{c + 1}"] = xavier_uniform(k2, (d, d))
            params[f"sgating_bias{c + 1}"] = xavier_uniform(k3, (1, d))
        return params

    # -- forward --------------------------------------------------------------
    @staticmethod
    def _gate(em, w, b):
        return em * jax.nn.sigmoid(em @ w + b)

    def _channel_attention(self, params, *channels):
        scores = jnp.stack(
            [
                jnp.sum(params["attention"] * (c @ params["attention_mat"]), axis=1)
                for c in channels
            ],
            axis=1,
        )  # (n_users, n_channels)
        score = jax.nn.softmax(scores, axis=1)
        mixed = sum(score[:, i : i + 1] * c for i, c in enumerate(channels))
        return mixed, score

    def forward(self, params):
        g = lambda em, c: self._gate(
            em, params[f"gating{c}"], params[f"gating_bias{c}"]
        )
        c1, c2, c3 = g(params["user_emb"], 1), g(params["user_emb"], 2), g(
            params["user_emb"], 3
        )
        simple = g(params["user_emb"], 4)
        item_emb = params["item_emb"]
        all_c = [[c1], [c2], [c3]]
        all_simple = [simple]
        all_i = [item_emb]
        for _ in range(self.n_layers):
            mixed = self._channel_attention(params, c1, c2, c3)[0] + simple / 2
            c1 = spmm(self.H[0], c1)
            c2 = spmm(self.H[1], c2)
            c3 = spmm(self.H[2], c3)
            for lst, c in zip(all_c, (c1, c2, c3)):
                lst.append(l2_normalize(c))
            new_item = spmm(self.Rt, mixed)
            all_i.append(l2_normalize(new_item))
            simple = spmm(self.R, item_emb)
            all_simple.append(l2_normalize(simple))
            item_emb = new_item
        c1s, c2s, c3s = (sum(lst) for lst in all_c)
        simple_s = sum(all_simple)
        item_s = sum(all_i)
        final_user, _ = self._channel_attention(params, c1s, c2s, c3s)
        final_user = final_user + simple_s / 2
        return final_user, item_s

    def compute_embeddings(self, params):
        return self.forward(params)

    # -- hierarchical self-supervision ---------------------------------------
    def _hierarchical_ss(self, key, em, adj):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        n, d = em.shape

        def row_shuffle(k, x):
            return x[jax.random.permutation(k, x.shape[0])]

        def row_col_shuffle(k, x):
            ka, kb = jax.random.split(k)
            return x[jax.random.permutation(ka, x.shape[0])][
                :, jax.random.permutation(kb, x.shape[1])
            ]

        score = lambda a, b: jnp.sum(a * b, axis=1)
        edge = spmm(adj, em)
        pos = score(em, edge)
        neg1 = score(row_shuffle(k1, em), edge)
        neg2 = score(row_col_shuffle(k2, edge), em)
        local = jnp.sum(
            -jnp.log(jax.nn.sigmoid(pos - neg1)) - jnp.log(jax.nn.sigmoid(neg1 - neg2))
        )
        graph = jnp.mean(edge, axis=0)
        pos_g = score(edge, graph[None, :])
        neg1_g = score(row_col_shuffle(k3, edge), graph[None, :])
        global_ = jnp.sum(-jnp.log(jax.nn.sigmoid(pos_g - neg1_g)))
        return local + global_

    def batch_loss(self, params, batch, key):
        final_user, final_item = self.forward(params)
        u = final_user[batch["u"]]
        p = final_item[batch["i"]]
        n = final_item[batch["j"]]
        mask = batch["mask"]
        rec = losses.bpr_loss_sum(u, p, n, mask=mask)

        l2 = lambda x: 0.5 * jnp.sum(x * x)  # tf.nn.l2_loss
        reg = 0.0
        for c in range(N_CHANNELS):
            for name in ("gating", "gating_bias", "sgating", "sgating_bias"):
                reg = reg + l2(params[f"{name}{c + 1}"])
        reg = reg + l2(params["attention"]) + l2(params["attention_mat"])
        m = mask[:, None]
        reg = reg + l2(u * m) + l2(p * m) + l2(n * m)
        reg = self.reg * reg

        sg = lambda em, c: self._gate(
            em, params[f"sgating{c}"], params[f"sgating_bias{c}"]
        )
        keys = jax.random.split(key, 3)
        ss = sum(
            self._hierarchical_ss(keys[c], sg(final_user, c + 1), self.H[c])
            for c in range(3)
        )
        return rec + reg + self.ss_rate * ss
