"""LightGCN.

Capability parity with /root/reference/model/graph/LightGCN.py: K-layer
propagation over the normalized bipartite adjacency with mean over layer
outputs including layer 0 (LightGCN.py:68-78), BPR loss on propagated
embeddings + L2 on the EGO (table) embeddings of the batch rows scaled by
1/batch_size (LightGCN.py:25). Propagation is the edge-list SpMM of
selfrec_tpu.ops.graph instead of cuSPARSE torch.sparse.mm.
"""

from __future__ import annotations

import jax

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.graph import lightgcn_propagate
from selfrec_tpu.ops.init import xavier_uniform
import jax.numpy as jnp


class LightGCN(JAXGraphRecommender):
    def should_evaluate(self, epoch):
        return epoch % 5 == 0  # reference cadence (MF.py:30, LightGCN.py:34)

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.n_layers = int(args.get("n_layer", 2))
        self.adj = self.make_adj()

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
        }

    def propagate(self, params):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        out = lightgcn_propagate(self.adj, ego, self.n_layers, include_layer0=True)
        return out[: self.data.user_num], out[self.data.user_num :]

    def compute_embeddings(self, params):
        return self.propagate(params)

    def batch_loss(self, params, batch, key):
        user_all, item_all = self.propagate(params)
        u = user_all[batch["u"]]
        p = item_all[batch["i"]]
        n = item_all[batch["j"]]
        mask = batch["mask"]
        rec = losses.bpr_loss(u, p, n, mask=mask)
        reg = (
            losses.l2_reg_loss(
                self.reg,
                params["user_emb"][batch["u"]],
                params["item_emb"][batch["i"]],
                params["item_emb"][batch["j"]],
                mask=mask,
            )
            / self.batch_size
        )
        return rec + reg
