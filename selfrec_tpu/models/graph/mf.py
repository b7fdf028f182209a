"""Matrix Factorization with BPR.

Capability parity with /root/reference/model/graph/MF.py: raw user/item
embedding tables, BPR + per-batch L2 regularisation
(MF.py:21: bpr + l2_reg_loss(reg, u, p, n)/batch_size), Adam.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.init import xavier_uniform


class MF(JAXGraphRecommender):
    def should_evaluate(self, epoch):
        return epoch % 5 == 0  # reference cadence (MF.py:30, LightGCN.py:34)

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
        }

    def compute_embeddings(self, params):
        return params["user_emb"], params["item_emb"]

    def batch_loss(self, params, batch, key):
        u = params["user_emb"][batch["u"]]
        p = params["item_emb"][batch["i"]]
        n = params["item_emb"][batch["j"]]
        mask = batch["mask"]
        rec = losses.bpr_loss(u, p, n, mask=mask)
        reg = losses.l2_reg_loss(self.reg, u, p, n, mask=mask) / self.batch_size
        return rec + reg
