"""SSL4Rec — two-tower retrieval with feature-dropout contrast.

Capability parity with /root/reference/model/graph/SSL4Rec.py: user/item
towers Linear(D,1024)->ReLU->Linear(1024,128)->Tanh over xavier-initialised
id embeddings (SSL4Rec.py:64-78); rec loss = in-batch sampled softmax at tau
(SSL4Rec.py:33 -> loss_torch.py:25-32); SSL = alpha * InfoNCE between two
dropout views of the BATCH item embeddings pushed through the item tower
(SSL4Rec.py:90-103); + l2_reg(query, item) (not batch-size scaled,
SSL4Rec.py:35). The reference ignores the sampler's negatives. Eval encodes
every user/item through the towers (SSL4Rec.py:43-45).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.init import linear_apply, torch_linear_params, xavier_uniform


class SSL4Rec(JAXGraphRecommender):
    tower_hidden = 1024
    tower_out = 128

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.cl_rate = float(args.get("alpha", 0.1))
        self.tau = float(args.get("tau", 0.07))
        self.drop_rate = float(args.get("drop", 0.1))

    def init_params(self, key):
        ku, ki, ku1, ku2, ki1, ki2 = jax.random.split(key, 6)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
            "user_tower": [
                torch_linear_params(ku1, self.emb_size, self.tower_hidden),
                torch_linear_params(ku2, self.tower_hidden, self.tower_out),
            ],
            "item_tower": [
                torch_linear_params(ki1, self.emb_size, self.tower_hidden),
                torch_linear_params(ki2, self.tower_hidden, self.tower_out),
            ],
        }

    @staticmethod
    def _tower(layers, x):
        h = jax.nn.relu(linear_apply(layers[0], x))
        return jnp.tanh(linear_apply(layers[1], h))

    def compute_embeddings(self, params):
        q = self._tower(params["user_tower"], params["user_emb"])
        i = self._tower(params["item_tower"], params["item_emb"])
        return q, i

    def batch_loss(self, params, batch, key):
        q_emb = self._tower(params["user_tower"], params["user_emb"][batch["u"]])
        i_raw = params["item_emb"][batch["i"]]
        i_emb = self._tower(params["item_tower"], i_raw)
        mask = batch["mask"]
        rec = losses.batch_softmax_loss(q_emb, i_emb, self.tau, mask=mask)

        k1, k2 = jax.random.split(key)
        keep = 1.0 - self.drop_rate
        v1 = jnp.where(jax.random.bernoulli(k1, keep, i_raw.shape), i_raw / keep, 0.0)
        v2 = jnp.where(jax.random.bernoulli(k2, keep, i_raw.shape), i_raw / keep, 0.0)
        cl = losses.infonce(
            self._tower(params["item_tower"], v1),
            self._tower(params["item_tower"], v2),
            self.tau,
            mask=mask,
        )
        reg = losses.l2_reg_loss(self.reg, q_emb, i_emb, mask=mask)
        return rec + reg + self.cl_rate * cl
