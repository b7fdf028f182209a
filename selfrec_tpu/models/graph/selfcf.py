"""SelfCF (SelfCF-he variant — history embeddings).

Capability parity with /root/reference/model/graph/SelfCF.py: a single online
LightGCN encoder (dropout-free, SelfCF.py:6,59); the target view comes from a
HISTORY buffer initialised with standard-normal noise (SelfCF.py:63-64):
per batch, target = his[rows]*tau + online[rows]*(1-tau) (no gradient), then
his[rows] is overwritten with the current online rows (SelfCF.py:69-79).
Loss = (1 - cos(pred(u_online), i_target))/2 + (1 - cos(pred(i_online),
u_target))/2 (SelfCF.py:89-95). Scoring concatenates predictor/raw views
exactly like BUIR (SelfCF.py:45-50).

TPU notes: the history buffers are per-step functional state updated INSIDE
the loss step (``batch_loss_aux``), matching the reference's in-forward
mutation ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops.graph import lightgcn_propagate
from selfrec_tpu.ops.init import linear_apply, torch_linear_params, xavier_uniform
from selfrec_tpu.ops.losses import l2_normalize


class SelfCF(JAXGraphRecommender):
    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.momentum = float(args.get("tau", 0.05))
        self.n_layers = int(args.get("n_layer", 2))
        self.adj = self.make_adj()

    def init_params(self, key):
        ku, ki, kp = jax.random.split(key, 3)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
            "predictor": torch_linear_params(kp, self.emb_size, self.emb_size),
        }

    def build(self):
        super().build()
        self.key, k1, k2 = jax.random.split(self.key, 3)
        self.aux = {
            "u_his": jax.random.normal(k1, (self.data.user_num, self.emb_size)),
            "i_his": jax.random.normal(k2, (self.data.item_num, self.emb_size)),
        }

    def epoch_setup(self, epoch):
        return self.aux

    def _propagate(self, params):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        out = lightgcn_propagate(self.adj, ego, self.n_layers, include_layer0=True)
        return out[: self.data.user_num], out[self.data.user_num :]

    def compute_embeddings(self, params):
        u_online, i_online = self._propagate(params)
        p_u = linear_apply(params["predictor"], u_online)
        p_i = linear_apply(params["predictor"], i_online)
        return (
            jnp.concatenate([p_u, u_online], axis=1),
            jnp.concatenate([i_online, p_i], axis=1),
        )

    def batch_loss_aux(self, params, batch, key):
        aux = batch["aux"]
        m = self.momentum
        u_on_all, i_on_all = self._propagate(params)
        u_rows = jax.lax.stop_gradient(u_on_all[batch["u"]])
        i_rows = jax.lax.stop_gradient(i_on_all[batch["i"]])
        u_target = aux["u_his"][batch["u"]] * m + u_rows * (1.0 - m)
        i_target = aux["i_his"][batch["i"]] * m + i_rows * (1.0 - m)

        valid = batch["mask"].astype(bool)
        u_idx = jnp.where(valid, batch["u"], -1)
        i_idx = jnp.where(valid, batch["i"], -1)
        new_aux = {
            "u_his": aux["u_his"].at[u_idx].set(u_rows, mode="drop"),
            "i_his": aux["i_his"].at[i_idx].set(i_rows, mode="drop"),
        }

        u_online = linear_apply(params["predictor"], u_on_all[batch["u"]])
        i_online = linear_apply(params["predictor"], i_on_all[batch["i"]])
        cos_ui = jnp.sum(
            l2_normalize(u_online) * l2_normalize(jax.lax.stop_gradient(i_target)),
            axis=-1,
        )
        cos_iu = jnp.sum(
            l2_normalize(i_online) * l2_normalize(jax.lax.stop_gradient(u_target)),
            axis=-1,
        )
        mask = batch["mask"]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss_ui = (1.0 - jnp.sum(cos_ui * mask) / denom) / 2.0
        loss_iu = (1.0 - jnp.sum(cos_iu * mask) / denom) / 2.0
        return loss_ui + loss_iu, new_aux

    def batch_loss(self, params, batch, key):  # pragma: no cover
        return self.batch_loss_aux(params, batch, key)[0]
