"""XSimGCL.

Capability parity with /root/reference/model/graph/XSimGCL.py: a SINGLE
perturbed propagation per step; the contrastive view is the layer-``l_star``
embedding against the final (mean of layers 1..K) embedding
(XSimGCL.py:86-101), InfoNCE at config tau (XSimGCL.py:45-50). BPR is
computed on the perturbed final embeddings (XSimGCL.py:29-31 — the training
forward IS the perturbed one), while eval uses the clean pass
(XSimGCL.py:40-41). L2 reg on propagated u/pos, not batch-size scaled
(XSimGCL.py:33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.graph import (
    lightgcn_propagate,
    perturbed_propagate,
)
from selfrec_tpu.ops.init import xavier_uniform
from selfrec_tpu.ops.sampling import unique_with_mask


class XSimGCL(JAXGraphRecommender):
    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.cl_rate = float(args.get("lambda", 0.2))
        self.eps = float(args.get("eps", 0.2))
        self.temp = float(args.get("tau", 0.15))
        self.n_layers = int(args.get("n_layer", 2))
        self.layer_cl = int(args.get("l_star", 1))
        self.adj = self.make_adj()

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
        }

    def _ego(self, params):
        return jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)

    def compute_embeddings(self, params):
        out = lightgcn_propagate(
            self.adj, self._ego(params), self.n_layers, include_layer0=False
        )
        return out[: self.data.user_num], out[self.data.user_num :]

    def batch_loss(self, params, batch, key):
        final, cl_view = perturbed_propagate(
            self.adj,
            self._ego(params),
            self.n_layers,
            key,
            self.eps,
            cl_layer=self.layer_cl,
        )
        nu = self.data.user_num
        user_all, item_all = final[:nu], final[nu:]
        u = user_all[batch["u"]]
        p = item_all[batch["i"]]
        n = item_all[batch["j"]]
        mask = batch["mask"]
        rec = losses.bpr_loss(u, p, n, mask=mask)
        reg = losses.l2_reg_loss(self.reg, u, p, mask=mask)

        valid = mask.astype(bool)
        u_idx, u_mask = unique_with_mask(
            jnp.where(valid, batch["u"], -1), self.batch_size
        )
        i_idx, i_mask = unique_with_mask(
            jnp.where(valid, batch["i"], -1), self.batch_size
        )
        user_cl = losses.infonce(
            user_all[u_idx], cl_view[:nu][u_idx], self.temp, mask=u_mask
        )
        item_cl = losses.infonce(
            item_all[i_idx], cl_view[nu:][i_idx], self.temp, mask=i_mask
        )
        return rec + reg + self.cl_rate * (user_cl + item_cl)
