"""NCL — neighborhood-enriched contrastive learning.

Capability parity with /root/reference/model/graph/NCL.py: LightGCN backbone
returning the per-layer embedding list (NCL.py:151-161); structural loss
contrasts each batch node's layer-(2*hyper_layers) embedding against its
layer-0 embedding with ALL users (resp. items) as in-batch denominators,
summed (not averaged) and scaled ssl_reg, items additionally scaled alpha
(NCL.py:57-83); after 20 warm-up epochs a prototype loss contrasts layer-0
embeddings with their k-means centroid at tau, scaled proto_reg*batch_size
(NCL.py:29-55 — centroids recomputed on the RAW tables every epoch,
NCL.py:89-102). Rec loss = BPR + l2(u,p,n)/batch.

TPU notes: the faiss GPU k-means E-step becomes the jitted on-device k-means
of :mod:`selfrec_tpu.ops.kmeans`; the warm->proto phase flip re-traces the
epoch function exactly once (two compiles total, static control flow inside).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.graph import lightgcn_propagate
from selfrec_tpu.ops.init import xavier_uniform
from selfrec_tpu.ops.kmeans import kmeans


class NCL(JAXGraphRecommender):
    warm_up_epochs = 20  # hardcoded in reference NCL.py:89,102

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.n_layers = int(args.get("n_layer", 3))
        self.ssl_temp = float(args.get("tau", 0.05))
        self.ssl_reg = float(args.get("ssl_reg", 1e-6))
        self.hyper_layers = int(args.get("hyper_layers", 1))
        self.alpha = float(args.get("alpha", 1.5))
        self.proto_reg = float(args.get("proto_reg", 1e-7))
        self.k = int(args.get("num_clusters", 2000))
        self.adj = self.make_adj()
        self._proto_phase = False

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
        }

    def _propagate(self, params):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        return lightgcn_propagate(
            self.adj, ego, self.n_layers, include_layer0=True, return_layers=True
        )

    def compute_embeddings(self, params):
        out, _ = self._propagate(params)
        return out[: self.data.user_num], out[self.data.user_num :]

    # -- phases ---------------------------------------------------------------
    def run_epoch(self, epoch):
        proto = epoch >= self.warm_up_epochs
        if proto != self._proto_phase:
            self._proto_phase = proto
            self._epoch_fn = None  # re-trace with the proto branch enabled
        return super().run_epoch(epoch)

    def epoch_setup(self, epoch):
        if not self._proto_phase:
            return {}
        # E-step on the raw embedding tables each epoch (NCL.py:29-44)
        self.key, k1, k2 = jax.random.split(self.key, 3)
        uc, u2c = kmeans(k1, self.params["user_emb"], self.k)
        ic, i2c = kmeans(k2, self.params["item_emb"], self.k)
        return {"user_cent": uc, "user2c": u2c, "item_cent": ic, "item2c": i2c}

    # -- losses ---------------------------------------------------------------
    def _ssl_layer_loss(self, context, initial, batch):
        nu = self.data.user_num
        mask = batch["mask"]

        def one_side(ctx_all, init_all, idx):
            ctx = losses.l2_normalize(ctx_all[idx])
            ini = losses.l2_normalize(init_all[idx])
            all_n = losses.l2_normalize(init_all)
            pos = jnp.exp(jnp.sum(ctx * ini, axis=1) / self.ssl_temp)
            ttl = jnp.sum(jnp.exp(ctx @ all_n.T / self.ssl_temp), axis=1)
            return jnp.sum(-jnp.log(pos / ttl) * mask)

        u_loss = one_side(context[:nu], initial[:nu], batch["u"])
        i_loss = one_side(context[nu:], initial[nu:], batch["i"])
        return self.ssl_reg * (u_loss + self.alpha * i_loss)

    def _proto_loss(self, initial, batch, aux):
        nu = self.data.user_num
        mask = batch["mask"]
        u_cent = aux["user_cent"][aux["user2c"][batch["u"]]]
        i_cent = aux["item_cent"][aux["item2c"][batch["i"]]]
        pl_u = losses.infonce(
            initial[:nu][batch["u"]], u_cent, self.ssl_temp, mask=mask
        ) * self.batch_size
        pl_i = losses.infonce(
            initial[nu:][batch["i"]], i_cent, self.ssl_temp, mask=mask
        ) * self.batch_size
        return self.proto_reg * (pl_u + pl_i)

    def batch_loss(self, params, batch, key):
        out, emb_list = self._propagate(params)
        nu = self.data.user_num
        user_all, item_all = out[:nu], out[nu:]
        u = user_all[batch["u"]]
        p = item_all[batch["i"]]
        n = item_all[batch["j"]]
        mask = batch["mask"]
        rec = losses.bpr_loss(u, p, n, mask=mask)
        reg = losses.l2_reg_loss(self.reg, u, p, n, mask=mask) / self.batch_size
        initial = emb_list[0]
        context = emb_list[self.hyper_layers * 2]
        ssl = self._ssl_layer_loss(context, initial, batch)
        total = rec + reg + ssl
        if self._proto_phase:
            total = total + self._proto_loss(initial, batch, batch["aux"])
        return total
