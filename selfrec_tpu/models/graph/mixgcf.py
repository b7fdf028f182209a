"""MixGCF — hard-negative synthesis by positive mixing.

Capability parity with /root/reference/model/graph/MixGCF.py: LightGCN
backbone whose training forward applies elementwise dropout(0.1) after each
hop (MixGCF.py:70-82); per (user, positive) pair, ``n_negs`` sampled
negatives are interpolated toward the positive with per-element U[0,1)
alphas at EVERY layer, the candidate with the max inner-product score
against the (final, layer-mean) user embedding is chosen per layer
(argmax detached — gradients flow through the chosen embedding only,
MixGCF.py:96-114), and the chosen per-layer negatives are averaged. Loss =
BPR + l2(u,pos,neg)/batch (MixGCF.py:28). Eval uses the dropout-free
propagation (``get_embeddings``, MixGCF.py:117-128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.graph import spmm
from selfrec_tpu.ops.init import xavier_uniform


class MixGCF(JAXGraphRecommender):
    dropout_rate = 0.1  # nn.Dropout(0.1), MixGCF.py:59

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.n_layers = int(args.get("n_layer", 3))
        self.n_negs = int(args.get("n_negs", 64))
        self.adj = self.make_adj()

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
        }

    def _layerwise(self, params, key=None):
        """Per-layer (user, item) embedding lists; dropout when key given."""
        nu = self.data.user_num
        e = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        user_layers, item_layers = [params["user_emb"]], [params["item_emb"]]
        keys = jax.random.split(key, self.n_layers) if key is not None else None
        for k in range(self.n_layers):
            e = spmm(self.adj, e)
            if keys is not None:
                mask = jax.random.bernoulli(
                    keys[k], 1.0 - self.dropout_rate, e.shape
                )
                e = jnp.where(mask, e / (1.0 - self.dropout_rate), 0.0)
            user_layers.append(e[:nu])
            item_layers.append(e[nu:])
        return user_layers, item_layers

    def compute_embeddings(self, params):
        user_layers, item_layers = self._layerwise(params, key=None)
        return (
            jnp.mean(jnp.stack(user_layers), axis=0),
            jnp.mean(jnp.stack(item_layers), axis=0),
        )

    def batch_loss(self, params, batch, key):
        k_drop, k_mix = jax.random.split(key)
        user_layers, item_layers = self._layerwise(params, k_drop)
        user_final = jnp.mean(jnp.stack(user_layers), axis=0)
        u_emb = user_final[batch["u"]]  # (B, D)

        neg = batch["j"]  # (B, n_negs)
        mix_keys = jax.random.split(k_mix, self.n_layers + 1)
        chosen = []
        for k in range(self.n_layers + 1):
            neg_emb = item_layers[k][neg]  # (B, n_negs, D)
            pos_emb = item_layers[k][batch["i"]]  # (B, D)
            alpha = jax.random.uniform(mix_keys[k], neg_emb.shape)
            mixed = alpha * pos_emb[:, None, :] + (1.0 - alpha) * neg_emb
            scores = jnp.sum(u_emb[:, None, :] * mixed, axis=-1)  # (B, n_negs)
            idx = jax.lax.stop_gradient(jnp.argmax(scores, axis=1))
            chosen.append(
                jnp.take_along_axis(mixed, idx[:, None, None], axis=1)[:, 0, :]
            )
        neg_final = jnp.mean(jnp.stack(chosen), axis=0)  # (B, D)

        item_final = jnp.mean(jnp.stack(item_layers), axis=0)
        pos_final = item_final[batch["i"]]
        mask = batch["mask"]
        rec = losses.bpr_loss(u_emb, pos_final, neg_final, mask=mask)
        reg = (
            losses.l2_reg_loss(self.reg, u_emb, pos_final, neg_final, mask=mask)
            / self.batch_size
        )
        return rec + reg
