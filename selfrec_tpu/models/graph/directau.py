"""DirectAU.

Capability parity with /root/reference/model/graph/DirectAU.py: LightGCN
encoder (n_layers from config, layer 0 included — it reuses LGCN_Encoder,
DirectAU.py:15), loss = alignment(u,pos) + gamma*(uniformity(u)+
uniformity(pos))/2 + l2_reg(u,pos)/batch_size (DirectAU.py:25,37-48). No
negative samples are consumed (implicit-negative objective).

The reference's ``torch.pdist`` (strict i<j pairs) is reproduced by
:func:`selfrec_tpu.ops.losses.uniformity_loss`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.graph import lightgcn_propagate
from selfrec_tpu.ops.init import xavier_uniform


class DirectAU(JAXGraphRecommender):
    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.gamma = float(args.get("gamma", 2))
        self.n_layers = int(args.get("n_layers", 3))
        self.adj = self.make_adj()

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
        }

    def compute_embeddings(self, params):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        out = lightgcn_propagate(self.adj, ego, self.n_layers, include_layer0=True)
        return out[: self.data.user_num], out[self.data.user_num :]

    def batch_loss(self, params, batch, key):
        user_all, item_all = self.compute_embeddings(params)
        u = user_all[batch["u"]]
        p = item_all[batch["i"]]
        mask = batch["mask"]
        # Pad rows are masked out of BOTH terms. Unmasked uniformity over the
        # epoch's padded final batch is off by +89% (pad slots duplicate row 0
        # → zero-distance pairs dominate the logsumexp; quantified in
        # tests/test_untested_surfaces.py), so pair-masking is required for
        # parity with the reference's exact-size torch.pdist
        # (DirectAU.py:42-45). Static shapes keep one compiled kernel.
        align = losses.alignment_loss_masked(u, p, mask)
        uniform = 0.5 * self.gamma * (
            losses.uniformity_loss_masked(u, mask)
            + losses.uniformity_loss_masked(p, mask)
        )
        reg = losses.l2_reg_loss(self.reg, u, p, mask=mask) / self.batch_size
        return align + uniform + reg
