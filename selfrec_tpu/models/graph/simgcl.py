"""SimGCL — the north-star model (BASELINE.json).

Capability parity with /root/reference/model/graph/SimGCL.py: LightGCN-style
propagation averaging layers 1..K (layer 0 excluded, SimGCL.py:81-91), BPR on
the clean pass, plus ``cl_rate`` x InfoNCE between two noise-perturbed passes
at the hardcoded tau=0.2 (SimGCL.py:43-50). Per reference SimGCL.py:31 the L2
regularisation is applied to the PROPAGATED user/pos embeddings and is NOT
divided by the batch size (unlike MF/LightGCN).

TPU notes: all three propagations (clean + 2 perturbed) run inside one jitted
train step scanned over the epoch; noise comes from threaded PRNG keys
instead of cuRAND global state; CL anchors are the batch's distinct
users/items via a static-size on-device unique (torch.unique at
SimGCL.py:44-45).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.graph import (
    fused_simgcl_propagate,
    lightgcn_propagate,
)
from selfrec_tpu.ops.init import xavier_uniform
from selfrec_tpu.ops.sampling import unique_with_mask


class SimGCL(JAXGraphRecommender):
    cl_temp = 0.2  # hardcoded in reference SimGCL.py:48-49

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.cl_rate = float(args.get("lambda", 0.5))
        self.eps = float(args.get("eps", 0.1))
        self.n_layers = int(args.get("n_layer", 2))
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

    def _cl_from_views(self, view1, view2, batch):
        nu = self.data.user_num
        valid = batch["mask"].astype(bool)
        u_idx, u_mask = unique_with_mask(
            jnp.where(valid, batch["u"], -1), self.batch_size
        )
        i_idx, i_mask = unique_with_mask(
            jnp.where(valid, batch["i"], -1), self.batch_size
        )
        user_cl = losses.infonce(
            view1[:nu][u_idx], view2[:nu][u_idx], self.cl_temp, mask=u_mask
        )
        item_cl = losses.infonce(
            view1[nu:][i_idx], view2[nu:][i_idx], self.cl_temp, mask=i_mask
        )
        return user_cl + item_cl

    def batch_loss(self, params, batch, key):
        # 1 clean + 2 perturbed propagations as ONE width-3D chain
        # (ops/graph.fused_simgcl_propagate — TPU gathers are latency-bound
        # at D=64, so this is ~1.7x cheaper than three chains)
        clean, view1, view2 = fused_simgcl_propagate(
            self.adj, self._ego(params), self.n_layers, key, self.eps
        )
        nu = self.data.user_num
        user_all, item_all = clean[:nu], clean[nu:]
        u = user_all[batch["u"]]
        p = item_all[batch["i"]]
        n = item_all[batch["j"]]
        mask = batch["mask"]
        rec = losses.bpr_loss(u, p, n, mask=mask)
        reg = losses.l2_reg_loss(self.reg, u, p, mask=mask)
        cl = self.cl_rate * self._cl_from_views(view1, view2, batch)
        return rec + reg + cl
