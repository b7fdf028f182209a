"""BUIR — bootstrapped user/item representations (no negatives).

Capability parity with /root/reference/model/graph/BUIR.py: online + target
LightGCN encoders with per-forward sparse adjacency dropout at a random rate
U[0,1)*drop_rate (BUIR.py:118-135), linear predictor on the online side, loss
= mean of 2 - 2*cos(pred(online_u), target_i) both directions (BUIR.py:87-95).
The target encoder receives NO gradients; after each optimizer step only the
BATCH rows of the target EMBEDDING TABLES are momentum-updated toward the
online tables (BUIR.py:69-75 — the full-parameter EMA is commented out in the
reference, so target propagation uses the target's own tables but the online
encoder's dropout draw). Scoring concatenates [predictor(u_online); u_online]
against [i_online; predictor(i_online)] so the reference's score_ui+score_iu
(BUIR.py:46-51) is a single matmul in the batched evaluator.

TPU notes: the target tables are functional per-step state in the scan carry
(``aux``), updated via a masked scatter (``mode='drop'`` kills padded lanes);
the reference's in-place ``.data[idx] =`` mutation has no JAX analog.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops.graph import adj_dropout, lightgcn_propagate, norm_adj_from_scipy
from selfrec_tpu.ops.init import linear_apply, torch_linear_params, xavier_uniform
from selfrec_tpu.ops.losses import l2_normalize


class BUIR(JAXGraphRecommender):
    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.momentum = float(args.get("tau", 0.995))
        self.n_layers = int(args.get("n_layer", 2))
        self.drop_rate = float(args.get("drop_rate", 0.2))
        if self.mesh is None:
            # dense-eligible: per-step dropout rides DenseAdj.dropout_view
            # (scatter-multiply keep mask, factored form preserved) —
            # measured 2.6x over the per-step-reweighted ELL gather chain
            # (5,249 -> 13,661 ex/s at yelp scale, BENCH_MATRIX.json buir)
            self.adj = self.make_adj()
        else:
            # per-step dropout is unsupported on the sharded dense layout
            # (ops/graph.adj_dropout) — keep ELL/halo under a mesh
            self.adj = self.shard_adj(norm_adj_from_scipy(self.data.norm_adj))

    def init_params(self, key):
        ku, ki, kp = jax.random.split(key, 3)
        return {
            "user_emb": xavier_uniform(ku, (self.data.user_num, self.emb_size)),
            "item_emb": xavier_uniform(ki, (self.data.item_num, self.emb_size)),
            "predictor": torch_linear_params(kp, self.emb_size, self.emb_size),
        }

    def build(self):
        super().build()
        # target tables start as a copy of the online tables (BUIR.py:66-68)
        self.aux = {
            "t_user": jnp.array(self.params["user_emb"]),
            "t_item": jnp.array(self.params["item_emb"]),
        }

    def epoch_setup(self, epoch):
        return self.aux  # persistent target state threads through the scan

    def _propagate(self, user_table, item_table, key):
        ego = jnp.concatenate([user_table, item_table], axis=0)
        adj = self.adj
        if key is not None:
            k_rate, k_drop = jax.random.split(key)
            rate = jax.random.uniform(k_rate) * self.drop_rate
            adj = adj_dropout(adj, k_drop, rate)
        out = lightgcn_propagate(adj, ego, self.n_layers, include_layer0=True)
        return out[: self.data.user_num], out[self.data.user_num :]

    def compute_embeddings(self, params):
        u_online, i_online = self._propagate(
            params["user_emb"], params["item_emb"], key=None
        )
        p_u = linear_apply(params["predictor"], u_online)
        p_i = linear_apply(params["predictor"], i_online)
        # [p_u ; u] @ [i ; p_i]^T == score_ui + score_iu (BUIR.py:46-51)
        return (
            jnp.concatenate([p_u, u_online], axis=1),
            jnp.concatenate([i_online, p_i], axis=1),
        )

    def batch_loss(self, params, batch, key):
        from selfrec_tpu.ops.graph import spmm_packed, supports_packed

        k_on, k_tg = jax.random.split(key)
        aux = batch["aux"]
        t_user = jax.lax.stop_gradient(aux["t_user"])
        t_item = jax.lax.stop_gradient(aux["t_item"])
        if supports_packed(self.adj):
            # online + target chains share the adjacency LAYOUT and differ
            # only in their dropout draws -> one packed width-2D gather
            # chain (ops/spmm_ell.ell_spmm_packed)
            def drop_w(k):
                k_rate, k_keep = jax.random.split(k)
                rate = jax.random.uniform(k_rate) * self.drop_rate
                keep = jax.random.uniform(k_keep, self.adj.edge_w.shape) >= rate
                return jnp.where(keep, self.adj.edge_w / (1.0 - rate), 0.0)

            w_stack = jnp.stack([drop_w(k_on), drop_w(k_tg)])
            on_ego = jnp.concatenate([params["user_emb"], params["item_emb"]], 0)
            tg_ego = jnp.concatenate([t_user, t_item], 0)
            x = jnp.concatenate([on_ego, tg_ego], axis=1)
            acc = x  # include_layer0 (BUIR.py:137-141)
            for _ in range(self.n_layers):
                x = spmm_packed(self.adj, w_stack, x, 2)
                acc = acc + x
            out = acc / (self.n_layers + 1)
            d = self.emb_size
            nu = self.data.user_num
            u_on_all, i_on_all = out[:nu, :d], out[nu:, :d]
            u_tg_all, i_tg_all = out[:nu, d:], out[nu:, d:]
        else:
            u_on_all, i_on_all = self._propagate(
                params["user_emb"], params["item_emb"], k_on
            )
            u_tg_all, i_tg_all = self._propagate(t_user, t_item, k_tg)

        u_online = linear_apply(params["predictor"], u_on_all[batch["u"]])
        i_online = linear_apply(params["predictor"], i_on_all[batch["i"]])
        u_target = jax.lax.stop_gradient(u_tg_all[batch["u"]])
        i_target = jax.lax.stop_gradient(i_tg_all[batch["i"]])

        u_online = l2_normalize(u_online)
        i_online = l2_normalize(i_online)
        u_target = l2_normalize(u_target)
        i_target = l2_normalize(i_target)
        loss_ui = 2.0 - 2.0 * jnp.sum(u_online * i_target, axis=-1)
        loss_iu = 2.0 - 2.0 * jnp.sum(i_online * u_target, axis=-1)
        per = loss_ui + loss_iu
        m = batch["mask"]
        return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)

    def step_update(self, params, aux, batch):
        """Momentum-update ONLY the touched target rows (BUIR.py:69-75)."""
        m = self.momentum
        valid = batch["mask"].astype(bool)
        u_idx = jnp.where(valid, batch["u"], -1)
        i_idx = jnp.where(valid, batch["i"], -1)
        t_user = aux["t_user"]
        t_item = aux["t_item"]
        new_u = t_user[batch["u"]] * m + params["user_emb"][batch["u"]] * (1 - m)
        new_i = t_item[batch["i"]] * m + params["item_emb"][batch["i"]] * (1 - m)
        return {
            "t_user": t_user.at[u_idx].set(new_u, mode="drop"),
            "t_item": t_item.at[i_idx].set(new_i, mode="drop"),
        }
