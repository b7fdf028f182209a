"""SGL (Self-supervised Graph Learning).

Capability parity with /root/reference/model/graph/SGL.py (live torch part,
SGL.py:13-127): LightGCN propagation (mean over layers INCLUDING layer 0,
SGL.py:100-111), BPR + L2(u,pos,neg) (not batch-size scaled, SGL.py:36) +
cl_rate x InfoNCE over concatenated [user;item] anchors of two views
propagated through two per-EPOCH dropped adjacencies (SGL.py:28-29,115-127).
``aug_type`` 0 = node dropout, 1/2 = edge dropout. The reference's
``graph_reconstruction`` has ``if self.aug_type==0 or 1`` (SGL.py:81) which
is always truthy, so the per-layer adjacency list branch for aug_type 2 is
dead code; we reproduce the effective behaviour (one dropped adjacency per
view per epoch). fast_evaluation only from epoch >= 5 (SGL.py:44-45).

TPU notes: dropout picks kept edges on host (exact reference keep counts,
data/augmentor.py:11-40) but the re-normalisation and the adjacency itself
are built ON DEVICE from a static-shape keep mask
(ops/graph.build_norm_adj_from_mask) — no scipy rebuild, no recompile across
epochs; the two views ride the scanned epoch as part of the carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from selfrec_tpu.models.base import JAXGraphRecommender
from selfrec_tpu.ops import losses
from selfrec_tpu.ops.graph import (
    bipartite_renorm_weights,
    build_bipartite_ell_template,
    lightgcn_propagate,
)
from selfrec_tpu.ops.init import xavier_uniform
from selfrec_tpu.ops.sampling import unique_with_mask


class SGL(JAXGraphRecommender):
    # the packed-view template + clean weights (ELL path) or the two
    # per-epoch dense view blocks are large static pytrees used inside
    # batch_loss — thread them through the jitted epoch as args
    scan_const_attrs = JAXGraphRecommender.scan_const_attrs + (
        "_view_template",
        "_w_clean",
        "_view1",
        "_view2",
    )

    def should_evaluate(self, epoch):
        return epoch >= 5  # reference cadence (SGL.py:44-45)

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.cl_rate = float(args.get("lambda", 0.1))
        self.aug_type = int(args.get("aug_type", 1))
        self.drop_rate = float(args.get("drop_rate", 0.1))
        self.n_layers = int(args.get("n_layer", 2))
        self.temp = float(args.get("temp", 0.2))
        self.adj = self.make_adj()
        self._edge_users_dev = jnp.asarray(self.data.edge_users)
        self._edge_items_dev = jnp.asarray(self.data.edge_items)
        self._view_template = None
        self._w_clean = None
        self._view1 = None
        self._view2 = None
        if self._dense_views():
            # MXU path: each per-epoch dropped view is rebuilt as a NEW
            # int8-factored dense block (DenseAdj.refactor_view — the
            # symmetric renorm over kept edges factors exactly, so views
            # propagate at clean-graph speed with no weight quantization).
            # The adjacency's edge order (scipy COO of norm_adj) differs
            # from the dataset's edge order the keep-mask is drawn in —
            # map once here.
            self._edge_perm = jnp.asarray(self._adj_edge_perm())
        else:
            # gather path: static ELL layout shared by every dropped view
            # (weights swap per epoch)
            self._view_template = self.shard_adj(
                build_bipartite_ell_template(
                    self.data.edge_users,
                    self.data.edge_items,
                    self.data.user_num,
                    self.data.item_num,
                )
            )
            # clean-graph weights over the SAME layout (== norm_adj norm)
            self._w_clean = bipartite_renorm_weights(
                self._edge_users_dev,
                self._edge_items_dev,
                jnp.ones(self.data.n_edges, dtype=bool),
                self.data.user_num,
                self.data.item_num,
            )

    def _dense_views(self) -> bool:
        from selfrec_tpu.ops.spmm_dense import DenseAdj
        from selfrec_tpu.parallel.dense_shard import ShardedDenseAdj

        return isinstance(self.adj, (DenseAdj, ShardedDenseAdj))

    def _adj_edge_perm(self) -> np.ndarray:
        from selfrec_tpu.ops.spmm_dense import adj_edge_perm

        return adj_edge_perm(self.adj, self.data.edge_users,
                             self.data.edge_items, self.data.item_num)

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
            self.adj, self._ego(params), self.n_layers, include_layer0=True
        )
        return out[: self.data.user_num], out[self.data.user_num :]

    # -- per-epoch dropped views --------------------------------------------
    def _edge_keep_mask(self, rng) -> np.ndarray:
        """Kept-edge indicator with the reference augmentor's exact counts."""
        n_e = self.data.n_edges
        keep = np.zeros(n_e, dtype=bool)
        if self.aug_type == 0:
            n_u, n_i = self.data.user_num, self.data.item_num
            drop_u = rng.choice(n_u, size=int(n_u * self.drop_rate), replace=False)
            drop_i = rng.choice(n_i, size=int(n_i * self.drop_rate), replace=False)
            keep_u = np.ones(n_u, dtype=bool)
            keep_i = np.ones(n_i, dtype=bool)
            keep_u[drop_u] = False
            keep_i[drop_i] = False
            keep = keep_u[self.data.edge_users] & keep_i[self.data.edge_items]
        else:
            kept = rng.choice(
                n_e, size=int(n_e * (1 - self.drop_rate)), replace=False
            )
            keep[kept] = True
        return keep

    def _view_weights(self, rng):
        return bipartite_renorm_weights(
            self._edge_users_dev,
            self._edge_items_dev,
            jnp.asarray(self._edge_keep_mask(rng)),
            self.data.user_num,
            self.data.item_num,
        )

    def epoch_setup(self, epoch):
        rng = self.epoch_rng(epoch, stream=1)
        if self._dense_views():
            # two fresh int8-factored view blocks per epoch (one scatter +
            # two segment-sums each); threaded via scan_const_attrs, which
            # run_epoch collects AFTER this call
            k1 = jnp.asarray(self._edge_keep_mask(rng))[self._edge_perm]
            k2 = jnp.asarray(self._edge_keep_mask(rng))[self._edge_perm]
            self._view1 = self.adj.refactor_view(k1)
            self._view2 = self.adj.refactor_view(k2)
            return {}
        return {"w1": self._view_weights(rng), "w2": self._view_weights(rng)}

    # -- loss ----------------------------------------------------------------
    def _propagated_views(self, params, aux):
        """(clean, view1, view2) propagated (n, D) embeddings.

        ELL path: the clean graph + both dropped views share the template's
        layout (only weights differ), so the 3 chains run as ONE packed
        width-3D gather chain (spmm_ell.ell_spmm_packed). Dense path: three
        int8-factored blocks — the MXU matmul streams each block once per
        layer, and the per-epoch views were refactored in epoch_setup."""
        from selfrec_tpu.ops.graph import spmm, spmm_packed

        ego = self._ego(params)
        if self._view_template is None:
            outs = []
            for adj in (self.adj, self._view1, self._view2):
                x = ego
                acc = ego  # include_layer0=True (SGL.py:100-111)
                for _ in range(self.n_layers):
                    x = spmm(adj, x)
                    acc = acc + x
                outs.append(acc / (self.n_layers + 1))
            return outs
        w_stack = jnp.stack([self._w_clean, aux["w1"], aux["w2"]])
        x = jnp.concatenate([ego, ego, ego], axis=1)
        acc = x
        for _ in range(self.n_layers):
            x = spmm_packed(self._view_template, w_stack, x, 3)
            acc = acc + x
        out = acc / (self.n_layers + 1)
        d = self.emb_size
        return out[:, :d], out[:, d : 2 * d], out[:, 2 * d :]

    def batch_loss(self, params, batch, key):
        clean, view1, view2 = self._propagated_views(params, batch["aux"])

        nu = self.data.user_num
        user_all, item_all = clean[:nu], clean[nu:]
        u = user_all[batch["u"]]
        p = item_all[batch["i"]]
        n = item_all[batch["j"]]
        mask = batch["mask"]
        rec = losses.bpr_loss(u, p, n, mask=mask)
        reg = losses.l2_reg_loss(self.reg, u, p, n, mask=mask)

        valid = mask.astype(bool)
        u_idx, u_mask = unique_with_mask(
            jnp.where(valid, batch["u"], -1), self.batch_size
        )
        i_idx, i_mask = unique_with_mask(
            jnp.where(valid, batch["i"], -1), self.batch_size
        )
        v1 = jnp.concatenate([view1[:nu][u_idx], view1[nu:][i_idx]], axis=0)
        v2 = jnp.concatenate([view2[:nu][u_idx], view2[nu:][i_idx]], axis=0)
        m = jnp.concatenate([u_mask, i_mask], axis=0)
        cl = self.cl_rate * losses.infonce(v1, v2, self.temp, mask=m)
        return rec + reg + cl
