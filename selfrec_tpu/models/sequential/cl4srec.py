"""CL4SRec.

Capability parity with /root/reference/model/sequential/CL4SRec.py: the
SASRec encoder with an item_num+2 vocabulary (mask token = item_num+1,
CL4SRec.py:23-25), SASRec's BCE next-item loss + full-table item L2, plus
cl_rate x InfoNCE(tau=1, cosine) between the last-position embeddings of two
augmented views — crop (aug_type 0, new positions/lengths), reorder (1) or
mask (2) (CL4SRec.py:37-58), augmentors vectorised on device
(ops/seq_sampling.py mirroring data/augmentor.py:43-74).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.sequential.sasrec import SASRec, _bce_next_item_loss
from selfrec_tpu.ops import seq_sampling
from selfrec_tpu.ops.losses import infonce, l2_reg_loss


class CL4SRec(SASRec):
    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.aug_type = int(args.get("aug_type", 0))
        self.aug_rate = float(args.get("aug_rate", 0.5))
        self.cl_rate = float(args.get("cl_rate", 0.05))

    def vocab_size(self):
        return self.data.item_num + 2  # + pad + mask token (CL4SRec.py:24)

    def _augment(self, key, seq, pos, seq_len):
        """One augmented view -> (seq, pos, last_len)."""
        if self.aug_type == 0:
            aug_seq, aug_pos, aug_len = seq_sampling.item_crop(
                key, seq, seq_len, self.aug_rate
            )
            return aug_seq, aug_pos, aug_len
        if self.aug_type == 1:
            return seq_sampling.item_reorder(key, seq, seq_len, self.aug_rate), pos, seq_len
        aug = seq_sampling.item_mask(
            key, seq, seq_len, self.aug_rate, self.data.item_num + 1
        )
        return aug, pos, seq_len

    def batch_loss(self, params, batch, key):
        k_enc, k_a1, k_a2, k_e1, k_e2 = jax.random.split(key, 5)
        seq_emb = self._encode(params, batch["seq"], batch["pos"], key=k_enc)
        valid = (batch["pos"] != 0) & (batch["row_mask"][:, None] > 0)
        rec = _bce_next_item_loss(
            seq_emb, params["item_emb"], batch["y"], batch["neg"], valid
        )

        seq_len = jnp.maximum(batch["seq_len"], 1)
        s1, p1, l1 = self._augment(k_a1, batch["seq"], batch["pos"], seq_len)
        s2, p2, l2 = self._augment(k_a2, batch["seq"], batch["pos"], seq_len)
        e1 = self._encode(params, s1, p1, key=k_e1)
        e2 = self._encode(params, s2, p2, key=k_e2)

        def last(e, lens):
            return jnp.take_along_axis(
                e, (lens - 1)[:, None, None].astype(jnp.int32), axis=1
            )[:, 0, :]

        cl = infonce(
            last(e1, l1), last(e2, l2), 1.0, b_cos=True, mask=batch["row_mask"]
        )
        return rec + l2_reg_loss(self.reg, params["item_emb"]) + self.cl_rate * cl
