"""SASRec.

Capability parity with /root/reference/model/sequential/SASRec.py: causal
pre-LN transformer (encoder details in ops/transformer.py), BCE-with-logits
on positive/negative next-item logits at non-pad positions — separate means
for the positive and negative terms (SASRec.py:44-53) — plus
l2_reg(item_emb) over the WHOLE table (SASRec.py:35). Prediction scores the
last-position output against the item table (SASRec.py:55-60).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.base import JAXSequentialRecommender
from selfrec_tpu.ops import transformer
from selfrec_tpu.ops.losses import l2_reg_loss


def _bce_next_item_loss(seq_emb, item_emb, y, neg, valid):
    """Reference calculate_loss (SASRec.py:44-53): mean BCE over valid
    positions, positives and negatives averaged separately."""
    pos_logits = jnp.sum(seq_emb * item_emb[y], axis=-1)
    neg_logits = jnp.sum(seq_emb * item_emb[neg], axis=-1)
    v = valid.astype(seq_emb.dtype)
    denom = jnp.maximum(jnp.sum(v), 1.0)
    loss_pos = jnp.sum(jax.nn.softplus(-pos_logits) * v) / denom
    loss_neg = jnp.sum(jax.nn.softplus(neg_logits) * v) / denom
    return loss_pos + loss_neg


class SASRec(JAXSequentialRecommender):
    activation = "relu"
    causal = True

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.n_blocks = int(args.get("n_blocks", 2))
        self.drop_rate = float(args.get("drop_rate", 0.2))
        self.n_heads = int(args.get("n_heads", 1))

    def vocab_size(self):
        return self.data.item_num + 1  # + pad (SASRec.py:75)

    def n_positions(self):
        return self.max_len + 1

    def init_params(self, key):
        return transformer.init_encoder_params(
            key, self.vocab_size(), self.n_positions(), self.emb_size, self.n_blocks
        )

    def _encode(self, params, seq, pos, key=None):
        return transformer.encode(
            params, seq, pos, self.n_heads, self.drop_rate,
            causal=self.causal, activation=self.activation, key=key,
        )

    def batch_loss(self, params, batch, key):
        seq_emb = self._encode(params, batch["seq"], batch["pos"], key=key)
        valid = (batch["pos"] != 0) & (batch["row_mask"][:, None] > 0)
        rec = _bce_next_item_loss(
            seq_emb, params["item_emb"], batch["y"], batch["neg"], valid
        )
        return rec + l2_reg_loss(self.reg, params["item_emb"])

    def predict_scores(self, params, seq, pos, seq_len):
        seq_emb = self._encode(params, seq, pos, key=None)
        last = jnp.take_along_axis(
            seq_emb, (seq_len - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]
        return last @ params["item_emb"].T
