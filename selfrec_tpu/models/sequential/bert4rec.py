"""BERT4Rec.

Capability parity with /root/reference/model/sequential/BERT4Rec.py:
bidirectional (no causal mask) gelu transformer over an item_num+2 vocab
(mask token = item_num+1, BERT4Rec.py:99); training masks max(floor(len *
mask_rate), 1) random positions per sequence and cross-entropies the masked
positions over the full vocabulary, with the reference's double division —
mean CE over masked entries divided AGAIN by the masked count
(BERT4Rec.py:57-62) — plus full-table item L2. Inference appends the mask
token after the sequence, shifting full windows left, and scores position
seq_len-1 (BERT4Rec.py:64-77 — note for non-full sequences the reference
reads the last REAL item's position, not the appended mask's; reproduced
verbatim for parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from selfrec_tpu.models.sequential.sasrec import SASRec
from selfrec_tpu.ops import seq_sampling
from selfrec_tpu.ops.losses import l2_reg_loss


class BERT4Rec(SASRec):
    activation = "gelu"
    causal = False

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        args = conf[self.model_name] if conf.contain(self.model_name) else {}
        self.mask_rate = float(args.get("mask_rate", 0.5))

    def vocab_size(self):
        return self.data.item_num + 2

    def n_positions(self):
        return self.max_len + 2  # BERT4Rec.py:100

    def batch_loss(self, params, batch, key):
        k_mask, k_enc = jax.random.split(key)
        seq_len = jnp.maximum(batch["seq_len"], 1)
        aug_seq, chosen = seq_sampling.bert_mask(
            k_mask, batch["seq"], seq_len, self.mask_rate, self.data.item_num + 1
        )
        # gate out padded rows and positions beyond the window
        l = batch["seq"].shape[1]
        chosen = (
            chosen
            & (jnp.arange(l)[None, :] < batch["seq_len"][:, None])
            & (batch["row_mask"][:, None] > 0)
        )
        aug_seq = jnp.where(chosen, aug_seq, batch["seq"])
        seq_emb = self._encode(params, aug_seq, batch["pos"], key=k_enc)
        # full-vocab logits ONLY at masked positions: per row at most
        # max(floor(L * rate), 1) positions are masked, so gather them
        # into a fixed-K buffer (top_k over the 0/1 mask keeps chosen
        # indices first, ties broken low-index) — the (B, L, V) softmax
        # was 65% of the step, this halves its traffic at rate 0.5 while
        # computing the IDENTICAL per-position CE (the reference also
        # cross-entropies masked entries only, BERT4Rec.py:57-62)
        k_sel = min(l, max(int(l * self.mask_rate), 1))
        sel_val, sel_idx = jax.lax.top_k(chosen.astype(jnp.int32), k_sel)
        valid = sel_val > 0
        emb_sel = jnp.take_along_axis(seq_emb, sel_idx[..., None], axis=1)
        labels_sel = jnp.take_along_axis(batch["seq"], sel_idx, axis=1)
        logits = emb_sel @ params["item_emb"].T  # (B, K, vocab)
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), labels_sel[..., None], axis=-1
        )[..., 0]
        n_masked = jnp.maximum(jnp.sum(chosen), 1.0)
        rec = jnp.sum(jnp.where(valid, ce, 0.0)) / n_masked / n_masked
        return rec + l2_reg_loss(self.reg, params["item_emb"])

    def predict_scores(self, params, seq, pos, seq_len):
        l = seq.shape[1]
        mask_id = self.data.item_num + 1
        arange = jnp.arange(l)[None, :]
        full = (seq_len == l)[:, None]
        # non-full: put mask token / position right after the window
        app_seq = jnp.where(arange == seq_len[:, None], mask_id, seq)
        app_pos = jnp.where(arange == seq_len[:, None], seq_len[:, None] + 1, pos)
        # full: shift left, mask token last, position value seq_len
        sh_seq = jnp.concatenate(
            [seq[:, 1:], jnp.full((seq.shape[0], 1), mask_id, seq.dtype)], axis=1
        )
        sh_pos = jnp.concatenate(
            [pos[:, 1:], seq_len[:, None].astype(pos.dtype)], axis=1
        )
        seq2 = jnp.where(full, sh_seq, app_seq)
        pos2 = jnp.where(full, sh_pos, app_pos)
        seq_emb = self._encode(params, seq2, pos2, key=None)
        last = jnp.take_along_axis(
            seq_emb, (seq_len - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]
        return last @ params["item_emb"].T
