"""Functional transformer encoder for sequential recommenders.

TPU-native equivalent of the reference's torch encoders
(/root/reference/model/sequential/SASRec.py:63-114 and BERT4Rec.py:85-129):
pre-LN blocks where the attention QUERY is layer-normed but keys/values are
the un-normed input (SASRec.py:104-106), residual adds the normed query, a
post-attention LayerNorm then a PointWiseFeedForward
(Linear->act->Linear->Dropout + residual, util/structure.py:4-23), timeline
(pad) zeroing after each block, final LayerNorm(eps=1e-8). SASRec uses a
causal mask + relu FFN; BERT4Rec no mask + gelu FFN — both are the same
``encode`` with flags. All dropout sites (embedding, attention weights, FFN
output) follow torch placements and are active only when a PRNG key is
given.

Static shapes (B, max_len, D) throughout; the (L, L) causal mask is a
compile-time constant — ideal for XLA fusion; attention/FFN matmuls ride the
MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from selfrec_tpu.ops.init import linear_apply, torch_linear_params, xavier_uniform

LN_EPS = 1e-8  # reference LayerNorm eps (SASRec.py:80)


def layer_norm(p, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + LN_EPS) * p["scale"] + p["bias"]


def _ln_params(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _dropout(key, x, rate):
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    return jnp.where(jax.random.bernoulli(key, keep, x.shape), x / keep, 0.0)


def init_mha_params(key, d):
    """torch.nn.MultiheadAttention init: xavier on the packed in-proj,
    zero biases; Linear-default weight + zero bias on out-proj."""
    k_in, k_out = jax.random.split(key)
    return {
        "w_in": xavier_uniform(k_in, (3 * d, d)).T,  # stored (d, 3d)
        "b_in": jnp.zeros((3 * d,)),
        "out": dict(torch_linear_params(k_out, d, d), b=jnp.zeros((d,))),
    }


def mha(p, q, kv, n_heads, causal, drop_rate, key=None):
    """Multi-head attention, (B, L, D) in/out, optional causal mask."""
    b, l, d = q.shape
    dh = d // n_heads
    wq, wk, wv = jnp.split(p["w_in"], 3, axis=1)
    bq, bk, bv = jnp.split(p["b_in"], 3)
    qh = (q @ wq + bq).reshape(b, l, n_heads, dh).transpose(0, 2, 1, 3)
    kh = (kv @ wk + bk).reshape(b, l, n_heads, dh).transpose(0, 2, 1, 3)
    vh = (kv @ wv + bv).reshape(b, l, n_heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(dh)
    if causal:
        mask = jnp.tril(jnp.ones((l, l), dtype=bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = _dropout(key, attn, drop_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
    return linear_apply(p["out"], out)


def init_encoder_params(key, vocab_size, n_positions, d, n_blocks):
    """item/pos tables + per-block attention & FFN params.

    vocab_size includes pad (and mask token where applicable): SASRec uses
    item_num+1 (SASRec.py:75), BERT4Rec/CL4SRec item_num+2 (BERT4Rec.py:99,
    CL4SRec.py:24). n_positions likewise max_len+1 or max_len+2.
    """
    keys = jax.random.split(key, 2 + 3 * n_blocks)
    params = {
        "item_emb": xavier_uniform(keys[0], (vocab_size, d)),
        "pos_emb": xavier_uniform(keys[1], (n_positions, d)),
        "blocks": [],
        "last_ln": _ln_params(d),
    }
    for i in range(n_blocks):
        ka, kf1, kf2 = keys[2 + 3 * i : 5 + 3 * i]
        params["blocks"].append(
            {
                "attn_ln": _ln_params(d),
                "attn": init_mha_params(ka, d),
                "fwd_ln": _ln_params(d),
                "ff1": torch_linear_params(kf1, d, d),
                "ff2": torch_linear_params(kf2, d, d),
            }
        )
    return params


def encode(
    params,
    seq: jnp.ndarray,
    pos: jnp.ndarray,
    n_heads: int,
    drop_rate: float,
    causal: bool,
    activation: str = "relu",
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, L) int ids -> (B, L, D) sequence embeddings."""
    d = params["item_emb"].shape[1]
    x = params["item_emb"][seq] * math.sqrt(d) + params["pos_emb"][pos]
    n_blocks = len(params["blocks"])
    keys = (
        jax.random.split(key, 2 * n_blocks + 1) if key is not None else [None] * (
            2 * n_blocks + 1
        )
    )
    x = _dropout(keys[0], x, drop_rate)
    timeline = (seq != 0)[..., None].astype(x.dtype)
    x = x * timeline
    act = jax.nn.relu if activation == "relu" else jax.nn.gelu
    for i, blk in enumerate(params["blocks"]):
        q = layer_norm(blk["attn_ln"], x)
        a = mha(blk["attn"], q, x, n_heads, causal, drop_rate, keys[1 + 2 * i])
        x = q + a
        x = layer_norm(blk["fwd_ln"], x)
        h = linear_apply(blk["ff2"], act(linear_apply(blk["ff1"], x)))
        h = _dropout(keys[2 + 2 * i], h, drop_rate)
        x = x + h
        x = x * timeline
    return layer_norm(params["last_ln"], x)
