"""Training objectives.

JAX ports of the reference loss zoo (/root/reference/util/loss_torch.py:6-94
and util/loss_tf.py:4-29), numerically identical where batches are unpadded.
Every loss takes an optional ``mask`` so fixed-shape padded batches (the TPU
static-shape discipline) reduce over valid rows only; with a full batch the
results match the reference bit-for-bit conventions (including the
``10e-6 = 1e-5`` epsilon inside the BPR log, loss_torch.py:9).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Row L2 normalisation matching torch.nn.functional.normalize:
    x / max(||x||, eps) — written as x * rsqrt(max(sum(x^2), eps^2)) so the
    VJP is finite at exactly-zero rows. The naive norm form differentiates
    sqrt at 0 (0 * inf = NaN); zero rows are ROUTINE here — motif channels
    with empty rows (MHCN H_p) and cold items propagate to exact zeros,
    and whether XLA's fusion surfaced the NaN depended on the spmm backend
    (dense MXU blocks hit it, the ELL gather chain happened not to)."""
    s = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(s, eps * eps))


def bpr_loss(user_emb, pos_item_emb, neg_item_emb, mask=None):
    """-log(sigmoid(pos - neg) + 1e-5). Reference loss_torch.py:6-10."""
    pos_score = jnp.sum(user_emb * pos_item_emb, axis=-1)
    neg_score = jnp.sum(user_emb * neg_item_emb, axis=-1)
    loss = -jnp.log(1e-5 + jax.nn.sigmoid(pos_score - neg_score))
    return _masked_mean(loss, mask)


def triplet_loss(user_emb, pos_item_emb, neg_item_emb, margin: float = 0.5, mask=None):
    """Squared-distance triplet with 0.5 margin. Reference loss_torch.py:12-16."""
    pos_score = jnp.sum((user_emb - pos_item_emb) ** 2, axis=-1)
    neg_score = jnp.sum((user_emb - neg_item_emb) ** 2, axis=-1)
    loss = jax.nn.relu(pos_score - neg_score + margin)
    return _masked_mean(loss, mask)


def l2_reg_loss(reg: float, *embs, mask=None):
    """reg * sum_e ||E_e||_F / rows(E_e). Reference loss_torch.py:18-22
    (torch.norm on a matrix is the Frobenius norm of the whole matrix)."""
    total = 0.0
    for emb in embs:
        if mask is not None:
            m = mask.astype(emb.dtype).reshape(-1, *([1] * (emb.ndim - 1)))
            emb = emb * m
            rows = jnp.maximum(jnp.sum(mask), 1.0)
        else:
            rows = emb.shape[0]
        total = total + jnp.sqrt(jnp.sum(emb * emb) + 1e-24) / rows
    return total * reg


def batch_softmax_loss(user_emb, item_emb, temperature: float, mask=None):
    """In-batch sampled softmax retrieval loss. Reference loss_torch.py:25-32."""
    user_emb = l2_normalize(user_emb)
    item_emb = l2_normalize(item_emb)
    pos_score = jnp.exp(jnp.sum(user_emb * item_emb, axis=-1) / temperature)
    ttl = jnp.exp(user_emb @ item_emb.T / temperature)
    if mask is not None:
        ttl = ttl * mask.astype(ttl.dtype)[None, :]
    ttl_score = jnp.sum(ttl, axis=1)
    loss = -jnp.log(pos_score / ttl_score + 1e-5)
    return _masked_mean(loss, mask)


def infonce(view1, view2, temperature: float, b_cos: bool = True, mask=None):
    """-mean(diag(log_softmax(V1 V2ᵀ / τ))). Reference loss_torch.py:35-50.

    ``mask`` marks valid rows of both views; invalid rows are excluded as
    anchors AND as in-batch negatives.
    """
    if b_cos:
        view1 = l2_normalize(view1)
        view2 = l2_normalize(view2)
    logits = view1 @ view2.T / temperature
    if mask is not None:
        logits = jnp.where(mask.astype(bool)[None, :], logits, -1e9)
    log_probs = jax.nn.log_softmax(logits, axis=1)
    diag = jnp.diagonal(log_probs)
    return -_masked_mean(diag, mask)


def info_nce_recbole(z_i, z_j, temp: float, batch_size: int, sim: str = "dot"):
    """RecBole-style 2N-view InfoNCE used by CL4SRec. Reference
    loss_torch.py:54-88: for each of the 2N rows the positive is its
    counterpart view; the other 2(N-1) rows are negatives."""
    n = 2 * batch_size
    z = jnp.concatenate([z_i, z_j], axis=0)
    if sim == "cos":
        zn = l2_normalize(z)
        sim_mat = zn @ zn.T / temp
    else:
        sim_mat = z @ z.T / temp
    pos = jnp.concatenate(
        [jnp.diagonal(sim_mat, offset=batch_size), jnp.diagonal(sim_mat, offset=-batch_size)]
    )
    idx = jnp.arange(n)
    self_mask = idx[:, None] == idx[None, :]
    pair_mask = (idx[:, None] == idx[None, :] + batch_size) | (
        idx[:, None] + batch_size == idx[None, :]
    )
    neg_logits = jnp.where(self_mask | pair_mask, -1e9, sim_mat)
    # cross-entropy with the positive prepended as class 0
    logits = jnp.concatenate([pos[:, None], neg_logits], axis=1)
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])


def kl_divergence(p_logit, q_logit):
    """KL(softmax(p) || softmax(q)) per row, averaged. Reference loss_torch.py:91-94."""
    p = jax.nn.softmax(p_logit, axis=-1)
    kl = jnp.sum(
        p * (jax.nn.log_softmax(p_logit, axis=-1) - jax.nn.log_softmax(q_logit, axis=-1)),
        axis=1,
    )
    return jnp.mean(kl)


def alignment_loss_masked(x, y, mask=None):
    """Alignment with padded-row masking (fixed-shape batches)."""
    x, y = l2_normalize(x), l2_normalize(y)
    return _masked_mean(jnp.sum((x - y) ** 2, axis=-1), mask)


def _strict_upper(n: int) -> jnp.ndarray:
    """(n, n) boolean i<j mask from iota — no materialized index arrays.

    TPU note: gathering the upper triangle (``d2[triu_indices]``) is a
    ~n^2/2-element gather whose VJP is a scatter-add; both are slot-bound
    on TPU and made each uniformity grad ~105 ms at n=2048 — pushing the
    whole-epoch DirectAU scan past the worker's single-dispatch limit.
    Masked full-matrix reductions keep everything elementwise + matmul."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return r < c


def uniformity_loss(x, t: int = 2):
    """DirectAU uniformity: log E exp(-t ||xi-xj||^2) over distinct pairs
    (reference DirectAU.py:42-45 uses torch.pdist — strictly i<j pairs),
    computed as a masked logsumexp over the full pair matrix (see
    :func:`_strict_upper` for why no triangle gather)."""
    x = l2_normalize(x)
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    n = x.shape[0]
    tri = _strict_upper(n)
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    logits = jnp.where(tri, -t * d2, neg_inf)
    return jax.nn.logsumexp(logits) - jnp.log(n * (n - 1) // 2)


def uniformity_loss_masked(x, mask, t: int = 2):
    """Uniformity over valid (non-pad) strictly-i<j pairs only.

    ``uniformity_loss`` over a padded fixed-size batch is badly biased: pad
    slots duplicate row 0, and their zero-distance pairs dominate the
    logsumexp (measured +89% loss on a half-padded batch —
    tests/test_untested_surfaces.py). This variant masks out any pair
    touching a pad row, matching the reference's exact-size
    ``torch.pdist`` semantics (DirectAU.py:42-45) while keeping one static
    compiled shape. Reduces to ``uniformity_loss`` when mask is all-ones."""
    x = l2_normalize(x)
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    n = x.shape[0]
    m = mask.astype(x.dtype)
    pair_valid = _strict_upper(n) & (m[:, None] * m[None, :] > 0)
    # <2 valid rows -> no valid pairs. The reference would produce -inf here
    # (torch.logsumexp over torch.pdist's empty output) and NaN-poison its
    # backward pass; we return 0 with zero gradient instead (deliberate
    # deviation, documented in PARITY.md). The double-where keeps the
    # all-invalid branch finite so reverse-mode sees no NaN.
    n_pairs = jnp.sum(pair_valid.astype(x.dtype))
    has_pairs = n_pairs > 0
    safe_valid = jnp.where(has_pairs, pair_valid, jnp.ones_like(pair_valid))
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    logits = jnp.where(safe_valid, -t * d2, neg_inf)
    lse = jax.nn.logsumexp(logits) - jnp.log(jnp.maximum(n_pairs, 1.0))
    return jnp.where(has_pairs, lse, 0.0)


def ssm_loss(user_emb, pos_item_emb, neg_item_emb, mask=None):
    """Sampled softmax over explicit negatives at tau=0.2 (reference
    util/loss_tf.py:19-29): all embeddings l2-normalized; the positive is
    prepended to the negative columns of the denominator."""
    user_emb = l2_normalize(user_emb)
    pos_item_emb = l2_normalize(pos_item_emb)
    neg_item_emb = l2_normalize(neg_item_emb)
    pos_score = jnp.sum(user_emb * pos_item_emb, axis=1)
    ttl = user_emb @ neg_item_emb.T
    if mask is not None:
        ttl = jnp.where(mask.astype(bool)[None, :], ttl, -1e9)
    ttl = jnp.concatenate([pos_score[:, None], ttl], axis=1)
    pos_e = jnp.exp(pos_score / 0.2)
    ttl_e = jnp.sum(jnp.exp(ttl / 0.2), axis=1)
    return -_masked_mean(jnp.log(pos_e / ttl_e), mask)


def bpr_loss_sum(user_emb, pos_item_emb, neg_item_emb, mask=None):
    """TF-variant BPR that sums instead of averaging (reference
    util/loss_tf.py:4-7, incl. its ``10e-8`` epsilon inside the log), used by
    the social models (MHCN/SEPT)."""
    pos_score = jnp.sum(user_emb * pos_item_emb, axis=-1)
    neg_score = jnp.sum(user_emb * neg_item_emb, axis=-1)
    loss = -jnp.log(jax.nn.sigmoid(pos_score - neg_score) + 10e-8)
    if mask is not None:
        loss = loss * mask.astype(loss.dtype)
    return jnp.sum(loss)
