"""Transformer encoder parity: our functional encoder vs the reference's
torch ``SASRec_Model`` with identical weights, on identical inputs."""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_sasrec_model():
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # SASRec_Model builds BoolTensor(...).cuda() — patch classmethod too
    orig_bool = torch.BoolTensor

    sys.path.insert(0, REF)
    try:
        from model.sequential.SASRec import SASRec_Model
    finally:
        sys.path.remove(REF)
    return SASRec_Model


def test_encoder_matches_reference_weights(ref_sasrec_model):
    import torch
    import jax.numpy as jnp

    from selfrec_tpu.ops import transformer

    emb_size, max_len, n_blocks, n_heads = 16, 12, 2, 2
    item_num = 30

    class FakeData:
        pass

    data = FakeData()
    data.item_num = item_num
    ref = ref_sasrec_model(data, emb_size, max_len, n_blocks, n_heads, drop_rate=0.0)
    ref.eval()

    # our params, copied FROM the torch module
    rng = np.random.default_rng(0)
    params = transformer.init_encoder_params(
        __import__("jax").random.PRNGKey(0), item_num + 1, max_len + 1, emb_size, n_blocks
    )
    with torch.no_grad():
        params["item_emb"] = jnp.asarray(ref.item_emb.numpy())
        params["pos_emb"] = jnp.asarray(ref.pos_emb.numpy())
        for b in range(n_blocks):
            blk = params["blocks"][b]
            attn = ref.attention_layers[b]
            blk["attn"]["w_in"] = jnp.asarray(attn.in_proj_weight.numpy().T)
            blk["attn"]["b_in"] = jnp.asarray(attn.in_proj_bias.numpy())
            blk["attn"]["out"]["w"] = jnp.asarray(attn.out_proj.weight.numpy().T)
            blk["attn"]["out"]["b"] = jnp.asarray(attn.out_proj.bias.numpy())
            blk["attn_ln"]["scale"] = jnp.asarray(
                ref.attention_layer_norms[b].weight.numpy()
            )
            blk["attn_ln"]["bias"] = jnp.asarray(
                ref.attention_layer_norms[b].bias.numpy()
            )
            blk["fwd_ln"]["scale"] = jnp.asarray(
                ref.forward_layer_norms[b].weight.numpy()
            )
            blk["fwd_ln"]["bias"] = jnp.asarray(ref.forward_layer_norms[b].bias.numpy())
            ff = ref.forward_layers[b].pwff
            blk["ff1"]["w"] = jnp.asarray(ff[0].weight.numpy().T)
            blk["ff1"]["b"] = jnp.asarray(ff[0].bias.numpy())
            blk["ff2"]["w"] = jnp.asarray(ff[2].weight.numpy().T)
            blk["ff2"]["b"] = jnp.asarray(ff[2].bias.numpy())
        params["last_ln"]["scale"] = jnp.asarray(ref.last_layer_norm.weight.numpy())
        params["last_ln"]["bias"] = jnp.asarray(ref.last_layer_norm.bias.numpy())

    # batch of padded sequences
    seq = np.zeros((4, max_len), dtype=np.int64)
    pos = np.zeros((4, max_len), dtype=np.int64)
    for r in range(4):
        L = int(rng.integers(3, max_len + 1))
        seq[r, :L] = rng.integers(1, item_num + 1, L)
        pos[r, :L] = np.arange(1, L + 1)

    with torch.no_grad():
        ref_out = ref.forward(seq, pos).numpy()
    ours = np.asarray(
        transformer.encode(
            params,
            jnp.asarray(seq.astype(np.int32)),
            jnp.asarray(pos.astype(np.int32)),
            n_heads=n_heads,
            drop_rate=0.0,
            causal=True,
            activation="relu",
            key=None,
        )
    )
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)
