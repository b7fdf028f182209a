"""Parameter initialisers matching the reference's torch defaults."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, dtype=jnp.float32, gain: float = 1.0):
    """torch.nn.init.xavier_uniform_ semantics: for a 2D (rows, cols) tensor
    fan_in=cols, fan_out=rows, bound = gain*sqrt(6/(fan_in+fan_out)).
    Every reference model initialises its embedding tables this way
    (e.g. /root/reference/model/graph/MF.py:52-57)."""
    fan_out, fan_in = shape[0], shape[-1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_params(key, in_features: int, out_features: int, dtype=jnp.float32):
    """W (in, out) + b (out,) with torch.nn.Linear's default init:
    kaiming_uniform(a=sqrt(5)) on the weight == U[-1/sqrt(fan_in),
    1/sqrt(fan_in)], same bound for the bias. Used for the reference's
    predictor/tower layers (BUIR.py:63, SelfCF.py:62, SSL4Rec.py:65-75)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(
        kw, (in_features, out_features), dtype, minval=-bound, maxval=bound
    )
    b = jax.random.uniform(kb, (out_features,), dtype, minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def linear_apply(p, x):
    return x @ p["w"] + p["b"]
