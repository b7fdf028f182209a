"""On-device k-means (NCL's E-step).

TPU-native replacement for the reference's ``faiss.Kmeans(d, k, gpu=True)``
(/root/reference/model/graph/NCL.py:35-44): batched L2 distances on the MXU,
argmin assignment, segment-mean update, fixed iteration count under jit
(static shapes throughout; empty clusters keep their previous centroid).
faiss's default 25 Lloyd iterations and sampled-point init are mirrored.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "n_iters"))
def kmeans(key: jax.Array, x: jnp.ndarray, k: int, n_iters: int = 25):
    """Returns (centroids (k, D), assignments (N,) int32)."""
    n = x.shape[0]
    init_idx = jax.random.choice(key, n, shape=(k,), replace=n < k)
    centroids = x[init_idx]
    x_sq = jnp.sum(x * x, axis=1)

    def assign(cents):
        d = x_sq[:, None] - 2.0 * (x @ cents.T) + jnp.sum(cents * cents, axis=1)[None]
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    def body(_, cents):
        a = assign(cents)
        sums = jax.ops.segment_sum(x, a, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), x.dtype), a, num_segments=k)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0)[:, None], new, cents)

    centroids = jax.lax.fori_loop(0, n_iters, body, centroids)
    return centroids, assign(centroids)
