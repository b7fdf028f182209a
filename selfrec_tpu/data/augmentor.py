"""Graph augmentation (host-side, per-epoch setup).

Produces dropped interaction matrices for contrastive view construction with
the same semantics as the reference ``GraphAugmentor``
(/root/reference/data/augmentor.py:6-40): ``node_dropout`` zeroes the rows and
columns of uniformly chosen users/items; ``edge_dropout`` keeps a uniform
(1-rate) subset of the nonzeros. Implemented with vectorised numpy on the
edge arrays rather than the reference's ``random.sample`` loops; dropped
views feed ``Interaction.convert_to_laplacian_mat`` exactly as the reference
does (model/graph/SGL.py:89-96).

Steady-state per-step augmentation (SimGCL noise etc.) lives on device in
:mod:`selfrec_tpu.ops`; this module is only for per-epoch view rebuilds.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def node_dropout(sp_adj: sp.spmatrix, drop_rate: float, rng: np.random.Generator) -> sp.csr_matrix:
    n_users, n_items = sp_adj.get_shape()
    row_idx, col_idx = sp_adj.nonzero()
    drop_users = rng.choice(n_users, size=int(n_users * drop_rate), replace=False)
    drop_items = rng.choice(n_items, size=int(n_items * drop_rate), replace=False)
    user_keep = np.ones(n_users, dtype=bool)
    item_keep = np.ones(n_items, dtype=bool)
    user_keep[drop_users] = False
    item_keep[drop_items] = False
    keep = user_keep[row_idx] & item_keep[col_idx]
    vals = np.ones(keep.sum(), dtype=np.float32)
    return sp.csr_matrix(
        (vals, (row_idx[keep], col_idx[keep])), shape=(n_users, n_items), dtype=np.float32
    )


def edge_dropout(sp_adj: sp.spmatrix, drop_rate: float, rng: np.random.Generator) -> sp.csr_matrix:
    shape = sp_adj.get_shape()
    row_idx, col_idx = sp_adj.nonzero()
    edge_count = len(row_idx)
    keep_idx = rng.choice(edge_count, size=int(edge_count * (1 - drop_rate)), replace=False)
    vals = np.ones(len(keep_idx), dtype=np.float32)
    return sp.csr_matrix(
        (vals, (row_idx[keep_idx], col_idx[keep_idx])), shape=shape, dtype=np.float32
    )
