"""Host-side social motif / view matrix precompute (one-time setup).

Implements MHCN's 10 motif adjacency matrices (reference
/root/reference/model/graph/MHCN.py:27-55) and SEPT's social/sharing views
(SEPT.py:33-40) with scipy sparse algebra. These run once before training —
steady-state propagation over the results happens on device via
ops/graph.spmm.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from selfrec_tpu.data.graph import normalize_graph_mat


def _row_normalize(h: sp.spmatrix) -> sp.csr_matrix:
    """H ⊙ (1 / rowsum) — reference MHCN.py:49-54 (rows with no entries
    contribute no nnz, so the 1/0 never materializes)."""
    rs = np.asarray(h.sum(axis=1)).reshape(-1, 1)
    with np.errstate(divide="ignore"):
        inv = np.where(rs > 0, 1.0 / np.maximum(rs, 1e-32), 0.0)
    return h.multiply(inv).tocsr()


def mhcn_hypergraphs(social_mat: sp.spmatrix, interaction_mat: sp.spmatrix):
    """[H_s, H_j, H_p] row-normalized motif hypergraphs (MHCN.py:27-55)."""
    S = social_mat.tocsr()
    Y = interaction_mat.tocsr()
    B = S.multiply(S.T)
    U = (S - B).tocsr()
    C1 = (U.dot(U)).multiply(U.T)
    A1 = C1 + C1.T
    C2 = (B.dot(U)).multiply(U.T) + (U.dot(B)).multiply(U.T) + (U.dot(U)).multiply(B)
    A2 = C2 + C2.T
    C3 = (B.dot(B)).multiply(U) + (B.dot(U)).multiply(B) + (U.dot(B)).multiply(B)
    A3 = C3 + C3.T
    A4 = (B.dot(B)).multiply(B)
    C5 = (U.dot(U)).multiply(U) + (U.dot(U.T)).multiply(U) + (U.T.dot(U)).multiply(U)
    A5 = C5 + C5.T
    A6 = (U.dot(B)).multiply(U) + (B.dot(U.T)).multiply(U.T) + (U.T.dot(U)).multiply(B)
    A7 = (U.T.dot(B)).multiply(U.T) + (B.dot(U)).multiply(U) + (U.dot(U.T)).multiply(B)
    A8 = (Y.dot(Y.T)).multiply(B)
    A9 = (Y.dot(Y.T)).multiply(U)
    A9 = A9 + A9.T
    A10 = Y.dot(Y.T) - A8 - A9
    H_s = _row_normalize(sum([A1, A2, A3, A4, A5, A6, A7]))
    H_j = _row_normalize(sum([A8, A9]))
    H_p = A10.multiply(A10 > 3)
    H_p = _row_normalize(H_p)
    return [H_s, H_j, H_p]


def sept_views(bi_social_mat: sp.spmatrix, interaction_mat: sp.spmatrix, n_users: int):
    """(social_view, sharing_view) — (S·S)⊙S + I and (Y·Yᵀ)⊙S + I, each
    D^-1/2 A D^-1/2 normalized (reference SEPT.py:33-40)."""
    S = bi_social_mat.tocsr()
    Y = interaction_mat.tocsr()
    social = (S.dot(S)).multiply(S) + sp.eye(n_users, dtype=np.float32)
    sharing = (Y.dot(Y.T)).multiply(S) + sp.eye(n_users, dtype=np.float32)
    return normalize_graph_mat(social), normalize_graph_mat(sharing)
