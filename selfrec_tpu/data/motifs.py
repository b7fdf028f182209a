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


# -- device (MXU) motif algebra ---------------------------------------------
#
# The scipy route above is O(minutes) at douban scale: Y·Yᵀ and the ten
# S-products densify, and scipy runs them single-threaded on the host
# (quarter-douban: 75.7s of MHCN build time; full douban: ~25 min). The
# same algebra is a handful of (U, U) / (U, I) dense matmuls — seconds on
# the MXU. Products run at jax.lax.Precision.HIGHEST so integer motif
# counts (entries are trust/rating values, typically 0/1) stay exact in
# f32; everything below mirrors the host functions term for term
# (reference MHCN.py:27-55, SEPT.py:33-40).


def _dense_from_scipy(mat, dtype=None):
    """Device scatter build (only edge arrays cross the host->device
    tunnel — same transfer discipline as ops/spmm_dense)."""
    import jax.numpy as jnp

    coo = mat.tocoo()
    return jnp.zeros(mat.shape, dtype or jnp.float32).at[
        jnp.asarray(coo.row.astype(np.int32)),
        jnp.asarray(coo.col.astype(np.int32)),
    ].add(jnp.asarray(coo.data.astype(np.float32)))


def _mm(a, b):
    import jax

    return jax.numpy.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _row_normalize_dense(h):
    import jax.numpy as jnp

    rs = jnp.sum(h, axis=1, keepdims=True)
    return h * jnp.where(rs > 0, 1.0 / jnp.maximum(rs, 1e-32), 0.0)


def mhcn_hypergraphs_device(social_mat, interaction_mat):
    """[H_s, H_j, H_p] as DEVICE dense (U, U) f32 arrays — exact same math
    as :func:`mhcn_hypergraphs`, one jitted MXU program (validated
    element-exact vs the scipy route in tests/test_social.py)."""
    import jax
    import jax.numpy as jnp

    S_d = _dense_from_scipy(social_mat)
    Y_d = _dense_from_scipy(interaction_mat)

    @jax.jit
    def f(S, Y):
        B = S * S.T
        U = S - B
        Ut, Bt = U.T, B.T
        C1 = _mm(U, U) * Ut
        Hs = C1 + C1.T
        C2 = _mm(B, U) * Ut + _mm(U, B) * Ut + _mm(U, U) * B
        Hs = Hs + C2 + C2.T
        C3 = _mm(B, B) * U + _mm(B, U) * B + _mm(U, B) * B
        Hs = Hs + C3 + C3.T
        Hs = Hs + _mm(B, B) * B  # A4
        C5 = _mm(U, U) * U + _mm(U, Ut) * U + _mm(Ut, U) * U
        Hs = Hs + C5 + C5.T
        Hs = Hs + _mm(U, B) * U + _mm(B, Ut) * Ut + _mm(Ut, U) * B  # A6
        Hs = Hs + _mm(Ut, B) * Ut + _mm(B, U) * U + _mm(U, Ut) * B  # A7
        YYt = _mm(Y, Y.T)
        A8 = YYt * B
        A9 = YYt * U
        A9 = A9 + A9.T
        A10 = YYt - A8 - A9
        Hj = A8 + A9
        Hp = A10 * (A10 > 3)
        return (_row_normalize_dense(Hs), _row_normalize_dense(Hj),
                _row_normalize_dense(Hp))

    return list(f(S_d, Y_d))


def sept_views_device(bi_social_mat, interaction_mat, n_users: int):
    """(social_view, sharing_view) as DEVICE dense (U, U) f32 arrays —
    same math as :func:`sept_views` incl. the symmetric D^-1/2 A D^-1/2
    normalization (reference SEPT.py:33-40 + data/graph.py:9-24)."""
    import jax
    import jax.numpy as jnp

    S_d = _dense_from_scipy(bi_social_mat)
    Y_d = _dense_from_scipy(interaction_mat)

    @jax.jit
    def f(S, Y):
        eye = jnp.eye(S.shape[0], dtype=S.dtype)
        social = _mm(S, S) * S + eye
        sharing = _mm(Y, Y.T) * S + eye

        def sym_norm(a):
            rs = jnp.sum(a, axis=1)
            d = jnp.where(rs > 0, jax.lax.rsqrt(jnp.maximum(rs, 1e-32)), 0.0)
            return a * d[:, None] * d[None, :]

        return sym_norm(social), sym_norm(sharing)

    return f(S_d, Y_d)
