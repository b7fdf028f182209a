"""Correctness of the Pallas VMEM-resident SpMM vs scipy and the XLA ELL
path (interpret mode on CPU; the perf A/B runs on hardware via
scripts/bench_bandwidth.py)."""

import numpy as np
import pytest
import scipy.sparse as sp

from selfrec_tpu.ops import spmm_ell
from selfrec_tpu.ops.spmm_pallas import PallasEll, fits_vmem, table_vmem_bytes


def random_graph(n_rows, n_cols, nnz, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_cols, nnz).astype(np.int32)
    dst = rng.integers(0, n_rows, nnz).astype(np.int32)
    w = rng.normal(size=nnz).astype(np.float32)
    return src, dst, w


@pytest.mark.parametrize("k", [4, 16])
def test_pallas_matches_scipy_and_xla(k):
    n_rows, n_cols, nnz, d = 90, 70, 600, 64
    src, dst, w = random_graph(n_rows, n_cols, nnz)
    x = np.random.default_rng(1).normal(size=(n_cols, d)).astype(np.float32)

    layout, _ = spmm_ell.build_ell_layout(src, dst, n_rows, k=k)
    w_ell = spmm_ell.ell_weights(layout, w)

    want = sp.coo_matrix((w, (dst, src)), shape=(n_rows, n_cols)).tocsr() @ x
    got_xla = np.asarray(spmm_ell._ell_apply(layout, w_ell, x))
    pe = PallasEll(layout, w_ell, tile_v=32)
    got_pl = np.asarray(pe.apply(x, interpret=True))

    np.testing.assert_allclose(got_xla, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_pl, want, rtol=2e-5, atol=2e-5)


def test_vmem_budget_math():
    # yelp2018 scale, D=64: f32 fits (17.9MB with lane padding), and a
    # hypothetical 3M-row table does not.
    assert table_vmem_bytes(69_716, 64, np.float32) == 69_716 * 128 * 4
    assert fits_vmem(69_716, 64, np.float32)
    assert fits_vmem(69_716, 192, np.float32)  # fused 3-pass, 71.4MB
    assert not fits_vmem(3_000_000, 64, np.float32)
