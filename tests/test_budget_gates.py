"""HBM-budget gate regressions (advisor round-3 findings).

1. Generic DenseMat blocks allocate in ``_generic_dtype()`` (bf16 even under
   ``SELFREC_TPU_DENSE_DTYPE=int8``), so the budget gate must use the bf16
   itemsize — the int8 itemsize underestimated HBM by 2x near the edge.
2. MHCN keeps FIVE dense blocks resident (3 UxU motif channels + R + R^T)
   and SEPT keeps two UxU views; per-matrix checks admitted several times
   the configured ``SELFREC_TPU_DENSE_BUDGET_GB`` in aggregate.
3. ``ranking_evaluation_ids`` with empty precomputed ground-truth keys must
   report all-miss, not IndexError via the ``len-1 == -1`` clamp.
"""

import numpy as np
import pytest

from tests.test_social import tiny_social_dataset  # noqa: F401 (fixture)


def test_generic_gate_uses_bf16_itemsize_under_int8(monkeypatch):
    from selfrec_tpu.ops import graph as g_ops
    from selfrec_tpu.ops import spmm_dense as d_ops

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "int8")
    # 100x100: int8 block = 10 kB, bf16 generic block = 20 kB
    monkeypatch.setenv("SELFREC_TPU_DENSE_BUDGET_GB", str(15000 / 1e9))
    # factored int8 incidence fits its own budget...
    assert d_ops.fits_dense(100, 100)
    # ...but the GENERIC gate must budget with bf16 (2 bytes) and refuse
    assert not g_ops.dense_general_available(100, 100)
    # with room for bf16 it admits again
    monkeypatch.setenv("SELFREC_TPU_DENSE_BUDGET_GB", str(25000 / 1e9))
    assert g_ops.dense_general_available(100, 100)


def _social_model(name, dataset, budget_gb, monkeypatch, extra):
    from tests.test_social import run_social_model

    monkeypatch.setenv("SELFREC_TPU_DENSE", "1")
    monkeypatch.delenv("SELFREC_TPU_DENSE_DTYPE", raising=False)
    monkeypatch.setenv("SELFREC_TPU_DENSE_BUDGET_GB", str(budget_gb))
    return run_social_model(name, dataset, extra=extra, max_epoch=1)[0]


def test_mhcn_aggregate_budget_falls_back(monkeypatch, tiny_social_dataset):
    """One 40x40 bf16 block (3.2 kB) fits a 4 kB budget, but MHCN's
    aggregate (3*40*40 + 2*40*60 = 9600 elems = 19.2 kB bf16) must not —
    all five adjacencies fall back to the sparse layout together."""
    from selfrec_tpu.ops.spmm_dense import DenseMat

    model = _social_model("MHCN", tiny_social_dataset, 4000 / 1e9,
                          monkeypatch, {"n_layer": 2, "ss_rate": 0.01})
    assert not any(isinstance(h, DenseMat) for h in model.H)
    assert not isinstance(model.R, DenseMat)

    model = _social_model("MHCN", tiny_social_dataset, 25000 / 1e9,
                          monkeypatch, {"n_layer": 2, "ss_rate": 0.01})
    assert all(isinstance(h, DenseMat) for h in model.H)


def test_sept_aggregate_budget_falls_back(monkeypatch, tiny_social_dataset):
    """SEPT keeps two 40x40 views resident (6.4 kB bf16 aggregate): a 4 kB
    budget admits one but must refuse the pair."""
    from selfrec_tpu.ops.spmm_dense import DenseMat

    extra = {"n_layer": 1, "ss_rate": 0.005, "drop_rate": 0.3, "ins_cnt": 2}
    model = _social_model("SEPT", tiny_social_dataset, 4000 / 1e9,
                          monkeypatch, extra)
    assert getattr(model, "_social_d1", None) is None or not isinstance(
        model._social_d1, DenseMat)

    model = _social_model("SEPT", tiny_social_dataset, 8000 / 1e9,
                          monkeypatch, extra)
    assert isinstance(model._social_d1, DenseMat)
    assert isinstance(model._social_d2, DenseMat)


def test_ranking_evaluation_ids_empty_sorted_keys_all_miss():
    from selfrec_tpu.utils import metrics

    top_ids = np.array([[0, 1], [2, 3]], dtype=np.int64)
    # consistent offsets/items but an (inconsistent) empty precomputed key
    # array: the guard must yield all-miss (Hit Ratio 0), not IndexError
    measure = metrics.ranking_evaluation_ids(
        np.array([0, 1, 2]), np.array([5, 6]), top_ids, [2], 10,
        sorted_test_keys=np.array([], dtype=np.int64))
    assert any("Hit Ratio:0.0" in m for m in measure)
