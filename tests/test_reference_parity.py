"""Numerical parity against the REFERENCE implementation itself.

The reference repo is importable here (torch CPU; numba stubbed), so these
tests check our losses/metrics/graph-normalization against the reference's
own functions on identical random inputs — the strongest parity evidence
short of full training runs. Skipped wholesale if /root/reference is absent.
"""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    sys.path.insert(0, REF)
    try:
        import torch  # noqa: F401
        from util import loss_torch, evaluation
        from data import graph as ref_graph
    finally:
        sys.path.remove(REF)
    return loss_torch, evaluation, ref_graph


@pytest.fixture()
def rand():
    rng = np.random.default_rng(123)

    def make(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    return make


def test_losses_match_reference(ref_modules, rand):
    import torch
    import jax.numpy as jnp

    from selfrec_tpu.ops import losses

    loss_torch, _, _ = ref_modules
    u, p, n = rand(64, 16), rand(64, 16), rand(64, 16)
    tu, tp, tn = map(torch.tensor, (u, p, n))
    ju, jp_, jn = map(jnp.asarray, (u, p, n))

    np.testing.assert_allclose(
        float(losses.bpr_loss(ju, jp_, jn)),
        float(loss_torch.bpr_loss(tu, tp, tn)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(losses.triplet_loss(ju, jp_, jn)),
        float(loss_torch.triplet_loss(tu, tp, tn)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(losses.l2_reg_loss(0.01, ju, jp_, jn)),
        float(loss_torch.l2_reg_loss(0.01, tu, tp, tn)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(losses.infonce(ju, jp_, 0.2)),
        float(loss_torch.InfoNCE(tu, tp, 0.2)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(losses.infonce(ju, jp_, 0.2, b_cos=False)),
        float(loss_torch.InfoNCE(tu, tp, 0.2, b_cos=False)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(losses.batch_softmax_loss(ju, jp_, 0.1)),
        float(loss_torch.batch_softmax_loss(tu, tp, 0.1)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(losses.kl_divergence(ju, jp_)),
        float(loss_torch.kl_divergence(tu, tp)),
        rtol=1e-4,
        atol=1e-6,
    )


def test_recbole_infonce_matches_reference(ref_modules, rand):
    import torch
    import jax.numpy as jnp

    from selfrec_tpu.ops import losses

    loss_torch, _, _ = ref_modules
    a, b = rand(32, 16), rand(32, 16)
    for sim in ("dot", "cos"):
        np.testing.assert_allclose(
            float(
                losses.info_nce_recbole(jnp.asarray(a), jnp.asarray(b), 0.5, 32, sim=sim)
            ),
            float(
                loss_torch.info_nce(torch.tensor(a), torch.tensor(b), 0.5, 32, sim=sim)
            ),
            rtol=1e-4,
        )


def test_metrics_match_reference(ref_modules):
    _, evaluation, _ = ref_modules
    from selfrec_tpu.utils import metrics

    rng = np.random.default_rng(7)
    origin, res = {}, {}
    for u in range(30):
        items = [f"i{k}" for k in rng.choice(100, size=5, replace=False)]
        origin[f"u{u}"] = {i: 1 for i in items}
        recs = [(f"i{k}", float(rng.random())) for k in rng.choice(100, 15, replace=False)]
        res[f"u{u}"] = recs
    ref_out = evaluation.ranking_evaluation(origin, res, [5, 10])
    our_out = metrics.ranking_evaluation(origin, res, [5, 10])
    assert ref_out == our_out


def test_normalize_graph_mat_matches_reference(ref_modules):
    import scipy.sparse as sp

    _, _, ref_graph = ref_modules
    from selfrec_tpu.data.graph import normalize_graph_mat

    rng = np.random.default_rng(9)
    # square symmetric
    n = 50
    m = sp.random(n, n, density=0.1, random_state=9, format="csr", dtype=np.float64)
    m = m + m.T
    ours = normalize_graph_mat(m)
    theirs = ref_graph.Graph.normalize_graph_mat(m)
    assert abs(ours - theirs).max() < 1e-9
    # rectangular
    r = sp.random(40, 60, density=0.1, random_state=10, format="csr", dtype=np.float64)
    ours = normalize_graph_mat(r)
    theirs = ref_graph.Graph.normalize_graph_mat(r)
    assert abs(ours - theirs).max() < 1e-9
