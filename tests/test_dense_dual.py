"""Dual-direction dense kernel (ops/dense_dual.py) — interpret-mode
correctness on CPU; the TPU perf A/B lives in scripts/probe_dual_kernel.py
(DUAL_KERNEL.json).

The kernel fuses the two per-layer block matmuls (out_u = B @ xi,
out_i = B.T @ xu — reference torch.sparse.mm pair, LightGCN.py:72) into
one streaming read of B. Production use is the int8x8 quantized mode
(s32-exact accumulation), so the int8 test asserts EXACT equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfrec_tpu.ops import dense_dual


@pytest.mark.parametrize(
    "u,i,d", [(70, 90, 16), (700, 1300, 64), (2500, 2100, 32)]
)
def test_dual_forward_f32(u, i, d):
    """Non-divisible shapes (tile 2048 > all of these) vs numpy."""
    rng = np.random.default_rng(0)
    b = rng.integers(0, 2, (u, i)).astype(np.int8)
    xu = rng.normal(size=(u, d)).astype(np.float32)
    xi = rng.normal(size=(i, d)).astype(np.float32)
    ou, oi = dense_dual._dual_call(
        jnp.asarray(b), jnp.asarray(xu), jnp.asarray(xi), interpret=True)
    np.testing.assert_allclose(
        np.asarray(ou), b.astype(np.float32) @ xi, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(oi), b.astype(np.float32).T @ xu, rtol=1e-5, atol=1e-3)


def test_dual_forward_int8_exact():
    """s8 x s8 -> s32 accumulation is exact (production int8x8 mode)."""
    rng = np.random.default_rng(1)
    u, i, d = 300, 450, 64
    b = rng.integers(0, 2, (u, i)).astype(np.int8)
    xu = rng.integers(-127, 128, (u, d)).astype(np.int8)
    xi = rng.integers(-127, 128, (i, d)).astype(np.int8)
    ou, oi = dense_dual._dual_call(
        jnp.asarray(b), jnp.asarray(xu), jnp.asarray(xi), interpret=True)
    assert np.array_equal(
        np.asarray(ou), b.astype(np.int64) @ xi.astype(np.int64))
    assert np.array_equal(
        np.asarray(oi), b.astype(np.int64).T @ xu.astype(np.int64))


def test_dual_vjp():
    rng = np.random.default_rng(2)
    u, i, d = 200, 350, 32
    b = rng.integers(0, 2, (u, i)).astype(np.int8)
    xu = jnp.asarray(rng.normal(size=(u, d)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(i, d)).astype(np.float32))
    wu = jnp.asarray(rng.normal(size=(u, d)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(i, d)).astype(np.float32))

    def f_dual(xu, xi):
        ou, oi = dense_dual.dual_matmul(jnp.asarray(b), xu, xi, True)
        return jnp.sum(ou * wu) + jnp.sum(oi * wi)

    def f_ref(xu, xi):
        bf = jnp.asarray(b, jnp.float32)
        return jnp.sum((bf @ xi) * wu) + jnp.sum((bf.T @ xu) * wi)

    g_dual = jax.grad(f_dual, argnums=(0, 1))(xu, xi)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(xu, xi)
    for gd, gr in zip(g_dual, g_ref):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gr),
                                   rtol=1e-5, atol=1e-3)


def test_int8_spmm_uses_dual_when_forced(monkeypatch):
    """The integrated int8x8 propagation path routes through the dual
    kernel when forced (SELFREC_TPU_DUAL=1 + interpret escape hatch) and
    matches the XLA two-dot formulation exactly."""
    from selfrec_tpu.ops import spmm_dense

    rng = np.random.default_rng(3)
    nu, ni, d = 120, 160, 32
    eu = np.repeat(np.arange(nu, dtype=np.int32), 3)
    ei = rng.integers(0, ni, len(eu)).astype(np.int32)
    eu, ei = np.unique(np.stack([eu, ei]), axis=1)
    deg_u = np.bincount(eu, minlength=nu).astype(np.float64)
    deg_i = np.bincount(ei, minlength=ni).astype(np.float64)
    w = 1.0 / np.sqrt(np.maximum(deg_u[eu] * deg_i[ei], 1.0))
    monkeypatch.setenv("SELFREC_TPU_DENSE_DTYPE", "int8")
    adj = spmm_dense.dense_adj_from_edges(eu, ei, w.astype(np.float32),
                                          nu, ni)
    assert adj.factored and adj.mm_dtype == jnp.int8
    x = jnp.asarray(rng.normal(size=(nu + ni, d)).astype(np.float32))

    monkeypatch.setenv("SELFREC_TPU_DUAL", "0")
    ref = spmm_dense.dense_spmm(adj, x)
    monkeypatch.setenv("SELFREC_TPU_DUAL", "1")
    monkeypatch.setenv("SELFREC_TPU_DUAL_INTERPRET", "1")
    out = spmm_dense.dense_spmm(adj, x)
    # both modes quantize identically; the s32 accumulations are exact, so
    # the results agree to f32 rounding of identical sums
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dual_supported_gate():
    assert dense_dual.dual_supported(64, jnp.int8)
    assert dense_dual.dual_supported(128, jnp.int8)
    # 192 won standalone but regressed end-to-end in the epoch scan
    assert not dense_dual.dual_supported(192, jnp.int8)
    assert not dense_dual.dual_supported(64, jnp.bfloat16)  # XLA at floor
