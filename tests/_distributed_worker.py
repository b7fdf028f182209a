"""Two-process jax.distributed smoke worker (driven by test_distributed.py).

Each process: CPU platform with 2 local virtual devices, gloo collectives,
``maybe_initialize`` from coordinator env vars, a (data=2, model=2) mesh over
the 4 GLOBAL devices, and ONE sharded BPR train step (row-sharded tables,
data-sharded batch — the same placements parallel/mesh.py gives models).
Prints the resulting loss so the parent can assert cross-process agreement
with a single-process numpy oracle.
"""

import os
import sys


def main():
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from selfrec_tpu.parallel.distributed import maybe_initialize, process_info

    multi = maybe_initialize({"distributed": True})
    assert multi, "expected multi-process"
    assert jax.process_count() == 2
    assert jax.device_count() == 4 and jax.local_device_count() == 2
    print("INIT", process_info(), flush=True)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from selfrec_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.build_mesh(n_data=2, n_model=2)

    U, I, D, B = 16, 24, 8, 8
    rng = np.random.default_rng(0)
    user_t = rng.normal(size=(U, D)).astype(np.float32)
    item_t = rng.normal(size=(I, D)).astype(np.float32)
    users = rng.integers(0, U, size=B).astype(np.int32)
    pos = rng.integers(0, I, size=B).astype(np.int32)
    neg = rng.integers(0, I, size=B).astype(np.int32)

    def make_global(host, sharding):
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx])

    tab_s = mesh_lib.table_sharding(mesh)
    batch_s = mesh_lib.batch_sharding(mesh)
    g_user = make_global(user_t, tab_s)
    g_item = make_global(item_t, tab_s)
    g_u = make_global(users, batch_s)
    g_p = make_global(pos, batch_s)
    g_n = make_global(neg, batch_s)

    def loss_fn(ut, it, u, p, n):
        ue, pe, ne = ut[u], it[p], it[n]
        diff = jnp.sum(ue * (pe - ne), axis=-1)
        return -jnp.mean(jnp.log(jax.nn.sigmoid(diff) + 1e-8))

    @jax.jit
    def step(ut, it, u, p, n):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            ut, it, u, p, n)
        gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in grads))
        ut2 = ut - 0.1 * grads[0]
        return loss, gnorm, ut2

    out_shard = (NamedSharding(mesh, P()), NamedSharding(mesh, P()), tab_s)
    step = jax.jit(step.__wrapped__, out_shardings=out_shard)
    loss, gnorm, ut2 = step(g_user, g_item, g_u, g_p, g_n)
    # replicated scalars are addressable on every process
    print(f"LOSS {float(loss):.6f} GNORM {float(gnorm):.6f}", flush=True)

    # second step on the UPDATED sharded table: state stays on-device/sharded
    loss2, _, _ = step(ut2, g_item, g_u, g_p, g_n)
    print(f"LOSS2 {float(loss2):.6f}", flush=True)


if __name__ == "__main__":
    main()
