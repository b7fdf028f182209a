"""Multi-host initialization (SURVEY.md §2.4 comm-backend row).

The TPU-native distributed backend is ``jax.distributed`` + GSPMD
collectives over ICI/DCN — there is no NCCL/MPI layer to manage. This
module is the one call a multi-host launcher makes before building models;
everything else (mesh construction over all global devices, sharding,
collectives) is unchanged from single-host code.

Config surface: ``distributed: true`` (coordinator/process env comes from
the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
variables or the TPU metadata autodetection jax.distributed performs).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize(conf=None) -> bool:
    """Call jax.distributed.initialize() once if configured. Returns True
    when running multi-process.

    Coordinator topology comes from JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID when all three are set (generic
    launchers — jax.distributed.initialize() does NOT read the process
    count from env itself, found by the round-4 two-process smoke test,
    tests/test_distributed.py); otherwise bare initialize() runs JAX's
    cluster autodetection (TPU metadata, SLURM, ...)."""
    global _initialized
    wants = bool(conf and conf.get("distributed")) if conf is not None else False
    if not wants or _initialized:
        return jax.process_count() > 1
    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        kwargs = dict(coordinator_address=addr,
                      num_processes=int(nproc), process_id=int(pid))
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1


def process_info() -> str:
    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
