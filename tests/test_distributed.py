"""Real multi-process exercise of parallel/distributed.py (VERDICT r3 #7).

Launches TWO OS processes over a localhost coordinator (gloo CPU
collectives — the DCN stand-in available on this box), runs
``maybe_initialize`` from the documented env vars, builds the (data, model)
mesh over the 4 GLOBAL devices and executes a sharded BPR step whose
replicated loss must equal a single-process numpy oracle on BOTH ranks.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _oracle():
    """Single-process numpy replica of the worker's first step."""
    U, I, D, B = 16, 24, 8, 8
    rng = np.random.default_rng(0)
    user_t = rng.normal(size=(U, D)).astype(np.float32)
    item_t = rng.normal(size=(I, D)).astype(np.float32)
    users = rng.integers(0, U, size=B).astype(np.int32)
    pos = rng.integers(0, I, size=B).astype(np.int32)
    neg = rng.integers(0, I, size=B).astype(np.int32)
    diff = np.sum(user_t[users] * (item_t[pos] - item_t[neg]), axis=-1)
    return float(-np.mean(np.log(1.0 / (1.0 + np.exp(-diff)) + 1e-8)))


def test_two_process_sharded_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("XLA_FLAGS", None)  # worker sets its own 2-device count
        procs.append(
            subprocess.Popen([sys.executable, worker], env=env,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-2000:]}"

    expected = _oracle()
    losses = []
    for out in outs:
        assert "INIT process" in out
        line = [ln for ln in out.splitlines() if ln.startswith("LOSS ")][0]
        losses.append(float(line.split()[1]))
        assert any(ln.startswith("LOSS2 ") for ln in out.splitlines())
    # both ranks see the SAME replicated loss, equal to the oracle
    assert abs(losses[0] - losses[1]) < 1e-6
    assert abs(losses[0] - expected) < 1e-4, (losses, expected)
