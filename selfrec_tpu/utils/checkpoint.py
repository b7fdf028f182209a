"""Checkpoint/resume — disk persistence the reference lacks.

The reference's ``save()`` only snapshots best embeddings in process memory
(/root/reference/base/graph_recommender.py:91-95) and its
``Recommender.save/load`` are stubs (base/recommender.py:64-68); nothing
survives the process. This module adds real checkpointing (flagged
beyond-reference in SURVEY.md §5): orbax-backed save/restore of the full
training state pytree (params, optimizer state, persistent aux, PRNG key,
epoch), sharding-aware — orbax records and restores NamedShardings, so a
multi-chip run resumes with the same layout.

Config surface (optional keys):
    checkpoint.dir:      directory for checkpoints (absent = disabled)
    checkpoint.interval: save every N epochs (default 5)
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any) -> str:
    """Write ``state`` (any pytree of arrays) to ``directory/step_<N>``."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    cp = _checkpointer()
    cp.save(path, state, force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str, template: Any, step: Optional[int] = None
) -> Tuple[Optional[int], Any]:
    """Restore the latest (or given) step. ``template`` provides structure,
    dtypes and shardings; returns (step, state) or (None, template)."""
    step = latest_step(directory) if step is None else step
    if step is None:
        return None, template
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    import orbax.checkpoint as ocp

    cp = _checkpointer()
    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(sharding=x.sharding)
        if isinstance(x, jax.Array)
        else ocp.RestoreArgs(),
        template,
    )
    state = cp.restore(path, item=template, restore_args=restore_args)
    return step, state


_METRIC_KEYS = ("Hit Ratio", "Precision", "Recall", "NDCG")


def _pack_best(model) -> dict:
    """Best-model tracking state (epoch + metrics + snapshot), fixed
    structure whether or not a best exists yet (epoch -1 = none)."""
    bp = getattr(model, "best_performance", [])
    vec = np.full(1 + len(_METRIC_KEYS), -1.0, dtype=np.float64)
    if bp:
        vec[0] = bp[0]
        for i, k in enumerate(_METRIC_KEYS):
            vec[1 + i] = bp[1].get(k, -1.0)
    best = {"perf": vec}
    if hasattr(model, "best_params"):  # sequential
        best["params"] = (
            model.best_params if model.best_params is not None else model.params
        )
    else:  # graph: embedding snapshots
        u, i = model._compute_emb_jit(model.params)
        best["user_emb"] = (
            model.best_user_emb if model.best_user_emb is not None else jax.device_get(u)
        )
        best["item_emb"] = (
            model.best_item_emb if model.best_item_emb is not None else jax.device_get(i)
        )
    return best


def _apply_best(model, best: dict) -> None:
    vec = np.asarray(best["perf"])
    if vec[0] >= 0:
        model.best_performance = [
            int(vec[0]),
            {k: float(vec[1 + i]) for i, k in enumerate(_METRIC_KEYS)},
        ]
        if "params" in best:
            model.best_params = best["params"]
        else:
            model.best_user_emb = best["user_emb"]
            model.best_item_emb = best["item_emb"]


def train_state(model) -> dict:
    """The resumable state of a JAX recommender (graph or sequential)."""
    state = {
        "params": model.params,
        "opt_state": model.opt_state,
        "key": model.key,
        "aux": getattr(model, "aux", {}),
        "best": _pack_best(model),
    }
    return state


def _replicate_unsharded(tree, mesh):
    """Re-place restored leaves that lack a mesh sharding as mesh-replicated.

    A fresh ``jit(optimizer.init)`` leaves scalar leaves (e.g. Adam's
    ``count``) UNcommitted on the default device, so later mesh-wide jits
    auto-promote them. Orbax restores the same leaves COMMITTED to the
    recorded SingleDeviceSharding, and a committed single-device scalar fed
    into a mesh-wide jit raises "incompatible devices" — the resume-under-
    mesh bug caught by tests/test_checkpoint.py::test_checkpoint_resume_
    under_mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    replicated = NamedSharding(mesh, PartitionSpec())

    def fix(x):
        if isinstance(x, jax.Array) and not isinstance(
            x.sharding, NamedSharding
        ):
            return jax.device_put(x, replicated)
        return x

    return jax.tree_util.tree_map(fix, tree)


def apply_train_state(model, state: dict) -> None:
    mesh = getattr(model, "mesh", None)
    if mesh is not None:
        state = _replicate_unsharded(state, mesh)
    model.params = state["params"]
    model.opt_state = state["opt_state"]
    model.key = state["key"]
    if "aux" in state and state["aux"]:
        model.aux = state["aux"]
    if "best" in state:
        _apply_best(model, state["best"])
