"""Checkpoint save/restore via orbax.

Replaces the reference's per-epoch full-model .h5 dumps
(keras ModelCheckpoint, bin/train.py:128-142) with orbax PyTree checkpoints
that also carry optimizer state and step — the reference's --snapshot resume
loses both (SURVEY.md section 5, checkpoint/resume row).
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp

from pyrapose_tpu.train.step import TrainState


def save_checkpoint(state: TrainState, directory: str, step: int | None = None) -> str:
    """Save params/batch_stats/opt_state/step under directory/step_N."""
    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    checkpointer = ocp.PyTreeCheckpointer()
    payload = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    checkpointer.save(path, payload, force=True)
    return path


def latest_checkpoint(directory: str) -> str | None:
    """Newest COMPLETE checkpoint in `directory`, or None.

    Skips orbax's in-progress `*.orbax-checkpoint-tmp*` directories: a
    process killed mid-save (the exact preemption case --auto-resume exists
    for) leaves one behind, and resuming from it would fail or hang."""
    if not os.path.isdir(directory):
        return None
    steps = [
        d
        for d in os.listdir(directory)
        if d.startswith("step_")
        and "tmp" not in d
        and os.path.isdir(os.path.join(directory, d))
    ]
    if not steps:
        return None
    return os.path.join(directory, sorted(steps)[-1])


def prune_checkpoints(directory: str, keep: int) -> list[str]:
    """Delete all but the newest `keep` complete checkpoints. Returns the
    removed paths. keep <= 0 keeps everything.

    Long runs save per-epoch (~0.5 GB each for resnet50 + Adam state);
    without rotation a multi-hundred-epoch run fills the disk. In-progress
    orbax tmp directories are never touched (they belong to a concurrent
    save or a crashed one --auto-resume will skip anyway)."""
    if keep <= 0 or not os.path.isdir(directory):
        return []
    steps = sorted(
        d
        for d in os.listdir(directory)
        if d.startswith("step_")
        and "tmp" not in d
        and os.path.isdir(os.path.join(directory, d))
    )
    removed = []
    for d in steps[:-keep] if keep < len(steps) else []:
        path = os.path.join(directory, d)
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


def restore_checkpoint(state: TrainState, path: str) -> TrainState:
    """Restore into an existing TrainState (shapes/dtypes from `state`)."""
    checkpointer = ocp.PyTreeCheckpointer()
    target = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    restored = checkpointer.restore(os.path.abspath(path), item=target)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def restore_params(path: str) -> Any:
    """Load only the parameter tree (inference/eval entry).

    Accepts either one step directory (`.../step_00001250`) or a snapshot
    directory full of them — the latter resolves to the newest COMPLETE
    step, so `pyrapose evaluate <ds> <data> runs/ckpt` works without the
    caller copying step numbers around.
    """
    resolved = latest_checkpoint(path)
    if resolved is not None:
        path = resolved
    checkpointer = ocp.PyTreeCheckpointer()
    restored = checkpointer.restore(os.path.abspath(path))
    return restored["params"], restored.get("batch_stats", {})


def restore_variables(
    path: str, config=None, image_shape: tuple[int, int] = (480, 640)
) -> Any:
    """Load (params, batch_stats) from an orbax checkpoint directory OR a
    keras .h5 training checkpoint.

    The .h5 path is the reference's inline `evaluate --convert-model`
    ergonomics (bin/evaluate.py:214-215): a keras training checkpoint is
    importable directly without a separate `pyrapose convert` round trip.
    Requires `config` (ModelConfig) to build the parameter template.
    """
    if path.endswith((".h5", ".hdf5")):
        if config is None:
            raise ValueError("importing a keras .h5 needs a ModelConfig")
        import jax.numpy as jnp

        from pyrapose_tpu.models import PyraPose
        from pyrapose_tpu.models.h5_import import import_pyrapose_h5

        model = PyraPose(config=config)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, image_shape[0], image_shape[1], 3), jnp.float32),
        )
        variables = import_pyrapose_h5(path, dict(variables))
        return variables["params"], variables.get("batch_stats", {})
    return restore_params(path)
