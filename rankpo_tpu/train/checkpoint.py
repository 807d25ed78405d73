"""Checkpoint persistence: HF-format model dirs + orbax optimizer state.

Layout mirrors the reference (contrastive_trainer.py:846-908, 912-1027):
``output_dir/checkpoint-{global_step}/`` containing config.json +
model.safetensors (from hf_io.save_pretrained), trainer_state.json,
training_args.json, and — when ``save_only_model=False`` — an ``opt_state/``
orbax tree so training is optimizer-resumable (the published reference recipe
is NOT, SURVEY.md §5). Rotation keeps at most ``save_total_limit`` checkpoints.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Optional

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def save_trainer_state(directory: str, state: dict, config) -> None:
    with open(os.path.join(directory, "trainer_state.json"), "w") as f:
        json.dump(state, f, indent=2)
    with open(os.path.join(directory, "training_args.json"), "w") as f:
        f.write(config.to_json_string())


def load_trainer_state(directory: str) -> dict:
    path = os.path.join(directory, "trainer_state.json")
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


_async_checkpointer = None


def _get_async_checkpointer():
    import orbax.checkpoint as ocp

    global _async_checkpointer
    if _async_checkpointer is None:
        _async_checkpointer = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler()
        )
    return _async_checkpointer


def save_opt_state(directory: str, opt_state, async_save: bool = False) -> None:
    """Persist optimizer state via orbax. ``async_save=True`` returns while the
    write proceeds in the background (preemption-friendly on TPU pods — the
    step loop keeps running); call :func:`wait_for_saves` before rotating or
    exiting."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, "opt_state"))
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)  # only the writer clears; others sync below
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # rmtree must complete before any process enters the orbax save
        multihost_utils.sync_global_devices("rankpo_opt_state_clear")
    if async_save:
        _get_async_checkpointer().save(path, jax.device_get(opt_state))
        return
    with ocp.PyTreeCheckpointer() as checkpointer:
        checkpointer.save(path, jax.device_get(opt_state))


def wait_for_saves() -> None:
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def load_opt_state(directory: str, template):
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, "opt_state"))
    if not os.path.isdir(path):
        return None
    # restore template from SHAPES only — device_get on the live template
    # raises for cross-process-sharded state (ZeRO-1 moments)
    host_template = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, getattr(x, "dtype", np.float32))
        if hasattr(x, "shape") else x,
        template,
    )
    with ocp.PyTreeCheckpointer() as checkpointer:
        restored = checkpointer.restore(path, item=host_template)
    return restored


def list_checkpoints(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    found = []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            found.append((int(m.group(1)), os.path.join(output_dir, name)))
    return [p for _, p in sorted(found)]

def latest_checkpoint(output_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(output_dir)
    return ckpts[-1] if ckpts else None


def rotate_checkpoints(output_dir: str, save_total_limit: Optional[int]) -> None:
    if not save_total_limit or save_total_limit <= 0:
        return
    ckpts = list_checkpoints(output_dir)
    for stale in ckpts[: max(0, len(ckpts) - save_total_limit)]:
        shutil.rmtree(stale, ignore_errors=True)
