"""Interruptible fine-tune runs: save/restore (step, params, opt_state).

The reference has no training loop, so its whole checkpoint story is
model-weight *loading* (/root/reference/src/circuit_analyzer.py:226-234);
this framework has a real sharded fine-tune step (train/train_step.py),
and a production fine-tune must survive preemption — TPU pods are
routinely preempted mid-run. This module adds the missing half of the
SURVEY §5 checkpoint/resume subsystem:

  - `save_train_state` writes step N atomically (orbax payload dir +
    a sibling .DONE commit marker; an interrupted write is never picked
    up by `latest_checkpoint`);
  - `restore_train_state` is template-driven: it restores onto freshly
    initialized (params, opt_state) pytrees, preserving each template
    leaf's dtype AND sharding (resume under a mesh places leaves back on
    their FSDP shards without a host round-trip of the whole tree);
  - resume is bit-exact: continuing from a checkpoint reproduces the
    uninterrupted run (pinned by tests/test_train_checkpoint.py).

The optimizer state is flattened to leaves before saving — optax states
are nested namedtuples that orbax would round-trip as plain dicts; the
caller reconstructs structure from `tx.init(params)` at restore time,
which is also what guarantees the optimizer tree matches the code
version doing the resuming.
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np

_STEP_FMT = "step_{:08d}"
_STEP_RE = re.compile(r"^step_(\d{8})$")


def _step_dir(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), _STEP_FMT.format(step))


def _marker(path: str) -> str:
    return path + ".DONE"


def _payload(params: Any, opt_state: Any, extra: Any = None) -> dict:
    opt_leaves = jax.tree_util.tree_leaves(opt_state)
    payload = {"params": params, "opt_leaves": list(opt_leaves)}
    if extra is not None:
        # auxiliary train-loop state (e.g. the EMA shadow from
        # train_step.init_ema) saved/restored alongside, leaf-flattened
        # for the same structure-agnostic round-trip as opt_state
        payload["extra_leaves"] = list(jax.tree_util.tree_leaves(extra))
    return payload


def save_train_state(
    ckpt_dir: str, step: int, params: Any, opt_state: Any, extra: Any = None
) -> str:
    """Write checkpoint for `step` under ckpt_dir; returns the path.

    Atomic at the granularity `latest_checkpoint` observes: the commit
    marker is written only after orbax finishes the payload."""
    import orbax.checkpoint as ocp

    path = _step_dir(ckpt_dir, step)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(_marker(path)):
        os.remove(_marker(path))
    ocp.PyTreeCheckpointer().save(
        path, _payload(params, opt_state, extra), force=True
    )
    with open(_marker(path), "w") as f:
        f.write(str(step))
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, str]]:
    """(step, path) of the newest COMMITTED checkpoint, or None."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        path = os.path.join(ckpt_dir, name)
        if m and os.path.isdir(path) and os.path.exists(_marker(path)):
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, path)
    return best


def restore_train_state(
    path: str, params: Any, opt_state: Any, extra: Any = None
):
    """Restore (params, opt_state[, extra]) from a checkpoint path onto
    templates.

    `params`/`opt_state` are freshly initialized trees (model init +
    tx.init) providing structure, dtypes, and placement; every restored
    leaf is cast to the template leaf's dtype and device_put to its
    sharding, so resuming under a mesh re-shards in one step.

    `extra`: optional template for auxiliary state saved with the same
    keyword (e.g. the EMA shadow). When given, the return value is the
    3-tuple (params, opt_state, extra); a checkpoint written without
    extra state (or vice versa) fails with a structure error — save and
    restore must agree on whether the loop carries it."""
    import orbax.checkpoint as ocp

    template = _payload(params, opt_state, extra)
    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(dtype=np.asarray(x).dtype), template
    )
    try:
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(path), restore_args=restore_args
        )
    except ValueError as e:
        raise ValueError(
            "checkpoint tree does not match the templates — optimizer/"
            "model config changed since save, or the checkpoint and the "
            f"restore call disagree on extra (EMA) state: {e}"
        ) from e

    def place(r, t):
        arr = np.asarray(r)
        if arr.shape != np.shape(t):
            raise ValueError(
                f"checkpoint leaf shape {arr.shape} != template {np.shape(t)}"
            )
        if isinstance(t, jax.Array):
            return jax.device_put(arr.astype(t.dtype), t.sharding)
        return arr.astype(np.asarray(t).dtype)

    new_params = jax.tree_util.tree_map(place, restored["params"], params)
    opt_leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    if len(restored["opt_leaves"]) != len(opt_leaves):
        raise ValueError(
            f"optimizer state has {len(opt_leaves)} leaves; checkpoint has "
            f"{len(restored['opt_leaves'])} — optimizer config changed since save"
        )
    new_opt_leaves = [
        place(r, t) for r, t in zip(restored["opt_leaves"], opt_leaves)
    ]
    new_opt = jax.tree_util.tree_unflatten(treedef, new_opt_leaves)
    if extra is None:
        return new_params, new_opt
    extra_leaves, extra_def = jax.tree_util.tree_flatten(extra)
    saved = restored.get("extra_leaves")
    if saved is None or len(saved) != len(extra_leaves):
        raise ValueError(
            f"extra-state template has {len(extra_leaves)} leaves; "
            f"checkpoint has {0 if saved is None else len(saved)}"
        )
    new_extra = jax.tree_util.tree_unflatten(
        extra_def, [place(r, t) for r, t in zip(saved, extra_leaves)]
    )
    return new_params, new_opt, new_extra


def prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    """Keep the newest `keep` committed checkpoints; delete the rest
    (markers first, so a crash mid-prune never orphans a committed dir
    into an uncommitted-looking one that `latest_checkpoint` skips —
    it would just be garbage on disk, re-pruned next call)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir) or keep < 1:
        return
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        path = os.path.join(ckpt_dir, name)
        if m and os.path.isdir(path) and os.path.exists(_marker(path)):
            steps.append((int(m.group(1)), path))
    for _step, path in sorted(steps)[:-keep]:
        os.remove(_marker(path))
        shutil.rmtree(path, ignore_errors=True)
