"""Checkpoint/resume via orbax (SURVEY.md section 5.3-5.4).

The reference torch.saves {model, optimizer, step, best_metric} and keeps
best.pth + latest.pth (R: interfaces, SURVEY.md section 2.1 #18). Here the
same policy on orbax: the full train state (params, opt state, step, PRNG
key, data-iterator state, best metric) checkpoints atomically and
asynchronously; ``best`` and ``latest`` are separate orbax items, making
resume preemption-safe on TPU pods.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, keep: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )
        self._best_dir = os.path.join(self.ckpt_dir, "best")
        self._best_ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any, metrics: dict | None = None,
             is_best: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if is_best:
            self._best_ckptr.save(
                os.path.join(self._best_dir, "state"), state, force=True)

    def restore(self, state_template: Any, step: int | None = None) -> tuple[Any, int]:
        """Restore latest (or a specific step). Returns (state, step);
        (template, -1) if nothing saved yet."""
        self.wait()
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return state_template, -1
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        return state, step

    def restore_best(self, state_template: Any) -> Any:
        self.wait()
        path = os.path.join(self._best_dir, "state")
        if not os.path.exists(path):
            return None
        return self._best_ckptr.restore(path, target=state_template)

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        self._best_ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()


def average_checkpoints(mgr: "CheckpointManager", state_template: Any,
                        steps: list[int] | None = None,
                        last_n: int = 0) -> Any:
    """Parameter averaging over saved checkpoints (ESPnet-style model
    averaging: decode-time WER booster). Averages the ``params`` field of
    the train state over the given steps (or the last N available)."""
    mgr.wait()
    avail = sorted(mgr._mgr.all_steps())
    if steps is None:
        steps = avail[-last_n:] if last_n else avail
    assert steps, "no checkpoints to average"
    acc = None
    for s in steps:
        state = mgr._mgr.restore(s, args=ocp.args.StandardRestore(state_template))
        p = jax.tree_util.tree_map(lambda x: np.asarray(x, dtype=np.float64),
                                   state.params)
        acc = p if acc is None else jax.tree_util.tree_map(
            lambda a, b: a + b, acc, p)
    n = float(len(steps))
    return jax.tree_util.tree_map(lambda a: (a / n).astype(np.float32), acc)


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export (host-side interchange, e.g. for bench scripts)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {"/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
              for kp, v in flat}
    np.savez(path, **arrays)


def load_params_npz(path: str) -> Any:
    """Inverse of save_params_npz for dict pytrees: rebuild the nested
    dict from the "/"-joined flat keys (e.g. an LM checkpoint written by
    scripts/train_lm.py, consumed at beam decode for shallow fusion)."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.asarray(z[key])
    return out
