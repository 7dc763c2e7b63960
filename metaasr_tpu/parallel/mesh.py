"""Device mesh + shardings — the framework's entire distribution story.

The reference has no distributed backend (single GPU, sequential task loop;
SURVEY.md section 2.3, 5.8). The rebuild's pod-scale design
(BASELINE.json:11) is:

    Mesh axes ('task', 'data'):
      task — accent meta-tasks; the vmapped task axis of the meta batch is
             sharded here. Each task's inner loop runs independently; the
             ONLY cross-task communication is the outer-gradient mean
             (one psum per meta-step), which rides ICI.
      data — within-task batch (support/query utterances). Replicated
             params + batch-sharded activations = classic DP; XLA inserts
             the activation-gradient psums.

    Params and optimizer state are replicated (10-30M params; FSDP/ZeRO
    deliberately out of scope, SURVEY.md section 2.3). TP sharding rules
    are not needed at d_model~256 but the helpers accept any
    PartitionSpec so they generalize.

No explicit collectives appear anywhere in the framework: pjit +
NamedSharding derive them (scaling-book recipe: pick mesh, annotate, let
XLA insert collectives).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_task: int | None = None, devices=None) -> Mesh:
    """('task', 'data') mesh over the available devices.

    ``num_task`` defaults to the full device count (data axis 1): for
    MAML at k-shot batch sizes, task parallelism is the dominant axis
    (BASELINE.json:11 'accent tasks sharded over mesh').
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_task is None:
        num_task = n
    if n % num_task != 0:
        raise ValueError(f"{n} devices not divisible by task axis {num_task}")
    arr = np.array(devices).reshape(num_task, n // num_task)
    return Mesh(arr, ("task", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def meta_batch_shardings(mesh: Mesh, second_order: bool = False):
    """Sharding pytree-prefix for a meta batch: leading [M, k, ...] axes
    map to ('task', 'data').

    ``second_order=True`` (full MAML, grad-of-grad) shards over 'task'
    ONLY: sharding the within-task k axis over 'data' crashes XLA's GSPMD
    partitioner on the double-backward of the strided subsampling conv
    (``convolution_handler.cc:832 Check failed: ShapeUtil::Compatible``,
    reproduced r5 on jax 0.9 CPU with and without remat and with the
    shardy partitioner; task-only sharding compiles and runs). Cost: with
    a data axis >1 the inner compute is replicated across it — but
    ``make_mesh`` defaults the data axis to 1, and task parallelism is
    MAML's dominant axis anyway (BASELINE.json:11)."""

    def leaf_sharding(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and not second_order:
            return NamedSharding(mesh, P("task", "data"))
        return NamedSharding(mesh, P("task"))

    return leaf_sharding


def shard_meta_batch(mesh: Mesh, meta_batch: dict,
                     second_order: bool = False) -> dict:
    """Place {support, query} arrays on the mesh with task/data sharding."""
    fn = meta_batch_shardings(mesh, second_order)
    out = {}
    for side in ("support", "query"):
        out[side] = {k: jax.device_put(v, fn(v))
                     for k, v in meta_batch[side].items() if k != "texts"}
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Plain (non-meta) batches: batch dim over both axes flattened."""
    return NamedSharding(mesh, P(("task", "data")))
