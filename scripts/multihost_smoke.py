#!/usr/bin/env python
"""True multi-PROCESS distributed smoke test (SURVEY.md section 5.8).

The test suite validates multi-host data feeding single-process (each
"host"'s rows assembled with make_global_meta_batch). This script goes one
step further: it spawns 2 separate processes, each with 4 virtual CPU
devices, joined by a real ``jax.distributed.initialize`` rendezvous into
one 8-device ('task','data') mesh. Each process feeds ONLY its own rows
of the meta batch (host_local_slice +
jax.make_array_from_process_local_data) and runs 2 jitted FOMAML steps;
the resulting meta losses must match a single-process 8-device run of the
same global batch to ~1e-5.

Usage:
    python scripts/multihost_smoke.py            # orchestrates everything
    python scripts/multihost_smoke.py --worker I --port P   # internal
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_PROC = 2
DEVICES_PER_PROC = 4
M_TASKS = 8          # global accent tasks; 4 per process
K_SHOT = 4           # divisible by the data axis (2)
NUM_SAMPLES, NUM_TOKENS, VOCAB = 4800, 8, 12
SEED = 7


def _make_global_numpy_batch():
    """The full global meta batch, identical in every process (seeded)."""
    import numpy as np

    rng = np.random.default_rng(SEED)

    def batch():
        return {
            "audio": (0.1 * rng.standard_normal(
                (M_TASKS, K_SHOT, NUM_SAMPLES))).astype(np.float32),
            "audio_lens": np.full((M_TASKS, K_SHOT), NUM_SAMPLES, np.int32),
            "tokens": rng.integers(
                1, VOCAB - 1, (M_TASKS, K_SHOT, NUM_TOKENS)).astype(np.int32),
            "token_lens": np.full((M_TASKS, K_SHOT), NUM_TOKENS, np.int32),
        }

    return {"support": batch(), "query": batch()}


def _build(mesh):
    """(step_fn, params, opt_state, sharding_fn) for the tiny FOMAML step."""
    import jax
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from metaasr_tpu.config import Config
    from metaasr_tpu.meta.maml import MetaAlgoConfig, maml_grads
    from metaasr_tpu.parallel.mesh import replicated
    from metaasr_tpu.train.task import ASRTask

    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.vocab_size = VOCAB
    cfg.model.d_model = 32
    cfg.model.num_heads = 2
    cfg.model.d_ff = 64
    cfg.model.num_encoder_layers = 2
    cfg.model.num_decoder_layers = 2
    cfg.model.dropout = 0.0
    cfg.specaug.enabled = False
    task = ASRTask(cfg)

    import numpy as np

    init_batch = {k: v[0] for k, v in _make_global_numpy_batch()["support"].items()}
    params = task.init_params(jax.random.PRNGKey(0),
                              {k: jax.numpy.asarray(v) for k, v in init_batch.items()})
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    grad_fn = maml_grads(task.loss_fn, MetaAlgoConfig(
        inner_lr=1e-2, inner_steps=2, first_order=True),
        preprocess_fn=task.preprocess)

    rep = replicated(mesh)

    def sharding_fn(x):
        spec = P("task", "data") if np.asarray(x).ndim >= 2 else P("task")
        return NamedSharding(mesh, spec)

    def train_step(params, opt_state, meta_batch, key):
        grads, metrics = grad_fn(params, meta_batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics["meta_loss"]

    step = jax.jit(train_step, in_shardings=(rep, rep, None, rep),
                   out_shardings=(rep, rep, rep))
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    return step, params, opt_state, sharding_fn, rep


def _run_steps(mesh, feed_fn):
    """Run 2 FOMAML steps; feed_fn(global_np_batch, sharding_fn) -> device batch."""
    import jax

    step, params, opt_state, sharding_fn, rep = _build(mesh)
    losses = []
    global_np = _make_global_numpy_batch()
    key = jax.device_put(jax.random.PRNGKey(1), rep)
    for _ in range(2):
        meta_batch = feed_fn(global_np, sharding_fn)
        params, opt_state, loss = step(params, opt_state, meta_batch, key)
        losses.append(float(loss))
    return losses


def worker(idx: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", NUM_PROC, idx)
    assert jax.process_count() == NUM_PROC
    assert len(jax.devices()) == NUM_PROC * DEVICES_PER_PROC

    from metaasr_tpu.parallel.distributed import (
        host_local_slice,
        make_global_meta_batch,
    )
    from metaasr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_task=4, devices=jax.devices())

    def feed(global_np, sharding_fn):
        rows = host_local_slice(M_TASKS)
        local = {side: {k: v[rows] for k, v in global_np[side].items()}
                 for side in ("support", "query")}
        return make_global_meta_batch(mesh, local, sharding_fn)

    losses = _run_steps(mesh, feed)
    if jax.process_index() == 0:
        print(f"MULTIPROC_LOSSES {losses[0]:.6f} {losses[1]:.6f}", flush=True)


def single():
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{NUM_PROC * DEVICES_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from metaasr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_task=4, devices=jax.devices())

    def feed(global_np, sharding_fn):
        return {side: {k: jax.device_put(v, sharding_fn(v))
                       for k, v in global_np[side].items()}
                for side in ("support", "query")}

    losses = _run_steps(mesh, feed)
    print(f"SINGLE_LOSSES {losses[0]:.6f} {losses[1]:.6f}", flush=True)


def orchestrate() -> int:
    import socket

    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    base = [sys.executable, os.path.abspath(__file__)]

    ref = subprocess.run(base + ["--single"], env=env, cwd=HERE,
                         capture_output=True, text=True, timeout=600)
    if ref.returncode != 0:
        print(ref.stdout + ref.stderr)
        return 1
    ref_losses = [float(x) for x in _grab(ref.stdout, "SINGLE_LOSSES")]

    procs = [subprocess.Popen(base + ["--worker", str(i), "--port", str(port)],
                              env=env, cwd=HERE, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(NUM_PROC)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        if p.returncode != 0:
            print("\n".join(outs))
            return 1
    mp_losses = [float(x) for x in _grab(outs[0], "MULTIPROC_LOSSES")]

    diffs = [abs(a - b) for a, b in zip(ref_losses, mp_losses)]
    ok = all(d < 1e-5 for d in diffs)
    print(f"single-process losses:  {ref_losses}")
    print(f"2-process losses:       {mp_losses}")
    print(f"max diff: {max(diffs):.2e}  ->  {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


def _grab(out: str, tag: str):
    for line in out.splitlines():
        if line.startswith(tag):
            return line.split()[1:3]
    raise SystemExit(f"missing {tag} in output:\n{out}")


def main():
    sys.path.insert(0, HERE)
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--single", action="store_true")
    args = ap.parse_args()
    if args.single:
        single()
        return 0
    if args.worker is not None:
        worker(args.worker, args.port)
        return 0
    return orchestrate()


if __name__ == "__main__":
    raise SystemExit(main())
