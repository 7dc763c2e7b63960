#!/usr/bin/env python
"""Multi-PROCESS MetaASRTrainer.meta_train end-to-end smoke (VERDICT r2 #6).

multihost_smoke.py covers maml_grads + feeding; THIS script drives the
actual trainer glue that runs at pod scale: ``MetaASRTrainer.meta_train``
in 2 real processes (4 virtual CPU devices each, one jax.distributed
rendezvous, ('task','data') = (4,2) global mesh), with

  - the streaming ``_batch_feed`` path (host_local_slice rows per process,
    make_global_meta_batch assembly),
  - a real orbax checkpoint SAVE at step 2 and RESTORE-resume to step 4
    in a fresh trainer (shared workdir, async checkpointing on).

The per-step meta-loss trajectory (steps 1-2 before the restart, 3-4
after) must match a single-process 8-device run to ~1e-5.

Usage:
    python scripts/multihost_trainer_smoke.py          # orchestrates
    python scripts/multihost_trainer_smoke.py --worker I --port P --dir D
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_PROC = 2
DEVICES_PER_PROC = 4
M_TASKS = 8      # 4 per process over the task axis
STEPS_A = 2      # first run: save ckpt at the end
STEPS_B = 4      # second run: restore step 2, continue to 4


def _force_cpu(n_devices: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _make_trainer(data_dir: str, workdir: str, mesh):
    from metaasr_tpu.config import Config
    from metaasr_tpu.data.dataset import load_accent_datasets
    from metaasr_tpu.data.tokenizer import CharTokenizer
    from metaasr_tpu.train.meta_train import MetaASRTrainer
    from metaasr_tpu.train.task import ASRTask

    tok = CharTokenizer.ascii_default()
    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.vocab_size = tok.vocab_size
    cfg.model.d_model = 32
    cfg.model.num_heads = 2
    cfg.model.d_ff = 64
    cfg.model.num_encoder_layers = 2
    cfg.model.num_decoder_layers = 2
    cfg.model.dtype = "float32"
    cfg.model.dropout = 0.0
    cfg.specaug.enabled = False
    cfg.frontend.use_pallas = False
    cfg.meta.tasks_per_batch = M_TASKS
    cfg.meta.k_support = 2
    cfg.meta.k_query = 2
    cfg.meta.inner_steps = 2
    cfg.data.max_frames = 100
    cfg.data.max_tokens = 16
    cfg.data.resident = "off"
    cfg.train.log_every = 10**9
    cfg.train.eval_every = 10**9
    cfg.train.ckpt_every = 10**9   # saves still happen at end of meta_train
    dsets = load_accent_datasets(data_dir, tok)
    task = ASRTask(cfg, tok.sos_eos_id)
    return MetaASRTrainer(cfg, task, dsets, {}, tok, workdir, mesh=mesh)


def _run_trainer(data_dir: str, workdir: str, mesh) -> list:
    """meta_train to STEPS_A (ckpt at end), fresh trainer resumes to
    STEPS_B; returns the full 4-step loss trajectory."""
    losses = []

    def spy(trainer):
        orig = trainer._jit_step

        def wrapped(state, batch):
            state, metrics = orig(state, batch)
            losses.append(metrics["meta_loss"])
            return state, metrics

        trainer._jit_step = wrapped

    t1 = _make_trainer(data_dir, workdir, mesh)
    spy(t1)
    state = t1.meta_train(max_steps=STEPS_A)
    assert int(state.step) == STEPS_A
    t2 = _make_trainer(data_dir, workdir, mesh)
    spy(t2)
    state = t2.meta_train(max_steps=STEPS_B)
    assert int(state.step) == STEPS_B, f"resume failed: {int(state.step)}"
    return [float(x) for x in losses]


def worker(idx: int, port: int, data_dir: str, workdir: str):
    jax = _force_cpu(DEVICES_PER_PROC)
    jax.distributed.initialize(f"localhost:{port}", NUM_PROC, idx)
    assert jax.process_count() == NUM_PROC
    from metaasr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_task=4, devices=jax.devices())
    losses = _run_trainer(data_dir, workdir, mesh)
    if jax.process_index() == 0:
        print("TRAJ " + json.dumps(losses), flush=True)


def single(data_dir: str, workdir: str):
    jax = _force_cpu(NUM_PROC * DEVICES_PER_PROC)
    from metaasr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_task=4, devices=jax.devices())
    losses = _run_trainer(data_dir, workdir, mesh)
    print("TRAJ " + json.dumps(losses), flush=True)


def gen(data_dir: str):
    _force_cpu(1)
    from metaasr_tpu.data.synthetic import generate_dataset

    generate_dataset(data_dir, utts_per_accent=8, words_per_utt=(1, 2),
                     seed=0)


def orchestrate() -> int:
    import socket
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    tmp = tempfile.mkdtemp(prefix="mh_trainer_")
    data_dir = os.path.join(tmp, "data")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    base = [sys.executable, os.path.abspath(__file__)]

    r = subprocess.run(base + ["--gen", "--dir", data_dir], env=env, cwd=HERE,
                       capture_output=True, text=True, timeout=300)
    if r.returncode != 0:
        print(r.stdout + r.stderr)
        return 1

    ref = subprocess.run(
        base + ["--single", "--dir", data_dir,
                "--workdir", os.path.join(tmp, "wd_single")],
        env=env, cwd=HERE, capture_output=True, text=True, timeout=900)
    if ref.returncode != 0:
        print(ref.stdout + ref.stderr)
        return 1
    ref_losses = _grab(ref.stdout)

    procs = [subprocess.Popen(
        base + ["--worker", str(i), "--port", str(port), "--dir", data_dir,
                "--workdir", os.path.join(tmp, "wd_multi")],
        env=env, cwd=HERE, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(NUM_PROC)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        if p.returncode != 0:
            print("\n".join(outs))
            return 1
    mp_losses = _grab(outs[0])

    if len(ref_losses) != STEPS_B or len(mp_losses) != STEPS_B:
        print(f"bad trajectory lengths: {ref_losses} vs {mp_losses}")
        return 1
    diffs = [abs(a - b) for a, b in zip(ref_losses, mp_losses)]
    ok = all(d < 1e-5 for d in diffs)
    print(f"single-process trajectory: {ref_losses}")
    print(f"2-process trajectory:      {mp_losses}")
    print(f"max diff: {max(diffs):.2e}  ->  {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


def _grab(out: str):
    for line in out.splitlines():
        if line.startswith("TRAJ "):
            return json.loads(line[5:])
    raise SystemExit(f"missing TRAJ in output:\n{out}")


def main():
    sys.path.insert(0, HERE)
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--dir", default="")
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()
    if args.gen:
        gen(args.dir)
        return 0
    if args.single:
        single(args.dir, args.workdir)
        return 0
    if args.worker is not None:
        worker(args.worker, args.port, args.dir, args.workdir)
        return 0
    return orchestrate()


if __name__ == "__main__":
    raise SystemExit(main())
