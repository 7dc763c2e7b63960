"""Mono (single-accent) and multitask (multi-accent) trainers.

Reference behavior (R: src/mono_interface.py / src/multi_interface.py,
SURVEY.md section 2.1 #3-#4, section 3.4): standard loop — batch -> forward
-> loss -> optimizer step; periodic dev eval (CER/WER) with best-checkpoint
tracking; multitask pools accents with sampling proportional to data size
(BASELINE.json:8).

TPU shape: one jitted ``train_step`` per bucket shape (static shapes,
bounded jit cache); params donated to avoid copies.
"""

from __future__ import annotations

import os
import time

import jax
import optax
from flax import struct

from metaasr_tpu.config import Config
from metaasr_tpu.data.sampler import BucketBatcher, collate, item_samples
from metaasr_tpu.utils.padding import bucket_length
from metaasr_tpu.decode.greedy import greedy_to_texts
from metaasr_tpu.train.checkpoint import CheckpointManager
from metaasr_tpu.train.logging import MetricLogger
from metaasr_tpu.train.metrics import compute_cer, compute_wer
from metaasr_tpu.train.optimizer import make_optimizer
from metaasr_tpu.train.task import ASRTask


@struct.dataclass
class TrainState:
    params: dict
    opt_state: tuple
    step: int
    rng: jax.Array
    # best-checkpoint tracking lives IN the checkpointed state so resume
    # after preemption never overwrites 'best' with a worse model
    # (SURVEY.md section 5.3-5.4)
    best_metric: jax.Array
    stale_evals: jax.Array


def init_track() -> dict:
    import numpy as np

    # 0-d ndarrays (not numpy scalars): orbax StandardSave requires
    # array-like leaves
    return {"best_metric": np.asarray(np.inf, np.float32),
            "stale_evals": np.asarray(0, np.int32)}


def device_batch(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if k != "texts"}


class MonoASRTrainer:
    """Single- or pooled-accent supervised trainer (modes train/test)."""

    def __init__(self, cfg: Config, task: ASRTask, train_datasets,
                 dev_dataset, tokenizer, workdir: str):
        self.cfg = cfg
        self.task = task
        self.tokenizer = tokenizer
        self.train_datasets = (train_datasets if isinstance(train_datasets, list)
                               else [train_datasets])
        self.dev_dataset = dev_dataset
        self.optimizer = make_optimizer(cfg.optimizer, cfg.model.d_model)
        self.ckpt = CheckpointManager(f"{workdir}/ckpts",
                                      keep=cfg.train.keep_ckpts)
        self.logger = MetricLogger(f"{workdir}/logs",
                                   print_every=cfg.train.log_every)
        self.batcher = BucketBatcher(
            self.train_datasets, cfg.data.batch_size,
            seed=cfg.data.seed, tokenizer=tokenizer)
        self._jit_step = jax.jit(self._train_step, donate_argnums=0)

    def init_state(self, batch=None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        if batch is None:
            try:
                batch = next(iter(self.batcher))
            except StopIteration:
                # decode/transcribe-only sessions (or toy corpora) can
                # leave every bucket short of one full drop_last batch;
                # any items give the shape template (params are restored
                # from a checkpoint anyway in those sessions)
                ds = self.train_datasets[0]
                items = [ds[i] for i in range(min(2, len(ds)))]
                batch = collate(items,
                                self.cfg.data.max_frames * 160 + 240,
                                self.cfg.data.max_tokens)
        params = self.task.init_params(rng, device_batch(batch))
        return TrainState(params=params,
                          opt_state=self.optimizer.init(params),
                          step=0, rng=rng, **init_track())

    def _train_step(self, state: TrainState, batch: dict):
        rng = jax.random.fold_in(state.rng, state.step)
        p_rng, l_rng = jax.random.split(rng)
        # preprocess owns augmentation for BOTH payload modes (raw audio:
        # fbank+CMVN+SpecAugment; precomputed feats: SpecAugment only)
        fb = self.task.preprocess(batch, p_rng, True)
        (loss, metrics), grads = jax.value_and_grad(
            self.task.loss_fn, has_aux=True)(state.params, fb, l_rng, True)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def _make_feed(self, start_step: int):
        """Batch iterator for training.

        loader="buckets" (default): BucketBatcher — per-bucket shapes,
        exact (seed, epoch, index) resume by construction.
        loader="grain": worker-parallel grain pipeline (data.num_workers)
        at fixed cap shapes; its iterator state is written next to the
        orbax checkpoints (grain_state.bin) and restored here, so resume
        replays the exact stream (SURVEY.md section 5.3)."""
        if self.cfg.data.loader != "grain":
            return self.batcher.iter_from(start_step)
        from metaasr_tpu.data.grain_loader import (
            make_grain_loader,
            restore_iterator_state,
        )

        cap = self.cfg.data.max_frames * 160 + 240
        self._grain_it = make_grain_loader(
            self.train_datasets, self.cfg.data.batch_size, cap,
            self.cfg.data.max_tokens, seed=self.cfg.data.seed,
            num_workers=self.cfg.data.num_workers)
        path = self._grain_state_path(start_step)
        if start_step > 0 and os.path.exists(path):
            import pickle

            with open(path, "rb") as f:
                restore_iterator_state(self._grain_it, pickle.load(f))
        return self._grain_it

    def _grain_state_path(self, step: int) -> str:
        # per-step files (not one mutable blob): orbax saves are async, so
        # after a preemption the restored step can be OLDER than the last
        # save attempt — the iterator state must match the restored step
        return os.path.join(self.ckpt.ckpt_dir, f"grain_state_{step}.bin")

    def _save_ckpt(self, step: int, state, metrics=None, is_best=False):
        """Checkpoint the train state and, for the grain loader, the data
        iterator state beside it (atomic rename) — both halves of exact
        resume."""
        self.ckpt.save(step, state, metrics, is_best=is_best)
        it = getattr(self, "_grain_it", None)
        if it is not None:
            from metaasr_tpu.data.grain_loader import save_iterator_state

            blob = save_iterator_state(it)
            if blob is not None:
                import pickle

                tmp = self._grain_state_path(step) + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(blob, f)
                os.replace(tmp, self._grain_state_path(step))
                # prune states with no surviving checkpoint dir
                import glob
                import re

                for p in glob.glob(os.path.join(
                        self.ckpt.ckpt_dir, "grain_state_*.bin")):
                    m = re.search(r"grain_state_(\d+)\.bin$", p)
                    if m and int(m.group(1)) < step - \
                            self.cfg.train.keep_ckpts * \
                            max(self.cfg.train.ckpt_every, 1):
                        os.remove(p)

    def train(self, max_steps: int | None = None) -> TrainState:
        import numpy as np

        cfg = self.cfg.train
        max_steps = max_steps or cfg.max_steps
        state = self.init_state()
        state, _restored_step = self.ckpt.restore(state)
        # best checkpointing tracks cfg.keep_best_metric ("dev_wer"/"dev_cer")
        metric_key = cfg.keep_best_metric.removeprefix("dev_")
        t0, utts = time.time(), 0
        # data order is a pure function of (seed, epoch, batch index), so
        # resuming at state.step replays the exact stream (SURVEY.md 5.3)
        # host-side step mirror — reading state.step back each iteration
        # would sync the device per step and stall the dispatch pipeline
        # (see MetaASRTrainer.meta_train)
        step = int(state.step)
        feed = iter(self._make_feed(step))
        while step < max_steps:
            # bound check BEFORE fetching: pulling one batch past max_steps
            # would advance the (checkpointed) grain iterator state by a
            # batch the run never consumed, breaking exact resume
            batch = next(feed, None)
            if batch is None:
                break
            state, metrics = self._jit_step(
                state, jax.device_put(device_batch(batch)))
            utts += len(batch["texts"])
            step += 1
            if step % cfg.log_every == 0:
                dt = time.time() - t0
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["utts_per_sec"] = utts / max(dt, 1e-6)
                self.logger.log(step, metrics)
                t0, utts = time.time(), 0
            if (cfg.eval_every > 0 and step % cfg.eval_every == 0
                    and self.dev_dataset is not None):
                dev = self.evaluate(state.params, self.dev_dataset)
                self.logger.log(step, {f"dev_{k}": v for k, v in dev.items()})
                cur = dev.get(metric_key, dev.get("wer", 1e9))
                best = float(state.best_metric)
                is_best = cur < best
                stale = 0 if is_best else int(state.stale_evals) + 1
                state = state.replace(
                    best_metric=np.asarray(min(cur, best), np.float32),
                    stale_evals=np.asarray(stale, np.int32))
                self._save_ckpt(step, state, dev, is_best=is_best)
                if cfg.early_stop_patience and stale >= cfg.early_stop_patience:
                    self.logger.log(step, {"early_stop": 1.0})
                    break
            elif step % cfg.ckpt_every == 0:
                self._save_ckpt(step, state)
        self._save_ckpt(int(state.step), state)
        self.ckpt.wait()
        return state

    def evaluate(self, params, dataset, max_utts: int = 200) -> dict:
        """Greedy-CTC dev scoring (CER/WER) — the reference's per-epoch
        dev metric (SURVEY.md section 3.4). Batch shapes snap to the
        training bucket set so the jitted decode never retraces per batch."""
        hyps, refs = [], []
        bsz = self.cfg.data.batch_size
        idx = list(range(min(len(dataset), max_utts)))
        pending = []       # pipelined dispatch: enqueue all, read after
        for i in range(0, len(idx), bsz):
            items = [dataset[j] for j in idx[i: i + bsz]]
            smax = bucket_length(max(item_samples(it) for it in items),
                                 self.batcher.sample_buckets)
            umax = bucket_length(max(len(it["tokens"]) for it in items),
                                 self.batcher.token_buckets)
            batch = collate(items, smax, umax)
            pending.append(self.task.greedy_batch(params, batch))
            refs.extend(batch["texts"])
        for packed, out_lens in pending:
            hyps.extend(greedy_to_texts(packed, out_lens, self.tokenizer))
        # decoded text samples (SURVEY.md section 2.1 #19)
        for s in range(min(self.cfg.train.log_text_samples, len(hyps))):
            self.logger.log_text(0, f"sample_{s}",
                                 f"hyp: {hyps[s]} | ref: {refs[s]}")
        return {"wer": compute_wer(hyps, refs), "cer": compute_cer(hyps, refs)}


class MultitaskASRTrainer(MonoASRTrainer):
    """Multi-accent joint training, no meta (BASELINE.json:8): pooled
    utterances => accents sampled proportional to data size."""

    def __init__(self, cfg: Config, task: ASRTask, accent_datasets: dict,
                 dev_dataset, tokenizer, workdir: str):
        super().__init__(cfg, task, list(accent_datasets.values()),
                         dev_dataset, tokenizer, workdir)
        self.accents = sorted(accent_datasets)

