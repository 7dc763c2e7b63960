"""Meta-training trainer: ``meta_train`` / ``meta_adapt`` / ``decode``.

Public entry points mirror the reference (BASELINE.json:5; R:
src/fomaml_interface.py / src/maml_interface.py, SURVEY.md section 2.1
#5-#7, section 3.1/3.3):

- ``meta_train``: outer loop over meta-batches of accent tasks. One jitted
  step: vmapped (task-sharded) inner SGD + query grads + outer Adam update.
- ``meta_adapt``: load meta params fresh, run ``adapt_steps`` inner SGD
  steps on a held-out accent's k-shot support set.
- ``decode``: greedy CTC (beam search in decode/beam_search.py) over the
  held-out accent's test set -> WER/CER (the headline quality metric,
  BASELINE.json:2).
"""

from __future__ import annotations

import time

import jax
import numpy as np
import optax
from flax import struct

from metaasr_tpu.config import Config
from metaasr_tpu.data.sampler import TaskSampler, collate, support_query_split
from metaasr_tpu.decode.greedy import greedy_to_texts
from metaasr_tpu.meta.maml import (
    MetaAlgoConfig,
    make_inner_adapt,
    maml_grads,
    reptile_grads,
    split_lr,
    wrap_lr,
)
from metaasr_tpu.parallel.mesh import replicated
from metaasr_tpu.train.checkpoint import CheckpointManager
from metaasr_tpu.train.logging import MetricLogger
from metaasr_tpu.train.metrics import compute_cer, compute_wer
from metaasr_tpu.train.optimizer import make_optimizer
from metaasr_tpu.train.task import ASRTask


@struct.dataclass
class MetaTrainState:
    params: dict
    opt_state: tuple
    step: int
    rng: jax.Array
    # in-state best tracking => preemption-safe best checkpointing
    # (SURVEY.md section 5.3-5.4): restore() recovers it, so the first
    # eval after a resume can never overwrite 'best' with a worse model
    best_metric: jax.Array
    stale_evals: jax.Array


def algo_config(cfg: Config) -> MetaAlgoConfig:
    algo = cfg.meta.algo
    if algo not in ("fomaml", "maml", "reptile"):
        raise ValueError(f"meta algo must be fomaml|maml|reptile, got {algo}")
    if cfg.meta.learn_inner_lr and algo == "reptile":
        raise ValueError(
            "meta.learn_inner_lr needs a query gradient to train the rates; "
            "Reptile's outer update is a parameter delta (no rate signal) — "
            "use fomaml or maml")
    if _adapt_filter(cfg) and algo == "reptile":
        raise ValueError(
            "meta.adapt_filter is incompatible with Reptile: its outer "
            "gradient IS the inner delta, so filtered (frozen) leaves would "
            "never train at all — use fomaml or maml")
    if cfg.meta.inner_start_step and algo == "reptile":
        raise ValueError(
            "meta.inner_start_step is incompatible with Reptile: gating the "
            "inner loop to 0 zeroes its outer update entirely — use fomaml "
            "or maml")
    if cfg.meta.adapt_widen_step and not _adapt_filter(cfg):
        raise ValueError(
            "meta.adapt_widen_step stages the inner loop from adapt_filter "
            "leaves to all leaves — it requires meta.adapt_filter to be set "
            "(otherwise every leaf already adapts from step 0)")
    return MetaAlgoConfig(inner_lr=cfg.meta.inner_lr,
                          inner_steps=cfg.meta.inner_steps,
                          first_order=(algo != "maml"),
                          remat_inner=cfg.meta.remat_inner,
                          unroll_inner=cfg.meta.unroll_inner,
                          grad_dtype=(None if cfg.meta.grad_dtype == "float32"
                                      else cfg.meta.grad_dtype),
                          learn_inner_lr=cfg.meta.learn_inner_lr,
                          inner_clip=cfg.meta.inner_clip,
                          adapt_filter=_adapt_filter(cfg))


def _adapt_filter(cfg: Config) -> tuple[str, ...] | None:
    """meta.adapt_filter "a,b" -> ("a", "b"); "" -> None (adapt all)."""
    pats = tuple(s.strip() for s in cfg.meta.adapt_filter.split(",")
                 if s.strip())
    return pats or None


class MetaASRTrainer:
    def __init__(self, cfg: Config, task: ASRTask, accent_datasets: dict,
                 heldout_datasets: dict, tokenizer, workdir: str, mesh=None):
        self.cfg = cfg
        self.task = task
        self.tokenizer = tokenizer
        self.accent_datasets = accent_datasets
        self.heldout_datasets = heldout_datasets
        self.mesh = mesh
        if cfg.meta.algo == "maml":
            # second-order: every op must be twice-differentiable. The
            # Pallas CTC is (custom-JVP rework, r5) — only the Pallas LSTM
            # still swaps to scan inside require_full_autodiff.
            task.require_full_autodiff()
        self.optimizer = make_optimizer(cfg.optimizer, cfg.model.d_model)
        self.ckpt = CheckpointManager(f"{workdir}/ckpts",
                                      keep=cfg.train.keep_ckpts)
        self.logger = MetricLogger(f"{workdir}/logs",
                                   print_every=cfg.train.log_every)
        m = cfg.meta
        d = cfg.data
        cap = self._num_samples_cap()
        s_buckets, u_buckets = (), ()
        if d.meta_buckets:
            # caps always present so nothing can overflow its bucket
            s_buckets = tuple(sorted(
                {min(f * 160 + 240, cap) for f in d.frame_buckets} | {cap}))
            u_buckets = tuple(sorted(
                {min(u, d.max_tokens) for u in d.token_buckets}
                | {d.max_tokens}))
        # decode/adapt-only sessions (e.g. CLI transcribe with one accent,
        # or everything held out) never draw meta-batches — don't let the
        # sampler's tasks_per_batch <= accents invariant block them;
        # meta_train() itself still requires a usable sampler
        self.sampler = None
        if accent_datasets and m.tasks_per_batch <= len(accent_datasets):
            self.sampler = TaskSampler(
                accent_datasets, k_support=m.k_support, k_query=m.k_query,
                tasks_per_batch=m.tasks_per_batch,
                num_samples=cap, num_tokens=d.max_tokens,
                seed=d.seed, sample_buckets=s_buckets,
                token_buckets=u_buckets)
        make_grads = (reptile_grads if cfg.meta.algo == "reptile"
                      else maml_grads)
        self._grad_fn = make_grads(self.task.loss_fn, algo_config(cfg),
                                   preprocess_fn=self.task.preprocess)
        self._jit_step = self._build_step()
        self._store = None
        self._resident_ready = False

    def _setup_resident(self):
        """Device-resident corpus mode (data.resident): pack the dataset
        onto the device once; each step transfers only [M, k] index
        arrays and gathers the batch on-device. Removes per-step bulk H2D
        (the dominant CLI-training cost on slow-interconnect hosts)."""
        from metaasr_tpu.data.sampler import (
            build_resident_store,
            resident_store_bytes,
        )

        # lazy: packing decodes the whole corpus — only pay it when
        # meta_train actually runs (not in adapt/test-only sessions)
        if self._resident_ready:
            return
        self._resident_ready = True
        d = self.cfg.data
        if self.mesh is not None or d.resident == "off":
            return
        nbytes = resident_store_bytes(self.accent_datasets,
                                      self._num_samples_cap(), d.max_tokens)
        if d.resident == "auto" and nbytes > d.resident_max_gb * 1e9:
            return
        store_np, self._offsets = build_resident_store(
            self.accent_datasets, self._num_samples_cap(), d.max_tokens)
        self._store = jax.device_put(store_np)
        self._resident_step_cache = {}

    def _jit_step_resident(self, shape: tuple[int, int]):
        """Jitted resident step for one (num_samples, num_tokens) bucket:
        the store stays padded at the caps; after the on-device gather the
        batch is statically sliced down to the bucket shape, so the math
        runs at bucket size while the corpus lives on device once."""
        cached = self._resident_step_cache.get(shape)
        if cached is not None:
            return cached
        n_samples, n_tokens = shape

        def step(state: MetaTrainState, store: dict, sup_idx, qry_idx):
            def gather(idx):
                b = {k: v[idx] for k, v in store.items()}
                b["audio"] = b["audio"][:, :, :n_samples]
                b["tokens"] = b["tokens"][:, :, :n_tokens]
                return b

            meta_batch = {"support": gather(sup_idx),
                          "query": gather(qry_idx)}
            rng = jax.random.fold_in(state.rng, state.step)
            grads, metrics = self._grad_fn(
                state.params, meta_batch, rng,
                inner_scale=self._inner_scale(state.step),
                widen_scale=self._widen_scale(state.step))
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1), metrics

        fn = jax.jit(step, donate_argnums=0)
        self._resident_step_cache[shape] = fn
        return fn

    def _resident_indices(self, step: int):
        accents, sup, qry = self.sampler.sample_indices(step)
        shape = self.sampler.step_shape(accents, sup, qry)
        off = np.asarray([self._offsets[a] for a in accents],
                         dtype=np.int32)[:, None]
        return sup + off, qry + off, shape

    def _num_samples_cap(self) -> int:
        # max_frames is a feature-frame cap; convert to raw samples
        return self.cfg.data.max_frames * 160 + 240

    def _inner_scale(self, step):
        """meta.inner_start_step gate as a traced 0/1 scalar (None when the
        feature is off, keeping the grad_fn's default fast path). ``step``
        is the in-state step, so checkpoint resume preserves the schedule
        position for free."""
        start = self.cfg.meta.inner_start_step
        if not start:
            return None
        return (step >= start).astype(jax.numpy.float32)

    def _widen_scale(self, step):
        """meta.adapt_widen_step gate (staged ANIL): 0/1 scalar turning on
        the inner updates of leaves outside adapt_filter (meta/maml.py
        one_step). Same in-state-step/resume semantics as _inner_scale."""
        start = self.cfg.meta.adapt_widen_step
        if not start:
            return None
        return (step >= start).astype(jax.numpy.float32)

    def _build_step(self):
        def step(state: MetaTrainState, meta_batch: dict):
            rng = jax.random.fold_in(state.rng, state.step)
            grads, metrics = self._grad_fn(
                state.params, meta_batch, rng,
                inner_scale=self._inner_scale(state.step),
                widen_scale=self._widen_scale(state.step))
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1), metrics

        if self.mesh is not None:
            state_sh = replicated(self.mesh)
            return jax.jit(step, donate_argnums=0,
                           in_shardings=(state_sh, None),
                           out_shardings=(state_sh, None))
        return jax.jit(step, donate_argnums=0)

    # ---------- entry points ----------

    def init_state(self) -> MetaTrainState:
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        if self.sampler is not None:
            mb = self.sampler.sample()
            sample = {k: v[0] for k, v in mb["support"].items()
                      if k != "texts"}
        else:
            # decode/adapt-only session: any dataset provides the shape
            # template for param init (params are then restored anyway)
            ds = (next(iter(self.accent_datasets.values()), None)
                  or next(iter(self.heldout_datasets.values())))
            items = [ds[i] for i in range(min(2, len(ds)))]
            batch = collate(items, self._num_samples_cap(),
                            self.cfg.data.max_tokens)
            sample = {k: v for k, v in batch.items() if k != "texts"}
        params = self.task.init_params(rng, sample)
        if self.cfg.meta.learn_inner_lr:
            # Meta-SGD/LSLR: the learned rates live in the param tree so
            # the outer optimizer, checkpoints, --avg-last and the mesh
            # shardings all treat them as ordinary meta-parameters
            params = wrap_lr(params, self.cfg.meta.inner_lr)
        from metaasr_tpu.train.mono import init_track

        return MetaTrainState(params=params,
                              opt_state=self.optimizer.init(params),
                              step=0, rng=rng, **init_track())

    def _batch_feed(self, start_step: int, max_steps: int):
        """Prefetching iterator of device-ready meta batches.

        Host-side sampling (WAV decode + collate of M*(ks+kq) utterances)
        can rival the device step time, so a producer thread builds the
        NEXT batches while the device runs the current one. Batches stay a
        pure function of (seed, step), so prefetching changes nothing
        about determinism or resume (SURVEY.md section 5.3).

        Multi-host pods (SURVEY.md section 5.8, section 7 M7): every host
        draws the same global (seed, step) sample but collates ONLY its
        own task rows; ``make_global_meta_batch`` assembles the
        globally-sharded arrays from the per-host local data. Single-host
        this degenerates to a plain sharded device_put.
        """
        import queue
        import threading

        from metaasr_tpu.parallel.distributed import (
            host_local_slice,
            make_global_meta_batch,
        )
        from metaasr_tpu.parallel.mesh import meta_batch_shardings

        multihost = self.mesh is not None and jax.process_count() > 1
        rows = (host_local_slice(self.cfg.meta.tasks_per_batch)
                if multihost else None)

        q: "queue.Queue" = queue.Queue(maxsize=2)

        def produce():
            for step in range(start_step, max_steps):
                mb = self.sampler.sample(step, rows=rows)
                q.put({s: {k: v for k, v in mb[s].items() if k != "texts"}
                       for s in ("support", "query")})
            q.put(None)

        threading.Thread(target=produce, daemon=True).start()
        while True:
            batch = q.get()
            if batch is None:
                return
            # device_put on the MAIN thread: producer-side transfers
            # contend with the compute stream on this TPU attachment and
            # degrade over time; main-thread transfer is stable.
            if self.mesh is None:
                batch = jax.device_put(batch)
            else:
                # second_order: MAML's grad-of-grad + data-axis-sharded
                # conv batches crash the GSPMD partitioner — shard tasks
                # only (see parallel/mesh.py meta_batch_shardings)
                batch = make_global_meta_batch(
                    self.mesh, batch,
                    meta_batch_shardings(
                        self.mesh,
                        second_order=self.cfg.meta.algo == "maml"))
            yield batch

    def meta_train(self, max_steps: int | None = None) -> MetaTrainState:
        if self.sampler is None:
            raise ValueError(
                "meta_train needs meta.tasks_per_batch <= number of "
                f"training accents ({len(self.accent_datasets)} loaded); "
                "this trainer was built decode/adapt-only")
        cfg = self.cfg.train
        max_steps = max_steps or cfg.max_steps
        state = self.init_state()
        state, _ = self.ckpt.restore(state)
        t0 = time.time()
        utts = 0
        self._setup_resident()
        if self._store is not None:
            feed = (self._resident_indices(s)
                    for s in range(int(state.step), max_steps))
        else:
            feed = self._batch_feed(int(state.step), max_steps)
        # host-side step mirror: reading state.step back would force a
        # device sync EVERY step (the dispatch pipeline then stalls at
        # one-step depth — measured 550-950 utts/s vs ~2270 for the pure
        # device loop). With the mirror, the host runs ahead and only the
        # log_every metrics fetch synchronizes.
        step = int(state.step)
        for batch in feed:
            if self._store is not None:
                sup_idx, qry_idx, shape = batch
                state, metrics = self._jit_step_resident(shape)(
                    state, self._store, sup_idx, qry_idx)
            else:
                state, metrics = self._jit_step(state, batch)
            utts += (self.cfg.meta.tasks_per_batch
                     * (self.cfg.meta.k_support * self.cfg.meta.inner_steps
                        + self.cfg.meta.k_query))
            step += 1
            if step % cfg.log_every == 0:
                dt = time.time() - t0
                out = {k: float(np.asarray(v)) for k, v in metrics.items()}
                out["utts_per_sec"] = utts / max(dt, 1e-6)
                self.logger.log(step, out)
                t0, utts = time.time(), 0
            if (cfg.eval_every > 0 and step % cfg.eval_every == 0
                    and self.heldout_datasets):
                scores = self.eval_heldout(state.params)
                self.logger.log(step, scores)
                cur = scores.get("heldout_wer_mean", 1e9)
                best = float(state.best_metric)
                is_best = cur < best
                stale = 0 if is_best else int(state.stale_evals) + 1
                state = state.replace(
                    best_metric=np.asarray(min(cur, best), np.float32),
                    stale_evals=np.asarray(stale, np.int32))
                self.ckpt.save(step, state, scores, is_best=is_best)
                if (cfg.early_stop_patience
                        and stale >= cfg.early_stop_patience):
                    self.logger.log(step, {"early_stop": 1.0})
                    break
            elif step % cfg.ckpt_every == 0:
                self.ckpt.save(step, state)
        self.ckpt.save(int(state.step), state)
        self.ckpt.wait()
        return state

    def meta_adapt(self, params, accent_dataset, adapt_steps: int | None = None,
                   k_support: int | None = None, seed: int = 0):
        """k-shot adaptation on a held-out accent: fresh copy of the meta
        params + inner SGD on one support batch (SURVEY.md section 3.3).
        Returns (adapted_params, test_indices)."""
        m = self.cfg.meta
        steps = adapt_steps or m.adapt_steps
        k = k_support or m.k_support
        support, test_idx = support_query_split(
            accent_dataset, k, self._num_samples_cap(),
            self.cfg.data.max_tokens, seed=seed)
        batch = {kk: jax.numpy.asarray(v) for kk, v in support.items()
                 if kk != "texts"}
        adapted = self._jit_adapt(steps)(params, batch,
                                         jax.random.PRNGKey(seed))
        # learnable-inner-lr trees adapt WITH their learned rates, then
        # hand decode a plain model tree (split_lr is a no-op otherwise)
        return split_lr(adapted)[0], test_idx

    def _jit_adapt(self, steps: int):
        """Cached jitted k-shot adaptation fn (avoids retracing per eval)."""
        if not hasattr(self, "_adapt_cache"):
            self._adapt_cache = {}
        if steps not in self._adapt_cache:
            m = self.cfg.meta
            inner = make_inner_adapt(
                self.task.loss_fn,
                MetaAlgoConfig(inner_lr=m.inner_lr, inner_steps=steps,
                               first_order=True, remat_inner=False,
                               unroll_inner=m.unroll_inner,
                               inner_clip=m.inner_clip,
                               # staged ANIL trains TOWARD full-body
                               # adaptation; meta-test adapts the end-state
                               # inner loop (all leaves)
                               adapt_filter=(None if m.adapt_widen_step
                                             else _adapt_filter(self.cfg))),
                train=True)

            def adapt(p, b, r):
                r_p, r_i = jax.random.split(r)
                fb = self.task.preprocess(b, r_p, True)
                return inner(p, fb, r_i)[0]

            self._adapt_cache[steps] = jax.jit(adapt)
        return self._adapt_cache[steps]

    def decode(self, params, dataset, indices=None, max_utts: int = 100,
               mode: str = "greedy", dump_path: str | None = None,
               dump_nbest: int = 1) -> dict:
        """Decode a dataset (or subset) -> WER/CER.

        mode='greedy': CTC greedy. mode='beam': batched on-device joint
        CTC/attention beam search (transformer only; SURVEY.md section 3.3).
        ``dump_path``: write one JSONL record {"hyp", "ref"} per utterance
        (the reference's decode writes hypothesis files; SURVEY.md
        section 3.3); beam mode adds the top hypothesis "score", and
        ``dump_nbest`` > 1 adds an "nbest" list of {"hyp", "score"}
        (ESPnet n-best output semantics; scores are the search's joint
        cumulative scores, post final ranking).

        Pipelined dispatch: every batch is enqueued on the device before
        any result is read back. On a network-attached chip the sync
        read-after-dispatch pattern pays ~80 ms of round-trip latency per
        batch; deferring the host reads overlaps batch i+1's compute with
        batch i's readback (measured 2.4x decode throughput at B=16:
        115 -> 273 utts/s).
        """
        params = split_lr(params)[0]   # zero-shot decode of a wrapped tree
        indices = list(indices if indices is not None else range(len(dataset)))
        indices = indices[:max_utts]
        hyps, refs = [], []
        bsz = self.cfg.data.batch_size
        from metaasr_tpu.data.sampler import item_samples
        from metaasr_tpu.utils.padding import bucket_length

        buckets = tuple(sorted({bucket_length(
            item_samples(dataset[j]), (16000, 32000, 64000, 128000, 256000))
            for j in indices}))
        use_beam = mode == "beam" and self.task.arch == "transformer"
        pending = []                     # device outputs, read after the loop
        for i in range(0, len(indices), bsz):
            items = [dataset[j] for j in indices[i: i + bsz]]
            smax = bucket_length(max(item_samples(it) for it in items),
                                 buckets)
            batch = collate(items, smax, self.cfg.data.max_tokens)
            if use_beam:
                pending.append(self._beam_dispatch_batch(params, batch))
            else:
                pending.append(self.task.greedy_batch(params, batch))
            refs.extend(batch["texts"])
        details = []                     # per-utt beam extras for the dump
        for out in pending:
            if use_beam:
                texts, extras = self._beam_read(out, nbest=dump_nbest)
                hyps.extend(texts)
                details.extend(extras)
            else:
                packed, out_lens = out
                hyps.extend(greedy_to_texts(packed, out_lens, self.tokenizer))
        if dump_path:
            import json

            with open(dump_path, "w") as f:
                for i, (h, r) in enumerate(zip(hyps, refs)):
                    rec = {"hyp": h, "ref": r}
                    if i < len(details):
                        rec.update(details[i])
                    f.write(json.dumps(rec) + "\n")
        return {"wer": compute_wer(hyps, refs), "cer": compute_cer(hyps, refs)}

    def _beam_read(self, out, nbest: int = 1):
        """Host readback of one dispatched beam batch (a packed int32
        array; serve/export.py unpack). Returns (texts, extras): top
        hypothesis per utterance as text, plus per-utterance dump extras
        ({"score"} and, for nbest > 1, {"nbest": [...]})."""
        from metaasr_tpu.serve.export import unpack_decode_outputs

        out = unpack_decode_outputs(out)
        toks = np.asarray(out["tokens"])
        lens = np.asarray(out["lengths"])
        scores = np.asarray(out["scores"])
        texts = [self.tokenizer.decode(toks[b, 0, : lens[b, 0]])
                 for b in range(toks.shape[0])]
        k = min(max(1, nbest), toks.shape[1])
        extras = []
        for b in range(toks.shape[0]):
            e = {"score": float(scores[b, 0])}
            if k > 1:
                e["nbest"] = [
                    {"hyp": self.tokenizer.decode(toks[b, j, : lens[b, j]]),
                     "score": float(scores[b, j])} for j in range(k)]
            extras.append(e)
        return texts, extras

    def _beam_dispatch_batch(self, params, batch):
        import jax.numpy as jnp

        from metaasr_tpu.decode.beam_search import (
            BeamSearchConfig,
            beam_search_transformer,
        )

        t = self.cfg.train
        cfg = BeamSearchConfig(beam_size=t.beam_size,
                               max_len=self.cfg.data.max_tokens,
                               ctc_weight=t.decode_ctc_weight,
                               length_penalty=t.length_penalty,
                               ctc_candidates=t.ctc_candidates,
                               normalize_final=t.normalize_final,
                               coverage_weight=t.coverage_weight,
                               coverage_tau=t.coverage_tau,
                               min_len=t.beam_min_len,
                               lm_weight=t.lm_weight if t.lm_ckpt else 0.0)
        if "feats" in batch:
            feats = jnp.asarray(batch["feats"])
            feat_lens = jnp.asarray(batch["feat_lens"])
        else:
            feats, feat_lens = self.task.features(
                jnp.asarray(batch["audio"]), jnp.asarray(batch["audio_lens"]),
                cmvn_mean=batch.get("cmvn_mean"),
                cmvn_std=batch.get("cmvn_std"))
        return self._jit_beam(cfg)(params, feats, feat_lens)

    def _fusion_lm(self):
        """Lazily load the shallow-fusion LM named by cfg.train.lm_ckpt
        (npz from scripts/train_lm.py; architecture recovered from the
        parameter shapes). Returns (model, params) or (None, None)."""
        t = self.cfg.train
        if t.lm_weight == 0.0 or not t.lm_ckpt:
            return None, None
        if not hasattr(self, "_lm_cache"):
            from metaasr_tpu.models.lm import LSTMLM, lm_dims_from_params
            from metaasr_tpu.train.checkpoint import load_params_npz

            lm_params = load_params_npz(t.lm_ckpt)
            self._lm_cache = (LSTMLM(**lm_dims_from_params(lm_params)),
                              lm_params)
        return self._lm_cache

    def _jit_beam(self, bs_cfg):
        if not hasattr(self, "_beam_cache"):
            self._beam_cache = {}
        key = bs_cfg
        if key not in self._beam_cache:
            from metaasr_tpu.decode.beam_search import beam_search_transformer

            model = self.task.model
            eos = self.task.sos_eos_id
            lm_model, lm_params = self._fusion_lm()

            from metaasr_tpu.serve.export import pack_decode_outputs

            def run(params, feats, feat_lens):
                # packed outputs: one D2H fetch per batch instead of
                # three in the pipelined readback loop (_beam_read
                # unpacks; see serve/export.py pack_decode_outputs)
                return pack_decode_outputs(beam_search_transformer(
                    model, params, feats, feat_lens, eos, bs_cfg,
                    lm_model=lm_model, lm_params=lm_params))

            self._beam_cache[key] = jax.jit(run)
        return self._beam_cache[key]

    def eval_heldout(self, params, max_utts: int | None = None,
                     support_draws: int | None = None) -> dict:
        """5-shot adapt + decode on every held-out accent (the headline
        metric, BASELINE.json:2). Decode mode follows
        cfg.train.eval_decode_mode so best-checkpoint selection tracks the
        same metric RESULTS reports (beam by default for transformers).

        Each accent's WER is the MEAN over ``train.eval_support_draws``
        independent k-shot support draws (different split seeds): one
        draw's spread (measured +-0.018) is the same order as the metric,
        so single-draw best-ckpt selection chases support-sampling noise.
        Per-accent std across draws is reported alongside."""
        out = {}
        wers = []
        max_utts = max_utts or self.cfg.train.eval_max_utts
        draws = max(1, support_draws if support_draws is not None
                    else self.cfg.train.eval_support_draws)
        mode = self.cfg.train.eval_decode_mode
        for name, ds in self.heldout_datasets.items():
            draw_wer, draw_cer = [], []
            for seed in range(draws):
                adapted, test_idx = self.meta_adapt(params, ds, seed=seed)
                scores = self.decode(adapted, ds, test_idx,
                                     max_utts=max_utts, mode=mode)
                draw_wer.append(scores["wer"])
                draw_cer.append(scores["cer"])
            out[f"heldout_{name}_wer"] = float(np.mean(draw_wer))
            out[f"heldout_{name}_cer"] = float(np.mean(draw_cer))
            if draws > 1:
                out[f"heldout_{name}_wer_std"] = float(np.std(draw_wer))
            wers.append(float(np.mean(draw_wer)))
        out["heldout_wer_mean"] = float(np.mean(wers)) if wers else 1.0
        return out
