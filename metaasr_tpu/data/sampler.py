"""Task sampler + length-bucketed batching.

The reference's meta-batch construction (R: src/data_loader.py, SURVEY.md
section 2.1 #13): each meta-batch samples M accents; per accent it draws
disjoint support (k-shot) and query utterance batches; utterances are
length-bucketed and zero-padded.

TPU-first differences:
- batches are plain dicts of numpy arrays with STATIC shapes (a small bucket
  set bounds jit recompilation);
- the meta batch is a single stacked array with a leading task axis
  [M, k, ...] so the whole meta-step jits once and tasks ``vmap``/shard over
  the mesh (BASELINE.json:5,11) — no per-task host loop.

Batch fields (audio-manifest mode):
    audio      [B, S]  float32 waveform, zero-padded
    audio_lens [B]     int32
    tokens     [B, U]  int32, zero-padded
    token_lens [B]     int32
Meta-batch fields: same, with leading [M, k] axes, plus the same for query.
"""

from __future__ import annotations

import numpy as np

from metaasr_tpu.utils.padding import bucket_length

# Waveform-length buckets (samples @16k): 1s, 2s, 4s, 8s, 16s.
DEFAULT_SAMPLE_BUCKETS = (16000, 32000, 64000, 128000, 256000)
DEFAULT_TOKEN_BUCKETS = (16, 32, 64, 128)


def collate(items: list[dict], num_samples: int, num_tokens: int) -> dict:
    """Pad a list of dataset items to [B, num_samples] / [B, num_tokens].

    Audio-manifest items carry raw waveforms ('audio'); precomputed-feature
    items ('feats' [T, 80], the reference's offline-extraction mode,
    SURVEY.md section 2.1 #12) are padded to the frame count the same
    ``num_samples`` waveform cap would produce, so both modes share bucket
    geometry and downstream shapes.
    """
    bsz = len(items)
    feats_mode = "feats" in items[0]
    if any(("feats" in it) != feats_mode for it in items):
        raise ValueError(
            "collate: cannot mix precomputed-feature and raw-audio items "
            "in one batch (check that every manifest in the run uses the "
            "same payload mode)")
    tokens = np.zeros((bsz, num_tokens), dtype=np.int32)
    token_lens = np.zeros((bsz,), dtype=np.int32)
    texts = []
    if feats_mode:
        from metaasr_tpu.frontend.fbank import num_frames

        t_max = max(1, num_frames(num_samples))
        feat_dim = items[0]["feats"].shape[1]
        feats = np.zeros((bsz, t_max, feat_dim), dtype=np.float32)
        feat_lens = np.zeros((bsz,), dtype=np.int32)
        for i, it in enumerate(items):
            f = it["feats"][:t_max]
            feats[i, : len(f)] = f
            feat_lens[i] = len(f)
    else:
        audio = np.zeros((bsz, num_samples), dtype=np.float32)
        audio_lens = np.zeros((bsz,), dtype=np.int32)
        for i, it in enumerate(items):
            a = it["audio"][:num_samples]
            audio[i, : len(a)] = a
            audio_lens[i] = len(a)
    for i, it in enumerate(items):
        t = it["tokens"][:num_tokens]
        tokens[i, : len(t)] = t
        token_lens[i] = len(t)
        texts.append(it["text"])
    out = ({"feats": feats, "feat_lens": feat_lens} if feats_mode
           else {"audio": audio, "audio_lens": audio_lens})
    out.update({"tokens": tokens, "token_lens": token_lens, "texts": texts})
    if items and "cmvn_mean" in items[0]:  # speaker-level CMVN vectors
        out["cmvn_mean"] = np.stack([it["cmvn_mean"] for it in items])
        out["cmvn_std"] = np.stack([it["cmvn_std"] for it in items])
    return out


def item_samples(item: dict) -> int:
    """Waveform-sample length of a dataset item, either payload mode.
    Feature items map frames back to the sample count that produces
    exactly that frame count (exact inverse of fbank.num_frames)."""
    if "audio" in item:
        return len(item["audio"])
    return len(item["feats"]) * 160 + 240


class BucketBatcher:
    """Length-bucketed batch iterator over one or more accent datasets.

    Groups utterances whose (audio bucket, token bucket) match, so every
    emitted batch has one of a small set of static shapes. Used by the mono
    and multitask trainers (SURVEY.md section 3.4). For multitask, accents
    are sampled proportionally to their data size (BASELINE.json:8) simply by
    pooling all utterances.
    """

    def __init__(self, datasets, batch_size: int,
                 sample_buckets=DEFAULT_SAMPLE_BUCKETS,
                 token_buckets=DEFAULT_TOKEN_BUCKETS,
                 seed: int = 0, drop_last: bool = True, tokenizer=None):
        if not isinstance(datasets, (list, tuple)):
            datasets = [datasets]
        self.datasets = list(datasets)
        self.batch_size = batch_size
        self.sample_buckets = tuple(sample_buckets)
        self.token_buckets = tuple(token_buckets)
        self.seed = int(seed)
        self.drop_last = drop_last
        # Pool (dataset_idx, utt_idx, bucket_key), host-side metadata only.
        self.index = []
        for di, ds in enumerate(self.datasets):
            for ui, u in enumerate(ds.manifest.utts):
                sb = bucket_length(u.num_samples, self.sample_buckets)
                if tokenizer is not None:
                    # exact token length: the char-count heuristic under-
                    # estimates for phone vocabularies ('box' -> 4 phones >
                    # 3 chars) and collate would silently truncate labels
                    tok_len = len(tokenizer.encode(ds.transcript(ui)))
                else:
                    # over-approximate with transcript chars (chars >= tokens
                    # for char vocab)
                    tok_len = len(ds.transcript(ui))
                tb = bucket_length(max(tok_len, 1), self.token_buckets)
                self.index.append((di, ui, (sb, tb)))

    @property
    def batches_per_epoch(self) -> int:
        """Constant across epochs: bucket membership is fixed, only the
        order inside each bucket is permuted."""
        counts: dict[tuple, int] = {}
        for _, _, key in self.index:
            counts[key] = counts.get(key, 0) + 1
        full = sum(n // self.batch_size for n in counts.values())
        if self.drop_last:
            return full
        return full + sum(1 for n in counts.values() if n % self.batch_size)

    def _epoch_refs(self, epoch: int):
        """(key, refs) batch plan for one epoch — a pure function of
        (seed, epoch), so resume can replay the data order exactly
        (SURVEY.md section 5.3)."""
        order = np.random.default_rng(
            (self.seed, int(epoch))).permutation(len(self.index))
        pending: dict[tuple, list] = {}
        for oi in order:
            di, ui, key = self.index[oi]
            pending.setdefault(key, []).append((di, ui))
            if len(pending[key]) == self.batch_size:
                yield key, pending.pop(key)
        if not self.drop_last:
            for key, items in pending.items():
                if items:
                    yield key, items

    def __iter__(self):
        """One epoch (epoch 0). For training loops use ``iter_from``."""
        for key, refs in self._epoch_refs(0):
            yield self._emit(key, refs)

    def iter_from(self, global_step: int):
        """Infinite batch stream starting at batch index ``global_step``
        of the deterministic (seed, epoch)-indexed schedule. Skipped
        batches are planned but never loaded, so resume is O(1) per
        skipped batch."""
        bpe = self.batches_per_epoch
        if bpe == 0:
            raise ValueError("BucketBatcher: dataset yields zero batches "
                             "(batch_size too large for every bucket?)")
        epoch, skip = divmod(int(global_step), bpe)
        while True:
            for bi, (key, refs) in enumerate(self._epoch_refs(epoch)):
                if bi < skip:
                    continue
                yield self._emit(key, refs)
            epoch, skip = epoch + 1, 0

    def _emit(self, key, refs):
        sb, tb = key
        items = [self.datasets[di][ui] for di, ui in refs]
        return collate(items, sb, tb)


class TaskSampler:
    """Per-accent meta-task sampler (BASELINE.json:5).

    Each ``sample()`` draws ``tasks_per_batch`` accents and, per accent,
    disjoint support/query utterance sets, stacked to
    ``[M, k, ...]`` arrays at ONE static (S, U) shape so the jitted,
    task-vmapped meta-step never recompiles.
    """

    def __init__(self, datasets: dict, k_support: int, k_query: int,
                 tasks_per_batch: int, num_samples: int, num_tokens: int,
                 seed: int = 0, sample_buckets=(), token_buckets=()):
        self.datasets = dict(datasets)
        self.accents = sorted(self.datasets)
        if tasks_per_batch > len(self.accents):
            raise ValueError(
                f"tasks_per_batch={tasks_per_batch} > {len(self.accents)} accents")
        self.k_support = k_support
        self.k_query = k_query
        self.tasks_per_batch = tasks_per_batch
        self.num_samples = num_samples
        self.num_tokens = num_tokens
        self.seed = seed
        self._step = 0
        # Bucketed meta batches (SURVEY.md section 5.7 'a small set of
        # padded static shapes'): per step, the batch pads to the smallest
        # bucket that fits the LONGEST drawn utterance instead of the
        # global cap — with realistic length spreads most MXU work was
        # padding. Buckets are clamped to the caps; empty = always use the
        # caps (one static shape, the round-1 behavior).
        self.sample_buckets = tuple(
            sorted({min(int(s), num_samples) for s in sample_buckets}))
        self.token_buckets = tuple(
            sorted({min(int(u), num_tokens) for u in token_buckets}))
        # per-accent (num_samples, token_len) metadata, so the per-step
        # bucket choice never loads audio
        self._meta = {}
        for a, ds in self.datasets.items():
            ns = np.asarray([min(u.num_samples, num_samples)
                             for u in ds.manifest.utts], np.int64)
            tl = np.asarray(
                [min(len(ds.tokenizer.encode(ds.transcript(i))), num_tokens)
                 for i in range(len(ds))], np.int64)
            self._meta[a] = (ns, tl)

    def sample_indices(self, step: int):
        """Deterministic draw for ``step``: (accents [M], support_idx
        [M, ks], query_idx [M, kq]) — per-accent utterance indices. The
        batch is a pure function of (seed, step) (SURVEY.md section 5.3)."""
        rng = np.random.default_rng((self.seed, int(step)))
        accents = rng.choice(self.accents, size=self.tasks_per_batch,
                             replace=False)
        sup_idx, qry_idx = [], []
        for a in accents:
            n = len(self.datasets[a])
            idx = rng.choice(n, size=min(self.k_support + self.k_query, n),
                             replace=n < self.k_support + self.k_query)
            s_idx, q_idx = idx[: self.k_support], idx[self.k_support:]
            if len(q_idx) < self.k_query:
                q_idx = np.concatenate(
                    [q_idx, rng.choice(n, size=self.k_query - len(q_idx))])
            sup_idx.append(s_idx.astype(np.int32))
            qry_idx.append(q_idx.astype(np.int32))
        return list(accents), np.stack(sup_idx), np.stack(qry_idx)

    def sample(self, step: int | None = None,
               rows: slice | None = None) -> dict:
        """Meta-batch for ``step`` (stateless-deterministic, see
        sample_indices).

        ``rows``: restrict collation to a slice of the M task rows — on a
        multi-host pod each host collates only the rows it owns
        (parallel.distributed.host_local_slice) while the draw itself stays
        globally deterministic, so the assembled global batch is identical
        to the single-host one (SURVEY.md section 5.8).
        """
        if step is None:
            step = self._step
            self._step += 1
        accents, sup_idx, qry_idx = self.sample_indices(int(step))
        # per-step bucket shape from manifest metadata, decided over ALL
        # task rows (multi-host: every host computes the same shape even
        # though it collates only its own rows)
        num_samples, num_tokens = self.step_shape(accents, sup_idx, qry_idx)
        if rows is not None:
            accents = accents[rows]
            sup_idx, qry_idx = sup_idx[rows], qry_idx[rows]
        sup, qry = [], []
        for a, s_idx, q_idx in zip(accents, sup_idx, qry_idx):
            ds = self.datasets[a]
            sup.append(collate([ds[int(i)] for i in s_idx],
                               num_samples, num_tokens))
            qry.append(collate([ds[int(i)] for i in q_idx],
                               num_samples, num_tokens))
        return {
            "accents": accents,
            "support": _stack_batches(sup),
            "query": _stack_batches(qry),
        }

    def step_shape(self, accents, sup_idx, qry_idx) -> tuple[int, int]:
        """(num_samples, num_tokens) pad shape for this draw: the smallest
        configured bucket that fits the longest drawn utterance (the caps
        when no buckets are configured)."""
        if not self.sample_buckets and not self.token_buckets:
            return self.num_samples, self.num_tokens
        s_max, u_max = 1, 1
        for a, s_idx, q_idx in zip(accents, sup_idx, qry_idx):
            ns, tl = self._meta[a]
            idx = np.concatenate([s_idx, q_idx])
            s_max = max(s_max, int(ns[idx].max()))
            u_max = max(u_max, int(tl[idx].max()))
        s = (bucket_length(s_max, self.sample_buckets)
             if self.sample_buckets else self.num_samples)
        u = (bucket_length(u_max, self.token_buckets)
             if self.token_buckets else self.num_tokens)
        return s, u

    def set_step(self, step: int) -> None:
        self._step = int(step)

    def __iter__(self):
        while True:
            yield self.sample()


def support_query_split(ds, k_support: int, num_samples: int, num_tokens: int,
                        seed: int = 0) -> tuple[dict, list[int]]:
    """k-shot adaptation split for a held-out accent (SURVEY.md section 3.3):
    a fixed support batch + the remaining utterance indices as the test set."""
    rng = np.random.default_rng(seed)
    n = len(ds)
    idx = rng.permutation(n)
    s_idx = idx[:k_support]
    test_idx = [int(i) for i in idx[k_support:]]
    support = collate([ds[int(i)] for i in s_idx], num_samples, num_tokens)
    return support, test_idx


def build_resident_store(datasets: dict, num_samples: int, num_tokens: int):
    """Pack every utterance of every accent into one padded array set for
    DEVICE-RESIDENT training: the corpus is device_put once and each step
    transfers only [M, k] int32 index arrays; batch assembly is an
    on-device gather. (Per-step bulk host->device transfer is the dominant
    cost on hosts with slow interconnect, and XLA gathers are ~free.)

    Returns (store dict of [N, ...] numpy arrays, {accent: offset}).
    Global index of accent a's utterance i = offset[a] + i.
    """
    accents = sorted(datasets)
    offsets = {}
    items = []
    for a in accents:
        offsets[a] = len(items)
        ds = datasets[a]
        for i in range(len(ds)):
            items.append(ds[i])
    batch = collate(items, num_samples, num_tokens)
    store = {k: v for k, v in batch.items() if k != "texts"}
    return store, offsets


def resident_store_bytes(datasets: dict, num_samples: int,
                         num_tokens: int) -> int:
    n = sum(len(ds) for ds in datasets.values())
    return n * (num_samples * 4 + num_tokens * 4 + 8)


def _stack_batches(batches: list[dict]) -> dict:
    out = {}
    for k in batches[0]:
        if k == "texts":
            out[k] = [b[k] for b in batches]
        else:
            out[k] = np.stack([b[k] for b in batches])
    return out
