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
    """Pad a list of dataset items to [B, num_samples] / [B, num_tokens]."""
    bsz = len(items)
    audio = np.zeros((bsz, num_samples), dtype=np.float32)
    audio_lens = np.zeros((bsz,), dtype=np.int32)
    tokens = np.zeros((bsz, num_tokens), dtype=np.int32)
    token_lens = np.zeros((bsz,), dtype=np.int32)
    texts = []
    for i, it in enumerate(items):
        a = it["audio"][:num_samples]
        t = it["tokens"][:num_tokens]
        audio[i, : len(a)] = a
        audio_lens[i] = len(a)
        tokens[i, : len(t)] = t
        token_lens[i] = len(t)
        texts.append(it["text"])
    out = {
        "audio": audio,
        "audio_lens": audio_lens,
        "tokens": tokens,
        "token_lens": token_lens,
        "texts": texts,
    }
    if items and "cmvn_mean" in items[0]:  # speaker-level CMVN vectors
        out["cmvn_mean"] = np.stack([it["cmvn_mean"] for it in items])
        out["cmvn_std"] = np.stack([it["cmvn_std"] for it in items])
    return out


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
                 seed: int = 0, drop_last: bool = True):
        if not isinstance(datasets, (list, tuple)):
            datasets = [datasets]
        self.datasets = list(datasets)
        self.batch_size = batch_size
        self.sample_buckets = tuple(sample_buckets)
        self.token_buckets = tuple(token_buckets)
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        # Pool (dataset_idx, utt_idx, bucket_key), host-side metadata only.
        self.index = []
        for di, ds in enumerate(self.datasets):
            for ui, u in enumerate(ds.manifest.utts):
                sb = bucket_length(u.num_samples, self.sample_buckets)
                # token length is only known post-tokenize; over-approximate
                # with the transcript length (chars >= tokens).
                tb = bucket_length(max(len(ds.transcript(ui)), 1), self.token_buckets)
                self.index.append((di, ui, (sb, tb)))

    def __iter__(self):
        order = self.rng.permutation(len(self.index))
        pending: dict[tuple, list] = {}
        for oi in order:
            di, ui, key = self.index[oi]
            pending.setdefault(key, []).append((di, ui))
            if len(pending[key]) == self.batch_size:
                yield self._emit(key, pending.pop(key))
        if not self.drop_last:
            for key, items in pending.items():
                if items:
                    yield self._emit(key, items)

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
                 seed: int = 0):
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

    def sample(self, step: int | None = None) -> dict:
        """Meta-batch for ``step`` (stateless-deterministic, see
        sample_indices)."""
        if step is None:
            step = self._step
            self._step += 1
        accents, sup_idx, qry_idx = self.sample_indices(int(step))
        sup, qry = [], []
        for a, s_idx, q_idx in zip(accents, sup_idx, qry_idx):
            ds = self.datasets[a]
            sup.append(collate([ds[int(i)] for i in s_idx],
                               self.num_samples, self.num_tokens))
            qry.append(collate([ds[int(i)] for i in q_idx],
                               self.num_samples, self.num_tokens))
        return {
            "accents": accents,
            "support": _stack_batches(sup),
            "query": _stack_batches(qry),
        }

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
