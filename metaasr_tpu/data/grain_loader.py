"""grain-backed data pipeline (SURVEY.md section 5.3: orbax checkpointing
plus deterministic iterator state => preemption-safe resume; multi-host
data loading for pod runs).

This wraps an AccentDataset (or several) in a ``grain.MapDataset`` with
worker-parallel loading and a checkpointable iterator. The in-repo
BucketBatcher stays the simple default; this loader is the scale path.
"""

from __future__ import annotations

from metaasr_tpu.data.sampler import collate

try:
    import grain.python as grain

    HAVE_GRAIN = True
except Exception:  # pragma: no cover
    grain = None
    HAVE_GRAIN = False


class _UttSource:
    """grain RandomAccessDataSource over (dataset_idx, utt_idx) pairs."""

    def __init__(self, datasets):
        self.datasets = datasets
        self.index = [(di, ui) for di, ds in enumerate(datasets)
                      for ui in range(len(ds))]

    def __len__(self):
        return len(self.index)

    def __getitem__(self, i):
        di, ui = self.index[i]
        return self.datasets[di][ui]


def make_grain_loader(datasets, batch_size: int, num_samples: int,
                      num_tokens: int, seed: int = 0, num_workers: int = 0,
                      num_epochs: int | None = None):
    """Returns a checkpointable grain iterator of collated batches.

    Iterator state: ``it.get_state()`` / ``it.set_state(state)`` — store it
    next to the orbax train state for exact resume.
    """
    if not HAVE_GRAIN:
        raise ImportError("grain is not available")
    if not isinstance(datasets, (list, tuple)):
        datasets = [datasets]
    source = _UttSource(list(datasets))
    ds = grain.MapDataset.source(source)
    ds = ds.shuffle(seed=seed)
    if num_epochs is None:
        ds = ds.repeat()
    elif num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.batch(batch_size,
                  batch_fn=lambda items: collate(list(items), num_samples,
                                                 num_tokens))
    it = ds.to_iter_dataset()
    if num_workers:
        it = it.mp_prefetch(grain.multiprocessing.MultiprocessingOptions(
            num_workers=num_workers))
    return iter(it)


def save_iterator_state(it) -> bytes | None:
    get = getattr(it, "get_state", None)
    return get() if get else None


def restore_iterator_state(it, state) -> None:
    if state is not None and hasattr(it, "set_state"):
        it.set_state(state)
