"""Dynamic request batching for the AOT serving bundle.

Production serving receives SINGLE utterances on independent timelines;
the exported program wants full, padded buckets (serve/export.py). This
module is the piece between them: a thread-safe ``submit(waveform) ->
Future`` front door that groups pending requests into one bucket
dispatch under a latency budget.

TPU-first design points:

- **Two-stage pipeline, one dispatcher.** All device dispatch happens on
  ONE thread (JAX dispatch is not free-threaded), and host readback
  happens on a second: while the reader blocks on batch i's tokens, the
  dispatcher has already enqueued batch i+1 — the same pipelined-dispatch
  pattern that measured 1.7-2.4x on the decode path (docs/PROFILE.md),
  here arising naturally from the thread split instead of an explicit
  two-pass loop.
- **Deadline grouping, not fixed ticks.** The dispatcher blocks until one
  request arrives, then keeps draining the queue until either
  ``max_batch`` requests are in hand or ``max_wait_ms`` has elapsed since
  the FIRST one — so an idle service adds at most max_wait_ms latency and
  a loaded service fills buckets (bigger batches = the MXU regime the
  profile tables favor).
- **Backpressure batching** (``max_inflight``, r4): device dispatches in
  flight are capped. When the device is the bottleneck the dispatcher
  blocks on a slot instead of racing ahead with tiny groups; the backlog
  that builds while it waits is drained into the group the moment a slot
  frees (up to max_batch). Measured effect on the r4 load bench: without
  the cap, groups plateaued at mean ~4.5 even at 250 offered utts/s and
  the service saturated at ~77 utts/s of 45-70 ms small-bucket decodes;
  with it, overload turns into full buckets (the regime where the B=16
  decode sustains ~320 utts/s packed). Two slots keep the
  dispatch/compute/readback pipeline full without unbounded queueing.
- **Bucket selection is the bundle's own** (`ServingDecoder._pick_bucket`
  via ``_dispatch``): a group is padded to the smallest exported
  (batch, width) bucket that fits, identical to a hand-built batch call.

The reference serves nothing (decode is an offline loop, SURVEY.md
section 3.3); this is rebuild-side scope per the production/serving
mandate, layered on ServingDecoder without touching its hot path.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Sequence

import numpy as np


class DynamicBatcher:
    """Group concurrent single-utterance requests into bucket dispatches.

    Args:
      decoder: a loaded ``ServingDecoder``.
      max_wait_ms: grouping deadline measured from the first queued
        request of a batch. 0 dispatches every drain immediately.
      max_batch: group-size cap; defaults to the largest exported
        bucket's batch dimension (a bigger group could never fit).
      params: optional hot-swapped parameter pytree, passed through to
        every dispatch (the adapted-weights serving pattern).
      nbest: n-best depth of the returned results.

    ``submit`` returns a ``concurrent.futures.Future`` resolving to the
    same per-utterance dict ``ServingDecoder.transcribe`` returns. A
    request wider than every exported bucket fails ONLY its own future.
    """

    _STOP = object()

    def __init__(self, decoder, max_wait_ms: float = 5.0,
                 max_batch: int | None = None, params: Any = None,
                 nbest: int = 1, max_inflight: int = 2):
        self.decoder = decoder
        self.max_wait = max_wait_ms / 1e3
        self.max_batch = max_batch or max(b for b, _ in decoder.buckets)
        self.params = params
        self.nbest = nbest
        self._inflight = threading.BoundedSemaphore(max_inflight)
        self._stop_seen = False
        self._max_width = max(w for _, w in decoder.buckets)
        self._in: queue.Queue = queue.Queue()
        self._pending: queue.Queue = queue.Queue()
        self.stats = {"batches": 0, "requests": 0}
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            name="batcher-dispatch",
                                            daemon=True)
        self._reader = threading.Thread(target=self._read_loop,
                                        name="batcher-read", daemon=True)
        self._closed = False
        self._dispatcher.start()
        self._reader.start()

    # ---------- front door ----------

    def submit(self, x: np.ndarray) -> Future:
        if self._closed:
            raise RuntimeError("batcher is closed")
        fut: Future = Future()
        x = np.asarray(x, np.float32)
        if int(np.shape(x)[0]) > self._max_width:
            fut.set_exception(ValueError(
                f"request width {np.shape(x)[0]} exceeds every exported "
                f"bucket {self.decoder.buckets}"))
            return fut
        self._in.put((x, fut))
        return fut

    def submit_many(self, xs: Sequence[np.ndarray]) -> list[Future]:
        return [self.submit(x) for x in xs]

    def close(self):
        """Stop accepting work, flush everything queued, join threads."""
        if self._closed:
            return
        self._closed = True
        self._in.put(self._STOP)
        self._dispatcher.join()
        self._reader.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------- worker threads ----------

    def _collect(self, first):
        """Drain the queue into a group: first request + everything that
        arrives before the deadline, capped at max_batch. Returns (group,
        saw_stop)."""
        group = [first]
        deadline = time.monotonic() + self.max_wait
        while len(group) < self.max_batch:
            timeout = deadline - time.monotonic()
            try:
                item = self._in.get(block=timeout > 0,
                                    timeout=max(timeout, 0))
            except queue.Empty:
                return group, False
            if item is self._STOP:
                return group, True
            group.append(item)
        return group, False

    def _dispatch_loop(self):
        while not self._stop_seen:
            item = self._in.get()
            if item is self._STOP:
                break
            group, saw_stop = self._collect(item)
            self._stop_seen = self._stop_seen or saw_stop
            self._dispatch_group([x for x, _ in group],
                                 [f for _, f in group])
        self._pending.put(self._STOP)

    def _top_up(self, xs, futs):
        """Drain the backlog built while waiting for an inflight slot
        (non-blocking) into this group, up to max_batch — the
        backpressure-batching half of the design note above."""
        while len(xs) < self.max_batch:
            try:
                item = self._in.get_nowait()
            except queue.Empty:
                break
            if item is self._STOP:
                self._stop_seen = True
                break
            xs.append(item[0])
            futs.append(item[1])

    def _dispatch_group(self, xs, futs, top_up: bool = True):
        # Async input staging (r5, VERDICT r4 item 3): pad + START the
        # group's feature upload BEFORE blocking on a device slot, so the
        # H2D transfer of group i+1 overlaps group i's compute instead of
        # riding the tunnel synchronously inside the dispatch. If the
        # backlog drained after the slot freed grows the group, it is
        # re-staged (only happens under overload, where the fuller bucket
        # is worth the second upload).
        stage = getattr(self.decoder, "_stage", None)
        staged = None
        if stage is not None:
            try:
                staged = stage(list(xs), self.params)
            except Exception:
                staged = None  # bucket errors re-raise in _dispatch below
        self._inflight.acquire()   # backpressure: wait for a device slot
        n_staged = len(xs)
        if top_up:
            self._top_up(xs, futs)
        try:
            # enqueues on the device without synchronizing; the reader
            # thread owns the blocking host read (and releases the slot)
            if staged is not None and len(xs) == n_staged:
                out, n = self.decoder._dispatch_staged(staged)
            else:
                out, n = self.decoder._dispatch(xs, self.params)
        except ValueError as e:
            self._inflight.release()
            # a group can be jointly unfittable while every member fits
            # alone (e.g. the wide bucket is batch-1 and three requests
            # arrived, one of them wide): split and serve singly so only
            # genuinely unservable requests fail
            if len(xs) > 1:
                for x, f in zip(xs, futs):
                    self._dispatch_group([x], [f], top_up=False)
                return
            futs[0].set_exception(e)
            return
        except Exception as e:
            self._inflight.release()
            for f in futs:
                f.set_exception(e)
            return
        self.stats["batches"] += 1
        self.stats["requests"] += len(futs)
        self._pending.put((out, n, futs))

    def _read_loop(self):
        while True:
            item = self._pending.get()
            if item is self._STOP:
                return
            out, n, futs = item
            try:
                results = self.decoder._read(out, n, self.nbest)
            except Exception as e:
                for f in futs:
                    f.set_exception(e)
                self._inflight.release()
                continue
            for f, r in zip(futs, results):
                f.set_result(r)
            self._inflight.release()
