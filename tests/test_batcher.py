"""DynamicBatcher (serve/batcher.py): concurrent single-utterance
submissions are grouped into bucket dispatches whose per-utterance
results are IDENTICAL to a direct ServingDecoder.transcribe call —
grouping must be invisible to the caller. Also: deadline/max_batch
grouping behavior, the split-and-retry fallback for jointly-unfittable
groups, per-request width validation, and close() flush semantics."""

import threading

import numpy as np
import pytest

from metaasr_tpu.serve import DynamicBatcher, ExportSpec, ServingDecoder, export_bundle
from tests.test_export import _setup, _waves


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    cfg, task, tok, params, _, rng = _setup()
    out = str(tmp_path_factory.mktemp("bundle"))
    export_bundle(cfg, params, tok, out,
                  ExportSpec(buckets=((3, 8000), (1, 16000)),
                             platforms=("cpu",)))
    return ServingDecoder(out), rng


@pytest.fixture(scope="module")
def bundle_one_bucket(tmp_path_factory):
    """Single-bucket bundle: every dispatch — grouped or single — runs
    the SAME program, so per-utterance parity is exact by construction."""
    cfg, task, tok, params, _, rng = _setup()
    out = str(tmp_path_factory.mktemp("bundle1"))
    export_bundle(cfg, params, tok, out,
                  ExportSpec(buckets=((3, 8000),), platforms=("cpu",)))
    return ServingDecoder(out), rng


def test_batcher_matches_direct_transcribe(bundle_one_bucket):
    """8 concurrent submissions, results bit-equal (tokens) to the same
    decoder called directly — and actually grouped (fewer batches than
    requests once warm)."""
    decoder, rng = bundle_one_bucket
    waves = _waves(rng, lens=(8000, 5000, 3000, 6000, 8000, 2000, 5000,
                              7000))
    # reference at the same (3,8000) bucket the batcher's groups will use
    # (every wave fits it; batched-beam rows are composition-invariant —
    # the host-reference beam test pins that per-row independence)
    want = [r for i in range(0, len(waves), 3)
            for r in decoder.transcribe(waves[i: i + 3])]
    with DynamicBatcher(decoder, max_wait_ms=50.0) as b:
        futs = []
        threads = [threading.Thread(target=lambda w=w: futs.append(
            (w.tobytes(), b.submit(w)))) for w in waves]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        by_key = {k: f.result(timeout=120) for k, f in futs}
    for w, ref in zip(waves, want):
        got = by_key[w.tobytes()]
        assert got["text"] == ref["text"]
        np.testing.assert_allclose(got["score"], ref["score"], rtol=1e-5)
    assert b.stats["requests"] == len(waves)
    assert b.stats["batches"] < len(waves)  # grouping actually happened


def test_batcher_max_batch_and_immediate_dispatch(bundle):
    """max_wait=0 dispatches each drain immediately; sequential submits
    with the result awaited in between force batch-of-1 dispatches."""
    decoder, rng = bundle
    waves = _waves(rng, lens=(4000, 4100, 4200))
    with DynamicBatcher(decoder, max_wait_ms=0.0, max_batch=1) as b:
        for w in waves:
            r = b.submit(w).result(timeout=120)
            assert isinstance(r["text"], str)
    assert b.stats["batches"] == len(waves)


def test_batcher_split_retry_on_jointly_unfittable_group(bundle):
    """A wide request (only the batch-1 bucket fits it) grouped with
    narrow ones: the joint dispatch cannot fit any bucket, the batcher
    splits, and EVERY request still succeeds."""
    decoder, rng = bundle
    wide = _waves(rng, lens=(12000,))[0]     # needs (1, 16000)
    narrow = _waves(rng, lens=(5000, 6000))  # fit (3, 8000)
    with DynamicBatcher(decoder, max_wait_ms=200.0) as b:
        futs = b.submit_many([narrow[0], wide, narrow[1]])
        results = [f.result(timeout=240) for f in futs]
    for r, w in zip(results, [narrow[0], wide, narrow[1]]):
        assert r["text"] == decoder.transcribe([w])[0]["text"]


def test_batcher_too_wide_fails_only_that_future(bundle):
    decoder, rng = bundle
    ok, too_wide = _waves(rng, lens=(5000, 20001))
    with DynamicBatcher(decoder, max_wait_ms=20.0) as b:
        f_bad = b.submit(too_wide)
        f_ok = b.submit(ok)
        with pytest.raises(ValueError, match="exceeds every exported"):
            f_bad.result(timeout=120)
        assert f_ok.result(timeout=120)["text"] == \
            decoder.transcribe([ok])[0]["text"]


def test_batcher_close_flushes_and_rejects_new_work(bundle):
    decoder, rng = bundle
    w = _waves(rng, lens=(3000,))[0]
    b = DynamicBatcher(decoder, max_wait_ms=500.0)
    fut = b.submit(w)
    b.close()  # must flush the queued request, not drop it
    assert fut.result(timeout=120)["text"] == \
        decoder.transcribe([w])[0]["text"]
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(w)


class _StubDecoder:
    """Duck-typed decoder with a controllable service time: _dispatch
    returns a lazy token payload, _read blocks ``delay`` seconds
    (simulating device decode + readback)."""

    def __init__(self, delay=0.05, max_b=16):
        self.buckets = [(max_b, 8000)]
        self.dispatched = []   # group sizes, in order
        self._delay = delay

    def _dispatch(self, xs, params):
        self.dispatched.append(len(xs))
        return list(range(len(xs))), len(xs)

    def _read(self, out, n, nbest):
        import time

        time.sleep(self._delay)
        return [{"text": f"t{i}", "score": 0.0} for i in range(n)]


class _StagingStub(_StubDecoder):
    """Stub with the r5 staging split: records whether each dispatch used
    the pre-staged (async-upload) path or the plain one."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.staged_calls = 0
        self.staged_dispatches = 0
        self.plain_dispatches = 0

    def _stage(self, xs, params):
        self.staged_calls += 1
        return ("staged", list(range(len(xs))), len(xs))

    def _dispatch_staged(self, staged):
        tag, out, n = staged
        assert tag == "staged"
        self.staged_dispatches += 1
        self.dispatched.append(n)
        return out, n

    def _dispatch(self, xs, params):
        self.plain_dispatches += 1
        return super()._dispatch(xs, params)


def test_batcher_uses_prestaged_path_when_group_unchanged():
    """r5 async staging (VERDICT r4 item 3): with no backlog growth after
    the slot acquire, the batcher must dispatch the PRE-STAGED inputs
    (upload already in flight) rather than re-padding."""
    dec = _StagingStub(delay=0.005)
    with DynamicBatcher(dec, max_wait_ms=1.0, max_inflight=2) as b:
        for _ in range(4):
            assert b.submit(np.zeros(10, np.float32)).result(timeout=10)
    assert dec.staged_dispatches == 4
    assert dec.plain_dispatches == 0


def test_batcher_restages_when_topup_grows_group():
    """When the backlog drained after a slot frees grows the group, the
    stale staged buffer must NOT be dispatched — the bigger group goes
    through the plain (re-staging) path so no request is dropped.
    White-box (no live threads): the load-path race of a queue-drain
    growing the group is driven deterministically by parking a backlog
    item in _in before calling _dispatch_group."""
    import queue
    import threading
    from concurrent.futures import Future

    dec = _StagingStub(delay=0.0)
    b = DynamicBatcher.__new__(DynamicBatcher)  # no worker threads
    b.decoder = dec
    b.max_wait = 0.0
    b.max_batch = 16
    b.params = None
    b.nbest = 1
    b._inflight = threading.BoundedSemaphore(1)
    b._stop_seen = False
    b._max_width = 8000
    b._in = queue.Queue()
    b._pending = queue.Queue()
    b.stats = {"batches": 0, "requests": 0}
    b._closed = False

    # backlog present: the post-slot top-up grows the group 1 -> 2, so
    # the stale 1-item staged buffer must be discarded (plain re-stage)
    b._in.put((np.zeros(10, np.float32), Future()))
    b._dispatch_group([np.zeros(10, np.float32)], [Future()])
    assert dec.staged_calls == 1
    assert dec.plain_dispatches == 1 and dec.staged_dispatches == 0
    assert dec.dispatched[-1] == 2     # both requests in one dispatch

    # empty backlog: group unchanged -> the pre-staged buffer dispatches
    b._inflight.release()              # reader thread would do this
    b._dispatch_group([np.zeros(10, np.float32)], [Future()])
    assert dec.staged_dispatches == 1
    assert dec.plain_dispatches == 1   # unchanged


def test_batcher_backpressure_grows_groups_under_overload():
    """r4 load-bench finding: without an inflight cap the dispatcher
    races ahead with tiny groups while the device is the bottleneck
    (measured mean group 4.5 at 250 offered utts/s -> ~77 utts/s
    saturation). With backpressure, the backlog built while waiting for
    a device slot must drain into FULL groups."""
    dec = _StubDecoder(delay=0.05, max_b=16)
    with DynamicBatcher(dec, max_wait_ms=1.0, max_inflight=2) as b:
        futs = [b.submit(np.zeros(100, np.float32)) for _ in range(64)]
        for f in futs:
            assert f.result(timeout=30)["text"].startswith("t")
    assert sum(dec.dispatched) == 64
    # after the first couple of small warm-up groups, the backlog must
    # coalesce: at 50 ms service time every post-warmup group should hit
    # max_batch, and the dispatch count stays near the 64/16 ideal
    assert max(dec.dispatched) == 16
    assert len(dec.dispatched) <= 8, dec.dispatched


def test_batcher_inflight_slot_released_on_read_error():
    """A failing read must release its device slot or the batcher wedges
    after max_inflight failures."""

    class BadRead(_StubDecoder):
        def _read(self, out, n, nbest):
            raise RuntimeError("boom")

    dec = BadRead(delay=0.0, max_b=4)
    with DynamicBatcher(dec, max_wait_ms=0.0, max_inflight=1) as b:
        for _ in range(4):   # > max_inflight: would deadlock on a leak
            with pytest.raises(RuntimeError, match="boom"):
                b.submit(np.zeros(10, np.float32)).result(timeout=10)
