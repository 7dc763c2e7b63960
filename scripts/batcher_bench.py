#!/usr/bin/env python
"""DynamicBatcher under load on the real TPU (VERDICT r3 item 6).

Drives the serving front door (serve/batcher.py submit()->Future) against
an exported flagship bundle with Poisson open-loop arrivals at a sweep of
offered loads, and reports the performance envelope:

- p50/p95/p99 request latency (submit -> future resolved) vs offered load;
- achieved throughput vs offered (where the service saturates);
- batch-size distribution the grouping deadline produces at each load;
- deadline adherence: at near-zero load a request's latency must be
  ~ max_wait_ms + single-batch decode time (the batcher adds at most its
  grouping deadline);
- split-and-retry: a jointly-unfittable group (wide request + batch-1 wide
  bucket) must fail no future that fits alone.

Workload matches scripts/serve_bench.py: flagship d=256 12enc/6dec bf16,
feats-mode bundle, 4 s utterances (400 frames), beam 10, 48 forced decoder
steps — worst-case deterministic decode. Results go to docs/SERVE_BENCH.md.

Run: python scripts/batcher_bench.py [--loads 50,100,...] [--secs 15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

_p = os.environ.get("JAX_PLATFORMS")
if _p:
    # axon sitecustomize re-pins jax_platforms at interpreter start;
    # honor the caller's env (JAX_PLATFORMS=cpu --tiny must stay off-chip)
    jax.config.update("jax_platforms", _p)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

T_FEAT = 400
BSZ = 16
STEPS = 48


def _build_bundle(d: str, tiny: bool = False):
    from metaasr_tpu.config import Config
    from metaasr_tpu.data.tokenizer import CharTokenizer
    from metaasr_tpu.serve import ExportSpec, export_bundle
    from metaasr_tpu.train.task import ASRTask

    tok = CharTokenizer.ascii_default()
    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.vocab_size = tok.vocab_size
    if tiny:  # CPU smoke mode (--tiny): validates the harness, not perf
        cfg.model.d_model, cfg.model.num_heads = 32, 2
        cfg.model.d_ff = 64
        cfg.model.num_encoder_layers, cfg.model.num_decoder_layers = 2, 2
        cfg.model.dtype = "float32"
        cfg.train.beam_size = 3
        cfg.data.max_tokens = 8
        cfg.train.beam_min_len = 8
    else:
        cfg.model.d_model, cfg.model.num_heads = 256, 4
        cfg.model.d_ff = 2048
        cfg.model.num_encoder_layers, cfg.model.num_decoder_layers = 12, 6
        cfg.model.dtype = "bfloat16"
        cfg.data.max_tokens = STEPS
        cfg.train.beam_size = 10
        cfg.train.beam_min_len = STEPS
    cfg.model.dropout = 0.0
    task = ASRTask(cfg, tok.sos_eos_id)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    batch = {
        "feats": jnp.asarray(rng.standard_normal((2, T_FEAT, 80)),
                             jnp.float32),
        "feat_lens": jnp.full((2,), T_FEAT, jnp.int32),
        "tokens": jnp.asarray(rng.integers(1, tok.vocab_size - 1, (2, 8)),
                              jnp.int32),
        "token_lens": jnp.full((2,), 8, jnp.int32),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)
    # smaller buckets beside the full one: low-load groups shouldn't pay
    # the full B=16 decode (bucket choice is per-group)
    export_bundle(cfg, params, tok, d,
                  spec=ExportSpec(buckets=((1, T_FEAT), (4, T_FEAT),
                                           (BSZ, T_FEAT)),
                                  platforms=("cpu", "tpu"),
                                  from_feats=True))


def _load_leg(batcher, rate_hz: float, secs: float, rng):
    """Open-loop Poisson arrivals at rate_hz for secs; returns latencies
    (s), achieved rate, and the batch-size histogram delta."""
    feats = [np.asarray(rng.standard_normal((T_FEAT, 80)), np.float32)
             for _ in range(32)]
    lat: list[float] = []
    lat_lock = threading.Lock()
    inflight: list[threading.Thread] = []
    b0 = dict(batcher.stats)
    t_end = time.monotonic() + secs
    n_sent = 0
    t0 = time.monotonic()
    nxt = time.monotonic()
    while time.monotonic() < t_end:
        nxt += rng.exponential(1.0 / rate_hz)
        dt = nxt - time.monotonic()
        if dt > 0:
            time.sleep(dt)
        t_sub = time.perf_counter()
        fut = batcher.submit(feats[n_sent % len(feats)])
        n_sent += 1

        def wait(f=fut, t=t_sub):
            try:
                f.result(timeout=120)
            except Exception:
                return  # timed-out/failed request: counted via sent-completed
            with lat_lock:
                lat.append(time.perf_counter() - t)

        th = threading.Thread(target=wait, daemon=True)
        th.start()
        inflight.append(th)
    for th in inflight:
        th.join(timeout=180)
    wall = time.monotonic() - t0
    lat = sorted(lat)

    def pct(p):
        if not lat:
            return None
        return round(1e3 * lat[min(len(lat) - 1,
                                   int(p / 100 * len(lat)))], 1)

    return {
        "offered_utts_per_sec": rate_hz,
        "sent": n_sent, "completed": len(lat),
        "achieved_utts_per_sec": round(len(lat) / wall, 1),
        "p50_ms": pct(50), "p95_ms": pct(95), "p99_ms": pct(99),
        "batches": batcher.stats["batches"] - b0["batches"],
        "mean_group": round((batcher.stats["requests"] - b0["requests"])
                            / max(batcher.stats["batches"] - b0["batches"],
                                  1), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loads", default="25,50,100,150,200,250")
    ap.add_argument("--secs", type=float, default=15.0)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + short legs: CPU harness smoke")
    ap.add_argument("--max-inflight", type=int, default=2,
                    help="DynamicBatcher in-flight dispatch cap")
    args = ap.parse_args()
    if args.tiny:
        args.secs = min(args.secs, 3.0)
        args.loads = "20,60"

    from metaasr_tpu.serve import ServingDecoder
    from metaasr_tpu.serve.batcher import DynamicBatcher

    print(f"# device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        _build_bundle(d, tiny=args.tiny)
        dec = ServingDecoder(d)
        # warm every bucket (compile) before the timed legs
        for b, w in dec.buckets:
            dec.transcribe([np.zeros((T_FEAT, 80), np.float32)] * b)
        print("# buckets warmed", flush=True)

        # --- deadline adherence: one lone request at idle ---
        with DynamicBatcher(dec, max_wait_ms=args.max_wait_ms) as lone:
            lats = []
            for _ in range(10):
                t0 = time.perf_counter()
                lone.submit(np.asarray(rng.standard_normal((T_FEAT, 80)),
                                       np.float32)).result(timeout=60)
                lats.append(time.perf_counter() - t0)
            # single-request reference: direct B=1 decode, no batcher
            t0 = time.perf_counter()
            for _ in range(5):
                dec.transcribe([np.asarray(
                    rng.standard_normal((T_FEAT, 80)), np.float32)])
            direct_ms = (time.perf_counter() - t0) / 5 * 1e3
            idle = {"idle_p50_ms": round(sorted(lats)[5] * 1e3, 1),
                    "direct_b1_ms": round(direct_ms, 1),
                    "max_wait_ms": args.max_wait_ms}
            print(json.dumps({"deadline_adherence": idle}), flush=True)

        # --- load sweep ---
        rows = []
        batcher = DynamicBatcher(dec, max_wait_ms=args.max_wait_ms,
                                 max_inflight=args.max_inflight)
        try:
            for rate in (float(r) for r in args.loads.split(",")):
                row = _load_leg(batcher, rate, args.secs, rng)
                rows.append(row)
                print(json.dumps(row), flush=True)
        finally:
            batcher.close()

        sat = max(rows, key=lambda r: r["achieved_utts_per_sec"])
        print(json.dumps({"saturation_utts_per_sec":
                          sat["achieved_utts_per_sec"],
                          "at_offered": sat["offered_utts_per_sec"]}),
              flush=True)


if __name__ == "__main__":
    main()
