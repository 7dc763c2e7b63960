#!/usr/bin/env python
"""Batched on-device beam-search decode throughput (the README decode row).

Times `beam_search_transformer` on the flagship model (d=256, 12 enc /
6 dec, vocab 30) at 4 s-utterance shapes (T=400 fbank frames -> 99
encoder frames), beam 10, with `min_len=max_len=48` so the early-exit
while_loop runs ALL 48 decoder steps — deterministic worst-case timing
independent of what random-param hypotheses do (the early exit makes
real decodes faster, never slower).

Timing: median of 3 passes, completion forced by a host value read
(block_until_ready can return early on this attachment; see bench.py).

Two modes, NOT directly comparable (different readback):
- measure(): per-batch latency, reading back one scalar (the headline
  ms/batch numbers);
- measure_pipelined(): serving-mode throughput with FULL token readback
  per batch, all batches enqueued before any read — compare against its
  own sync-read baseline (also full readback), not against measure().

Run on the TPU machine: python scripts/decode_bench.py
Prints one JSON line per row; the B=16 measure() row is the README
latency number, the pipelined row the serving-throughput number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from metaasr_tpu.decode.beam_search import (BeamSearchConfig,
                                            beam_search_transformer)
from metaasr_tpu.models.transformer import TransformerASR

VOCAB = 30
EOS = VOCAB - 1
T_FEAT = 400          # 4 s at 10 ms hop
AUDIO_SEC = 4.0
STEPS = 48


def _setup(bsz: int, beam: int, lm_weight: float = 0.0,
           vocab: int = VOCAB, ctc_candidates: int = 0):
    """Shared flagship model/params/inputs/config for both modes (one
    source of truth so the table's rows benchmark the same model).
    ``vocab``/``ctc_candidates`` parameterize the BPE-scale rows (VERDICT
    r4 item 4): prefix-scan work scales with the CTC candidate count, so
    pruning is what makes large-vocab joint decoding viable."""
    rng = np.random.default_rng(0)
    eos = vocab - 1
    model = TransformerASR(vocab_size=vocab, d_model=256, num_heads=4,
                           d_ff=2048, num_encoder_layers=12,
                           num_decoder_layers=6, dropout=0.0,
                           dtype=jnp.bfloat16)
    feats = jnp.asarray(rng.standard_normal((bsz, T_FEAT, 80)), jnp.float32)
    lens = jnp.full((bsz,), T_FEAT, jnp.int32)
    toks = jnp.asarray(rng.integers(1, eos, (bsz, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens,
                        jnp.pad(toks, ((0, 0), (1, 0)), constant_values=eos),
                        jnp.full((bsz,), 9, jnp.int32))["params"]
    cfg = BeamSearchConfig(beam_size=beam, max_len=STEPS, min_len=STEPS,
                           ctc_weight=0.3, lm_weight=lm_weight,
                           ctc_candidates=ctc_candidates)

    lm_model = lm_params = None
    if lm_weight:
        # flagship-shaped fusion LM (scripts/train_lm.py defaults)
        from metaasr_tpu.models.lm import LSTMLM

        lm_model = LSTMLM(vocab_size=VOCAB, embed_dim=128, hidden=256,
                          layers=2)
        lm_params = lm_model.init(jax.random.PRNGKey(1),
                                  jnp.zeros((1, 2), jnp.int32))["params"]

    def raw(p, f, l):
        return beam_search_transformer(model, p, f, l, eos, cfg,
                                       lm_model=lm_model,
                                       lm_params=lm_params)

    run = jax.jit(raw)
    # compile + drain: host value read, NOT block_until_ready (which can
    # return early on this attachment and bleed warmup into the first pass)
    out = run(params, feats, lens)
    _ = int(np.asarray(out["lengths"])[0, 0])
    return run, params, feats, lens, raw


def measure(bsz: int, beam: int = 10, lm_weight: float = 0.0,
            vocab: int = VOCAB, ctc_candidates: int = 0) -> dict:
    run, params, feats, lens, _raw = _setup(bsz, beam, lm_weight, vocab,
                                            ctc_candidates)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params, feats, lens)
        _ = int(np.asarray(out["lengths"])[0, 0])
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    out = {"batch": bsz, "beam": beam, "decode_steps": STEPS,
           "ms_per_batch": round(dt * 1e3, 1),
           "utts_per_sec": round(bsz / dt, 1),
           "rtf": round(dt / (bsz * AUDIO_SEC), 5)}
    if lm_weight:
        out["lm_weight"] = lm_weight
    if vocab != VOCAB:
        out["vocab"] = vocab
    if ctc_candidates:
        out["ctc_candidates"] = ctc_candidates
    return out


def measure_pipelined(bsz: int, beam: int = 10, nbatches: int = 8) -> dict:
    """Serving-mode throughput: all batches enqueued before any host read
    (the trainer's decode() does the same) — overlaps batch i+1 compute
    with batch i readback. Reports BOTH the pipelined rate and its own
    sync-read baseline (same full-token readback) so the speedup is
    computable from this row alone."""
    run, params, feats0, lens, raw = _setup(bsz, beam)
    rng = np.random.default_rng(1)
    feats = [feats0] + [
        jnp.asarray(rng.standard_normal((bsz, T_FEAT, 80)), jnp.float32)
        for _ in range(nbatches - 1)]

    def read(out):
        _ = np.asarray(out["tokens"])
        _ = np.asarray(out["lengths"])

    def timed(pipelined: bool) -> float:
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            if pipelined:
                outs = [run(params, f, lens) for f in feats]  # all enqueued
                for out in outs:
                    read(out)
            else:
                for f in feats:
                    read(run(params, f, lens))
            dts.append(time.perf_counter() - t0)
        return sorted(dts)[1]

    dt_sync, dt_pipe = timed(False), timed(True)

    # packed readback (serve.pack_decode_outputs): fold tokens/lengths/
    # scores into ONE int32 array in-program so each batch costs a single
    # D2H fetch instead of three — the readback on this network-attached
    # chip is round-trip-bound, not byte-bound (docs/PROFILE.md)
    from metaasr_tpu.serve import pack_decode_outputs, unpack_decode_outputs

    run_packed = jax.jit(
        lambda p, f, l: pack_decode_outputs(raw(p, f, l)))
    _ = np.asarray(run_packed(params, feats[0], lens))  # compile + drain

    def timed_packed() -> float:
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run_packed(params, f, lens) for f in feats]
            for out in outs:
                unpack_decode_outputs(out)  # the one blocking fetch
            dts.append(time.perf_counter() - t0)
        return sorted(dts)[1]

    dt_packed = timed_packed()
    return {"batch": bsz, "beam": beam, "decode_steps": STEPS,
            "mode": "pipelined", "nbatches": nbatches,
            "ms_per_batch": round(dt_pipe / nbatches * 1e3, 1),
            "utts_per_sec": round(nbatches * bsz / dt_pipe, 1),
            "sync_read_utts_per_sec": round(nbatches * bsz / dt_sync, 1),
            "speedup_vs_sync_read": round(dt_sync / dt_pipe, 2),
            "packed_readback_utts_per_sec":
                round(nbatches * bsz / dt_packed, 1),
            "packed_vs_dict_readback": round(dt_pipe / dt_packed, 2),
            "rtf": round(dt_pipe / (nbatches * bsz * AUDIO_SEC), 5)}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--bpe-only", action="store_true",
                    help="run only the BPE-scale vocab rows")
    args = ap.parse_args()
    if not args.bpe_only:
        for bsz in (16, 64):
            print(json.dumps(measure(bsz)), flush=True)
        # fusion overhead: same search with a 2x256 LSTM LM in lockstep
        print(json.dumps(measure(16, lm_weight=0.3)), flush=True)
        # serving-mode pipelined throughput (full token readback/batch)
        print(json.dumps(measure_pipelined(16)), flush=True)
    # BPE-scale rows (VERDICT r4 item 4): vocab 512 joint decode with
    # candidate pruning (ESPnet-style) — the feature exists FOR this
    # regime. The full-vocab reference runs at B=4 with ctc_candidates=-1
    # (forced): full scoring materializes [B,K,V,T] prefix arrays, which
    # at B=16/V=563 allocated multi-GB and CRASHED the TPU worker (r5) —
    # the infeasibility IS the pruning win at serving batch sizes.
    for bsz, cand in ((16, 40), (16, 80), (4, 40), (4, -1)):
        print(json.dumps(measure(bsz, vocab=512, ctc_candidates=cand)),
              flush=True)


if __name__ == "__main__":
    main()
