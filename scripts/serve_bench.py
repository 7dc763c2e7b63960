#!/usr/bin/env python
"""Serving throughput of the EXPORTED bundle on the real TPU.

Answers: does AOT serving (jax.export -> serialize -> ServingDecoder)
cost anything over the in-process jitted decode path? Mirrors
scripts/decode_bench.py's workload exactly — flagship model (d=256,
12 enc / 6 dec, bf16), 4 s utterances (400 fbank frames), beam 10,
min_len=max_len=48 so the early-exit while_loop runs all 48 decoder
steps (deterministic worst case) — but through a feats-mode bundle.

Rows:
- sync: ServingDecoder.transcribe per batch (full token readback);
- pipelined: ServingDecoder.transcribe_stream, every batch dispatched
  before any read (the serving mode).

Compare against decode_bench.py's serving rows (sync full-readback and
pipelined): matching numbers = the export boundary is free.

Run on the TPU machine: python scripts/serve_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

T_FEAT = 400
BSZ = 16
BATCHES = 8
STEPS = 48


def main():
    from metaasr_tpu.config import Config
    from metaasr_tpu.data.tokenizer import CharTokenizer
    from metaasr_tpu.serve import ExportSpec, ServingDecoder, export_bundle
    from metaasr_tpu.train.task import ASRTask

    print(f"device={jax.devices()[0]}")
    tok = CharTokenizer.ascii_default()
    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.vocab_size = tok.vocab_size
    cfg.model.d_model, cfg.model.num_heads = 256, 4
    cfg.model.d_ff = 2048
    cfg.model.num_encoder_layers, cfg.model.num_decoder_layers = 12, 6
    cfg.model.dtype = "bfloat16"
    cfg.model.dropout = 0.0
    cfg.data.max_tokens = STEPS
    cfg.train.beam_size = 10
    cfg.train.beam_min_len = STEPS     # all 48 steps: worst-case timing
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

    feats_batches = [
        [np.asarray(rng.standard_normal((T_FEAT, 80)), np.float32)
         for _ in range(BSZ)] for _ in range(BATCHES)]

    with tempfile.TemporaryDirectory() as d:
        export_bundle(cfg, params, tok, d,
                      spec=ExportSpec(buckets=((BSZ, T_FEAT),),
                                      platforms=("cpu", "tpu"),
                                      from_feats=True))
        dec = ServingDecoder(d)
        # warm up (compile) + drain via the full readback inside transcribe
        dec.transcribe(feats_batches[0])

        def median3(fn):
            vals = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                vals.append(time.perf_counter() - t0)
            return sorted(vals)[1]

        n_utts = BSZ * BATCHES

        def sync():
            for b in feats_batches:
                dec.transcribe(b)

        def pipelined():
            for _ in dec.transcribe_stream(iter(feats_batches)):
                pass

        t_sync = median3(sync)
        t_pipe = median3(pipelined)

        # bf16-weights bundle: same program shapes, weights stored AND fed
        # as bf16 (ExportSpec.weights_dtype) — halves the per-step weight
        # HBM reads on the weight-bound sequential decode
        with tempfile.TemporaryDirectory() as d16:
            export_bundle(cfg, params, tok, d16,
                          spec=ExportSpec(buckets=((BSZ, T_FEAT),),
                                          platforms=("cpu", "tpu"),
                                          from_feats=True,
                                          weights_dtype="bfloat16"))
            dec16 = ServingDecoder(d16)
            dec16.transcribe(feats_batches[0])

            def pipelined16():
                for _ in dec16.transcribe_stream(iter(feats_batches)):
                    pass

            t_pipe16 = median3(pipelined16)
            npz = os.path.getsize(os.path.join(d, "params.npz"))
            npz16 = os.path.getsize(os.path.join(d16, "params.npz"))

        print(json.dumps({
            "mode": "exported-bundle serving", "batch": BSZ,
            "batches": BATCHES, "beam": 10, "steps": STEPS,
            "sync_utts_per_sec": round(n_utts / t_sync, 1),
            "pipelined_utts_per_sec": round(n_utts / t_pipe, 1),
            "pipelined_speedup": round(t_sync / t_pipe, 2),
            "bf16_pipelined_utts_per_sec": round(n_utts / t_pipe16, 1),
            "bf16_vs_fp32_weights": round(t_pipe / t_pipe16, 2),
            "params_npz_mb": round(npz / 1e6, 1),
            "bf16_params_npz_mb": round(npz16 / 1e6, 1),
        }))


if __name__ == "__main__":
    main()
