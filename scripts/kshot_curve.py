#!/usr/bin/env python
"""k-shot adaptation curve on the held-out accent (sample-efficiency
evidence for the BASELINE.json:2 quality metric).

For each trained run (meta and/or multitask), report beam WER after
adapting on k ∈ {0, 1, 2, 5, 10, 20} support utterances (5 inner steps,
the reference's recipe — SURVEY.md section 3.3), averaged over
independent support draws. The meta-learned model should dominate the
multitask baseline at every k and approach its floor with fewer shots —
the curve shows WHERE the meta advantage lives, which the single k=5
headline row cannot.

Run (after flagship_results.py has left trained workdirs):
  python scripts/kshot_curve.py \
    --runs fomaml=/tmp/flagship_runs/hard_fomaml,multi=/tmp/flagship_runs/hard_multi \
    --out docs/kshot_curve.json

Each run's workdir must contain ckpts/ from a flagship-config train; the
run label decides how the checkpoint is restored (multi* -> multitask
trainer template, anything else -> meta trainer template). Meta-SGD runs
(learn_inner_lr) restore their wrapped {model, inner_lr} trees and adapt
with the learned rates automatically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

_p = os.environ.get("JAX_PLATFORMS")
if _p:
    jax.config.update("jax_platforms", _p)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "rbg")

from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.train.meta_train import MetaASRTrainer
from metaasr_tpu.train.mono import MultitaskASRTrainer
from metaasr_tpu.train.task import ASRTask

from flagship_results import CFG, HELDOUT, make_cfg  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", required=True,
                    help="comma list label=workdir; label starting with "
                         "'multi' restores a multitask checkpoint, "
                         "'@metasgd' in the label sets meta.learn_inner_lr, "
                         "'@bf16' sets meta.grad_dtype=bfloat16")
    ap.add_argument("--data-dir", default="/tmp/flagship_synth_hard")
    ap.add_argument("--ks", default="0,1,2,5,10,20")
    ap.add_argument("--draws", type=int, default=3)
    ap.add_argument("--adapt-steps", type=int, default=5)
    ap.add_argument("--max-utts", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0,
                    help="train.seed the run was trained with (template "
                         "construction only)")
    ap.add_argument("--out", default="/tmp/kshot_curve.json")
    ap.add_argument("--tiny", action="store_true",
                    help="debug: tiny model dims (CPU-runnable script "
                         "check; workdirs must hold tiny checkpoints)")
    args = ap.parse_args()

    tok = CharTokenizer.ascii_default()
    ks = [int(k) for k in args.ks.split(",")]
    results = {"ks": ks, "draws": args.draws,
               "adapt_steps": args.adapt_steps}

    for spec in args.runs.split(","):
        label, wd = spec.split("=", 1)
        grad_dtype = "bfloat16" if "@bf16" in label else "float32"
        cfg = make_cfg("fomaml", 1, args.data_dir, seed=args.seed,
                       grad_dtype=grad_dtype)
        cfg.model.vocab_size = tok.vocab_size
        if "@conformer" in label:
            cfg.model.encoder = "conformer"
        if "@metasgd" in label:
            cfg.meta.learn_inner_lr = True
        if args.tiny:
            cfg.model.d_model, cfg.model.num_heads = 32, 2
            cfg.model.d_ff = 64
            cfg.model.num_encoder_layers = 2
            cfg.model.num_decoder_layers = 2
            cfg.model.dtype = "float32"
            cfg.frontend.use_pallas = False
            cfg.meta.tasks_per_batch = 2
            cfg.data.max_frames = 200
        dsets = load_accent_datasets(args.data_dir, tok)
        heldout = {HELDOUT: dsets.pop(HELDOUT)}
        task = ASRTask(cfg, tok.sos_eos_id)
        if label.startswith("multi"):
            tr = MultitaskASRTrainer(cfg, task, dsets, None, tok, wd)
            state, step = tr.ckpt.restore(tr.init_state())
            meta_tr = MetaASRTrainer(cfg, task, dsets, heldout, tok,
                                     wd + "_kshot_eval")
        else:
            meta_tr = MetaASRTrainer(cfg, task, dsets, heldout, tok, wd)
            state, step = meta_tr.ckpt.restore(meta_tr.init_state())
        if step < 0:
            raise SystemExit(f"no checkpoint under {wd}/ckpts")
        print(f"[{label}] restored step {step}", flush=True)
        ds = heldout[HELDOUT]
        curve = {}
        for k in ks:
            if k == 0:
                idx = list(range(len(ds)))[8:]
                wer = meta_tr.decode(state.params, ds, idx,
                                     max_utts=args.max_utts,
                                     mode="beam")["wer"]
                curve["0"] = {"mean": round(wer, 4), "std": 0.0}
            else:
                wers = []
                for seed in range(args.draws):
                    adapted, test_idx = meta_tr.meta_adapt(
                        state.params, ds, adapt_steps=args.adapt_steps,
                        k_support=k, seed=seed)
                    wers.append(meta_tr.decode(
                        adapted, ds, test_idx, max_utts=args.max_utts,
                        mode="beam")["wer"])
                curve[str(k)] = {"mean": round(float(np.mean(wers)), 4),
                                 "std": round(float(np.std(wers)), 4),
                                 "draws": [round(w, 4) for w in wers]}
            print(f"[{label}] k={k}: {curve[str(k)]}", flush=True)
        results[label] = curve
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
