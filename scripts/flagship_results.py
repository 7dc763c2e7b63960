#!/usr/bin/env python
"""Flagship-config quality table (completes the RESULTS.md headline row).

Trains the FLAGSHIP model (configs/config3_fomaml.yaml: d=256, 12 enc /
6 dec, bf16, SpecAugment) as FOMAML and as a multitask (no-meta) baseline
with the same step budget on the synthetic multi-accent set, then reports
for each: zero-shot WER (greedy + beam), 5-shot-adapted WER (greedy, two
adaptation seeds; beam), and — for FOMAML — the --avg-last 5 model-
averaging ablation (ESPnet-style, SURVEY.md section 2.1 #18).

Run: python scripts/flagship_results.py [--steps 1500] [--out /tmp/flagship.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "rbg")

from metaasr_tpu.config import load_config
from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.synthetic import generate_dataset
from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.train.checkpoint import average_checkpoints
from metaasr_tpu.train.meta_train import MetaASRTrainer
from metaasr_tpu.train.mono import MultitaskASRTrainer
from metaasr_tpu.train.task import ASRTask

HELDOUT = "tango"
CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "config3_fomaml.yaml")


def make_cfg(algo: str, steps: int, data_dir: str):
    cfg = load_config(CFG, {
        "meta.algo": algo,
        "data.data_dir": data_dir,
        "data.heldout_accents": HELDOUT,
        "data.max_frames": 400,
        "data.max_tokens": 32,
        "data.batch_size": 32,
        "train.max_steps": steps,
        "train.log_every": max(steps // 10, 1),
        "train.eval_every": 10 ** 9,
        # keep >=6 checkpoints around for the --avg-last 5 ablation
        "train.ckpt_every": max(steps // 8, 1),
        "train.keep_ckpts": 10,
        "train.beam_size": 5,
    })
    return cfg


def evaluate(meta_tr, state_params, ds, tag, results, avg_params=None):
    zs_idx = list(range(len(ds)))[8:]
    entry = {}
    entry["zero_shot_greedy"] = meta_tr.decode(state_params, ds, zs_idx,
                                               max_utts=64)
    entry["zero_shot_beam"] = meta_tr.decode(state_params, ds, zs_idx,
                                             max_utts=64, mode="beam")
    for seed in (0, 1):
        adapted, test_idx = meta_tr.meta_adapt(state_params, ds,
                                               adapt_steps=5, seed=seed)
        entry[f"adapt5_greedy_seed{seed}"] = meta_tr.decode(
            adapted, ds, test_idx, max_utts=64)
        if seed == 0:
            entry["adapt5_beam_seed0"] = meta_tr.decode(
                adapted, ds, test_idx, max_utts=64, mode="beam")
    if avg_params is not None:
        adapted, test_idx = meta_tr.meta_adapt(avg_params, ds,
                                               adapt_steps=5, seed=0)
        entry["adapt5_beam_avglast5"] = meta_tr.decode(
            adapted, ds, test_idx, max_utts=64, mode="beam")
    results[tag] = entry
    print(json.dumps({tag: entry}, indent=2), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--data-dir", default="/tmp/flagship_synth")
    ap.add_argument("--workdir", default="/tmp/flagship_runs")
    ap.add_argument("--out", default="/tmp/flagship_results.json")
    ap.add_argument("--utts-per-accent", type=int, default=192)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data_dir, f"{HELDOUT}.jsonl")):
        generate_dataset(args.data_dir, utts_per_accent=args.utts_per_accent,
                         words_per_utt=(2, 4), seed=0)
    tok = CharTokenizer.ascii_default()

    results = {}
    for algo in ("fomaml", "multi"):
        cfg = make_cfg(algo, args.steps, args.data_dir)
        cfg.model.vocab_size = tok.vocab_size
        dsets = load_accent_datasets(args.data_dir, tok)
        heldout = {HELDOUT: dsets.pop(HELDOUT)}
        task = ASRTask(cfg, tok.sos_eos_id)
        wd = os.path.join(args.workdir, algo)
        t0 = time.time()
        if algo == "multi":
            trainer = MultitaskASRTrainer(cfg, task, dsets, None, tok, wd)
            state = trainer.train(max_steps=args.steps)
            cfg2 = make_cfg("fomaml", args.steps, args.data_dir)
            cfg2.model.vocab_size = tok.vocab_size
            meta_tr = MetaASRTrainer(cfg2, task, dsets, heldout, tok,
                                     wd + "_eval")
            avg_params = None
        else:
            trainer = MetaASRTrainer(cfg, task, dsets, heldout, tok, wd)
            state = trainer.meta_train(max_steps=args.steps)
            meta_tr = trainer
            avg_params = average_checkpoints(trainer.ckpt,
                                             trainer.init_state(), last_n=5)
        train_s = round(time.time() - t0, 1)
        print(f"[{algo}] trained {args.steps} steps in {train_s}s", flush=True)
        evaluate(meta_tr, state.params, heldout[HELDOUT], algo, results,
                 avg_params=avg_params)
        results[algo]["train_seconds"] = train_s

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
