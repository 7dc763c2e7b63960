"""Shallow-fusion quality sweep on the HARD synthetic benchmark.

Question: does an external LSTM LM (trained on the training accents'
transcripts, held-out accent excluded) improve held-out-accent WER when
fused into the joint CTC-attention beam — and at what weight? The
reference family's recipes treat the RNNLM weight as a tuned decode
hyperparameter; this script produces the tuning curve on our benchmark.

Design: the model with real WER headroom on the hard regime is the
multitask baseline (5-shot beam ~0.12; meta models sit near the floor
where fusion has nothing to fix), so the sweep trains ONE multitask
flagship and decodes it under each lm_weight. Paired draws: adaptation
is LM-independent, so each support seed adapts once and every weight
decodes the same adapted params on the same test split — differences
are pure decode-time LM effect.

Usage (real chip, ~10 min total after data exists):
    python scripts/fusion_eval.py [--steps 1500] [--weights 0,0.1,0.2,0.3,0.5]
        [--algo multi] [--out docs/fusion_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from metaasr_tpu.data.dataset import Manifest, discover_accents  # noqa: E402
from metaasr_tpu.data.dataset import load_accent_datasets  # noqa: E402
from metaasr_tpu.data.synthetic import generate_dataset  # noqa: E402
from metaasr_tpu.data.tokenizer import CharTokenizer  # noqa: E402
from metaasr_tpu.models.lm import train_char_lm  # noqa: E402
from metaasr_tpu.train.checkpoint import save_params_npz  # noqa: E402
from metaasr_tpu.train.meta_train import MetaASRTrainer  # noqa: E402
from metaasr_tpu.train.mono import MultitaskASRTrainer  # noqa: E402
from metaasr_tpu.train.task import ASRTask  # noqa: E402

from flagship_results import ACCENTS_HARD, HELDOUT, make_cfg  # noqa: E402

ADAPT_SEEDS = (0, 1, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--data-dir", default="/tmp/flagship_synth_hard")
    ap.add_argument("--workdir", default="/tmp/fusion_runs")
    ap.add_argument("--out", default=None,
                    help="default /tmp/fusion_sweep_<algo>_s<seed>.json "
                    "(seed-suffixed so sweeps don't clobber each other)")
    ap.add_argument("--algo", default="multi", choices=("multi", "fomaml",
                                                        "reptile"))
    ap.add_argument("--weights", default="0,0.1,0.2,0.3,0.5")
    ap.add_argument("--lm-steps", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0,
                    help="training+data seed (seed-stability of the gain)")
    ap.add_argument("--tiny", action="store_true",
                    help="debug: tiny dims (CPU-runnable script check)")
    args = ap.parse_args()
    if args.out is None:
        args.out = f"/tmp/fusion_sweep_{args.algo}_s{args.seed}.json"

    if not os.path.exists(os.path.join(args.data_dir, f"{HELDOUT}.jsonl")):
        generate_dataset(args.data_dir, accents=ACCENTS_HARD,
                         utts_per_accent=192, words_per_utt=(3, 6), seed=0,
                         profile="hard")
    tok = CharTokenizer.ascii_default()
    weights = [float(w) for w in args.weights.split(",")]

    # 1) LM on the training accents' transcripts (held-out excluded)
    texts = []
    for accent in discover_accents(args.data_dir):
        if accent == HELDOUT:
            continue
        man = Manifest.load(os.path.join(args.data_dir, f"{accent}.jsonl"))
        texts.extend(u.text for u in man.utts)
    t0 = time.time()
    _, lm_params, lm_nll = train_char_lm(
        texts, tok, embed_dim=64 if not args.tiny else 16,
        hidden=192 if not args.tiny else 16, layers=2 if not args.tiny else 1,
        steps=args.lm_steps, batch_size=64, log_every=args.lm_steps // 5)
    lm_path = os.path.join(args.data_dir, "fusion_lm.npz")
    save_params_npz(lm_path, lm_params)
    print(f"LM: {len(texts)} transcripts, final nll {lm_nll:.3f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # 2) one flagship train of the target algo
    cfg = make_cfg(args.algo, args.steps, args.data_dir, seed=args.seed)
    cfg.model.vocab_size = tok.vocab_size
    if args.tiny:
        cfg.model.d_model, cfg.model.num_heads = 32, 2
        cfg.model.d_ff = 64
        cfg.model.num_encoder_layers = 2
        cfg.model.num_decoder_layers = 2
        cfg.frontend.use_pallas = False
        cfg.meta.tasks_per_batch = 2
        cfg.data.max_frames = 200
    dsets = load_accent_datasets(args.data_dir, tok)
    heldout = {HELDOUT: dsets.pop(HELDOUT)}
    task = ASRTask(cfg, tok.sos_eos_id)
    wd = os.path.join(args.workdir, f"hard_{args.algo}_s{args.seed}")
    t0 = time.time()
    if args.algo == "multi":
        trainer = MultitaskASRTrainer(cfg, task, dsets, None, tok, wd)
        state = trainer.train(max_steps=args.steps)
        cfg2 = make_cfg("fomaml", args.steps, args.data_dir, seed=args.seed)
        cfg2.model.vocab_size = tok.vocab_size
        if args.tiny:
            cfg2.model = cfg.model
            cfg2.meta.tasks_per_batch = 2
            cfg2.data.max_frames = 200
            cfg2.frontend.use_pallas = False
        meta_tr = MetaASRTrainer(cfg2, task, dsets, heldout, tok, wd + "_eval")
    else:
        trainer = MetaASRTrainer(cfg, task, dsets, heldout, tok, wd)
        state = trainer.meta_train(max_steps=args.steps)
        meta_tr = trainer
    print(f"[{args.algo}] trained {args.steps} steps in "
          f"{time.time() - t0:.0f}s", flush=True)

    # 3) paired sweep: adapt once per seed, decode under every weight
    ds = heldout[HELDOUT]
    meta_tr.cfg.train.lm_ckpt = lm_path
    zs_idx = list(range(len(ds)))
    zs_idx = zs_idx[8:] if len(zs_idx) > 8 else zs_idx
    results = {"algo": args.algo, "steps": args.steps, "seed": args.seed,
               "lm_nll": lm_nll,
               "weights": {}}
    adapted_by_seed = {}
    for seed in ADAPT_SEEDS:
        adapted_by_seed[seed] = meta_tr.meta_adapt(state.params, ds,
                                                   adapt_steps=5, seed=seed)
    for w in weights:
        meta_tr.cfg.train.lm_weight = w
        zs = meta_tr.decode(state.params, ds, zs_idx, max_utts=64,
                            mode="beam")
        draws = []
        for seed in ADAPT_SEEDS:
            adapted, test_idx = adapted_by_seed[seed]
            draws.append(meta_tr.decode(adapted, ds, test_idx, max_utts=64,
                                        mode="beam")["wer"])
        results["weights"][str(w)] = {
            "zero_shot_beam_wer": round(zs["wer"], 4),
            "adapt5_beam": {"mean": round(float(np.mean(draws)), 4),
                            "std": round(float(np.std(draws)), 4)},
            "adapt5_beam_draws": [round(d, 4) for d in draws],
        }
        print(json.dumps({str(w): results["weights"][str(w)]}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
