"""Train a token-level LSTM LM on the training accents' transcripts and
save it as an npz checkpoint for shallow fusion at beam decode.

The reference family's ESPnet-lineage recipes train an external RNNLM on
the training text and fuse it into the joint CTC-attention beam with a
scalar weight (SURVEY.md section 2.1 #11 score shaping). Usage:

    python scripts/train_lm.py --config configs/config3_fomaml.yaml \
        --out lm.npz [--steps 500] [--hidden 256] [--layers 2] \
        [-o key=value ...]

then decode with it:

    python main.py --config ... --mode test \
        -o train.lm_ckpt=lm.npz -o train.lm_weight=0.3

Held-out accents are EXCLUDED from the LM corpus (their text is the
evaluation target); the tokenizer is the same one the ASR model uses
(cli.build_tokenizer), so the LM scores exactly the hypothesis space the
beam explores.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metaasr_tpu.cli import _parse_override, build_tokenizer  # noqa: E402
from metaasr_tpu.config import load_config  # noqa: E402
from metaasr_tpu.data.dataset import Manifest, discover_accents  # noqa: E402
from metaasr_tpu.models.lm import train_char_lm  # noqa: E402
from metaasr_tpu.train.checkpoint import save_params_npz  # noqa: E402


def lm_corpus(data_dir: str, heldout: tuple) -> list[str]:
    texts = []
    for accent in discover_accents(data_dir):
        if accent in set(heldout):
            continue
        man = Manifest.load(os.path.join(data_dir, f"{accent}.jsonl"))
        texts.extend(u.text for u in man.utts)
    return texts


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", default="", help="output npz path "
                    "(default <data_dir>/lm.npz)")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--embed-dim", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--override", action="append", default=[])
    args = ap.parse_args(argv)

    cfg = load_config(args.config,
                      dict(_parse_override(kv) for kv in args.override))
    tok = build_tokenizer(cfg)
    texts = lm_corpus(cfg.data.data_dir, cfg.data.heldout_accents)
    if not texts:
        raise SystemExit(f"no transcripts under {cfg.data.data_dir}")
    print(f"LM corpus: {len(texts)} transcripts, vocab {tok.vocab_size}")

    _, params, nll = train_char_lm(
        texts, tok, embed_dim=args.embed_dim, hidden=args.hidden,
        layers=args.layers, steps=args.steps, batch_size=args.batch_size,
        lr=args.lr, seed=args.seed, log_every=max(1, args.steps // 10))

    out = args.out or os.path.join(cfg.data.data_dir, "lm.npz")
    save_params_npz(out, params)
    print(f"saved LM to {out} (final nll {nll:.4f}); decode with "
          f"-o train.lm_ckpt={out} -o train.lm_weight=0.3")
    return out


if __name__ == "__main__":
    main()
