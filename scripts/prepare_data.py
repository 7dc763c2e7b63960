#!/usr/bin/env python
"""Data preparation (R: data/ prep scripts, SURVEY.md section 2.1 #20,
section 3.5).

Subcommands:

  synthetic   — generate the synthetic multi-accent dataset (offline dev;
                no network in this environment, SURVEY.md section 7)
      python scripts/prepare_data.py synthetic --out data/synthetic \
          --utts-per-accent 64

  commonvoice — Common Voice-style prep: read a TSV (columns: path,
                sentence, accent[, client_id]), filter rows by accent
                label, decode+resample audio to 16 kHz mono WAV, write
                per-accent JSONL manifests
      python scripts/prepare_data.py commonvoice --tsv validated.tsv \
          --clips-dir clips/ --out data/cv --accents us england india

  features    — offline feature extraction: precompute log-mel fbank to
                .npy per utterance and rewrite manifests to point at them
                (parity with the reference's offline Kaldi extraction;
                the on-device fused front-end is the default path)
      python scripts/prepare_data.py features --data-dir data/cv

  vocab       — build a char or phone vocab JSON from manifests
      python scripts/prepare_data.py vocab --data-dir data/cv --type char
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_synthetic(args):
    from metaasr_tpu.data.synthetic import ACCENTS, generate_dataset

    accents = args.accents or list(ACCENTS)
    generate_dataset(args.out, accents=accents,
                     utts_per_accent=args.utts_per_accent, seed=args.seed)
    print(f"wrote {len(accents)} accent manifests under {args.out}")


def cmd_commonvoice(args):
    from metaasr_tpu.data.audio_io import load_wav, write_wav

    os.makedirs(args.out, exist_ok=True)
    wanted = {a.lower() for a in args.accents} if args.accents else None
    rows_by_accent: dict[str, list] = {}
    with open(args.tsv, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            accent = (row.get("accent") or row.get("accents") or "").strip().lower()
            if not accent or (wanted and accent not in wanted):
                continue
            rows_by_accent.setdefault(accent, []).append(row)
    for accent, rows in sorted(rows_by_accent.items()):
        wav_dir = os.path.join(args.out, "wav", accent)
        os.makedirs(wav_dir, exist_ok=True)
        lines = []
        for i, row in enumerate(rows[: args.max_per_accent or None]):
            src = os.path.join(args.clips_dir, row["path"])
            if not os.path.exists(src):
                continue
            try:
                audio = load_wav(src, args.sample_rate)
            except Exception:
                continue
            if not (args.min_sec <= len(audio) / args.sample_rate <= args.max_sec):
                continue
            utt_id = f"{accent}_{i:06d}"
            rel = os.path.join("wav", accent, f"{utt_id}.wav")
            write_wav(os.path.join(args.out, rel), audio, args.sample_rate)
            text = " ".join(row.get("sentence", "").lower().split())
            lines.append(json.dumps({
                "id": utt_id, "wav": rel, "text": text,
                "phones": "", "num_samples": int(len(audio)),
                "speaker": row.get("client_id", ""),
            }))
        if lines:
            with open(os.path.join(args.out, f"{accent}.jsonl"), "w") as f:
                f.write("\n".join(lines) + "\n")
            print(f"{accent}: {len(lines)} utts")


def cmd_features(args):
    """Precompute fbank features (+ accumulate global CMVN stats)."""
    import jax.numpy as jnp

    from metaasr_tpu.data.dataset import Manifest, discover_accents
    from metaasr_tpu.data.audio_io import load_wav
    from metaasr_tpu.frontend.fbank import log_mel_fbank

    total_sum = np.zeros(80)
    total_sq = np.zeros(80)
    total_n = 0
    for accent in discover_accents(args.data_dir):
        man = Manifest.load(os.path.join(args.data_dir, f"{accent}.jsonl"))
        feat_dir = os.path.join(args.data_dir, "feats", accent)
        os.makedirs(feat_dir, exist_ok=True)
        lines = []
        for u in man.utts:
            audio = load_wav(os.path.join(man.root, u.wav), args.sample_rate)
            # pad to a 1 s bucket: log_mel_fbank jit-compiles per input
            # LENGTH, so raw ragged lengths would recompile per utterance
            pad = -len(audio) % args.sample_rate
            audio_p = np.pad(audio, (0, pad))
            feats, flens = log_mel_fbank(
                jnp.asarray(audio_p)[None], jnp.asarray([len(audio)]),
                cmvn="none")
            arr = np.asarray(feats[0, : int(flens[0])], dtype=np.float32)
            rel = os.path.join("feats", accent, f"{u.utt_id}.npy")
            np.save(os.path.join(args.data_dir, rel), arr)
            total_sum += arr.sum(0)
            total_sq += (arr ** 2).sum(0)
            total_n += arr.shape[0]
            lines.append(json.dumps({
                "id": u.utt_id, "wav": u.wav, "feats": rel, "text": u.text,
                "phones": u.phones, "num_samples": u.num_samples,
            }))
        with open(os.path.join(args.data_dir, f"{accent}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{accent}: features written")
    stats = {"mean": (total_sum / max(total_n, 1)).tolist(),
             "var": (total_sq / max(total_n, 1)
                     - (total_sum / max(total_n, 1)) ** 2).tolist(),
             "frames": int(total_n)}
    with open(os.path.join(args.data_dir, "cmvn_stats.json"), "w") as f:
        json.dump(stats, f)
    print("global CMVN stats written")


def cmd_speaker_cmvn(args):
    """Per-speaker fbank mean/var stats -> speaker_cmvn.json
    (SURVEY.md section 2.1 #16 per-speaker CMVN)."""
    import jax.numpy as jnp

    from metaasr_tpu.data.dataset import Manifest, discover_accents
    from metaasr_tpu.data.audio_io import load_wav
    from metaasr_tpu.frontend.fbank import log_mel_fbank

    acc = {}
    for accent in discover_accents(args.data_dir):
        man = Manifest.load(os.path.join(args.data_dir, f"{accent}.jsonl"))
        for u in man.utts:
            audio = load_wav(os.path.join(man.root, u.wav), args.sample_rate)
            feats, flens = log_mel_fbank(
                jnp.asarray(audio)[None], jnp.asarray([len(audio)]),
                cmvn="none")
            arr = np.asarray(feats[0, : int(flens[0])], dtype=np.float64)
            st = acc.setdefault(u.speaker, [np.zeros(80), np.zeros(80), 0])
            st[0] += arr.sum(0)
            st[1] += (arr ** 2).sum(0)
            st[2] += arr.shape[0]
    out = {}
    for spk, (s1, s2, n) in acc.items():
        mean = s1 / max(n, 1)
        out[spk] = {"mean": mean.tolist(),
                    "var": (s2 / max(n, 1) - mean ** 2).tolist(),
                    "frames": int(n)}
    path = os.path.join(args.data_dir, "speaker_cmvn.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"{path}: {len(out)} speakers")


def cmd_vocab(args):
    from metaasr_tpu.data.bpe import BPETokenizer
    from metaasr_tpu.data.dataset import Manifest, discover_accents
    from metaasr_tpu.data.tokenizer import CharTokenizer, PhoneTokenizer

    texts = []
    for accent in discover_accents(args.data_dir):
        man = Manifest.load(os.path.join(args.data_dir, f"{accent}.jsonl"))
        for u in man.utts:
            texts.append(u.phones if args.type == "phone" else u.text)
    if args.type == "phone":
        tok = PhoneTokenizer.from_corpus(texts)
    elif args.type == "bpe":
        tok = BPETokenizer.from_corpus(texts, num_merges=args.bpe_merges)
    else:
        tok = CharTokenizer.from_corpus(texts)
    out = os.path.join(args.data_dir, f"vocab_{args.type}.json")
    tok.save(out)
    print(f"{out}: {tok.vocab_size} tokens")


def main():
    # Data prep is CPU-only by design: offline feature extraction must not
    # queue on (or hang with) the TPU attachment, and the axon
    # sitecustomize re-pins JAX_PLATFORMS at interpreter start so the env
    # var alone is not enough (see tests/conftest.py).
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    p = argparse.ArgumentParser("prepare_data")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synthetic")
    s.add_argument("--out", default="data/synthetic")
    s.add_argument("--accents", nargs="*", default=None)
    s.add_argument("--utts-per-accent", type=int, default=64)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_synthetic)

    s = sub.add_parser("commonvoice")
    s.add_argument("--tsv", required=True)
    s.add_argument("--clips-dir", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--accents", nargs="*", default=None)
    s.add_argument("--sample-rate", type=int, default=16000)
    s.add_argument("--min-sec", type=float, default=1.0)
    s.add_argument("--max-sec", type=float, default=16.0)
    s.add_argument("--max-per-accent", type=int, default=0)
    s.set_defaults(fn=cmd_commonvoice)

    s = sub.add_parser("features")
    s.add_argument("--data-dir", required=True)
    s.add_argument("--sample-rate", type=int, default=16000)
    s.set_defaults(fn=cmd_features)

    s = sub.add_parser("speaker-cmvn")
    s.add_argument("--data-dir", required=True)
    s.add_argument("--sample-rate", type=int, default=16000)
    s.set_defaults(fn=cmd_speaker_cmvn)

    s = sub.add_parser("vocab")
    s.add_argument("--data-dir", required=True)
    s.add_argument("--type", choices=["char", "phone", "bpe"], default="char")
    s.add_argument("--bpe-merges", type=int, default=200)
    s.set_defaults(fn=cmd_vocab)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
