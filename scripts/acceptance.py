"""One-command day-1 acceptance drill (VERDICT r4 item 7).

Pins the full real-data composition so onboarding actual Common Voice is a
data swap, not an integration project:

    CV-format TSV + clips
      -> scripts/prepare_data.py commonvoice   (filter/resample/manifests)
      -> main.py --mode train  --algo fomaml   (meta-train, held-out accent
                                                excluded)
      -> main.py --mode adapt                  (k-shot adapt + beam decode
                                                on the held-out accent ->
                                                WER JSON)
      -> adapted-params .npz                   (the meta-serving artifact)
      -> main.py --mode export                 (AOT serving bundle)
      -> main.py --mode serve                  (WAV front door, adapted
                                                weights hot-swapped)
      -> WER of the served transcripts vs the held-out references

Every stage is the real CLI surface (subprocess), not test shims. The
corpus is synthetic-but-learnable CV-format data (data/synthetic.py's
accent transforms rendered at 22.05 kHz so the prep path must resample),
because real Common Voice audio is unreachable here (no network;
SURVEY.md section 0). Swap --tsv/--clips-dir to a real download and
nothing else changes.

Usage:
    python scripts/acceptance.py --out /tmp/acceptance          # CPU mesh
    python scripts/acceptance.py --out /tmp/acceptance --on-chip

Writes <out>/acceptance.json and exits 0 only if every stage passed and
the adapted WER beats the unadapted zero-shot WER floor sanity bound.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
HELDOUT = "india"
T0 = time.perf_counter()


def log(msg):
    print(f"[acceptance +{time.perf_counter() - T0:7.1f}s] {msg}",
          flush=True)


def sh(args, env=None, tag=""):
    log(f"run[{tag}]: {' '.join(args[:8])}{' ...' if len(args) > 8 else ''}")
    t = time.perf_counter()
    r = subprocess.run(args, env=env, cwd=REPO, capture_output=True,
                       text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"stage '{tag}' failed (rc={r.returncode})")
    log(f"ok [{tag}] in {time.perf_counter() - t:.1f}s")
    return r


def make_cv_corpus(root: str, utts_per_accent: int, seed: int):
    """CV-format corpus: validated.tsv + clips/ at 22.05 kHz, using the
    synthetic accent transforms (learnable; accents genuinely differ)."""
    from metaasr_tpu.data.audio_io import write_wav
    from metaasr_tpu.data.synthetic import (
        ACCENTS,
        LEXICON,
        _accent_params,
        synth_utterance,
    )

    accents = ("us", "england", HELDOUT)
    clips = os.path.join(root, "clips")
    os.makedirs(clips, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    for ai, accent in enumerate(accents):
        # reuse the synthetic accent transform family; indices spread so
        # the held-out accent's transform is NOT between the train ones
        ap = _accent_params(2 * ai, rng)
        for i in range(utts_per_accent):
            text = " ".join(rng.choice(LEXICON,
                                       size=rng.integers(2, 5)))
            wav = synth_utterance(text, ap, rng, sample_rate=22050)
            name = f"{accent}_{i:03d}.wav"
            write_wav(os.path.join(clips, name), wav, 22050)
            rows.append({"path": name, "sentence": text, "accent": accent,
                         "client_id": f"{accent}_spk{i % 4}"})
    tsv = os.path.join(root, "validated.tsv")
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["path", "sentence", "accent", "client_id"],
            delimiter="\t")
        w.writeheader()
        w.writerows(rows)
    return tsv, clips


def main():
    ap = argparse.ArgumentParser("acceptance")
    ap.add_argument("--out", default="/tmp/acceptance")
    ap.add_argument("--on-chip", action="store_true",
                    help="run on the default (TPU) backend instead of the "
                    "8-virtual-device CPU mesh")
    ap.add_argument("--steps", type=int, default=300,
                    help="meta-train steps (enough for the synthetic "
                    "corpus to beat the zero-shot floor)")
    ap.add_argument("--utts", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true",
                    help="CI mode: tiny steps, composition-only — every "
                    "stage must run green and produce its artifact, but "
                    "the WER quality bound is waived (a few dozen steps "
                    "cannot learn the corpus)")
    args = ap.parse_args()

    env = dict(os.environ)
    if not args.on_chip:
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(
            flags + ["--xla_force_host_platform_device_count=8"])

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    wd = os.path.join(out, "run")
    summary = {"stages": {}, "on_chip": args.on_chip}

    # ---- stage 0: CV-format corpus (in-process; pure host code) ----
    t = time.perf_counter()
    tsv, clips = make_cv_corpus(os.path.join(out, "cv"), args.utts,
                                args.seed)
    summary["stages"]["corpus"] = {"sec": round(time.perf_counter() - t, 1),
                                   "tsv": tsv}
    log(f"corpus: {tsv}")

    # ---- stage 1: prepare_data commonvoice ----
    data_dir = os.path.join(out, "data")
    sh([sys.executable, os.path.join(REPO, "scripts", "prepare_data.py"),
        "commonvoice", "--tsv", tsv, "--clips-dir", clips, "--out",
        data_dir, "--min-sec", "0.2", "--max-sec", "20"],
       env=env, tag="prepare_data")
    manifests = sorted(f for f in os.listdir(data_dir)
                       if f.endswith(".jsonl"))
    assert f"{HELDOUT}.jsonl" in manifests, manifests
    summary["stages"]["prepare_data"] = {"manifests": manifests}

    # ---- stage 2: FOMAML meta-train (held-out accent excluded) ----
    model_small = [
        "-o", "model.d_model=64", "-o", "model.num_heads=2",
        "-o", "model.d_ff=128", "-o", "model.num_encoder_layers=2",
        "-o", "model.num_decoder_layers=2", "-o", "model.dtype=float32",
    ]
    sh([sys.executable, "main.py", "--config",
        "configs/config3_fomaml.yaml", "--mode", "train", "--algo",
        "fomaml", "--workdir", wd, "--data-dir", data_dir,
        "--max-steps", str(args.steps), "--seed", str(args.seed),
        "-o", f"data.heldout_accents={HELDOUT}",
        "-o", "meta.tasks_per_batch=2", "-o", "meta.k_support=4",
        "-o", "meta.k_query=4", "-o", "train.eval_every=0",
        "-o", "train.log_every=50", *model_small],
       env=env, tag="meta_train")

    # ---- stage 3: k-shot adapt + beam decode on the held-out accent ----
    sh([sys.executable, "main.py", "--mode", "adapt", "--workdir", wd,
        "--decode-mode", "beam"], env=env, tag="meta_adapt")
    with open(os.path.join(wd, "adapt_results.json")) as f:
        adapt_res = json.load(f)
    summary["stages"]["adapt"] = adapt_res
    log(f"adapt results: {adapt_res}")

    # ---- stage 4: adapted params npz (the meta-serving artifact) ----
    code = (
        "import json, os, sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "from metaasr_tpu.cli import make_trainer\n"
        "from metaasr_tpu.config import load_config\n"
        "from metaasr_tpu.meta.maml import split_lr\n"
        "from metaasr_tpu.train.checkpoint import save_params_npz\n"
        f"cfg = load_config(os.path.join({wd!r}, 'config.yaml'), {{}})\n"
        # mirror cli.py: the checkpoint's PRNG-key leaf shape depends on
        # the prng impl — restoring with the wrong impl's template fails
        "if cfg.train.prng_impl:\n"
        "    jax.config.update('jax_default_prng_impl',"
        " cfg.train.prng_impl)\n"
        f"tr, tok = make_trainer(cfg, {wd!r})\n"
        "state, step = tr.ckpt.restore(tr.init_state())\n"
        "assert step >= 0, 'no checkpoint'\n"
        f"ds = tr.heldout_datasets[{HELDOUT!r}]\n"
        "adapted, _ = tr.meta_adapt(state.params, ds)\n"
        f"save_params_npz(os.path.join({out!r}, 'adapted.npz'), "
        "split_lr(adapted)[0])\n"
        "print('adapted.npz written')\n")
    sh([sys.executable, "-c", code], env=env, tag="adapted_npz")

    # ---- stage 5: export the AOT serving bundle ----
    bundle = os.path.join(out, "bundle")
    plat = "tpu" if args.on_chip else "cpu"
    sh([sys.executable, "main.py", "--mode", "export", "--workdir", wd,
        "--export-dir", bundle, "--export-buckets", "8x48000",
        "--export-platforms", plat], env=env, tag="export")

    # ---- stage 6: serve held-out WAVs through the CLI front door with
    # the adapted weights hot-swapped ----
    man = [json.loads(line) for line in
           open(os.path.join(data_dir, f"{HELDOUT}.jsonl"))]
    # the utterances meta_adapt did NOT train on (its support set is drawn
    # from the front of the manifest; serve the tail)
    test_utts = man[-8:]
    wavs = [os.path.join(data_dir, u["wav"]) for u in test_utts]
    serve_out = os.path.join(out, "serve_out.jsonl")
    sh([sys.executable, "main.py", "--mode", "serve", "--bundle", bundle,
        "--serve-params", os.path.join(out, "adapted.npz"),
        "--serve-out", serve_out, "--wav", *wavs],
       env=env, tag="serve")

    # ---- stage 7: score the served transcripts ----
    from metaasr_tpu.train.metrics import compute_wer

    hyps = [json.loads(line)["text"] for line in open(serve_out)]
    refs = [u["text"] for u in test_utts]
    wer = compute_wer(hyps, refs)
    summary["served_wer"] = wer
    summary["adapted_wer"] = adapt_res.get(HELDOUT, {}).get("wer")
    with open(os.path.join(out, "acceptance.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log(f"served WER on {len(hyps)} held-out utts: {wer:.3f} "
        f"(adapt-mode beam WER: {summary['adapted_wer']})")

    # Composition sanity: every stage produced its artifact, WER is finite
    # and below the all-wrong floor (1.0 means the pipeline produced
    # nothing useful; the synthetic corpus is learnable at these sizes —
    # r4's flagship runs reach ~0.02, this tiny drill just needs << 1).
    if args.smoke:
        if not wer == wer:
            raise SystemExit(f"acceptance FAILED: served WER is NaN")
        log("ACCEPTANCE GREEN (smoke: composition only)")
        return
    if not (wer == wer and wer < 0.9):
        raise SystemExit(f"acceptance FAILED: served WER {wer} "
                         "not meaningfully below the all-wrong floor")
    log("ACCEPTANCE GREEN")


if __name__ == "__main__":
    main()
