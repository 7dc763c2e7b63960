"""CLI end-to-end: train a tiny FOMAML run, then adapt on the held-out
accent — exercising main.py's full dispatch (SURVEY.md section 2.1 #1)."""

import json
import os

import pytest

from metaasr_tpu.cli import main


@pytest.mark.slow
def test_cli_train_then_adapt(synthetic_data_dir, tmp_path):
    wd = str(tmp_path / "run")
    common = [
        "--data-dir", synthetic_data_dir,
        "-o", "model.d_model=32", "-o", "model.num_heads=2",
        "-o", "model.d_ff=64", "-o", "model.num_encoder_layers=2",
        "-o", "model.num_decoder_layers=2", "-o", "model.dtype=float32",
        "-o", "meta.tasks_per_batch=2", "-o", "meta.k_support=2",
        "-o", "meta.k_query=2", "-o", "meta.inner_steps=2",
        "-o", "meta.adapt_steps=2",
        "-o", "data.max_frames=200", "-o", "data.max_tokens=16",
        "-o", "data.heldout_accents=delta",
        "-o", "frontend.use_pallas=false",
        "-o", "train.eval_every=2", "-o", "train.ckpt_every=1000000",
        "-o", "train.eval_max_utts=4", "-o", "train.eval_decode_mode=greedy",
        "-o", "train.prng_impl=", "-o", "optimizer.schedule=constant",
        "-o", "optimizer.lr=0.001",
    ]
    rc = main(["--mode", "train", "--algo", "fomaml", "--workdir", wd,
               "--max-steps", "2"] + common)
    assert rc == 0
    assert os.path.exists(f"{wd}/config.yaml")

    rc = main(["--config", f"{wd}/config.yaml", "--mode", "adapt",
               "--workdir", wd, "--data-dir", synthetic_data_dir])
    assert rc == 0
    results = json.load(open(f"{wd}/adapt_results.json"))
    assert "delta" in results and 0.0 <= results["delta"]["wer"] <= 2.0
    # hypothesis dump (reference decode writes hyp files)
    hyps = [json.loads(l) for l in open(f"{wd}/hyps_delta.jsonl")]
    assert hyps and {"hyp", "ref"} <= set(hyps[0])

    rc = main(["--config", f"{wd}/config.yaml", "--mode", "test",
               "--workdir", wd, "--data-dir", synthetic_data_dir])
    assert rc == 0
    assert os.path.exists(f"{wd}/test_results.json")

    # --use-best: the eval at step 2 saved a best checkpoint
    rc = main(["--config", f"{wd}/config.yaml", "--mode", "adapt",
               "--workdir", wd, "--data-dir", synthetic_data_dir,
               "--use-best"])
    assert rc == 0


def test_cli_use_best_and_avg_last_conflict(tmp_path):
    """--use-best + --avg-last must error (the avg-last branch would
    silently overwrite the restored best params)."""
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["--mode", "adapt", "--workdir", str(tmp_path),
              "--use-best", "--avg-last", "3",
              "-o", "model.d_model=32", "-o", "model.num_heads=2",
              "-o", "model.d_ff=64", "-o", "model.num_encoder_layers=2",
              "-o", "model.num_decoder_layers=2",
              "-o", "frontend.use_pallas=false"])


@pytest.mark.slow
def test_cli_train_with_bpe_vocab(synthetic_data_dir, tmp_path):
    """data.vocab=bpe through the CLI: builds the BPE vocab from the
    corpus, saves vocab_bpe.json, and trains end-to-end with it —
    the unit-tested BPETokenizer exercised on the real user surface."""
    wd = str(tmp_path / "run_bpe")
    rc = main([
        "--mode", "train", "--algo", "fomaml", "--workdir", wd,
        "--max-steps", "2", "--data-dir", synthetic_data_dir,
        "-o", "data.vocab=bpe",
        "-o", "model.d_model=32", "-o", "model.num_heads=2",
        "-o", "model.d_ff=64", "-o", "model.num_encoder_layers=2",
        "-o", "model.num_decoder_layers=2", "-o", "model.dtype=float32",
        "-o", "meta.tasks_per_batch=2", "-o", "meta.k_support=2",
        "-o", "meta.k_query=2", "-o", "meta.inner_steps=2",
        "-o", "data.max_frames=200", "-o", "data.max_tokens=16",
        "-o", "data.heldout_accents=delta",
        "-o", "frontend.use_pallas=false",
        "-o", "train.eval_every=1000000", "-o", "train.ckpt_every=1000000",
        "-o", "train.prng_impl=", "-o", "optimizer.schedule=constant",
    ])
    assert rc == 0
    import json as _json

    vocab = _json.load(open(
        os.path.join(synthetic_data_dir, "vocab_bpe.json")))
    assert vocab  # corpus-derived merges persisted for later invocations


@pytest.mark.slow
def test_cli_transcribe_mono_and_meta(synthetic_data_dir, tmp_path):
    """--mode transcribe decodes every loaded accent zero-shot for BOTH a
    meta-trained run and a mono ('no' algo) run — the latter routes
    params through a decode-only MetaASRTrainer wrapper (the mono trainer
    has no decode surface of its own)."""
    tiny = [
        "-o", "model.d_model=32", "-o", "model.num_heads=2",
        "-o", "model.d_ff=64", "-o", "model.num_encoder_layers=2",
        "-o", "model.num_decoder_layers=2", "-o", "model.dtype=float32",
        "-o", "data.max_frames=200", "-o", "data.max_tokens=16",
        "-o", "frontend.use_pallas=false",
        "-o", "train.eval_every=0", "-o", "train.ckpt_every=1000000",
        "-o", "train.prng_impl=", "-o", "optimizer.schedule=constant",
    ]
    # mono run: train 2 steps, then transcribe its training accent AND the
    # held-out accent (baselines are compared to meta on the SAME held-out
    # accent — make_trainer exposes heldout to the baseline trainers too)
    wd = str(tmp_path / "mono")
    rc = main(["--mode", "train", "--algo", "no", "--workdir", wd,
               "--max-steps", "2", "--data-dir", synthetic_data_dir,
               "-o", "data.dev_fraction=0", "-o", "data.batch_size=4",
               "-o", "data.heldout_accents=delta",
               "-o", "data.accents=alpha"] + tiny)
    assert rc == 0
    rc = main(["--config", f"{wd}/config.yaml", "--mode", "transcribe",
               "--workdir", wd, "--data-dir", synthetic_data_dir])
    assert rc == 0
    results = json.load(open(f"{wd}/transcribe_results.json"))
    assert {"alpha", "delta"} <= set(results)
    hyps = [json.loads(l) for l in open(results["alpha"]["dump"])]
    assert len(hyps) == results["alpha"]["utts"] > 0
    assert {"hyp", "ref"} <= set(hyps[0])
    assert "wer" in results["alpha"]  # synthetic manifests carry refs

    # --mode test on the baseline scores the held-out accent zero-shot
    rc = main(["--config", f"{wd}/config.yaml", "--mode", "test",
               "--workdir", wd, "--data-dir", synthetic_data_dir])
    assert rc == 0
    tres = json.load(open(f"{wd}/test_results.json"))
    assert "delta" in tres and 0.0 <= tres["delta"]["wer"] <= 2.0


def test_cli_serve_from_bundle(tmp_path, capsys):
    """--mode serve: bundle -> text from the command line with NO config,
    workdir, or training code — the production serving surface. Covers
    the WAV front door (native loader), JSONL output, and the adapted-
    params hot-swap flag."""
    import json
    import wave

    import jax
    import numpy as np

    from metaasr_tpu.cli import main
    from metaasr_tpu.serve import ExportSpec, ServingDecoder, export_bundle
    from metaasr_tpu.train.checkpoint import save_params_npz
    from tests.test_export import _setup

    cfg, task, tok, params, _, rng = _setup()
    bundle = str(tmp_path / "bundle")
    export_bundle(cfg, params, tok, bundle,
                  spec=ExportSpec(buckets=((2, 8000),), platforms=("cpu",)))

    wavs = []
    for i, n in enumerate((8000, 5000)):
        path = str(tmp_path / f"u{i}.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(cfg.frontend.sample_rate)
            pcm = (0.1 * rng.standard_normal(n) * 32767).astype(np.int16)
            w.writeframes(pcm.tobytes())
        wavs.append(path)

    out = str(tmp_path / "hyps.jsonl")
    rc = main(["--mode", "serve", "--bundle", bundle, "--wav", *wavs,
               "--serve-out", out])
    assert rc is None
    recs = [json.loads(line) for line in open(out)]
    assert [r["file"] for r in recs] == wavs
    want = ServingDecoder(bundle).transcribe_files(wavs)
    assert [r["text"] for r in recs] == [w["text"] for w in want]
    stdout = capsys.readouterr().out
    assert recs[0]["text"] in stdout  # stdout carries the same records

    # adapted-params hot-swap through the CLI
    adapted = jax.tree.map(lambda a: np.asarray(a) + 0.01, params)
    npz = str(tmp_path / "adapted.npz")
    save_params_npz(npz, adapted)
    rc = main(["--mode", "serve", "--bundle", bundle, "--wav", wavs[0],
               "--serve-params", npz])
    assert rc is None
    swapped = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ref = ServingDecoder(bundle).transcribe([_load(wavs[0], cfg)],
                                            params=adapted)
    assert swapped["text"] == ref[0]["text"]

    # missing args fail crisply
    import pytest

    with pytest.raises(SystemExit, match="needs --bundle"):
        main(["--mode", "serve", "--wav", wavs[0]])


def _load(path, cfg):
    from metaasr_tpu.data.audio_io import load_wav

    return load_wav(path, target_rate=cfg.frontend.sample_rate)
