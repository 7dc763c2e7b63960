"""scripts/prepare_data.py commonvoice path (SURVEY.md section 2.1 #20)
against a synthetic Common Voice-format corpus: TSV (path, sentence,
accent, client_id) + clips at a non-target sample rate — exercises accent
filtering, decode, downmix/resample, manifest writing, and that the
output trains end-to-end.
"""

import csv
import json
import os
import subprocess
import sys

import numpy as np

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "scripts", "prepare_data.py")


def _fake_cv(root, rng):
    from metaasr_tpu.data.audio_io import write_wav

    clips = os.path.join(root, "clips")
    os.makedirs(clips, exist_ok=True)
    rows = []
    sentences = ["hello world", "the cat sat", "open the door", "good day"]
    for accent, n in (("us", 6), ("england", 5), ("india", 2)):
        for i in range(n):
            name = f"{accent}_{i}.wav"
            # 22.05 kHz source: the prep must resample to 16 kHz
            dur = rng.uniform(0.6, 1.4)
            audio = (0.1 * rng.standard_normal(int(22050 * dur))).astype(
                np.float32)
            write_wav(os.path.join(clips, name), audio, 22050)
            rows.append({"path": name, "sentence": sentences[i % 4],
                         "accent": accent, "client_id": f"spk{i % 2}"})
    # a row with a missing file and one with an unknown accent: skipped
    rows.append({"path": "missing.wav", "sentence": "x", "accent": "us",
                 "client_id": "s"})
    rows.append({"path": "us_0.wav", "sentence": "x", "accent": "zz",
                 "client_id": "s"})
    tsv = os.path.join(root, "validated.tsv")
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path", "sentence", "accent",
                                          "client_id"], delimiter="\t")
        w.writeheader()
        w.writerows(rows)
    return tsv, clips


def test_commonvoice_prep_end_to_end(tmp_path, rng):
    tsv, clips = _fake_cv(str(tmp_path), rng)
    out_dir = str(tmp_path / "cv")
    r = subprocess.run(
        [sys.executable, SCRIPT, "commonvoice", "--tsv", tsv,
         "--clips-dir", clips, "--out", out_dir,
         "--accents", "us", "england", "--min-sec", "0.2", "--max-sec", "5"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout + r.stderr
    # india filtered out by --accents; bad rows skipped
    manifests = sorted(f for f in os.listdir(out_dir) if f.endswith(".jsonl"))
    assert manifests == ["england.jsonl", "us.jsonl"]
    utts = [json.loads(l) for l in open(os.path.join(out_dir, "us.jsonl"))]
    assert len(utts) == 6
    u = utts[0]
    assert u["speaker"].startswith("spk") and u["text"]
    # resampled to 16 kHz mono wav on disk, num_samples consistent
    from metaasr_tpu.data.audio_io import load_wav

    audio = load_wav(os.path.join(out_dir, u["wav"]), 16000)
    assert abs(len(audio) - u["num_samples"]) <= 1

    # the prepped corpus flows through the real dataset/loss path
    from metaasr_tpu.config import Config
    from metaasr_tpu.data.dataset import load_accent_datasets
    from metaasr_tpu.data.sampler import collate
    from metaasr_tpu.data.tokenizer import CharTokenizer
    from metaasr_tpu.train.task import ASRTask

    import jax

    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(out_dir, tok)
    assert set(dsets) == {"us", "england"}
    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.d_model = 32
    cfg.model.num_heads = 2
    cfg.model.d_ff = 64
    cfg.model.num_encoder_layers = 2
    cfg.model.num_decoder_layers = 2
    cfg.model.dtype = "float32"
    cfg.model.vocab_size = tok.vocab_size
    task = ASRTask(cfg, tok.sos_eos_id)
    items = [dsets["us"][i] for i in range(4)]
    batch = collate(items, 24000, 16)
    batch = {k: v for k, v in batch.items() if k != "texts"}
    params = task.init_params(jax.random.PRNGKey(0), batch)
    loss, _ = task.loss_fn(params, batch, jax.random.PRNGKey(1), True)
    assert np.isfinite(float(loss))


def test_features_and_vocab_subcommands(tmp_path, rng):
    """Offline feature extraction (parity with the reference's Kaldi
    offline path) + vocab building on a prepped corpus: manifests gain
    'feats' entries that load, match the on-device front-end, and a
    global cmvn_stats.json is written."""
    tsv, clips = _fake_cv(str(tmp_path), rng)
    out_dir = str(tmp_path / "cv")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    for cmd in (
        [sys.executable, SCRIPT, "commonvoice", "--tsv", tsv, "--clips-dir",
         clips, "--out", out_dir, "--accents", "us", "--min-sec", "0.2",
         "--max-sec", "5"],
        [sys.executable, SCRIPT, "features", "--data-dir", out_dir],
        [sys.executable, SCRIPT, "vocab", "--data-dir", out_dir,
         "--type", "char"],
    ):
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                           env=env)
        assert r.returncode == 0, r.stdout + r.stderr
    utts = [json.loads(l) for l in open(os.path.join(out_dir, "us.jsonl"))]
    assert all("feats" in u for u in utts)
    feats = np.load(os.path.join(out_dir, utts[0]["feats"]))
    assert feats.ndim == 2 and feats.shape[1] == 80
    stats = json.load(open(os.path.join(out_dir, "cmvn_stats.json")))
    assert len(stats["mean"]) == 80 and stats["frames"] > 0
    assert os.path.exists(os.path.join(out_dir, "vocab_char.json"))
    # offline features == the on-device front-end (cmvn none, dither 0)
    import jax.numpy as jnp

    from metaasr_tpu.data.audio_io import load_wav
    from metaasr_tpu.frontend.fbank import log_mel_fbank

    audio = load_wav(os.path.join(out_dir, utts[0]["wav"]), 16000)
    ref, flens = log_mel_fbank(jnp.asarray(audio)[None],
                               jnp.asarray([len(audio)]), cmvn="none")
    np.testing.assert_allclose(feats, np.asarray(ref[0, : int(flens[0])]),
                               rtol=1e-4, atol=1e-4)
