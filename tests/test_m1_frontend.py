"""M1: jax GEMM-native fbank vs the per-frame numpy spec oracle;
CMVN; SpecAugment properties."""

import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.frontend import FbankParams, log_mel_fbank, num_frames, spec_augment
from metaasr_tpu.frontend.fbank import apply_cmvn, frame_lengths
from metaasr_tpu.frontend.oracle import cmvn_oracle, fbank_oracle


def _rand_audio(rng, n):
    # speech-scale signal: tones + noise
    t = np.arange(n) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    return x.astype(np.float32)


def test_fbank_matches_oracle(rng):
    lens = [400, 1000, 16000, 7003]
    s_max = 16000
    audio = np.zeros((len(lens), s_max), dtype=np.float32)
    for i, l in enumerate(lens):
        audio[i, :l] = _rand_audio(rng, l)
    feats, flens = jax.jit(lambda a, al: log_mel_fbank(a, al, cmvn="none"))(
        jnp.asarray(audio), jnp.asarray(lens))
    feats = np.asarray(feats)
    flens = np.asarray(flens)
    for i, l in enumerate(lens):
        ref = fbank_oracle(audio[i, :l])
        assert flens[i] == len(ref)
        got = feats[i, : flens[i]]
        # relative tolerance on log-mel values (fp32 matmul-DFT vs fp64 rfft)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        # padding region is exactly zero
        assert np.all(feats[i, flens[i]:] == 0.0)


def test_fbank_padding_invariance(rng):
    """Extra zero padding must never change valid-frame features."""
    x = _rand_audio(rng, 5000)
    a1 = jnp.asarray(x)[None, :]
    a2 = jnp.pad(a1, ((0, 0), (0, 3000)))
    f1, l1 = log_mel_fbank(a1, jnp.array([5000]))
    f2, l2 = log_mel_fbank(a2, jnp.array([5000]))
    assert l1[0] == l2[0]
    np.testing.assert_allclose(np.asarray(f1[0, : l1[0]]),
                               np.asarray(f2[0, : l2[0]]), rtol=1e-5, atol=1e-5)


def test_cmvn_matches_oracle(rng):
    x = _rand_audio(rng, 8000)
    feats, flens = log_mel_fbank(jnp.asarray(x)[None], jnp.array([8000]), cmvn="none")
    for norm_var in (False, True):
        got = apply_cmvn(feats, flens, norm_var=norm_var)
        ref = cmvn_oracle(np.asarray(feats[0, : flens[0]]), norm_var=norm_var)
        np.testing.assert_allclose(np.asarray(got[0, : flens[0]]), ref,
                                   rtol=1e-4, atol=1e-4)
        # normalized: masked mean ~ 0
        assert abs(np.asarray(got[0, : flens[0]]).mean()) < 1e-4


def test_frame_lengths_match_num_frames():
    lens = jnp.array([0, 399, 400, 401, 560, 16000])
    fl = np.asarray(frame_lengths(lens))
    expect = [0, 0, 1, 1, 2, num_frames(16000)]
    assert list(fl) == expect


def test_spec_augment_properties(rng):
    bsz, t_len, d = 4, 100, 80
    feats = jnp.asarray(rng.standard_normal((bsz, t_len, d)).astype(np.float32)) + 5.0
    lens = jnp.array([100, 60, 30, 100])
    out = spec_augment(jax.random.PRNGKey(0), feats, lens,
                       num_freq_masks=2, freq_mask_width=10,
                       num_time_masks=2, time_mask_width=20,
                       time_mask_max_ratio=0.5)
    out = np.asarray(out)
    ref = np.asarray(feats)
    # masked entries are exactly 0; unmasked are untouched
    changed = out != ref
    assert changed.any()
    assert np.all(out[changed] == 0.0)
    # masking is axis-aligned: each batch's changed set is (time rows) U (freq cols)
    for b in range(bsz):
        ch = changed[b]
        t_rows = np.where(ch.all(axis=1))[0]
        f_cols = np.where(ch.all(axis=0))[0]
        recon = np.zeros_like(ch)
        recon[t_rows, :] = True
        recon[:, f_cols] = True
        assert np.array_equal(ch, recon)
    # time masks never start beyond the valid length
    b = 2  # len 30
    t_rows = np.where(changed[b].all(axis=1))[0]
    assert (t_rows < 30 + 15).all()  # width cap = 0.5*30


def test_spec_augment_deterministic_per_key(rng):
    feats = jnp.asarray(rng.standard_normal((2, 50, 80)).astype(np.float32))
    lens = jnp.array([50, 50])
    a = spec_augment(jax.random.PRNGKey(7), feats, lens)
    b = spec_augment(jax.random.PRNGKey(7), feats, lens)
    c = spec_augment(jax.random.PRNGKey(8), feats, lens)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_global_cmvn_task_path(rng, tmp_path):
    """cmvn='global' normalizes with offline corpus stats."""
    import json

    import jax.numpy as jnp

    from metaasr_tpu.config import Config
    from metaasr_tpu.train.task import ASRTask

    mean = rng.standard_normal(80).astype(np.float64)
    var = np.abs(rng.standard_normal(80)).astype(np.float64) + 0.5
    p = tmp_path / "cmvn_stats.json"
    p.write_text(json.dumps({"mean": mean.tolist(), "var": var.tolist()}))
    cfg = Config()
    cfg.model.vocab_size = 10
    cfg.frontend.cmvn = "global"
    cfg.frontend.cmvn_stats_path = str(p)
    cfg.frontend.use_pallas = False
    task = ASRTask(cfg)
    x = _rand_audio(rng, 8000)
    feats, flens = task.features(jnp.asarray(x)[None], jnp.array([8000]))
    raw, _ = log_mel_fbank(jnp.asarray(x)[None], jnp.array([8000]), cmvn="none")
    expect = (np.asarray(raw[0, : flens[0]]) - mean) / np.sqrt(var + 1e-10)
    np.testing.assert_allclose(np.asarray(feats[0, : flens[0]]), expect,
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(feats[0, flens[0]:]) == 0.0)


def test_speaker_cmvn_pipeline(rng, synthetic_data_dir, tmp_path):
    """speaker-level CMVN: offline stats -> per-utterance vectors -> task
    normalization (SURVEY.md section 2.1 #16)."""
    import json
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, "scripts")
    import types

    from prepare_data import cmd_speaker_cmvn

    from metaasr_tpu.config import Config
    from metaasr_tpu.data.dataset import load_accent_datasets
    from metaasr_tpu.data.tokenizer import CharTokenizer
    from metaasr_tpu.train.task import ASRTask

    args = types.SimpleNamespace(data_dir=synthetic_data_dir, sample_rate=16000)
    cmd_speaker_cmvn(args)
    stats = json.load(open(f"{synthetic_data_dir}/speaker_cmvn.json"))
    assert "spk_alpha" in stats and len(stats["spk_alpha"]["mean"]) == 80

    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(
        synthetic_data_dir, tok,
        speaker_cmvn_path=f"{synthetic_data_dir}/speaker_cmvn.json")
    item = dsets["alpha"][0]
    assert item["cmvn_mean"].shape == (80,) and item["cmvn_std"].shape == (80,)

    cfg = Config()
    cfg.model.vocab_size = tok.vocab_size
    cfg.frontend.cmvn = "speaker"
    cfg.frontend.use_pallas = False
    task = ASRTask(cfg, tok.sos_eos_id)
    audio = jnp.asarray(item["audio"])[None]
    lens = jnp.asarray([len(item["audio"])])
    feats, flens = task.features(audio, lens,
                                 cmvn_mean=jnp.asarray(item["cmvn_mean"])[None],
                                 cmvn_std=jnp.asarray(item["cmvn_std"])[None])
    raw, _ = log_mel_fbank(audio, lens, cmvn="none")
    expect = ((np.asarray(raw[0, : flens[0]]) - item["cmvn_mean"])
              / item["cmvn_std"])
    np.testing.assert_allclose(np.asarray(feats[0, : flens[0]]), expect,
                               rtol=1e-4, atol=1e-4)

def test_fbank_three_way_torch_oracle_jax(rng):
    """Independent cross-validation (VERDICT r1 #5 / SURVEY.md section
    4.1): the numpy oracle, the jax matmul-DFT path, and a structurally
    different torch implementation (unfold framing + torch.fft.rfft +
    vectorized mel banks) must agree <=1e-4 rel, dither=0, on random and
    speech-like signals. Three FFT backends, three mel-bank constructions:
    a shared misreading of the Kaldi spec would have to be written three
    times to pass."""
    import pytest

    torch_ref = pytest.importorskip("metaasr_tpu.frontend.torch_ref")
    if torch_ref.torch is None:
        pytest.skip("torch not installed")
    signals = [
        _rand_audio(rng, 16000),                                   # tonal
        rng.standard_normal(7003).astype(np.float32),              # noise
        (0.5 * np.sign(np.sin(2 * np.pi * 113 * np.arange(4800)
                              / 16000.0))).astype(np.float32),     # square
    ]
    for x in signals:
        ref_np = fbank_oracle(x)
        ref_th = torch_ref.fbank_torch(x)
        np.testing.assert_allclose(ref_th, ref_np, rtol=1e-6, atol=1e-8)
        feats, flens = log_mel_fbank(jnp.asarray(x)[None],
                                     jnp.array([len(x)]), cmvn="none")
        got = np.asarray(feats[0, : flens[0]])
        np.testing.assert_allclose(got, ref_th, rtol=1e-4, atol=2e-4)
