"""M0: tokenizer, metrics, padding utils, dataset, samplers, config."""

import numpy as np

from metaasr_tpu.config import Config, load_config, save_config
from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.sampler import BucketBatcher, TaskSampler, support_query_split
from metaasr_tpu.data.tokenizer import CharTokenizer, PhoneTokenizer
from metaasr_tpu.train.metrics import compute_cer, compute_wer, edit_distance


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer.ascii_default()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    assert ids.min() >= 1  # never blank
    assert ids.max() < tok.sos_eos_id


def test_phone_tokenizer_roundtrip():
    tok = PhoneTokenizer.arpabet_default()
    ids = tok.encode("HH AH L OW")
    assert tok.decode(ids) == "AH HH L OW" or tok.decode(ids) == "HH AH L OW"
    # order must be preserved
    assert tok.decode(ids) == "HH AH L OW"


def test_edit_distance_matches_bruteforce():
    # cross-check native C++ vs pure python on random pairs
    from metaasr_tpu.train.metrics import _edit_distance_py

    rng = np.random.default_rng(1)
    for _ in range(25):
        a = list(rng.integers(0, 5, size=rng.integers(0, 12)))
        b = list(rng.integers(0, 5, size=rng.integers(0, 12)))
        assert edit_distance(a, b) == _edit_distance_py([int(x) for x in a], [int(x) for x in b])


def test_wer_cer_basics():
    assert compute_wer(["a b c"], ["a b c"]) == 0.0
    assert compute_wer(["a x c"], ["a b c"]) == 1 / 3
    assert compute_cer(["abc"], ["abd"]) == 1 / 3
    assert compute_wer([""], ["a b"]) == 1.0


def test_masks_and_lengths():
    import jax.numpy as jnp

    from metaasr_tpu.utils.padding import (
        make_non_pad_mask,
        make_pad_mask,
        subsampled_lengths,
    )

    lens = jnp.array([3, 5, 0])
    m = make_non_pad_mask(lens, 6)
    assert m.shape == (3, 6)
    assert m.sum() == 8
    assert bool((make_pad_mask(lens, 6) == ~m).all())
    sub = subsampled_lengths(jnp.array([100, 7, 1]), factor=4)
    # two stages of (L-1)//2
    assert list(np.asarray(sub)) == [24, 1, 1]


def test_config_yaml_roundtrip(tmp_path):
    cfg = Config()
    cfg.meta.inner_lr = 0.05
    p = tmp_path / "c.yaml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p), overrides={"meta.inner_steps": 7})
    assert cfg2.meta.inner_lr == 0.05
    assert cfg2.meta.inner_steps == 7
    assert cfg2.model.d_model == 256


def test_dataset_and_samplers(synthetic_data_dir):
    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(synthetic_data_dir, tok)
    assert set(dsets) == {"alpha", "bravo", "echo", "delta"}
    item = dsets["alpha"][0]
    assert item["audio"].ndim == 1 and item["audio"].dtype == np.float32
    assert item["tokens"].ndim == 1
    assert tok.decode(item["tokens"]) == item["text"]

    batcher = BucketBatcher(list(dsets.values()), batch_size=4,
                            sample_buckets=(16000, 32000, 64000),
                            token_buckets=(16, 32), seed=0, drop_last=False)
    batches = list(batcher)
    assert sum(len(b["texts"]) for b in batches) == 48
    for b in batches:
        assert b["audio"].shape[1] in (16000, 32000, 64000)
        assert b["tokens"].shape[1] in (16, 32)
        # padding is zeros
        for i in range(len(b["texts"])):
            assert np.all(b["audio"][i, b["audio_lens"][i]:] == 0)

    ts = TaskSampler(dsets, k_support=2, k_query=3, tasks_per_batch=3,
                     num_samples=32000, num_tokens=16, seed=0)
    mb = ts.sample()
    assert mb["support"]["audio"].shape == (3, 2, 32000)
    assert mb["query"]["audio"].shape == (3, 3, 32000)
    assert mb["query"]["tokens"].shape == (3, 3, 16)
    assert len(set(mb["accents"])) == 3

    support, test_idx = support_query_split(dsets["alpha"], 5, 32000, 16, seed=0)
    assert support["audio"].shape == (5, 32000)
    assert len(test_idx) == 7
    assert set(test_idx).isdisjoint(set()) and len(set(test_idx)) == 7


def test_task_sampler_deterministic_resume(synthetic_data_dir):
    """Meta-batches are a pure function of (seed, step): resuming from a
    checkpointed step replays the identical data stream."""
    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(synthetic_data_dir, tok)
    mk = lambda: TaskSampler(dsets, k_support=2, k_query=2, tasks_per_batch=2,
                             num_samples=16000, num_tokens=16, seed=3)
    a, b = mk(), mk()
    for step in (0, 1, 5, 5, 100):
        mb1, mb2 = a.sample(step), b.sample(step)
        assert mb1["accents"] == mb2["accents"]
        assert np.array_equal(mb1["support"]["audio"], mb2["support"]["audio"])
        assert np.array_equal(mb1["query"]["tokens"], mb2["query"]["tokens"])
    # different steps differ
    assert not np.array_equal(a.sample(0)["support"]["audio"],
                              a.sample(1)["support"]["audio"])


def test_bpe_tokenizer(tmp_path):
    from metaasr_tpu.data.bpe import BPETokenizer

    corpus = ["the cat sat on the mat", "the cat ran", "a cat and the mat",
              "the the the cat cat"] * 5
    tok = BPETokenizer.from_corpus(corpus, num_merges=30)
    # round trip
    for text in ("the cat sat", "a cat on the mat"):
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        assert ids.min() >= 1 and ids.max() < tok.sos_eos_id
    # merges compress: "the" should be fewer units than its chars
    assert len(tok.encode("the the the")) < len("thethethe")
    # save/load round trip
    p = tmp_path / "bpe.json"
    tok.save(str(p))
    tok2 = BPETokenizer.load(str(p))
    assert np.array_equal(tok.encode("the cat"), tok2.encode("the cat"))
    # deterministic training
    tok3 = BPETokenizer.from_corpus(corpus, num_merges=30)
    assert tok.symbols == tok3.symbols and tok.merges == tok3.merges


def test_accent_dataset_split(synthetic_data_dir):
    tok = CharTokenizer.ascii_default()
    ds = load_accent_datasets(synthetic_data_dir, tok)["alpha"]
    tr, dv = ds.split(0.25, seed=1)
    assert len(tr) + len(dv) == len(ds)
    assert len(dv) == max(1, int(len(ds) * 0.25))
    ids_tr = {u.utt_id for u in tr.manifest.utts}
    ids_dv = {u.utt_id for u in dv.manifest.utts}
    assert ids_tr.isdisjoint(ids_dv)
    # deterministic
    tr2, dv2 = ds.split(0.25, seed=1)
    assert {u.utt_id for u in dv2.manifest.utts} == ids_dv


def test_hard_synthetic_profile(tmp_path):
    """The de-saturated quality regime (VERDICT r2 #3): 16 accents with
    overlapping transforms, confusable char spacing, noise floor."""
    from metaasr_tpu.data.synthetic import (
        ACCENTS_HARD,
        LEXICON_HARD,
        _accent_params,
        generate_dataset,
    )

    assert len(ACCENTS_HARD) >= 12
    assert len(LEXICON_HARD) > 60
    import numpy as np

    rng = np.random.default_rng(0)
    easy = [_accent_params(i, rng)["pitch"] for i in range(8)]
    hard = [_accent_params(i, rng, "hard")["pitch"] for i in range(16)]
    # hard transforms sit closer together than easy ones
    assert (np.diff(sorted(hard)).mean() < np.diff(sorted(easy)).mean())
    p = _accent_params(3, rng, "hard")
    assert p["noise"] > 0.05 and p["char_hz"] < 20
    # irreducible ambiguity (adaptation can't remove per-utterance jitter
    # or the noise floor) — keeps the adapted-WER benchmark off zero
    assert p["rate_jitter"] >= 0.06
    generate_dataset(str(tmp_path), accents=ACCENTS_HARD[:3],
                     utts_per_accent=2, words_per_utt=(3, 4), seed=0,
                     profile="hard")
    import json
    import os

    for a in ACCENTS_HARD[:3]:
        lines = open(os.path.join(str(tmp_path), f"{a}.jsonl")).read().strip()
        utts = [json.loads(l) for l in lines.splitlines()]
        assert len(utts) == 2
        assert all(len(u["text"].split()) >= 3 for u in utts)
        assert os.path.exists(os.path.join(str(tmp_path), utts[0]["wav"]))
