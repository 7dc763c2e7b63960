"""M5/M6 end-to-end: FOMAML and full MAML meta-training on the tiny
synthetic accent tasks, plus meta_adapt/decode (SURVEY.md section 4.6)."""

import numpy as np
import pytest

from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.train.meta_train import MetaASRTrainer
from metaasr_tpu.train.task import ASRTask
from tests.test_m2_models import tiny_cfg


def _make_trainer(synthetic_data_dir, tmp_path, algo, arch="vgg_blstm",
                  inner_steps=2, adapt_filter="", meta_overrides=None):
    tok = CharTokenizer.ascii_default()
    cfg = tiny_cfg(arch, vocab=tok.vocab_size)
    cfg.meta.algo = algo
    cfg.meta.inner_steps = inner_steps
    cfg.meta.adapt_filter = adapt_filter
    cfg.meta.inner_lr = 1e-2
    cfg.meta.k_support = 2
    cfg.meta.k_query = 2
    cfg.meta.tasks_per_batch = 2
    cfg.data.max_frames = 200
    cfg.data.max_tokens = 16
    cfg.data.batch_size = 4
    cfg.optimizer.schedule = "constant"
    cfg.optimizer.lr = 1e-3
    cfg.train.log_every = 2
    cfg.train.eval_every = 10**9
    cfg.train.ckpt_every = 10**9
    # applied LAST so overrides beat every default above
    for k, v in (meta_overrides or {}).items():
        setattr(cfg.meta, k, v)
    tokz = tok
    dsets = load_accent_datasets(synthetic_data_dir, tokz)
    heldout = {"delta": dsets.pop("delta")}
    task = ASRTask(cfg, tokz.sos_eos_id)
    return MetaASRTrainer(cfg, task, dsets, heldout, tokz, str(tmp_path)), cfg


@pytest.mark.slow
def test_fomaml_meta_train_smoke(synthetic_data_dir, tmp_path):
    trainer, _ = _make_trainer(synthetic_data_dir, tmp_path / "fomaml", "fomaml")
    state = trainer.meta_train(max_steps=6)
    assert int(state.step) == 6
    import json

    recs = [json.loads(l) for l in
            open(f"{tmp_path}/fomaml/logs/scalars.jsonl") if "meta_loss" in l]
    assert len(recs) >= 2
    assert np.isfinite(recs[-1]["meta_loss"])

    # meta_adapt on the held-out accent runs and changes the params
    ds = trainer.heldout_datasets["delta"]
    adapted, test_idx = trainer.meta_adapt(state.params, ds, adapt_steps=2)
    import jax

    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(adapted)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    scores = trainer.decode(adapted, ds, test_idx, max_utts=4)
    assert 0.0 <= scores["wer"] <= 2.0


@pytest.mark.slow
def test_full_maml_meta_train_smoke(synthetic_data_dir, tmp_path):
    """Second-order MAML (grad-over-grad through the unrolled inner loop,
    remat on) compiles and runs on the real ASR model."""
    trainer, _ = _make_trainer(synthetic_data_dir, tmp_path / "maml", "maml",
                               arch="vgg_blstm", inner_steps=2)
    state = trainer.meta_train(max_steps=2)
    assert int(state.step) == 2


@pytest.mark.slow
def test_fomaml_transformer_smoke(synthetic_data_dir, tmp_path):
    trainer, _ = _make_trainer(synthetic_data_dir, tmp_path / "tf", "fomaml",
                               arch="transformer")
    state = trainer.meta_train(max_steps=2)
    assert int(state.step) == 2


@pytest.mark.slow
def test_reptile_meta_train_smoke(synthetic_data_dir, tmp_path):
    """Reptile (combined-batch inner SGD, delta outer grad) runs on the
    real ASR model end-to-end and produces finite losses + a usable
    adapted model."""
    trainer, _ = _make_trainer(synthetic_data_dir, tmp_path / "rep", "reptile")
    state = trainer.meta_train(max_steps=4)
    assert int(state.step) == 4
    import json

    recs = [json.loads(l) for l in
            open(f"{tmp_path}/rep/logs/scalars.jsonl") if "meta_loss" in l]
    assert recs and np.isfinite(recs[-1]["meta_loss"])
    ds = trainer.heldout_datasets["delta"]
    adapted, test_idx = trainer.meta_adapt(state.params, ds, adapt_steps=2)
    scores = trainer.decode(adapted, ds, test_idx, max_utts=4)
    assert 0.0 <= scores["wer"] <= 2.0


def test_eval_heldout_averages_support_draws(synthetic_data_dir, tmp_path):
    """eval_heldout must average over train.eval_support_draws independent
    k-shot support draws (single-draw WER noise is the same order as the
    metric) and report the per-accent std across draws."""
    trainer, cfg = _make_trainer(synthetic_data_dir, tmp_path / "draws",
                                 "fomaml")
    cfg.train.eval_support_draws = 3
    cfg.train.eval_decode_mode = "greedy"
    cfg.train.eval_max_utts = 4
    state = trainer.init_state()

    seen_seeds = []
    orig_adapt = trainer.meta_adapt

    def spy_adapt(params, ds, adapt_steps=None, k_support=None, seed=0):
        seen_seeds.append(seed)
        return orig_adapt(params, ds, adapt_steps=1, k_support=k_support,
                          seed=seed)

    trainer.meta_adapt = spy_adapt
    out = trainer.eval_heldout(state.params)
    assert seen_seeds == [0, 1, 2], "one adapt per draw with distinct seeds"
    assert "heldout_delta_wer" in out and "heldout_delta_wer_std" in out
    assert 0.0 <= out["heldout_wer_mean"] <= 2.0
    # explicit override wins over the config value
    seen_seeds.clear()
    trainer.eval_heldout(state.params, support_draws=1)
    assert seen_seeds == [0]


def test_decode_dump_nbest_scores(synthetic_data_dir, tmp_path):
    """Beam-mode hypothesis dumps carry the top score and, with
    dump_nbest > 1, an n-best list sorted best-first (ESPnet n-best
    output semantics)."""
    import json

    trainer, _ = _make_trainer(synthetic_data_dir, tmp_path, "fomaml",
                               arch="transformer")
    state = trainer.init_state()
    ds = trainer.heldout_datasets["delta"]
    path = str(tmp_path / "hyps.jsonl")
    trainer.decode(state.params, ds, max_utts=4, mode="beam",
                   dump_path=path, dump_nbest=3)
    recs = [json.loads(l) for l in open(path)]
    assert len(recs) == 4
    for r in recs:
        assert {"hyp", "ref", "score", "nbest"} <= set(r)
        assert len(r["nbest"]) == 3
        scores = [h["score"] for h in r["nbest"]]
        assert scores == sorted(scores, reverse=True)
        assert r["nbest"][0]["hyp"] == r["hyp"]
        assert r["nbest"][0]["score"] == r["score"]


def test_decode_only_trainer_with_too_few_accents(synthetic_data_dir,
                                                  tmp_path):
    """A decode/adapt-only session (e.g. CLI transcribe pointed at ONE
    accent) must construct even when meta.tasks_per_batch > available
    accents: the TaskSampler is skipped, init_state falls back to a
    collate template, decode works, and meta_train fails loudly."""
    import pytest as _pytest

    from metaasr_tpu.data.dataset import load_accent_datasets as _load

    tok = CharTokenizer.ascii_default()
    from tests.test_m2_models import tiny_cfg as _tiny
    cfg = _tiny("transformer", vocab=tok.vocab_size)
    cfg.meta.algo = "fomaml"
    cfg.meta.tasks_per_batch = 4          # > 1 accent loaded below
    cfg.data.max_frames = 200
    cfg.data.max_tokens = 16
    cfg.data.batch_size = 4
    dsets = _load(synthetic_data_dir, tok, accents=("delta",))
    task = ASRTask(cfg, tok.sos_eos_id)
    trainer = MetaASRTrainer(cfg, task, dsets, {}, tok, str(tmp_path))
    assert trainer.sampler is None
    state = trainer.init_state()
    ds = dsets["delta"]
    out = trainer.decode(state.params, ds, max_utts=2, mode="beam")
    assert np.isfinite(out["wer"])
    with _pytest.raises(ValueError, match="decode/adapt-only"):
        trainer.meta_train(max_steps=1)
