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
                  inner_steps=2):
    tok = CharTokenizer.ascii_default()
    cfg = tiny_cfg(arch, vocab=tok.vocab_size)
    cfg.meta.algo = algo
    cfg.meta.inner_steps = inner_steps
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
