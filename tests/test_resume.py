"""Preemption-safe resume: meta-training N steps in one run must equal
training N/2 steps, killing, and resuming for N/2 more — identical params
(SURVEY.md section 5.3/5.4: orbax state + stateless-deterministic sampler)."""

import jax
import numpy as np
import pytest

from metaasr_tpu.config import Config
from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.train.meta_train import MetaASRTrainer
from metaasr_tpu.train.task import ASRTask


def _cfg(tok):
    cfg = Config()
    cfg.model.arch = "vgg_blstm"
    cfg.model.vocab_size = tok.vocab_size
    cfg.model.blstm_hidden = 16
    cfg.model.blstm_layers = 1
    cfg.model.vgg_channels = (4,)
    cfg.model.dtype = "float32"
    cfg.model.dropout = 0.0
    cfg.specaug.enabled = False
    cfg.frontend.use_pallas = False
    cfg.meta.tasks_per_batch = 2
    cfg.meta.k_support = 2
    cfg.meta.k_query = 2
    cfg.meta.inner_steps = 1
    cfg.data.max_frames = 100
    cfg.data.max_tokens = 16
    cfg.optimizer.schedule = "constant"
    cfg.optimizer.lr = 1e-3
    cfg.train.log_every = 10**9
    cfg.train.eval_every = 10**9
    cfg.train.ckpt_every = 10**9
    return cfg


@pytest.mark.slow
def test_meta_train_resume_exact(synthetic_data_dir, tmp_path):
    tok = CharTokenizer.ascii_default()

    def make(workdir):
        cfg = _cfg(tok)
        dsets = load_accent_datasets(synthetic_data_dir, tok)
        task = ASRTask(cfg, tok.sos_eos_id)
        return MetaASRTrainer(cfg, task, dsets, {}, tok, workdir)

    # one continuous run of 4 steps
    t_full = make(str(tmp_path / "full"))
    s_full = t_full.meta_train(max_steps=4)

    # 2 steps, checkpoint, then a FRESH trainer resumes to 4
    t_a = make(str(tmp_path / "resumed"))
    s_a = t_a.meta_train(max_steps=2)
    assert int(s_a.step) == 2
    t_a.ckpt.close()

    t_b = make(str(tmp_path / "resumed"))
    s_b = t_b.meta_train(max_steps=4)
    assert int(s_b.step) == 4

    for p_full, p_res in zip(jax.tree_util.tree_leaves(s_full.params),
                             jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(p_full), np.asarray(p_res),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_resident_equals_streaming(synthetic_data_dir, tmp_path):
    """Device-resident (index-gather) and streaming (collate+transfer)
    training paths must produce identical params: the meta batch is the
    same pure function of (seed, step) either way."""
    tok = CharTokenizer.ascii_default()

    def run(mode, wd):
        cfg = _cfg(tok)
        cfg.data.resident = mode
        dsets = load_accent_datasets(synthetic_data_dir, tok)
        task = ASRTask(cfg, tok.sos_eos_id)
        tr = MetaASRTrainer(cfg, task, dsets, {}, tok, str(tmp_path / wd))
        return tr.meta_train(max_steps=3)

    s_res = run("on", "res")
    s_str = run("off", "str")
    for a, b in zip(jax.tree_util.tree_leaves(s_res.params),
                    jax.tree_util.tree_leaves(s_str.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
