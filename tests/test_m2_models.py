"""M2: model shapes, padding invariance, greedy decode, end-to-end smoke
training on synthetic data (SURVEY.md section 4.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaasr_tpu.config import Config
from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.decode.greedy import collapse_ctc, ctc_greedy_decode
from metaasr_tpu.models.losses import prepare_decoder_targets
from metaasr_tpu.models.transformer import TransformerASR
from metaasr_tpu.models.vgg_blstm import VGGBLSTMCTC, flip_padded
from metaasr_tpu.train.task import ASRTask


def tiny_cfg(arch="vgg_blstm", vocab=30):
    cfg = Config()
    cfg.model.arch = arch
    cfg.model.vocab_size = vocab
    cfg.model.d_model = 32
    cfg.model.num_heads = 2
    cfg.model.d_ff = 64
    cfg.model.num_encoder_layers = 2
    cfg.model.num_decoder_layers = 2
    cfg.model.blstm_hidden = 24
    cfg.model.blstm_layers = 1
    cfg.model.vgg_channels = (4, 8)
    cfg.model.dtype = "float32"
    cfg.model.dropout = 0.0
    cfg.specaug.enabled = False
    # interpret-mode pallas is slow on the CPU test backend; the kernel has
    # its own dedicated equivalence tests (test_m3_pallas.py)
    cfg.frontend.use_pallas = False
    return cfg


def test_flip_padded_involution(rng):
    x = jnp.asarray(rng.standard_normal((3, 7, 2)).astype(np.float32))
    lens = jnp.array([7, 4, 1])
    y = flip_padded(flip_padded(x, lens), lens)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    # padding positions unchanged by a single flip
    one = flip_padded(x, lens)
    np.testing.assert_allclose(np.asarray(one[1, 4:]), np.asarray(x[1, 4:]))


def test_vgg_blstm_shapes_and_padding_invariance(rng):
    model = VGGBLSTMCTC(vocab_size=10, blstm_hidden=16, blstm_layers=1,
                        vgg_channels=(4, 8))
    feats = jnp.asarray(rng.standard_normal((2, 32, 80)).astype(np.float32))
    lens = jnp.array([32, 20])
    params = model.init(jax.random.PRNGKey(0), feats, lens)["params"]
    logits, out_lens = model.apply({"params": params}, feats, lens)
    assert logits.shape == (2, 8, 10)
    assert list(np.asarray(out_lens)) == [8, 5]
    # corrupt padding frames of utt 1 (frames >= 20): valid outputs unchanged
    feats2 = feats.at[1, 20:].set(99.0)
    logits2, _ = model.apply({"params": params}, feats2, lens)
    np.testing.assert_allclose(np.asarray(logits[1, :5]),
                               np.asarray(logits2[1, :5]), rtol=1e-4, atol=1e-5)


def test_subsampling_conv_matches_dense_window_oracle(rng):
    """Conv2dSubsampling's stride-2 VALID convs vs a direct dense-window
    numpy oracle (guards any future re-implementation of the subsampling
    front — see the module docstring for rewrites that were tried and
    reverted). nn.Conv's CPU lowering sits a few 1e-3 off the oracle, so
    the tolerance is loose."""
    import flax.linen as nn_

    for c_in in (1, 16):
        x = np.asarray(rng.standard_normal((2, 21, 19, c_in)), np.float32)
        mod = nn_.Conv(24, (3, 3), strides=(2, 2), padding="VALID")
        p = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(mod.apply(p, jnp.asarray(x)))
        k = np.asarray(p["params"]["kernel"])
        b = np.asarray(p["params"]["bias"])
        tp, fp = (21 - 3) // 2 + 1, (19 - 3) // 2 + 1
        assert y.shape == (2, tp, fp, 24)
        oracle = np.zeros_like(y)
        for t in range(tp):
            for f in range(fp):
                patch = x[:, 2 * t:2 * t + 3, 2 * f:2 * f + 3, :]
                oracle[:, t, f] = np.einsum("bijc,ijco->bo", patch, k) + b
        np.testing.assert_allclose(y, oracle, rtol=2e-2, atol=2e-2)


def test_transformer_shapes_and_padding_invariance(rng):
    model = TransformerASR(vocab_size=12, d_model=32, num_heads=2, d_ff=64,
                           num_encoder_layers=2, num_decoder_layers=2,
                           dropout=0.0)
    feats = jnp.asarray(rng.standard_normal((2, 35, 80)).astype(np.float32))
    lens = jnp.array([35, 19])
    tokens = jnp.asarray(rng.integers(1, 11, (2, 6)).astype(np.int32))
    tok_lens = jnp.array([6, 3])
    tin, tout, mask = prepare_decoder_targets(tokens, tok_lens, 11)
    params = model.init(jax.random.PRNGKey(0), feats, lens, tin, tok_lens + 1)["params"]
    out = model.apply({"params": params}, feats, lens, tin, tok_lens + 1)
    t_sub = (35 - 1) // 2
    t_sub = (t_sub - 1) // 2
    assert out["ctc_logits"].shape == (2, 8, 12)
    assert out["att_logits"].shape == (2, 7, 12)
    assert list(np.asarray(out["enc_lens"])) == [8, 4]
    # encoder padding invariance: corrupt frames past len of utt 1
    feats2 = feats.at[1, 19:].set(7.0)
    out2 = model.apply({"params": params}, feats2, lens, tin, tok_lens + 1)
    np.testing.assert_allclose(np.asarray(out["ctc_logits"][1, :4]),
                               np.asarray(out2["ctc_logits"][1, :4]),
                               rtol=2e-3, atol=2e-4)
    # decoder causality: changing token 4 must not affect logits at pos <= 3
    tin2 = tin.at[0, 4].set(5)
    out3 = model.apply({"params": params}, feats, lens, tin2, tok_lens + 1)
    np.testing.assert_allclose(np.asarray(out["att_logits"][0, :4]),
                               np.asarray(out3["att_logits"][0, :4]),
                               rtol=2e-3, atol=2e-4)
    assert bool(mask[1, 3]) and not bool(mask[1, 4])
    assert int(tout[1, 3]) == 11  # eos at len


def test_prepare_decoder_targets():
    tokens = jnp.array([[3, 4, 5], [6, 0, 0]])
    lens = jnp.array([3, 1])
    tin, tout, mask = prepare_decoder_targets(tokens, lens, 9)
    assert list(np.asarray(tin[0])) == [9, 3, 4, 5]
    assert list(np.asarray(tout[0])) == [3, 4, 5, 9]
    assert list(np.asarray(tin[1])) == [9, 6, 0, 0]
    assert list(np.asarray(tout[1])) == [6, 9, 0, 0]
    assert list(np.asarray(mask[1])) == [True, True, False, False]


def test_greedy_decode_matches_host_collapse(rng):
    logits = jnp.asarray(rng.standard_normal((3, 20, 6)).astype(np.float32))
    lens = jnp.array([20, 13, 1])
    packed, out_lens = ctc_greedy_decode(logits, lens)
    best = np.asarray(jnp.argmax(logits, -1))
    for b in range(3):
        ref = collapse_ctc(best[b, : int(lens[b])])
        got = list(np.asarray(packed[b, : int(out_lens[b])]))
        assert got == ref


@pytest.mark.slow
def test_mono_train_smoke(synthetic_data_dir, tmp_path):
    """End-to-end: loss decreases and CER beats random on synthetic data."""
    tok = CharTokenizer.ascii_default()
    cfg = tiny_cfg("vgg_blstm", vocab=tok.vocab_size)
    cfg.data.batch_size = 8
    cfg.optimizer.name = "adam"
    cfg.optimizer.lr = 2e-3
    cfg.optimizer.schedule = "constant"
    cfg.train.max_steps = 30
    cfg.train.log_every = 10
    cfg.train.eval_every = 10**9  # skip during-loop eval
    cfg.train.ckpt_every = 10**9
    from metaasr_tpu.train.mono import MonoASRTrainer

    dsets = load_accent_datasets(synthetic_data_dir, tok)
    task = ASRTask(cfg, tok.sos_eos_id)
    trainer = MonoASRTrainer(cfg, task, list(dsets.values()), None, tok,
                             str(tmp_path))
    # capture first/last loss through the logger file
    state = trainer.train(max_steps=30)
    assert int(state.step) == 30
    import json

    with open(f"{tmp_path}/logs/scalars.jsonl") as f:
        recs = [json.loads(l) for l in f if "loss" in l]
    assert recs[-1]["loss"] < recs[0]["loss"]
    # checkpoint round-trip
    state2, step = trainer.ckpt.restore(trainer.init_state())
    assert step == 30
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
