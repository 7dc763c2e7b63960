"""Round-2 coverage: exact mono resume, preemption-safe best tracking,
multi-host row-split feeding, SpecAugment time-warp geometry, multitask
proportional sampling, precomputed-feature (feats) manifests, phone-vocab
bucket sizing."""

import json
import os

import jax
import numpy as np
import pytest

from metaasr_tpu.config import Config
from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.sampler import BucketBatcher, TaskSampler, collate
from metaasr_tpu.data.tokenizer import CharTokenizer, PhoneTokenizer
from metaasr_tpu.train.mono import MonoASRTrainer, MultitaskASRTrainer
from metaasr_tpu.train.task import ASRTask


def _tiny_cfg(tok, arch="vgg_blstm"):
    cfg = Config()
    cfg.model.arch = arch
    cfg.model.vocab_size = tok.vocab_size
    cfg.model.blstm_hidden = 16
    cfg.model.blstm_layers = 1
    cfg.model.vgg_channels = (4,)
    cfg.model.d_model = 32
    cfg.model.num_heads = 2
    cfg.model.d_ff = 64
    cfg.model.num_encoder_layers = 2
    cfg.model.num_decoder_layers = 2
    cfg.model.dtype = "float32"
    cfg.model.dropout = 0.0
    cfg.specaug.enabled = False
    cfg.frontend.use_pallas = False
    cfg.data.batch_size = 4
    cfg.data.max_frames = 100
    cfg.data.max_tokens = 16
    cfg.optimizer.schedule = "constant"
    cfg.optimizer.lr = 1e-3
    cfg.train.log_every = 10**9
    cfg.train.eval_every = 10**9
    cfg.train.ckpt_every = 10**9
    return cfg


# ---------- exact mono resume (SURVEY.md section 5.3; VERDICT r1 #6) ----------


@pytest.mark.slow
def test_mono_train_resume_exact(synthetic_data_dir, tmp_path):
    tok = CharTokenizer.ascii_default()

    def make(workdir):
        cfg = _tiny_cfg(tok)
        dsets = load_accent_datasets(synthetic_data_dir, tok)
        task = ASRTask(cfg, tok.sos_eos_id)
        return MonoASRTrainer(cfg, task, list(dsets.values())[:2], None,
                              tok, workdir)

    t_full = make(str(tmp_path / "full"))
    s_full = t_full.train(max_steps=4)

    t_a = make(str(tmp_path / "resumed"))
    s_a = t_a.train(max_steps=2)
    assert int(s_a.step) == 2
    t_a.ckpt.close()
    t_b = make(str(tmp_path / "resumed"))
    s_b = t_b.train(max_steps=4)
    assert int(s_b.step) == 4

    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bucket_batcher_iter_from_deterministic(synthetic_data_dir):
    tok = CharTokenizer.ascii_default()
    dsets = list(load_accent_datasets(synthetic_data_dir, tok).values())
    b = BucketBatcher(dsets, batch_size=3, seed=7, tokenizer=tok)
    bpe = b.batches_per_epoch
    assert bpe > 0
    # stream of 2 epochs + 1 batch, taken contiguously
    stream = []
    it = b.iter_from(0)
    for _ in range(2 * bpe + 1):
        stream.append(next(it))
    # resuming mid-epoch and at an epoch boundary replays the same batches
    for start in (1, bpe - 1, bpe, bpe + 2):
        it2 = b.iter_from(start)
        for k in range(3):
            got = next(it2)
            want = stream[start + k]
            np.testing.assert_array_equal(got["audio"], want["audio"])
            assert got["texts"] == want["texts"]
    # different epochs use different permutations
    epoch0 = [r for _, r in b._epoch_refs(0)]
    epoch1 = [r for _, r in b._epoch_refs(1)]
    assert epoch0 != epoch1


# ---------- preemption-safe best tracking (ADVICE r1 medium) ----------


@pytest.mark.slow
def test_best_metric_survives_restore(synthetic_data_dir, tmp_path):
    tok = CharTokenizer.ascii_default()
    cfg = _tiny_cfg(tok)
    cfg.train.eval_every = 2
    dsets = list(load_accent_datasets(synthetic_data_dir, tok).values())
    task = ASRTask(cfg, tok.sos_eos_id)
    tr = MonoASRTrainer(cfg, task, dsets[:1], dsets[1], tok,
                        str(tmp_path / "wd"))
    state = tr.train(max_steps=2)  # one eval at step 2 -> best_metric set
    best = float(state.best_metric)
    assert np.isfinite(best)
    tr.ckpt.close()

    tr2 = MonoASRTrainer(cfg, task, dsets[:1], dsets[1], tok,
                         str(tmp_path / "wd"))
    restored, step = tr2.ckpt.restore(tr2.init_state())
    assert step == 2
    # the in-state best metric survives the restore: the first eval after a
    # resume can never clobber 'best' with a worse checkpoint
    assert float(restored.best_metric) == pytest.approx(best)
    assert int(restored.stale_evals) == int(state.stale_evals)


# ---------- multi-host data feeding (SURVEY.md section 5.8; VERDICT r1 #2) ---


def test_multihost_row_split_assembles_global_batch(synthetic_data_dir):
    """Two simulated hosts each collate only their own task rows; the
    concatenation must equal the single-host global batch exactly."""
    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(synthetic_data_dir, tok)
    s = TaskSampler(dsets, k_support=2, k_query=2, tasks_per_batch=4,
                    num_samples=16000, num_tokens=16, seed=3)
    full = s.sample(step=5)
    h0 = s.sample(step=5, rows=slice(0, 2))
    h1 = s.sample(step=5, rows=slice(2, 4))
    for side in ("support", "query"):
        for key in full[side]:
            if key == "texts":
                assert full[side][key] == h0[side][key] + h1[side][key]
                continue
            np.testing.assert_array_equal(
                full[side][key],
                np.concatenate([h0[side][key], h1[side][key]], axis=0))


def test_make_global_meta_batch_shards_on_mesh(synthetic_data_dir):
    """Single-host path of the trainer's multi-host assembly: arrays land
    with the ('task','data') sharding and the values round-trip."""
    from metaasr_tpu.parallel.distributed import make_global_meta_batch
    from metaasr_tpu.parallel.mesh import make_mesh, meta_batch_shardings

    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(synthetic_data_dir, tok)
    s = TaskSampler(dsets, k_support=2, k_query=2, tasks_per_batch=4,
                    num_samples=16000, num_tokens=16, seed=3)
    mb = s.sample(step=1)
    local = {side: {k: v for k, v in mb[side].items() if k != "texts"}
             for side in ("support", "query")}
    mesh = make_mesh(num_task=4)
    out = make_global_meta_batch(mesh, local, meta_batch_shardings(mesh))
    sup = out["support"]["audio"]
    assert sup.sharding.spec == jax.sharding.PartitionSpec("task", "data")
    np.testing.assert_array_equal(np.asarray(sup),
                                  local["support"]["audio"])


# ---------- SpecAugment time-warp (SURVEY.md section 2.1 #17) ----------


def test_time_warp_geometry():
    from metaasr_tpu.frontend.specaug import spec_augment, time_warp

    rng = jax.random.PRNGKey(0)
    bsz, t_len, d = 4, 60, 8
    feats = jax.numpy.asarray(
        np.random.default_rng(0).standard_normal((bsz, t_len, d)).astype(
            np.float32))
    # row 2 is too short to warp (L <= 2W+2); row 3 has padding
    lens = jax.numpy.asarray(np.array([60, 50, 10, 40], np.int32))
    warped = time_warp(rng, feats, lens, warp=5)
    w = np.asarray(warped)
    f = np.asarray(feats)
    assert w.shape == f.shape
    # frame 0 is a fixed point of the piecewise-linear map
    np.testing.assert_allclose(w[:, 0], f[:, 0], rtol=1e-6)
    # too-short utterance passes through unchanged
    np.testing.assert_allclose(w[2], f[2], rtol=1e-6)
    # padding frames (t >= L) pass through unchanged
    np.testing.assert_allclose(w[3, 40:], f[3, 40:], rtol=1e-6)
    # a warpable utterance is actually warped somewhere
    assert np.abs(w[0] - f[0]).max() > 1e-4

    # spec_augment with time_warp=0 and no masks is the identity
    out = spec_augment(rng, feats, lens, num_freq_masks=0, num_time_masks=0,
                       time_warp=0)
    np.testing.assert_array_equal(np.asarray(out), f)
    # with time_warp=5 it differs (and stays finite)
    out = spec_augment(rng, feats, lens, num_freq_masks=0, num_time_masks=0,
                       time_warp=5)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - f).max() > 1e-4


# ---------- multitask (SURVEY.md section 2.1 #4; VERDICT r1 #9) ----------


def test_multitask_sampling_proportional(synthetic_data_dir):
    """Pooled bucketing draws each accent proportional to its size
    (BASELINE.json:8): count per-dataset membership over one epoch."""
    tok = CharTokenizer.ascii_default()
    dsets = list(load_accent_datasets(synthetic_data_dir, tok).values())[:2]
    # shrink dataset 0 to a third of dataset 1
    dsets[0].manifest.utts = dsets[0].manifest.utts[:4]
    b = BucketBatcher(dsets, batch_size=2, seed=0, tokenizer=tok,
                      drop_last=False)
    counts = [0, 0]
    for _, refs in b._epoch_refs(0):
        for di, _ in refs:
            counts[di] += 1
    assert counts[0] == 4 and counts[1] == 12  # every utterance, once


@pytest.mark.slow
def test_multitask_trainer_smoke(synthetic_data_dir, tmp_path):
    tok = CharTokenizer.ascii_default()
    cfg = _tiny_cfg(tok)
    dsets = load_accent_datasets(synthetic_data_dir, tok)
    task = ASRTask(cfg, tok.sos_eos_id)
    tr = MultitaskASRTrainer(cfg, task, dsets, None, tok, str(tmp_path))
    state = tr.train(max_steps=3)
    assert int(state.step) == 3
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


# ---------- precomputed-feature manifests (ADVICE r1; SURVEY 2.1 #12) --------


@pytest.fixture(scope="module")
def feats_data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("featsdata")
    rng = np.random.default_rng(0)
    words = ["aba", "bede", "cide", "dofu"]
    for accent in ("golf", "hotel"):
        os.makedirs(os.path.join(d, "feats", accent), exist_ok=True)
        lines = []
        for i in range(10):
            t = int(rng.integers(30, 90))
            arr = rng.standard_normal((t, 80)).astype(np.float32)
            rel = os.path.join("feats", accent, f"{accent}_{i}.npy")
            np.save(os.path.join(d, rel), arr)
            text = " ".join(words[int(j)] for j in rng.integers(0, 4, 2))
            lines.append(json.dumps({
                "id": f"{accent}_{i}", "feats": rel, "text": text,
                "num_samples": t * 160 + 240}))
        with open(os.path.join(d, f"{accent}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return str(d)


def test_feats_mode_collate_and_loss(feats_data_dir):
    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(feats_data_dir, tok)
    ds = dsets["golf"]
    item = ds[0]
    assert "feats" in item and "audio" not in item
    batch = collate([ds[i] for i in range(4)], 16000, 16)
    assert batch["feats"].shape == (4, 98, 80)  # num_frames(16000) == 98
    assert batch["feat_lens"].max() <= 98
    cfg = _tiny_cfg(tok)
    task = ASRTask(cfg, tok.sos_eos_id)
    db = {k: v for k, v in batch.items() if k != "texts"}
    params = task.init_params(jax.random.PRNGKey(0), db)
    loss, _ = task.loss_fn(params, db, jax.random.PRNGKey(1), True)
    assert np.isfinite(float(loss))
    # greedy decode path
    packed, out_lens = task.greedy_batch(params, batch)
    assert packed.shape[0] == 4


@pytest.mark.slow
def test_feats_mode_mono_train_and_eval(feats_data_dir, tmp_path):
    tok = CharTokenizer.ascii_default()
    cfg = _tiny_cfg(tok)
    cfg.specaug.enabled = True  # exercised through preprocess on feats
    dsets = list(load_accent_datasets(feats_data_dir, tok).values())
    task = ASRTask(cfg, tok.sos_eos_id)
    tr = MonoASRTrainer(cfg, task, dsets[:1], dsets[1], tok, str(tmp_path))
    state = tr.train(max_steps=2)
    assert int(state.step) == 2
    scores = tr.evaluate(state.params, dsets[1], max_utts=6)
    assert 0.0 <= scores["cer"]


def test_mixed_payload_collate_raises(feats_data_dir, synthetic_data_dir):
    tok = CharTokenizer.ascii_default()
    f_ds = load_accent_datasets(feats_data_dir, tok)["golf"]
    a_ds = list(load_accent_datasets(synthetic_data_dir, tok).values())[0]
    with pytest.raises(ValueError, match="mix"):
        collate([f_ds[0], a_ds[0]], 16000, 16)


# ---------- phone-vocab bucket sizing (ADVICE r1 low) ----------


def test_phone_bucket_no_label_truncation(tmp_path):
    """Token buckets sized from the real tokenizer never truncate labels,
    even when token count exceeds naive character heuristics."""
    d = tmp_path / "phonedata"
    os.makedirs(d, exist_ok=True)
    tok = PhoneTokenizer.arpabet_default()
    # 20 phones -> 20 tokens; crafted so token count drives the bucket
    phones = " ".join(["AA", "B", "K", "S"] * 5)
    lines = [json.dumps({
        "id": f"u{i}", "wav": None, "feats": f"f{i}.npy", "text": "x" * 3,
        "phones": phones, "num_samples": 8240}) for i in range(4)]
    for i in range(4):
        np.save(os.path.join(d, f"f{i}.npy"),
                np.zeros((50, 80), np.float32))
    with open(os.path.join(d, "zulu.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")
    dsets = load_accent_datasets(str(d), tok, vocab="phone")
    b = BucketBatcher(list(dsets.values()), batch_size=2,
                      token_buckets=(8, 16, 32), tokenizer=tok)
    for batch in b:
        # every label sequence fits its bucket: no silent truncation
        true_len = len(tok.encode(phones))
        assert (batch["token_lens"] == true_len).all()
        assert batch["tokens"].shape[1] >= true_len

# ---------- bucketed meta batches (SURVEY.md 5.7; VERDICT r1 #4) ----------


def test_meta_bucket_shapes(synthetic_data_dir):
    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(synthetic_data_dir, tok)
    cap_s, cap_u = 32240, 32
    buckets = (6640, 9840, 16240, cap_s)
    s = TaskSampler(dsets, k_support=1, k_query=1, tasks_per_batch=2,
                    num_samples=cap_s, num_tokens=cap_u, seed=0,
                    sample_buckets=buckets, token_buckets=(8, 16, cap_u))
    shapes = set()
    for step in range(20):
        mb = s.sample(step)
        sh = (mb["support"]["audio"].shape[2], mb["support"]["tokens"].shape[2])
        assert sh[0] in buckets and sh[1] in (8, 16, cap_u)
        # no truncation: every drawn utterance fits the chosen bucket
        assert int(mb["support"]["audio_lens"].max()) <= sh[0]
        assert int(mb["support"]["token_lens"].max()) <= sh[1]
        assert int(mb["query"]["audio_lens"].max()) <= sh[0]
        # support and query share one shape (one compiled step per bucket)
        assert mb["query"]["audio"].shape[2] == sh[0]
        shapes.add(sh)
        # shape choice is global across rows: a host collating only row
        # 1:2 (whose own utterances may be shorter) produces the same shape
        part = s.sample(step, rows=slice(1, 2))
        assert part["support"]["audio"].shape[2] == sh[0]
        assert part["support"]["tokens"].shape[2] == sh[1]
    assert len(shapes) > 1  # realistic spread actually uses several buckets


@pytest.mark.slow
def test_resident_equals_streaming_with_buckets(synthetic_data_dir, tmp_path):
    """The resident gather+static-slice path and the streaming collate
    path must produce identical params under bucketed meta batches."""
    from metaasr_tpu.train.meta_train import MetaASRTrainer

    tok = CharTokenizer.ascii_default()

    def run(mode, wd):
        cfg = _tiny_cfg(tok)
        cfg.meta.tasks_per_batch = 2
        cfg.meta.k_support = 2
        cfg.meta.k_query = 2
        cfg.meta.inner_steps = 1
        cfg.data.resident = mode
        cfg.data.max_frames = 200
        cfg.data.frame_buckets = (60, 100, 200)
        cfg.data.token_buckets = (8, 16)
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
