"""AOT serving bundle (metaasr_tpu/serve): jax.export round trip.

Covers: serialize -> deserialize -> execute parity against the in-process
jitted decode path (token-identical, scores close), multi-platform
lowering (cpu+tpu from a CPU host), adapted-params hot-swap through the
same compiled artifact (the meta-serving pattern), and the shallow-fusion
LM riding inside the bundle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.serve import ExportSpec, ServingDecoder, export_bundle, make_decode_fn
from metaasr_tpu.train.task import ASRTask
from tests.test_m2_models import tiny_cfg


def _setup(vocab_tok=None, lm=False):
    tok = vocab_tok or CharTokenizer.ascii_default()
    cfg = tiny_cfg("transformer", vocab=tok.vocab_size)
    cfg.data.max_tokens = 10
    cfg.train.beam_size = 3
    task = ASRTask(cfg, tok.sos_eos_id)
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(0.1 * rng.standard_normal((2, 8000)), jnp.float32),
        "audio_lens": jnp.asarray([8000, 5000], np.int32),
        "tokens": jnp.asarray(rng.integers(1, tok.vocab_size - 1, (2, 8)),
                              jnp.int32),
        "token_lens": jnp.asarray([8, 5], np.int32),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)
    lm_params = None
    if lm:
        from metaasr_tpu.models.lm import LSTMLM

        lm_model = LSTMLM(vocab_size=tok.vocab_size, embed_dim=8, hidden=12,
                          layers=1)
        lm_params = lm_model.init(jax.random.PRNGKey(1),
                                  jnp.zeros((1, 2), jnp.int32))["params"]
        cfg.train.lm_weight = 0.3
        cfg.train.lm_ckpt = "(in-memory)"
    return cfg, task, tok, params, lm_params, rng


def _waves(rng, lens=(8000, 5000)):
    return [np.asarray(0.1 * rng.standard_normal(n), np.float32)
            for n in lens]


def _direct(cfg, task, params, waves, bucket, lm_params=None):
    """Reference output: the in-process jitted decode fn on the same padded
    bucket ServingDecoder.transcribe builds."""
    from metaasr_tpu.serve.export import _beam_cfg_from_train

    bsz, width = bucket
    x = np.zeros((bsz, width), np.float32)
    lens = []
    for i, w in enumerate(waves):
        x[i, : len(w)] = w
        lens.append(len(w))
    lens = lens + [lens[-1]] * (bsz - len(waves))
    for j in range(len(waves), bsz):
        x[j] = x[len(waves) - 1]
    lm_model = None
    if lm_params is not None:
        from metaasr_tpu.models.lm import LSTMLM, lm_dims_from_params

        lm_model = LSTMLM(**lm_dims_from_params(lm_params))
    bs_cfg = _beam_cfg_from_train(cfg, lm_active=lm_model is not None)
    fn = make_decode_fn(task, bs_cfg, lm_model=lm_model, lm_params=lm_params)
    return jax.jit(fn)(params, jnp.asarray(x), jnp.asarray(lens, jnp.int32))


def test_export_bundle_roundtrip_parity(tmp_path):
    cfg, task, tok, params, _, rng = _setup()
    bucket = (3, 8000)
    export_bundle(cfg, params, tok, str(tmp_path),
                  spec=ExportSpec(buckets=(bucket,), platforms=("cpu",)))
    dec = ServingDecoder(str(tmp_path))
    waves = _waves(rng)
    got = dec.transcribe(waves, nbest=2)

    ref = _direct(cfg, task, params, waves, bucket)
    toks = np.asarray(ref["tokens"])
    lengths = np.asarray(ref["lengths"])
    scores = np.asarray(ref["scores"])
    for i in range(2):
        assert got[i]["text"] == tok.decode(toks[i, 0, : lengths[i, 0]])
        np.testing.assert_allclose(got[i]["score"], scores[i, 0], rtol=1e-5)
        assert len(got[i]["nbest"]) == 2
        assert got[i]["nbest"][0]["hyp"] == got[i]["text"]


def test_export_multiplatform_and_bucket_choice(tmp_path):
    """cpu+tpu lowering succeeds from a CPU host; transcribe picks the
    smallest bucket that fits and errors past the largest."""
    cfg, task, tok, params, _, rng = _setup()
    export_bundle(cfg, params, tok, str(tmp_path),
                  spec=ExportSpec(buckets=((2, 6000), (3, 8000)),
                                  platforms=("cpu", "tpu")))
    dec = ServingDecoder(str(tmp_path))
    assert dec.meta["platforms"] == ["cpu", "tpu"]
    assert dec._pick_bucket(1, 5000) == (2, 6000)
    assert dec._pick_bucket(3, 5000) == (3, 8000)
    with pytest.raises(ValueError):
        dec._pick_bucket(4, 5000)
    with pytest.raises(ValueError):
        dec._pick_bucket(1, 9000)
    out = dec.transcribe(_waves(rng, (5000,)))
    assert len(out) == 1 and isinstance(out[0]["text"], str)


def test_export_hot_swap_adapted_params(tmp_path):
    """Adapted weights flow through the SAME deserialized program (no
    re-export) and reproduce the direct decode with those weights."""
    cfg, task, tok, params, _, rng = _setup()
    bucket = (2, 8000)
    export_bundle(cfg, params, tok, str(tmp_path),
                  spec=ExportSpec(buckets=(bucket,), platforms=("cpu",)))
    dec = ServingDecoder(str(tmp_path))

    adapted = jax.tree.map(lambda a: a + 0.01, params)
    waves = _waves(rng)
    got = dec.transcribe(waves, params=adapted)
    ref = _direct(cfg, task, adapted, waves, bucket)
    toks, lengths = np.asarray(ref["tokens"]), np.asarray(ref["lengths"])
    for i in range(2):
        assert got[i]["text"] == tok.decode(toks[i, 0, : lengths[i, 0]])
    # and differs from the bundle's baked params on at least the score
    base = dec.transcribe(waves)
    assert any(abs(base[i]["score"] - got[i]["score"]) > 1e-9
               for i in range(2))


def test_export_with_fusion_lm(tmp_path):
    """Bundle with a shallow-fusion LM: parity vs the direct fused beam;
    acoustic hot-swap keeps the bundle's LM weights."""
    cfg, task, tok, params, lm_params, rng = _setup(lm=True)
    bucket = (2, 8000)
    export_bundle(cfg, params, tok, str(tmp_path),
                  spec=ExportSpec(buckets=(bucket,), platforms=("cpu",)),
                  lm_params=lm_params)
    dec = ServingDecoder(str(tmp_path))
    assert dec.meta["has_lm"] and dec.meta["beam"]["lm_weight"] == 0.3
    waves = _waves(rng)
    got = dec.transcribe(waves)
    ref = _direct(cfg, task, params, waves, bucket, lm_params=lm_params)
    toks, lengths = np.asarray(ref["tokens"]), np.asarray(ref["lengths"])
    scores = np.asarray(ref["scores"])
    for i in range(2):
        assert got[i]["text"] == tok.decode(toks[i, 0, : lengths[i, 0]])
        np.testing.assert_allclose(got[i]["score"], scores[i, 0], rtol=1e-5)
    # hot-swap only the acoustic tree; __lm__ is re-attached internally
    swapped = dec.transcribe(waves, params=jax.tree.map(
        lambda a: a + 0.01, params))
    assert isinstance(swapped[0]["text"], str)


def test_transcribe_stream_matches_sync(tmp_path):
    """Pipelined serving (every batch dispatched before any read) yields
    exactly the per-batch sync results, in order."""
    cfg, task, tok, params, _, rng = _setup()
    export_bundle(cfg, params, tok, str(tmp_path),
                  spec=ExportSpec(buckets=((2, 8000),), platforms=("cpu",)))
    dec = ServingDecoder(str(tmp_path))
    batches = [_waves(rng), _waves(rng, (7000, 4000)), _waves(rng, (3000,))]
    streamed = list(dec.transcribe_stream(iter(batches)))
    sync = [dec.transcribe(b) for b in batches]
    assert streamed == sync


def test_transcribe_files_wav_front_door(tmp_path):
    """WAV files through the native loader reproduce the in-memory
    transcribe of the same samples."""
    from metaasr_tpu.data.audio_io import write_wav

    cfg, task, tok, params, _, rng = _setup()
    export_bundle(cfg, params, tok, str(tmp_path / "bundle"),
                  spec=ExportSpec(buckets=((2, 8000),), platforms=("cpu",)))
    dec = ServingDecoder(str(tmp_path / "bundle"))
    waves = _waves(rng)
    paths = []
    for i, w in enumerate(waves):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, w, rate=16000)
        paths.append(p)
    got = dec.transcribe_files(paths)
    # PCM16 quantization perturbs samples by <=1/32768 — texts must agree
    # (scores can move at fp noise); compare against transcribe of the
    # QUANTIZED waves for exactness
    quant = [np.round(np.clip(w, -1, 1) * 32767).astype(np.int16)
             .astype(np.float32) / 32767.0 for w in waves]
    want = dec.transcribe(quant)
    assert [g["text"] for g in got] == [w["text"] for w in want]


def test_export_greedy_vgg_blstm(tmp_path):
    """Greedy-CTC export covers the VGG-BLSTM phone baseline (config 1):
    bundle output ≡ the in-process task.greedy_ctc texts."""
    from metaasr_tpu.decode.greedy import greedy_to_texts

    tok = CharTokenizer.ascii_default()
    cfg = tiny_cfg("vgg_blstm", vocab=tok.vocab_size)
    task = ASRTask(cfg, tok.sos_eos_id)
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(0.1 * rng.standard_normal((2, 8000)), jnp.float32),
        "audio_lens": jnp.asarray([8000, 5000], np.int32),
        "tokens": jnp.asarray(rng.integers(1, tok.vocab_size - 1, (2, 8)),
                              jnp.int32),
        "token_lens": jnp.asarray([8, 5], np.int32),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError):  # beam needs the joint transformer
        export_bundle(cfg, params, tok, str(tmp_path / "x"),
                      spec=ExportSpec(buckets=((2, 8000),),
                                      platforms=("cpu",), mode="beam"))
    export_bundle(cfg, params, tok, str(tmp_path),
                  spec=ExportSpec(buckets=((2, 8000),), platforms=("cpu",),
                                  mode="greedy"))
    dec = ServingDecoder(str(tmp_path))
    assert dec.meta["mode"] == "greedy"
    waves = [np.asarray(batch["audio"][i, : int(batch["audio_lens"][i])])
             for i in range(2)]
    got = dec.transcribe(waves)

    packed, out_lens = task.greedy_ctc(params, batch["audio"],
                                       batch["audio_lens"])
    want = greedy_to_texts(packed, out_lens, tok)
    assert [g["text"] for g in got] == want


def test_export_bf16_weights_bundle(tmp_path):
    """weights_dtype=bfloat16: the bundle stores bf16 leaves (half the
    npz), the exported program's param argument IS bf16 (weight HBM reads
    halve at serving), outputs are token-identical to running the direct
    fp32 program on the same bf16-rounded weights, and fp32 hot-swapped
    trees are cast to match the argument spec."""
    import ml_dtypes

    from metaasr_tpu.serve import cast_weights
    from metaasr_tpu.serve.export import _load_bundle_params

    cfg, task, tok, params, _, rng = _setup()
    bucket = (2, 8000)
    export_bundle(cfg, params, tok, str(tmp_path),
                  spec=ExportSpec(buckets=(bucket,), platforms=("cpu",),
                                  weights_dtype="bfloat16"))
    dec = ServingDecoder(str(tmp_path))
    assert dec.meta["weights_dtype"] == "bfloat16"

    # every float leaf round-trips npz as bf16 (not void/uint16/fp32)
    stored = _load_bundle_params(str(tmp_path / "params.npz"))
    leaves = jax.tree.leaves(stored)
    assert leaves and all(
        leaf.dtype == ml_dtypes.bfloat16 for leaf in leaves
        if np.issubdtype(leaf.dtype, np.floating)
        or leaf.dtype == ml_dtypes.bfloat16)
    assert any(leaf.dtype == ml_dtypes.bfloat16 for leaf in leaves)

    waves = _waves(rng)
    got = dec.transcribe(waves)
    # reference: the in-process fp32 program fed the SAME bf16 weights
    # (promotion keeps f32 accumulation, so this pins the bundle numerics)
    bf16_params = cast_weights(params, "bfloat16")
    ref = _direct(cfg, task, bf16_params, waves, bucket)
    toks, lengths = np.asarray(ref["tokens"]), np.asarray(ref["lengths"])
    for i in range(2):
        assert got[i]["text"] == tok.decode(toks[i, 0, : lengths[i, 0]])

    # fp32 hot-swap: ServingDecoder casts to the bf16 argument spec
    adapted = jax.tree.map(lambda a: a + 0.01, params)
    swapped = dec.transcribe(waves, params=adapted)
    ref2 = _direct(cfg, task, cast_weights(adapted, "bfloat16"), waves,
                   bucket)
    toks2, lengths2 = np.asarray(ref2["tokens"]), np.asarray(ref2["lengths"])
    for i in range(2):
        assert swapped[i]["text"] == tok.decode(toks2[i, 0, : lengths2[i, 0]])

    with pytest.raises(ValueError):
        export_bundle(cfg, params, tok, str(tmp_path / "bad"),
                      spec=ExportSpec(buckets=(bucket,), platforms=("cpu",),
                                      weights_dtype="float16"))


def test_bundle_version_gate(tmp_path):
    """ADVICE r3: v2 writers stamp 2; readers accept {1,2} (the loader
    reads v1 npz layouts unchanged) and reject anything else crisply."""
    import json

    from metaasr_tpu.serve.export import (
        BUNDLE_VERSION,
        COMPATIBLE_BUNDLE_VERSIONS,
    )

    assert BUNDLE_VERSION == 2 and set(COMPATIBLE_BUNDLE_VERSIONS) == {1, 2}
    cfg, task, tok, params, _, rng = _setup()
    manifest = export_bundle(cfg, params, tok, str(tmp_path),
                             spec=ExportSpec(buckets=((2, 8000),),
                                             platforms=("cpu",)))
    assert manifest["version"] == 2
    meta_path = tmp_path / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["version"] = 1  # old bundle: still loads (npz layout is a superset)
    meta_path.write_text(json.dumps(meta))
    dec = ServingDecoder(str(tmp_path))
    assert dec.transcribe(_waves(rng))[0]["text"] is not None
    meta["version"] = 99
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="bundle version"):
        ServingDecoder(str(tmp_path))


def test_hot_swap_cast_cached_per_tree(tmp_path, monkeypatch):
    """ADVICE r3: repeated dispatches with the SAME hot-swapped tree must
    not repay the full-tree cast — the bf16 cast runs once per tree object,
    and a different tree invalidates the single-entry cache."""
    from metaasr_tpu.serve import export as exp

    cfg, task, tok, params, _, rng = _setup()
    export_bundle(cfg, params, tok, str(tmp_path),
                  spec=ExportSpec(buckets=((2, 8000),), platforms=("cpu",),
                                  weights_dtype="bfloat16"))
    dec = ServingDecoder(str(tmp_path))
    calls = []
    real = exp.cast_weights
    monkeypatch.setattr(exp, "cast_weights",
                        lambda p, d: (calls.append(1), real(p, d))[1])
    adapted = jax.tree.map(lambda a: a + 0.01, params)
    waves = _waves(rng)
    first = dec.transcribe(waves, params=adapted)
    assert len(calls) == 1
    again = dec.transcribe(waves, params=adapted)
    assert len(calls) == 1, "same tree re-dispatched must hit the cache"
    assert [r["text"] for r in again] == [r["text"] for r in first]
    adapted2 = jax.tree.map(lambda a: a + 0.02, params)
    dec.transcribe(waves, params=adapted2)
    assert len(calls) == 2, "a new tree must invalidate the cache"


def test_packed_outputs_roundtrip_and_parity(tmp_path):
    """packed=True bundles return ONE int32 array per dispatch (single D2H
    fetch on the serving hot path); results must be identical to a
    packed=False bundle of the same model, and pack->unpack must be exact
    including the float32 score bitcast."""
    from metaasr_tpu.serve import pack_decode_outputs, unpack_decode_outputs

    # exactness of the pack/unpack pair, scores bitcast included
    rng = np.random.default_rng(0)
    out = {"tokens": jnp.asarray(rng.integers(0, 30, (2, 3, 5)), jnp.int32),
           "lengths": jnp.asarray(rng.integers(0, 6, (2, 3)), jnp.int32),
           "scores": jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)}
    packed = np.asarray(jax.jit(pack_decode_outputs)(out))
    assert packed.shape == (2, 3, 7) and packed.dtype == np.int32
    un = unpack_decode_outputs(packed)
    np.testing.assert_array_equal(un["tokens"], np.asarray(out["tokens"]))
    np.testing.assert_array_equal(un["lengths"], np.asarray(out["lengths"]))
    np.testing.assert_array_equal(un["scores"], np.asarray(out["scores"]))

    cfg, task, tok, params, _, rng = _setup()
    bucket = (2, 8000)
    export_bundle(cfg, params, tok, str(tmp_path / "packed"),
                  spec=ExportSpec(buckets=(bucket,), platforms=("cpu",),
                                  packed=True))
    export_bundle(cfg, params, tok, str(tmp_path / "dict"),
                  spec=ExportSpec(buckets=(bucket,), platforms=("cpu",),
                                  packed=False))
    dp = ServingDecoder(str(tmp_path / "packed"))
    dd = ServingDecoder(str(tmp_path / "dict"))
    assert dp.meta["packed"] and not dd.meta["packed"]
    raw, _ = dp._dispatch(_waves(rng), None)
    assert not isinstance(raw, dict), "packed bundle must emit one array"
    waves = _waves(np.random.default_rng(7))
    got_p = dp.transcribe(waves, nbest=3)
    got_d = dd.transcribe(waves, nbest=3)
    assert got_p == got_d
