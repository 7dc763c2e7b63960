"""AOT export of the decode path (jax.export / StableHLO serving bundle).

What gets exported: ``fn(params, audio, audio_lens) -> {tokens, lengths,
scores}`` — the FULL inference pipeline (log-mel fbank + CMVN -> encoder ->
CTC head -> batched on-device joint CTC/attention beam search, optional
shallow-fusion LM) as one StableHLO program, one program per static
(batch, num_samples) bucket (XLA serving wants static shapes; buckets are
how the training pipeline already pads, SURVEY.md section 2.1 #13).

Design decisions, TPU-first:

- **Params are arguments, not constants.** The meta-learning serving
  pattern is: run ``meta_adapt`` on a new accent's k-shot support, then
  decode with the adapted weights. Baking weights into the artifact would
  force a re-export per accent; passing them keeps ONE compiled program
  serving every adapted parameter set (and keeps the artifact small).
- **Multi-platform by default** (``platforms=("cpu", "tpu")``): the
  artifact is built once anywhere (CI, a CPU host) and served on TPU.
  The export path therefore forces the portable jax fbank (the Pallas
  kernel is numerically equivalent — tests/test_pallas_fbank.py — but a
  Mosaic custom-call would pin the artifact to one platform).
- The bundle directory is self-contained: serialized program(s) per
  bucket, ``params.npz``, the tokenizer vocabulary, and a ``meta.json``
  manifest (shapes, beam config, fbank geometry, format version).

The reference has no counterpart (decode runs in-process only); this is
rebuild-side scope per the production/serving mandate.
"""

from __future__ import annotations

import copy
import dataclasses
import json
import os
from typing import Any, Sequence

import numpy as np

# v2: params.npz gained the __bf16_keys__ manifest entry (bf16 leaves
# stored as uint16 bit patterns). The loader reads v1 bundles unchanged,
# so readers accept both; writers stamp 2 so an OLD ServingDecoder fails
# the version gate crisply instead of dying on an opaque dtype mismatch.
BUNDLE_VERSION = 2
COMPATIBLE_BUNDLE_VERSIONS = (1, 2)


@dataclasses.dataclass(frozen=True)
class ExportSpec:
    """Static serving shapes + target platforms.

    buckets: (batch, num_samples) pairs in audio mode, (batch, num_frames)
    in feats mode. An incoming batch is padded to the smallest bucket that
    fits (same policy as the training loader's frame buckets).
    """

    buckets: tuple = ((8, 48000),)
    platforms: tuple = ("cpu", "tpu")
    from_feats: bool = False
    # "beam" (joint CTC/attention search — transformer only) or "greedy"
    # (argmax CTC collapse — any arch incl. the VGG-BLSTM phone baseline)
    mode: str = "beam"
    # pack tokens/lengths/scores into one int32 output array so serving
    # readback is a single D2H round trip (pack_decode_outputs). Default
    # on: the unpack is free on host and the fetch count dominates the
    # readback cost on a network-attached chip (docs/PROFILE.md).
    packed: bool = True
    # "float32" (default) or "bfloat16": cast float weights to bf16 in the
    # bundle AND in the exported program's parameter argument. The MXU
    # consumes bf16 operands natively and the sequential decoder steps are
    # weight-read-bound at serving batch sizes, so bf16 weights halve the
    # weight-side HBM traffic per step — and halve params.npz. Weights are
    # fed to the model directly as bf16 (no upcast materialization; mixed
    # bf16xf32 dots keep f32 accumulation), so the only numeric change is
    # one bf16 rounding of the weights. Hot-swapped params must then be
    # bf16 too (cast_weights below; ServingDecoder.transcribe does it).
    weights_dtype: str = "float32"


def pack_decode_outputs(out):
    """[traced] Fold {tokens [B,K,L] i32, lengths [B,K] i32, scores [B,K]
    f32} into ONE [B,K,L+2] int32 array (scores bitcast into the last
    lane).

    Motivation (docs/PROFILE.md decode section): on the network-attached
    TPU each host readback is round-trip-bound, not byte-bound — the
    pipelined decode path pays three blocking D2H fetches per batch
    (tokens, lengths, scores) out of ~11 ms/batch of non-compute wall
    time. One packed array makes that a single fetch; the concatenate is
    a few KB of device work.
    """
    import jax.numpy as jnp
    from jax import lax

    tokens = out["tokens"].astype(jnp.int32)
    lengths = out["lengths"].astype(jnp.int32)[:, :, None]
    scores = lax.bitcast_convert_type(
        out["scores"].astype(jnp.float32), jnp.int32)[:, :, None]
    return jnp.concatenate([tokens, lengths, scores], axis=2)


def unpack_decode_outputs(packed) -> dict:
    """[host] Inverse of pack_decode_outputs on the fetched array."""
    packed = np.asarray(packed)
    return {"tokens": packed[:, :, :-2],
            "lengths": packed[:, :, -2],
            "scores": packed[:, :, -1].view(np.float32)}


def cast_weights(params, dtype: str):
    """Cast every floating leaf to ``dtype`` (ints/bools untouched).

    Used at export time and by ServingDecoder on hot-swapped parameter
    trees so adapted weights match a bf16 bundle's argument spec."""
    import jax.numpy as jnp

    target = jnp.dtype(dtype)

    def leaf(a):
        a = np.asarray(a) if not hasattr(a, "dtype") else a
        return a.astype(target) if jnp.issubdtype(a.dtype, np.floating) \
            else a

    import jax

    return jax.tree.map(leaf, params)


def _save_bundle_params(path: str, params) -> None:
    """Flat npz like checkpoint.save_params_npz, but bf16-safe: numpy's
    npz format drops ml_dtypes' bfloat16 to an opaque void dtype, so bf16
    leaves are stored as uint16 bit patterns plus a ``__bf16_keys__``
    manifest entry that the bundle loader uses to view them back."""
    import jax
    import ml_dtypes

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays, bf16_keys = {}, []
    for kp, v in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        a = np.asarray(v)
        if a.dtype == ml_dtypes.bfloat16:
            bf16_keys.append(key)
            a = a.view(np.uint16)
        arrays[key] = a
    arrays["__bf16_keys__"] = np.asarray(bf16_keys, dtype=np.str_)
    np.savez(path, **arrays)


def _load_bundle_params(path: str):
    """Inverse of _save_bundle_params (nested-dict pytrees)."""
    import ml_dtypes

    out: dict = {}
    with np.load(path) as z:
        bf16 = set(np.asarray(z["__bf16_keys__"]).tolist()) \
            if "__bf16_keys__" in z.files else set()
        for key in z.files:
            if key == "__bf16_keys__":
                continue
            a = np.asarray(z[key])
            if key in bf16:
                a = a.view(ml_dtypes.bfloat16)
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = a
    return out


def make_decode_fn(task, bs_cfg, lm_model=None, lm_params=None,
                   from_feats: bool = False, mode: str = "beam"):
    """Pure fn(params, x, x_lens) -> {tokens [B,K,L], lengths, scores}.

    ``task`` must use portable (non-Pallas) frontend ops for
    multi-platform export; ``export_bundle`` arranges that. Greedy mode
    normalizes to the same output contract with K=1 and zero scores (the
    greedy path carries no hypothesis score).
    """
    from metaasr_tpu.decode.beam_search import beam_search_transformer

    def fn(params, x, x_lens):
        if from_feats:
            feats, feat_lens = x, x_lens
        else:
            feats, feat_lens = task.features(x, x_lens)
        if mode == "greedy":
            import jax.numpy as jnp

            packed, out_lens = task._greedy_from_feats(params, feats,
                                                       feat_lens)
            return {"tokens": packed[:, None, :],
                    "lengths": out_lens[:, None],
                    "scores": jnp.zeros_like(out_lens, jnp.float32)[:, None]}
        return beam_search_transformer(task.model, params, feats, feat_lens,
                                       task.sos_eos_id, bs_cfg,
                                       lm_model=lm_model, lm_params=lm_params)

    return fn


def _beam_cfg_from_train(cfg, lm_active: bool):
    from metaasr_tpu.decode.beam_search import BeamSearchConfig

    t = cfg.train
    return BeamSearchConfig(
        beam_size=t.beam_size, max_len=cfg.data.max_tokens,
        ctc_weight=t.decode_ctc_weight, length_penalty=t.length_penalty,
        ctc_candidates=t.ctc_candidates, normalize_final=t.normalize_final,
        coverage_weight=t.coverage_weight, coverage_tau=t.coverage_tau,
        min_len=t.beam_min_len,
        lm_weight=t.lm_weight if lm_active else 0.0)


def export_bundle(cfg, params, tokenizer, out_dir: str,
                  spec: ExportSpec | None = None,
                  lm_params=None) -> dict:
    """Export the decode program for every bucket and write the bundle.

    cfg: the run's Config (model dims/frontend/beam settings are read from
    it); params: trained (or adapted) parameter pytree; lm_params: optional
    shallow-fusion LM pytree (models/lm.py npz layout) — baked into the
    bundle as a separate npz, passed as part of the exported fn's closure
    is NOT possible (params must stay arguments), so the LM rides inside
    the main params argument under the reserved key ``__lm__``.
    Returns the manifest dict.
    """
    import jax
    from jax import export as jexport

    from metaasr_tpu.train.task import ASRTask

    spec = spec or ExportSpec()
    # portable ops only: a Mosaic (Pallas) custom call would pin the
    # artifact to the platform it was lowered for
    ecfg = copy.deepcopy(cfg)
    ecfg.frontend.use_pallas = False
    ecfg.model.ctc_impl = "scan"      # (not on the decode path; belt+braces)
    task = ASRTask(ecfg, tokenizer.sos_eos_id)

    if spec.mode == "greedy" and lm_params is not None:
        raise ValueError("shallow fusion needs the beam search; "
                         "greedy export does not take an LM")
    if spec.mode == "beam" and cfg.model.arch != "transformer":
        raise ValueError(f"beam export needs the transformer joint model; "
                         f"use mode='greedy' for arch={cfg.model.arch}")
    lm_model = None
    if lm_params is not None and cfg.train.lm_weight != 0.0:
        from metaasr_tpu.models.lm import LSTMLM, lm_dims_from_params

        lm_model = LSTMLM(**lm_dims_from_params(lm_params))
    bs_cfg = _beam_cfg_from_train(ecfg, lm_active=lm_model is not None)

    if lm_model is not None:
        # the LM weights must stay hot-swappable arguments too, so they
        # ride inside the params argument under the reserved key "__lm__"
        from metaasr_tpu.decode.beam_search import beam_search_transformer

        def fn(all_params, x, x_lens):
            p = {k: v for k, v in all_params.items() if k != "__lm__"}
            feats, feat_lens = (x, x_lens) if spec.from_feats \
                else task.features(x, x_lens)
            return beam_search_transformer(
                task.model, p, feats, feat_lens, task.sos_eos_id, bs_cfg,
                lm_model=lm_model, lm_params=all_params["__lm__"])

        call_params = dict(params)
        call_params["__lm__"] = lm_params
    else:
        fn = make_decode_fn(task, bs_cfg, from_feats=spec.from_feats,
                            mode=spec.mode)
        call_params = params

    if spec.weights_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"weights_dtype must be float32 or bfloat16, "
                         f"got {spec.weights_dtype!r}")
    if spec.weights_dtype != "float32":
        call_params = cast_weights(call_params, spec.weights_dtype)
    if spec.packed:
        inner_fn = fn

        def fn(params, x, x_lens):  # noqa: F811 — packed wrapper
            return pack_decode_outputs(inner_fn(params, x, x_lens))

    os.makedirs(out_dir, exist_ok=True)
    feat_dim = ecfg.frontend.num_mel_bins
    param_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        call_params)
    files = {}
    for bsz, width in spec.buckets:
        if spec.from_feats:
            x_spec = jax.ShapeDtypeStruct((bsz, width, feat_dim), np.float32)
        else:
            x_spec = jax.ShapeDtypeStruct((bsz, width), np.float32)
        lens_spec = jax.ShapeDtypeStruct((bsz,), np.int32)
        exported = jexport.export(
            jax.jit(fn), platforms=list(spec.platforms))(
                param_spec, x_spec, lens_spec)
        name = f"decode_b{bsz}_w{width}.jexp"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exported.serialize())
        files[f"{bsz}x{width}"] = name

    _save_bundle_params(os.path.join(out_dir, "params.npz"), call_params)
    tokenizer.save(os.path.join(out_dir, "tokenizer.json"))
    manifest = {
        "version": BUNDLE_VERSION,
        "buckets": [list(b) for b in spec.buckets],
        "platforms": list(spec.platforms),
        "from_feats": spec.from_feats,
        "mode": spec.mode,
        "packed": spec.packed,
        "weights_dtype": spec.weights_dtype,
        "files": files,
        "vocab_kind": cfg.data.vocab,
        "vocab_size": tokenizer.vocab_size,
        "sos_eos_id": tokenizer.sos_eos_id,
        "sample_rate": cfg.frontend.sample_rate,
        "num_mel_bins": feat_dim,
        "has_lm": lm_model is not None,
        "beam": {"beam_size": bs_cfg.beam_size, "max_len": bs_cfg.max_len,
                 "ctc_weight": bs_cfg.ctc_weight,
                 "lm_weight": bs_cfg.lm_weight},
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _load_tokenizer(bundle_dir: str, kind: str):
    path = os.path.join(bundle_dir, "tokenizer.json")
    if kind == "bpe":
        from metaasr_tpu.data.bpe import BPETokenizer

        return BPETokenizer.load(path)
    from metaasr_tpu.data.tokenizer import CharTokenizer

    return CharTokenizer.load(path)  # _BaseTokenizer.load dispatches on type


class ServingDecoder:
    """Load a bundle and transcribe — no training code on the hot path.

    ``transcribe`` pads each request to the smallest exported bucket,
    executes the deserialized program (compiled once per bucket on first
    use), and detokenizes. Pass ``params`` to hot-swap adapted weights
    into the same compiled program (zero recompiles — the meta-serving
    pattern).
    """

    def __init__(self, bundle_dir: str):
        import jax
        from jax import export as jexport

        with open(os.path.join(bundle_dir, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["version"] not in COMPATIBLE_BUNDLE_VERSIONS:
            raise ValueError(
                f"bundle version {self.meta['version']} not in "
                f"{COMPATIBLE_BUNDLE_VERSIONS}")
        self.tokenizer = _load_tokenizer(bundle_dir, self.meta["vocab_kind"])
        # device_put ONCE at load: numpy trees passed to a jitted call are
        # re-uploaded EVERY call — ~100 MB of flagship weights per dispatch
        # on a network-attached chip measured ~2.8 s/request before this
        # (r4 batcher bench); device-resident params make dispatch ship
        # only the audio
        self.params = jax.device_put(_load_bundle_params(
            os.path.join(bundle_dir, "params.npz")))
        self.weights_dtype = self.meta.get("weights_dtype", "float32")
        self._fns = {}
        for key, fname in self.meta["files"].items():
            bsz, width = (int(v) for v in key.split("x"))
            with open(os.path.join(bundle_dir, fname), "rb") as f:
                exported = jexport.deserialize(bytearray(f.read()))
            self._fns[(bsz, width)] = jax.jit(exported.call)
        self.from_feats = self.meta["from_feats"]
        # single-entry identity cache for hot-swapped trees: serving reuses
        # one adapted tree across many dispatches (transcribe_stream and
        # DynamicBatcher pass the same object per batch/group), so the
        # lm-merge + bf16 cast must not be repaid on every _dispatch
        self._swap_cache = None
        import threading

        self._swap_lock = threading.Lock()

    @property
    def buckets(self):
        return sorted(self._fns)

    def _pick_bucket(self, n: int, width: int):
        fits = [b for b in self.buckets if b[0] >= n and b[1] >= width]
        if not fits:
            raise ValueError(
                f"request ({n} utts, width {width}) exceeds every exported "
                f"bucket {self.buckets}")
        return min(fits, key=lambda b: (b[0] * b[1], b))

    def transcribe(self, xs: Sequence[np.ndarray], params: Any = None,
                   nbest: int = 1) -> list[dict]:
        """xs: list of 1-D float32 waveforms (audio mode) or [T, D] feature
        matrices (feats mode). Returns one dict per input:
        {"text", "score"} (+ "nbest" when nbest > 1)."""
        out, n = self._dispatch(xs, params)
        return self._read(out, n, nbest)

    def transcribe_files(self, paths: Sequence[str], params: Any = None,
                         nbest: int = 1) -> list[dict]:
        """WAV front door: decode + resample via the first-party native
        loader (native/wavio.cpp through data/audio_io.py), then
        transcribe. Audio-mode bundles only."""
        if self.from_feats:
            raise ValueError("transcribe_files needs an audio-mode bundle "
                             "(this one was exported from_feats=True)")
        from metaasr_tpu.data.audio_io import load_wav

        rate = self.meta["sample_rate"]
        return self.transcribe([load_wav(p, target_rate=rate)
                                for p in paths], params=params, nbest=nbest)

    def transcribe_stream(self, requests, params: Any = None,
                          nbest: int = 1):
        """Pipelined serving: ``requests`` is an iterable of wave lists
        (one batch each). Every batch is DISPATCHED before any result is
        read, overlapping batch i+1's device compute with batch i's host
        readback — the same pipelined-dispatch pattern that measured
        1.7–2.4x on the training repo's decode path (docs/PROFILE.md).
        Yields one result list per request batch, in order."""
        pending = []
        for xs in requests:
            # _dispatch pads and enqueues without synchronizing
            pending.append(self._dispatch(xs, params))
        for out, n in pending:
            yield self._read(out, n, nbest)

    def _resolve_params(self, params):
        """Map a caller tree to its device-resident, dtype-cast form.

        IMMUTABILITY CONTRACT (ADVICE r4): the single-entry cache keys on
        object identity — callers must treat a params tree as immutable
        once passed (meta_adapt returns fresh trees, so every real caller
        already complies); mutating a tree in place and re-passing the
        same object would silently serve the stale device copy. The lock
        makes concurrent transcribe() callers safe (two alternating trees
        thrash the single-entry cache — correct, just re-uploads).
        """
        if params is None:
            return self.params
        with self._swap_lock:
            if (self._swap_cache is not None
                    and self._swap_cache[0] is params):
                return self._swap_cache[1]  # same tree as last dispatch
            orig = params
            if self.meta["has_lm"] and "__lm__" not in params:
                params = dict(params)
                params["__lm__"] = self.params["__lm__"]
            if self.weights_dtype != "float32":
                # hot-swapped (meta_adapt-ed) trees arrive fp32; the
                # program's argument spec is bf16 — cast to match
                params = cast_weights(params, self.weights_dtype)
            # device-resident like self.params: without this every
            # dispatch re-uploads the full tree (see __init__ note)
            import jax as _jax

            params = _jax.device_put(params)
            # strong ref to orig keeps its id() live for the `is` check
            self._swap_cache = (orig, params)
            return params

    def _stage(self, xs, params):
        """Pad one request to its bucket and START its H2D upload
        (non-blocking ``jax.device_put``). Staging is split from the
        program call so a batcher can begin group i+1's feature upload
        while group i still computes — r4's load bench measured the
        padded features (~2 MB/group) riding the tunnel synchronously
        inside the dispatch, capping saturation at 71% of the raw decode
        bound (VERDICT r4 item 3 / docs/SERVE_BENCH.md)."""
        n = len(xs)
        widths = [int(np.shape(x)[0]) for x in xs]
        bsz, width = self._pick_bucket(n, max(widths))
        if self.from_feats:
            d = self.meta["num_mel_bins"]
            x = np.zeros((bsz, width, d), np.float32)
        else:
            x = np.zeros((bsz, width), np.float32)
        for i, item in enumerate(xs):
            x[i, : widths[i]] = np.asarray(item, np.float32)
        lens = np.asarray(widths + [widths[-1]] * (bsz - n), np.int32)
        # pad rows replicate the last real utterance (never a zero-len
        # row: fbank framing needs >= 1 full window); their outputs are
        # dropped by _read
        for j in range(n, bsz):
            x[j] = x[n - 1]
        params = self._resolve_params(params)
        import jax as _jax

        return ((bsz, width), params, _jax.device_put(x),
                _jax.device_put(lens), n)

    def _dispatch_staged(self, staged):
        """Enqueue the program on already-staged device inputs (no sync).
        Returns (async outputs, n real rows)."""
        bucket, params, x, lens, n = staged
        return self._fns[bucket](params, x, lens), n

    def _dispatch(self, xs, params):
        """Pad one request to its bucket and enqueue the program (no
        device sync). Returns (async outputs, n real rows)."""
        return self._dispatch_staged(self._stage(xs, params))

    def _read(self, out, n: int, nbest: int):
        if self.meta.get("packed"):
            out = unpack_decode_outputs(out)  # one D2H fetch, host unpack
        toks = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        scores = np.asarray(out["scores"])
        results = []
        k = min(max(1, nbest), toks.shape[1])
        for i in range(n):
            r = {"text": self.tokenizer.decode(toks[i, 0, : lengths[i, 0]]),
                 "score": float(scores[i, 0])}
            if k > 1:
                r["nbest"] = [
                    {"hyp": self.tokenizer.decode(toks[i, j, : lengths[i, j]]),
                     "score": float(scores[i, j])} for j in range(k)]
            results.append(r)
        return results
