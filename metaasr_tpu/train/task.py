"""ASRTask — the single bridge between data batches and differentiable loss.

Everything trainable routes through ``ASRTask.loss_fn(params, batch, rng,
train)``: the mono/multitask trainers differentiate it directly, and the
MAML/FOMAML trainers differentiate it inside inner/outer loops (SURVEY.md
section 3.1-3.2). The full pipeline — waveform -> fbank -> CMVN ->
SpecAugment -> model -> loss — is on-device and jit-compatible, so one
``jax.jit``/``jax.grad``/``jax.vmap`` composes over all of it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from metaasr_tpu.config import Config
from metaasr_tpu.frontend.fbank import FbankParams, log_mel_fbank, num_frames
from metaasr_tpu.frontend.specaug import spec_augment
from metaasr_tpu.models.losses import (
    joint_ctc_attention_loss,
    prepare_decoder_targets,
)
from metaasr_tpu.models.transformer import TransformerASR
from metaasr_tpu.models.vgg_blstm import VGGBLSTMCTC
from metaasr_tpu.ops.ctc import ctc_loss
from metaasr_tpu.ops.ctc_pallas import ctc_loss_pallas
from metaasr_tpu.utils.padding import make_non_pad_mask


def select_ctc_loss(impl: str):
    """'auto' | 'scan' | 'pallas' -> loss fn (SURVEY.md section 7 M3:
    both backends behind one API)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    return ctc_loss_pallas if impl == "pallas" else ctc_loss


def build_model(cfg: Config):
    m = cfg.model
    dtype = jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32
    if m.arch == "vgg_blstm":
        return VGGBLSTMCTC(vocab_size=m.vocab_size, blstm_hidden=m.blstm_hidden,
                           blstm_layers=m.blstm_layers,
                           vgg_channels=tuple(m.vgg_channels), dtype=dtype,
                           lstm_impl=m.lstm_impl)
    if m.arch == "transformer":
        return TransformerASR(vocab_size=m.vocab_size, d_model=m.d_model,
                              num_heads=m.num_heads, d_ff=m.d_ff,
                              num_encoder_layers=m.num_encoder_layers,
                              num_decoder_layers=m.num_decoder_layers,
                              dropout=m.dropout, encoder_type=m.encoder,
                              conformer_kernel=m.conformer_kernel,
                              dtype=dtype)
    raise ValueError(f"unknown arch {m.arch}")


class ASRTask:
    """Stateless (pure-function) wrapper: model + front-end + loss."""

    def __init__(self, cfg: Config, sos_eos_id: int | None = None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.arch = cfg.model.arch
        self.sos_eos_id = (sos_eos_id if sos_eos_id is not None
                           else cfg.model.vocab_size - 1)
        f = cfg.frontend
        self.fbank_params = FbankParams.create(
            num_mel_bins=f.num_mel_bins, preemphasis=f.preemphasis,
            remove_dc_offset=f.remove_dc_offset, low_freq=f.low_freq,
            high_freq=f.high_freq, sample_rate=f.sample_rate)
        self._ctc_loss = select_ctc_loss(cfg.model.ctc_impl)
        self._global_cmvn = None
        if f.cmvn == "global":
            import json

            import numpy as np

            with open(f.cmvn_stats_path) as fh:
                stats = json.load(fh)
            self._global_cmvn = (
                jnp.asarray(np.asarray(stats["mean"], np.float32)),
                jnp.asarray(np.sqrt(np.asarray(stats["var"], np.float32) + 1e-10)))

    def require_full_autodiff(self):
        """Ensure every op in the loss is twice-differentiable (second-order
        MAML differentiates THROUGH the loss gradient). The Pallas CTC is
        second-order capable since its custom-JVP rework (ops/ctc_pallas.py:
        Pallas primals at both orders, scan HVP tangents) and needs no
        fallback anymore; the Pallas LSTM's custom VJP is still first-order
        only, so the BLSTM arch switches to the scan LSTM."""
        if self.arch == "vgg_blstm" and self.cfg.model.lstm_impl != "scan":
            self.cfg.model.lstm_impl = "scan"
            self.model = build_model(self.cfg)

    # ---------- features ----------

    def features(self, audio, audio_lens, rng=None, train: bool = False,
                 cmvn_mean=None, cmvn_std=None):
        f = self.cfg.frontend
        if f.cmvn == "speaker" and cmvn_mean is not None:
            # speaker-level stats (SURVEY.md section 2.1 #16): per-utterance
            # normalization vectors computed offline per speaker
            feats, feat_lens = self._raw_fbank(audio, audio_lens, rng, train,
                                               cmvn="none")
            mask = make_non_pad_mask(feat_lens, feats.shape[1])[..., None]
            feats = jnp.where(
                mask, (feats - cmvn_mean[:, None, :]) / cmvn_std[:, None, :],
                0.0)
        elif f.cmvn == "global":
            # corpus-level mean/var normalization (offline stats,
            # SURVEY.md section 2.1 #16 'per-speaker global' variant)
            feats, feat_lens = self._raw_fbank(audio, audio_lens, rng, train,
                                               cmvn="none")
            mean, std = self._global_cmvn
            mask = make_non_pad_mask(feat_lens, feats.shape[1])[..., None]
            feats = jnp.where(mask, (feats - mean) / std, 0.0)
        else:
            # "speaker" without stats falls back to utterance CMVN
            cm = "utterance" if f.cmvn == "speaker" else f.cmvn
            feats, feat_lens = self._raw_fbank(audio, audio_lens, rng, train,
                                               cmvn=cm)
        return self._maybe_specaug(feats, feat_lens, rng, train), feat_lens

    def _maybe_specaug(self, feats, feat_lens, rng, train: bool):
        if train and self.cfg.specaug.enabled and rng is not None:
            sa = self.cfg.specaug
            feats = spec_augment(
                jax.random.fold_in(rng, 1), feats, feat_lens,
                num_freq_masks=sa.num_freq_masks,
                freq_mask_width=sa.freq_mask_width,
                num_time_masks=sa.num_time_masks,
                time_mask_width=sa.time_mask_width,
                time_mask_max_ratio=sa.time_mask_max_ratio,
                time_warp=sa.time_warp)
        return feats

    def _raw_fbank(self, audio, audio_lens, rng, train, cmvn: str):
        f = self.cfg.frontend
        if f.use_pallas:
            from metaasr_tpu.frontend.pallas_fbank import pallas_log_mel_fbank

            if train and f.dither and rng is not None:
                audio = audio + f.dither * jax.random.normal(
                    rng, audio.shape, jnp.float32)
            return pallas_log_mel_fbank(
                audio, audio_lens, self.fbank_params, cmvn=cmvn,
                cmvn_norm_var=f.cmvn_norm_var)
        return log_mel_fbank(
            audio, audio_lens, self.fbank_params, cmvn=cmvn,
            cmvn_norm_var=f.cmvn_norm_var,
            dither=f.dither if train else 0.0,
            rng=rng)

    # ---------- init ----------

    def init_params(self, rng, batch):
        if "feats" in batch:
            feats, feat_lens = batch["feats"], batch["feat_lens"]
        else:
            feats, feat_lens = self.features(batch["audio"],
                                             batch["audio_lens"])
        p_rng, d_rng = jax.random.split(rng)
        if self.arch == "vgg_blstm":
            return self.model.init({"params": p_rng, "dropout": d_rng},
                                   feats, feat_lens)["params"]
        tokens_in, _, _ = prepare_decoder_targets(
            batch["tokens"], batch["token_lens"], self.sos_eos_id)
        return self.model.init({"params": p_rng, "dropout": d_rng},
                               feats, feat_lens, tokens_in,
                               batch["token_lens"] + 1)["params"]

    # ---------- loss ----------

    def preprocess(self, batch, rng=None, train: bool = False) -> dict:
        """Audio batch -> feature batch (fbank + CMVN + SpecAugment).
        In meta-training this runs ONCE per task batch, outside the inner
        loop (maml.make_meta_loss preprocess_fn) — the reference applies
        its front-end at load time (SURVEY.md section 3.1). Precomputed-
        feature batches pass through (SpecAugment still applies in
        training, matching the reference's offline-extraction mode)."""
        if "feats" in batch:
            feats = self._maybe_specaug(batch["feats"], batch["feat_lens"],
                                        rng, train)
            feat_lens = batch["feat_lens"]
        else:
            feats, feat_lens = self.features(
                batch["audio"], batch["audio_lens"], rng, train,
                cmvn_mean=batch.get("cmvn_mean"),
                cmvn_std=batch.get("cmvn_std"))
        return {"feats": feats, "feat_lens": feat_lens,
                "tokens": batch["tokens"], "token_lens": batch["token_lens"]}

    def loss_fn(self, params, batch, rng=None, train: bool = False):
        """-> (scalar loss, metrics dict). Differentiable w.r.t. params.
        Accepts raw-audio batches (computes features inline) or
        preprocessed feature batches (key 'feats')."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        f_rng, d_rng = jax.random.split(rng)
        if "feats" in batch:
            # contract: augmentation is preprocess()'s job — feature
            # batches arriving here (from preprocess, or collated
            # precomputed features routed through preprocess by the
            # trainers) are used as-is, so nothing augments twice
            feats, feat_lens = batch["feats"], batch["feat_lens"]
        else:
            feats, feat_lens = self.features(batch["audio"],
                                             batch["audio_lens"], f_rng, train,
                                             cmvn_mean=batch.get("cmvn_mean"),
                                             cmvn_std=batch.get("cmvn_std"))
        rngs = {"dropout": d_rng} if train else None
        if self.arch == "vgg_blstm":
            logits, out_lens = self.model.apply(
                {"params": params}, feats, feat_lens, train, rngs=rngs)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = self._ctc_loss(lp, out_lens, batch["tokens"],
                                 batch["token_lens"])
            loss = nll.mean()
            return loss, {"loss": loss, "ctc_loss": loss}
        tokens_in, _, _ = prepare_decoder_targets(
            batch["tokens"], batch["token_lens"], self.sos_eos_id)
        outputs = self.model.apply(
            {"params": params}, feats, feat_lens, tokens_in,
            batch["token_lens"] + 1, train, rngs=rngs)
        return joint_ctc_attention_loss(
            outputs, batch["tokens"], batch["token_lens"], self.sos_eos_id,
            ctc_weight=self.cfg.model.ctc_weight,
            label_smoothing=self.cfg.model.label_smoothing,
            ctc_loss_fn=self._ctc_loss)

    # ---------- decode (greedy CTC; beam search lives in decode/) ----------

    @partial(jax.jit, static_argnums=0)
    def greedy_ctc(self, params, audio, audio_lens, cmvn_mean=None,
                   cmvn_std=None):
        feats, feat_lens = self.features(audio, audio_lens,
                                         cmvn_mean=cmvn_mean,
                                         cmvn_std=cmvn_std)
        return self._greedy_from_feats(params, feats, feat_lens)

    @partial(jax.jit, static_argnums=0)
    def greedy_ctc_feats(self, params, feats, feat_lens):
        return self._greedy_from_feats(params, feats, feat_lens)

    def _greedy_from_feats(self, params, feats, feat_lens):
        from metaasr_tpu.decode.greedy import ctc_greedy_decode

        if self.arch == "vgg_blstm":
            logits, out_lens = self.model.apply({"params": params}, feats,
                                                feat_lens, False)
        else:
            logits, out_lens = self.model.apply(
                {"params": params}, feats, feat_lens, False,
                method=self.model.ctc_logits_only)
        return ctc_greedy_decode(logits, out_lens)

    def greedy_batch(self, params, batch):
        """Greedy CTC on a collated batch, either payload mode."""
        if "feats" in batch:
            return self.greedy_ctc_feats(params, batch["feats"],
                                         batch["feat_lens"])
        return self.greedy_ctc(params, batch["audio"], batch["audio_lens"],
                               batch.get("cmvn_mean"), batch.get("cmvn_std"))

    def frame_cap(self, num_samples: int) -> int:
        return num_frames(num_samples)
