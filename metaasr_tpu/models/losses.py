"""Losses and target preparation for the joint CTC-attention objective.

Reference behavior (R: src/model/label_smoothing_loss.py, SURVEY.md
section 2.1 #9 and section 3.2): label-smoothed KL for the attention decoder
(eps~0.1) against sos/eos-shifted targets, joint loss
lambda*L_ctc + (1-lambda)*L_att with lambda~0.3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metaasr_tpu.ops.ctc import ctc_loss


def prepare_decoder_targets(tokens: jax.Array, token_lens: jax.Array,
                            sos_eos_id: int):
    """[B, U] padded targets -> (tokens_in [B, U+1] sos-prefixed,
    tokens_out [B, U+1] eos-suffixed, out_mask [B, U+1]).

    tokens_in[b]  = [sos, y1 .. yU, pad...]
    tokens_out[b] = [y1 .. yU, eos, pad...]   (mask covers len+1 positions)
    """
    bsz, u = tokens.shape
    tokens_in = jnp.concatenate(
        [jnp.full((bsz, 1), sos_eos_id, tokens.dtype), tokens], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (bsz, u + 1), 1)
    lens = token_lens.astype(jnp.int32)[:, None]
    eos_col = jnp.where(pos == lens, sos_eos_id, 0).astype(tokens.dtype)
    tokens_out = jnp.concatenate(
        [tokens, jnp.zeros((bsz, 1), tokens.dtype)], axis=1) * (pos < lens) + eos_col
    out_mask = pos <= lens  # y1..yU and the eos slot
    return tokens_in, tokens_out, out_mask


def label_smoothing_loss(logits: jax.Array, targets: jax.Array,
                         mask: jax.Array, smoothing: float = 0.1,
                         normalize: str = "tokens") -> jax.Array:
    """KL(smoothed one-hot || softmax(logits)) over masked positions.

    Matches the reference semantics: the smoothed distribution puts
    (1-eps) on the target and eps/(V-1) on the rest; loss is summed KL per
    position, averaged over valid positions (``normalize='tokens'``) or
    over utterances (``'batch'``).
    """
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    on = 1.0 - smoothing
    off = smoothing / (vocab - 1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
    # sum_v q_v * (log q_v - log p_v); the log q entropy term is constant,
    # include it (true KL) as the reference's KLDivLoss does.
    q_entropy = -(on * jnp.log(jnp.maximum(on, 1e-10))
                  + (vocab - 1) * off * jnp.log(jnp.maximum(off, 1e-10)))
    xent = -(on * tgt_logp + off * (logp.sum(axis=-1) - tgt_logp))
    kl = xent - q_entropy
    kl = jnp.where(mask, kl, 0.0)
    if normalize == "tokens":
        return kl.sum() / jnp.maximum(mask.sum(), 1)
    return kl.sum() / logits.shape[0]


def joint_ctc_attention_loss(outputs: dict, tokens: jax.Array,
                             token_lens: jax.Array, sos_eos_id: int,
                             ctc_weight: float = 0.3,
                             label_smoothing: float = 0.1,
                             ctc_loss_fn=None) -> tuple[jax.Array, dict]:
    """outputs: dict from TransformerASR.__call__ (teacher-forced with the
    SAME prepare_decoder_targets inputs). Returns (scalar loss, metrics).
    ``ctc_loss_fn`` selects the CTC backend (scan or Pallas kernel)."""
    ctc_loss_fn = ctc_loss_fn or ctc_loss
    lp = jax.nn.log_softmax(outputs["ctc_logits"].astype(jnp.float32), axis=-1)
    l_ctc = ctc_loss_fn(lp, outputs["enc_lens"], tokens, token_lens).mean()
    _, tokens_out, out_mask = prepare_decoder_targets(tokens, token_lens, sos_eos_id)
    l_att = label_smoothing_loss(outputs["att_logits"], tokens_out, out_mask,
                                 label_smoothing)
    loss = ctc_weight * l_ctc + (1.0 - ctc_weight) * l_att
    return loss, {"loss": loss, "ctc_loss": l_ctc, "att_loss": l_att}
