"""Batched on-device joint CTC/attention beam search.

The reference decodes host-side, hypothesis-by-hypothesis, with numpy CTC
prefix scoring per step (R: src/model/beam_search.py, SURVEY.md section 2.1
#11, section 3.3) — a device ping-pong per token. Here the WHOLE search is
one jitted program (BASELINE.json:5 "beam search runs on-device with batched
hypothesis state"; vectorized-beam patterns, PAPERS.md:7,9):

- hypothesis state is a fixed-shape pytree [B, K, ...] (tokens, lengths,
  scores, finished flags, per-layer decoder KV caches, CTC prefix-prob
  arrays);
- each decode step = one batched decoder call on [B*K] hypotheses + a
  ``lax.scan`` over encoder frames computing Graves CTC prefix
  probabilities for ALL (hypothesis x candidate) pairs at once;
- top-K reselection gathers every state leaf with one ``take_along_axis``;
- finished hypotheses propose only a frozen self-extension, so the state
  machine needs no host control flow; the outer loop is ``lax.scan`` over
  ``max_len`` steps.

Joint score (ESPnet semantics): (1-w)*att_cumlogp + w*ctc_prefix_logp
(+ length_penalty * length), where the CTC prefix score of hypothesis h is
log [ p_nb(h, T_b) + p_b(h, T_b) ] and an eos candidate scores h as a
complete CTC sequence.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from metaasr_tpu.constants import BLANK_ID
from metaasr_tpu.utils.padding import make_non_pad_mask

NEG = -1.0e9


def _lae(a, b):
    """logaddexp that tolerates NEG sentinels."""
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    return m + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))


@dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 10
    max_len: int = 64
    ctc_weight: float = 0.3
    length_penalty: float = 0.0
    blank_id: int = BLANK_ID
    # CTC-score only the top-N attention candidates per hypothesis
    # (ESPnet's ctc candidate pruning). 0 = auto: score the full
    # vocabulary when it is small (<= FULL_SCORING_MAX_VOCAB), else
    # prune to AUTO_CTC_CANDIDATES with a warning — full-vocab prefix
    # scoring materializes [B, K, V, T] arrays per decode step, which is
    # multi-GB at BPE vocabs and CRASHED the TPU worker at V=563 (r5).
    # -1 forces full-vocab scoring regardless (expert/bench override).
    # eos is always included on top. Essential for large (BPE) vocabs:
    # prefix-scan work AND memory scale with the candidate count, not |V|.
    ctc_candidates: int = 0
    # rank final hypotheses by score / max(length, 1) (ESPnet's length
    # normalization) instead of the raw cumulative score
    normalize_final: bool = False
    # coverage penalty (Chorowski & Jaitly 2017 form): at final ranking,
    # reward each valid encoder frame whose accumulated cross-attention
    # mass exceeds ``coverage_tau`` with ``coverage_weight`` — hypotheses
    # that attend over the whole utterance beat ones that loop or stop
    # early. 0 = off (the common setting).
    coverage_weight: float = 0.0
    coverage_tau: float = 0.5
    # suppress eos proposals for alive hypotheses while step < min_len —
    # the static-shape analogue of ESPnet's minlenratio (we take absolute
    # lengths, not ratios, because shapes are compile-time constants).
    # Also pins the decode loop to exactly max_len steps when set equal
    # to it (scripts/decode_bench.py uses that for deterministic timing).
    min_len: int = 0
    # shallow fusion: every emitted-token proposal (incl. eos) additionally
    # scores lm_weight * log p_LM(token | prefix) from an external language
    # model stepped in lockstep with the decoder (models/lm.py; ESPnet
    # RNNLM-fusion semantics). Requires lm_step_fn/init_lm_state at the
    # batched_beam_search call. 0 = off.
    lm_weight: float = 0.0


# Full-vocab CTC prefix scoring materializes [B, K, V, T] per decode
# step; above this vocab the auto mode prunes instead (see
# BeamSearchConfig.ctc_candidates). 128 keeps char/phone vocabs exact.
FULL_SCORING_MAX_VOCAB = 128
AUTO_CTC_CANDIDATES = 64


def effective_ctc_candidates(vocab: int, requested: int) -> int:
    """Resolve BeamSearchConfig.ctc_candidates: >0 explicit, -1 forced
    full-vocab, 0 auto (full for small vocabs, pruned + warning past
    FULL_SCORING_MAX_VOCAB — r5: an unguarded V=563 full-vocab decode
    allocated multi-GB prefix arrays and crashed the TPU worker)."""
    if requested > 0:
        return min(requested, vocab)
    if requested < 0 or vocab <= FULL_SCORING_MAX_VOCAB:
        return 0
    import logging

    logging.getLogger(__name__).warning(
        "ctc_candidates=0 (full-vocab prefix scoring) with vocab=%d: "
        "auto-pruning to top-%d candidates to bound the [B,K,V,T] prefix "
        "arrays; set train.ctc_candidates explicitly (or -1 to force "
        "full-vocab scoring) to silence this", vocab, AUTO_CTC_CANDIDATES)
    return AUTO_CTC_CANDIDATES


def ctc_prefix_step(ctc_logp: jax.Array, enc_lens: jax.Array,
                    r_nb: jax.Array, r_b: jax.Array, last: jax.Array,
                    empty: jax.Array, blank_id: int,
                    cand: jax.Array | None = None):
    """Extend every hypothesis with candidate tokens, one frame scan.

    ctc_logp: [B, T, V]; r_nb/r_b: [B, K, T] prefix probs of current hyps;
    last: [B, K] last emitted token; empty: [B, K] bool (zero-length hyp);
    cand: optional [B, K, C] candidate token ids (None => all V tokens).

    Returns (new_r_nb [B,K,C,T], new_r_b [B,K,C,T], ctc_score [B,K,C],
    complete_score [B,K]): prefix arrays and cumulative CTC prefix log-prob
    psi for each extension, plus the 'h as complete sequence' score gamma
    (for eos).
    """
    bsz, t_len, vocab = ctc_logp.shape
    k = r_nb.shape[1]
    # r(h, t-1) inputs, shifted with t=-1 boundary values.
    r_b_m1 = jnp.where(empty, 0.0, NEG)                      # [B, K]
    r_nb_m1 = jnp.full((bsz, k), NEG)
    r_b_prev = jnp.concatenate([r_b_m1[:, :, None], r_b[:, :, :-1]], axis=2)
    r_nb_prev = jnp.concatenate([r_nb_m1[:, :, None], r_nb[:, :, :-1]], axis=2)

    if cand is None:
        cand_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, vocab), 2)
    else:
        cand_ids = cand.astype(jnp.int32)                    # [B, K, C]
    not_repeat = cand_ids != last[:, :, None]                # bcast [B, K, C]

    lp_rows = jnp.moveaxis(ctc_logp, 1, 0)                   # [T, B, V]
    lp_blank = jnp.moveaxis(ctc_logp[:, :, blank_id], 1, 0)[:, :, None, None]
    rb_p = jnp.moveaxis(r_b_prev, 2, 0)[:, :, :, None]       # [T, B, K, 1]
    rnb_p = jnp.moveaxis(r_nb_prev, 2, 0)[:, :, :, None]
    t_active = (jax.lax.broadcasted_iota(jnp.int32, (t_len, 1, 1, 1), 0)
                < enc_lens[None, :, None, None])             # [T, B, 1, 1]

    # Candidate emissions gathered ONCE for all frames (r5): the gather
    # used to run inside the scan body (T small [B,K,C]-from-[B,K,V]
    # gathers), and per-step gather overhead made the pruned path SLOWER
    # than dense full-vocab scoring at V=512 (decode bench: 141 vs 66 ms
    # at B=4). One [T,B,K,C] gather up front keeps the scan body pure
    # elementwise; memory is [T,B,K,C] (the pruned size), not [B,K,V,T].
    if cand is None:
        lp_cand = lp_rows[:, :, None, :]                     # [T, B, 1, V]
    else:
        lp_cand = jnp.take_along_axis(
            jnp.broadcast_to(lp_rows[:, :, None, :],
                             (t_len, bsz, k, vocab)),
            cand_ids[None], 3)                               # [T, B, K, C]

    def step(carry, xs):
        c_nb, c_b, c_psi = carry                             # [B, K, C]
        lp_c, lp_bl, rbp, rnbp, act = xs
        phi = _lae(rbp, jnp.where(not_repeat, rnbp, NEG))    # phi(t-1), [B,K,C]
        n_nb = _lae(c_nb, phi) + lp_c
        n_b = _lae(c_b, c_nb) + lp_bl
        # prefix probability psi(h+c) = sum_t phi(t-1) * p_t(c)
        n_psi = _lae(c_psi, phi + lp_c)
        n_nb = jnp.where(act, n_nb, c_nb)
        n_b = jnp.where(act, n_b, c_b)
        n_psi = jnp.where(act, n_psi, c_psi)
        return (n_nb, n_b, n_psi), (n_nb, n_b)

    n_cand = vocab if cand is None else cand_ids.shape[2]
    neg0 = jnp.full((bsz, k, n_cand), NEG)
    (_, _, psi), (seq_nb, seq_b) = jax.lax.scan(
        step, (neg0, neg0, neg0), (lp_cand, lp_blank, rb_p, rnb_p, t_active))

    new_r_nb = jnp.moveaxis(seq_nb, 0, 3)                    # [B, K, V, T]
    new_r_b = jnp.moveaxis(seq_b, 0, 3)
    ctc_score = psi                                          # [B, K, V]

    # h itself as a complete sequence: read r at t = T_b - 1.
    t_idx = jnp.maximum(enc_lens.astype(jnp.int32) - 1, 0)[:, None, None]
    rb_T = jnp.take_along_axis(r_b, jnp.broadcast_to(t_idx, (bsz, k, 1)), 2)[..., 0]
    rnb_T = jnp.take_along_axis(r_nb, jnp.broadcast_to(t_idx, (bsz, k, 1)), 2)[..., 0]
    complete = _lae(rb_T, rnb_T)
    return new_r_nb, new_r_b, ctc_score, complete


def ctc_prefix_init(ctc_logp: jax.Array, enc_lens: jax.Array, k: int,
                    blank_id: int):
    """Initial prefix arrays for the empty hypothesis: r_b = cumulative
    blank log-prob, r_nb = -inf."""
    bsz, t_len, _ = ctc_logp.shape
    blanks = ctc_logp[:, :, blank_id]
    mask = make_non_pad_mask(enc_lens, t_len)
    r_b = jnp.cumsum(jnp.where(mask, blanks, 0.0), axis=1)
    r_b = jnp.where(mask, r_b, jnp.take_along_axis(
        r_b, jnp.maximum(enc_lens.astype(jnp.int32) - 1, 0)[:, None], 1))
    r_b = jnp.broadcast_to(r_b[:, None, :], (bsz, k, t_len))
    r_nb = jnp.full((bsz, k, t_len), NEG)
    return r_nb, r_b


def batched_beam_search(decoder_step_fn, init_caches,
                        enc_lens: jax.Array, ctc_logits: jax.Array,
                        eos_id: int, cfg: BeamSearchConfig,
                        lm_step_fn=None, init_lm_state=None):
    """Run the search.

    decoder_step_fn(tokens [N,1], step, caches) -> (log_probs [N, V],
    new_caches) — or (log_probs, new_caches, cross_attn [N, T]) when
    cfg.coverage_weight != 0 — N = B*K; the encoder context (precomputed
    cross K/V, lengths) lives in the closure.
    init_caches: decoder self-attn KV caches for N=B*K rows, len >= max_len.
    ctc_logits: [B, T, V] raw CTC head outputs on the encoder frames.
    lm_step_fn(tokens [N,1], lm_state) -> (log_probs [N, V], new_state):
    optional shallow-fusion language model (cfg.lm_weight != 0), stepped on
    the same token stream as the decoder; its state leaves are [N, ...]
    fixed-shape arrays re-gathered per beam reselection like the KV caches.

    Returns dict: tokens [B, K, L], lengths [B, K], scores [B, K] (sorted
    best-first), where tokens excludes sos and includes no eos.
    """
    bsz, t_len, vocab = ctc_logits.shape
    k = cfg.beam_size
    l_max = cfg.max_len
    ctc_logp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1)

    r_nb, r_b = ctc_prefix_init(ctc_logp, enc_lens, k, cfg.blank_id)
    state = {
        "tokens": jnp.zeros((bsz, k, l_max), jnp.int32),
        "length": jnp.zeros((bsz, k), jnp.int32),
        "att_cum": jnp.zeros((bsz, k), jnp.float32),
        "score": jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (bsz, k), 1) == 0, 0.0, NEG),
        "finished": jnp.zeros((bsz, k), bool),
        "last": jnp.full((bsz, k), eos_id, jnp.int32),       # sos == eos id
        "empty": jnp.ones((bsz, k), bool),
        "r_nb": r_nb,
        "r_b": r_b,
        "caches": init_caches,
    }
    use_cov = cfg.coverage_weight != 0.0
    if use_cov:
        state["coverage"] = jnp.zeros((bsz, k, t_len), jnp.float32)
    use_lm = cfg.lm_weight != 0.0 and lm_step_fn is not None
    if use_lm:
        if init_lm_state is None:
            raise ValueError("lm_weight set but no init_lm_state given")
        state["lm"] = init_lm_state
        # cumulative LM log-prob of each hypothesis (like att_cum): the
        # beam score is REBUILT from cumulative trackers every step, so a
        # per-step-only LM term would be dropped at the next reselection
        state["lm_cum"] = jnp.zeros((bsz, k), jnp.float32)

    req = effective_ctc_candidates(vocab, cfg.ctc_candidates)
    n_cand = vocab if req <= 0 else min(req + 1, vocab)  # +1: eos on top

    def step_fn(state, step_idx):
        # 1) batched decoder step on all hypotheses
        out = decoder_step_fn(
            state["last"].reshape(bsz * k, 1), step_idx, state["caches"])
        if use_cov:
            att_logp, new_caches, cross_attn = out
            cross_attn = cross_attn.reshape(bsz, k, -1)       # [B, K, T]
        else:
            att_logp, new_caches = out
        att_logp = att_logp.reshape(bsz, k, vocab)
        if use_lm:
            lm_flat, lm_new = lm_step_fn(
                state["last"].reshape(bsz * k, 1), state["lm"])
            lm_logp = lm_flat.reshape(bsz, k, vocab)

        # 2) candidate set: full vocabulary, or top-N by attention score
        #    (+ eos), CTC prefix-scored
        if n_cand == vocab:
            cand = None
            cand_att_logp = att_logp
        else:
            masked = att_logp.at[:, :, cfg.blank_id].set(NEG)
            masked = masked.at[:, :, eos_id].set(NEG)
            _, top_ids = jax.lax.top_k(masked, n_cand - 1)     # [B, K, C-1]
            cand = jnp.concatenate(
                [top_ids, jnp.full((bsz, k, 1), eos_id, jnp.int32)], axis=2)
            cand_att_logp = jnp.take_along_axis(att_logp, cand, axis=2)
        new_r_nb, new_r_b, ctc_ext, ctc_complete = ctc_prefix_step(
            ctc_logp, enc_lens, state["r_nb"], state["r_b"], state["last"],
            state["empty"], cfg.blank_id, cand=cand)

        # 3) combined candidate scores [B, K, C]
        att_new = state["att_cum"][:, :, None] + cand_att_logp
        w = cfg.ctc_weight
        if cand is None:
            cand_ctc = ctc_ext.at[:, :, eos_id].set(ctc_complete)
            is_eos_slot = (jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, vocab), 2) == eos_id)
        else:
            is_eos_slot = cand == eos_id
            cand_ctc = jnp.where(is_eos_slot,
                                 ctc_complete[:, :, None], ctc_ext)
        scores = (1 - w) * att_new + w * cand_ctc
        if use_lm:
            # shallow fusion: cumulative LM log-prob of the extended
            # hypothesis (prefix total + proposed token, incl. eos) — must
            # be cumulative because `scores` is an absolute hypothesis
            # score rebuilt from trackers, not an increment
            cand_lm = (lm_logp if cand is None
                       else jnp.take_along_axis(lm_logp, cand, axis=2))
            scores = scores + cfg.lm_weight * (
                state["lm_cum"][:, :, None] + cand_lm)
        scores = scores + cfg.length_penalty * (state["length"] + 1)[:, :, None]
        if cfg.min_len > 0:
            # minlenratio analogue: alive hypotheses may not end yet
            scores = jnp.where((step_idx < cfg.min_len) & is_eos_slot,
                               NEG, scores)
        if cand is None:
            scores = scores.at[:, :, cfg.blank_id].set(NEG)  # never emit blank
        # dead hyps propose nothing; finished hyps propose only frozen self
        alive_scores = jnp.where(state["finished"][:, :, None], NEG, scores)
        alive_scores = jnp.where(state["score"][:, :, None] <= NEG / 2, NEG,
                                 alive_scores)
        frozen = jnp.where(is_eos_slot, state["score"][:, :, None], NEG)
        cand_scores = jnp.where(state["finished"][:, :, None], frozen,
                                alive_scores)

        # 4) top-K over K*C
        flat = cand_scores.reshape(bsz, k * n_cand)
        top_scores, top_idx = jax.lax.top_k(flat, k)          # [B, K]
        parent = top_idx // n_cand
        slot = (top_idx % n_cand).astype(jnp.int32)
        if cand is None:
            token = slot
        else:
            token = jnp.take_along_axis(
                cand.reshape(bsz, k * n_cand), top_idx, axis=1).astype(jnp.int32)

        def sel(x):
            """gather parent rows of a [B, K, ...] array."""
            idx = parent.reshape(parent.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, idx, axis=1)

        parent_finished = sel(state["finished"][:, :, None])[..., 0]
        parent_len = sel(state["length"][:, :, None])[..., 0]
        parent_tokens = sel(state["tokens"])
        parent_att = sel(state["att_cum"][:, :, None])[..., 0]
        parent_empty = sel(state["empty"][:, :, None])[..., 0]

        now_finish = (~parent_finished) & (token == eos_id)
        stay = parent_finished
        new_len = jnp.where(stay | now_finish, parent_len, parent_len + 1)
        write_pos = jnp.minimum(parent_len, l_max - 1)
        appended = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (bsz, k, l_max), 2)
             == write_pos[:, :, None]) & ~(stay | now_finish)[:, :, None],
            token[:, :, None], parent_tokens)

        new_att = jnp.where(
            stay, parent_att,
            parent_att + jnp.take_along_axis(
                sel(att_logp), token[:, :, None], 2)[..., 0])
        if use_lm:
            parent_lm = sel(state["lm_cum"][:, :, None])[..., 0]
            new_lm_cum = jnp.where(
                stay, parent_lm,
                parent_lm + jnp.take_along_axis(
                    sel(lm_logp), token[:, :, None], 2)[..., 0])

        # CTC prefix arrays: select [parent, slot] rows
        def sel_cand(x):                                      # [B,K,C,T]
            p = sel(x)                                        # parent rows
            return jnp.take_along_axis(
                p, slot[:, :, None, None].astype(jnp.int32), axis=2)[:, :, 0]

        keep_r = (stay | now_finish)[:, :, None]
        new_rnb = jnp.where(keep_r, sel(state["r_nb"]), sel_cand(new_r_nb))
        new_rb = jnp.where(keep_r, sel(state["r_b"]), sel_cand(new_r_b))

        if use_cov:
            # accumulate the emitted token's cross-attention mass; frozen
            # hyps and the eos emission itself add nothing
            new_cov = jnp.where(keep_r, sel(state["coverage"]),
                                sel(state["coverage"]) + sel(cross_attn))

        # decoder caches: [B*K, L, H, Dh] leaves -> gather parent beams
        def sel_cache(x):
            xs = x.reshape((bsz, k) + x.shape[1:])
            idx = parent.reshape(parent.shape + (1,) * (xs.ndim - 2))
            return jnp.take_along_axis(xs, idx, axis=1).reshape(x.shape)

        caches = jax.tree_util.tree_map(sel_cache, new_caches)

        if use_lm:
            # frozen hypotheses keep their old LM carry (exact no-op
            # semantics for the early-exit loop), alive ones advance;
            # then gather parent rows like the KV caches
            def sel_lm(new_leaf, old_leaf):
                n2 = new_leaf.reshape((bsz, k) + new_leaf.shape[1:])
                o2 = old_leaf.reshape((bsz, k) + old_leaf.shape[1:])
                fin = state["finished"].reshape(
                    (bsz, k) + (1,) * (n2.ndim - 2))
                gated = jnp.where(fin, o2, n2)
                idx = parent.reshape(parent.shape + (1,) * (n2.ndim - 2))
                return jnp.take_along_axis(gated, idx, axis=1).reshape(
                    new_leaf.shape)

            lm_state = jax.tree_util.tree_map(sel_lm, lm_new, state["lm"])

        new_state = {
            "tokens": appended,
            "length": new_len,
            "att_cum": new_att,
            "score": top_scores,
            "finished": parent_finished | now_finish,
            "last": jnp.where(stay | now_finish, sel(state["last"][:, :, None])[..., 0], token),
            "empty": jnp.where(stay | now_finish, parent_empty, False),
            "r_nb": new_rnb,
            "r_b": new_rb,
            "caches": caches,
        }
        if use_cov:
            new_state["coverage"] = new_cov
        if use_lm:
            new_state["lm"] = lm_state
            new_state["lm_cum"] = new_lm_cum
        return new_state, None

    # Early-exit loop: once every hypothesis in every batch row is
    # finished, further steps are exact no-ops (finished beams only
    # propose their frozen selves), so while_loop == scan numerically but
    # skips the dead tail — decode steps scale with the LONGEST actual
    # hypothesis, not max_len.
    def cond(carry):
        state, step_idx = carry
        return (step_idx < l_max) & ~jnp.all(state["finished"])

    def body(carry):
        state, step_idx = carry
        state, _ = step_fn(state, step_idx)
        return state, step_idx + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.asarray(0)))

    final = state["score"]
    if cfg.normalize_final:
        final = final / jnp.maximum(state["length"].astype(jnp.float32), 1.0)
    if use_cov:
        valid = make_non_pad_mask(enc_lens, t_len)[:, None, :]   # [B, 1, T]
        covered = (state["coverage"] > cfg.coverage_tau) & valid
        final = final + cfg.coverage_weight * covered.sum(-1).astype(
            jnp.float32)
    order = jnp.argsort(-final, axis=1)
    return {
        "tokens": jnp.take_along_axis(state["tokens"], order[:, :, None], 1),
        "lengths": jnp.take_along_axis(state["length"], order, 1),
        "scores": jnp.take_along_axis(state["score"], order, 1),
        "finished": jnp.take_along_axis(state["finished"], order, 1),
    }


def beam_search_transformer(model, params, feats, feat_lens, eos_id: int,
                            cfg: BeamSearchConfig,
                            lm_model=None, lm_params=None):
    """Convenience wrapper: encode + CTC head + batched search for a
    TransformerASR model (params pytree, feats [B, T, D]).

    ``lm_model``/``lm_params`` (models/lm.py LSTMLM): shallow-fusion LM,
    active when cfg.lm_weight != 0."""
    k = cfg.beam_size
    enc, enc_lens = model.apply({"params": params}, feats, feat_lens, False,
                                method=model.encode)
    ctc_logits = model.apply({"params": params}, enc,
                             method=model.apply_ctc_head)
    bsz = feats.shape[0]
    caches = model.apply({"params": params}, bsz * k, cfg.max_len,
                         method=model.decoder_init_state)
    # encoder K/V projected ONCE per utterance, then broadcast across beams
    cross = model.apply({"params": params}, enc,
                        method=model.decoder_precompute_cross)
    cross_rep = jax.tree_util.tree_map(lambda x: jnp.repeat(x, k, axis=0),
                                       cross)
    enc_lens_rep = jnp.repeat(enc_lens, k, axis=0)

    def decoder_step_fn(tokens, step, caches):
        return model.apply({"params": params}, tokens, step, caches, None,
                           enc_lens_rep, cross_rep,
                           return_attn=cfg.coverage_weight != 0.0,
                           method=model.decoder_step)

    lm_step_fn = init_lm_state = None
    if cfg.lm_weight != 0.0 and lm_model is not None:
        from metaasr_tpu.models.lm import make_lm_step_fn

        lm_step_fn = make_lm_step_fn(lm_model, lm_params)
        init_lm_state = lm_model.init_state(bsz * k)

    return batched_beam_search(decoder_step_fn, caches, enc_lens,
                               ctc_logits, eos_id, cfg,
                               lm_step_fn=lm_step_fn,
                               init_lm_state=init_lm_state)
