"""M4: on-device batched beam search vs a slow host reference beam;
CTC prefix scorer vs brute-force path enumeration; beam=1 == greedy
attention decode (SURVEY.md section 4.4)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.decode.beam_search import (
    NEG,
    BeamSearchConfig,
    batched_beam_search,
    beam_search_transformer,
    ctc_prefix_init,
    ctc_prefix_step,
)
from metaasr_tpu.models.transformer import TransformerASR

VOCAB = 8
EOS = VOCAB - 1


def _model_and_inputs(rng, bsz=2, t_feat=35):
    model = TransformerASR(vocab_size=VOCAB, d_model=16, num_heads=2, d_ff=32,
                           num_encoder_layers=1, num_decoder_layers=2,
                           dropout=0.0)
    feats = jnp.asarray(rng.standard_normal((bsz, t_feat, 80)).astype(np.float32))
    lens = jnp.array([t_feat, t_feat - 12][:bsz])
    tokens = jnp.asarray(rng.integers(1, EOS, (bsz, 4)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), feats, lens,
                        jnp.pad(tokens, ((0, 0), (1, 0)), constant_values=EOS),
                        jnp.array([5, 5][:bsz]))["params"]
    return model, params, feats, lens


def _host_att_logp(model, params, enc, enc_lens, prefix: list[int]):
    """Teacher-forced decoder forward on [sos]+prefix; last-position logp.
    Independently checks the incremental KV cache path."""
    toks = jnp.asarray([[EOS] + prefix], dtype=jnp.int32)
    out = model.apply({"params": params}, toks, jnp.array([len(prefix) + 1]),
                      enc, enc_lens, method=lambda m, *a: m.decoder(*a))
    return np.asarray(jax.nn.log_softmax(out[0, -1].astype(jnp.float32)))


def _host_ctc_prefix_scores(ctc_logp: np.ndarray, t_valid: int, prefix: list[int]):
    """Graves prefix DP on host: returns (psi [V] prefix-extension scores,
    gamma float exact-match score of `prefix`)."""
    t_len, vocab = ctc_logp.shape
    lp = ctc_logp[:t_valid]

    def logadd(a, b):
        if a <= NEG / 2:
            return b
        if b <= NEG / 2:
            return a
        return np.logaddexp(a, b)

    # r_b/r_nb for `prefix` via sequential extension from empty
    r_b = np.cumsum(lp[:, 0])
    r_nb = np.full(t_valid, NEG)
    last = None
    for c in prefix:
        n_nb = np.full(t_valid, NEG)
        n_b = np.full(t_valid, NEG)
        for t in range(t_valid):
            rbp = r_b[t - 1] if t > 0 else (0.0 if last is None else NEG)
            rnbp = r_nb[t - 1] if t > 0 else NEG
            phi = logadd(rbp, rnbp if c != last else NEG)
            n_nb[t] = logadd(n_nb[t - 1] if t > 0 else NEG, phi) + lp[t, c]
            n_b[t] = logadd(n_b[t - 1] if t > 0 else NEG,
                            n_nb[t - 1] if t > 0 else NEG) + lp[t, 0]
        r_b, r_nb, last = n_b, n_nb, c
    gamma = logadd(r_b[-1], r_nb[-1])
    psi = np.full(vocab, NEG)
    for c in range(1, vocab):
        acc = NEG
        for t in range(t_valid):
            rbp = r_b[t - 1] if t > 0 else (0.0 if last is None else NEG)
            rnbp = r_nb[t - 1] if t > 0 else NEG
            phi = logadd(rbp, rnbp if c != last else NEG)
            acc = logadd(acc, phi + lp[t, c])
        psi[c] = acc
    return psi, gamma


def test_ctc_prefix_scorer_matches_host_dp(rng):
    t_len, vocab, k = 9, 5, 2
    logits = rng.standard_normal((1, t_len, vocab)).astype(np.float32)
    ctc_logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    enc_lens = jnp.array([7])

    # empty prefix
    r_nb, r_b = ctc_prefix_init(jnp.asarray(ctc_logp), enc_lens, k, 0)
    last = jnp.full((1, k), 99, jnp.int32)
    empty = jnp.ones((1, k), bool)
    new_rnb, new_rb, psi, gamma = ctc_prefix_step(
        jnp.asarray(ctc_logp), enc_lens, r_nb, r_b, last, empty, 0)
    ref_psi, ref_gamma = _host_ctc_prefix_scores(ctc_logp[0], 7, [])
    np.testing.assert_allclose(np.asarray(psi[0, 0, 1:]), ref_psi[1:], rtol=1e-4)
    np.testing.assert_allclose(float(gamma[0, 0]), ref_gamma, rtol=1e-4)

    # after extending with token 2, then 2 again (repeat handling)
    for prefix in ([2], [2, 2], [2, 1]):
        r_nb_h, r_b_h = r_nb, r_b
        lastv, emptyv = 99, True
        for c in prefix:
            nr_nb, nr_b, _, _ = ctc_prefix_step(
                jnp.asarray(ctc_logp), enc_lens, r_nb_h, r_b_h,
                jnp.full((1, k), lastv, jnp.int32),
                jnp.full((1, k), emptyv, bool), 0)
            r_nb_h = nr_nb[:, :, c]
            r_b_h = nr_b[:, :, c]
            lastv, emptyv = c, False
        _, _, psi_h, gamma_h = ctc_prefix_step(
            jnp.asarray(ctc_logp), enc_lens, r_nb_h, r_b_h,
            jnp.full((1, k), lastv, jnp.int32), jnp.full((1, k), emptyv, bool), 0)
        ref_psi, ref_gamma = _host_ctc_prefix_scores(ctc_logp[0], 7, prefix)
        np.testing.assert_allclose(np.asarray(psi_h[0, 0, 1:]), ref_psi[1:],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(gamma_h[0, 0]), ref_gamma, rtol=1e-4)


def test_ctc_prefix_psi_matches_bruteforce_paths(rng):
    """psi(prefix c) == sum over all full alignment paths whose collapse
    STARTS WITH [c]; gamma == exact match — tiny enumeration."""
    t_len, vocab = 4, 3
    logits = rng.standard_normal((1, t_len, vocab)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]

    def collapse(path):
        return tuple(k for k, g in itertools.groupby(path) if k != 0)

    for prefix in ([], [1], [2, 1]):
        psi_ref = np.zeros(vocab)
        gamma_ref = 0.0
        for c in range(1, vocab):
            tot = 0.0
            for path in itertools.product(range(vocab), repeat=t_len):
                col = collapse(path)
                if col[: len(prefix) + 1] == tuple(prefix) + (c,):
                    tot += np.exp(sum(lp[t, path[t]] for t in range(t_len)))
            psi_ref[c] = np.log(tot) if tot > 0 else NEG
        tot = sum(np.exp(sum(lp[t, path[t]] for t in range(t_len)))
                  for path in itertools.product(range(vocab), repeat=t_len)
                  if collapse(path) == tuple(prefix))
        gamma_ref = np.log(tot) if tot > 0 else NEG

        psi_host, gamma_host = _host_ctc_prefix_scores(lp, t_len, prefix)
        np.testing.assert_allclose(psi_host[1:], psi_ref[1:], rtol=1e-4,
                                   atol=1e-4)
        if gamma_ref > NEG / 2:
            np.testing.assert_allclose(gamma_host, gamma_ref, rtol=1e-4)


def _host_beam_search(model, params, feats, lens, cfg: BeamSearchConfig):
    """Slow per-utterance host beam with identical scoring rules."""
    enc_all, enc_lens_all = model.apply({"params": params}, feats, lens, False,
                                        method=model.encode)
    ctc_logits = model.apply({"params": params}, enc_all,
                             method=lambda m, e: m.ctc_head(e))
    results = []
    for b in range(feats.shape[0]):
        enc = enc_all[b: b + 1]
        enc_len = enc_lens_all[b: b + 1]
        t_valid = int(enc_len[0])
        ctc_logp = np.asarray(jax.nn.log_softmax(
            ctc_logits[b].astype(jnp.float32), -1))
        hyps = [{"toks": [], "att": 0.0, "score": 0.0, "finished": False}]
        for _ in range(cfg.max_len):
            cand = []
            for h in hyps:
                if h["finished"]:
                    cand.append(dict(h))
                    continue
                att_logp = _host_att_logp(model, params, enc, enc_len, h["toks"])
                psi, gamma = _host_ctc_prefix_scores(ctc_logp, t_valid, h["toks"])
                for c in range(1, VOCAB):
                    ctc_part = gamma if c == EOS else psi[c]
                    att_new = h["att"] + att_logp[c]
                    score = ((1 - cfg.ctc_weight) * att_new
                             + cfg.ctc_weight * ctc_part
                             + cfg.length_penalty * (len(h["toks"]) + 1))
                    cand.append({"toks": h["toks"] + ([c] if c != EOS else []),
                                 "att": att_new, "score": score,
                                 "finished": c == EOS})
            cand.sort(key=lambda x: -x["score"])
            hyps = cand[: cfg.beam_size]
            if all(h["finished"] for h in hyps):
                break
        hyps.sort(key=lambda x: -x["score"])
        results.append(hyps)
    return results


def test_batched_beam_matches_host_reference(rng):
    model, params, feats, lens = _model_and_inputs(rng)
    cfg = BeamSearchConfig(beam_size=3, max_len=5, ctc_weight=0.3,
                           length_penalty=0.0)
    out = beam_search_transformer(model, params, feats, lens, EOS, cfg)
    ref = _host_beam_search(model, params, feats, lens, cfg)
    for b in range(feats.shape[0]):
        got_toks = list(np.asarray(out["tokens"][b, 0, : int(out["lengths"][b, 0])]))
        np.testing.assert_allclose(float(out["scores"][b, 0]),
                                   ref[b][0]["score"], rtol=1e-3, atol=1e-3)
        assert got_toks == ref[b][0]["toks"], (got_toks, ref[b][0]["toks"])


def test_beam1_ctc0_equals_greedy_attention(rng):
    """beam=1, ctc_weight=0 must reproduce greedy incremental decoding."""
    model, params, feats, lens = _model_and_inputs(rng, bsz=2)
    cfg = BeamSearchConfig(beam_size=1, max_len=6, ctc_weight=0.0)
    out = beam_search_transformer(model, params, feats, lens, EOS, cfg)
    enc, enc_lens = model.apply({"params": params}, feats, lens, False,
                                method=model.encode)
    for b in range(2):
        toks = []
        for _ in range(cfg.max_len):
            logp = _host_att_logp(model, params, enc[b: b + 1],
                                  enc_lens[b: b + 1], toks)
            nxt = int(np.argmax(logp[1:])) + 1  # blank forbidden
            if nxt == EOS:
                break
            toks.append(nxt)
        got = list(np.asarray(out["tokens"][b, 0, : int(out["lengths"][b, 0])]))
        assert got == toks, (got, toks)


def test_ctc_candidate_pruning_matches_full(rng):
    """With ctc_candidates >= V-2 (all non-blank tokens), the pruned path
    must reproduce the full-vocabulary search exactly."""
    model, params, feats, lens = _model_and_inputs(rng)
    full = beam_search_transformer(
        model, params, feats, lens, EOS,
        BeamSearchConfig(beam_size=3, max_len=5, ctc_weight=0.3))
    pruned = beam_search_transformer(
        model, params, feats, lens, EOS,
        BeamSearchConfig(beam_size=3, max_len=5, ctc_weight=0.3,
                         ctc_candidates=VOCAB - 2))
    for b in range(feats.shape[0]):
        t1 = list(np.asarray(full["tokens"][b, 0, : int(full["lengths"][b, 0])]))
        t2 = list(np.asarray(pruned["tokens"][b, 0, : int(pruned["lengths"][b, 0])]))
        assert t1 == t2
        np.testing.assert_allclose(float(full["scores"][b, 0]),
                                   float(pruned["scores"][b, 0]), rtol=1e-5)


def test_ctc_candidate_pruning_small_c_decodes(rng):
    """Aggressive pruning (C=2) still returns valid, finished hypotheses."""
    model, params, feats, lens = _model_and_inputs(rng)
    out = beam_search_transformer(
        model, params, feats, lens, EOS,
        BeamSearchConfig(beam_size=2, max_len=5, ctc_weight=0.3,
                         ctc_candidates=2))
    toks = np.asarray(out["tokens"])
    assert ((toks >= 0) & (toks < VOCAB)).all()
    assert np.asarray(out["scores"]).max() > NEG / 2


def test_length_normalized_final_ranking(rng):
    """normalize_final reranks by score/length; same hypothesis set."""
    model, params, feats, lens = _model_and_inputs(rng)
    raw = beam_search_transformer(
        model, params, feats, lens, EOS,
        BeamSearchConfig(beam_size=3, max_len=5, ctc_weight=0.3))
    norm = beam_search_transformer(
        model, params, feats, lens, EOS,
        BeamSearchConfig(beam_size=3, max_len=5, ctc_weight=0.3,
                         normalize_final=True))
    # the sets of (score, length) pairs agree; only the order may change
    for b in range(feats.shape[0]):
        raw_set = {(round(float(s), 4), int(l))
                   for s, l in zip(np.asarray(raw["scores"][b]),
                                   np.asarray(raw["lengths"][b]))}
        norm_set = {(round(float(s), 4), int(l))
                    for s, l in zip(np.asarray(norm["scores"][b]),
                                    np.asarray(norm["lengths"][b]))}
        assert raw_set == norm_set
        # normalized order is by score/len
        ns = np.asarray(norm["scores"][b]) / np.maximum(
            np.asarray(norm["lengths"][b]).astype(float), 1.0)
        assert (np.diff(ns) <= 1e-6).all()

def test_coverage_penalty_reranks_and_preserves_set(rng):
    """coverage_weight != 0 threads cross-attention coverage through the
    search: same hypothesis set (scores/lengths), ranking by
    score + w * covered-frame count; coverage never exceeds the valid
    frame count."""
    model, params, feats, lens = _model_and_inputs(rng)
    base = beam_search_transformer(
        model, params, feats, lens, EOS,
        BeamSearchConfig(beam_size=3, max_len=5, ctc_weight=0.3))
    cov = beam_search_transformer(
        model, params, feats, lens, EOS,
        BeamSearchConfig(beam_size=3, max_len=5, ctc_weight=0.3,
                         coverage_weight=0.05, coverage_tau=0.1))
    for b in range(feats.shape[0]):
        base_set = {(round(float(s), 4), int(l))
                    for s, l in zip(np.asarray(base["scores"][b]),
                                    np.asarray(base["lengths"][b]))}
        cov_set = {(round(float(s), 4), int(l))
                   for s, l in zip(np.asarray(cov["scores"][b]),
                                   np.asarray(cov["lengths"][b]))}
        assert base_set == cov_set
    assert np.asarray(cov["scores"]).max() > NEG / 2


def test_min_len_suppresses_early_eos(rng):
    """min_len (the static-shape minlenratio analogue) must (a) never
    return a top hypothesis shorter than min_len, (b) be a no-op when the
    unconstrained top hypothesis is already long enough."""
    model, params, feats, lens = _model_and_inputs(rng)
    base = BeamSearchConfig(beam_size=3, max_len=6, ctc_weight=0.3)
    out0 = beam_search_transformer(model, params, feats, lens, EOS, base)
    cfg = BeamSearchConfig(beam_size=3, max_len=6, ctc_weight=0.3, min_len=4)
    out = beam_search_transformer(model, params, feats, lens, EOS, cfg)
    for b in range(feats.shape[0]):
        for k in range(3):
            assert int(out["lengths"][b, k]) >= 4
        if int(out0["lengths"][b, 0]) >= 4:
            np.testing.assert_allclose(np.asarray(out0["scores"][b, 0]),
                                       np.asarray(out["scores"][b, 0]),
                                       rtol=1e-5)


def test_effective_ctc_candidates_auto_guard():
    """r5: full-vocab prefix scoring materializes [B,K,V,T] per decode
    step — an unguarded V=563 decode crashed the TPU worker. Auto mode
    (0) keeps small vocabs exact, prunes large ones; -1 forces full."""
    from metaasr_tpu.decode.beam_search import (
        AUTO_CTC_CANDIDATES,
        FULL_SCORING_MAX_VOCAB,
        effective_ctc_candidates,
    )

    assert effective_ctc_candidates(30, 0) == 0          # small: exact
    assert effective_ctc_candidates(FULL_SCORING_MAX_VOCAB, 0) == 0
    assert effective_ctc_candidates(563, 0) == AUTO_CTC_CANDIDATES
    assert effective_ctc_candidates(563, -1) == 0        # forced full
    assert effective_ctc_candidates(563, 40) == 40       # explicit
    assert effective_ctc_candidates(30, 99) == 30        # capped at V


def test_beam_large_vocab_auto_prunes_and_runs(rng):
    """A BPE-scale vocab decode with default (auto) settings must run —
    bounded memory via auto candidate pruning — and produce valid ids."""
    import jax.numpy as jnp

    from metaasr_tpu.decode.beam_search import (
        BeamSearchConfig,
        beam_search_transformer,
    )
    from metaasr_tpu.models.transformer import TransformerASR

    vocab, eos = 300, 299
    model = TransformerASR(vocab_size=vocab, d_model=32, num_heads=2,
                           d_ff=64, num_encoder_layers=2,
                           num_decoder_layers=2, dropout=0.0)
    feats = jnp.asarray(rng.standard_normal((2, 40, 80)), jnp.float32)
    lens = jnp.full((2,), 40, jnp.int32)
    toks = jnp.asarray(rng.integers(1, eos, (2, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens,
                        jnp.pad(toks, ((0, 0), (1, 0)), constant_values=eos),
                        jnp.full((2,), 5, jnp.int32))["params"]
    out = beam_search_transformer(
        model, params, feats, lens, eos,
        BeamSearchConfig(beam_size=3, max_len=6, ctc_weight=0.3))
    assert np.asarray(out["tokens"]).shape[:2] == (2, 3)
    assert (np.asarray(out["tokens"]) < vocab).all()
