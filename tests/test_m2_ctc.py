"""M2: CTC loss golden-tested vs torch.nn.CTCLoss (loss AND gradient),
plus brute-force alignment enumeration and masking-invariance properties
(SURVEY.md section 4.1-4.2)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import torch

from metaasr_tpu.ops.ctc import ctc_forward, ctc_loss, extend_labels


def _rand_case(rng, bsz, t_len, u_len, vocab):
    logits = rng.standard_normal((bsz, t_len, vocab)).astype(np.float32)
    logit_lens = rng.integers(max(u_len * 2 + 1, 2), t_len + 1, size=bsz).astype(np.int32)
    labels = rng.integers(1, vocab, size=(bsz, u_len)).astype(np.int32)
    label_lens = rng.integers(1, u_len + 1, size=bsz).astype(np.int32)
    labels = labels * (np.arange(u_len)[None, :] < label_lens[:, None])
    return logits, logit_lens, labels, label_lens


def _torch_ctc(logits, logit_lens, labels, label_lens):
    lp = torch.from_numpy(logits).log_softmax(-1).permute(1, 0, 2)  # [T, B, V]
    lp.requires_grad_(True)
    loss = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=False)(
        lp, torch.from_numpy(labels), torch.from_numpy(logit_lens),
        torch.from_numpy(label_lens))
    loss.sum().backward()
    grad = lp.grad.permute(1, 0, 2).numpy()  # d(sum nll)/d log_probs, [B, T, V]
    return loss.detach().numpy(), grad


def test_ctc_matches_torch_loss_and_grad(rng):
    for (bsz, t_len, u_len, vocab) in [(3, 12, 4, 6), (5, 40, 10, 30), (2, 7, 3, 4)]:
        logits, logit_lens, labels, label_lens = _rand_case(rng, bsz, t_len, u_len, vocab)
        ref_loss, ref_grad = _torch_ctc(logits, logit_lens, labels, label_lens)

        def loss_fn(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return ctc_forward(lp, jnp.asarray(logit_lens), jnp.asarray(labels),
                               jnp.asarray(label_lens)).sum()

        got_loss = ctc_forward(jax.nn.log_softmax(jnp.asarray(logits), -1),
                               jnp.asarray(logit_lens), jnp.asarray(labels),
                               jnp.asarray(label_lens))
        np.testing.assert_allclose(np.asarray(got_loss), ref_loss, rtol=1e-4, atol=1e-4)

        # gradient w.r.t. logits (chain through log_softmax on both sides)
        got_grad = jax.grad(loss_fn)(jnp.asarray(logits))
        lp_t = torch.from_numpy(logits).clone().requires_grad_(True)
        loss_t = torch.nn.CTCLoss(blank=0, reduction="none")(
            lp_t.log_softmax(-1).permute(1, 0, 2), torch.from_numpy(labels),
            torch.from_numpy(logit_lens), torch.from_numpy(label_lens))
        loss_t.sum().backward()
        np.testing.assert_allclose(np.asarray(got_grad), lp_t.grad.numpy(),
                                   rtol=2e-4, atol=2e-4)
        del ref_grad


def test_ctc_bruteforce_enumeration(rng):
    """alpha recursion == explicit sum over all collapsing alignments."""
    vocab, t_len = 3, 5
    logits = rng.standard_normal((1, t_len, vocab)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]
    for labels in ([1], [1, 2], [2, 2], [1, 2, 1]):
        total = 0.0
        for path in itertools.product(range(vocab), repeat=t_len):
            collapsed = [k for k, g in itertools.groupby(path) if k != 0]
            if collapsed == labels:
                total += np.exp(sum(lp[t, path[t]] for t in range(t_len)))
        expect = -np.log(total) if total > 0 else np.inf
        got = ctc_forward(
            jnp.asarray(lp)[None], jnp.array([t_len]),
            jnp.asarray(np.array(labels + [0] * (4 - len(labels)))[None]),
            jnp.array([len(labels)]))
        np.testing.assert_allclose(float(got[0]), expect, rtol=1e-5)


def test_ctc_padding_invariance(rng):
    """Extra time padding and extra label padding never change the loss."""
    logits, logit_lens, labels, label_lens = _rand_case(rng, 4, 20, 5, 8)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    base = ctc_forward(lp, jnp.asarray(logit_lens), jnp.asarray(labels),
                       jnp.asarray(label_lens))
    # pad T with garbage frames beyond logit_lens
    pad_t = jnp.concatenate(
        [lp, jnp.asarray(rng.standard_normal((4, 7, 8)).astype(np.float32))], axis=1)
    got_t = ctc_forward(pad_t, jnp.asarray(logit_lens), jnp.asarray(labels),
                        jnp.asarray(label_lens))
    np.testing.assert_allclose(np.asarray(base), np.asarray(got_t), rtol=1e-6)
    # pad U with garbage labels beyond label_lens
    junk = np.concatenate([labels, rng.integers(1, 8, size=(4, 3)).astype(np.int32)], axis=1)
    got_u = ctc_forward(lp, jnp.asarray(logit_lens), jnp.asarray(junk),
                        jnp.asarray(label_lens))
    np.testing.assert_allclose(np.asarray(base), np.asarray(got_u), rtol=1e-6)


def test_ctc_zero_infinity():
    """T shorter than needed => infeasible => loss (and grad) zeroed."""
    vocab = 4
    lp = jax.nn.log_softmax(jnp.zeros((1, 2, vocab)), -1)
    labels = jnp.array([[1, 1]])  # repeat needs blank between: min T = 3
    out = ctc_loss(lp, jnp.array([2]), labels, jnp.array([2]))
    assert float(out[0]) == 0.0
    g = jax.grad(lambda x: ctc_loss(jax.nn.log_softmax(x, -1), jnp.array([2]),
                                    labels, jnp.array([2])).sum())(jnp.zeros((1, 2, vocab)))
    assert np.allclose(np.asarray(g), 0.0)


def test_extend_labels():
    z = extend_labels(jnp.array([[1, 2, 0]]))
    assert list(np.asarray(z[0])) == [0, 1, 0, 2, 0, 0, 0]


def test_ctc_empty_target(rng):
    """U=0: loss must equal -sum_t logp_t(blank)."""
    logits = rng.standard_normal((1, 6, 5)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    got = ctc_forward(lp, jnp.array([6]), jnp.zeros((1, 3), jnp.int32), jnp.array([0]))
    expect = -float(np.asarray(lp[0, :, 0]).sum())
    np.testing.assert_allclose(float(got[0]), expect, rtol=1e-5)
