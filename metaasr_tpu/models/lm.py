"""Token-level LSTM language model for shallow fusion at decode time.

The reference family's ESPnet-lineage decoders support rescoring the beam
with an external RNN language model ("shallow fusion": the beam score
gains ``lm_weight * log p_LM(token | prefix)`` per emitted token;
SURVEY.md section 2.1 #11 — joint score "(+ length penalty / coverage)"
is the same score-shaping slot). This is the TPU-native counterpart:

- the LM's decode-time surface is a *step function* over fixed-shape
  carry state ``(h, c per layer)``, exactly the contract the batched
  on-device beam search needs to keep the whole fused search one jitted
  program (decode/beam_search.py) — no host ping-pong per token;
- training runs the same cell under ``lax.scan`` with the input
  projection hoisted into one [B*U, 4H] matmul (the MXU-friendly form
  used by models/vgg_blstm.py), so sequence mode and step mode are the
  same parameters and the parity is unit-tested;
- the token inventory is the ASR tokenizer's (blank unused, shared
  sos/eos at vocab_size-1), so a fused LM scores exactly the hypothesis
  space the beam explores.

Checkpoints are plain npz pytrees (train/checkpoint.py
``save_params_npz``); the architecture is recovered from the parameter
shapes (``lm_dims_from_params``), so a decode-time consumer needs only
the file path and a weight.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class LSTMLM(nn.Module):
    """Embedding -> stacked unidirectional LSTM -> tied-free output proj.

    Two call surfaces over the SAME parameters:
    - ``__call__(tokens [B, U]) -> logits [B, U, V]`` (teacher-forced
      training / scoring; scan over time, input matmul hoisted);
    - ``step(tokens [N, 1], state) -> (logits [N, V], state)`` with
      ``state = init_state(N)`` (beam-search fusion; one cell update).
    """

    vocab_size: int
    embed_dim: int = 128
    hidden: int = 256
    layers: int = 2

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.embed_dim, name="embed")
        h4 = 4 * self.hidden
        self.input_projs = [
            nn.Dense(h4, name=f"input_proj_{i}") for i in range(self.layers)]
        self.recurrents = [
            self.param(f"recurrent_{i}", nn.initializers.orthogonal(),
                       (self.hidden, h4), jnp.float32)
            for i in range(self.layers)]
        self.out_proj = nn.Dense(self.vocab_size, name="out_proj")

    @staticmethod
    def _cell(g, c):
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        # forget-gate bias +1, as in models/vgg_blstm.py
        c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, c

    def __call__(self, tokens: jax.Array) -> jax.Array:
        bsz, _ = tokens.shape
        x = self.embed(tokens)                                # [B, U, E]
        for li in range(self.layers):
            gx = self.input_projs[li](x)                      # [B, U, 4H]
            u = self.recurrents[li]

            def step(carry, gx_t):
                h, c = carry
                h, c = self._cell(gx_t + h @ u, c)
                return (h, c), h

            init = (jnp.zeros((bsz, self.hidden), x.dtype),
                    jnp.zeros((bsz, self.hidden), x.dtype))
            _, hs = jax.lax.scan(step, init, jnp.moveaxis(gx, 1, 0))
            x = jnp.moveaxis(hs, 0, 1)                        # [B, U, H]
        return self.out_proj(x)                               # [B, U, V]

    def init_state(self, n: int):
        """Fixed-shape carry for ``step``: h/c arrays [N, layers, H].

        The row axis leads so beam search can re-gather state rows per
        reselection with the same leaf transform as the decoder KV caches.
        """
        z = jnp.zeros((n, self.layers, self.hidden), jnp.float32)
        return {"h": z, "c": z}

    def step(self, tokens: jax.Array, state):
        """One LM step. tokens [N, 1] (last emitted / sos); returns
        (logits [N, V], new state)."""
        x = self.embed(tokens[:, 0])                          # [N, E]
        hs, cs = [], []
        for li in range(self.layers):
            g = (self.input_projs[li](x)
                 + state["h"][:, li] @ self.recurrents[li])
            h, c = self._cell(g, state["c"][:, li])
            hs.append(h)
            cs.append(c)
            x = h
        return self.out_proj(x), {"h": jnp.stack(hs, axis=1),
                                  "c": jnp.stack(cs, axis=1)}


def lm_dims_from_params(params) -> dict:
    """Recover constructor kwargs from a params pytree (npz round-trip
    carries no metadata)."""
    vocab, embed_dim = np.shape(params["embed"]["embedding"])
    hidden = np.shape(params["recurrent_0"])[0]
    layers = sum(1 for k in params if str(k).startswith("recurrent_"))
    return {"vocab_size": int(vocab), "embed_dim": int(embed_dim),
            "hidden": int(hidden), "layers": int(layers)}


def lm_nll(model: LSTMLM, params, tokens: jax.Array, lens: jax.Array,
           sos_eos: int):
    """Mean per-token negative log-likelihood of ``tokens`` (padded [B, U],
    true lengths ``lens``) under the LM, with sos prepended and eos as the
    final prediction target — the exact quantity shallow fusion adds along
    a finished beam hypothesis (up to the weight)."""
    bsz, u_len = tokens.shape
    sos = jnp.full((bsz, 1), sos_eos, tokens.dtype)
    inputs = jnp.concatenate([sos, tokens], axis=1)           # [B, U+1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (bsz, u_len + 1), 1)
    targets = jnp.where(pos < lens[:, None],
                        jnp.concatenate([tokens, jnp.zeros((bsz, 1),
                                                           tokens.dtype)], 1),
                        sos_eos)                              # eos at t=len
    valid = pos <= lens[:, None]                              # U tokens + eos
    logits = model.apply({"params": params}, inputs)          # [B, U+1, V]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    tok_logp = jnp.take_along_axis(logp, targets[:, :, None], 2)[..., 0]
    return -(jnp.where(valid, tok_logp, 0.0).sum()
             / jnp.maximum(valid.sum(), 1))


def train_char_lm(texts, tokenizer, embed_dim: int = 128, hidden: int = 256,
                  layers: int = 2, steps: int = 300, batch_size: int = 32,
                  lr: float = 1e-3, max_len: int = 64, seed: int = 0,
                  log_every: int = 0):
    """Train an LSTMLM on transcript strings; returns (model, params,
    final mean NLL). Small and self-contained — the LM corpus in this
    framework is the training accents' transcripts (scripts/train_lm.py)."""
    import optax

    enc = [np.asarray(tokenizer.encode(t))[:max_len] for t in texts if t]
    if not enc:
        raise ValueError("empty LM corpus")
    u_max = max(len(e) for e in enc)
    toks = np.zeros((len(enc), u_max), np.int32)
    lens = np.zeros((len(enc),), np.int32)
    for i, e in enumerate(enc):
        toks[i, :len(e)] = e
        lens[i] = len(e)

    model = LSTMLM(vocab_size=tokenizer.vocab_size, embed_dim=embed_dim,
                   hidden=hidden, layers=layers)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, 2), jnp.int32))["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    sos_eos = tokenizer.sos_eos_id

    @jax.jit
    def train_step(params, opt_state, tok, ln):
        loss, grads = jax.value_and_grad(
            lambda p: lm_nll(model, p, tok, ln, sos_eos))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    loss = jnp.inf
    for s in range(steps):
        idx = rng.integers(0, len(enc), size=min(batch_size, len(enc)))
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(toks[idx]), jnp.asarray(lens[idx]))
        if log_every and (s + 1) % log_every == 0:
            print(f"lm step {s + 1}/{steps} nll {float(loss):.4f}")
    return model, params, float(loss)


def make_lm_step_fn(model: LSTMLM, params):
    """Adapt (model, params) to the beam search's ``lm_step_fn(tokens
    [N, 1], state) -> (logp [N, V], state)`` contract."""

    def lm_step_fn(tokens, state):
        logits, state = model.apply({"params": params}, tokens, state,
                                    method=model.step)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), state

    return lm_step_fn
