#!/usr/bin/env python
"""Inner-loop dynamics probe: why does the conformer meta-train ~3x slower?

Plain multitask training fits the hard benchmark with either encoder
(docs/flagship_hard_r3_conformer_multi.json: zero-shot WER 0.25), but
FOMAML@conformer sits at WER ~1.0 after 1500 steps while
FOMAML@transformer reaches 0.026 (docs/flagship_hard_r3*.json). The ONLY
thing FOMAML adds over multitask is the inner loop (k SGD steps at
meta.inner_lr on the support batch) and the query gradient evaluated at
the adapted point — so this probe measures exactly that, at init and
with no training in the way:

  1. per-inner-step support losses across an inner-LR grid (LR is a
     traced argument: one compile per encoder covers the whole grid);
  2. query loss at theta vs at adapted theta' (does adaptation at init
     HURT the query loss for one encoder and not the other?);
  3. the FOMAML outer gradient's global norm and its largest leaves by
     grad-rms/param-rms (is the outer signal dominated by a few leaves,
     e.g. a LayerNorm pushed degenerate by the inner SGD steps?).

Run:  python scripts/conformer_inner_probe.py [--steps 5] [--lrs ...]
      (defaults probe both encoders on the hard profile, flagship dims)
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

_p = os.environ.get("JAX_PLATFORMS")
if _p:
    jax.config.update("jax_platforms", _p)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "rbg")

from metaasr_tpu.config import load_config
from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.synthetic import ACCENTS_HARD, generate_dataset
from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.train.meta_train import MetaASRTrainer
from metaasr_tpu.train.task import ASRTask

HELDOUT = "tango"
CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "config3_fomaml.yaml")


def build(encoder: str, data_dir: str, tiny: bool):
    cfg = load_config(CFG, {
        "meta.grad_dtype": None,
        "data.data_dir": data_dir,
        "data.heldout_accents": HELDOUT,
        "data.max_frames": 400,
        "data.max_tokens": 48,
        "train.eval_every": 10 ** 9,
    })
    tok = CharTokenizer.ascii_default()
    cfg.model.vocab_size = tok.vocab_size
    cfg.model.encoder = encoder
    if tiny:
        cfg.model.d_model, cfg.model.num_heads = 32, 2
        cfg.model.d_ff = 64
        cfg.model.num_encoder_layers = 2
        cfg.model.num_decoder_layers = 2
        cfg.model.dtype = "float32"
        cfg.frontend.use_pallas = False
        cfg.meta.tasks_per_batch = 2
        cfg.data.max_frames = 200
    dsets = load_accent_datasets(data_dir, tok)
    heldout = {HELDOUT: dsets.pop(HELDOUT)}
    task = ASRTask(cfg, tok.sos_eos_id)
    tr = MetaASRTrainer(cfg, task, dsets, heldout, tok,
                        f"/tmp/probe_{encoder}")
    return cfg, task, tr


def leaf_name(path):
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--lrs", default="0.001,0.003,0.01,0.03")
    ap.add_argument("--data-dir", default="/tmp/flagship_synth_hard")
    ap.add_argument("--encoders", default="transformer,conformer")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data_dir, f"{HELDOUT}.jsonl")):
        generate_dataset(args.data_dir, accents=ACCENTS_HARD,
                         utts_per_accent=192, words_per_utt=(3, 6), seed=0,
                         profile="hard")

    lrs = [float(x) for x in args.lrs.split(",")]

    for encoder in args.encoders.split(","):
        cfg, task, tr = build(encoder, args.data_dir, args.tiny)
        state = tr.init_state()
        mb = tr.sampler.sample(0)
        mb = {s: {k: v for k, v in mb[s].items() if k != "texts"}
              for s in ("support", "query")}
        mb = jax.device_put(mb)
        rng = jax.random.PRNGKey(0)

        @partial(jax.jit, static_argnums=(4,))
        def probe(params, support, query, lr, steps, rng=rng, task=task):
            r_ps, r_pq, r_in, r_q = jax.random.split(rng, 4)
            support = task.preprocess(support, r_ps, True)
            query = task.preprocess(query, r_pq, True)

            def body(p, i):
                r = jax.random.fold_in(r_in, i)
                (loss, _), g = jax.value_and_grad(
                    lambda q: task.loss_fn(q, support, r, True),
                    has_aux=True)(p)
                gn = jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                                  for x in jax.tree_util.tree_leaves(g)))
                p2 = jax.tree_util.tree_map(
                    lambda a, b: a - lr.astype(a.dtype) * b, p, g)
                return p2, (loss, gn)

            adapted, (s_losses, g_norms) = jax.lax.scan(
                body, params, jnp.arange(steps))
            q0 = task.loss_fn(params, query, r_q, True)[0]
            q1 = task.loss_fn(adapted, query, r_q, True)[0]
            return s_losses, g_norms, q0, q1

        print(f"\n=== {encoder} (d={cfg.model.d_model}, "
              f"{cfg.model.num_encoder_layers}L) ===")
        sup0 = {k: v[0] for k, v in mb["support"].items()}
        qry0 = {k: v[0] for k, v in mb["query"].items()}
        for lr in lrs:
            s, gn, q0, q1 = probe(state.params, sup0, qry0,
                                  jnp.float32(lr), args.steps)
            s = np.asarray(s).round(3)
            gn = np.asarray(gn).round(1)
            print(f"  inner_lr={lr:<6} support={list(s)}  "
                  f"inner_gnorm={list(gn)}  query@theta={float(q0):.3f} "
                  f"query@adapted={float(q1):.3f}")

        # FOMAML outer gradient diagnostics at init (shipped inner cfg)
        grads, metrics = jax.jit(tr._grad_fn)(
            state.params, mb, jax.random.PRNGKey(1))
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        pflat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        rows = []
        for (path, g), (_, p) in zip(flat, pflat):
            g = np.asarray(g, np.float32)
            p = np.asarray(p, np.float32)
            grms = float(np.sqrt(np.mean(g ** 2)))
            prms = float(np.sqrt(np.mean(p ** 2))) or 1e-12
            rows.append((grms / prms, grms, leaf_name(path)))
        rows.sort(reverse=True)
        gn = float(np.sqrt(sum(r[1] ** 2 * 1 for r in rows)))  # approx
        print(f"  outer: meta_loss={float(metrics['meta_loss']):.3f} "
              f"grad_norm={float(jax.jit(lambda g: jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(g))))(grads)):.1f} (clip=5.0)")
        print("  top leaves by grad_rms/param_rms:")
        for ratio, grms, name in rows[:8]:
            print(f"    {ratio:10.3f}  grad_rms={grms:9.4f}  {name}")


if __name__ == "__main__":
    main()
