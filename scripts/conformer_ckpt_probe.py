#!/usr/bin/env python
"""Dissect a TRAINED meta-checkpoint: why doesn't 5-shot adaptation move it?

Companion to conformer_inner_probe.py (which measures dynamics at init).
The ilr=0.001 retrain killed the "inner LR too hot" hypothesis: the
conformer meta-trains to the same ~WER-1.0-zero-shot state as the
transformer (CER 0.75 vs 0.77) but adaptation improves NOTHING
(adapt5 0.98 vs the transformer's 0.28 greedy / 0.026 beam) — so the
defect lives at the TRAINED point, not at init. This probe loads a
checkpoint and measures, on a real held-out support batch:

  1. parameter scale drift (global + top leaves by rms growth vs init) —
     a scale-blown LN-sandwiched network is adaptation-dead: LayerNorm
     makes the function scale-invariant while fixed-LR SGD displacement
     becomes relatively tiny;
  2. loss components (ctc vs att) at theta — which head is stuck;
  3. the adaptation trajectory (per-step support loss + ctc/att split +
     RELATIVE parameter displacement ||dp||/||p||) across an LR grid;
  4. query/test loss at theta vs adapted;
  5. greedy decode samples at theta and after adaptation.

Run:  python scripts/conformer_ckpt_probe.py \
        --workdir "/tmp/flagship_runs_cilr/hard_fomaml@conformer@ilr0.001" \
        --encoder conformer [--step N]
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
from metaasr_tpu.data.sampler import support_query_split
from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.train.meta_train import MetaASRTrainer
from metaasr_tpu.train.task import ASRTask

HELDOUT = "tango"
CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "config3_fomaml.yaml")


def leaf_name(path):
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def tree_norm(t):
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                              for x in jax.tree_util.tree_leaves(t))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--encoder", default="conformer")
    ap.add_argument("--data-dir", default="/tmp/flagship_synth_hard")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--inner-lr", type=float, default=None,
                    help="match the run's meta.inner_lr (affects nothing "
                         "here; grid is explicit)")
    ap.add_argument("--lrs", default="0.0003,0.001,0.003,0.01")
    ap.add_argument("--adapt-steps", type=int, default=5)
    args = ap.parse_args()

    cfg = load_config(CFG, {
        "meta.grad_dtype": None,
        "data.data_dir": args.data_dir,
        "data.heldout_accents": HELDOUT,
        "data.max_frames": 400,
        "data.max_tokens": 48,
        "train.eval_every": 10 ** 9,
    })
    tok = CharTokenizer.ascii_default()
    cfg.model.vocab_size = tok.vocab_size
    cfg.model.encoder = args.encoder
    if args.inner_lr is not None:
        cfg.meta.inner_lr = args.inner_lr
    dsets = load_accent_datasets(args.data_dir, tok)
    heldout = {HELDOUT: dsets.pop(HELDOUT)}
    task = ASRTask(cfg, tok.sos_eos_id)
    tr = MetaASRTrainer(cfg, task, dsets, heldout, tok, args.workdir)

    state0 = tr.init_state()
    init_params = state0.params
    state, step = tr.ckpt.restore(state0, step=args.step)
    params = state.params
    print(f"restored step {step} from {args.workdir}")

    # 1. parameter scale drift
    print(f"\n[1] global param norm: init {tree_norm(init_params):.1f} -> "
          f"trained {tree_norm(params):.1f}")
    pflat0 = jax.tree_util.tree_flatten_with_path(init_params)[0]
    pflat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    rows = []
    for (path, p0), (_, p1) in zip(pflat0, pflat1):
        r0 = float(jnp.sqrt(jnp.mean(jnp.square(
            jnp.asarray(p0, jnp.float32))))) or 1e-12
        r1 = float(jnp.sqrt(jnp.mean(jnp.square(
            jnp.asarray(p1, jnp.float32)))))
        rows.append((r1 / max(r0, 1e-12), r0, r1, leaf_name(path)))
    rows.sort(reverse=True)
    print("    top leaves by rms growth (ratio, init_rms, trained_rms):")
    for ratio, r0, r1, name in rows[:10]:
        print(f"    {ratio:10.1f}x  {r0:9.4f} -> {r1:9.4f}  {name}")

    # held-out support batch (the actual adaptation target, seed 0)
    support, test_idx = support_query_split(
        heldout[HELDOUT], cfg.meta.k_support, tr._num_samples_cap(),
        cfg.data.max_tokens, seed=0)
    texts = support["texts"]
    batch = {k: jnp.asarray(v) for k, v in support.items() if k != "texts"}

    @partial(jax.jit, static_argnums=(3,))
    def adapt_probe(p, b, lr, steps, rng=jax.random.PRNGKey(0), task=task):
        r_p, r_in = jax.random.split(rng)
        fb = task.preprocess(b, r_p, True)

        def body(pp, i):
            r = jax.random.fold_in(r_in, i)
            (loss, aux), g = jax.value_and_grad(
                lambda q: task.loss_fn(q, fb, r, True), has_aux=True)(pp)
            gn = jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                              for x in jax.tree_util.tree_leaves(g)))
            p2 = jax.tree_util.tree_map(
                lambda a, b_: a - lr.astype(a.dtype) * b_, pp, g)
            return p2, (loss, aux["ctc_loss"], aux["att_loss"], gn)

        adapted, tr_ = jax.lax.scan(body, p, jnp.arange(steps))
        # displacement, relative
        dp = jax.tree_util.tree_map(lambda a, b_: a - b_, adapted, p)
        rel = (jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                            for x in jax.tree_util.tree_leaves(dp)))
               / jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                              for x in jax.tree_util.tree_leaves(p))))
        l1, aux1 = task.loss_fn(adapted, fb, jax.random.PRNGKey(9), False)
        return adapted, tr_, rel, (l1, aux1["ctc_loss"], aux1["att_loss"])

    # 2. loss components at theta (eval mode, no dropout/augment)
    fb_eval = task.preprocess(batch, jax.random.PRNGKey(7), False)
    l0, aux0 = jax.jit(lambda p, b: task.loss_fn(p, b, jax.random.PRNGKey(9),
                                                 False))(params, fb_eval)
    print(f"\n[2] support loss at theta (eval): total={float(l0):.3f} "
          f"ctc={float(aux0['ctc_loss']):.3f} "
          f"att={float(aux0['att_loss']):.3f}")

    # 3/4. adaptation trajectory across LRs
    print(f"\n[3] adaptation trajectory ({args.adapt_steps} steps, "
          "train-mode losses; eval-mode after):")
    adapted_best = None
    for lr in [float(x) for x in args.lrs.split(",")]:
        adapted, tr_, rel, after = adapt_probe(
            params, batch, jnp.float32(lr), args.adapt_steps)
        losses, ctcs, atts, gns = [np.asarray(x) for x in tr_]
        l1, c1, a1 = [float(x) for x in after]
        print(f"  lr={lr:<7} support={list(losses.round(2))}")
        print(f"           ctc={list(ctcs.round(2))} att={list(atts.round(2))}"
              f" gnorm={list(gns.round(1))}")
        print(f"           ||dp||/||p||={float(rel):.2e}  after(eval): "
              f"total={l1:.3f} ctc={c1:.3f} att={a1:.3f}")
        if adapted_best is None:
            adapted_best = adapted  # first grid point for decode below

    # 5. greedy decode samples before/after (use the run's own adaptation)
    from metaasr_tpu.meta.maml import split_lr
    ad_run = tr._jit_adapt(args.adapt_steps)(params, batch,
                                             jax.random.PRNGKey(0))
    for tag, p in (("theta", params), ("adapted(run-cfg)",
                                       split_lr(ad_run)[0])):
        ids, lens = task.greedy_batch(p, batch)
        ids, lens = np.asarray(ids), np.asarray(lens)
        print(f"\n[5] greedy on support @ {tag}:")
        for i in range(min(3, ids.shape[0])):
            text = tok.decode(list(ids[i, : lens[i]]))
            print(f"    ref: {texts[i]!r}")
            print(f"    hyp: {text!r}")


if __name__ == "__main__":
    main()
