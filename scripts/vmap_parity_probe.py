#!/usr/bin/env python
"""Outer-gradient parity: vmapped task axis vs an explicit python loop.

The conformer meta-trains to a broken-CTC state (ctc ~58 vs multitask's 13,
scripts/conformer_ckpt_probe.py) while the SAME encoder under the unvmapped
multitask trainer is fine — so the suspect set includes the one transform
multitask never exercises: ``jax.vmap`` over the task axis wrapping the
model's forward+backward (notably the depthwise grouped conv: batching a
``feature_group_count=d`` conv and its gradient is an XLA path the
transformer never hits). This probe computes the FOMAML outer gradient two
ways with IDENTICAL per-task rngs:

  A. the shipped vmapped ``make_meta_loss`` path;
  B. a python loop over tasks — per-task ``jax.grad`` of (inner adapt ->
     query loss), host-averaged;

and reports per-leaf max|A-B| / rms(B). Run on the TPU backend (the CPU
suite already pins transformer vmap-vs-loop parity; the TPU lowering is
the one in question) with both encoders and both model dtypes.

Run:  python scripts/vmap_parity_probe.py [--encoders ...] [--dtypes ...]
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

from metaasr_tpu.config import load_config
from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.synthetic import ACCENTS_HARD, generate_dataset
from metaasr_tpu.data.tokenizer import CharTokenizer
from metaasr_tpu.meta.maml import MetaAlgoConfig, make_inner_adapt
from metaasr_tpu.train.meta_train import MetaASRTrainer, algo_config
from metaasr_tpu.train.task import ASRTask

HELDOUT = "tango"
CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "config3_fomaml.yaml")


def leaf_name(path):
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/flagship_synth_hard")
    ap.add_argument("--encoders", default="conformer,transformer")
    ap.add_argument("--dtypes", default="bfloat16,float32")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prng", default="rbg", choices=("rbg", "threefry2x32"),
                    help="rbg matches training but its random STREAMS are "
                         "not vmap-invariant: dropout/SpecAugment draws "
                         "differ between the vmapped and looped paths, so "
                         "with stochastic layers on, rbg rows measure "
                         "draw-sensitivity, NOT lowering correctness. Use "
                         "threefry2x32 (vmap-invariant) or --deterministic "
                         "for a true lowering-parity check")
    ap.add_argument("--deterministic", action="store_true",
                    help="dropout=0 + SpecAugment off: the two paths "
                         "compute the SAME mathematical function, so any "
                         "residual gap is numerics/lowering")
    ap.add_argument("--inner-steps", type=int, default=None,
                    help="override meta.inner_steps (0 disables the inner "
                         "loop entirely: outer grad == plain query grad)")
    args = ap.parse_args()
    jax.config.update("jax_default_prng_impl", args.prng)

    if not os.path.exists(os.path.join(args.data_dir, f"{HELDOUT}.jsonl")):
        generate_dataset(args.data_dir, accents=ACCENTS_HARD,
                         utts_per_accent=192, words_per_utt=(3, 6), seed=0,
                         profile="hard")

    for encoder in args.encoders.split(","):
        for dtype in args.dtypes.split(","):
            cfg = load_config(CFG, {
                "meta.grad_dtype": None,
                "data.data_dir": args.data_dir,
                "data.heldout_accents": HELDOUT,
                "data.max_frames": 400,
                "data.max_tokens": 48,
                "train.eval_every": 10 ** 9,
                "model.dtype": dtype,
            })
            if args.deterministic:
                cfg.model.dropout = 0.0
                cfg.specaug.enabled = False
            if args.inner_steps is not None:
                cfg.meta.inner_steps = args.inner_steps
            tok = CharTokenizer.ascii_default()
            cfg.model.vocab_size = tok.vocab_size
            cfg.model.encoder = encoder
            dsets = load_accent_datasets(args.data_dir, tok)
            heldout = {HELDOUT: dsets.pop(HELDOUT)}
            task = ASRTask(cfg, tok.sos_eos_id)
            tr = MetaASRTrainer(cfg, task, dsets, heldout, tok,
                                f"/tmp/vparity_{encoder}_{dtype}")
            params = tr.init_state().params
            mb = tr.sampler.sample(args.seed)
            mb = {s: {k: jnp.asarray(v) for k, v in mb[s].items()
                      if k != "texts"} for s in ("support", "query")}
            acfg = algo_config(cfg)
            inner = make_inner_adapt(task.loss_fn, acfg, train=True)

            def per_task_loss(p, support, query, rng,
                              task=task, inner=inner):
                # EXACT mirror of meta/maml.py per_task rng discipline
                r_in, r_q, r_ps, r_pq = jax.random.split(rng, 4)
                support = task.preprocess(support, r_ps, True)
                query = task.preprocess(query, r_pq, True)
                adapted, _ = inner(p, support, r_in)
                from metaasr_tpu.meta.maml import split_lr
                return task.loss_fn(split_lr(adapted)[0], query, r_q, True)[0]

            rng = jax.random.PRNGKey(1)
            m = jax.tree_util.tree_leaves(mb["support"])[0].shape[0]
            rngs = jax.random.split(rng, m)

            @jax.jit
            def grads_vmap(p, mb, rngs):
                def ml(p):
                    q = jax.vmap(per_task_loss, in_axes=(None, 0, 0, 0))(
                        p, mb["support"], mb["query"], rngs)
                    return q.mean()
                return jax.grad(ml)(p)

            @jax.jit
            def grad_one(p, support, query, r):
                return jax.grad(per_task_loss)(p, support, query, r)

            gv = grads_vmap(params, mb, rngs)
            acc = None
            for i in range(m):
                sup_i = {k: v[i] for k, v in mb["support"].items()}
                qry_i = {k: v[i] for k, v in mb["query"].items()}
                gi = grad_one(params, sup_i, qry_i, rngs[i])
                acc = gi if acc is None else jax.tree_util.tree_map(
                    jnp.add, acc, gi)
            gl = jax.tree_util.tree_map(lambda x: x / m, acc)

            flat_v = jax.tree_util.tree_flatten_with_path(gv)[0]
            flat_l = jax.tree_util.tree_flatten_with_path(gl)[0]
            rows = []
            for (path, a), (_, b) in zip(flat_v, flat_l):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                denom = max(float(np.sqrt(np.mean(b ** 2))), 1e-12)
                rows.append((float(np.max(np.abs(a - b))) / denom,
                             leaf_name(path)))
            rows.sort(reverse=True)
            gn_v = float(jnp.sqrt(sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(gv))))
            gn_l = float(jnp.sqrt(sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(gl))))
            print(f"\n=== {encoder} dtype={dtype} ===")
            print(f"  grad_norm vmap={gn_v:.3f} loop={gn_l:.3f}")
            print("  worst leaves by max|A-B|/rms(B):")
            for r, name in rows[:6]:
                print(f"    {r:12.4e}  {name}")


if __name__ == "__main__":
    main()
