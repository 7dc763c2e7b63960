#!/usr/bin/env python
"""Inspect the LEARNED Meta-SGD per-leaf inner rates of a trained run.

Companion to the conformer meta-training bisection (docs/DESIGN.md §8,
RESULTS.md conformer table). The metasgd arm asked: can learned per-leaf
rates (`meta.learn_inner_lr`) DISCOVER the ANIL-decoder fix — drive the
poisonous modules' (conformer body, CTC head) rates to ~0 and keep the
decoder's — faster than full-body inner SGD destroys training? This
probe loads the final checkpoint and reports the learned-rate
distribution grouped by top-level module, answering what the outer
optimizer actually did with the rates.

Run: python scripts/metasgd_rates_probe.py \
       --workdir "/tmp/flagship_runs_metasgd/hard_fomaml@conformer@metasgd" \
       --encoder conformer
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

_p = os.environ.get("JAX_PLATFORMS")
if _p:
    jax.config.update("jax_platforms", _p)
jax.config.update("jax_default_prng_impl", "rbg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--encoder", default="conformer")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--data-dir", default="/tmp/flagship_synth_hard")
    args = ap.parse_args()

    from flagship_results import HELDOUT, make_cfg

    from metaasr_tpu.data.dataset import load_accent_datasets
    from metaasr_tpu.data.tokenizer import CharTokenizer
    from metaasr_tpu.train.meta_train import MetaASRTrainer
    from metaasr_tpu.train.task import ASRTask

    tok = CharTokenizer.ascii_default()
    cfg = make_cfg("fomaml", 1500, args.data_dir)
    cfg.model.vocab_size = tok.vocab_size
    cfg.model.encoder = args.encoder
    cfg.meta.learn_inner_lr = True
    dsets = load_accent_datasets(args.data_dir, tok)
    heldout = {HELDOUT: dsets.pop(HELDOUT)}
    task = ASRTask(cfg, tok.sos_eos_id)
    tr = MetaASRTrainer(cfg, task, dsets, heldout, tok, args.workdir)
    state, step = tr.ckpt.restore(tr.init_state(), step=args.step)
    print(f"restored step {step}")
    lr_tree = state.params["inner_lr"]
    init = cfg.meta.inner_lr

    groups = {}
    flat = jax.tree_util.tree_flatten_with_path(lr_tree)[0]
    for path, leaf in flat:
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        # group at the module level: encoder body / ctc head / decoder /
        # frontend-ish leftovers
        name = next((k for k in keys if "decoder" in k), None) \
            or next((k for k in keys if "ctc" in k), None) \
            or next((k for k in keys if "encoder" in k or "conformer" in k
                     or "subsampl" in k.lower()), None) or keys[0]
        key = ("decoder" if "decoder" in name
               else "ctc_head" if "ctc" in name else "encoder_body")
        groups.setdefault(key, []).append(float(np.asarray(leaf)))

    print(f"init rate: {init}")
    print(f"{'module':<14}{'n':>5}{'mean':>12}{'median':>12}"
          f"{'min':>12}{'max':>12}{'mean/init':>11}")
    for key in sorted(groups):
        v = np.asarray(groups[key])
        print(f"{key:<14}{len(v):>5}{v.mean():>12.5f}"
              f"{np.median(v):>12.5f}{v.min():>12.5f}{v.max():>12.5f}"
              f"{v.mean() / init:>11.2f}")
    allv = np.asarray([x for v in groups.values() for x in v])
    neg = (allv < 0).sum()
    print(f"all leaves: n={len(allv)} mean={allv.mean():.5f} "
          f"negative-rate leaves={neg} "
          f"({100 * neg / len(allv):.1f}% — sign flips are allowed, "
          f"LSLR semantics)")


if __name__ == "__main__":
    main()
