"""CLI entry point.

Mirrors the reference's interface (R: main.py, SURVEY.md section 2.1 #1):

    python main.py --config configs/config3_fomaml.yaml --mode train \
        --algo fomaml [--ckpt DIR] [--seed N] [-o key=value ...]

modes: train | adapt | test;  algos: no | multi | fomaml | maml | reptile
(algo overrides config; 'no' = single-accent baseline, 'multi' = pooled
multi-accent multitask, SURVEY.md section 2.1 #3-#6).
"""

from __future__ import annotations

import argparse
import json
import os

from metaasr_tpu.config import Config, load_config, save_config
from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.tokenizer import CharTokenizer, PhoneTokenizer


def _corpus_texts(data_dir: str, field: str) -> list[str]:
    from metaasr_tpu.data.dataset import Manifest, discover_accents

    texts = []
    for accent in discover_accents(data_dir):
        man = Manifest.load(os.path.join(data_dir, f"{accent}.jsonl"))
        texts.extend(getattr(u, field) for u in man.utts)
    return texts


def build_tokenizer(cfg: Config):
    """Vocabulary: loaded from data_dir/vocab_<type>.json when present,
    otherwise built from the manifests (and cached there)."""
    kind = cfg.data.vocab
    if kind == "char":
        return CharTokenizer.ascii_default()
    vocab_path = os.path.join(cfg.data.data_dir, f"vocab_{kind}.json")
    if kind == "phone":
        if os.path.exists(vocab_path):
            return PhoneTokenizer.load(vocab_path)
        tok = PhoneTokenizer.from_corpus(_corpus_texts(cfg.data.data_dir,
                                                       "phones"))
        if len(tok.symbols) == 0:  # manifests carry no phone field
            tok = PhoneTokenizer.arpabet_default()
        tok.save(vocab_path)
        return tok
    if kind == "bpe":
        from metaasr_tpu.data.bpe import BPETokenizer

        if os.path.exists(vocab_path):
            return BPETokenizer.load(vocab_path)
        tok = BPETokenizer.from_corpus(_corpus_texts(cfg.data.data_dir, "text"))
        tok.save(vocab_path)
        return tok
    raise ValueError(f"unknown vocab type {kind}")


def _parse_override(kv: str):
    key, val = kv.split("=", 1)
    for cast in (int, float):
        try:
            return key, cast(val)
        except ValueError:
            pass
    if val.lower() in ("true", "false"):
        return key, val.lower() == "true"
    return key, val


def make_trainer(cfg: Config, workdir: str, mesh=None):
    """Builds (trainer, tokenizer) for the configured algo."""
    from metaasr_tpu.train.meta_train import MetaASRTrainer
    from metaasr_tpu.train.mono import MonoASRTrainer, MultitaskASRTrainer
    from metaasr_tpu.train.task import ASRTask

    tok = build_tokenizer(cfg)
    cfg.model.vocab_size = tok.vocab_size
    spk_path = ""
    if cfg.frontend.cmvn == "speaker":
        spk_path = (cfg.frontend.cmvn_stats_path
                    or os.path.join(cfg.data.data_dir, "speaker_cmvn.json"))
    dsets = load_accent_datasets(cfg.data.data_dir, tok,
                                 accents=cfg.data.accents,
                                 vocab=cfg.data.vocab,
                                 sample_rate=cfg.frontend.sample_rate,
                                 speaker_cmvn_path=spk_path,
                                 cache_audio=cfg.data.cache_audio)
    heldout = {}
    for name in cfg.data.heldout_accents:
        if name in dsets:
            heldout[name] = dsets.pop(name)
        else:
            heldout[name] = load_accent_datasets(
                cfg.data.data_dir, tok, accents=(name,), vocab=cfg.data.vocab,
                sample_rate=cfg.frontend.sample_rate,
                speaker_cmvn_path=spk_path)[name]
    task = ASRTask(cfg, tok.sos_eos_id)
    algo = cfg.meta.algo
    dev = next(iter(heldout.values())) if heldout else None
    if cfg.data.dev_fraction > 0 and algo in ("no", "multi"):
        # per-accent train/dev partition; dev pools across accents
        devs = {}
        for name in list(dsets):
            dsets[name], devs[name] = dsets[name].split(
                cfg.data.dev_fraction, seed=cfg.data.seed)
        dev = next(iter(devs.values())) if devs else dev
    if algo == "no":
        train_sets = [dsets[a] for a in (cfg.data.accents or sorted(dsets))][:1]
        trainer = MonoASRTrainer(cfg, task, train_sets, dev, tok, workdir)
        # baselines are tested on the held-out accent too (the reference
        # compares no-pretrain/multitask vs meta on the SAME held-out
        # accent, BASELINE.json:7-9) — expose it to test/transcribe modes
        trainer.heldout_datasets = heldout
        return trainer, tok
    if algo == "multi":
        trainer = MultitaskASRTrainer(cfg, task, dsets, dev, tok, workdir)
        trainer.heldout_datasets = heldout
        return trainer, tok
    if algo in ("fomaml", "maml", "reptile"):
        return MetaASRTrainer(cfg, task, dsets, heldout, tok, workdir,
                              mesh=mesh), tok
    raise ValueError(f"unknown algo {algo}")


def main(argv=None):
    p = argparse.ArgumentParser("metaasr_tpu")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--mode",
                   choices=["train", "adapt", "test", "transcribe", "export",
                            "serve"],
                   default="train")
    p.add_argument("--algo", choices=["no", "multi", "fomaml", "maml", "reptile"],
                   default=None)
    p.add_argument("--workdir", type=str, default="runs/default")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--decode-mode", choices=["greedy", "beam"], default="greedy")
    p.add_argument("--lm-ckpt", type=str, default=None,
                   help="shallow-fusion LM npz (scripts/train_lm.py) for "
                   "beam decode; shorthand for -o train.lm_ckpt=...")
    p.add_argument("--lm-weight", type=float, default=None,
                   help="shallow-fusion weight (0 = off); shorthand for "
                   "-o train.lm_weight=...")
    p.add_argument("--dump-nbest", type=int, default=1,
                   help="beam mode: write this many hypotheses (with "
                   "scores) per utterance to the hyps_*.jsonl dumps")
    p.add_argument("--export-dir", type=str, default=None,
                   help="export mode: bundle output dir "
                   "(default <workdir>/export)")
    p.add_argument("--export-buckets", type=str, default="8x48000",
                   help="export mode: comma-separated BATCHxWIDTH static "
                   "serving shapes (width = audio samples)")
    p.add_argument("--export-platforms", type=str, default="cpu,tpu",
                   help="export mode: comma-separated jax.export platforms")
    p.add_argument("--export-weights-dtype",
                   choices=["float32", "bfloat16"], default="float32",
                   help="export mode: store/feed bundle weights in this "
                   "dtype (bfloat16 halves the bundle and the per-step "
                   "weight HBM reads at serving)")
    p.add_argument("--export-decode", choices=["auto", "beam", "greedy"],
                   default="auto",
                   help="export mode: decode algorithm in the bundle "
                   "(auto = beam for the transformer, greedy otherwise)")
    p.add_argument("--mesh-tasks", type=int, default=0,
                   help="shard meta tasks over a ('task','data') device mesh")
    p.add_argument("--bundle", type=str, default=None,
                   help="serve mode: exported bundle dir (--mode export "
                   "output); self-contained — no config/workdir needed")
    p.add_argument("--wav", nargs="+", default=None,
                   help="serve mode: WAV files to transcribe through the "
                   "bundle (decoded/resampled by the native loader)")
    p.add_argument("--serve-params", type=str, default=None,
                   help="serve mode: hot-swap an adapted params npz "
                   "(checkpoint save_params_npz layout) into the bundle's "
                   "compiled program")
    p.add_argument("--serve-out", type=str, default=None,
                   help="serve mode: write one JSONL record per file here "
                   "instead of stdout only")
    p.add_argument("-o", "--override", action="append", default=[],
                   help="dotted config override key=value")
    p.add_argument("--avg-last", type=int, default=0,
                   help="adapt/test: average the last N checkpoints "
                        "(ESPnet-style model averaging)")
    p.add_argument("--use-best", action="store_true",
                   help="adapt/test: load the best-by-dev-metric "
                        "checkpoint (the reference's best.pth) instead "
                        "of the latest")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY.md section 5.2)")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace to this directory")
    args = p.parse_args(argv)

    # Honor a caller's JAX_PLATFORMS choice: the axon sitecustomize
    # re-pins jax_platforms at interpreter start, so without this a
    # JAX_PLATFORMS=cpu invocation silently runs on the TPU (observed
    # r4 — a "CPU" smoke contended with an on-chip sweep; and r5 — a
    # cpu-exported bundle failed to serve). Same dance as
    # tests/conftest.py and the bench scripts.
    _plat = os.environ.get("JAX_PLATFORMS")
    if _plat:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)

    if args.debug_nans:
        from metaasr_tpu.utils.profiling import nan_check

        nan_check(True)

    if args.use_best and args.avg_last:
        raise SystemExit(
            "--use-best and --avg-last are mutually exclusive: averaging "
            "the last N checkpoints would overwrite the restored best "
            "params — pick one")

    if args.mode == "serve":
        # bundle serving surface: self-contained — the bundle carries its
        # program, weights, tokenizer, and geometry, so no config,
        # workdir, or training code loads (export once on any host, serve
        # anywhere; serve/export.py). --serve-params hot-swaps an adapted
        # tree into the same compiled program (the meta-serving pattern).
        if not args.bundle or not args.wav:
            raise SystemExit("--mode serve needs --bundle DIR and --wav "
                             "FILE [FILE ...]")
        from metaasr_tpu.serve import ServingDecoder

        dec = ServingDecoder(args.bundle)
        params = None
        if args.serve_params:
            from metaasr_tpu.train.checkpoint import load_params_npz

            params = load_params_npz(args.serve_params)
        results = dec.transcribe_files(args.wav, params=params,
                                       nbest=args.dump_nbest)
        out_f = open(args.serve_out, "w") if args.serve_out else None
        for path, r in zip(args.wav, results):
            line = json.dumps({"file": path, **r})
            print(line)
            if out_f:
                out_f.write(line + "\n")
        if out_f:
            out_f.close()
        return

    # resume/adapt/test default to the run's own recorded config: without
    # this, a second invocation with different flags silently overwrites
    # workdir/config.yaml and can make the checkpoint unrestorable (e.g. a
    # PRNG-impl change flips the key shape)
    wd_cfg = os.path.join(args.workdir, "config.yaml")
    if args.config is None and os.path.exists(wd_cfg):
        args.config = wd_cfg

    overrides = dict(_parse_override(kv) for kv in args.override)
    if args.algo:
        overrides["meta.algo"] = args.algo
    if args.seed is not None:
        overrides["train.seed"] = args.seed
        overrides["data.seed"] = args.seed
    if args.data_dir:
        overrides["data.data_dir"] = args.data_dir
    if args.max_steps:
        overrides["train.max_steps"] = args.max_steps
    if args.lm_ckpt is not None:
        overrides["train.lm_ckpt"] = args.lm_ckpt
    if args.lm_weight is not None:
        overrides["train.lm_weight"] = args.lm_weight
    cfg = load_config(args.config, overrides)

    import jax

    if cfg.train.prng_impl:
        jax.config.update("jax_default_prng_impl", cfg.train.prng_impl)
    if cfg.train.compile_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(cfg.train.compile_cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    os.makedirs(args.workdir, exist_ok=True)
    save_config(cfg, os.path.join(args.workdir, "config.yaml"))

    mesh = None
    if args.mesh_tasks:
        from metaasr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(num_task=args.mesh_tasks)
    trainer, tok = make_trainer(cfg, args.workdir, mesh=mesh)

    if args.mode == "train":
        import contextlib

        ctx = contextlib.nullcontext()
        if args.profile:
            from metaasr_tpu.utils.profiling import trace

            ctx = trace(args.profile)
        with ctx:
            if cfg.meta.algo in ("fomaml", "maml", "reptile"):
                trainer.meta_train()
            else:
                trainer.train()
        return 0

    # adapt/test need a checkpoint
    state = trainer.init_state()
    template = state
    if args.use_best:
        best = trainer.ckpt.restore_best(template)
        if best is None:
            raise SystemExit(
                f"no best checkpoint under {args.workdir}/ckpts/best "
                "(best is saved at periodic evals; train with "
                "train.eval_every set)")
        state = best
    else:
        state, step = trainer.ckpt.restore(state)
        if step < 0:
            raise SystemExit(f"no checkpoint found under {args.workdir}/ckpts")
    if args.avg_last:
        from metaasr_tpu.train.checkpoint import average_checkpoints

        state = state.replace(params=average_checkpoints(
            trainer.ckpt, template, last_n=args.avg_last))
    if args.mode == "export":
        # AOT serving bundle: StableHLO decode program + params + vocab
        # (metaasr_tpu/serve). Params stay arguments, so adapted weights
        # hot-swap into the same compiled artifact.
        from metaasr_tpu.serve import ExportSpec, export_bundle

        decode_mode = args.export_decode
        if decode_mode == "auto":
            decode_mode = ("beam" if cfg.model.arch == "transformer"
                           else "greedy")
        out_dir = args.export_dir or os.path.join(args.workdir, "export")
        buckets = tuple(
            tuple(int(v) for v in b.split("x"))
            for b in args.export_buckets.split(","))
        lm_params = None
        if cfg.train.lm_ckpt and cfg.train.lm_weight != 0.0:
            from metaasr_tpu.train.checkpoint import load_params_npz

            lm_params = load_params_npz(cfg.train.lm_ckpt)
        manifest = export_bundle(
            cfg, state.params, tok, out_dir,
            spec=ExportSpec(buckets=buckets,
                            platforms=tuple(
                                args.export_platforms.split(",")),
                            mode=decode_mode,
                            weights_dtype=args.export_weights_dtype),
            lm_params=lm_params)
        print(json.dumps({"export_dir": out_dir,
                          "files": manifest["files"],
                          "mode": manifest["mode"],
                          "platforms": manifest["platforms"]}, indent=2))
        return 0

    results = {}
    if args.mode == "adapt":
        for name, ds in trainer.heldout_datasets.items():
            adapted, test_idx = trainer.meta_adapt(state.params, ds)
            scores = trainer.decode(
                adapted, ds, test_idx, mode=args.decode_mode,
                dump_path=os.path.join(args.workdir, f"hyps_{name}.jsonl"),
                dump_nbest=args.dump_nbest)
            results[name] = scores
    elif args.mode == "transcribe":
        # decode EVERY loaded accent (train + held-out) zero-shot and
        # write hypothesis files — the unlabeled-data serving surface
        # (manifests without a "text" field decode fine; refs are then
        # empty and no WER is reported). Works for any algo: a
        # mono/multitask-trained transformer decodes through a
        # decode-only MetaASRTrainer over the same params.
        decoder = trainer
        targets = {}
        if hasattr(trainer, "accent_datasets") and isinstance(
                getattr(trainer, "accent_datasets"), dict):
            targets.update(trainer.accent_datasets)
        targets.update(getattr(trainer, "heldout_datasets", None) or {})
        if not hasattr(trainer, "decode"):
            from metaasr_tpu.train.meta_train import MetaASRTrainer
            from metaasr_tpu.train.task import ASRTask

            # mono/multitask hold a dataset LIST — merge those accents in
            # (targets may already carry the held-out accents)
            for i, d in enumerate(getattr(trainer, "train_datasets", None)
                                  or []):
                targets.setdefault(d.accent or f"accent{i}", d)
            import copy

            dcfg = copy.deepcopy(cfg)
            dcfg.meta.algo = "fomaml"    # wrapper only decodes; algo unused
            decoder = MetaASRTrainer(dcfg, ASRTask(dcfg, tok.sos_eos_id),
                                     dict(targets), {}, tok,
                                     os.path.join(args.workdir, "_decode"))
        for name, ds in targets.items():
            path = os.path.join(args.workdir, f"hyps_{name}.jsonl")
            scores = decoder.decode(
                state.params, ds, max_utts=len(ds), mode=args.decode_mode,
                dump_path=path, dump_nbest=args.dump_nbest)
            results[name] = {"utts": len(ds), "dump": path}
            if any(ds.transcript(i) for i in range(len(ds))):
                results[name].update(scores)      # refs exist: keep WER
    else:  # test: decode without adaptation
        targets = getattr(trainer, "heldout_datasets", None) or {}
        if not targets and hasattr(trainer, "dev_dataset") and trainer.dev_dataset:
            targets = {"dev": trainer.dev_dataset}
        for name, ds in targets.items():
            if cfg.meta.algo in ("fomaml", "maml", "reptile"):
                results[name] = trainer.decode(
                    state.params, ds, mode=args.decode_mode,
                    dump_path=os.path.join(args.workdir,
                                           f"hyps_{name}.jsonl"),
                    dump_nbest=args.dump_nbest)
            else:
                results[name] = trainer.evaluate(state.params, ds)
    out = os.path.join(args.workdir, f"{args.mode}_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
