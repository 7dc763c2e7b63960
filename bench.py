"""Headline benchmark: FOMAML meta-train utterances/sec/chip on real TPU
(BASELINE.json:2), flagship joint CTC-attention transformer, full pipeline
(waveform -> fused fbank -> SpecAugment -> model -> joint loss -> inner SGD
vmapped over tasks -> outer Adam).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "unique_utts/s/chip", "vs_baseline": N}

`value` semantics are FROZEN at unique utterances/s/chip (see main()).

vs_baseline compares against the PyTorch reference-style implementation
(bench_baseline_torch.py: sequential copy-the-model FOMAML). The reference's
GPU is unavailable in this environment, so the torch baseline runs on CPU;
the result is cached in .bench_baseline.json (delete to re-measure).
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

# Must match bench_baseline_torch.py
M_TASKS = 4
K_SUPPORT = 4
K_QUERY = 4
INNER_STEPS = 3
NUM_SAMPLES = 64000
NUM_TOKENS = 32
VOCAB = 30

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".bench_baseline.json")


def _env_flag(name: str) -> bool:
    """Experiment-hook env parsing: '' and '0' are OFF (ADVICE r4: bare
    truthiness made FLAG=0 enable the experiment)."""
    return os.environ.get(name, "") not in ("", "0")


def measure_jax(steps: int = 20, m_tasks: int = M_TASKS,
                k_shot: int = K_SUPPORT) -> float:
    import jax

    # persistent compile cache: the meta-step graph is large and the first
    # compile is minutes; later bench runs reuse it
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(_CACHE), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        # hardware RNG for dropout/SpecAugment masks (threefry costs ~10%
        # of the meta-step at these sizes)
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
    import optax

    from metaasr_tpu.config import Config
    from metaasr_tpu.meta.maml import MetaAlgoConfig, maml_grads
    from metaasr_tpu.train.task import ASRTask

    cfg = Config()
    cfg.model.arch = "transformer"
    # experiment hook (not set by the driver): BENCH_ENCODER=conformer
    # measures the conformer encoder option at the same workload
    cfg.model.encoder = os.environ.get("BENCH_ENCODER", "transformer")
    cfg.model.vocab_size = VOCAB
    cfg.model.dtype = "bfloat16"
    cfg.meta.inner_steps = INNER_STEPS
    task = ASRTask(cfg)
    if _env_flag("BENCH_SECOND_ORDER"):
        # r5: the Pallas CTC is second-order capable (custom-JVP rework),
        # so grad-of-grad rides the same kernel the first-order path uses;
        # require_full_autodiff now only swaps the (first-order-only)
        # Pallas LSTM, a no-op for the transformer flagship.
        # BENCH_CTC_IMPL=scan measures the old all-scan second-order path.
        task.require_full_autodiff()
        if os.environ.get("BENCH_CTC_IMPL") == "scan":
            from metaasr_tpu.ops.ctc import ctc_loss as scan_ctc

            task._ctc_loss = scan_ctc
    rng = np.random.default_rng(0)

    def batch(bsz):
        return {
            "audio": np.asarray(
                0.1 * rng.standard_normal((m_tasks, bsz, NUM_SAMPLES))
            ).astype(np.float32),
            "audio_lens": np.full((m_tasks, bsz), NUM_SAMPLES, np.int32),
            "tokens": rng.integers(1, VOCAB - 1,
                                   (m_tasks, bsz, NUM_TOKENS)).astype(np.int32),
            "token_lens": np.full((m_tasks, bsz), NUM_TOKENS, np.int32),
        }

    meta_batch = {"support": batch(k_shot), "query": batch(k_shot)}
    meta_batch = jax.tree_util.tree_map(jax.numpy.asarray, meta_batch)

    params = task.init_params(
        jax.random.PRNGKey(0),
        {k: v[0] for k, v in meta_batch["support"].items()})
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    grad_fn = maml_grads(task.loss_fn, MetaAlgoConfig(
        inner_lr=1e-2, inner_steps=INNER_STEPS,
        # experiment hook (not set by the driver): BENCH_SECOND_ORDER=1
        # measures full second-order MAML (grad-of-grad) at this workload
        # — used for the fp32-vs-bf16 MAML meta-step comparison
        first_order=not _env_flag("BENCH_SECOND_ORDER"),
        # BENCH_NO_REMAT=1 probes the memory/FLOPs trade at the current
        # workload: remat recomputes the inner forward in the backward to
        # bound HBM — at few task replicas the memory may fit anyway
        remat_inner=not _env_flag("BENCH_NO_REMAT"),
        # BENCH_ADAPT_FILTER="decoder" (or "ctc_head,decoder") measures
        # ANIL partial adaptation: frozen leaves' inner-loop gradient
        # computation is dead-code-eliminated (meta/maml.py adapt_filter)
        adapt_filter=tuple(
            s for s in os.environ.get("BENCH_ADAPT_FILTER", "").split(",")
            if s.strip()) or None,
        unroll_inner=True,
        # the shipped flagship default (configs/config3_fomaml.yaml):
        # bf16 meta-step — +5.5% here AND better 5-shot WER than fp32 at
        # all 3 measured training seeds (RESULTS.md bf16 table).
        # BENCH_GRAD_DTYPE=float32 measures the fp32 meta-step instead.
        grad_dtype=os.environ.get("BENCH_GRAD_DTYPE", "bfloat16") or None),
        preprocess_fn=task.preprocess)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, mb, key):
        grads, metrics = grad_fn(params, mb, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics["meta_loss"]

    key = jax.random.PRNGKey(0)
    # XLA's own FLOP count for the whole compiled meta-step (fwd+bwd of
    # inner SGD + query grads + Adam), for the MFU estimate
    try:
        compiled = step.lower(params, opt_state, meta_batch, key).compile()
        flops_per_step = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_per_step = float("nan")
    params, opt_state, loss = step(params, opt_state, meta_batch, key)
    jax.block_until_ready(loss)  # compile
    for _ in range(3):  # warmup
        params, opt_state, loss = step(params, opt_state, meta_batch, key)
    jax.block_until_ready(loss)
    if os.environ.get("BENCH_PROFILE"):
        with jax.profiler.trace(os.path.join(os.path.dirname(_CACHE),
                                             "profiles")):
            for i in range(5):
                key = jax.random.fold_in(key, 1000 + i)
                params, opt_state, loss = step(params, opt_state,
                                               meta_batch, key)
            jax.block_until_ready(loss)
    # Throughput methodology: enqueue all steps, then FORCE completion by
    # reading the final step's loss to the host inside the timed region
    # (one scalar D2H, negligible vs steps*27ms). block_until_ready alone
    # is NOT sufficient on this attachment: the axon runtime has been
    # observed returning from it before execution drains, under-measuring
    # 4-12x (impossible MFU >1). A host value read is the only reliable
    # completion barrier; verified stable across reps and consistent with
    # a one-dispatch lax.scan of N steps (26.6-27.0 ms/step for the bench
    # workload both ways). Enqueued and per-step-blocked stepping produce
    # bit-identical params, so only timing was affected. Median of three
    # passes: robust both to the early-return under-measure (a too-fast
    # pass) and to a one-off attachment stall over-measuring a pass (the
    # axon tunnel takes tens of minutes to recover if a previous client
    # was killed mid-device-op, and that stall lands inside one pass).
    # Adaptive pass count: after a tunnel restart the attachment "warms"
    # over minutes — a fixed 3-pass median under-reported by ~25% right
    # after recovery (865 vs 1103 utts/s steady-state, r3) — and it can
    # also degrade mid-run, so a trailing window is biased low too. Keep
    # timing passes until the two fastest agree within 10% (reached
    # steady state at least twice) or 8 passes, then report the
    # SECOND-FASTEST pass: the host-read barrier above rules out the
    # too-fast failure mode, so the fastest passes are the chip's true
    # steady-state rate, and taking the second guards against any single
    # spurious outlier.
    dts = []
    for p in range(8):
        t0 = time.perf_counter()
        for i in range(steps):
            key = jax.random.fold_in(key, 10 * p + i)
            params, opt_state, loss = step(params, opt_state, meta_batch, key)
        _ = float(loss)
        dts.append((time.perf_counter() - t0) / steps)
        s = sorted(dts)
        if p >= 2 and s[1] / s[0] < 1.10:
            break
    dt = sorted(dts)[1]
    utts = m_tasks * (k_shot * INNER_STEPS + k_shot)
    kind = jax.devices()[0].device_kind.lower()
    # dense bf16 peak per chip: v5e 197 TF, v4 275 TF, v5p 459 TF
    peak = (275e12 if "v4" in kind else 459e12 if "v5p" in kind
            else 197e12)
    mfu = (flops_per_step / dt) / peak
    return utts / dt, mfu


def _cached_baseline(cache_path: str, script: str) -> float:
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)["utts_per_sec"]
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(_CACHE), script)],
            capture_output=True, text=True, timeout=1800, check=True)
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        with open(cache_path, "w") as f:
            json.dump(rec, f)
        return rec["utts_per_sec"]
    except Exception as e:
        print(f"# baseline {script} failed: {e}", file=sys.stderr)
        return float("nan")


def torch_baseline() -> float:
    return _cached_baseline(_CACHE, "bench_baseline_torch.py")


def seq_baseline() -> float:
    """Reference orchestration (sequential copy-the-model FOMAML) with the
    SAME jitted compute on the SAME chip — the hardware-controlled ratio
    behind BASELINE.json's '>=10x vs the PyTorch reference' claim."""
    return _cached_baseline(
        os.path.join(os.path.dirname(_CACHE), ".bench_baseline_seq.json"),
        "bench_baseline_seq.py")


def main():
    import __graft_entry__ as _ge

    # retries=1 + the raised default budget (270 s > ~3.5 min cold init /
    # retry): a healthy-but-cold attachment must not yield an error JSON
    if not _ge._default_backend_responsive(retries=1):
        # the network-attached TPU's tunnel dies occasionally (see
        # ROUND3_NOTES.md infra note); emit one honest JSON line instead
        # of hanging the harness in backend init forever
        print(json.dumps({
            "metric": "fomaml_meta_train_throughput", "value": None,
            "unit": "unique_utts/s/chip", "vs_baseline": None,
            "error": "TPU attachment unresponsive (backend init probe "
                     "timed out); see ROUND3_NOTES.md infra note"}))
        sys.exit(1)
    # HEADLINE operating point (r4): 4 tasks x 16-shot — the best
    # training-sensible point of the r4 knee sweep (scripts/
    # sweep_throughput.py, docs/PROFILE.md scaling table). The knee is
    # fused-batch 64; at fixed fused size fewer task replicas win (the
    # limiting resource is per-task fast-weight HBM traffic), and 4 tasks
    # matches the shipped flagship meta-batch. 2x32 measures 2.6% faster
    # still but a 2-task outer gradient is too noisy to ship as a
    # training config; it is reported in the sweep table instead.
    H_TASKS, H_K = 4, 16
    value, mfu = measure_jax(steps=10, m_tasks=H_TASKS, k_shot=H_K)
    # the r1-r3 workload (4x4), unchanged, for cross-round trend reading
    # — and it is the workload both cached baselines measure, so the
    # vs_* ratios are computed here (same-workload, apples to apples)
    value44, mfu44 = measure_jax()
    base = torch_baseline()
    seq = seq_baseline()
    # Throughput accounting: `value`/headline counts each drawn utterance
    # ONCE per meta-step (unique — the stricter reading of BASELINE.json:2);
    # presentations counts support utts once per inner step. Both baselines
    # count identically to the vmapped path, so the ratios hold under
    # either accounting.
    passes = M_TASKS * (K_SUPPORT * INNER_STEPS + K_QUERY)
    unique = M_TASKS * (K_SUPPORT + K_QUERY)
    # ratios at the workload the cached baselines measure (4x4)
    vs = value44 / base if base == base else None  # nan check
    vs_seq = value44 / seq if seq == seq else None
    # Ratios live INSIDE compat_4x4 (their workload; ADVICE r4: one record
    # mixed two workloads under one metric name). The top-level vs_baseline
    # is the driver contract and duplicates compat_4x4.vs_baseline, with
    # ratio_workload naming where it was measured.
    compat = {"tasks": M_TASKS, "k_shot": K_SUPPORT,
              "unique_utts_per_sec": round(value44 * 32 / 64, 2),
              "presentations_per_sec": round(value44, 2),
              "mfu": round(mfu44, 4) if mfu44 == mfu44 else None,
              "vs_baseline": round(vs, 2) if vs is not None else None,
              "vs_samechip_sequential": (round(vs_seq, 2)
                                         if vs_seq is not None else None)}
    # SEMANTICS FROZEN (r3+): `value` is UNIQUE utterances/s/chip — each
    # drawn utterance counted once per meta-step. r2's headline counted
    # presentations (support utts once per inner step), so BENCH_r02's
    # 2304.55 corresponds to r3+'s `presentations_per_sec` field, NOT to
    # `value`; the apparent r2->r3 2x drop is the accounting change, not a
    # regression (ROUND3_NOTES.md item 9). Do not change `value`'s meaning.
    # r4 note: the headline WORKLOAD moved 4x4 -> 4x16 (the measured knee,
    # VERDICT r3 item 3); `compat_4x4` carries the r3-comparable number.
    h_passes = H_TASKS * (H_K * INNER_STEPS + H_K)
    h_unique = H_TASKS * (H_K + H_K)
    assert unique <= passes and h_unique <= h_passes, \
        "value must be the unique-utts accounting"
    print(json.dumps({
        "metric": "fomaml_meta_train_throughput",
        "value": round(value * h_unique / h_passes, 2),
        "unit": "unique_utts/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "vs_samechip_sequential": round(vs_seq, 2) if vs_seq is not None
        else None,
        "ratio_workload": "4x4_compat",
        "presentations_per_sec": round(value, 2),
        "mfu": round(mfu, 4) if mfu == mfu else None,
        "baseline": "pytorch reference-style copy-the-model FOMAML (cpu, "
                    "reference GPU unavailable); vs_samechip_sequential: "
                    "same jitted compute, reference's sequential "
                    "orchestration, same TPU chip; both ratios computed "
                    "at the 4x4 workload the baselines measure "
                    "(compat_4x4 row)",
        "workload": {"tasks": H_TASKS, "k_support": H_K,
                     "k_query": H_K, "inner_steps": INNER_STEPS,
                     "audio_sec": NUM_SAMPLES / 16000},
        "compat_4x4": compat,
    }))


if __name__ == "__main__":
    main()
