"""Reference-style SEQUENTIAL FOMAML on the SAME TPU chip (JAX).

The torch baseline (bench_baseline_torch.py) can only run on CPU here, so
its ratio says nothing about BASELINE.json's ">=10x meta-train utts/sec vs
the PyTorch reference" claim on equal hardware. This script isolates
exactly the orchestration difference the north-star targets by keeping the
compute stack constant (same flagship ASRTask model, same jitted
loss/grad, same chip) and reproducing the REFERENCE's orchestration
(SURVEY.md section 3.1):

  - python loop over tasks, SEQUENTIAL (no vmap task axis)
  - explicit full parameter copy per task (the ``copy.deepcopy`` analogue:
    ``jax.tree.map(jnp.copy, params)``)
  - per-task jitted inner forward/backward + SGD, one dispatch per inner
    step (the reference's per-task kernel-launch pattern)
  - host-driven outer-gradient accumulation across tasks

vs the rebuild's single compiled meta-step (tasks vmapped, inner SGD
unrolled under one jit, zero copies). Same workload constants as bench.py
so utts/sec is directly comparable.

Run standalone: python bench_baseline_seq.py -> prints JSON {utts_per_sec}.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

# Bench workload (must match bench.py)
M_TASKS = 4
K_SUPPORT = 4
K_QUERY = 4
INNER_STEPS = 3
NUM_SAMPLES = 64000
NUM_TOKENS = 32
VOCAB = 30
INNER_LR = 1e-2


def measure(steps: int = 8) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass

    from metaasr_tpu.config import Config
    from metaasr_tpu.train.task import ASRTask

    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.vocab_size = VOCAB
    cfg.model.dtype = "bfloat16"
    task = ASRTask(cfg)
    rng = np.random.default_rng(0)

    def one_batch(bsz):
        return {
            "audio": jnp.asarray(
                0.1 * rng.standard_normal((bsz, NUM_SAMPLES)).astype(np.float32)),
            "audio_lens": jnp.full((bsz,), NUM_SAMPLES, jnp.int32),
            "tokens": jnp.asarray(
                rng.integers(1, VOCAB - 1, (bsz, NUM_TOKENS)).astype(np.int32)),
            "token_lens": jnp.full((bsz,), NUM_TOKENS, jnp.int32),
        }

    # one (support, query) pair per task, same data volume as bench.py
    tasks = [(one_batch(K_SUPPORT), one_batch(K_QUERY))
             for _ in range(M_TASKS)]

    params = task.init_params(jax.random.PRNGKey(0), tasks[0][0])

    @jax.jit
    def preprocess(batch, key):
        return task.preprocess(batch, key, True)

    @jax.jit
    def inner_step(fast, feat_batch, key):
        # one fwd+bwd+SGD dispatch, exactly the reference's inner loop body
        grads = jax.grad(
            lambda p: task.loss_fn(p, feat_batch, key, True)[0])(fast)
        return jax.tree.map(lambda p, g: p - INNER_LR * g, fast, grads)

    @jax.jit
    def query_grad(fast, feat_batch, key):
        return jax.grad(
            lambda p: task.loss_fn(p, feat_batch, key, True)[0])(fast)

    copy_params = jax.jit(lambda p: jax.tree.map(jnp.copy, p))
    acc = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def outer_update(params, opt_state, outer):
        grads = jax.tree.map(lambda g: g / M_TASKS, outer)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def meta_step(params, opt_state, key):
        outer = None
        for m, (support, query) in enumerate(tasks):
            kt = jax.random.fold_in(key, m)
            fast = copy_params(params)          # the deepcopy analogue
            sfeats = preprocess(support, kt)
            for i in range(INNER_STEPS):
                fast = inner_step(fast, sfeats, jax.random.fold_in(kt, i))
            g = query_grad(fast, preprocess(query, kt),
                           jax.random.fold_in(kt, 99))
            outer = g if outer is None else acc(outer, g)
        return outer_update(params, opt_state, outer)

    key = jax.random.PRNGKey(0)
    params, opt_state = meta_step(params, opt_state, key)  # compile
    jax.block_until_ready(params)
    params, opt_state = meta_step(params, opt_state, key)  # warmup
    jax.block_until_ready(params)
    # median of three timed passes; completion forced by a host read of a
    # param element — block_until_ready alone can return early on this
    # attachment, and a one-off tunnel stall can poison a single pass
    # (see bench.py timing note)
    dts = []
    for p in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            params, opt_state = meta_step(params, opt_state,
                                          jax.random.fold_in(key, 10 * p + i))
        _ = float(jax.tree_util.tree_leaves(params)[0].ravel()[0])
        dts.append((time.perf_counter() - t0) / steps)
    dt = sorted(dts)[1]
    utts = M_TASKS * (K_SUPPORT * INNER_STEPS + K_QUERY)
    return utts / dt


if __name__ == "__main__":
    ups = measure()
    import jax

    print(json.dumps({
        "utts_per_sec": round(ups, 2),
        "hardware": jax.devices()[0].device_kind,
        "style": "reference sequential copy-the-model FOMAML, JAX same-chip",
    }))
