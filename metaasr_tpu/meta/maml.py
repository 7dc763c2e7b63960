"""MAML / FOMAML as pure function transforms (the framework's core).

The reference meta-trains by COPYING the model per accent task and running
inner SGD on the copy, sequentially per task (R: src/fomaml_interface.py /
src/maml_interface.py; SURVEY.md section 2.1 #5-#6, section 3.1;
BASELINE.json:5,9,10). That orchestration is pure overhead on TPU.

TPU-native formulation (BASELINE.json:5 "jax.grad-over-grad ... inner SGD
steps unrolled under jit and accent tasks vmapped"):

- the inner loop is ``lax.scan`` over functional SGD updates:
  ``p_{i+1} = p_i - lr * grad(loss)(p_i, support)`` — no copies, no
  optimizer objects; the step body (a full fwd+bwd) compiles ONCE
  regardless of inner_steps; with remat each step's activations are
  rematerialized so full second-order MAML's memory stays bounded
  (SURVEY.md section 7 'hard parts');
- FOMAML detaches the inner gradients' INPUT (``grad(loss)(stop_gradient
  (p))``): the adapted params then depend on the originals with identity
  Jacobian — the exact first-order approximation — and, because the
  detachment is input-side, outer-grad linearization never touches the
  inner-gradient computation (required for first-order-only custom-VJP
  kernels like the Pallas CTC, and cheaper everywhere);
- full MAML = the same code WITHOUT the detach: ``jax.grad`` of the query
  loss through the scanned inner updates is grad-over-grad;
- tasks are ``vmap``-ped over a leading axis [M, ...]; the outer gradient
  is the mean over the task axis. Under pjit with the task axis sharded
  over the mesh, that mean IS the only collective of the whole meta-step
  (one psum; SURVEY.md section 5.8);
- an optional ``preprocess_fn`` (e.g. the audio front-end + SpecAugment)
  runs ONCE per task batch, outside the inner loop — matching the
  reference's apply-at-load-time semantics and removing k-1 redundant
  front-end passes per task;
- the support loss at step 0 falls out of the inner step's
  ``value_and_grad`` for free (no separate logging forward).

Everything here is generic over ``loss_fn(params, batch, rng, train) ->
(scalar, aux)`` so the meta-gradient math is unit-tested against the
analytic quadratic family (SURVEY.md section 4.3) and reused verbatim by
the ASR task.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MetaAlgoConfig:
    inner_lr: float = 1e-2
    inner_steps: int = 3
    first_order: bool = True
    remat_inner: bool = True
    # fully unroll the inner lax.scan: the scanned form keeps the whole
    # per-task parameter tree as a while-loop carry, which XLA double-
    # buffers (measured ~3.6 ms/step of carry copies at the bench shapes);
    # unrolling lets updates fuse into consumers. Costs compile time
    # proportional to inner_steps — sensible for the usual 3-5 steps.
    unroll_inner: bool = False
    # EXPERIMENTAL low-precision meta-step: when set (e.g. "bfloat16"),
    # the fp32 master params are cast ONCE at the top of the meta-step and
    # the whole inner loop (fast weights, their SGD updates) plus the
    # outer backward run in that dtype; the outer gradient is cast back to
    # the master dtype just before the optimizer. Motivation: the bench
    # trace shows ~13% of step time in bf16->f32 convert+reduce fusions —
    # gradient accumulation into fp32 leaf gradients at every param use
    # site (docs/PROFILE.md). A top-level cast moves that to ONE convert
    # per leaf. fp32 masters + Adam state are unchanged; only the
    # meta-step's internal precision drops (fast-weight updates quantized
    # to bf16). Default off; quality parity must be checked per workload.
    grad_dtype: str | None = None
    # Learn the inner-loop learning rates (Meta-SGD, Li et al. 2017 /
    # MAML++ LSLR, Antoniou et al. 2019 — per-parameter-TENSOR variant):
    # the param tree becomes {"model": ..., "inner_lr": one scalar per
    # model leaf}, the inner update is p - a * g with a the leaf's learned
    # rate, and the OUTER optimizer trains the rates alongside the model
    # (they ride the same vmap/psum path — zero extra collectives).
    # First-order semantics stay exact: the stop_gradient detaches the
    # inner GRADIENT's input, not the rate, so d(query)/d(a) = -dq/dp' * g
    # flows even under FOMAML. Rates are unconstrained (Meta-SGD allows
    # sign flips) and initialized at inner_lr. Not applicable to Reptile
    # (its outer "gradient" is a parameter delta — no rate signal exists).
    learn_inner_lr: bool = False
    # Global-norm clip on the INNER-loop gradient (0 = off). The outer
    # optimizer is clipped (optax clip_by_global_norm) but the inner SGD
    # was not; some encoders need it: at init the conformer's support
    # gradient norm is ~300 (2x the transformer's) and a single
    # inner_lr=0.01 step moves the params by norm ~3, after which the
    # support loss and gradient norm spike (measured:
    # scripts/conformer_inner_probe.py — support 32->22->45, gnorm 470).
    # Clipping the inner step bounds the adaptation displacement without
    # shrinking well-behaved steps (MAML++-style stabilization). The clip
    # SCALE is stop_gradient'd: under second-order MAML the meta-gradient
    # treats the scale as a constant (standard practice; differentiating
    # through the norm adds a rank-1 curvature term with high variance).
    inner_clip: float = 0.0
    # Partial inner adaptation (ANIL, Raghu et al. 2020 "Rapid Learning or
    # Feature Reuse"): when set, the INNER loop updates only the leaves
    # whose '/'-joined param path contains one of these substrings (e.g.
    # ("ctc_head", "decoder") adapts the heads and freezes the encoder);
    # the OUTER optimizer still trains every parameter. Motivation beyond
    # the ANIL paper's "feature reuse suffices": our conformer dissection
    # (docs/DESIGN.md section 8) showed the inner SGD trajectory through a
    # deep conv-attention body is CHAOTIC — different augmentation draws
    # land at adapted points so far apart that the outer gradient is mostly
    # draw noise and the CTC head never organizes (5-shot WER ~1.0, while
    # inner_lr=0 trains to 0.22). Restricting adaptation to the
    # near-convex head subproblem removes the chaos at its source instead
    # of damping it (clipping the same trajectory did NOT fix it). Bonus:
    # frozen leaves' inner gradients are never consumed, so XLA dead-code
    # -eliminates the encoder's inner-loop weight-gradient computation.
    adapt_filter: tuple[str, ...] | None = None


LossFn = Callable  # (params, batch, rng, train) -> (scalar, aux)

# unroll_inner is capped: past this many inner steps the unrolled graph's
# compile time outweighs the saved carry copies; the scan form (compiles
# the body once) takes over automatically.
MAX_UNROLL_STEPS = 8


def sgd_update(params, grads, lr):
    return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)


def split_lr(params):
    """Split a learnable-inner-lr param tree into (model, lr_tree).

    Trees not wrapped by ``wrap_lr`` pass through as (params, None), so
    every consumer (decode, meta_adapt, the mono trainers' eval wrapper)
    accepts both layouts without caring which algorithm produced them.
    """
    if (isinstance(params, dict) and set(params.keys())
            == {"model", "inner_lr"}):
        return params["model"], params["inner_lr"]
    return params, None


def wrap_lr(model_params, init_lr: float):
    """Attach Meta-SGD learnable inner rates: one fp32 scalar per model
    leaf, initialized at ``init_lr`` (see MetaAlgoConfig.learn_inner_lr)."""
    lr_tree = jax.tree_util.tree_map(
        lambda _: jnp.asarray(init_lr, jnp.float32), model_params)
    return {"model": model_params, "inner_lr": lr_tree}


def adapt_mask(model, patterns: tuple[str, ...]):
    """Tree of python bools: leaf adapted iff its '/'-joined path contains
    any pattern (MetaAlgoConfig.adapt_filter). Computed at trace time —
    paths are static — so the mask costs nothing in the compiled step."""

    def path_str(path):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)

    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: any(pat in path_str(path) for pat in patterns),
        model)
    if not any(jax.tree_util.tree_leaves(mask)):
        raise ValueError(
            f"adapt_filter {patterns} matches no parameter leaf; "
            "the inner loop would be a no-op. Param path roots: "
            f"{sorted(set(str(getattr(p[0], 'key', p[0])) for p, _ in jax.tree_util.tree_flatten_with_path(model)[0]))}")
    return mask


def _cast_floats(tree, dtype):
    """Cast floating leaves to ``dtype`` (non-float leaves untouched)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def _low_precision_wrap(cfg: MetaAlgoConfig, grad_fn):
    """Apply cfg.grad_dtype around a ``(params, meta_batch, rng) ->
    (grads, metrics)`` function: params cast down once on entry, gradients
    cast back to each master leaf's dtype on exit (see MetaAlgoConfig
    .grad_dtype)."""
    if cfg.grad_dtype is None:
        return grad_fn
    dtype = jnp.dtype(cfg.grad_dtype)

    def wrapped(params, meta_batch, rng, inner_scale=None,
                widen_scale=None):
        grads, metrics = grad_fn(_cast_floats(params, dtype),
                                 meta_batch, rng, inner_scale=inner_scale,
                                 widen_scale=widen_scale)
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(jnp.asarray(p).dtype), grads, params)
        return grads, metrics

    return wrapped


def make_inner_adapt(loss_fn: LossFn, cfg: MetaAlgoConfig,
                     train: bool = True) -> Callable:
    """Returns ``inner_adapt(params, support_batch, rng) ->
    (adapted_params, per_step_support_losses [inner_steps])``.

    Differentiable through the scanned steps unless cfg.first_order.
    """

    def one_step(params, step_rng, batch, inner_scale=None,
                 widen_scale=None):
        model, lr = split_lr(params)
        mask = adapt_mask(model, cfg.adapt_filter) if cfg.adapt_filter \
            else jax.tree_util.tree_map(lambda _: True, model)
        # Staged ANIL (meta.adapt_widen_step): ``widen_scale`` is a traced
        # 0/1 scalar multiplying the inner update of the leaves OUTSIDE
        # cfg.adapt_filter — 0 reproduces plain ANIL exactly, 1 reproduces
        # the unfiltered inner loop exactly (multiplying a gradient by the
        # float 1.0 is exact). Motivation (docs/DESIGN.md section 8): the
        # conformer bisection showed early inner adaptation of the body /
        # CTC head destroys meta-training (ANIL-decoder is the fix) while
        # a CONVERGED body tolerates it (inner_start_step=750 also trains)
        # — so start decoder-only and widen to full-body adaptation once
        # the representation has organized, in one compiled step.
        # stop_gradient'd like the other gates: the schedule is not a
        # meta-learned quantity. Note widening disables the dead-code
        # elimination of frozen leaves' inner gradients (the gate is
        # dynamic), so a staged step costs what the unfiltered step costs.
        w = (None if widen_scale is None
             else jax.lax.stop_gradient(jnp.asarray(widen_scale)))
        at = jax.lax.stop_gradient(model) if cfg.first_order else model
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, step_rng, train), has_aux=True)(at)
        if cfg.inner_clip:
            # norm over the ADAPTED leaves only: a frozen subtree's (unused,
            # soon-DCE'd) gradients must not shrink the clip scale
            gn = jnp.sqrt(sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g, k in zip(jax.tree_util.tree_leaves(grads),
                                jax.tree_util.tree_leaves(mask)) if k))
            scale = jax.lax.stop_gradient(
                jnp.minimum(1.0, cfg.inner_clip / (gn + 1e-12)))
            grads = jax.tree_util.tree_map(
                lambda g: g * scale.astype(g.dtype), grads)
        if inner_scale is not None:
            # inner-loop gating/warmup (meta.inner_start_step): a traced
            # scalar in [0,1] multiplying every inner update; 0 makes the
            # inner loop an exact no-op (the FOMAML outer grad then reduces
            # to the plain query gradient). stop_gradient'd like the clip
            # scale: the schedule is not a meta-learned quantity.
            s = jax.lax.stop_gradient(jnp.asarray(inner_scale))
            grads = jax.tree_util.tree_map(
                lambda g: g * s.astype(g.dtype), grads)
        if lr is None:
            new_model = jax.tree_util.tree_map(
                lambda p, g, k: p - cfg.inner_lr * g if k
                else (p if w is None
                      else p - cfg.inner_lr * w.astype(g.dtype) * g),
                model, grads, mask)
            return new_model, loss
        # learned per-leaf rate; the rate itself is NOT detached, so the
        # outer grad reaches it even under first-order (see MetaAlgoConfig)
        new_model = jax.tree_util.tree_map(
            lambda p, g, a, k: p - a.astype(p.dtype) * g if k
            else (p if w is None
                  else p - a.astype(p.dtype) * w.astype(g.dtype) * g),
            model, grads, lr, mask)
        return {"model": new_model, "inner_lr": lr}, loss

    # Remat only matters when the outer grad flows THROUGH the inner steps
    # (second-order MAML). First-order cuts that path, so remat would only
    # add recompute.
    if cfg.remat_inner and not cfg.first_order:
        one_step = jax.checkpoint(one_step, static_argnums=())

    def inner_adapt(params, support_batch, rng, inner_scale=None,
                    widen_scale=None):
        def body(p, step_rng):
            p2, loss = one_step(p, step_rng, support_batch, inner_scale,
                                widen_scale)
            return p2, loss

        rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(cfg.inner_steps))
        unroll = (cfg.inner_steps
                  if cfg.unroll_inner and cfg.inner_steps <= MAX_UNROLL_STEPS
                  else 1)
        params, losses = jax.lax.scan(body, params, rngs, unroll=unroll)
        return params, losses

    return inner_adapt


def make_meta_loss(loss_fn: LossFn, cfg: MetaAlgoConfig,
                   preprocess_fn: Callable | None = None) -> Callable:
    """Returns ``meta_loss(params, meta_batch, rng) -> (scalar, aux)``.

    meta_batch: pytree whose leaves have leading task axis M, with fields
    ``support`` and ``query`` (each a batch pytree). The task dimension is
    vmapped; aux carries per-task support/query losses for logging
    (SURVEY.md section 2.1 #19 'per-task inner/outer loss').

    ``preprocess_fn(batch, rng, train) -> batch`` runs once per task batch
    outside the inner loop (front-end + augmentation).
    """
    inner_adapt = make_inner_adapt(loss_fn, cfg, train=True)

    def per_task(params, support, query, rng, inner_scale, widen_scale):
        r_in, r_q, r_ps, r_pq = jax.random.split(rng, 4)
        if preprocess_fn is not None:
            support = preprocess_fn(support, r_ps, True)
            query = preprocess_fn(query, r_pq, True)
        adapted, s_losses = inner_adapt(params, support, r_in, inner_scale,
                                        widen_scale)
        q_loss, _ = loss_fn(split_lr(adapted)[0], query, r_q, True)
        return q_loss, s_losses[0]

    def meta_loss(params, meta_batch, rng, inner_scale=None,
                  widen_scale=None):
        m = jax.tree_util.tree_leaves(meta_batch["support"])[0].shape[0]
        rngs = jax.random.split(rng, m)
        q_losses, s_losses = jax.vmap(
            per_task, in_axes=(None, 0, 0, 0, None, None))(
            params, meta_batch["support"], meta_batch["query"], rngs,
            inner_scale, widen_scale)
        # Mean over the task axis: under pjit with tasks sharded over the
        # mesh this lowers to the meta-step's single gradient psum.
        return q_losses.mean(), {"task_query_losses": q_losses,
                                 "task_support_losses": s_losses}

    return meta_loss


def reptile_grads(loss_fn: LossFn, cfg: MetaAlgoConfig,
                  preprocess_fn: Callable | None = None):
    """Reptile (Nichol, Achiam & Schulman 2018) as the same transform
    shape as ``maml_grads``: returns ``grad_fn(params, meta_batch, rng)
    -> (grads, metrics)``.

    Reptile needs no support/query split and no query backward pass:
    per task, run the k inner SGD steps on the WHOLE task batch (support
    and query concatenated along the utterance axis) and emit
    ``params - adapted_params`` as the outer gradient — a step of outer
    SGD with lr ε then interpolates ``params <- (1-ε) params + ε adapted``,
    exactly Reptile's update (with Adam it is the usual "Reptile + Adam"
    variant). Cheaper than FOMAML (no query fwd+bwd), first-order by
    construction, and reuses ``make_inner_adapt`` verbatim — so it is
    compatible with the Pallas CTC custom VJP and sharded task axes.
    Extension beyond the reference's algo set (no | multi | fomaml |
    maml); the analytic quadratic test pins the update direction.
    """
    inner_adapt = make_inner_adapt(loss_fn, cfg, train=True)

    def per_task(params, support, query, rng):
        r_in, r_ps, r_pq = jax.random.split(rng, 3)
        if preprocess_fn is not None:
            support = preprocess_fn(support, r_ps, True)
            query = preprocess_fn(query, r_pq, True)
        task_batch = jax.tree_util.tree_map(
            lambda s, q: jnp.concatenate([s, q], axis=0), support, query)
        adapted, s_losses = inner_adapt(params, task_batch, r_in)
        delta = jax.tree_util.tree_map(lambda p, a: p - a, params, adapted)
        return delta, s_losses[0], s_losses[-1]

    def grad_fn(params, meta_batch, rng, inner_scale=None,
                widen_scale=None):
        # inner_scale/widen_scale are rejected at config level for Reptile
        # (its outer update IS the inner delta — gating it to 0 would stop
        # training); the kwargs exist so the trainer's call signature
        # stays uniform.
        del inner_scale, widen_scale
        m = jax.tree_util.tree_leaves(meta_batch["support"])[0].shape[0]
        rngs = jax.random.split(rng, m)
        deltas, first, last = jax.vmap(per_task, in_axes=(None, 0, 0, 0))(
            params, meta_batch["support"], meta_batch["query"], rngs)
        grads = jax.tree_util.tree_map(lambda d: d.mean(axis=0), deltas)
        # Reptile has no query loss; the LAST inner-step loss on the
        # combined batch is the closest progress signal, reported under
        # the same metric keys so trainer logging stays uniform.
        metrics = {
            "meta_loss": last.mean(),
            "query_loss_mean": last.mean(),
            "query_loss_max": last.max(),
            "support_loss_mean": first.mean(),
        }
        return grads, metrics

    return _low_precision_wrap(cfg, grad_fn)


def maml_grads(loss_fn: LossFn, cfg: MetaAlgoConfig,
               preprocess_fn: Callable | None = None):
    """Convenience: returns ``grad_fn(params, meta_batch, rng) ->
    (grads, metrics)`` suitable for an optax outer optimizer."""
    meta_loss = make_meta_loss(loss_fn, cfg, preprocess_fn)

    def grad_fn(params, meta_batch, rng, inner_scale=None,
                widen_scale=None):
        (loss, aux), grads = jax.value_and_grad(meta_loss, has_aux=True)(
            params, meta_batch, rng, inner_scale, widen_scale)
        metrics = {
            "meta_loss": loss,
            "query_loss_mean": aux["task_query_losses"].mean(),
            "query_loss_max": aux["task_query_losses"].max(),
            "support_loss_mean": aux["task_support_losses"].mean(),
        }
        return grads, metrics

    return _low_precision_wrap(cfg, grad_fn)
