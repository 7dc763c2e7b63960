"""Optimizer + LR schedule factory (optax).

The reference uses Adam/Adadelta with a Noam (inverse-sqrt warmup) schedule
for the transformer (SURVEY.md section 2.1 #3, ESPnet lineage). Here:
optax chain of [clip_by_global_norm, adam(w), schedule].
"""

from __future__ import annotations

import optax

from metaasr_tpu.config import OptimizerConfig


def noam_schedule(base_lr: float, d_model: int, warmup_steps: int):
    """Inverse-sqrt warmup: lr * d^-0.5 * min(s^-0.5, s * warmup^-1.5)."""
    import jax.numpy as jnp

    def sched(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        return base_lr * (d_model ** -0.5) * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)

    return sched


def make_optimizer(cfg: OptimizerConfig, d_model: int = 256):
    if cfg.schedule == "noam":
        lr = noam_schedule(cfg.lr, d_model, cfg.warmup_steps)
    else:
        lr = cfg.lr
    if cfg.name == "adam":
        if cfg.weight_decay > 0:
            opt = optax.adamw(lr, b1=cfg.adam_b1, b2=cfg.adam_b2,
                              eps=cfg.adam_eps, weight_decay=cfg.weight_decay)
        else:
            opt = optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)
    elif cfg.name == "adadelta":
        opt = optax.adadelta(learning_rate=cfg.lr)
    elif cfg.name == "sgd":
        opt = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.name}")
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
