"""Optimizers and LR schedules matching the reference's settings.

Reference train.py:229-245: AdamW/Adam/SGD with global-norm grad clipping
(max 5, train.py:661-664), MultiStep ('step') per-epoch decay or per-step
cosine annealing ('cos') to eta_min.
"""

from __future__ import annotations

from typing import Sequence

import optax

from mono_vifi_tpu.config import Options


def lr_schedule(cfg: Options, steps_per_epoch: int):
    """Returns schedule(step) matching reference lr_sche_type semantics.

    'step': MultiStepLR stepped per *epoch* at cfg.decay_step boundaries.
    'cos': CosineAnnealingLR stepped per *iteration* over total steps.
    """
    base = cfg.learning_rate
    if cfg.lr_sche_type == "cos":
        total = steps_per_epoch * cfg.num_epochs
        return optax.cosine_decay_schedule(
            base, decay_steps=max(total, 1), alpha=cfg.eta_min / base
        )
    boundaries = {}
    scale = 1.0
    for ep in sorted(cfg.decay_step):
        boundaries[ep * steps_per_epoch] = cfg.decay_rate
    return optax.piecewise_constant_schedule(base, boundaries)


def make_optimizer(cfg: Options, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = lr_schedule(cfg, steps_per_epoch)
    if cfg.optimizer == "adamw":
        opt = optax.adamw(
            sched, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay
        )
    elif cfg.optimizer == "adam":
        opt = optax.adam(sched, b1=cfg.beta1, b2=cfg.beta2)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(sched, momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    chain = []
    if cfg.clip_grad is not None and cfg.clip_grad > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    chain.append(opt)
    return optax.chain(*chain)
