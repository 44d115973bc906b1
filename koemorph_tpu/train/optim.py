"""Optimizer / LR-schedule factories from config.

Parity target: the reference instantiates AdamW + CosineAnnealingLR from
``_target_`` strings (reference src/train.py:117-145) and
CosineAnnealingWarmRestarts in the sequential trainer
(src/train_sequential.py:81-86). Here the same config keys resolve to optax
transforms; gradient clipping (src/train.py:207, clip_grad_norm_) is part of
the optax chain so it runs fused on device.
"""

from __future__ import annotations

from typing import Any, Optional

import optax

__all__ = ["create_lr_schedule", "create_optimizer"]


def create_lr_schedule(cfg: dict, steps_per_epoch: int) -> Any:
    """Build an optax schedule from the ``lr_scheduler`` config group."""
    opt_cfg = cfg.get("optimizer", {})
    sched_cfg = cfg.get("lr_scheduler", {})
    base_lr = float(opt_cfg.get("lr", 1e-4))
    name = sched_cfg.get("name", "cosine")
    warmup = int(sched_cfg.get("warmup_steps", 0) or 0)

    if name == "constant":
        sched = optax.constant_schedule(base_lr)
    elif name == "cosine":
        t_max_epochs = int(sched_cfg.get("t_max", 100))
        eta_min = float(sched_cfg.get("eta_min", 0.0))
        decay_steps = max(1, t_max_epochs * steps_per_epoch - warmup)
        sched = optax.cosine_decay_schedule(
            base_lr, decay_steps=decay_steps, alpha=eta_min / base_lr)
    elif name == "cosine_restarts":
        # CosineAnnealingWarmRestarts(T_0, T_mult)
        # (reference train_sequential.py:81-86)
        t0 = max(1, int(sched_cfg.get("restart_period", 10))
                 * steps_per_epoch)
        mult = int(sched_cfg.get("restart_mult", 2))
        eta_min = float(sched_cfg.get("eta_min", 0.0))
        schedules, boundaries, period, total = [], [], t0, 0
        for _ in range(8):  # 8 restart cycles covers any practical run
            schedules.append(optax.cosine_decay_schedule(
                base_lr, decay_steps=period, alpha=eta_min / base_lr))
            total += period
            boundaries.append(total)
            period *= max(1, mult)
        sched = optax.join_schedules(schedules, boundaries[:-1])
    else:
        raise ValueError(f"Unknown lr scheduler: {name}")

    if warmup > 0:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup), sched], [warmup])
    return sched


def create_optimizer(
    cfg: dict,
    steps_per_epoch: int = 1000,
    schedule: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW (or adam/sgd) + global-norm clipping from the ``training``
    config group."""
    opt_cfg = cfg.get("optimizer", {})
    name = str(opt_cfg.get("name", "adamw")).lower()
    betas = opt_cfg.get("betas", [0.9, 0.999])
    sched = schedule if schedule is not None \
        else create_lr_schedule(cfg, steps_per_epoch)

    if name == "adamw":
        opt = optax.adamw(sched, b1=float(betas[0]), b2=float(betas[1]),
                          weight_decay=float(opt_cfg.get("weight_decay",
                                                         1e-5)))
    elif name == "adam":
        opt = optax.adam(sched, b1=float(betas[0]), b2=float(betas[1]))
    elif name == "sgd":
        opt = optax.sgd(sched, momentum=float(opt_cfg.get("momentum", 0.9)))
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    chain = []
    clip = cfg.get("gradient_clip_val", None)
    if clip:
        chain.append(optax.clip_by_global_norm(float(clip)))
    chain.append(opt)
    tx = optax.chain(*chain)

    accum = int(cfg.get("accumulate_grad_batches", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
