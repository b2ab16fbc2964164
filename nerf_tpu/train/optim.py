"""Optimizer + LR schedule.

Parity: reference Adam lr 5e-4 (``make_optimizer``, src/train/optimizer.py),
gradient value-clip at 40 applied before the step (trainer.py:59),
exponential decay lr = base * gamma^(epoch / decay_epochs) stepped per epoch
(src/utils/optimizer/lr_scheduler.py:68-79). Here the schedule is a pure
function of the global step (epoch = step // ep_iter).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def exponential_epoch_schedule(base_lr: float, gamma: float, decay_epochs: int,
                               ep_iter: int, lr_min: float = 0.0):
    """lr = base * gamma^(epoch/decay_epochs), floored at ``lr_min`` (the
    floor keeps long continuation runs from decaying into the noise; 0 =
    reference behavior)."""

    def schedule(step):
        epoch = step // ep_iter
        return jnp.maximum(base_lr * gamma ** (epoch / decay_epochs), lr_min)

    return schedule


def warmup_multi_step_schedule(
    base_lr: float,
    milestone_steps,
    gamma: float,
    warmup_factor: float = 1.0 / 3.0,
    warmup_iters: int = 500,
    warmup_method: str = "linear",
):
    """Reference ``WarmupMultiStepLR`` (lr_scheduler.py:5-40) as a pure
    function of the step: lr = base * warmup(step) * gamma^(#milestones
    passed); warmup ramps from warmup_factor to 1 over warmup_iters
    ("linear") or stays at warmup_factor ("constant")."""
    ms = jnp.asarray(sorted(int(m) for m in milestone_steps))

    def schedule(step):
        if warmup_method == "linear":
            alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
            wf = warmup_factor + (1.0 - warmup_factor) * alpha
        else:
            wf = jnp.asarray(warmup_factor)
        warm = jnp.where(step < warmup_iters, wf, 1.0)
        decay = gamma ** jnp.sum(step >= ms)
        return base_lr * warm * decay

    return schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    tr = cfg.train
    sched_cfg = tr.scheduler
    if sched_cfg.get("type", "exponential") == "exponential":
        sched = exponential_epoch_schedule(
            float(tr.lr), float(sched_cfg.gamma), int(sched_cfg.decay_epochs),
            int(cfg.get("ep_iter", 500)),
            lr_min=float(sched_cfg.get("lr_min", 0.0)),
        )
    elif sched_cfg.get("type") == "warmup_multi_step":
        ep_iter = int(cfg.get("ep_iter", 500))
        sched = warmup_multi_step_schedule(
            float(tr.lr),
            [int(m) * ep_iter for m in sched_cfg.milestones],
            float(sched_cfg.gamma),
            warmup_factor=float(sched_cfg.get("warmup_factor", 1.0 / 3.0)),
            warmup_iters=int(sched_cfg.get("warmup_iters", 500)),
            warmup_method=str(sched_cfg.get("warmup_method", "linear")),
        )
    else:  # multi_step
        milestones = [int(m) * int(cfg.get("ep_iter", 500)) for m in sched_cfg.milestones]
        sched = optax.piecewise_constant_schedule(
            float(tr.lr), {m: float(sched_cfg.gamma) for m in milestones}
        )

    opt_name = tr.get("optim", "adam")
    txs = [optax.clip(40.0)]  # value-clip parity with trainer.py:59
    wd = float(tr.get("weight_decay", 0.0))
    if opt_name == "adam":
        txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if wd > 0:
            txs.append(optax.add_decayed_weights(wd))
    elif opt_name == "radam":
        txs.append(optax.scale_by_radam())
        if wd > 0:
            txs.append(optax.add_decayed_weights(wd))
    elif opt_name == "sgd":
        if wd > 0:
            txs.append(optax.add_decayed_weights(wd))
    else:
        raise ValueError(f"unknown optimizer {opt_name}")
    txs.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*txs)
