"""LR schedules.

Parity surface: WarmupCosineLR (step_recognition/utils/lr_scheduler.py:13-89,
detectron2-style), enabled only with --lr_scheduler. Expressed as an optax
schedule: linear warmup from ``warmup_factor`` to 1 over ``warmup_iters``,
then cosine decay to 0 over the remaining steps.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_iters: int = 500,
    warmup_factor: float = 1e-3,
) -> optax.Schedule:
    warmup_iters = min(warmup_iters, total_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        warmup = warmup_factor * (1.0 - alpha) + alpha
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * step / jnp.maximum(total_steps, 1)))
        return base_lr * jnp.where(step < warmup_iters, warmup, cos)

    return schedule
