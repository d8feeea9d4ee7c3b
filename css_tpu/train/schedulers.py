"""Pure-function schedules (learning rate + loss ramps).

* ``poly_lr`` — per-iteration polynomial decay with a floor, the reference's
  ``PolyLR`` (scheduler/my_lr_scheduler.py:1-12; stepped per iteration at
  ori_pseudo.py:189, base lr 6.4e-3, power 0.9, min 1e-4 at ori_pseudo.py:101).
* ``rampdown_value`` — per-epoch exponential ramp-down used to weight the
  contrastive loss in the mix/cross strategies
  (scheduler/rampscheduler.py:28-53; mix_label.py:188).
* ``ramp_up_value`` — the complementary ramp-up (rampscheduler.py:2-26),
  provided for completeness.

All are closed-form functions of the step/epoch so they live happily inside
jit or as optax schedule callables.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["poly_lr", "rampdown_value", "ramp_up_value", "teacher_ema_decay"]


def poly_lr(step, base_lr: float, total_steps: int, power: float = 0.9,
            min_lr: float = 1e-4):
    frac = 1.0 - jnp.asarray(step, jnp.float32) / total_steps
    return jnp.maximum(base_lr * jnp.maximum(frac, 0.0) ** power, min_lr)


def rampdown_value(epoch, begin_epoch: int, max_epoch: int, max_value: float,
                   min_value: float, ramp_mult: float):
    e = jnp.asarray(epoch, jnp.float32)
    span = max(max_epoch - begin_epoch, 1)
    frac = (e - begin_epoch) / span
    val = max_value * jnp.exp(ramp_mult * frac ** 2)
    val = jnp.where(e < begin_epoch, 0.0, jnp.where(e >= max_epoch, min_value, val))
    return jnp.maximum(val, min_value)


def ramp_up_value(epoch, begin_epoch: int, max_epoch: int, max_value: float,
                  ramp_mult: float):
    e = jnp.asarray(epoch, jnp.float32)
    span = max(max_epoch - begin_epoch, 1)
    frac = (e - begin_epoch) / span
    val = max_value * jnp.exp(ramp_mult * (1.0 - frac) ** 2)
    return jnp.where(e < begin_epoch, 0.0, jnp.where(e >= max_epoch, max_value, val))


def teacher_ema_decay(step, alpha: float = 0.99):
    """min(1 - 1/(step+1), alpha) — reference ddp_model.py:26-30."""
    s = jnp.asarray(step, jnp.float32)
    return jnp.minimum(1.0 - 1.0 / (s + 1.0), alpha)
