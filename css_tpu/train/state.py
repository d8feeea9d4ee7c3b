"""Functional train state: one pytree, no hidden mutation.

The reference spreads mutable training state across a DDP module (student
params + buffers), a deep-copied EMA teacher mutated in-place
(ddp_model.py:26-30), a module-level ``prototypes`` global updated as a side
effect *inside the loss* (loss/loss.py:101-109), and a torch optimizer.
Here it is a single pytree threaded through a pure jit-compiled step:

    {step, params, batch_stats, ema_params, ema_batch_stats,
     opt_state, prototypes}

* the teacher EMA covers *parameters only*; its BatchNorm running statistics
  evolve through the teacher's own pseudo-label forward passes, exactly like
  the reference's train-mode EMA module (parameters() excludes buffers);
* prototypes are explicit state returned by the contrastive loss;
* the optimizer is optax SGD (nesterov, momentum 0.9) with coupled weight
  decay added to the gradient before the momentum trace — bitwise the torch
  SGD update rule (ori_pseudo.py:95-96) — and a per-iteration poly LR
  schedule (ori_pseudo.py:101,189).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from css_tpu.train.schedulers import poly_lr, teacher_ema_decay

__all__ = ["TrainState", "create_train_state", "make_optimizer", "ema_update"]


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any
    prototypes: jax.Array


def make_optimizer(base_lr: float, weight_decay: float, total_steps: int,
                   power: float = 0.9, min_lr: float = 1e-4,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    schedule = functools.partial(
        poly_lr, base_lr=base_lr, total_steps=total_steps, power=power,
        min_lr=min_lr,
    )
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=True),
    )


def create_train_state(
    rng: jax.Array,
    model,
    tx: optax.GradientTransformation,
    input_shape,
    num_classes: int,
    output_dim: int = 256,
    pretrained_backbone: Optional[dict] = None,
) -> TrainState:
    """Initialize params/stats; teacher starts as a copy of the student
    (reference deep-copies the student at construction, ddp_model.py:18-20).

    ``pretrained_backbone`` is an optional ``(params, batch_stats)`` pair for
    the trunk (from ``convert.convert_resnet_backbone``).
    """
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    if pretrained_backbone is not None:
        bb_params, bb_stats = pretrained_backbone
        params = dict(params)
        batch_stats = dict(batch_stats)
        params["backbone"] = _merge(params["backbone"], bb_params)
        batch_stats["backbone"] = _merge(batch_stats["backbone"], bb_stats)
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
        opt_state=tx.init(params),
        prototypes=jnp.zeros((num_classes, output_dim), jnp.float32),
    )


def _merge(dst: dict, src: dict) -> dict:
    """Recursively overlay ``src`` onto ``dst`` (missing keys keep init)."""
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def ema_update(ema_params, params, step, alpha: float = 0.99):
    """decay = min(1 - 1/(step+1), alpha) — reference ddp_model.py:26-30."""
    decay = teacher_ema_decay(step, alpha)
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
