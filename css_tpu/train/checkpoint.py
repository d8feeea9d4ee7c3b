"""Orbax checkpointing of the full train state.

One pytree covers everything the reference saves piecemeal with
``torch.save`` (ori_pseudo.py:135-145: epoch, student, EMA teacher,
optimizer, LR scheduler, prototypes): the ``TrainState`` already contains
params/EMA/opt-state/prototypes/step, and the LR schedule is a pure function
of the step, so resume needs no separate scheduler state (the reference
reconstructs its ramp scheduler from the epoch the same way,
ori_pseudo.py:114-119).

Rank-0-only, best-mIoU-overwrite semantics match the reference
(ori_pseudo.py:131-145); the ``keep_best`` save also stamps epoch/miou
metadata.  Cross-label's ``--prototypes_resume`` (cross_label.py:93-96) is
``load_prototypes``.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from css_tpu.train.state import TrainState

__all__ = ["save_checkpoint", "restore_checkpoint", "load_prototypes"]


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state: TrainState, epoch: int, miou: float) -> None:
    """Atomic full-state save (process 0 calls this)."""
    with ocp.StandardCheckpointer() as ckptr:
        payload = {
            "state": jax.device_get(state),
            "meta": {"epoch": np.asarray(epoch, np.int32), "miou": np.asarray(miou, np.float32)},
        }
        ckptr.save(_ckpt_dir(path), payload, force=True)


def restore_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int, float]:
    """Restore into the structure of ``state``; returns (state, epoch, miou)."""
    with ocp.StandardCheckpointer() as ckptr:
        template = {
            "state": jax.device_get(state),
            "meta": {"epoch": np.asarray(0, np.int32), "miou": np.asarray(0.0, np.float32)},
        }
        payload = ckptr.restore(_ckpt_dir(path), template)
    restored = payload["state"]
    return restored, int(payload["meta"]["epoch"]), float(payload["meta"]["miou"])


def load_prototypes(path: str, state: TrainState) -> TrainState:
    """Seed only the prototypes from another run's checkpoint."""
    restored, _, _ = restore_checkpoint(path, state)
    return state.replace(prototypes=restored.prototypes)
