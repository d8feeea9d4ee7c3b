"""Cooperative SIGTERM handling: checkpoint-and-exit on preemption.

Cluster schedulers (SLURM, GKE, Borg) and TPU-VM maintenance events deliver
SIGTERM with a short grace window before SIGKILL.  The reference framework
has no preemption story — a signal kills ``mp.spawn`` mid-step and the run
restarts from the last *best* checkpoint, losing everything since.

Here the handler only sets a flag; the training loop polls it at step
granularity, writes the rolling recovery checkpoint, and returns cleanly so
``--resume`` continues from the preemption point.  Multi-host: a one-sided
exit would deadlock the other processes' collectives, so the poll reduces
the flag across processes (every ``check_every`` steps to keep the host
round trip off the common path) and all processes leave together.
"""

from __future__ import annotations

import os
import signal

import jax
import numpy as np

__all__ = ["PreemptionGuard", "apply_platform_override"]


class PreemptionGuard:
    def __init__(self, check_every: int = 10):
        self.check_every = max(int(check_every), 1)
        self._flagged = False
        self._installed = False
        self._prev = None

    def install(self) -> "PreemptionGuard":
        try:
            self._prev = signal.signal(signal.SIGTERM, self._on_term)
            self._installed = True
        except ValueError:
            # signal.signal only works on the main thread — tests (and
            # embedding callers) that drive run_training from a worker
            # thread simply run unguarded
            pass
        return self

    def uninstall(self) -> None:
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev or signal.SIG_DFL)
            self._installed = False

    def _on_term(self, signum, frame):  # noqa: ARG002 (signal signature)
        self._flagged = True

    def should_stop(self, step_in_epoch: int) -> bool:
        """Poll from the training loop; returns True once (all processes of)
        the run should checkpoint and exit.

        Single-process: the local flag, checked every step.  Multi-process:
        an any-process reduction every ``check_every`` steps — every process
        calls it at the same cadence, so the collective cannot deadlock and
        all processes observe the same verdict.
        """
        if jax.process_count() == 1:
            return self._flagged
        if step_in_epoch % self.check_every != 0:
            return False
        from css_tpu.parallel.mesh import cross_process_sum

        return int(cross_process_sum(
            np.asarray([1 if self._flagged else 0], np.int32))[0]) > 0


def apply_platform_override() -> None:
    """Honor ``CSS_TPU_PLATFORM`` (e.g. ``cpu``) by flipping the
    already-imported jax config.

    Some environments pre-import jax with a platform pre-selected (this dev
    box's sitecustomize pins a remote-TPU backend), which makes the standard
    ``JAX_PLATFORMS`` env var a no-op for subprocesses.  The CLIs call this
    before first device use so ``CSS_TPU_PLATFORM=cpu python ori_pseudo.py``
    reliably runs on host CPU (tests, smoke runs, CI).
    """
    plat = os.environ.get("CSS_TPU_PLATFORM", "")
    if plat:
        jax.config.update("jax_platforms", plat)
