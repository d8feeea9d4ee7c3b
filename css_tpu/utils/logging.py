"""Rank-aware logging: stdout + optional tee to a log file.

The reference has a tee ``Logger`` that is commented out everywhere
(utils.py:231-241, ori_pseudo.py:121-122); here it is a working first-class
facility, active on process 0 only.
"""

from __future__ import annotations

import os
import time
from typing import Optional

__all__ = ["Logger"]


class Logger:
    def __init__(self, log_file: Optional[str] = None, rank: int = 0):
        self.rank = rank
        self._fh = None
        if log_file and rank == 0:
            os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
            self._fh = open(log_file, "a")

    def info(self, msg: str) -> None:
        if self.rank != 0:
            return
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        line = f"[{stamp}] {msg}"
        print(line, flush=True)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()


class ScalarWriter:
    """Optional TensorBoard scalars (rank 0).

    The reference pins tensorboard/tensorboardX in requirements but never
    imports them (SURVEY.md section 5); here it's a working facility, and a
    silent no-op if tensorboardX is unavailable.
    """

    def __init__(self, log_dir: Optional[str], rank: int = 0):
        self._w = None
        if log_dir and rank == 0:
            try:
                from tensorboardX import SummaryWriter

                self._w = SummaryWriter(log_dir)
            except Exception:
                self._w = None

    def scalars(self, step: int, values: dict) -> None:
        if self._w is None:
            return
        for k, v in values.items():
            self._w.add_scalar(k, float(v), step)
        self._w.flush()

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
