"""Rank-aware logging: stdout + optional tee to a log file.

The reference has a tee ``Logger`` that is commented out everywhere
(utils.py:231-241, ori_pseudo.py:121-122); here it is a working first-class
facility, active on process 0 only.
"""

from __future__ import annotations

import os
import sys
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
