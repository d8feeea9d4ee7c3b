"""Metrics: confusion-matrix mIoU and running meters.

The device side accumulates the [C, C] matrix inside jit
(css_tpu/train/train_step.make_eval_step — the bincount update of
util/meter.py:40-48 as a scatter-add); this module is the small host-side
bookkeeping: matrix container, mIoU reduction (util/miou.py:3-8), and the
wall-clock ``AverageMeter`` (util/meter.py:4-25).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ConfusionMatrix", "mean_iou", "per_class_iou", "AverageMeter"]


def per_class_iou(mat: np.ndarray) -> np.ndarray:
    """IoU per class = diag / (rowsum + colsum - diag); empty classes are NaN
    (miou.py:3-8 computes exactly this vector before the mean)."""
    mat = np.asarray(mat, np.float64)
    diag = np.diag(mat)
    denom = mat.sum(1) + mat.sum(0) - diag
    with np.errstate(divide="ignore", invalid="ignore"):
        return diag / denom


def mean_iou(mat: np.ndarray) -> float:
    """mIoU = mean_c of the per-class IoU; NaN classes poison the mean the
    way torch.mean over NaNs would, matching the reference exactly
    (miou.py:3-8)."""
    return float(np.mean(per_class_iou(mat)))


class ConfusionMatrix:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.mat = np.zeros((num_classes, num_classes), np.int64)

    def update(self, mat) -> None:
        self.mat += np.asarray(mat, np.int64)

    def reset(self) -> None:
        self.mat[:] = 0

    @property
    def miou(self) -> float:
        return mean_iou(self.mat)

    @property
    def iou(self) -> np.ndarray:
        return per_class_iou(self.mat)


class AverageMeter:
    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __str__(self) -> str:
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(name=self.name, val=self.val, avg=self.avg)
