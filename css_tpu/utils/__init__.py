from css_tpu.utils.metrics import AverageMeter, ConfusionMatrix, mean_iou
from css_tpu.utils.logging import Logger

__all__ = ["AverageMeter", "ConfusionMatrix", "mean_iou", "Logger"]
