from css_tpu.losses.contrastive import prototype_contrastive_loss, update_prototypes
from css_tpu.losses.cross_entropy import (
    cross_entropy,
    ohem_cross_entropy,
    per_pixel_cross_entropy,
)
from css_tpu.losses.threshold import attention_threshold_loss

__all__ = [
    "prototype_contrastive_loss",
    "update_prototypes",
    "cross_entropy",
    "ohem_cross_entropy",
    "per_pixel_cross_entropy",
    "attention_threshold_loss",
]
