from css_tpu.ops.interpolate import (
    adaptive_avg_pool_1x1,
    bilinear_resize,
    nearest_resize,
    resize_like,
)

__all__ = [
    "adaptive_avg_pool_1x1",
    "bilinear_resize",
    "nearest_resize",
    "resize_like",
]
