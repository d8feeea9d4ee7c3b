from css_tpu.data.datasets import (
    CityscapesSpec,
    SyntheticSpec,
    VOCSpec,
    build_dataset_specs,
)
from css_tpu.data.loader import BatchLoader, InfiniteLoader
from css_tpu.data.splits import read_split_lists

__all__ = [
    "CityscapesSpec",
    "SyntheticSpec",
    "VOCSpec",
    "build_dataset_specs",
    "BatchLoader",
    "InfiniteLoader",
    "read_split_lists",
]
