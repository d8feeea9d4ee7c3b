from css_tpu.models.deeplabv3 import DeepLabV3PlusDual, build_model
from css_tpu.models.resnet import ResNetBackbone, resnet101, resnet101_stem

__all__ = [
    "DeepLabV3PlusDual",
    "build_model",
    "ResNetBackbone",
    "resnet101",
    "resnet101_stem",
]
