"""DeepLabV3+ with a dual classifier/representation head (Flax, NHWC).

Re-implements the only network the reference constructs,
``DeepLabv3Plus_with_rep`` (generalframeworks/networks/deeplabv3/
deeplabv3.py:90-169):

* ResNet trunk re-dilated to output stride 8 (ASPP rates [12, 24, 36]) or
  16 (rates [6, 12, 18]) — deeplabv3.py:93-100;
* decoder: low-level (/4) features projected 256->48 by a 1x1 conv
  (deeplabv3.py:115-119), ASPP output bilinearly upsampled (align_corners=True)
  to /4 and concatenated (304 channels);
* two heads on the 304-ch decoder tensor: ``classifier`` -> num_classes and
  ``representation`` -> output_dim (deeplabv3.py:121-133).

Outputs are at 1/4 input resolution in NHWC:
``(prediction [B,h/4,w/4,C], representation [B,h/4,w/4,D])``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from css_tpu.models.aspp import ASPP
from css_tpu.models.resnet import (
    ConvBN,
    ResNetBackbone,
    resnet101,
    resnet101_stem,
    resnet_tiny,
)
from css_tpu.ops.interpolate import bilinear_resize

__all__ = ["DeepLabV3PlusDual", "build_model"]


def _torch_default_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) over fan_in."""
    fan_in = shape[0] * shape[1] * shape[2]  # HWIO
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_default_conv_bias_init(fan_in):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Head(nn.Module):
    """Conv3x3(304->256, no bias) + BN + ReLU + Conv1x1(256->out)."""

    out_features: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, groups: int = 1):
        x = ConvBN(256, 3, name="conv", dtype=self.dtype,
                   axis_name=self.axis_name)(x, train, groups)
        x = nn.Conv(
            self.out_features,
            (1, 1),
            use_bias=True,
            kernel_init=_torch_default_conv_kernel_init,
            bias_init=_torch_default_conv_bias_init(256),
            dtype=self.dtype,
            name="out",
        )(x)
        return x


class DeepLabV3PlusDual(nn.Module):
    backbone: ResNetBackbone
    num_classes: int = 21
    output_dim: int = 256
    output_stride: int = 8
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, bn_groups: int = 1):
        """``bn_groups > 1``: the batch is G stacked groups that must keep
        separate BatchNorm statistics (fused two-pass forward; see
        GroupedBatchNorm).  Semantics-neutral for inference."""
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        g = bn_groups
        if (hasattr(self.backbone, "output_stride")
                and self.backbone.output_stride != self.output_stride):
            # a direct constructor passing an OS16 trunk but defaulting
            # output_stride=8 would silently pick the wrong atrous rates
            raise ValueError(
                f"output_stride={self.output_stride} does not match the "
                f"backbone's stage schedule (stride "
                f"{self.backbone.output_stride}); pass the matching "
                f"output_stride to DeepLabV3PlusDual (build_model does)."
            )
        low, feat = self.backbone(x, train=train, groups=g)
        feat = ASPP(
            atrous_rates=self._aspp_rates(), name="aspp", **kw
        )(feat, train, g)
        low = ConvBN(48, 1, name="project", **kw)(low, train, g)
        feat = bilinear_resize(feat, (low.shape[1], low.shape[2]), align_corners=True)
        feat = feat.astype(low.dtype)
        dec = jnp.concatenate([low, feat], axis=-1)
        pred = _Head(self.num_classes, name="classifier", **kw)(dec, train, g)
        rep = _Head(self.output_dim, name="representation", **kw)(dec, train, g)
        # losses and prototype math run in f32 regardless of compute dtype
        return pred.astype(jnp.float32), rep.astype(jnp.float32)

    def _aspp_rates(self):
        # output stride 8 -> [12, 24, 36]; 16 -> [6, 12, 18]
        # (deeplabv3.py:93-100).  Received explicitly rather than inferred
        # from the trunk's stage schedule, which silently broke for
        # non-canonical schedules.
        if self.output_stride == 8:
            return (12, 24, 36)
        if self.output_stride == 16:
            return (6, 12, 18)
        raise ValueError(f"unsupported output_stride {self.output_stride}")


def build_model(
    num_classes: int,
    output_dim: int = 256,
    backbone: str = "resnet101",
    output_stride: int = 8,
    dtype: Any = jnp.float32,
    axis_name: Optional[str] = None,
    remat: bool = False,
    remat_policy: str = "nothing",
) -> DeepLabV3PlusDual:
    """Build the student/teacher network.

    ``backbone`` is ``resnet101`` (plain stem, VOC default — ori_pseudo.py:67)
    or ``resnet101_stem`` (deep stem, Cityscapes option — ori_pseudo.py:71-72).
    """
    if backbone == "resnet101":
        trunk = resnet101(output_stride, dtype=dtype, axis_name=axis_name,
                          remat=remat, remat_policy=remat_policy)
    elif backbone == "resnet101_stem":
        trunk = resnet101_stem(output_stride, dtype=dtype, axis_name=axis_name,
                               remat=remat, remat_policy=remat_policy)
    elif backbone in ("tiny", "tiny_stem"):
        trunk = resnet_tiny(output_stride, dtype=dtype, axis_name=axis_name,
                            remat=remat, remat_policy=remat_policy,
                            deep_stem=backbone == "tiny_stem")
    else:
        raise ValueError(f"unknown backbone {backbone}")
    return DeepLabV3PlusDual(
        backbone=trunk,
        num_classes=num_classes,
        output_dim=output_dim,
        output_stride=output_stride,
        dtype=dtype,
        axis_name=axis_name,
    )
