"""ASPP (Atrous Spatial Pyramid Pooling) in Flax, NHWC.

Re-implements the reference ASPP head (generalframeworks/networks/deeplabv3/
aspp.py:41-72): a 1x1 conv branch, three 3x3 atrous branches, and a global
average pooling branch, concatenated (5 x 256 channels) and projected by a
1x1 conv.  The image-pooling branch upsample (aspp.py:38,
``align_corners=False``) is a broadcast here, since the pooled map is 1x1 and
any bilinear convention broadcasts a single value.

Dropout after the projection is disabled in the reference (aspp.py:64,
commented out) and therefore omitted.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from css_tpu.models.resnet import ConvBN

__all__ = ["ASPP"]


class ASPP(nn.Module):
    atrous_rates: Sequence[int] = (12, 24, 36)
    features: int = 256
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        branches = [ConvBN(self.features, 1, name="conv1x1", **kw)(x, train, groups)]
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                ConvBN(self.features, 3, 1, rate, name=f"atrous{i}", **kw)(x, train, groups)
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBN(self.features, 1, name="pool_conv", **kw)(pooled, train, groups)
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))
        y = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.features, 1, name="project", **kw)(y, train, groups)
