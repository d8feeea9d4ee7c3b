"""ResNet backbones in Flax (NHWC, TPU-native).

Re-designs the two backbones the reference framework uses:

* torchvision-style ResNet-101 (plain 7x7 stem) — the default VOC backbone
  (reference: ori_pseudo.py:67-69 builds ``torchvision.models.resnet101()``).
* deep-stem ResNet-101 with multi-grid dilation — the Cityscapes option
  (reference: generalframeworks/networks/resnet.py:142-291).

The reference achieves output-stride-8 by *mutating* a constructed torchvision
model (``DeepLabv3Plus_with_rep._nostride_dilate``, deeplabv3.py:135-149).
Here dilation is a constructor argument: each stage is described by a static
``StageSpec`` carrying (blocks, stride, first_dilation, rest_dilation), which
keeps the module graph static and jit-friendly.  Dilation rules reproduce the
reference surgery exactly:

* output stride 8, plain stem: layer3 stride 2->1 (first block dilation 1,
  rest 2); layer4 stride 1 (first block dilation 2, rest 4).
* output stride 8, deep stem + multi-grid [2,2,4]: layer4 dilations [4, 8, 16]
  (resnet.py:246-248).

Layout is NHWC and all convs use explicit torch-equivalent padding so that
converted torchvision weights are bit-compatible in geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

__all__ = ["ResNetBackbone", "resnet101", "resnet101_stem", "StageSpec"]


# torch kaiming_normal_ draws from an untruncated normal; use normal for parity.
def _torch_kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    # HWIO: fan_out = H * W * O
    fan_out = shape[0] * shape[1] * shape[3]
    std = (2.0 / fan_out) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class GroupedBatchNorm(nn.Module):
    """BatchNorm whose train-mode statistics are computed per batch *group*.

    The reference runs the student (and in mix/cross the teacher) as two
    sequential forwards — labeled then unlabeled — so every BatchNorm sees
    per-half batch statistics and updates its running stats twice in that
    order (ddp_model.py:60-64,102-103).  Fusing the halves into one batch
    keeps the MXU fed (conv TF/s measured ~1.6x higher at batch 16 vs 8 on
    v5e) but plain BatchNorm would mix the halves' statistics.  This module
    restores the exact two-pass semantics inside the fused batch: the leading
    axis is split into ``groups`` equal groups, each normalized by its own
    (cross-replica, if ``axis_name``) statistics, and the running stats get
    the same sequential EMA updates the two-pass order produced.

    Parameter/stat layout is identical to ``nn.BatchNorm`` ({scale, bias} /
    {mean, var}), so checkpoints and torch converters are unaffected.
    Statistics always accumulate in f32 under bf16 compute.
    """

    momentum: float = 0.9  # == torch momentum 0.1
    epsilon: float = 1e-5
    zero_init_scale: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, groups: int = 1):
        c = x.shape[-1]
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_init_scale else nn.initializers.ones,
            (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones((c,), jnp.float32))

        dtype = x.dtype
        if not train:
            mean = ra_mean.value
            var = ra_var.value
            # elementwise pass in the compute dtype (the step is HBM-bound;
            # f32 normalize doubles activation traffic).  Subtract-first
            # keeps precision relative to x — folding mean into the bias
            # would cancel catastrophically in bf16 when |mean| >> std.
            inv = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(dtype)
            return (x - mean.astype(dtype)) * inv + bias.astype(dtype)

        b = x.shape[0]
        g = groups
        assert b % g == 0, (b, g)
        # statistics REDUCTIONS in f32 (a bf16 mean over 512^2 activations
        # loses ~3 decimal digits — dev-notes invariant #3); the per-element
        # normalize then runs in the compute dtype with folded f32 scalars.
        xg = x.reshape(g, b // g, *x.shape[1:])
        red = tuple(range(1, xg.ndim - 1))
        xf = xg.astype(jnp.float32)
        mean_g = jnp.mean(xf, axis=red)                      # [G, C]
        msq_g = jnp.mean(jnp.square(xf), axis=red)           # [G, C]
        if self.axis_name is not None:
            mean_g = jax.lax.pmean(mean_g, self.axis_name)
            msq_g = jax.lax.pmean(msq_g, self.axis_name)
        var_g = msq_g - jnp.square(mean_g)

        shape = (g, 1) + (1,) * (xg.ndim - 3) + (c,)
        inv_g = scale * jax.lax.rsqrt(var_g + self.epsilon)  # [G, C] f32
        y = (xg - mean_g.reshape(shape).astype(dtype)) \
            * inv_g.reshape(shape).astype(dtype) \
            + bias.astype(dtype)
        y = y.reshape(x.shape).astype(dtype)

        if not self.is_initializing():
            # sequential EMA, group 0 first — the order the reference's
            # two-pass forward applied (labeled update, then unlabeled).
            # torch updates running_var with the UNBIASED batch variance
            # (n/(n-1)); negligible for spatial BNs (n = B*H*W) but a 2x
            # factor for the ASPP global-pool BN (n = B = 2) — caught by the
            # composed train-step differential.
            n = 1
            for i in red:
                n *= xg.shape[i]
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            bessel = jnp.float32(n) / jnp.maximum(jnp.float32(n) - 1.0, 1.0)
            new_mean, new_var = ra_mean.value, ra_var.value
            for gi in range(g):
                new_mean = self.momentum * new_mean + (1 - self.momentum) * mean_g[gi]
                new_var = (self.momentum * new_var
                           + (1 - self.momentum) * var_g[gi] * bessel)
            ra_mean.value = new_mean
            ra_var.value = new_var
        return y


class AtrousConv3x3(nn.Module):
    """Large-dilation 3x3 conv as 9 shifted 1x1 matmuls (SAME pad, stride 1).

    At ASPP rates (12/24/36) on the OS8 feature map (~64x64 for 512^2
    crops), most of a dilated conv's taps land on SAME-padding zeros — e.g.
    at dilation 36 on 64^2, the 8 off-center taps only overlap the input on
    28- or 28x28-pixel strips, yet ``conv_general_dilated`` pays all 9 taps
    everywhere (trace: the three ASPP atrous convs were the largest single
    cost in the step).  Decomposing into per-tap 1x1 contractions over the
    valid overlap regions does only the useful MACs (~39% at d=36, ~56% at
    24, ~76% at 12) and runs them as K=2048 matmuls the MXU loves.
    Accumulation is f32; parameter layout matches nn.Conv ("kernel", HWIO)
    so torch conversion and checkpoints are unchanged.

    The trade is FLOPs for input re-reads (each off-center tap re-streams
    its slice of x), so it only wins when the valid-tap FLOP fraction is
    small: measured on v5e at 64^2/2048ch, d=36 (fraction .39) runs 1.34x
    faster than the dilated conv while d=12 (fraction .76) is 1.3x slower.
    ``valid_fraction`` computes the gate; ConvBN applies it at trace time.
    """

    features: int
    dilation: int
    dtype: Any = jnp.float32

    @staticmethod
    def valid_fraction(h: int, w: int, d: int) -> float:
        """Fraction of the 9 taps' MACs that touch real input (not pad)."""
        vh, vw = max(h - d, 0), max(w - d, 0)
        return (h * w + 2 * vh * w + 2 * h * vw + 4 * vh * vw) / (9.0 * h * w)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", _torch_kaiming_normal_fan_out,
                       (3, 3, cin, self.features), jnp.float32)
        w = w.astype(self.dtype)
        b, h, wd, _ = x.shape
        d = self.dilation

        def tap(src, dy, dx):
            return jnp.einsum("bhwc,cf->bhwf", src, w[dy + 1, dx + 1],
                              preferred_element_type=jnp.float32)

        out = tap(x, 0, 0)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                oy, ox = dy * d, dx * d
                ylo, yhi = max(0, -oy), h - max(0, oy)
                xlo, xhi = max(0, -ox), wd - max(0, ox)
                if yhi <= ylo or xhi <= xlo:
                    continue  # tap entirely in the padding
                src = x[:, ylo + oy:yhi + oy, xlo + ox:xhi + ox]
                out = out.at[:, ylo:yhi, xlo:xhi].add(tap(src, dy, dx))
        return out


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm (+ optional ReLU), torch-padding semantics."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    zero_init_scale: bool = False
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9  # == torch momentum 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, groups: int = 1):
        pad = self.dilation * (self.kernel - 1) // 2
        if (self.kernel == 3 and self.stride == 1 and self.dilation > 1
                and AtrousConv3x3.valid_fraction(
                    x.shape[1], x.shape[2], self.dilation) <= 0.45):
            x = AtrousConv3x3(self.features, self.dilation, dtype=self.dtype,
                              name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                kernel_init=_torch_kaiming_normal_fan_out,
                dtype=self.dtype,
                name="conv",
            )(x)
        # BatchNorm statistics always accumulate in f32: with bf16 compute a
        # mean over 512^2 bf16 activations would lose ~3 decimal digits.
        x = GroupedBatchNorm(
            momentum=self.bn_momentum,
            epsilon=1e-5,
            zero_init_scale=self.zero_init_scale,
            axis_name=self.axis_name,
            name="bn",
        )(x, train, groups)
        if self.relu:
            x = nn.relu(x)
        return x.astype(self.dtype)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck: 1x1 -> 3x3 (stride, dilation) -> 1x1 x4."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    tag_mid: bool = False

    @nn.compact
    def __call__(self, x, train: bool, groups: int = 1):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        identity = x
        out = ConvBN(self.planes, 1, 1, 1, relu=True, name="conv1", **kw)(x, train, groups)
        out = ConvBN(self.planes, 3, self.stride, self.dilation, relu=True, name="conv2", **kw)(out, train, groups)
        if self.tag_mid:
            # consumed by ResNetBackbone.remat_policy="save_mid"'s
            # save_only_these_names policy; gated so the default program
            # (and its persistent compile cache) is byte-identical
            out = checkpoint_name(out, "bneck_mid")
        out = ConvBN(
            self.planes * 4, 1, 1, 1, relu=False,
            zero_init_scale=self.zero_init_residual, name="conv3", **kw,
        )(out, train, groups)
        if self.has_downsample:
            identity = ConvBN(
                self.planes * 4, 1, self.stride, 1, relu=False, name="downsample", **kw
            )(x, train, groups)
        return nn.relu(out + identity)


@dataclasses.dataclass(frozen=True)
class StageSpec:
    planes: int
    blocks: int
    stride: int
    first_dilation: int
    rest_dilation: int


def _max_pool_3x3_s2(x, ceil_mode: bool = False):
    """3x3/2 max pool with torch padding=1 (optionally ceil_mode)."""
    h, w = x.shape[1], x.shape[2]
    pad_h = [1, 1]
    pad_w = [1, 1]
    if ceil_mode:
        # torch ceil_mode: add extra right/bottom padding so the last window
        # starting inside the (padded) input is included.
        if (h + 2 - 3) % 2 != 0:
            pad_h[1] += 1
        if (w + 2 - 3) % 2 != 0:
            pad_w[1] += 1
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=(tuple(pad_h), tuple(pad_w))
    )


class ResNetBackbone(nn.Module):
    """ResNet trunk returning (low_level /4 features, final features).

    ``deep_stem=False`` mirrors torchvision resnet101; ``deep_stem=True``
    mirrors the reference ``ResNet_Stem`` (three 3x3 convs to 128ch,
    ceil-mode max pool, zero-init residual BNs — resnet.py:177-185,218-223).
    """

    stages: Tuple[StageSpec, ...]
    deep_stem: bool = False
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    # recompute bottlenecks in backward: True = every stage (769^2 crops);
    # a tuple of 0-based stage indices remats only those stages (e.g. (2,)
    # remats layer3 alone — a FLOPs-for-HBM-traffic trade for the
    # bandwidth-bound 512^2 step, docs/perf_round3.md)
    remat: Any = False
    # what remat'd blocks may KEEP: "nothing" recomputes the whole block in
    # backward (minimum memory); "save_mid" keeps each block's conv2 output
    # (the [.., planes] mid tensor, 1/4 the block-output width) so backward
    # only recomputes the cheap 1x1 conv1 chain instead of all three convs
    # (conv2 is ~53% and conv1 ~21% of block MACs) — a middle point between
    # full remat and none for memory-constrained crops
    remat_policy: str = "nothing"

    @property
    def output_stride(self) -> int:
        """Overall stride of the final feature map (stem /4 x stage strides).

        Lets consumers (DeepLabV3PlusDual) cross-check their atrous-rate
        schedule against the trunk actually wired in.
        """
        s = 4  # stride-2 stem conv + stride-2 max pool, both stem variants
        for spec in self.stages:
            s *= spec.stride
        return s

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        if self.remat_policy == "nothing":
            policy = jax.checkpoint_policies.nothing_saveable
        elif self.remat_policy == "save_mid":
            policy = jax.checkpoint_policies.save_only_these_names("bneck_mid")
        else:
            raise ValueError(f"unknown remat_policy {self.remat_policy!r} "
                             "(expected 'nothing' or 'save_mid')")
        remat_block = nn.remat(Bottleneck, static_argnums=(2, 3),
                               policy=policy)

        def stage_block_cls(si):
            if isinstance(self.remat, (tuple, list)):
                return remat_block if si in tuple(self.remat) else Bottleneck
            return remat_block if self.remat else Bottleneck
        if self.deep_stem:
            x = ConvBN(64, 3, 2, relu=True, name="stem1", **kw)(x, train, groups)
            x = ConvBN(64, 3, 1, relu=True, name="stem2", **kw)(x, train, groups)
            # third stem conv's BN is the reference's separate ``bn1``
            x = ConvBN(128, 3, 1, relu=True, name="stem3", **kw)(x, train, groups)
            x = _max_pool_3x3_s2(x, ceil_mode=True)
        else:
            x = ConvBN(64, 7, 2, relu=True, name="stem", **kw)(x, train, groups)
            x = _max_pool_3x3_s2(x, ceil_mode=False)

        low_level = None
        in_planes = 128 if self.deep_stem else 64
        for si, spec in enumerate(self.stages):
            block_cls = stage_block_cls(si)
            for bi in range(spec.blocks):
                first = bi == 0
                x = block_cls(
                    planes=spec.planes,
                    stride=spec.stride if first else 1,
                    dilation=spec.first_dilation if first else spec.rest_dilation,
                    has_downsample=first and (spec.stride != 1 or in_planes != spec.planes * 4),
                    zero_init_residual=self.zero_init_residual,
                    # tag conv2 outputs only where the save_mid policy will
                    # consume them (keeps the default program byte-identical)
                    tag_mid=(block_cls is remat_block
                             and self.remat_policy == "save_mid"),
                    name=f"layer{si + 1}_{bi}",
                    **kw,
                )(x, train, groups)
                in_planes = spec.planes * 4
            if si == 0:
                low_level = x
        return low_level, x


def _stage_specs(layers: Sequence[int], output_stride: int, multi_grid: bool) -> Tuple[StageSpec, ...]:
    """Stage dilation/stride schedule reproducing the reference surgery.

    OS8 plain: deeplabv3.py:93-96 + _nostride_dilate (:135-149).
    OS8 deep-stem multi-grid: resnet.py:230-268 (grids [2,2,4] in layer4).
    """
    l1, l2, l3, l4 = layers
    if output_stride == 8:
        if multi_grid:
            # deep-stem path: replace_stride_with_dilation=[False, True, True]
            # layer4 first dilation = prev_dil(2) * grid(2) = 4; rest 4*[2,4]
            # StageSpec only supports one "rest" dilation, so expand layer4
            # into per-block stages below via rest_dilation list.
            return (
                StageSpec(64, l1, 1, 1, 1),
                StageSpec(128, l2, 2, 1, 1),
                StageSpec(256, l3, 1, 1, 2),
                # represented as three single-block stages to carry [4, 8, 16]
                StageSpec(512, 1, 1, 4, 4),
                StageSpec(512, 1, 1, 8, 8),
                StageSpec(512, 1, 1, 16, 16),
            )
        return (
            StageSpec(64, l1, 1, 1, 1),
            StageSpec(128, l2, 2, 1, 1),
            StageSpec(256, l3, 1, 1, 2),
            StageSpec(512, l4, 1, 2, 4),
        )
    if output_stride == 16:
        return (
            StageSpec(64, l1, 1, 1, 1),
            StageSpec(128, l2, 2, 1, 1),
            StageSpec(256, l3, 2, 1, 1),
            StageSpec(512, l4, 1, 1, 2),
        )
    raise ValueError(f"unsupported output_stride {output_stride}")


def resnet101(output_stride: int = 8, dtype: Any = jnp.float32,
              axis_name: Optional[str] = None, remat: bool = False,
              remat_policy: str = "nothing") -> ResNetBackbone:
    """Plain-stem ResNet-101 trunk (torchvision weight-compatible)."""
    return ResNetBackbone(
        stages=_stage_specs([3, 4, 23, 3], output_stride, multi_grid=False),
        deep_stem=False,
        zero_init_residual=False,
        dtype=dtype,
        axis_name=axis_name,
        remat=remat,
        remat_policy=remat_policy,
    )


def resnet_tiny(output_stride: int = 8, dtype: Any = jnp.float32,
                axis_name: Optional[str] = None, remat: bool = False,
                remat_policy: str = "nothing",
                deep_stem: bool = False) -> ResNetBackbone:
    """Miniature trunk (1 block/stage, narrow) for tests and dry runs.

    ``remat``/``deep_stem`` mirror the full trunks so step-level tests can
    exercise the production feature set (remat'd deep-stem, as the
    Cityscapes recipe runs it) at test scale.
    """
    if output_stride != 8:
        raise ValueError("tiny trunk only supports OS8")
    return ResNetBackbone(
        stages=(
            StageSpec(8, 1, 1, 1, 1),
            StageSpec(16, 1, 2, 1, 1),
            StageSpec(32, 1, 1, 1, 2),
            StageSpec(64, 1, 1, 2, 4),
        ),
        deep_stem=deep_stem,
        dtype=dtype,
        axis_name=axis_name,
        remat=remat,
        remat_policy=remat_policy,
    )


def resnet101_stem(output_stride: int = 8, dtype: Any = jnp.float32,
                   axis_name: Optional[str] = None, remat: bool = False,
                   remat_policy: str = "nothing") -> ResNetBackbone:
    """Deep-stem multi-grid ResNet-101 trunk (reference ResNet_Stem)."""
    return ResNetBackbone(
        stages=_stage_specs([3, 4, 23, 3], output_stride, multi_grid=True),
        deep_stem=True,
        zero_init_residual=True,
        dtype=dtype,
        axis_name=axis_name,
        remat=remat,
        remat_policy=remat_policy,
    )
