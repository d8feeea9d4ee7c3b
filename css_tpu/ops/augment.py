"""Device-resident geometric augmentation (scale / pad / crop / flip).

Replaces the reference's hottest non-compute path: ``batch_transform*``
(dataset_helpers/VOC.py:276-352) loops over the batch, copies each image
GPU->CPU, round-trips it through PIL (``transform``/``transform_2``/
``transform_3``, VOC.py:64-274), and re-uploads — per image, per step,
twice per step.  Here the whole pipeline is one vmapped, jit-compiled
gather program over NHWC tensors in HBM:

reference semantics reproduced (VOC.py:64-124):
  * scale ratio ~ U(scale_lo, scale_hi); resized = floor(size * ratio)
    (bilinear image / nearest labels+confidence maps);
  * right/bottom padding when resized < crop: image reflect-padded,
    labels padded with ignore, confidences padded with 0;
  * uniform random crop over the padded canvas;
  * optional photometric block (color jitter p=.8, blur p=.5) and
    horizontal flip p=.5 — applied only when ``augmentation=True``.

Instead of materializing the dynamically-shaped resized image, every output
pixel is mapped backwards (crop offset -> padded coords -> multi-fold
reflection -> source coords) and sampled in one gather.  All shapes are
static; the per-image scale/crop randomness lives in index arithmetic.

Accepted divergence: PIL's bilinear downscale antialiases (area-weighted
support); this implementation uses pure bilinear taps.  Labels and
confidence maps use nearest sampling in both.

The generic signature carries K label maps and L confidence maps, covering
the reference's ``transform`` (1+1), ``transform_2`` (1+2) and
``transform_3`` (2+2) variants with one implementation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from css_tpu.ops.photometric import random_photometric

__all__ = ["geometric_transform", "batch_transform", "normalize_imagenet",
           "denormalize_imagenet"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(img):
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


def denormalize_imagenet(img):
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return img * std + mean


def _reflect_index(idx, size):
    """Multi-fold reflect (no edge repeat), numpy 'reflect' style."""
    period = jnp.maximum(2 * (size - 1), 1)
    m = jnp.mod(idx, period)
    return jnp.where(size > 1, jnp.minimum(m, period - m), 0)


def geometric_transform(
    rng: jax.Array,
    image: jax.Array,          # [H, W, 3] float in [0,1]
    labels: jax.Array,         # [K, H, W] int32 (-1 = ignore)
    confs: jax.Array,          # [L, H, W] float confidence maps
    valid_hw: jax.Array,       # [2] int32 valid region of the canvas
    crop_hw: Tuple[int, int],
    scale_range: Tuple[float, float],
    augmentation: bool,
):
    """One image through scale->pad->crop->(photo, flip). Returns same layout
    with spatial dims = crop_hw."""
    ch, cw = crop_hw
    vh = valid_hw[0].astype(jnp.float32)
    vw = valid_hw[1].astype(jnp.float32)
    k_scale, k_i, k_j, k_photo, k_flip = jax.random.split(rng, 5)

    ratio = jax.random.uniform(k_scale, minval=scale_range[0], maxval=scale_range[1])
    rh = jnp.maximum(jnp.floor(vh * ratio), 1.0)
    rw = jnp.maximum(jnp.floor(vw * ratio), 1.0)
    ph = jnp.maximum(rh, ch)
    pw = jnp.maximum(rw, cw)

    i0 = jnp.floor(jax.random.uniform(k_i) * (ph - ch + 1.0))
    j0 = jnp.floor(jax.random.uniform(k_j) * (pw - cw + 1.0))

    ys = jnp.arange(ch, dtype=jnp.float32)[:, None] + i0     # [ch, 1]
    xs = jnp.arange(cw, dtype=jnp.float32)[None, :] + j0     # [1, cw]
    py = jnp.broadcast_to(ys, (ch, cw))
    px = jnp.broadcast_to(xs, (ch, cw))

    in_pad = (py >= rh) | (px >= rw)                         # label ignore region
    ry = _reflect_index(py, rh)
    rx = _reflect_index(px, rw)

    # resized -> source mapping (half-pixel centres, PIL convention)
    sy = jnp.clip((ry + 0.5) * vh / rh - 0.5, 0.0, vh - 1.0)
    sx = jnp.clip((rx + 0.5) * vw / rw - 0.5, 0.0, vw - 1.0)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, valid_hw[0] - 1)
    x1i = jnp.minimum(x0i + 1, valid_hw[1] - 1)

    p00 = image[y0i, x0i]
    p01 = image[y0i, x1i]
    p10 = image[y1i, x0i]
    p11 = image[y1i, x1i]
    out_img = (
        p00 * (1 - wy) * (1 - wx)
        + p01 * (1 - wy) * wx
        + p10 * wy * (1 - wx)
        + p11 * wy * wx
    )

    # nearest sampling for labels / confidence maps
    ny = jnp.clip(jnp.floor((ry + 0.5) * vh / rh), 0, vh - 1.0).astype(jnp.int32)
    nx = jnp.clip(jnp.floor((rx + 0.5) * vw / rw), 0, vw - 1.0).astype(jnp.int32)
    out_labels = labels[:, ny, nx]                           # [K, ch, cw]
    out_labels = jnp.where(in_pad[None], -1, out_labels)
    out_confs = confs[:, ny, nx]
    out_confs = jnp.where(in_pad[None], 0.0, out_confs)

    if augmentation:
        out_img = random_photometric(k_photo, out_img)
        do_flip = jax.random.uniform(k_flip) > 0.5
        out_img = jnp.where(do_flip, out_img[:, ::-1], out_img)
        out_labels = jnp.where(do_flip, out_labels[:, :, ::-1], out_labels)
        out_confs = jnp.where(do_flip, out_confs[:, :, ::-1], out_confs)

    return out_img, out_labels, out_confs


@functools.partial(
    jax.jit,
    static_argnames=("crop_hw", "scale_range", "augmentation"),
)
def batch_transform(
    rng: jax.Array,
    images: jax.Array,          # [B, H, W, 3] float [0,1]
    labels: jax.Array,          # [B, K, H, W] int32
    confs: jax.Array,           # [B, L, H, W] float
    valid_hw: jax.Array,        # [B, 2] int32
    crop_hw: Tuple[int, int],
    scale_range: Tuple[float, float],
    augmentation: bool,
):
    """Vmapped batch version of :func:`geometric_transform`.

    Mirrors ``batch_transform``/``_2``/``_3`` (VOC.py:312-352): pass K=1/1/2
    label maps and L=1/2/2 confidence maps.
    """
    keys = jax.random.split(rng, images.shape[0])
    fn = functools.partial(
        geometric_transform,
        crop_hw=crop_hw,
        scale_range=scale_range,
        augmentation=augmentation,
    )
    return jax.vmap(fn)(keys, images, labels, confs, valid_hw)
