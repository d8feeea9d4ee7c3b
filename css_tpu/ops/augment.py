"""Device-resident geometric augmentation (scale / pad / crop / flip).

Replaces the reference's hottest non-compute path: ``batch_transform*``
(dataset_helpers/VOC.py:276-352) loops over the batch, copies each image
GPU->CPU, round-trips it through PIL (``transform``/``transform_2``/
``transform_3``, VOC.py:64-274), and re-uploads — per image, per step,
twice per step.  Here the whole pipeline is one vmapped, jit-compiled
program over HBM-resident tensors.

reference semantics reproduced (VOC.py:64-124):
  * scale ratio ~ U(scale_lo, scale_hi); resized = floor(size * ratio)
    (bilinear image / nearest labels+confidence maps);
  * right/bottom padding when resized < crop: image reflect-padded,
    labels padded with ignore, confidences padded with 0;
  * uniform random crop over the padded canvas;
  * optional photometric block (color jitter p=.8, blur p=.5) and
    horizontal flip p=.5 — applied only when ``augmentation=True``.

TPU-native design notes:
  * the scale->pad(reflect)->crop chain is a *separable* backward mapping:
    output row y depends only on (crop offset, reflection, scale) of y, and
    likewise for columns.  So resampling is four 1-D ``take``s (rows then
    columns, two taps each for bilinear) instead of a 2-D gather — XLA
    lowers 1-D takes to fast row copies, while per-pixel 2-D gathers are
    catastrophically slow on TPU;
  * images travel channel-first ([B, 3, H, W]) through the augmentation
    pipeline so the minor (lane) dimension is W, not the 3-wide channel
    axis; the train step transposes to NHWC once, right before the conv
    stack.

Image resampling reproduces PIL's BILINEAR law exactly, including the
antialiased downscale: PIL scales the triangle filter's support by the
shrink factor (``filterscale = max(v/r, 1)``), clamps each output pixel's
window to the image and renormalizes.  Because the interpolation operator
here is a dense per-image [crop, H] matrix contracted on the MXU, arbitrary
per-row weights cost the same as 2-tap bilinear — the triangle weights are
computed densely from the traced ratio with zero gathers.  Labels and
confidence maps use nearest sampling in both.

The generic signature carries K label maps and L confidence maps, covering
the reference's ``transform`` (1+1), ``transform_2`` (1+2) and
``transform_3`` (2+2) variants with one implementation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from css_tpu.ops.photometric import q8_entry_image, q8_floor, random_photometric

__all__ = ["apply_geometric", "geometric_transform", "batch_transform",
           "normalize_imagenet", "denormalize_imagenet", "to_channel_first",
           "to_channel_last"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def to_channel_first(img_nhwc: jax.Array) -> jax.Array:
    return jnp.transpose(img_nhwc, (0, 3, 1, 2))


def to_channel_last(img_nchw: jax.Array) -> jax.Array:
    return jnp.transpose(img_nchw, (0, 2, 3, 1))


def normalize_imagenet(img, channel_axis: int = -1):
    """(x - mean)/std; works for NHWC (channel_axis=-1) or CF (=-3)."""
    if channel_axis == -1:
        mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
        std = jnp.asarray(IMAGENET_STD, img.dtype)
    else:
        mean = jnp.asarray(IMAGENET_MEAN, img.dtype).reshape(3, 1, 1)
        std = jnp.asarray(IMAGENET_STD, img.dtype).reshape(3, 1, 1)
    return (img - mean) / std


def denormalize_imagenet(img, channel_axis: int = -1):
    if channel_axis == -1:
        mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
        std = jnp.asarray(IMAGENET_STD, img.dtype)
    else:
        mean = jnp.asarray(IMAGENET_MEAN, img.dtype).reshape(3, 1, 1)
        std = jnp.asarray(IMAGENET_STD, img.dtype).reshape(3, 1, 1)
    return img * std + mean


def _reflect_index(idx, size):
    """Multi-fold reflect (no edge repeat), numpy 'reflect' style."""
    period = jnp.maximum(2 * (size - 1), 1)
    m = jnp.mod(idx, period)
    return jnp.where(size > 1, jnp.minimum(m, period - m), 0)


def _axis_maps(u_off, out_size: int, in_size: int, valid, ratio, crop):
    """Per-axis backward mapping.  ``u_off`` is a uniform [0,1) draw for the
    crop offset (kept explicit so tests can force exact geometry).  Returns
    (resample matrix [out_size, in_size] f32, nearest idx, oob mask).

    The resample matrix carries PIL BILINEAR's exact weights
    (dataset_helpers/VOC.py:70 — ``transforms_f.resize(..., Image.BILINEAR)``):
    for output position o at source-space centre ``c_o = (rpos_o + 0.5)·v/r``,
    weight over source pixel j is ``tri((j + 0.5 - c_o)/fs)`` with
    ``fs = max(v/r, 1)`` — i.e. standard 2-tap bilinear when upscaling and
    the area-weighted antialiasing triangle when downscaling — masked to the
    valid extent and renormalized per row, exactly PIL's boundary handling.
    Reflection padding and cropping compose into the same matrix through
    ``rpos``."""
    v = valid.astype(jnp.float32)
    r = jnp.maximum(jnp.floor(v * ratio), 1.0)          # resized extent
    p = jnp.maximum(r, crop)                            # padded extent
    off = jnp.floor(u_off * (p - crop + 1.0))
    pos = jnp.arange(out_size, dtype=jnp.float32) + off  # padded coords
    oob = pos >= r
    rpos = _reflect_index(pos, r)
    scale = v / r                                        # source / resized
    fs = jnp.maximum(scale, 1.0)                         # PIL filterscale
    centre = (rpos + 0.5) * scale                        # source-space
    j = jnp.arange(in_size, dtype=jnp.float32)
    x = (j[None, :] + 0.5 - centre[:, None]) / fs
    mat = jnp.maximum(0.0, 1.0 - jnp.abs(x))             # triangle filter
    mat = jnp.where(j[None, :] < v, mat, 0.0)            # clamp to valid
    mat = mat / jnp.maximum(mat.sum(axis=1, keepdims=True), 1e-12)
    near = jnp.clip(jnp.floor((rpos + 0.5) * scale), 0.0, v - 1.0).astype(jnp.int32)
    return mat, near, oob


_PB = 22  # PIL resample.c PRECISION_BITS for 8-bit channels


def _fixed_point_resample(img255, mat_x, mat_y):
    """PIL's 8bpc fixed-point resample, bit-faithful: horizontal pass first
    (as ImagingResampleInner orders them), coefficients
    ``k = floor(w * 2^22 + 0.5)`` (normalize_coeffs_8bpc; weights are >= 0
    so half-away == half-up), accumulator seeded with 2^21, ``>> 22``,
    clip8 — each pass emits a uint8 image (verified exact vs PIL.resize on
    1-D probes at up/down/identity ratios).

    2^22-scale products overflow f32's 24-bit exact-integer range, so each
    coefficient matrix is split ``k = k_hi * 2^11 + k_lo`` and contracted
    twice; both partial sums stay < 2^24 (exact on the MXU's f32
    accumulation) and recombine in int32.  Residual vs PIL: our triangle
    weights are computed in f32 in-jit vs PIL's doubles, so ``k`` can sit
    one unit off PIL's at rounding boundaries — measured rare 1/255
    differences, calibrated in the differential suite."""
    def one_pass(mat, img, spec):
        k = jnp.floor(mat * float(1 << _PB) + 0.5)
        k_hi = jnp.floor(k / 2048.0)
        k_lo = k - k_hi * 2048.0
        s_hi = jnp.einsum(spec, k_hi, img, preferred_element_type=jnp.float32)
        s_lo = jnp.einsum(spec, k_lo, img, preferred_element_type=jnp.float32)
        s = s_hi.astype(jnp.int32) * 2048 + s_lo.astype(jnp.int32)
        out = (s + (1 << (_PB - 1))) // (1 << _PB)
        return jnp.clip(out, 0, 255).astype(jnp.float32)

    rows = one_pass(mat_x, img255, "pw,chw->chp")      # [3, H, cw]
    return one_pass(mat_y, rows, "oh,chp->cop")        # [3, ch, cw]


def apply_geometric(
    image: jax.Array,          # [3, H, W] float in [0,1]
    labels: jax.Array,         # [K, H, W] int32 (-1 = ignore)
    confs: jax.Array,          # [L, H, W] float confidence maps
    valid_hw: jax.Array,       # [2] int32 valid region of the canvas
    crop_hw: Tuple[int, int],
    ratio: jax.Array,          # scalar scale ratio
    u_y: jax.Array,            # uniform [0,1) crop-offset draws per axis
    u_x: jax.Array,
    quantize: bool = False,
):
    """Deterministic scale->pad(reflect)->crop given explicit parameters.

    Factored out of :func:`geometric_transform` so the differential fidelity
    suite can force the exact (ratio, crop offset) drawn by the reference's
    ``transform`` (VOC.py:64-92) and compare outputs pixel-for-pixel.

    ``quantize=True`` reproduces the reference's uint8 round trip: the
    ``tensor_to_pil*`` entry hop truncates images AND confidence maps to the
    uint8 grid (VOC.py:276-293 — so even the teacher's softmax confidences
    are 1/255-quantized before every threshold comparison), and PIL's
    BILINEAR resize rounds its output back to uint8.  Labels ride nearest
    sampling and are unaffected; nearest-sampled confidences stay on-grid
    by construction.
    """
    ch, cw = crop_hw
    h, w = image.shape[1], image.shape[2]
    if quantize:
        image = q8_entry_image(image)   # normalize/denormalize round trip
        confs = q8_floor(confs)         # logits hop: plain truncation
    mat_y, ynear, y_oob = _axis_maps(u_y, ch, h, valid_hw[0], ratio, ch)
    mat_x, xnear, x_oob = _axis_maps(u_x, cw, w, valid_hw[1], ratio, cw)

    # Separable resampling as two matmuls on the MXU: the per-image dense
    # interpolation matrices A [ch, H] / B [cw, W] carry the exact PIL
    # triangle weights (antialiasing included) at the same matmul cost as
    # 2-tap bilinear.  bf16 operands with f32 accumulation — at least the
    # precision of the reference's uint8 PIL pipeline, and orders of
    # magnitude faster than per-pixel gathers on TPU.
    if quantize:
        out_img = _fixed_point_resample(
            jnp.floor(image * 255.0 + 0.5), mat_x, mat_y) / 255.0
    else:
        img_b = image.astype(jnp.bfloat16)
        rows = jnp.einsum("oh,chw->cow", mat_y.astype(jnp.bfloat16), img_b,
                          preferred_element_type=jnp.float32)    # [3, ch, W]
        out_img = jnp.einsum("pw,cow->cop", mat_x.astype(jnp.bfloat16),
                             rows.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)  # [3, ch, cw]

    # Nearest resampling for labels/confidences via exact one-hot selection
    # matmuls (f32: a single 1.0 per row selects exactly, so integer labels
    # survive bit-exact); gathers with traced indices are ~100x slower here.
    in_pad = y_oob[:, None] | x_oob[None, :]
    sel_y = jax.nn.one_hot(ynear, h, dtype=jnp.float32)          # [ch, H]
    sel_x = jax.nn.one_hot(xnear, w, dtype=jnp.float32)          # [cw, W]
    stacked = jnp.concatenate([labels.astype(jnp.float32), confs], axis=0)
    picked = jnp.einsum("oh,khw->kow", sel_y, stacked,
                        preferred_element_type=jnp.float32)
    picked = jnp.einsum("pw,kow->kop", sel_x, picked,
                        preferred_element_type=jnp.float32)
    k = labels.shape[0]
    out_labels = jnp.round(picked[:k]).astype(labels.dtype)
    out_labels = jnp.where(in_pad[None], -1, out_labels)
    out_confs = picked[k:]
    out_confs = jnp.where(in_pad[None], 0.0, out_confs)
    return out_img, out_labels, out_confs


def geometric_transform(
    rng: jax.Array,
    image: jax.Array,          # [3, H, W] float in [0,1]
    labels: jax.Array,         # [K, H, W] int32 (-1 = ignore)
    confs: jax.Array,          # [L, H, W] float confidence maps
    valid_hw: jax.Array,       # [2] int32 valid region of the canvas
    crop_hw: Tuple[int, int],
    scale_range: Tuple[float, float],
    augmentation: bool,
    quantize: bool = False,
):
    """One image through scale->pad->crop->(photo, flip); channel-first."""
    k_scale, k_i, k_j, k_photo, k_flip = jax.random.split(rng, 5)
    ratio = jax.random.uniform(k_scale, minval=scale_range[0], maxval=scale_range[1])
    out_img, out_labels, out_confs = apply_geometric(
        image, labels, confs, valid_hw, crop_hw, ratio,
        jax.random.uniform(k_i), jax.random.uniform(k_j),
        quantize=quantize,
    )

    if augmentation:
        out_img = random_photometric(k_photo, out_img, quantize=quantize)
        do_flip = jax.random.uniform(k_flip) > 0.5
        out_img = jnp.where(do_flip, out_img[:, :, ::-1], out_img)
        out_labels = jnp.where(do_flip, out_labels[:, :, ::-1], out_labels)
        out_confs = jnp.where(do_flip, out_confs[:, :, ::-1], out_confs)

    return out_img, out_labels, out_confs


@functools.partial(
    jax.jit,
    static_argnames=("crop_hw", "scale_range", "augmentation", "quantize"),
)
def batch_transform(
    rng: jax.Array,
    images: jax.Array,          # [B, 3, H, W] float [0,1] (channel-first!)
    labels: jax.Array,          # [B, K, H, W] int32
    confs: jax.Array,           # [B, L, H, W] float
    valid_hw: jax.Array,        # [B, 2] int32
    crop_hw: Tuple[int, int],
    scale_range: Tuple[float, float],
    augmentation: bool,
    quantize: bool = False,
):
    """Vmapped batch version of :func:`geometric_transform`.

    Mirrors ``batch_transform``/``_2``/``_3`` (VOC.py:312-352): pass K=1/1/2
    label maps and L=1/2/2 confidence maps.  ``quantize=True`` adds the
    reference's uint8 round-trip law at every PIL hop (opt-in fidelity mode;
    see :func:`apply_geometric`).
    """
    keys = jax.random.split(rng, images.shape[0])
    fn = functools.partial(
        geometric_transform,
        crop_hw=crop_hw,
        scale_range=scale_range,
        augmentation=augmentation,
        quantize=quantize,
    )
    return jax.vmap(fn)(keys, images, labels, confs, valid_hw)
