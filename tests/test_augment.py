"""Tests for the device-resident geometric/photometric augmentation.

Layout note: the augmentation pipeline is channel-first ([B, 3, H, W]) for
TPU lane efficiency, which also matches torch's native layout for goldens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from css_tpu.ops.augment import batch_transform, denormalize_imagenet, normalize_imagenet
from css_tpu.ops.photometric import _hsv_to_rgb, _rgb_to_hsv, gaussian_blur


def _case(seed, b=2, h=64, w=64):
    rng = np.random.default_rng(seed)
    img = rng.random((b, 3, h, w), dtype=np.float32)
    lab = rng.integers(-1, 21, size=(b, 1, h, w)).astype(np.int32)
    conf = rng.random((b, 1, h, w), dtype=np.float32)
    vhw = np.full((b, 2), h, np.int32)
    return img, lab, conf, vhw


def test_identity_geometry():
    """scale (1,1), crop == canvas, no augmentation -> exact passthrough."""
    img, lab, conf, vhw = _case(0)
    oi, ol, oc = batch_transform(
        jax.random.key(0), jnp.asarray(img), jnp.asarray(lab), jnp.asarray(conf),
        jnp.asarray(vhw), crop_hw=(64, 64), scale_range=(1.0, 1.0),
        augmentation=False,
    )
    # image resampling is bf16 on the MXU: ~uint8-level quantization, on par
    # with the reference's uint8 PIL round trip
    np.testing.assert_allclose(np.asarray(oi), img, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(ol), lab)
    np.testing.assert_allclose(np.asarray(oc), conf, atol=1e-6)


def test_downscale_pad_matches_torch_bilinear_and_pil_nearest():
    """scale exactly 0.5 with crop == canvas forces offset 0: the output is
    the resized content at the top-left plus reflect/ignore padding."""
    img, lab, conf, vhw = _case(1, b=1)
    oi, ol, oc = batch_transform(
        jax.random.key(3), jnp.asarray(img), jnp.asarray(lab), jnp.asarray(conf),
        jnp.asarray(vhw), crop_hw=(64, 64), scale_range=(0.5, 0.5),
        augmentation=False,
    )
    oi, ol, oc = np.asarray(oi), np.asarray(ol), np.asarray(oc)

    # antialias=True: torch's antialiased bilinear implements the same
    # PIL triangle-filter law our interpolation matrices carry on downscale
    want = F.interpolate(
        torch.from_numpy(img), size=(32, 32),
        mode="bilinear", align_corners=False, antialias=True,
    ).numpy()
    np.testing.assert_allclose(oi[:, :, :32, :32], want, atol=1e-2)

    # nearest labels with PIL's half-pixel convention: src = floor((i+.5)*2)
    idx = np.floor((np.arange(32) + 0.5) * 2).astype(int)
    np.testing.assert_array_equal(ol[0, 0, :32, :32], lab[0, 0][np.ix_(idx, idx)])

    # padding: labels -1, confidences 0, image reflect (row 32 == row 30)
    assert (ol[0, 0, 32:, :] == -1).all() and (ol[0, 0, :, 32:] == -1).all()
    assert (oc[0, 0, 32:, :] == 0).all()
    np.testing.assert_allclose(oi[0, :, 32, :32], oi[0, :, 30, :32], atol=1e-6)
    np.testing.assert_allclose(oi[0, :, 33, :32], oi[0, :, 29, :32], atol=1e-6)


def test_upscale_crop_shapes_and_validity():
    img, lab, conf, vhw = _case(2)
    oi, ol, oc = batch_transform(
        jax.random.key(7), jnp.asarray(img), jnp.asarray(lab), jnp.asarray(conf),
        jnp.asarray(vhw), crop_hw=(48, 48), scale_range=(1.2, 1.5),
        augmentation=True,
    )
    assert oi.shape == (2, 3, 48, 48) and ol.shape == (2, 1, 48, 48)
    assert np.isfinite(np.asarray(oi)).all()
    assert (np.asarray(ol) >= -1).all() and (np.asarray(ol) < 21).all()
    assert np.asarray(oi).min() >= -1e-6 and np.asarray(oi).max() <= 1 + 1e-6


def test_hsv_round_trip():
    rng = np.random.default_rng(3)
    img = rng.random((3, 16, 16)).astype(np.float32)
    back = np.asarray(_hsv_to_rgb(_rgb_to_hsv(jnp.asarray(img))))
    np.testing.assert_allclose(back, img, atol=1e-5)


def test_gaussian_blur_properties():
    rng = np.random.default_rng(4)
    img = rng.random((3, 32, 32)).astype(np.float32)
    out = np.asarray(gaussian_blur(jnp.asarray(img), jnp.float32(1.0)))
    assert out.std() < img.std()          # smoothing
    const = np.asarray(gaussian_blur(jnp.full((3, 8, 8), 0.7, np.float32),
                                     jnp.float32(1.0)))
    np.testing.assert_allclose(const, 0.7, atol=1e-5)  # normalized + edge pad


def test_normalize_round_trip():
    rng = np.random.default_rng(5)
    nhwc = rng.random((4, 8, 8, 3)).astype(np.float32)
    back = np.asarray(denormalize_imagenet(normalize_imagenet(jnp.asarray(nhwc))))
    np.testing.assert_allclose(back, nhwc, atol=1e-5)
    cf = rng.random((4, 3, 8, 8)).astype(np.float32)
    back = np.asarray(denormalize_imagenet(
        normalize_imagenet(jnp.asarray(cf), channel_axis=-3), channel_axis=-3))
    np.testing.assert_allclose(back, cf, atol=1e-5)


def test_quantized_batch_transform_stays_on_uint8_grid():
    """aug_quantize mode: every emitted image pixel must sit on the k/255
    grid (each hop of the reference's PIL chain emits a uint8 image), with
    the full photometric block live; labels/confs keep their semantics."""
    from css_tpu.ops.augment import batch_transform

    rng = np.random.default_rng(0)
    b, h, w = 2, 40, 48
    images = jnp.asarray(
        rng.integers(0, 256, size=(b, 3, h, w)).astype(np.float32) / 255.0)
    labels = jnp.asarray(rng.integers(-1, 21, size=(b, 1, h, w)).astype(np.int32))
    confs = jnp.asarray(rng.random((b, 2, h, w)).astype(np.float32))
    valid = jnp.asarray(np.tile([h, w], (b, 1)).astype(np.int32))

    out_img, out_lab, out_conf = batch_transform(
        jax.random.key(3), images, labels, confs, valid,
        crop_hw=(32, 32), scale_range=(0.7, 1.3), augmentation=True,
        quantize=True)

    scaled = np.asarray(out_img) * 255.0
    np.testing.assert_allclose(scaled, np.round(scaled), atol=1e-3)
    assert np.asarray(out_lab).min() >= -1 and np.asarray(out_lab).max() < 21
    # confidences were truncated to the uint8 grid at entry
    cs = np.asarray(out_conf) * 255.0
    np.testing.assert_allclose(cs, np.round(cs), atol=1e-3)
    # and quantize=False on the same inputs differs at most by quantization
    f_img, _, _ = batch_transform(
        jax.random.key(3), images, labels, confs, valid,
        crop_hw=(32, 32), scale_range=(0.7, 1.3), augmentation=True,
        quantize=False)
    assert np.abs(np.asarray(f_img) - np.asarray(out_img)).max() < 0.08
