"""Differential: pil_gaussian_blur vs PIL's actual GaussianBlur.

The reference blurs augmented images with
``image.filter(ImageFilter.GaussianBlur(radius=sigma))``, sigma ~ U(0.15,
1.15) (dataset_helpers/VOC.py:100-103).  Pillow's GaussianBlur is NOT a
Gaussian: it is three sequential fractional box blurs per axis.  The
per-pass radius law ``q = sigma^2/(6 - 2 sigma^2)`` was recovered by
least-squares kernel identification against Pillow 12.1 (fit residual below
uint8 quantization at every probed sigma) and is variance matching: a
fractional box [q, 1, q]/(2q+1) has variance 2q/(2q+1) = sigma^2/3.

These tests pin that law end-to-end: our float implementation must match
PIL on real uint8 images within PIL's own rounding noise (PIL quantizes to
uint8 after each of the 6 passes, so up to ~3/255 of accumulated rounding
is PIL-side, not ours).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
from PIL import Image, ImageFilter

from css_tpu.ops.photometric import pil_gaussian_blur

SIGMAS = [0.15, 0.35, 0.5, 0.65, 0.8, 0.95, 1.0, 1.15]


def _pil_blur_rgb(img_u8, sigma):
    out = Image.fromarray(img_u8).filter(ImageFilter.GaussianBlur(radius=sigma))
    return np.asarray(out, np.float64) / 255.0


@pytest.mark.parametrize("sigma", SIGMAS)
def test_blur_matches_pil_on_images(sigma):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    ref = _pil_blur_rgb(img, sigma).transpose(2, 0, 1)
    ours = np.asarray(
        pil_gaussian_blur(jnp.asarray(img.transpose(2, 0, 1).astype(np.float32) / 255.0),
                          jnp.float32(sigma)))
    err = np.abs(ref - ours).max()
    # residual = PIL per-pass uint8 rounding (6 passes x 0.5 step worst case)
    assert err < 3.5 / 255.0, (sigma, err * 255.0)


@pytest.mark.parametrize("sigma", [0.15, 0.6, 1.15])
def test_blur_edges_match_pil(sigma):
    """Per-pass edge-clamp semantics: check the border pixels specifically
    (a composed-kernel implementation with clamped taps would differ here)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    ref = _pil_blur_rgb(img, sigma).transpose(2, 0, 1)
    ours = np.asarray(
        pil_gaussian_blur(jnp.asarray(img.transpose(2, 0, 1).astype(np.float32) / 255.0),
                          jnp.float32(sigma)))
    border = np.ones((16, 16), bool)
    border[3:-3, 3:-3] = False
    err = np.abs(ref - ours)[:, border].max()
    assert err < 3.5 / 255.0, (sigma, err * 255.0)


def test_blur_mass_and_constant():
    const = jnp.full((3, 12, 12), 0.62, jnp.float32)
    out = np.asarray(pil_gaussian_blur(const, jnp.float32(0.9)))
    np.testing.assert_allclose(out, 0.62, atol=1e-6)

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((3, 20, 20), np.float32))
    out = np.asarray(pil_gaussian_blur(img, jnp.float32(1.1)))
    # interior mass is redistributed, global bounds preserved
    assert out.min() >= float(img.min()) - 1e-6
    assert out.max() <= float(img.max()) + 1e-6


def test_blur_variance_law():
    """The fitted law is exact variance matching: the impulse response's
    second moment equals sigma^2 per axis (interior, away from edges)."""
    for sigma in SIGMAS:
        n = 33
        imp = np.zeros((3, n, n), np.float32)
        imp[:, n // 2, n // 2] = 1.0
        out = np.asarray(pil_gaussian_blur(jnp.asarray(imp), jnp.float32(sigma)))[0]
        xs = np.arange(n) - n // 2
        row = out.sum(axis=0)  # marginal over y -> horizontal kernel
        var = (row * xs ** 2).sum() / row.sum()
        np.testing.assert_allclose(var, sigma ** 2, rtol=1e-4)


@pytest.mark.parametrize("sigma", SIGMAS)
def test_blur_quantized_matches_pil(sigma):
    """quantize=True runs the bit-faithful integer emulation of PIL's box
    machinery (_pil_gaussian_blur_q8): pixel-exact up to the in-jit f32
    coefficient-rounding residual (~1e-4 of pixels, one uint8 step)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    ref = _pil_blur_rgb(img, sigma).transpose(2, 0, 1)
    ours = np.asarray(
        pil_gaussian_blur(jnp.asarray(img.transpose(2, 0, 1).astype(np.float32) / 255.0),
                          jnp.float32(sigma), quantize=True))
    err = np.abs(ref - ours)
    assert err.max() <= 1.0 / 255.0 + 1e-6, (sigma, err.max() * 255.0)
    assert np.mean(err < 1e-6) > 0.995, (sigma, np.mean(err < 1e-6))
