"""Batched photometric augmentation on device (color jitter + Gaussian blur).

Replaces the reference's per-image PIL operations
(dataset_helpers/VOC.py:94-103: ``ColorJitter((0.75,1.25),(0.75,1.25),
(0.75,1.25),(-0.25,0.25))`` with p=0.8, ``GaussianBlur(radius=sigma)`` with
p=0.5, sigma ~ U(0.15, 1.15)) with vectorized float ops on HBM-resident
tensors.  The four jitter ops are applied in a per-image random order, as
torchvision's ColorJitter does.

Layout is channel-first ([3, H, W]) so every elementwise op runs with the
image width on the TPU lane dimension (a [H, W, 3] layout would waste
125/128 lanes).

The blur matches PIL's actual algorithm (reverse-engineered from Pillow
12.1 impulse/least-squares probes, see tests/test_blur_law.py):
``ImageFilter.GaussianBlur(radius=sigma)`` is NOT a Gaussian — it is three
sequential fractional box blurs per axis with per-pass radius
``q = sigma^2 / (6 - 2 sigma^2)`` (variance matching: a fractional box
[q, 1, q]/(2q+1) has variance 2q/(2q+1) = sigma^2/3 per pass), edge-clamp
padding per pass.  :func:`pil_gaussian_blur` reproduces this law exactly in
float; the only residual vs PIL is PIL's own per-pass uint8 rounding
(measured <= 2.9/255 worst-case over sigma in [0.15, 1.15]).

Default computation is float (PIL quantizes to uint8 after every
enhancement step) — sub-quantization-level augmentation noise.  Passing
``quantize=True`` reproduces the reference's uint8 law: every hop that PIL
would round back to a uint8 image (each jitter sub-op, each box-blur pass)
snaps to the 1/255 grid with PIL's round-half-up, closing the last
documented aug-fidelity divergence (PARITY.md) as an opt-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["color_jitter", "gaussian_blur", "pil_gaussian_blur",
           "random_photometric", "q8_round", "q8_floor"]

_BLUR_RADIUS = 4  # supports sigma up to ~1.3 at 3-sigma truncation


def q8_round(x):
    """Snap [0,1] floats to the uint8 grid with PIL's rounding.

    PIL's fixed-point image ops (resample accumulation, Image.blend inside
    ImageEnhance, ImagingBoxBlur) all emit ``clip(floor(v + 0.5))`` on the
    0..255 scale — round half UP, not banker's rounding."""
    return jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5) / 255.0


def q8_floor(x):
    """``to_pil_image``'s float->uint8 hop: ``pic.mul(255).byte()`` TRUNCATES
    (dataset_helpers/VOC.py:276-293 tensor_to_pil* on images and confidence
    maps).  A tiny epsilon absorbs float32 representation error so values
    that are already k/255 survive the round trip losslessly (as torch's
    uint8-born tensors do); genuinely off-grid values — e.g. softmax
    confidences — truncate down, exactly the reference's quantization."""
    return jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0 + 2.0 ** -12) / 255.0


def q8_entry_image(x):
    """The reference's IMAGE entry hop, bit-faithful: its canvases live
    ImageNet-normalized, so ``tensor_to_pil`` runs ``denormalise`` —
    ``normalize(std=1/s)`` (a DIVISION by ``f32(1/s)``) then ``+ mean`` —
    before ``mul(255).byte()`` truncation (VOC.py:276-310).  The f32
    normalize/denormalize round trip lands a hair above or below ``k/255``
    depending only on (k, channel), so the truncation deterministically
    remaps some intensities k -> k-1.  Emulating the exact float chain
    (normalize happens channel-wise in the dataset, transforms' f32
    constants) reproduces that per-intensity map; ``q8_floor`` alone would
    keep k and diverge on ~half the on-grid intensities."""
    m = jnp.asarray(_IMAGENET_MEAN_F32, jnp.float32).reshape(3, 1, 1)
    s = jnp.asarray(_IMAGENET_STD_F32, jnp.float32).reshape(3, 1, 1)
    inv_s = jnp.asarray([1.0 / 0.229, 1.0 / 0.224, 1.0 / 0.225],
                        jnp.float32).reshape(3, 1, 1)
    y = (x - m) / s            # dataset-side transforms_f.normalize
    t = y / inv_s + m          # denormalise: divide by f32(1/s), add mean
    # mul(255).byte(): trunc toward zero; clip first (byte() would wrap)
    return jnp.floor(jnp.clip(t * 255.0, 0.0, 255.0)) / 255.0


_IMAGENET_MEAN_F32 = (0.485, 0.456, 0.406)
_IMAGENET_STD_F32 = (0.229, 0.224, 0.225)


def _rgb_to_grayscale(img):
    # itu-r 601-2 luma, as torchvision/PIL 'L'; img [3, H, W]
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype).reshape(3, 1, 1)
    return jnp.sum(img * w, axis=0, keepdims=True)


def _rgb_to_hsv(img):
    r, g, b = img[0], img[1], img[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v])


def _hsv_to_rgb(hsv):
    h, s, v = hsv[0], hsv[1], hsv[2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b])


def _pil_gray255(k255):
    """PIL RGB->'L' (itu-r 601-2) in its exact 16-bit fixed point:
    ``L24 = 19595 r + 38470 g + 7471 b + 0x8000 >> 16``.  Every product and
    the sum stay < 2^24, so plain f32 arithmetic is bit-exact."""
    r, g, b = k255[0], k255[1], k255[2]
    return jnp.floor(
        (19595.0 * r + 38470.0 * g + 7471.0 * b + 32768.0) / 65536.0)


def _pil_hue_shift255(k255, hue_factor):
    """torchvision's PIL-backend hue op, bit-faithful on the 0..255 grid.

    The op is ``img.convert('HSV')`` -> add ``uint8(hue_factor*255)`` to H
    with wraparound -> convert back.  PIL's rgb2hsv H channel follows the
    exact rational ``floor(255*h6 / (6*cr))`` with the scaled-by-cr hue
    numerator ``h6`` (verified empirically on 4M samples + full planes;
    residual: PIL's C float arithmetic drifts one H step on ~0.3% of
    pixels).  hsv2rgb is colorsys in f32 with round-half-up uint8 stores —
    measured bit-exact.  All intermediates are small exact integers in f32.
    """
    r, g, b = k255[0], k255[1], k255[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    cr = maxc - minc
    gray = cr == 0
    h6 = jnp.where(
        r == maxc, (maxc - b) - (maxc - g),
        jnp.where(g == maxc, 2.0 * cr + (maxc - r) - (maxc - b),
                  4.0 * cr + (maxc - g) - (maxc - r)))
    h6 = jnp.where(h6 < 0, h6 + 6.0 * cr, h6)
    crs = jnp.where(gray, 1.0, cr)
    hch = jnp.where(gray, 0.0, jnp.floor(h6 * 255.0 / (6.0 * crs)))
    sch = jnp.where(gray, 0.0, jnp.floor(255.0 * cr / jnp.maximum(maxc, 1.0)))
    # np.uint8(hue_factor*255): trunc toward zero, then mod-256 wraparound
    shift = jnp.mod(jnp.trunc(hue_factor * 255.0), 256.0)
    hch = jnp.mod(hch + shift, 256.0)

    hf = hch / 255.0
    i6 = jnp.floor(hf * 6.0)
    f = hf * 6.0 - i6
    sf = sch / 255.0
    v = maxc
    p = jnp.floor(v * (1.0 - sf) + 0.5)
    q = jnp.floor(v * (1.0 - sf * f) + 0.5)
    t = jnp.floor(v * (1.0 - sf * (1.0 - f)) + 0.5)
    im = i6.astype(jnp.int32) % 6
    sel = [im == 0, im == 1, im == 2, im == 3, im == 4, im == 5]
    rr = jnp.select(sel, [v, q, p, p, t, v])
    gg = jnp.select(sel, [t, v, v, q, p, p])
    bb = jnp.select(sel, [p, p, t, v, v, q])
    return jnp.stack([rr, gg, bb])


def _q8_brightness255(k, factor):
    """ImageEnhance.Brightness = Image.blend(black, img, f): Blend.c
    TRUNCATES ``in1 + alpha*(in2-in1)`` (no +0.5) — measured bit-exact."""
    return jnp.clip(jnp.floor(factor * k), 0.0, 255.0)


def _q8_contrast255(k, factor):
    """ImageEnhance.Contrast: blend against a flat gray at
    ``int(ImageStat(L).mean + 0.5)``; integer-exact mean via
    ``(2*sum + n) // (2n)``.  Measured bit-exact."""
    gl = _pil_gray255(k)
    n = gl.size
    total = jnp.sum(gl.astype(jnp.int32))
    mean = ((2 * total + n) // (2 * n)).astype(jnp.float32)
    return jnp.clip(jnp.floor(mean + factor * (k - mean)), 0.0, 255.0)


def _q8_saturation255(k, factor):
    """ImageEnhance.Color: blend against the fixed-point 'L' image.
    Measured bit-exact."""
    gl = _pil_gray255(k)[None]
    return jnp.clip(jnp.floor(gl + factor * (k - gl)), 0.0, 255.0)


def color_jitter(rng, img, brightness=(0.75, 1.25), contrast=(0.75, 1.25),
                 saturation=(0.75, 1.25), hue=(-0.25, 0.25), quantize=False):
    """Single image [3, H, W] in [0, 1]; random factors, random op order.

    ``quantize=True`` replaces the float sub-ops with the exact uint8 laws
    of the PIL chain the reference runs (ImageEnhance blends truncate —
    Blend.c has no +0.5 — on ints, the contrast mean is
    ``int(ImageStat.mean + 0.5)`` of the fixed-point 'L' image, hue is the
    integer-HSV round trip): brightness/contrast/saturation measured
    bit-exact vs PIL, hue exact on >99.7% of pixels (see
    :func:`_pil_hue_shift255`)."""
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(rng, 5)
    fb = jax.random.uniform(k_b, minval=brightness[0], maxval=brightness[1])
    fc = jax.random.uniform(k_c, minval=contrast[0], maxval=contrast[1])
    fs = jax.random.uniform(k_s, minval=saturation[0], maxval=saturation[1])
    fh = jax.random.uniform(k_h, minval=hue[0], maxval=hue[1])

    if quantize:
        # exact uint8 laws; each op enters and leaves on the 0..255 grid
        def do_brightness(x):
            return _q8_brightness255(jnp.floor(x * 255.0 + 0.5), fb) / 255.0

        def do_contrast(x):
            return _q8_contrast255(jnp.floor(x * 255.0 + 0.5), fc) / 255.0

        def do_saturation(x):
            return _q8_saturation255(jnp.floor(x * 255.0 + 0.5), fs) / 255.0

        def do_hue(x):
            return _pil_hue_shift255(jnp.floor(x * 255.0 + 0.5), fh) / 255.0
    else:
        def do_brightness(x):
            return jnp.clip(x * fb, 0.0, 1.0)

        def do_contrast(x):
            mean = jnp.mean(_rgb_to_grayscale(x))
            return jnp.clip(fc * x + (1.0 - fc) * mean, 0.0, 1.0)

        def do_saturation(x):
            gray = _rgb_to_grayscale(x)
            return jnp.clip(fs * x + (1.0 - fs) * gray, 0.0, 1.0)

        def do_hue(x):
            hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
            hsv = hsv.at[0].set((hsv[0] + fh) % 1.0)
            return _hsv_to_rgb(hsv)

    order = jax.random.permutation(k_perm, 4)

    def body(x, idx):
        x = jax.lax.switch(idx, [do_brightness, do_contrast, do_saturation, do_hue], x)
        return x, None

    img, _ = jax.lax.scan(body, img, order)
    return img


def _pil_gaussian_blur_q8(img, sigma):
    """Bit-faithful ``ImagingGaussianBlur`` on the uint8 grid.

    Reproduces PIL's integer box-blur machinery exactly (verified pixel-
    exact vs PIL.GaussianBlur on 200x300 uint8 images over 24 sigmas in
    [0.15, 1.15]):

    * per-pass radius from the Gwosdek extended-box formula in f32
      (BoxBlur.c ``_gaussian_blur_radius``, passes=3; the integer part is
      0 for the whole training range sigma < sqrt(2), which this helper
      assumes — its l=0 reduction is ``a = 3*sig2 / (6 - 6*sig2)`` with
      ``sig2 = sigma^2/3``, the same variance-matching law as the float
      path's q);
    * weights ``ww = round(2^24/(2r+1))``, ``fw = (2^24 - ww) // 2`` —
      the residual is split across the two edge taps, NOT scaled by the
      fractional radius;
    * six line passes (3 horizontal then 3 vertical), each emitting
      ``clip8((c*ww + (left+right)*fw + 2^23) >> 24)`` with edge-clamp
      padding.

    2^24-scale products overflow both f32's exact-integer range and int32,
    so the weights are split hi/lo by 2^12 and the shift is decomposed as
    ``(S_hi + (S_lo >> 12)) >> 12`` — exact, since the dropped low bits
    can never carry a value across a 2^24 boundary.  Residual vs PIL: the
    in-jit f32 division for ``ww`` can sit one unit off PIL's double
    (~1e-4 of pixels flip by 1/255 over 6 passes).

    Input/output [3, H, W] in [0, 1] on the uint8 grid; sigma traced.
    """
    sig2 = jnp.clip(sigma * sigma / 3.0, 1e-8, 0.666)   # l=0 regime
    # PIL's exact f32 expression order: a = (2l+1)*(l(l+1)-3*sig2),
    # a /= 6*(sig2 - (l+1)^2), l = 0
    r = (0.0 - 3.0 * sig2) / (6.0 * (sig2 - 1.0))
    d = r * 2.0 + 1.0
    # NOT floor(x + 0.5): quotients here sit in [2^23, 2^24) where f32
    # spacing is 1.0, so the correctly-rounded division IS the rounded
    # integer, while "+0.5" would tie-break upward to the next integer.
    ww = jnp.round(16777216.0 / d)
    fw = jnp.floor((16777216.0 - ww) / 2.0)
    ww_hi = jnp.floor(ww / 4096.0).astype(jnp.int32)
    ww_lo = ww.astype(jnp.int32) - ww_hi * 4096
    fw_hi = jnp.floor(fw / 4096.0).astype(jnp.int32)
    fw_lo = fw.astype(jnp.int32) - fw_hi * 4096

    def box_pass(x, axis):
        n = x.shape[axis]
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 1)
        p = jnp.pad(x, pad, mode="edge")
        lo = jax.lax.dynamic_slice_in_dim(p, 0, n, axis=axis)
        mid = jax.lax.dynamic_slice_in_dim(p, 1, n, axis=axis)
        hi = jax.lax.dynamic_slice_in_dim(p, 2, n, axis=axis)
        edges = lo + hi
        s_hi = mid * ww_hi + edges * fw_hi + 2048      # + 2^23 in hi units
        s_lo = mid * ww_lo + edges * fw_lo
        out = jnp.right_shift(s_hi + jnp.right_shift(s_lo, 12), 12)
        return jnp.clip(out, 0, 255)

    k = jnp.floor(img * 255.0 + 0.5).astype(jnp.int32)
    for _ in range(3):
        k = box_pass(k, 2)   # horizontal passes first, as PIL does
    for _ in range(3):
        k = box_pass(k, 1)
    return k.astype(img.dtype) / 255.0


def pil_gaussian_blur(img, sigma, quantize=False):
    """PIL-law blur of one [3, H, W] image: 3 fractional box passes per axis.

    ``quantize=True`` switches to :func:`_pil_gaussian_blur_q8`, the
    bit-faithful integer emulation of PIL's box machinery (the float law
    below matches PIL to <= 2.9/255; the integer path is pixel-exact up to
    a ~1e-4 coefficient-rounding residual).

    Matches ``PIL.ImageFilter.GaussianBlur(radius=sigma)``
    (reference usage: dataset_helpers/VOC.py:100-103): per-pass radius
    ``q = sigma^2/(6 - 2 sigma^2)`` so that three [q,1,q]/(2q+1) boxes carry
    the requested total variance sigma^2.  Valid for sigma < sqrt(2)
    (q < 1; past sigma = sqrt(3) the denominator even turns the kernel
    weights negative) — the reference draws sigma ~ U(0.15, 1.15), well
    inside, and ``sigma`` is clamped to the valid range so out-of-range
    callers get the strongest representable blur instead of a nonsense
    kernel.
    Edge-clamp padding is applied per pass, exactly as PIL's box blur does
    (this differs near borders from clamping a single composed 7-tap
    kernel).  ``sigma`` is a traced scalar.

    Cost: 6 passes x 3 taps = 18 shift-adds — the same as the previous
    radius-4 separable Gaussian (2 axes x 9 taps), with exact PIL fidelity.
    """
    if quantize:
        return _pil_gaussian_blur_q8(img, sigma)
    # clamp sigma^2 into (0, 2): the 3-pass law needs q < 1 (sigma < sqrt(2))
    sig2 = jnp.clip(jnp.square(sigma), 1e-8, 2.0)
    q = sig2 / (6.0 - 2.0 * sig2)
    a = q / (2.0 * q + 1.0)
    b = 1.0 / (2.0 * q + 1.0)

    def box_pass(x, axis):
        n = x.shape[axis]
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 1)
        p = jnp.pad(x, pad, mode="edge")
        lo = jax.lax.dynamic_slice_in_dim(p, 0, n, axis=axis)
        mid = jax.lax.dynamic_slice_in_dim(p, 1, n, axis=axis)
        hi = jax.lax.dynamic_slice_in_dim(p, 2, n, axis=axis)
        return a * (lo + hi) + b * mid

    for _ in range(3):
        img = box_pass(img, 2)   # horizontal passes first, as PIL does
    for _ in range(3):
        img = box_pass(img, 1)
    return img


def gaussian_blur(img, sigma):
    """Separable exact-Gaussian blur of one [3, H, W] image; edge-replicate
    pad.  Kept for callers that want a true Gaussian; the training pipeline
    uses :func:`pil_gaussian_blur` (the reference's actual filter law).

    ``sigma`` is a traced scalar; taps are computed from it per image.  With
    sigma -> 0 the kernel degenerates to identity.
    """
    r = _BLUR_RADIUS
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-4)
    w = jnp.exp(-(offs ** 2) / (2.0 * sig * sig))
    w = w / jnp.sum(w)
    h, wd = img.shape[1], img.shape[2]
    padded = jnp.pad(img, ((0, 0), (r, r), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for k in range(2 * r + 1):
        out = out + w[k] * jax.lax.dynamic_slice_in_dim(padded, k, h, axis=1)
    padded = jnp.pad(out, ((0, 0), (0, 0), (r, r)), mode="edge")
    out = jnp.zeros_like(img)
    for k in range(2 * r + 1):
        out = out + w[k] * jax.lax.dynamic_slice_in_dim(padded, k, wd, axis=2)
    return out


def random_photometric(rng, img, quantize=False):
    """Reference augmentation block (VOC.py:94-103): jitter (p=.8) then
    blur (p=.5, sigma ~ U(.15, 1.15)).  Flip is handled in the geometric
    transform.  Single image [3, H, W] in [0, 1]."""
    k_dj, k_j, k_db, k_sig = jax.random.split(rng, 4)
    do_jitter = jax.random.uniform(k_dj) > 0.2
    jittered = color_jitter(k_j, img, quantize=quantize)
    img = jnp.where(do_jitter, jittered, img)
    do_blur = jax.random.uniform(k_db) > 0.5
    sigma = jax.random.uniform(k_sig, minval=0.15, maxval=1.15)
    blurred = pil_gaussian_blur(img, sigma, quantize=quantize)
    return jnp.where(do_blur, blurred, img)
