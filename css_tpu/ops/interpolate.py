"""Resize ops with explicit coordinate conventions, built for the MXU.

The reference framework leans on ``F.interpolate`` with two conventions:

* ``mode='bilinear', align_corners=True``  — upsampling predictions back to
  input resolution and resizing ASPP features to the low-level feature size
  (reference: generalframeworks/networks/deeplabv3/deeplabv3.py:164,
  generalframeworks/networks/ddp_model.py:36).
* ``mode='nearest'`` — downsampling one-hot label / mask maps to the
  representation resolution (reference: ori_pseudo.py:174-177).

Instead of gather-based sampling we express separable bilinear interpolation
as two dense matrix multiplies, ``out = A_h @ x @ A_w^T``.  The interpolation
matrices are tiny ([out, in]) compile-time constants, and the contraction maps
straight onto the TPU MXU, fusing with neighbouring ops under XLA.  Nearest
resize is a gather with precomputed static indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "bilinear_resize",
    "nearest_resize",
    "resize_like",
    "adaptive_avg_pool_1x1",
]


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] row-stochastic interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        # half-pixel convention (PyTorch align_corners=False / PIL-style)
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int, convention: str) -> np.ndarray:
    """Static source indices for nearest-neighbour resize.

    ``convention='torch'`` matches ``F.interpolate(mode='nearest')``
    (``src = floor(dst * in / out)``); ``convention='pil'`` matches PIL's
    ``Image.NEAREST`` (half-pixel centres).
    """
    if convention == "torch":
        idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    elif convention == "pil":
        idx = np.floor((np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size)
    else:
        raise ValueError(f"unknown nearest convention: {convention}")
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


def bilinear_resize(x: jax.Array, out_hw, align_corners: bool = True) -> jax.Array:
    """Bilinearly resize NHWC (or HWC / NHW) tensor to ``out_hw``.

    Matches ``F.interpolate(x, size=out_hw, mode='bilinear',
    align_corners=align_corners)`` up to float associativity.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    squeeze_batch = x.ndim == 3
    if squeeze_batch:
        x = x[None]
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze_batch else x
    mat_h = jnp.asarray(_bilinear_matrix(h, out_h, align_corners))
    mat_w = jnp.asarray(_bilinear_matrix(w, out_w, align_corners))
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # [oh, h] @ [n, h, w, c] -> [n, oh, w, c]
    y = jnp.einsum("oh,nhwc->nowc", mat_h, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,nhwc->nhpc", mat_w, y, precision=jax.lax.Precision.HIGHEST)
    y = y.astype(orig_dtype)
    return y[0] if squeeze_batch else y


def nearest_resize(x: jax.Array, out_hw, convention: str = "torch") -> jax.Array:
    """Nearest-neighbour resize over the two spatial dims.

    Accepts NHWC, NHW or HW layouts; spatial dims are the last two for rank-2/3
    integer label maps, dims (1, 2) for rank-4 NHWC.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if x.ndim == 4:
        h_ax, w_ax = 1, 2
    elif x.ndim == 3:
        h_ax, w_ax = 1, 2
    elif x.ndim == 2:
        h_ax, w_ax = 0, 1
    else:
        raise ValueError(f"unsupported rank {x.ndim}")
    h, w = x.shape[h_ax], x.shape[w_ax]
    if (h, w) == (out_h, out_w):
        return x
    ih = jnp.asarray(_nearest_indices(h, out_h, convention))
    iw = jnp.asarray(_nearest_indices(w, out_w, convention))
    x = jnp.take(x, ih, axis=h_ax)
    x = jnp.take(x, iw, axis=w_ax)
    return x


def resize_like(x: jax.Array, ref: jax.Array, align_corners: bool = True) -> jax.Array:
    """Bilinear-resize NHWC ``x`` to the spatial dims of NHWC ``ref``."""
    return bilinear_resize(x, (ref.shape[1], ref.shape[2]), align_corners)


def adaptive_avg_pool_1x1(x: jax.Array) -> jax.Array:
    """Global average pool to 1x1 over NHWC, like ``AdaptiveAvgPool2d(1)``."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
