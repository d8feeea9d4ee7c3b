"""Cross-entropy losses with ignore-index semantics (NHWC logits).

Covers the reference's supervised losses:

* plain CE with ignore_index=-1 (``nn.CrossEntropyLoss(ignore_index=-1)``,
  ori_pseudo.py:80) — mean over valid pixels;
* OHEM CE (``ProbOhemCrossEntropy2d``, loss/loss.py:8-46) — keep the
  ``min_kept`` least-confident valid pixels (or all below ``thresh``), ignore
  the rest; used for Cityscapes (ori_pseudo.py:79,164-167).

Both are fixed-shape: OHEM's "kth smallest probability" is computed with a
full sort over the flattened confidence map instead of boolean indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy", "ohem_cross_entropy", "per_pixel_cross_entropy"]


def per_pixel_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-pixel CE; entries with label < 0 are returned as 0.

    logits: [..., C] float; labels: [...] int (-1 = ignore).

    The label logit is selected with a one-hot multiply-reduce rather than
    ``take_along_axis``: per-element gathers over a [B,H,W,C] map cost tens
    of milliseconds on TPU, the one-hot contraction fuses into the softmax.
    """
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    return jnp.where(valid, nll, 0.0)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over valid (label >= 0) pixels; 0 if nothing is valid."""
    valid = (labels >= 0).astype(jnp.float32)
    nll = per_pixel_cross_entropy(logits, labels)
    denom = jnp.maximum(valid.sum(), 1.0)
    return nll.sum() / denom


def ohem_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    thresh: float = 0.7,
    min_kept: int = 200000,
) -> jax.Array:
    """Online hard-example-mining CE.

    Semantics match the reference (loss/loss.py:19-46): among valid pixels,
    find the ``min_kept``-th smallest target-class probability (invalid pixels
    count as prob 1.0 in the ranking); the keep-threshold is
    ``max(thresh, kth)``; pixels with target-prob > threshold are ignored.
    When ``min_kept`` exceeds the number of valid pixels, all valid pixels are
    kept (the reference's "print Labels" branch).
    """
    labels = labels.astype(jnp.int32)
    valid = labels >= 0
    num_valid = valid.sum()

    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.where(valid, labels, 0)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=prob.dtype)
    target_prob = jnp.sum(prob * onehot, axis=-1)
    target_prob = jnp.where(valid, target_prob, 1.0)

    flat = target_prob.reshape(-1)
    k = min(int(min_kept), flat.shape[0])
    kth = jnp.sort(flat)[k - 1]
    keep_thresh = jnp.maximum(kth, thresh)
    # min_kept > num_valid -> no confidence filtering (keep everything valid)
    keep_thresh = jnp.where(min_kept > num_valid, jnp.inf, keep_thresh)

    kept = valid & (target_prob <= keep_thresh)
    nll = per_pixel_cross_entropy(logits, jnp.where(kept, labels, -1))
    denom = jnp.maximum(kept.sum(), 1)
    return nll.sum() / denom
