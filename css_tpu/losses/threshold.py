"""Confidence-weighted unsupervised CE (the reference's
``Attention_Threshold_Loss``, loss/loss.py:48-64).

Per image: ``weight = (#pixels with teacher confidence >= threshold) /
(#pixels with a valid pseudo-label)``.  The per-pixel CE against pseudo-labels
(ignore -1) is scaled by the image weight and averaged over strictly-positive
loss entries.

Divergence from the reference, by design: when an image has zero valid
pseudo-label pixels the reference produces NaN (0/0, noted in its own comment)
and poisons the step; here the weight is defined as 0 for such images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from css_tpu.losses.cross_entropy import per_pixel_cross_entropy

__all__ = ["attention_threshold_loss"]


def attention_threshold_loss(
    logits: jax.Array,      # [B, H, W, C] student predictions
    pseudo_labels: jax.Array,  # [B, H, W] int, -1 = ignore
    confidence: jax.Array,  # [B, H, W] teacher max-softmax confidence
    strong_threshold: float = 0.97,
) -> jax.Array:
    b = logits.shape[0]
    valid = (pseudo_labels >= 0).reshape(b, -1).astype(jnp.float32)
    confident = (confidence >= strong_threshold).reshape(b, -1).astype(jnp.float32)
    denom = valid.sum(-1)
    weight = jnp.where(denom > 0, confident.sum(-1) / jnp.maximum(denom, 1.0), 0.0)

    nll = per_pixel_cross_entropy(logits, pseudo_labels)
    pos = (nll > 0).astype(jnp.float32)
    weighted = weight[:, None, None] * nll
    total_pos = pos.sum()
    return jnp.where(total_pos > 0, (weighted * pos).sum() / jnp.maximum(total_pos, 1.0), 0.0)
