"""Label one-hot encodings with the reference's ignore-pixel semantics.

* ``label_onehot``  — clamps ignore (-1) to class 0 before encoding
  (reference generalframeworks/utils.py:116-125 applies ``relu`` to the
  labels; downstream the validity mask kills those pixels).
* ``label_onehot_ignore`` — encodes -1 as an all-zero row.  This matches the
  composite the reference builds with ``label_onehot_2`` (+1 shift into C+1
  channels, utils.py:127-136) followed by slicing off channel 0
  (mix_label.py:181-182).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["label_onehot", "label_onehot_ignore"]


def label_onehot(labels: jax.Array, num_classes: int) -> jax.Array:
    """[..., H, W] int labels -> [..., H, W, C] float; -1 maps to class 0."""
    return jax.nn.one_hot(jnp.maximum(labels, 0), num_classes, dtype=jnp.float32)


def label_onehot_ignore(labels: jax.Array, num_classes: int) -> jax.Array:
    """[..., H, W] int labels -> [..., H, W, C] float; label < 0 -> all-zero."""
    oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return jnp.where((labels >= 0)[..., None], oh, 0.0)
