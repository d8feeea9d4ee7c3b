"""Cross-entropy losses with ignore-index semantics (NHWC logits).

Covers the reference's supervised losses:

* plain CE with ignore_index=-1 (``nn.CrossEntropyLoss(ignore_index=-1)``,
  ori_pseudo.py:80) — mean over valid pixels;
* OHEM CE (``ProbOhemCrossEntropy2d``, loss/loss.py:8-46) — keep the
  ``min_kept`` least-confident valid pixels (or all below ``thresh``), ignore
  the rest; used for Cityscapes (ori_pseudo.py:79,164-167).

Both are fixed-shape: OHEM's "kth smallest probability" is computed exactly
without sorting OR boolean indexing — a 31-step bisection over the float32
bit space (monotonic for non-negative floats), i.e. 31 streaming
compare-and-count reductions over the confidence map.  On v5e the full XLA
sort of the 769^2 recipe's 2.37M confidences measures 1.7 ms vs 1.3 ms for
the bisection, and the whole OHEM loss+grad drops 0.3 ms/step — a real but
small lever; kept because it is exact, never slower, and its 31 fixed
passes scale O(N) rather than O(N log N) with crop area
(tools/profile_ohem.py, docs/perf_round4.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy", "kth_smallest_nonneg", "ohem_cross_entropy",
           "per_pixel_cross_entropy"]


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


def kth_smallest_nonneg(flat: jax.Array, k: int) -> jax.Array:
    """Exact k-th smallest (1-based, duplicates counted) of a 1-D array of
    NON-NEGATIVE float32 values.

    For x >= 0 the int32 bit pattern of float32 is monotonic in x, so the
    k-th order statistic is found by bisecting the bit space: 31 iterations
    of "count elements <= mid", each a single fused compare-and-sum pass
    over the array.  For OHEM's 2.37M-element confidence map this replaces
    the full 2.37M sort (the round-3 verdict's named Cityscapes lever) with
    31 streaming reductions that XLA keeps entirely in vector registers.
    """
    assert flat.ndim == 1
    bits = jax.lax.bitcast_convert_type(flat.astype(jnp.float32), jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        # invariant: count(bits <= lo) < k <= count(bits <= hi)
        # lo + (hi-lo)//2, not (lo+hi)//2: the plain sum overflows int32
        # once lo crosses ~2e-38's bit pattern while hi is still at f32-max
        # (only reachable with inputs > ~1.5, but this is an exported helper)
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((bits <= mid).astype(jnp.int32))
        take_low = cnt >= k
        return (jnp.where(take_low, lo, mid),
                jnp.where(take_low, mid, hi))

    lo0 = jnp.int32(-1)
    hi0 = jnp.int32(0x7F7FFFFF)  # f32 max; probabilities top out at 1.0
    lo, hi = jax.lax.fori_loop(0, 31, body, (lo0, hi0))
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def ohem_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    thresh: float = 0.7,
    min_kept: int = 200000,
    _kth: str = "bisect",
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
    # _kth="sort" keeps the round-3 full-sort formulation selectable for the
    # on-chip A/B in tools/profile_ohem.py; both are exact
    kth = (jnp.sort(flat)[k - 1] if _kth == "sort"
           else kth_smallest_nonneg(flat, k))
    keep_thresh = jnp.maximum(kth, thresh)
    # min_kept > num_valid -> no confidence filtering (keep everything valid)
    keep_thresh = jnp.where(min_kept > num_valid, jnp.inf, keep_thresh)

    kept = valid & (target_prob <= keep_thresh)
    nll = per_pixel_cross_entropy(logits, jnp.where(kept, labels, -1))
    denom = jnp.maximum(kept.sum(), 1)
    return nll.sum() / denom
