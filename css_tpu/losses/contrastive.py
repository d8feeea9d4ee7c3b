"""Pixel-prototype contrastive loss, fixed-shape and TPU-native.

Re-designs the reference ``Contrast_Loss`` (loss/loss.py:66-149) — the
framework's core novelty — without any dynamic shapes, host synchronization,
or hidden state:

reference semantics (per training step, per class c):
  * valid pixels   = one-hot(label) * mask                    (loss.py:80)
  * prototype EMA  = alpha * proto_c + (1-alpha) * mean(cross-replica reps
                     of class c); first touch initializes     (loss.py:101-109)
  * hard anchors   = valid pixels with prob_c < strong_threshold (:94-99)
  * 256 anchors sampled uniformly with replacement            (:127-128)
  * 512 negatives/anchor: class ~ softmax(cos(proto_c, proto_other)/temp)
    over the *other locally-valid* classes, then a uniform valid pixel of
    that class                                                (:131-142)
  * InfoNCE with the own prototype as the positive            (:143-147)
  * sum over classes with >=1 hard anchor, divided by the number of
    locally-valid classes; 0 if fewer than 2 classes valid    (:116-121,149)

TPU-native re-design:
  * prototype statistics are per-class sums + counts computed by a one-hot
    matmul on the MXU and combined across the mesh with ``psum`` —
    O(C*D) bytes on the interconnect instead of the reference's all-gather
    of the full [world*B, D, h, w] representation tensor (ddp_model.py:241-250);
  * "uniform pixel of class c" becomes: sort pixel ids once by
    (class, random) to get a per-class contiguous random ordering, then
    index ``order[offset[c] + floor(u * count_c)]`` — fixed shapes, two
    XLA sorts per step, exact uniform-with-replacement sampling;
  * negative-class sampling is inverse-CDF over the prototype-similarity
    softmax (no [*, C] logits materialization);
  * prototypes are explicit functional state: the loss returns
    ``(loss, new_prototypes)`` instead of mutating a global tensor, which
    removes the reference's cross-rank prototype divergence hazard (a rank
    with zero local pixels of class c skips the EMA update other ranks
    apply — loss.py:96-97; here the update is driven by the *global* count
    and therefore identical on every device).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["prototype_contrastive_loss", "update_prototypes"]


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))


def _grouped_random_order(cls_id, member, tie_rng, num_classes):
    """Random per-class ordering of pixel ids.

    Returns ``(order [N], counts [C], offsets [C])`` such that
    ``order[offsets[c] : offsets[c] + counts[c]]`` is a uniformly random
    permutation of the member pixels of class c.
    """
    n = cls_id.shape[0]
    key = jnp.where(member, cls_id, num_classes).astype(jnp.int32)
    tie = jax.random.uniform(tie_rng, (n,), dtype=jnp.float32)
    idx = jnp.arange(n, dtype=jnp.int32)
    _, _, order = jax.lax.sort((key, tie, idx), num_keys=2)
    counts = jnp.bincount(key, length=num_classes + 1)[:num_classes]
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    return order, counts.astype(jnp.int32), offsets


def update_prototypes(
    rep: jax.Array,          # [N, D] representations (gradients not needed)
    cls_id: jax.Array,       # [N] int class per pixel
    member: jax.Array,       # [N] bool validity
    prototypes: jax.Array,   # [C, D]
    alpha: float,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """EMA prototype update from cross-replica per-class means.

    Returns (new_prototypes [C, D], global_counts [C]).  First-touch classes
    (stored prototype exactly zero) are initialized to the mean, matching
    loss.py:103-105.
    """
    num_classes = prototypes.shape[0]
    rep = jax.lax.stop_gradient(rep.astype(jnp.float32))
    onehot = jax.nn.one_hot(jnp.where(member, cls_id, num_classes),
                            num_classes, dtype=jnp.float32)  # [N, C]
    sums = jnp.einsum("nc,nd->cd", onehot, rep,
                      preferred_element_type=jnp.float32)
    counts = onehot.sum(0)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
    mean = sums / jnp.maximum(counts[:, None], 1.0)
    never_seen = jnp.sum(prototypes, axis=1, keepdims=True) == 0.0
    ema = jnp.where(never_seen, mean, alpha * prototypes + (1 - alpha) * mean)
    new_protos = jnp.where(counts[:, None] > 0, ema, prototypes)
    return new_protos, counts


def prototype_contrastive_loss(
    rep: jax.Array,            # [B, h, w, D] with gradients
    label_onehot: jax.Array,   # [B, h, w, C] float one-hot (all-zero = ignore)
    mask: jax.Array,           # [B, h, w] float/bool validity mask
    prob: jax.Array,           # [B, h, w, C] probability driving hard-anchor mining
    prototypes: jax.Array,     # [C, D] running class prototypes
    rng: jax.Array,
    *,
    num_queries: int = 256,
    num_negatives: int = 512,
    temp: float = 0.5,
    strong_threshold: float = 0.97,
    alpha: float = 0.99,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(loss, new_prototypes)``."""
    b, h, w, d = rep.shape
    num_classes = label_onehot.shape[-1]
    n = b * h * w
    q, g = num_queries, num_negatives

    rep_flat = rep.reshape(n, d).astype(jnp.float32)
    rep_ng = jax.lax.stop_gradient(rep_flat)
    onehot_flat = label_onehot.reshape(n, num_classes)
    cls_id = jnp.argmax(onehot_flat, axis=-1).astype(jnp.int32)
    has_class = jnp.max(onehot_flat, axis=-1) > 0
    member = has_class & (mask.reshape(n) > 0)

    r_tie1, r_tie2, r_anchor, r_negcls, r_negpix = jax.random.split(rng, 5)

    new_protos, _ = update_prototypes(
        rep_ng, cls_id, member, prototypes, alpha, axis_name
    )
    protos_ng = jax.lax.stop_gradient(new_protos)
    protos_n = _l2_normalize(protos_ng, axis=-1)

    # local class validity / hard-anchor pools
    prob_at_cls = jnp.take_along_axis(
        prob.reshape(n, num_classes), cls_id[:, None], axis=-1
    )[:, 0]
    hard = member & (jax.lax.stop_gradient(prob_at_cls) < strong_threshold)

    order_all, counts_all, off_all = _grouped_random_order(
        cls_id, member, r_tie1, num_classes
    )
    order_hard, counts_hard, off_hard = _grouped_random_order(
        cls_id, hard, r_tie2, num_classes
    )
    local_valid = counts_all > 0                       # [C]
    valid_num = jnp.sum(local_valid.astype(jnp.int32))

    # ---- anchors: uniform-with-replacement from each class's hard pool ----
    u1 = jax.random.uniform(r_anchor, (num_classes, q))
    k1 = jnp.floor(u1 * jnp.maximum(counts_hard, 1)[:, None]).astype(jnp.int32)
    anchor_idx = order_hard[off_hard[:, None] + k1]    # [C, Q]
    anchors = rep_flat[anchor_idx]                     # [C, Q, D] (with grad)

    # ---- negative class sampling: inverse-CDF over softmax(proto sim/temp) ----
    sim = protos_n @ protos_n.T                        # [C, C]
    neg_logits = sim / temp
    eye = jnp.eye(num_classes, dtype=bool)
    allowed = (~eye) & local_valid[None, :]
    neg_logits = jnp.where(allowed, neg_logits, -jnp.inf)
    # softmax rows can be all -inf when <2 valid classes; loss is gated to 0
    # in that case, so NaNs here are masked out downstream.
    p = jax.nn.softmax(neg_logits, axis=-1)
    p = jnp.where(jnp.isfinite(p), p, 0.0)
    cdf = jnp.cumsum(p, axis=-1)                       # [C, C]
    u = jax.random.uniform(r_negcls, (num_classes, q * g))
    samp_class = jax.vmap(lambda c_row, u_row: jnp.searchsorted(c_row, u_row))(
        cdf, u
    ).astype(jnp.int32)
    samp_class = jnp.clip(samp_class, 0, num_classes - 1)  # [C, Q*G]

    # ---- negative pixel sampling: uniform valid pixel of the sampled class ----
    u2 = jax.random.uniform(r_negpix, (num_classes, q * g))
    k2 = jnp.floor(u2 * jnp.maximum(counts_all[samp_class], 1)).astype(jnp.int32)
    neg_idx = order_all[off_all[samp_class] + k2]      # [C, Q*G]

    # ---- per-class InfoNCE (scan over classes; remat keeps residuals tiny) ----
    @functools.partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
    def class_loss(anchor_c, neg_idx_c, proto_c):
        a = _l2_normalize(anchor_c, axis=-1)                     # [Q, D]
        negs = _l2_normalize(rep_ng[neg_idx_c].reshape(q, g, d), axis=-1)
        pos_logit = (a @ proto_c)[:, None]                       # [Q, 1]
        neg_logit = jnp.einsum("qd,qgd->qg", a, negs,
                               preferred_element_type=jnp.float32)
        logits = jnp.concatenate([pos_logit, neg_logit], axis=1) / temp
        return jnp.mean(-logits[:, 0] + jax.scipy.special.logsumexp(logits, axis=1))

    def body(total, inputs):
        anchor_c, neg_idx_c, proto_c, contribute = inputs
        loss_c = class_loss(anchor_c, neg_idx_c, proto_c)
        return total + jnp.where(contribute, loss_c, 0.0), None

    contribute = local_valid & (counts_hard > 0)
    total, _ = jax.lax.scan(
        body, jnp.float32(0.0), (anchors, neg_idx, protos_n, contribute)
    )

    loss = jnp.where(valid_num > 1, total / jnp.maximum(valid_num, 1), 0.0)
    return loss, new_protos
