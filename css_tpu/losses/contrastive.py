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

    The (class, random-tiebreak) pair is packed into one int32 key —
    class in the high bits, 24 random bits below — so the TPU sorts a
    single key operand instead of two.
    """
    n = cls_id.shape[0]
    if num_classes >= 128:
        # the ignore bucket (num_classes) must fit in 7 bits: 128 << 24
        # overflows int32 sign and would silently corrupt the sort order
        raise ValueError(
            f"num_classes={num_classes} exceeds the packed-key capacity "
            "(< 128 classes); widen _grouped_random_order's packing first")
    key = jnp.where(member, cls_id, num_classes).astype(jnp.int32)
    tie = jax.random.bits(tie_rng, (n,), dtype=jnp.uint32) >> jnp.uint32(8)
    packed = (key << 24) | tie.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    _, order = jax.lax.sort((packed, idx), num_keys=1)
    counts = _class_counts(key, num_classes)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    return order, counts, offsets


def _class_counts(key: jax.Array, num_classes: int) -> jax.Array:
    """#pixels per class, one-hot reduce.  ``jnp.bincount`` lowers to a
    serial scatter-add (~4.6 ms for 262k pixels on v5e, traced); the fused
    compare+reduce is ~50x cheaper."""
    oh = jax.nn.one_hot(key, num_classes + 1, dtype=jnp.float32)
    return jnp.sum(oh, axis=0)[:num_classes].astype(jnp.int32)


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
    negative_mode: str = "sampled",
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(loss, new_prototypes)``.

    Performance notes (v5e, N=262k pixels, C=21): the straightforward
    formulation spends its time in scattered element gathers (negative pixel
    indices), ``searchsorted`` (negative classes) and 1KB row gathers
    (negative representations).  This implementation avoids all three:
    classes are sampled by counting CDF crossings (a broadcast compare),
    per-class count/offset lookups are one-hot matmuls, and negatives are
    rows of a *pre-sorted, pre-normalized bf16* representation table so the
    only remaining gather streams contiguous class-grouped rows.

    ``negative_mode``:
      * ``sampled``  — reference semantics: per anchor, ``num_negatives``
        pixels drawn (class ~ softmax(proto sim/temp), pixel uniform within
        class) and summed inside the InfoNCE denominator (loss.py:131-147);
      * ``expected`` — replaces the Monte-Carlo negative sum with its exact
        expectation, G * E_n[exp(sim/temp)], computed as an anchor-vs-all
        matmul with per-pixel mixture weights.  Deterministic, lower
        variance, zero gathers — the MXU-native formulation (the sampled
        estimator converges to it as G grows);
      * ``sampled_pallas`` — the reference's Monte-Carlo *sampling* law,
        gather-free: the multiset negative sum equals
        sum_n m_n exp(sim_n/temp) with multiplicities
        m ~ Multinomial(G, p/count).  Binomially-thinned per-pixel
        multiplicities (floor(lam) + Bernoulli(frac), lam = G*p/count —
        marginal means exact) are drawn XLA-side per class and streamed
        through the Pallas kernel as the weight vector.  Removes the
        measured ~50 ms/step per-row-fetch wall of ``sampled`` (CLAUDE.md
        round-3 lever #4).  Two relaxations vs the reference law, both
        bounded by the seed-distribution differential test: the
        fixed-total-G constraint (an O(1/sqrt(G)) denominator
        perturbation), and ONE multiset shared by a class's Q anchors
        instead of per-anchor-independent draws (identical marginal law
        per anchor; gradient noise correlates within a class's anchors —
        use ``sampled`` if per-anchor independence matters).
    """
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

    # local class validity / hard-anchor pools; (onehot * prob) replaces a
    # 262k-element scattered gather with an elementwise reduce
    prob_at_cls = jnp.sum(onehot_flat * jax.lax.stop_gradient(
        prob.reshape(n, num_classes)), axis=-1)
    hard = member & (prob_at_cls < strong_threshold)

    order_hard, counts_hard, off_hard = _grouped_random_order(
        cls_id, hard, r_tie2, num_classes
    )
    if negative_mode == "sampled":
        order_all, counts_all, off_all = _grouped_random_order(
            cls_id, member, r_tie1, num_classes
        )
        # negatives are sampled from the class-grouped random ordering, so
        # materialize the normalized no-grad representation table in that
        # order once (row gathers of a permutation stream well); negatives
        # are read as contiguous-ish rows of this bf16 table in the scan.
        rep_sorted_n = _l2_normalize(rep_ng, axis=-1)[order_all].astype(jnp.bfloat16)
    else:
        # expected modes stream ALL rows with per-row mixture weights, so
        # no grouped ordering (and no 268 MB permutation gather) is needed —
        # weights are computed from the class ids in original order.
        counts_all = _class_counts(
            jnp.where(member, cls_id, num_classes).astype(jnp.int32),
            num_classes)
        rep_sorted_n = _l2_normalize(rep_ng, axis=-1).astype(jnp.bfloat16)
    local_valid = counts_all > 0                       # [C]
    valid_num = jnp.sum(local_valid.astype(jnp.int32))

    # ---- anchors: uniform-with-replacement from each class's hard pool ----
    u1 = jax.random.uniform(r_anchor, (num_classes, q))
    k1 = jnp.floor(u1 * jnp.maximum(counts_hard, 1)[:, None]).astype(jnp.int32)
    anchor_idx = order_hard[off_hard[:, None] + k1]    # [C, Q]
    anchors = rep_flat[anchor_idx]                     # [C, Q, D] (with grad)

    # ---- negative class distribution: softmax(proto sim / temp) ----
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
    counts_f = counts_all.astype(jnp.float32)

    contribute = local_valid & (counts_hard > 0)

    if negative_mode == "sampled":
        # offsets into the grouped ordering only exist in this mode, so the
        # per-class loss closing over them lives here too (keeps the None
        # out of the expected branch's reach entirely).
        offs_f = off_all.astype(jnp.float32)
        u_cls = jax.random.uniform(r_negcls, (num_classes, q * g))
        u_pix = jax.random.uniform(r_negpix, (num_classes, q * g))

        # per-class InfoNCE (scan over classes; remat keeps residuals tiny)
        @functools.partial(jax.checkpoint,
                           policy=jax.checkpoint_policies.nothing_saveable)
        def class_loss(anchor_c, cdf_c, u_cls, u_pix, proto_c):
            # class of each negative = #{c : cdf[c] < u} (inverse-CDF without
            # searchsorted); count/offset lookups are one-hot matmuls.
            samp = jnp.sum((u_cls[:, None] > cdf_c[None, :]).astype(jnp.float32),
                           axis=1).astype(jnp.int32)
            samp = jnp.clip(samp, 0, num_classes - 1)      # [Q*G]
            oh = jax.nn.one_hot(samp, num_classes, dtype=jnp.float32)
            cnt = oh @ counts_f                            # exact small ints
            off = oh @ offs_f
            pos = (off + jnp.floor(u_pix * jnp.maximum(cnt, 1.0))).astype(jnp.int32)
            # (measured: per-anchor ascending sort of the draws before this
            # gather is a wash on v5e — the cost is per-row fetch, not locality)
            negs = rep_sorted_n[pos].reshape(q, g, d)      # [Q, G, D] bf16 rows

            a = _l2_normalize(anchor_c, axis=-1)           # [Q, D] f32 (grad)
            pos_logit = (a @ proto_c)[:, None]             # [Q, 1]
            neg_logit = jnp.einsum("qd,qgd->qg", a.astype(jnp.bfloat16), negs,
                                   preferred_element_type=jnp.float32)
            logits = jnp.concatenate([pos_logit, neg_logit], axis=1) / temp
            return jnp.mean(-logits[:, 0]
                            + jax.scipy.special.logsumexp(logits, axis=1))

        def body(total, inputs):
            anchor_c, cdf_c, uc, up, proto_c, contribute_c = inputs
            loss_c = class_loss(anchor_c, cdf_c, uc, up, proto_c)
            return total + jnp.where(contribute_c, loss_c, 0.0), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            (anchors, cdf, u_cls, u_pix, protos_n, contribute),
        )
    elif negative_mode in ("expected", "expected_pallas", "sampled_pallas"):
        # per-pixel mixture weight for class i's negatives: w_n =
        # p_i[class(n)] / count_class(n) over member pixels (0 elsewhere);
        # one-hot of the per-pixel class gives w as a [N,C+1]@[C+1] matvec —
        # no gathers anywhere in this branch (rows stay in original order,
        # weighted consistently).
        masked_cls = jnp.where(member, cls_id, num_classes)
        sorted_onehot = jax.nn.one_hot(masked_cls, num_classes + 1,
                                       dtype=jnp.float32)       # [N, C+1]
        p_over_cnt = jnp.pad(p / jnp.maximum(counts_f, 1.0)[None, :],
                             ((0, 0), (0, 1)))                  # [C, C+1]

        use_pallas = negative_mode == "expected_pallas"
        use_stochastic = negative_mode == "sampled_pallas"
        # (a batched all-classes kernel variant — one R pass for every class
        # instead of the per-class scan — was built and measured 3 ms SLOWER
        # end-to-end on v5e: the VPU exp work, identical either way,
        # dominates this path, not the table streaming.  The per-class scan
        # stays.)
        seeds = jax.random.split(r_negpix, num_classes)

        @functools.partial(jax.checkpoint,
                           policy=jax.checkpoint_policies.nothing_saveable)
        def class_loss_exp(anchor_c, wrow, proto_c, seed_c):
            a = _l2_normalize(anchor_c, axis=-1)
            pos = (a @ proto_c) / temp                          # [Q]
            w = sorted_onehot @ wrow                            # [N]
            if use_stochastic:
                from css_tpu.ops.pallas import weighted_exp_softsum_stochastic

                # thinned multinomial draw (XLA-side, key-deterministic, so
                # the remat'd backward regenerates the identical multiset)
                neg_sum = weighted_exp_softsum_stochastic(
                    a, rep_sorted_n, g * w, 1.0 / temp, seed_c)  # [Q]
                return jnp.mean(jnp.log(jnp.exp(pos) + neg_sum) - pos)
            if use_pallas:
                from css_tpu.ops.pallas import weighted_exp_softsum

                neg_sum = weighted_exp_softsum(
                    a, rep_sorted_n, w, 1.0 / temp)             # [Q]
            else:
                sims = jax.lax.dot_general(
                    a.astype(jnp.bfloat16), rep_sorted_n,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) / temp                                        # [Q, N]
                neg_sum = jnp.exp(sims) @ w                     # [Q]
            return jnp.mean(jnp.log(jnp.exp(pos) + g * neg_sum) - pos)

        def body_exp(total, inputs):
            anchor_c, wrow, proto_c, seed_c, contribute_c = inputs
            loss_c = class_loss_exp(anchor_c, wrow, proto_c, seed_c)
            return total + jnp.where(contribute_c, loss_c, 0.0), None

        total, _ = jax.lax.scan(
            body_exp, jnp.float32(0.0),
            (anchors, p_over_cnt, protos_n, seeds, contribute),
        )
    else:
        raise ValueError(f"unknown negative_mode {negative_mode}")

    loss = jnp.where(valid_num > 1, total / jnp.maximum(valid_num, 1), 0.0)
    return loss, new_protos
