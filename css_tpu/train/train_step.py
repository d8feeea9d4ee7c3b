"""The jit-compiled semi-supervised train step (ori / mix / cross strategies).

One pure function replaces the reference's hot loop — model wrapper forward
(networks/ddp_model.py), in-forward PIL augmentation (VOC.py:276-352),
NCCL-gathered mixing (VOC.py:354-477), loss composition (ori_pseudo.py:
162-189, mix_label.py:166-197, cross_label.py:166-201), DDP backward, SGD
step, EMA update and the global-prototype side effect — with this dataflow,
entirely on device under a single jit/shard_map:

  device augment labeled batch -> teacher pseudo-labels (logit and/or
  representation space) -> device augment + cross-replica mix unlabeled
  batch -> student forward on both -> sup / unsup / contrastive losses ->
  psum-mean gradients -> SGD(nesterov, poly LR) -> teacher EMA -> new state.

Strategy differences (SURVEY.md section 3):
  * ``ori``   — logit-space pseudo-labels only (ddp_model.py:32-70);
  * ``mix``   — collaborative labels: keep pixels where logit- and rep-space
    (cosine-to-prototype) labels agree, others ignored
    (ddp_model.py:99-156); the contrastive "probability" driving hard-anchor
    mining is the rep-space softmax;
  * ``cross`` — both label spaces kept; the unsupervised loss target switches
    from logit- to rep-space labels after a warmup (cross_label.py:172-175),
    selected by a traced flag so no recompilation at the switch.

Parallelism: pure data parallelism over a 1-D ``data`` mesh axis — gradient
``pmean``, BatchNorm cross-replica stats (SyncBatchNorm equivalent),
O(C*D) prototype psum, and the rank-0-broadcast mixing partner; see
css_tpu/parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from css_tpu.losses.contrastive import prototype_contrastive_loss
from css_tpu.losses.cross_entropy import cross_entropy, ohem_cross_entropy
from css_tpu.losses.threshold import attention_threshold_loss
from css_tpu.ops.augment import (
    batch_transform,
    normalize_imagenet,
    to_channel_first,
    to_channel_last,
)
from css_tpu.ops.interpolate import bilinear_resize, nearest_resize
from css_tpu.ops.mixing import mix_batch
from css_tpu.ops.onehot import label_onehot, label_onehot_ignore
from css_tpu.train.state import TrainState, ema_update

__all__ = ["StepConfig", "make_train_step", "make_eval_step",
           "make_sliding_eval_step"]


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static hyper-parameters of the train step (hashable -> jit static)."""

    num_classes: int
    crop_hw: Tuple[int, int]
    scale_range: Tuple[float, float]          # labeled & pseudo-label scale
    strategy: str = "ori"                     # ori | mix | cross
    mix_mode: str = "cutmix"                  # none | cutout | cutmix | classmix
    mix_partner: str = "reference"            # reference | ring
    sup_loss: str = "ce"                      # ce | ohem
    ohem_thresh: float = 0.7
    ohem_min_kept_per_image: int = 50000      # ori_pseudo.py:79
    un_threshold: float = 0.97
    weak_threshold: float = 0.7
    strong_threshold: float = 0.97
    temp: float = 0.5                         # contrastive temperature
    rep_temp: float = 0.5                     # rep-space pseudo-label temp
    num_queries: int = 256
    num_negatives: int = 512
    proto_alpha: float = 0.99
    ema_alpha: float = 0.99
    contrast_enabled: bool = True             # Loss.is_available in the YAML
    negative_mode: str = "sampled_pallas"     # see losses/contrastive.py modes
    aug_quantize: bool = False                # reproduce the reference's uint8
    # PIL round trip at every aug hop (entry truncation of images AND teacher
    # confidences, uint8 rounding after resize / each jitter op / each blur
    # pass — VOC.py:276-293).  Off by default: float aug is strictly more
    # precise; enable for bit-faithful parity studies (PARITY.md).
    fused_forward: bool = False               # one batched pass over l+u
    # (semantics-exact when enabled: GroupedBatchNorm keeps per-half BN
    # statistics and the reference's sequential running-stat update order
    # inside the fused batch.  Isolated convs run ~1.6x faster at batch 16,
    # but the full VOC step is bandwidth-bound and measured 295 ms unfused
    # vs 302 ms fused on v5e — so the literal two-forward order stays the
    # default; enable for small per-chip batches where MXU feeding wins.)


def _remap_ignore(labels: jax.Array, num_classes: int) -> jax.Array:
    """255 (and any out-of-range) -> -1, reference VOC.py:115."""
    return jnp.where((labels >= 0) & (labels < num_classes), labels, -1)


def _to01_cf(images: jax.Array) -> jax.Array:
    """NHWC uint8/float canvas -> channel-first float [0,1]."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    return to_channel_first(images)


def _rep_space_probs(rep: jax.Array, prototypes: jax.Array):
    """Cosine-similarity logits of each pixel rep against the prototypes.

    Returns the raw similarity logits [B,h,w,C]; callers divide by their
    temperature and softmax (ddp_model.py:104-112,147-155 do the same in
    two steps).
    """
    rep_n = rep * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(rep * rep, axis=-1, keepdims=True), 1e-12)
    )
    proto_n = prototypes * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(prototypes * prototypes, axis=-1, keepdims=True), 1e-12)
    )
    sim = jnp.einsum("bhwd,cd->bhwc", rep_n, proto_n,
                     preferred_element_type=jnp.float32)
    return sim


def make_train_step(model, tx, cfg: StepConfig, axis_name: Optional[str] = None):
    """Build ``step(state, batch, rng, contrast_weight, use_rep_labels)``.

    ``batch`` keys: ``l_image`` [B,H,W,3] float raw [0,1], ``l_label``
    [B,H,W] int32 (255=ignore ok), ``l_valid_hw`` [B,2], ``u_image``
    [B,Hu,Wu,3], ``u_valid_hw`` [B,2].  ``contrast_weight`` is the ramp value
    (1.0 for ori — the reference constructs but never applies the ramp there,
    ori_pseudo.py:114-119,183). ``use_rep_labels`` only matters for cross.
    """
    ch, cw = cfg.crop_hw
    c = cfg.num_classes

    def teacher_apply(params, stats, img, train=True, bn_groups=1):
        out, upd = model.apply(
            {"params": params, "batch_stats": stats}, img, train=train,
            bn_groups=bn_groups, mutable=["batch_stats"],
        )
        return out, upd["batch_stats"]

    def pseudo_label_phase(state, l_img, u_img01, rng):
        """No-grad teacher + augmentation pipeline.  ``u_img01`` is
        channel-first raw [0,1]; returns the augmented, normalized (NHWC)
        unlabeled batch, its labels/conf maps, and updated teacher stats."""
        k_t, k_mix, k_aug2 = jax.random.split(rng, 3)
        ema_stats = state.ema_batch_stats
        u_img = to_channel_last(normalize_imagenet(u_img01, channel_axis=-3))

        if cfg.strategy == "ori":
            (pred_u_t, _), ema_stats = teacher_apply(state.ema_params, ema_stats, u_img)
            pred_large = bilinear_resize(pred_u_t, (ch, cw), align_corners=True)
            probs = jax.nn.softmax(pred_large, axis=-1)
            conf_cls = jnp.max(probs, axis=-1)
            lab_cls = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            labels = lab_cls[:, None]                       # [B,1,H,W]
            confs = conf_cls[:, None]                       # [B,1,H,W]
        elif cfg.fused_forward:
            # teacher sees labeled then unlabeled (ddp_model.py:102-103);
            # fused into one batch with per-half BN stats (GroupedBatchNorm)
            (pred_t, rep_t), ema_stats = teacher_apply(
                state.ema_params, ema_stats,
                jnp.concatenate([l_img, u_img]), bn_groups=2,
            )
            nb = l_img.shape[0]
            pred_u_t, rep_u_t = pred_t[nb:], rep_t[nb:]
        else:
            # teacher sees labeled then unlabeled (ddp_model.py:102-103)
            (_, _), ema_stats = teacher_apply(state.ema_params, ema_stats, l_img)
            (pred_u_t, rep_u_t), ema_stats = teacher_apply(
                state.ema_params, ema_stats, u_img
            )
        if cfg.strategy != "ori":
            sim = _rep_space_probs(rep_u_t, state.prototypes)
            sim_large = bilinear_resize(sim, (ch, cw), align_corners=True)
            rep_probs = jax.nn.softmax(sim_large / cfg.rep_temp, axis=-1)
            conf_rep = jnp.max(rep_probs, axis=-1)
            lab_rep = jnp.argmax(rep_probs, axis=-1).astype(jnp.int32)

            pred_large = bilinear_resize(pred_u_t, (ch, cw), align_corners=True)
            probs = jax.nn.softmax(pred_large, axis=-1)
            conf_cls = jnp.max(probs, axis=-1)
            lab_cls = jnp.argmax(probs, axis=-1).astype(jnp.int32)

            if cfg.strategy == "mix":
                # collaboration: disagreeing pixels -> ignore (ddp_model.py:115-118)
                agreed = jnp.where(lab_cls == lab_rep, lab_cls, -1)
                labels = agreed[:, None]
                confs = jnp.stack([conf_cls, conf_rep], axis=1)
            else:  # cross: both label spaces survive (ddp_model.py:202)
                labels = jnp.stack([lab_cls, lab_rep], axis=1)
                confs = jnp.stack([conf_cls, conf_rep], axis=1)

        full_hw = jnp.broadcast_to(
            jnp.asarray([ch, cw], jnp.int32), (u_img01.shape[0], 2)
        )
        # scale/pad/crop at the config scale, photometrics off (ddp_model.py:40-44)
        img01, labels, confs = batch_transform(
            jax.random.fold_in(k_t, 1), u_img01, labels, confs, full_hw,
            crop_hw=(ch, cw), scale_range=cfg.scale_range, augmentation=False,
            quantize=cfg.aug_quantize,
        )
        # cross-replica mixing (ddp_model.py:46-50)
        img01, labels, confs = mix_batch(
            k_mix, img01, labels, confs, mode=cfg.mix_mode, num_classes=c,
            axis_name=axis_name, partner=cfg.mix_partner,
        )
        # photometrics + flip at identity geometry (ddp_model.py:52-57)
        img01, labels, confs = batch_transform(
            k_aug2, img01, labels, confs, full_hw,
            crop_hw=(ch, cw), scale_range=(1.0, 1.0), augmentation=True,
            quantize=cfg.aug_quantize,
        )
        out = to_channel_last(normalize_imagenet(img01, channel_axis=-3))
        return out, labels, confs, ema_stats

    def sup_loss_fn(pred_large, label):
        if cfg.sup_loss == "ohem":
            min_kept = cfg.ohem_min_kept_per_image * pred_large.shape[0]
            return ohem_cross_entropy(pred_large, label, cfg.ohem_thresh, min_kept)
        return cross_entropy(pred_large, label)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array,
             contrast_weight: jax.Array, use_rep_labels: jax.Array):
        # ``rng`` is a run-constant base key; deriving the per-step stream
        # from state.step INSIDE the jit keeps the driver free of per-step
        # host->device PRNG round trips (28 ms each on a remote-TPU link).
        rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        k_laug, k_ucrop, k_teacher, k_contrast = jax.random.split(rng, 4)

        # ---- device-side labeled augmentation (reference: host dataloader) ----
        l_canvas = _to01_cf(batch["l_image"])
        bl, _, lh, lw = l_canvas.shape
        l_lab_canvas = _remap_ignore(batch["l_label"], c)
        l_img01, l_labels, _ = batch_transform(
            k_laug, l_canvas, l_lab_canvas[:, None],
            jnp.zeros((bl, 1, lh, lw), jnp.float32),
            batch["l_valid_hw"], crop_hw=(ch, cw), scale_range=cfg.scale_range,
            augmentation=True, quantize=cfg.aug_quantize,
        )
        l_img = to_channel_last(normalize_imagenet(l_img01, channel_axis=-3))
        l_label = l_labels[:, 0]

        # ---- unlabeled base crop (reference: unlabeled loader, scale (1,1)) ----
        u_canvas = _to01_cf(batch["u_image"])
        bu, _, uh, uw = u_canvas.shape
        u_img01, _, _ = batch_transform(
            k_ucrop, u_canvas,
            jnp.zeros((bu, 1, uh, uw), jnp.int32),
            jnp.zeros((bu, 1, uh, uw), jnp.float32),
            batch["u_valid_hw"], crop_hw=(ch, cw), scale_range=(1.0, 1.0),
            augmentation=False, quantize=cfg.aug_quantize,
        )

        u_img, u_labels, u_confs, ema_stats = pseudo_label_phase(
            state, l_img, u_img01, k_teacher
        )

        if cfg.strategy == "cross":
            unsup_label = jnp.where(use_rep_labels, u_labels[:, 1], u_labels[:, 0])
            unsup_conf = jnp.where(use_rep_labels, u_confs[:, 1], u_confs[:, 0])
        else:
            unsup_label = u_labels[:, 0]
            unsup_conf = u_confs[:, 0]
        conf_cls = u_confs[:, 0]

        def loss_fn(params):
            stats = state.batch_stats
            if cfg.fused_forward:
                # one batched pass; GroupedBatchNorm reproduces the two-pass
                # per-half BN statistics exactly (ddp_model.py:60-64)
                (pred_b, rep_b), upd = model.apply(
                    {"params": params, "batch_stats": stats},
                    jnp.concatenate([l_img, u_img]), train=True, bn_groups=2,
                    mutable=["batch_stats"],
                )
                stats = upd["batch_stats"]
                pred_l, pred_u = pred_b[:bl], pred_b[bl:]
                rep_l, rep_u = rep_b[:bl], rep_b[bl:]
            else:
                # two sequential forwards, per-half BN statistics — exactly
                # the reference's module-call order (ddp_model.py:60-64)
                (pred_l, rep_l), upd = model.apply(
                    {"params": params, "batch_stats": stats}, l_img, train=True,
                    mutable=["batch_stats"],
                )
                stats = upd["batch_stats"]
                (pred_u, rep_u), upd = model.apply(
                    {"params": params, "batch_stats": stats}, u_img, train=True,
                    mutable=["batch_stats"],
                )
                stats = upd["batch_stats"]

            pred_l_large = bilinear_resize(pred_l, (ch, cw), align_corners=True)
            pred_u_large = bilinear_resize(pred_u, (ch, cw), align_corners=True)

            sup = sup_loss_fn(pred_l_large, l_label)
            unsup = attention_threshold_loss(
                pred_u_large, unsup_label, unsup_conf, cfg.un_threshold
            )

            # ---- contrastive inputs at the model's rep resolution
            # (ori_pseudo.py:170-180; /4 stride, but e.g. 769 -> 193 so the
            # size comes from the actual output, not crop//4) ----
            rep_hw = (pred_l.shape[1], pred_l.shape[2])

            def to_rep_res(x):
                return nearest_resize(x, rep_hw, convention="torch")

            l_small = to_rep_res(l_label)
            mask_l = to_rep_res((l_label >= 0).astype(jnp.float32))
            mask_u = to_rep_res(
                (conf_cls >= cfg.weak_threshold).astype(jnp.float32))
            if cfg.strategy == "mix":
                # label_onehot_2 + slice: ignore all-zero (mix_label.py:181-182)
                oh_u = label_onehot_ignore(to_rep_res(u_labels[:, 0]), c)
            else:
                oh_u = label_onehot(to_rep_res(u_labels[:, 0]), c)
            label_all = jnp.concatenate([label_onehot(l_small, c), oh_u])
            mask_all = jnp.concatenate([mask_l, mask_u])

            rep_all = jnp.concatenate([rep_l, rep_u])
            if cfg.strategy == "ori":
                prob_all = jax.nn.softmax(
                    jax.lax.stop_gradient(jnp.concatenate([pred_l, pred_u])), axis=-1
                )
            else:
                sim = _rep_space_probs(
                    jax.lax.stop_gradient(rep_all), state.prototypes
                )
                prob_all = jax.nn.softmax(sim / cfg.rep_temp, axis=-1)

            if cfg.contrast_enabled:
                contrast, new_protos = prototype_contrastive_loss(
                    rep_all, label_all, mask_all, prob_all, state.prototypes,
                    k_contrast,
                    num_queries=cfg.num_queries, num_negatives=cfg.num_negatives,
                    temp=cfg.temp, strong_threshold=cfg.strong_threshold,
                    alpha=cfg.proto_alpha, axis_name=axis_name,
                    negative_mode=cfg.negative_mode,
                )
            else:
                contrast, new_protos = jnp.float32(0.0), state.prototypes
            total = sup + unsup + contrast * contrast_weight
            aux = dict(stats=stats, protos=new_protos, sup=sup, unsup=unsup,
                       contrast=contrast)
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_ema = ema_update(params=params, ema_params=state.ema_params,
                             step=state.step, alpha=cfg.ema_alpha)

        metrics = dict(total=total, sup=aux["sup"], unsup=aux["unsup"],
                       contrast=aux["contrast"])
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=aux["stats"],
            ema_params=new_ema,
            ema_batch_stats=ema_stats,
            opt_state=opt_state,
            prototypes=aux["protos"],
        )
        return new_state, metrics

    return step


def _round_to_multiple(x: float, mult: int = 8) -> int:
    """Nearest positive multiple of ``mult`` — TTA-scaled inputs keep
    TPU-friendly (lane/sublane-aligned) spatial dims."""
    return max(mult, int(round(x / mult)) * mult)


def _conf_matrix_delta(yhat, label, valid, num_classes, axis_name):
    """[C, C] int32 confusion-matrix update (rows = target, cols = pred),
    bincount formulation (util/meter.py:40-48); psum'd across the mesh."""
    ok = (label >= 0) & (label < num_classes) & valid[:, None, None]
    idx = jnp.where(ok, label * num_classes + yhat, num_classes * num_classes)
    binc = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes + 1)
    delta = binc[:-1].reshape(num_classes, num_classes).astype(jnp.int32)
    if axis_name is not None:
        delta = jax.lax.psum(delta, axis_name)
    return delta


def make_eval_step(model, num_classes: int, axis_name: Optional[str] = None,
                   flip: bool = False, scales=(1.0,)):
    """Confusion-matrix accumulation step over the EMA teacher in eval mode.

    The reference evaluates the *teacher* (ori_pseudo.py:129,191-211).
    ``valid`` masks padded batch entries so the last partial batch is exact.
    Returns an update of the [C, C] int32 confusion matrix; rows = target,
    cols = prediction (util/meter.py:40-48).

    With ``axis_name`` (shard_map over the device mesh) each shard counts its
    slice of the batch and the delta is ``psum``'d, so the returned matrix is
    the full-batch update on every replica — the device-level analog of the
    reference's cross-rank ``torch_dist_sum`` (ori_pseudo.py:208-209).

    ``flip``/``scales`` enable test-time augmentation beyond the reference's
    protocol: softmax probabilities are averaged over a horizontal flip and/or
    a set of input rescales (each rounded to a lane-friendly multiple of 8)
    before the argmax.  The default (no flip, scale 1.0) compiles to exactly
    the original single-forward graph.
    """
    scales = tuple(float(s) for s in scales)
    plain = (not flip) and scales == (1.0,)

    def _probs(params, batch_stats, image, out_hw):
        pred, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, image, train=False
        )
        pred = bilinear_resize(pred, out_hw, align_corners=True)
        return jax.nn.softmax(pred.astype(jnp.float32), axis=-1)

    def eval_step(params, batch_stats, conf_mat, image, label, valid):
        out_hw = label.shape[1:3]
        if plain:
            # argmax(logits) == argmax(softmax(logits)): the TTA-free path
            # stays the single upsampled-logit forward.
            pred, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, image,
                train=False)
            pred = bilinear_resize(pred, out_hw, align_corners=True)
            yhat = jnp.argmax(pred, axis=-1)
        else:
            h, w = int(image.shape[1]), int(image.shape[2])
            prob = jnp.zeros(
                (image.shape[0], out_hw[0], out_hw[1], num_classes),
                jnp.float32)
            for s in scales:
                im = image if s == 1.0 else bilinear_resize(
                    image, (_round_to_multiple(h * s),
                            _round_to_multiple(w * s)), align_corners=True)
                prob = prob + _probs(params, batch_stats, im, out_hw)
                if flip:
                    prob = prob + _probs(
                        params, batch_stats, im[:, :, ::-1], out_hw)[:, :, ::-1]
            yhat = jnp.argmax(prob, axis=-1)
        return conf_mat + _conf_matrix_delta(yhat, label, valid, num_classes,
                                             axis_name)

    return eval_step


def _tile_origins(full: int, crop: int, stride: int):
    """Static window origins covering [0, full) with the last tile clamped."""
    if full <= crop:
        return [0]
    xs = list(range(0, full - crop + 1, stride))
    if xs[-1] != full - crop:
        xs.append(full - crop)
    return xs


def make_sliding_eval_step(model, num_classes: int, canvas_hw, crop_hw,
                           stride_hw=None, axis_name: Optional[str] = None,
                           flip: bool = False, scales=(1.0,)):
    """Paper-protocol sliding-window eval over the FULL canvas.

    The in-training eval (make_eval_step) follows the reference's protocol:
    one random crop per val image (VOC.py:44-45).  Benchmark numbers for
    Cityscapes are usually reported with overlapping-window inference over
    the whole 2048x1024 frame; this builds that step.  Tile origins are
    static (computed from canvas/crop/stride at trace time), so the window
    loop unrolls into static dynamic-slices — no traced gathers.

    Per image: softmax probabilities of each crop-sized window (model logits
    bilinearly upsampled x4) are accumulated over the canvas and averaged by
    coverage count; argmax over the averaged map feeds the confusion matrix.
    Same signature as make_eval_step's step.

    The window loop is a ``lax.scan`` over the (static) origin table, not a
    Python unroll: window shapes are static, origins are traced scalars fed
    to dynamic_slice/dynamic_update_slice, so ONE forward body is compiled
    per canvas variant no matter how many windows tile it.  At the real
    Cityscapes protocol (1024x2048, 769^2 windows, ms+flip) the unrolled
    form is dozens of ResNet-101 forwards in a single graph — a compile-time
    blow-up; the scan form keeps it at one body per (scale, flip) variant.

    ``flip``/``scales`` add the full ms+flip benchmark protocol: the whole
    canvas is rescaled (multiples of 8) and/or mirrored, windows slide over
    each variant, and the per-variant averaged probability maps are resized
    back to canvas resolution and summed before the argmax.
    """
    ch, cw = crop_hw
    fh, fw = canvas_hw
    sh, sw = stride_hw or (2 * ch // 3, 2 * cw // 3)
    scales = tuple(float(s) for s in scales)

    def _canvas_probs(params, batch_stats, image):
        """Coverage-averaged softmax map of one canvas variant (any HxW ≥
        nothing: smaller-than-crop canvases are zero-padded up to the crop)."""
        b, h, w = image.shape[0], int(image.shape[1]), int(image.shape[2])
        ph, pw = max(h, ch), max(w, cw)
        if (ph, pw) != (h, w):
            image = jnp.pad(image, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        origins = jnp.asarray(
            [(oy, ox) for oy in _tile_origins(ph, ch, sh)
             for ox in _tile_origins(pw, cw, sw)], jnp.int32)

        def body(carry, o):
            acc, cnt = carry
            oy, ox = o[0], o[1]
            win = jax.lax.dynamic_slice(
                image, (0, oy, ox, 0), (b, ch, cw, image.shape[-1]))
            pred, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, win,
                train=False)
            pred = bilinear_resize(pred, (ch, cw), align_corners=True)
            prob = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(
                    acc, (0, oy, ox, 0), (b, ch, cw, num_classes)) + prob,
                (0, oy, ox, 0))
            cnt = jax.lax.dynamic_update_slice(
                cnt,
                jax.lax.dynamic_slice(cnt, (oy, ox, 0), (ch, cw, 1)) + 1.0,
                (oy, ox, 0))
            return (acc, cnt), None

        (acc, cnt), _ = jax.lax.scan(
            body,
            (jnp.zeros((b, ph, pw, num_classes), jnp.float32),
             jnp.zeros((ph, pw, 1), jnp.float32)),
            origins)
        return (acc / jnp.maximum(cnt, 1.0))[:, :h, :w]

    def eval_step(params, batch_stats, conf_mat, image, label, valid):
        b = image.shape[0]
        total = jnp.zeros((b, fh, fw, num_classes), jnp.float32)
        for s in scales:
            im = image if s == 1.0 else bilinear_resize(
                image, (_round_to_multiple(fh * s), _round_to_multiple(fw * s)),
                align_corners=True)
            variants = [im]
            if flip:
                variants.append(im[:, :, ::-1])
            for k, v in enumerate(variants):
                p = _canvas_probs(params, batch_stats, v)
                if k == 1:
                    p = p[:, :, ::-1]
                if s != 1.0:
                    p = bilinear_resize(p, (fh, fw), align_corners=True)
                total = total + p
        yhat = jnp.argmax(total, axis=-1)
        return conf_mat + _conf_matrix_delta(yhat, label, valid, num_classes,
                                             axis_name)

    return eval_step
