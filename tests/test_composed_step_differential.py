"""Composed full-train-step differential vs the reference ``train()``.

Round-2 verdict missing #1: every *piece* of the train step was diffed
against the reference, but the seam where they compose — teacher pseudo
labels -> contrast prep (weak mask, nearest-downsample to rep res, onehot
l+u concat order) -> sup + unsup + contrast sum -> SGD + EMA + prototype
update — was only ever checked against the builder's own reading.

Here the reference composition is stitched ON CPU exactly as its entry
scripts write it (ori_pseudo.py:149-189, mix_label.py:160-197,
cross_label.py:160-201): the actual ``Model_*`` wrapper forward, the actual
``nn.CrossEntropyLoss`` / ``Attention_Threshold_Loss`` / ``Contrast_Loss``
criteria, the actual contrast-input prep lines, the actual torch SGD
(nesterov) + ``PolyLR`` + ``ema_update`` — and run for TWO optimizer steps
against ``make_train_step`` with converted weights on identical pixels.

Determinism forcing (same recipe as the forward differentials):
  * identity geometry (scale (1,1), canvas == crop) and ``mix_mode='none'``;
  * reference photometric gates forced off (torch.rand -> 0);
  * the reference's student consumes a PIL-uint8-round-tripped image; its
    exact pixels are captured and injected into our step's in-jit
    augmentation (monkeypatched ``batch_transform``) so both students see
    identical inputs;
  * thresholds placed far from the near-uniform confidence values of a
    random-init model (un/weak 0.02 << conf ~1/21 << strong 0.97) so the
    gating masks cannot flip on float noise.

The contrastive loss *gradient* is detached on both sides (ramp weight 0,
exactly the composition the reference runs at epoch 0 of a ramped
schedule, mix_label.py:189-192) because its Monte-Carlo negative draw is
irreducibly stochastic across frameworks; its *value* is compared as a
band, its sampling distribution is matched in
test_reference_differential.py, and its deterministic prototype side effect
is compared tightly here.  Everything else — sup/unsup losses, parameters,
EMA, BN running stats, prototypes — must match step-for-step.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import _refshim

pytestmark = pytest.mark.slow

B, HW, C, D = 2, 65, 21, 32
Q, G = 32, 64
LR, WD, TOTAL_ITER = 0.01, 5e-4, 100
TEMP = 0.5
UN_T, WEAK_T, STRONG_T = 0.02, 0.02, 0.97
ALPHA = 0.99

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


@pytest.fixture(scope="module")
def ref():
    _refshim.import_reference()
    _refshim.ensure_dist()
    import generalframeworks.loss.loss as ref_loss
    import generalframeworks.networks.ddp_model as ref_ddp
    import generalframeworks.scheduler.my_lr_scheduler as ref_polylr
    import generalframeworks.utils as ref_utils

    return dict(loss=ref_loss, ddp=ref_ddp, polylr=ref_polylr, utils=ref_utils)


def _inputs():
    rng = np.random.default_rng(11)
    # uint8-exact raw pixels: the PIL round trip inside the reference
    # forward is then (near-)lossless, and the residue is captured anyway
    l_raw = rng.integers(0, 256, size=(B, HW, HW, 3)).astype(np.float32) / 255.0
    u_raw = rng.integers(0, 256, size=(B, HW, HW, 3)).astype(np.float32) / 255.0
    l_label = rng.integers(0, C, size=(B, HW, HW)).astype(np.int64)
    l_label[:, 0, :2] = 255  # some ignore pixels
    return l_raw, u_raw, l_label


def _build_torch(ref, strategy):
    from test_reference_differential import _PlainResNet

    torch.manual_seed(0)
    config = {"Dataset": {"crop_size": (HW, HW), "scale_size": (1.0, 1.0),
                          "mix_mode": "none"}}
    cls = {"ori": ref["ddp"].Model_ori_pseudo, "mix": ref["ddp"].Model_mix,
           "cross": ref["ddp"].Model_cross}[strategy]
    kw = {} if strategy == "ori" else {"temp": TEMP}
    wrapper = cls(_PlainResNet(), num_classes=C, output_dim=D,
                  ema_alpha=ALPHA, config=config, **kw)
    wrapper.train()
    with torch.no_grad():
        for m in wrapper.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
        # teacher starts as an exact copy (the deepcopy happened before the
        # stat randomization above, so re-sync)
        wrapper.ema_model.load_state_dict(wrapper.model.state_dict())
    return wrapper


def _torch_step(ref, strategy, wrapper, optimizer, scheduler, tensors,
                protos_t, use_rep, captured):
    """One stitched reference train() iteration.  Returns loss components."""
    l_img, l_label_t, u_img = tensors
    utils = ref["utils"]
    ce = torch.nn.CrossEntropyLoss(ignore_index=-1)
    unsup_crit = ref["loss"].Attention_Threshold_Loss(strong_threshold=UN_T)
    contrast_crit = ref["loss"].Contrast_Loss(
        num_queries=Q, num_negatives=G, temp=TEMP,
        strong_threshold=STRONG_T, alpha=ALPHA)

    # spy: the LAST batch_transform* call of the forward produces the exact
    # (uint8-round-tripped) image the reference's student consumes
    bt_name = {"ori": "batch_transform", "mix": "batch_transform_2",
               "cross": "batch_transform_3"}[strategy]
    orig_bt = getattr(ref["ddp"], bt_name)

    def spy_bt(*a, **k):
        out = orig_bt(*a, **k)
        captured["img"] = out[0].clone()
        return out

    # the reference's generate_cut_gather_3 is missing the 'none'
    # short-circuit its _1/_2 siblings have (upstream bug, documented in
    # test_reference_differential); shim the branch the authors plainly
    # intended — the rank-slice passthrough — for the cross composition
    orig_gcg3 = ref["ddp"].generate_cut_gather_3

    def gcg3_with_none(image, label1, label2, logits1, logits2, mode="cutout"):
        if mode == "none":
            return image, label1.long(), label2.long(), logits1, logits2
        return orig_gcg3(image, label1, label2, logits1, logits2, mode=mode)

    orig_rand = torch.rand
    torch.rand = lambda *a, **k: torch.zeros(*a) if a else orig_rand(**k)
    setattr(ref["ddp"], bt_name, spy_bt)
    ref["ddp"].generate_cut_gather_3 = gcg3_with_none
    try:
        if strategy == "ori":
            (pred_l_large, pred_u_large, aug_label, aug_conf, rep_all,
             pred_all, _) = wrapper(l_img, u_img)
            unsup_label, unsup_conf, conf_cls = aug_label, aug_conf, aug_conf
            with torch.no_grad():
                prob_all = torch.softmax(pred_all, dim=1)
            label_u_oh = utils.label_onehot(aug_label, C)
        elif strategy == "mix":
            (pred_l_large, pred_u_large, aug_label, conf_cls, conf_rep,
             rep_all, prob_all) = wrapper(l_img, u_img, protos_t)
            unsup_label, unsup_conf = aug_label, conf_cls
            label_u_oh = utils.label_onehot_2(aug_label, C)[:, 1:]
        else:
            (pred_l_large, pred_u_large, lab_cls, lab_rep, conf_cls,
             conf_rep, rep_all, prob_all) = wrapper(l_img, u_img, protos_t)
            unsup_label = lab_rep if use_rep else lab_cls
            unsup_conf = conf_rep if use_rep else conf_cls
            label_u_oh = utils.label_onehot(lab_cls, C)
    finally:
        torch.rand = orig_rand
        setattr(ref["ddp"], bt_name, orig_bt)
        ref["ddp"].generate_cut_gather_3 = orig_gcg3

    sup = ce(pred_l_large, l_label_t)
    unsup = unsup_crit(pred_u_large, unsup_label, unsup_conf)
    # contrast prep verbatim from ori_pseudo.py:170-180 / mix_label.py:175-183
    small = rep_all.shape[2:]
    with torch.no_grad():
        mask_u = conf_cls.ge(WEAK_T).float()
        mask_all = torch.cat(((l_label_t.unsqueeze(1) >= 0).float(),
                              mask_u.unsqueeze(1)))
        mask_all = F.interpolate(mask_all, size=small, mode="nearest")
        label_l = F.interpolate(utils.label_onehot(l_label_t, C),
                                size=small, mode="nearest")
        label_u = F.interpolate(label_u_oh, size=small, mode="nearest")
        label_all = torch.cat((label_l, label_u))
    contrast = contrast_crit(rep_all, label_all, mask_all, prob_all, protos_t)

    total = sup + unsup + contrast * 0.0   # ramp weight 0 (see module doc)
    optimizer.zero_grad()
    total.backward()
    optimizer.step()
    wrapper.ema_update()
    scheduler.step()
    return dict(sup=sup.item(), unsup=unsup.item(), contrast=contrast.item(),
                unsup_label=unsup_label.detach().clone())


def _build_ours(wrapper, strategy):
    from css_tpu.models.convert import convert_full_model
    from css_tpu.models.deeplabv3 import DeepLabV3PlusDual
    from css_tpu.models.resnet import ResNetBackbone, StageSpec
    from css_tpu.train.state import TrainState, make_optimizer
    from css_tpu.train.train_step import StepConfig, make_train_step

    backbone = ResNetBackbone(stages=(
        StageSpec(64, 1, 1, 1, 1), StageSpec(128, 1, 2, 1, 1),
        StageSpec(256, 1, 1, 1, 2), StageSpec(512, 1, 1, 2, 4)),
        deep_stem=False)
    model = DeepLabV3PlusDual(backbone=backbone, num_classes=C, output_dim=D)
    sd = {k: v.detach().numpy() for k, v in wrapper.model.state_dict().items()}
    params, stats = convert_full_model(sd, model)
    # the converted leaves can be numpy VIEWS aliasing the live torch
    # buffers (and jnp.asarray is ZERO-copy on the CPU backend); force a
    # real copy, or the reference's in-place optimizer/BN updates would
    # silently rewrite our "initial" state before our step consumes it
    params = jax.tree.map(lambda x: jnp.asarray(np.array(x, copy=True)), params)
    stats = jax.tree.map(lambda x: jnp.asarray(np.array(x, copy=True)), stats)
    tx = make_optimizer(base_lr=LR, weight_decay=WD, total_steps=TOTAL_ITER,
                        power=0.9, min_lr=1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params, batch_stats=stats,
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, stats),
        opt_state=tx.init(params),
        prototypes=jnp.zeros((C, D), jnp.float32),  # overwritten by caller
    )
    cfg = StepConfig(
        num_classes=C, crop_hw=(HW, HW), scale_range=(1.0, 1.0),
        strategy=strategy, mix_mode="none", sup_loss="ce",
        un_threshold=UN_T, weak_threshold=WEAK_T, strong_threshold=STRONG_T,
        temp=TEMP, rep_temp=TEMP, num_queries=Q, num_negatives=G,
        proto_alpha=ALPHA, ema_alpha=ALPHA, negative_mode="sampled",
    )
    return model, tx, cfg, state


def _tree_max_diff(a, b):
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, _ = jax.tree.flatten(b)
    return max(float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                     - y.astype(jnp.float32))))
               for x, y in zip(leaves_a, leaves_b))


def _convert_state(wrapper, model):
    from css_tpu.models.convert import convert_full_model

    sd = {k: v.detach().numpy() for k, v in wrapper.model.state_dict().items()}
    esd = {k: v.detach().numpy()
           for k, v in wrapper.ema_model.state_dict().items()}
    p, s = convert_full_model(sd, model)
    ep, es = convert_full_model(esd, model)
    return p, s, ep, es


@pytest.mark.parametrize("strategy", ["ori", "mix", "cross"])
def test_composed_train_step_matches_reference(ref, strategy, monkeypatch):
    import css_tpu.train.train_step as ts
    from css_tpu.train.train_step import make_train_step

    l_raw, u_raw, l_label = _inputs()
    l_img = torch.from_numpy(
        ((l_raw - MEAN) / STD).transpose(0, 3, 1, 2)).contiguous()
    u_img = torch.from_numpy(
        ((u_raw - MEAN) / STD).transpose(0, 3, 1, 2)).contiguous()
    l_label_t = torch.from_numpy(np.where(l_label == 255, -1, l_label))

    wrapper = _build_torch(ref, strategy)
    model, tx, cfg, state = _build_ours(wrapper, strategy)

    if strategy == "mix":
        # mix's agreement labels need prototypes CORRELATED with the
        # teacher's logits (as real training produces — prototypes are EMA
        # class means): with random prototypes almost every pixel disagrees,
        # the reference's unsup weighting (#above-threshold / #valid) blows
        # up ~20x, and the amplified gradients drown the comparison in
        # argmax-flip noise.  Probe class-mean reps on a throwaway copy (the
        # real teacher's BN stats must stay untouched).
        import copy as _copy

        probe = _copy.deepcopy(wrapper.ema_model)
        with torch.no_grad():
            pred_u, rep_u = probe(u_img)
            lab = pred_u.argmax(1).reshape(-1)
            rep = rep_u.permute(0, 2, 3, 1).reshape(-1, D)
            fallback = np.random.default_rng(5).standard_normal((C, D)) * 0.1
            protos0 = np.stack([
                rep[lab == c].mean(0).numpy() if int((lab == c).sum()) > 0
                else fallback[c].astype(np.float32)
                for c in range(C)]).astype(np.float32)
    else:
        protos0 = (np.random.default_rng(5).standard_normal((C, D)) * 0.1
                   ).astype(np.float32)
    protos_t = torch.from_numpy(protos0.copy())
    state = state.replace(prototypes=jnp.asarray(protos0))

    optimizer = torch.optim.SGD(wrapper.model.parameters(), lr=LR,
                                weight_decay=WD, momentum=0.9, nesterov=True)
    scheduler = ref["polylr"].PolyLR(optimizer, TOTAL_ITER, min_lr=1e-4)
    use_rep = strategy == "cross"

    # ---- run the stitched reference step twice, capturing the student's
    # exact augmented input pixels ----
    captured = {}
    torch_logs = []
    for _ in range(2):
        torch_logs.append(_torch_step(
            ref, strategy, wrapper, optimizer, scheduler,
            (l_img, l_label_t, u_img), protos_t, use_rep, captured))

    # the aug chain is deterministic & teacher-independent here, so both
    # steps consumed identical student pixels; denormalize for injection
    cap = captured["img"].numpy()                  # [B, 3, H, W] normalized
    cap_raw01 = cap * STD[None, :, None, None] + MEAN[None, :, None, None]
    cap_raw01 = jnp.asarray(np.clip(cap_raw01, 0.0, 1.0))

    # ---- our step: monkeypatch the in-step augmentation to (a) identity
    # geometry / no photometrics, (b) inject the captured student pixels at
    # the post-mixing photometric call (call index 3 of 4 per step) ----
    calls = {"n": 0}

    def forced_bt(key, img, labels, confs, valid_hw, *, crop_hw, scale_range,
                  augmentation):
        i = calls["n"]
        calls["n"] += 1
        if i % 4 == 3:
            img = cap_raw01
        return img, labels, confs

    monkeypatch.setattr(ts, "batch_transform", forced_bt)
    step = jax.jit(make_train_step(model, tx, cfg, axis_name=None))

    batch = {
        "l_image": jnp.asarray(l_raw),
        "l_label": jnp.asarray(l_label.astype(np.int32)),
        "l_valid_hw": jnp.full((B, 2), HW, jnp.int32),
        "u_image": jnp.asarray(u_raw),
        "u_valid_hw": jnp.full((B, 2), HW, jnp.int32),
    }
    our_logs = []
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.key(0),
                              jnp.float32(0.0), jnp.asarray(use_rep))
        our_logs.append(jax.device_get(metrics))

    # ---- component-by-component comparison, both steps ----
    report = {}
    for si, (t, o) in enumerate(zip(torch_logs, our_logs)):
        report[f"step{si}_sup"] = abs(t["sup"] - float(o["sup"]))
        report[f"step{si}_unsup"] = abs(t["unsup"] - float(o["unsup"]))
        report[f"step{si}_contrast"] = abs(t["contrast"] - float(o["contrast"]))
        assert report[f"step{si}_sup"] < 5e-3, report
        # pseudo-label argmax ties at random init flip ~1% of pixels between
        # the two frameworks' f32 forwards; the unsup CE moves proportionally
        assert report[f"step{si}_unsup"] < 0.025 * max(1.0, t["unsup"]), report
        # Monte-Carlo estimators of the same InfoNCE objective (different
        # but distribution-matched samplers): band check only
        assert report[f"step{si}_contrast"] < 1.0, report

    # ---- one optimizer/EMA/prototype/BN update deep (x2 steps) ----
    p_t, s_t, ep_t, es_t = _convert_state(wrapper, model)
    report["params"] = _tree_max_diff(p_t, state.params)
    report["ema_params"] = _tree_max_diff(ep_t, state.ema_params)
    report["batch_stats"] = _tree_max_diff(s_t, state.batch_stats)
    report["ema_batch_stats"] = _tree_max_diff(es_t, state.ema_batch_stats)
    report["prototypes"] = float(jnp.max(jnp.abs(
        jnp.asarray(protos_t.numpy()) - state.prototypes)))
    print(f"[composed:{strategy}] " + " ".join(
        f"{k}={v:.2e}" for k, v in report.items()))
    # measured (2026-08, 2 steps): ori/cross params ~1e-3, stats ~1.4e-3,
    # protos ~2e-4; one step alone is ~4e-5 on params — the second step
    # compounds pseudo-label argmax-flip noise.  mix runs ~40x noisier at
    # the parameter level because its agreement labels XOR TWO argmax
    # chains: every cross-framework flip toggles a pixel between "class c"
    # and "ignored" in the unsup CE (measured params 4e-2 with losses still
    # matching to 0.2%).  Structural faults sit orders above all bands (the
    # biased-vs-Bessel running-var bug this test caught was 0.63).
    tol = {"params": 2.5e-3, "ema_params": 1.5e-3, "batch_stats": 3e-3,
           "ema_batch_stats": 3e-3, "prototypes": 2e-3}
    if strategy == "mix":
        tol.update(params=1e-1, ema_params=5e-2, batch_stats=8e-3,
                   ema_batch_stats=8e-3)
    for key, t in tol.items():
        assert report[key] < t, (key, report)
