"""Differential fidelity: css_tpu vs the ACTUAL reference code.

Round-1 verdict: all goldens so far were re-derivations written by the
builder — they verify the builder's *reading* of the reference, not the
reference itself.  These tests import /root/reference (PyTorch, PIL) through
tests/_refshim.py and compare css_tpu against the reference's own functions
on identical inputs:

* ``Attention_Threshold_Loss`` (loss/loss.py:48-64)        — exact
* ``ProbOhemCrossEntropy2d``   (loss/loss.py:8-46)         — exact, 3 regimes
* ``Contrast_Loss``            (loss/loss.py:66-149)       — prototype EMA
  trajectory exact; sampled-loss distribution over seeds within noise
* ``transform`` geometry       (dataset_helpers/VOC.py:64-124) — forced
  (scale, crop) params, pixel-level label/confidence agreement
* ``PolyLR`` / ``RampdownScheduler`` (scheduler/*)          — exact
* full ``Model_mix.forward``   (networks/ddp_model.py:99-156) — converted
  weights, deterministic-augmentation configuration

The max observed deviations are recorded in PARITY.md ("differential
fidelity" table).
"""

import random

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import _refshim

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    _refshim.import_reference()
    _refshim.ensure_dist()
    import generalframeworks.loss.loss as ref_loss
    import generalframeworks.dataset_helpers.VOC as ref_voc
    import generalframeworks.scheduler.my_lr_scheduler as ref_polylr
    import generalframeworks.scheduler.rampscheduler as ref_ramp
    import generalframeworks.networks.ddp_model as ref_ddp

    return dict(loss=ref_loss, voc=ref_voc, polylr=ref_polylr, ramp=ref_ramp,
                ddp=ref_ddp)


# --------------------------------------------------------------------------
# losses: exact
# --------------------------------------------------------------------------

def test_attention_threshold_loss_exact(ref):
    from css_tpu.losses.threshold import attention_threshold_loss

    torch.manual_seed(0)
    crit = ref["loss"].Attention_Threshold_Loss(strong_threshold=0.97)
    worst = 0.0
    for trial in range(5):
        b, c, h, w = 3, 21, 17, 19
        pred = torch.randn(b, c, h, w)
        labels = torch.randint(-1, c, (b, h, w))
        # every image needs >=1 valid pixel (the reference's documented
        # 0/0 NaN otherwise, threshold.py:9-12)
        labels[0, 0, 0] = 2
        labels[1, 0, 0] = 3
        labels[2, 0, 0] = 4
        conf = torch.rand(b, h, w)
        want = crit(pred, labels.long(), conf).item()
        got = float(attention_threshold_loss(
            jnp.asarray(pred.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(labels.numpy()),
            jnp.asarray(conf.numpy()),
            strong_threshold=0.97,
        ))
        worst = max(worst, abs(want - got))
    assert worst < 1e-5, worst


@pytest.mark.parametrize("min_kept", [50, 2000, 10**6])
def test_ohem_cross_entropy_exact(ref, min_kept):
    from css_tpu.losses.cross_entropy import ohem_cross_entropy

    torch.manual_seed(min_kept)
    crit = ref["loss"].ProbOhemCrossEntropy2d(
        ignore_label=-1, thresh=0.7, min_kept=min_kept)
    b, c, h, w = 2, 19, 33, 31
    pred = torch.randn(b, c, h, w) * 3
    labels = torch.randint(-1, c, (b, h, w))
    want = crit(pred, labels.long().clone()).item()
    got = float(ohem_cross_entropy(
        jnp.asarray(pred.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(labels.numpy()),
        thresh=0.7, min_kept=min_kept,
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


# --------------------------------------------------------------------------
# contrastive: prototype trajectory exact; loss distribution within noise
# --------------------------------------------------------------------------

def _contrast_inputs(seed, b=2, c=6, d=16, h=9, w=9):
    rng = np.random.default_rng(seed)
    rep = rng.standard_normal((b, d, h, w)).astype(np.float32)
    lab = rng.integers(0, c, size=(b, h, w))
    onehot = np.eye(c, dtype=np.float32)[lab].transpose(0, 3, 1, 2)
    mask = (rng.random((b, 1, h, w)) > 0.3).astype(np.float32)
    logits = rng.standard_normal((b, c, h, w)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    return rep, onehot, mask, prob


def _ref_contrast(ref, rep, onehot, mask, prob, protos, q, g):
    crit = ref["loss"].Contrast_Loss(
        num_queries=q, num_negatives=g, temp=0.5,
        strong_threshold=0.97, alpha=0.99)
    loss = crit(
        torch.from_numpy(rep), torch.from_numpy(onehot),
        torch.from_numpy(mask), torch.from_numpy(prob), protos)
    return float(loss.item())


def _ours_contrast(rep, onehot, mask, prob, protos, key, q, g, mode="sampled"):
    from css_tpu.losses.contrastive import prototype_contrastive_loss

    loss, new_protos = prototype_contrastive_loss(
        jnp.asarray(rep.transpose(0, 2, 3, 1)),
        jnp.asarray(onehot.transpose(0, 2, 3, 1)),
        jnp.asarray(mask[:, 0]),
        jnp.asarray(prob.transpose(0, 2, 3, 1)),
        jnp.asarray(protos), key,
        num_queries=q, num_negatives=g, temp=0.5,
        strong_threshold=0.97, alpha=0.99, negative_mode=mode,
    )
    return float(loss), np.asarray(new_protos)


def test_contrast_prototype_trajectory_exact(ref):
    c, d = 6, 16
    ref_protos = torch.zeros(c, d)
    our_protos = np.zeros((c, d), np.float32)
    worst = 0.0
    for step in range(4):
        rep, onehot, mask, prob = _contrast_inputs(100 + step)
        torch.manual_seed(step)
        np.random.seed(step)
        _ref_contrast(ref, rep, onehot, mask, prob, ref_protos, q=8, g=16)
        _, our_protos = _ours_contrast(
            rep, onehot, mask, prob, our_protos, jax.random.key(step), q=8, g=16)
        dev = np.abs(ref_protos.numpy() - our_protos).max()
        worst = max(worst, float(dev))
    assert worst < 1e-4, worst


def test_contrast_sampled_loss_distribution(ref):
    q, g, trials = 32, 64, 40
    rep, onehot, mask, prob = _contrast_inputs(7)
    base_protos = np.random.default_rng(3).standard_normal((6, 16)).astype(np.float32)

    ref_vals, our_vals = [], []
    for t in range(trials):
        torch.manual_seed(1000 + t)
        np.random.seed(1000 + t)
        ref_vals.append(_ref_contrast(
            ref, rep, onehot, mask, prob, torch.from_numpy(base_protos.copy()),
            q=q, g=g))
        loss, _ = _ours_contrast(
            rep, onehot, mask, prob, base_protos.copy(),
            jax.random.key(2000 + t), q=q, g=g)
        our_vals.append(loss)

    ref_m, our_m = np.mean(ref_vals), np.mean(our_vals)
    se = np.sqrt(np.var(ref_vals) / trials + np.var(our_vals) / trials)
    assert abs(ref_m - our_m) < 4 * se + 0.02, (ref_m, our_m, se)

    # the deterministic expected-negatives mode must sit inside the same
    # sampling noise band (it is the G->inf limit of the reference estimator)
    exp_loss, _ = _ours_contrast(
        rep, onehot, mask, prob, base_protos.copy(), jax.random.key(1),
        q=q, g=g, mode="expected")
    assert abs(ref_m - exp_loss) < 6 * np.std(ref_vals) / np.sqrt(trials) + 0.05

    # the gather-free thinned-multinomial estimator (sampled_pallas;
    # multiplicities drawn XLA-side, streamed through the Pallas kernel on
    # TPU / a dense dot on CPU) is a Monte-Carlo estimator of the same
    # objective — same seed-distribution band
    sp_vals = []
    for t in range(trials):
        loss, _ = _ours_contrast(
            rep, onehot, mask, prob, base_protos.copy(),
            jax.random.key(3000 + t), q=q, g=g, mode="sampled_pallas")
        sp_vals.append(loss)
    sp_m = np.mean(sp_vals)
    se_sp = np.sqrt(np.var(ref_vals) / trials + np.var(sp_vals) / trials)
    assert abs(ref_m - sp_m) < 4 * se_sp + 0.02, (ref_m, sp_m, se_sp)


# --------------------------------------------------------------------------
# geometry: reference `transform` vs apply_geometric at forced params
# --------------------------------------------------------------------------

def _pil_inputs(seed, h, w):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    lab = rng.integers(0, 21, size=(h, w)).astype(np.uint8)
    lab[rng.random((h, w)) < 0.1] = 255
    conf = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    return (Image.fromarray(img, "RGB"), Image.fromarray(lab, "L"),
            Image.fromarray(conf, "L"), img, lab, conf)


@pytest.mark.parametrize("ratio,canvas,crop", [
    (1.3377, (97, 123), (64, 64)),    # upscale, crop inside
    (1.0, (97, 123), (64, 64)),       # identity scale
    (0.6123, (97, 123), (48, 48)),    # downscale, crop inside
    (0.8321, (45, 60), (64, 64)),     # downscale + reflect/ignore pad
])
def test_transform_geometry_agreement(ref, ratio, canvas, crop):
    from css_tpu.ops.augment import apply_geometric

    h0, w0 = canvas
    ch, cw = crop
    pil_img, pil_lab, pil_conf, img, lab, conf = _pil_inputs(5, h0, w0)

    rh, rw = int(h0 * ratio), int(w0 * ratio)
    ph, pw = max(rh, ch), max(rw, cw)
    rng = np.random.default_rng(11)
    i = int(rng.integers(0, ph - ch + 1))
    j = int(rng.integers(0, pw - cw + 1))

    # force the reference's randomness: scale_size=(r, r) pins the ratio;
    # RandomCrop.get_params (our shim) is patched to the chosen offset
    import torchvision.transforms as tvt

    orig_get = tvt.RandomCrop.get_params
    tvt.RandomCrop.get_params = staticmethod(lambda im, output_size: (i, j, ch, cw))
    try:
        ref_img, ref_lab, ref_conf = ref["voc"].transform(
            pil_img, pil_lab, pil_conf, crop_size=(ch, cw),
            scale_size=(ratio, ratio), augmentation=False)
    finally:
        tvt.RandomCrop.get_params = orig_get

    ref_img = ref["voc"].denormalise(ref_img).numpy()          # [3, ch, cw] in [0,1]
    ref_lab = ref_lab.numpy()[0]                                # -1 = ignore
    ref_conf = ref_conf.numpy()[0]

    labels = np.where(lab == 255, -1, lab.astype(np.int32))
    out_img, out_lab, out_conf = apply_geometric(
        jnp.asarray(img.transpose(2, 0, 1).astype(np.float32) / 255.0),
        jnp.asarray(labels[None]),
        jnp.asarray(conf[None].astype(np.float32) / 255.0),
        jnp.asarray([h0, w0], jnp.int32), (ch, cw),
        jnp.float32(ratio),
        jnp.float32((i + 0.5) / (ph - ch + 1)),
        jnp.float32((j + 0.5) / (pw - cw + 1)),
    )
    out_lab = np.asarray(out_lab[0])
    out_conf = np.asarray(out_conf[0])

    # nearest label/confidence maps: pixel-for-pixel, except exact-boundary
    # ties — when a source coordinate lands exactly on an integer pixel
    # boundary, PIL (f64) and our f32 mapping may round to different (both
    # valid) neighbours; ties flip whole rows/columns, so bound the number
    # of distinct mismatching lines instead of a tiny pixel fraction.
    mism = ref_lab != out_lab
    bad_rows = np.unique(np.nonzero(mism)[0])
    bad_cols = np.unique(np.nonzero(mism)[1])
    assert min(len(bad_rows), len(bad_cols)) <= 2, (len(bad_rows), len(bad_cols))
    conf_mism = np.abs(ref_conf - out_conf) > 1e-6
    bad_rows_c = np.unique(np.nonzero(conf_mism)[0])
    bad_cols_c = np.unique(np.nonzero(conf_mism)[1])
    assert min(len(bad_rows_c), len(bad_cols_c)) <= 2, (
        len(bad_rows_c), len(bad_cols_c))

    # image: PIL's BILINEAR law (antialiased triangle on downscale) is
    # reproduced exactly by the dense interpolation matrices; residual is
    # bf16 tap quantization + PIL's own uint8 rounding (1-2 uint8 steps).
    img_err = np.abs(ref_img - np.asarray(out_img)).max()
    assert img_err < 3.0 / 255.0, img_err


def test_crop_offset_distribution_matches(ref):
    """Ours: floor(u*(p-crop+1)); reference: randint(0, p-crop+1)."""
    p, c, n = 90, 64, 20000
    u = jax.random.uniform(jax.random.key(0), (n,))
    ours = np.asarray(jnp.floor(u * (p - c + 1)).astype(jnp.int32))
    torch.manual_seed(0)
    theirs = torch.randint(0, p - c + 1, (n,)).numpy()
    assert ours.min() == 0 and ours.max() == p - c
    hist_o = np.bincount(ours, minlength=p - c + 1) / n
    hist_t = np.bincount(theirs, minlength=p - c + 1) / n
    assert np.abs(hist_o - hist_t).max() < 0.01


# --------------------------------------------------------------------------
# schedulers: exact
# --------------------------------------------------------------------------

def test_polylr_matches_reference(ref):
    from css_tpu.train.schedulers import poly_lr

    model = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(model.parameters(), lr=6.4e-3)
    sched = ref["polylr"].PolyLR(opt, max_iters=100, power=0.9, min_lr=1e-4)
    for it in range(100):
        want = opt.param_groups[0]["lr"]
        got = float(poly_lr(it, base_lr=6.4e-3, total_steps=100,
                            power=0.9, min_lr=1e-4))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        opt.step()
        sched.step()


def test_rampdown_matches_reference(ref):
    from css_tpu.train.schedulers import rampdown_value

    sched = ref["ramp"].RampdownScheduler(
        begin_epoch=2, max_epoch=40, current_epoch=0, max_value=1.0,
        min_value=0.1, ramp_mult=-5.0)
    for epoch in range(50):
        want = sched.value
        got = float(rampdown_value(epoch, begin_epoch=2, max_epoch=40,
                                   max_value=1.0, min_value=0.1,
                                   ramp_mult=-5.0))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
        sched.step()


# --------------------------------------------------------------------------
# full Model_mix forward with converted weights
# --------------------------------------------------------------------------

class _PlainBottleneck(torch.nn.Module):
    """torchvision Bottleneck layout (conv-stride on conv2)."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        f = torch.nn.functional
        y = f.relu(self.bn1(self.conv1(x)))
        y = f.relu(self.bn2(self.conv2(y)))
        return f.relu(self.bn3(self.conv3(y)) + idt)


class _PlainResNet(torch.nn.Module):
    """Minimal torchvision-resnet-shaped trunk ([1,1,1,1] bottleneck) for
    feeding the reference's DeepLabv3Plus_with_rep surgery (deeplabv3.py:
    93-96,135-149) on CPU in reasonable time."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = torch.nn.Sequential(_PlainBottleneck(64, 64))
        self.layer2 = torch.nn.Sequential(_PlainBottleneck(256, 128, stride=2))
        self.layer3 = torch.nn.Sequential(_PlainBottleneck(512, 256, stride=2))
        self.layer4 = torch.nn.Sequential(_PlainBottleneck(1024, 512, stride=2))


def test_model_mix_forward_matches_reference(ref):
    from css_tpu.models.convert import convert_full_model
    from css_tpu.models.deeplabv3 import DeepLabV3PlusDual
    from css_tpu.models.resnet import ResNetBackbone, StageSpec
    from css_tpu.ops.interpolate import bilinear_resize
    from css_tpu.train.train_step import _rep_space_probs

    torch.manual_seed(0)
    b, hw, c, d = 2, 65, 21, 32
    config = {"Dataset": {"crop_size": (hw, hw), "scale_size": (1.0, 1.0),
                          "mix_mode": "none"}}
    model = ref["ddp"].Model_mix(
        _PlainResNet(), num_classes=c, output_dim=d, config=config, temp=0.5)
    model.train()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    protos = np.random.default_rng(0).standard_normal((c, d)).astype(np.float32)

    # raw uint8-exact images so the PIL round trip inside the forward
    # (denormalize -> uint8 -> re-normalize) is lossless
    rng = np.random.default_rng(1)
    l_raw = rng.integers(0, 256, size=(b, hw, hw, 3)).astype(np.float32) / 255.0
    u_raw = rng.integers(0, 256, size=(b, hw, hw, 3)).astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    l_img = torch.from_numpy(((l_raw - mean) / std).transpose(0, 3, 1, 2)).contiguous()
    u_img = torch.from_numpy(((u_raw - mean) / std).transpose(0, 3, 1, 2)).contiguous()

    # identity-scale config + photometric gates forced off => the only
    # remaining stochastic op is disabled; forward becomes deterministic.
    # The PIL round trip still truncates pixels to uint8 (to_pil_image uses
    # mul(255).byte()), so spy on batch_transform_2 to capture the exact
    # image the reference's student consumed.
    captured = {}
    orig_bt2 = ref["ddp"].batch_transform_2

    def spy_bt2(*a, **k):
        out = orig_bt2(*a, **k)
        captured["img"] = out[0].clone()
        return out

    orig_rand = torch.rand
    torch.rand = lambda *a, **k: torch.zeros(*a) if a else orig_rand(**k)
    ref["ddp"].batch_transform_2 = spy_bt2
    try:
        with torch.no_grad():
            (pred_l_large, pred_u_large, aug_label, aug_conf_cls, aug_conf_rep,
             rep_all, prob_all) = model(
                l_img, u_img, torch.from_numpy(protos.copy()))
    finally:
        torch.rand = orig_rand
        ref["ddp"].batch_transform_2 = orig_bt2

    # ---- css_tpu side: converted weights, same wrapper math ----
    sd = {k: v.detach().numpy() for k, v in model.model.state_dict().items()}
    backbone = ResNetBackbone(stages=(
        StageSpec(64, 1, 1, 1, 1), StageSpec(128, 1, 2, 1, 1),
        StageSpec(256, 1, 1, 1, 2), StageSpec(512, 1, 1, 2, 4)),
        deep_stem=False)
    our_model = DeepLabV3PlusDual(backbone=backbone, num_classes=c, output_dim=d)
    params, stats = convert_full_model(sd, our_model)
    variables = {"params": params, "batch_stats": stats}

    def apply_train(img_nhwc):
        (pred, rep), _ = our_model.apply(
            variables, jnp.asarray(img_nhwc), train=True,
            mutable=["batch_stats"])
        return pred, rep

    l_nhwc = (l_raw - mean) / std
    u_nhwc = (u_raw - mean) / std

    # teacher: rep-space + cls-space pseudo labels (ddp_model.py:102-118)
    pred_u_t, rep_u_t = apply_train(u_nhwc)
    sim = _rep_space_probs(rep_u_t, jnp.asarray(protos))
    sim_large = bilinear_resize(sim, (hw, hw), align_corners=True)
    rep_probs = jax.nn.softmax(sim_large / 0.5, axis=-1)
    lab_rep = jnp.argmax(rep_probs, axis=-1)
    pred_large = bilinear_resize(pred_u_t, (hw, hw), align_corners=True)
    cls_probs = jax.nn.softmax(pred_large, axis=-1)
    lab_cls = jnp.argmax(cls_probs, axis=-1)
    conf_cls = jnp.max(cls_probs, axis=-1)
    conf_rep = jnp.max(rep_probs, axis=-1)
    agreed = jnp.where(lab_cls == lab_rep, lab_cls, -1)

    # the reference's aug is configured to identity => student sees the
    # round-tripped teacher image; feed ours the identical pixels
    ref_lab = aug_label.numpy()
    got_lab = np.asarray(agreed)
    assert np.mean(ref_lab != got_lab) < 0.01

    # aug conf maps were uint8-quantized by the reference's PIL round trip
    np.testing.assert_allclose(np.asarray(conf_cls), aug_conf_cls.numpy(),
                               atol=8e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(conf_rep), aug_conf_rep.numpy(),
                               atol=8e-3, rtol=1e-2)

    # student halves + rep-space prob_all (ddp_model.py:140-155); the
    # unlabeled student consumes the captured (uint8-truncated) aug image
    pred_l_s, rep_l_s = apply_train(l_nhwc)
    u_student_nhwc = captured["img"].numpy().transpose(0, 2, 3, 1)
    pred_u_s, rep_u_s = apply_train(u_student_nhwc)
    pred_l_s_large = bilinear_resize(pred_l_s, (hw, hw), align_corners=True)
    pred_u_s_large = bilinear_resize(pred_u_s, (hw, hw), align_corners=True)
    np.testing.assert_allclose(
        np.asarray(pred_l_s_large).transpose(0, 3, 1, 2),
        pred_l_large.numpy(), atol=3e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(pred_u_s_large).transpose(0, 3, 1, 2),
        pred_u_large.numpy(), atol=3e-3, rtol=1e-2)

    rep_all_ours = jnp.concatenate([rep_l_s, rep_u_s])
    sim_all = _rep_space_probs(rep_all_ours, jnp.asarray(protos))
    prob_all_ours = jax.nn.softmax(sim_all / 0.5, axis=-1)
    np.testing.assert_allclose(
        np.asarray(prob_all_ours).transpose(0, 3, 1, 2),
        prob_all.numpy(), atol=5e-3, rtol=1e-2)


# --------------------------------------------------------------------------
# mixing mask geometry, one-hot encodings, confusion matrix / mIoU
# --------------------------------------------------------------------------

def test_cutout_mask_geometry_distribution(ref):
    """generate_cutout_mask (VOC.py:518-534) vs cutout_box_mask: identical
    (w, h, corner) laws => matching mask-area distributions."""
    from css_tpu.ops.mixing import cutout_box_mask

    h, w, n = 40, 56, 1500
    np.random.seed(0)
    ref_means = np.array([
        ref["voc"].generate_cutout_mask([h, w], ratio=2).numpy().mean()
        for _ in range(n)])
    keys = jax.random.split(jax.random.key(0), n)
    ours = jax.vmap(lambda k: cutout_box_mask(k, (h, w), ratio=2))(keys)
    our_means = np.asarray(ours.mean(axis=(1, 2)))

    # both should cut ~half the area, with matching spread
    assert abs(ref_means.mean() - our_means.mean()) < 0.01, (
        ref_means.mean(), our_means.mean())
    assert abs(ref_means.std() - our_means.std()) < 0.01


def test_classmix_mask_distribution(ref):
    """generate_class_mask (VOC.py:511-516): mask = pixels of a uniformly
    chosen half of the present labels (incl. -1 as its own label)."""
    from css_tpu.ops.mixing import class_half_mask

    rng = np.random.default_rng(4)
    lab = rng.integers(-1, 5, size=(24, 24)).astype(np.int64)  # 6 uniques
    k_unique = len(np.unique(lab))
    n = 800

    torch.manual_seed(0)
    ref_sel = np.zeros(6)
    for _ in range(n):
        m = ref["voc"].generate_class_mask(torch.from_numpy(lab)).numpy()
        for ci, c in enumerate(range(-1, 5)):
            sel = m[lab == c]
            assert sel.min() == sel.max()  # whole class in or out
            ref_sel[ci] += sel[0]
    our_sel = np.zeros(6)
    lab32 = jnp.asarray(lab.astype(np.int32))
    for t in range(n):
        m = np.asarray(class_half_mask(jax.random.key(t), lab32, 5))
        for ci, c in enumerate(range(-1, 5)):
            sel = m[lab == c]
            assert sel.min() == sel.max()
            our_sel[ci] += sel[0]
    # each label selected with probability (k//2)/k on both sides
    expect = (k_unique // 2) / k_unique
    np.testing.assert_allclose(ref_sel / n, expect, atol=0.06)
    np.testing.assert_allclose(our_sel / n, expect, atol=0.06)


def test_label_onehot_exact(ref):
    """label_onehot / label_onehot_2 (utils.py:116-136) vs ops/onehot."""
    import generalframeworks.utils as ref_utils

    from css_tpu.ops.onehot import label_onehot, label_onehot_ignore

    rng = np.random.default_rng(1)
    lab = rng.integers(-1, 6, size=(2, 9, 9)).astype(np.int64)

    want = ref_utils.label_onehot(torch.from_numpy(lab), 6).numpy()
    got = np.asarray(label_onehot(jnp.asarray(lab), 6)).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(got, want)

    # label_onehot_2 (+1 shift into C+1 channels) then slice off the ignore
    # channel == label_onehot_ignore (mix_label.py:181-182)
    want2 = ref_utils.label_onehot_2(torch.from_numpy(lab), 6).numpy()[:, 1:]
    got2 = np.asarray(label_onehot_ignore(jnp.asarray(lab), 6)).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(got2, want2)


def test_confusion_matrix_and_miou_exact(ref):
    """util/meter.py ConfMatrix bincount + util/miou.py vs css_tpu metrics."""
    import generalframeworks.util.meter as ref_meter
    import generalframeworks.util.miou as ref_miou

    from css_tpu.utils import ConfusionMatrix

    rng = np.random.default_rng(2)
    n_cls = 7
    target = rng.integers(-1, n_cls, size=(3, 20, 20)).astype(np.int64)
    pred = rng.integers(0, n_cls, size=(3, 20, 20)).astype(np.int64)
    # every class appears on the diagonal so the reference's 0/0 NaN per-class
    # case (miou.py:6) does not trigger
    for c in range(n_cls):
        target[0, 0, c] = c
        pred[0, 0, c] = c

    rm = ref_meter.ConfMatrix(n_cls, fmt=":.4f")
    rm.update(torch.from_numpy(pred), torch.from_numpy(target))
    want_mat = rm.mat.numpy()
    want_miou = ref_miou.mean_intersection_over_union(rm.mat)

    cm = ConfusionMatrix(n_cls)
    ok = (target >= 0) & (target < n_cls)
    idx = np.where(ok, target * n_cls + pred, n_cls * n_cls)
    mat = np.bincount(idx.reshape(-1), minlength=n_cls * n_cls + 1)[:-1]
    cm.update(mat.reshape(n_cls, n_cls).astype(np.int64))
    np.testing.assert_array_equal(cm.mat, want_mat)
    np.testing.assert_allclose(cm.miou, want_miou, rtol=1e-6)


def test_transform_3_multi_map_agreement(ref):
    """transform_3 (VOC.py:198-274) carries 2 label + 2 confidence maps
    through identical geometry; our generic K/L apply must match all four
    at forced parameters."""
    from PIL import Image

    from css_tpu.ops.augment import apply_geometric

    h0, w0, ch, cw, ratio = 80, 90, 56, 56, 1.1517
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(h0, w0, 3), dtype=np.uint8)
    lab1 = rng.integers(0, 21, size=(h0, w0)).astype(np.uint8)
    lab2 = rng.integers(0, 21, size=(h0, w0)).astype(np.uint8)
    c1 = rng.integers(0, 256, size=(h0, w0), dtype=np.uint8)
    c2 = rng.integers(0, 256, size=(h0, w0), dtype=np.uint8)

    rh, rw = int(h0 * ratio), int(w0 * ratio)
    ph, pw = max(rh, ch), max(rw, cw)
    i, j = 13, 21

    import torchvision.transforms as tvt

    orig = tvt.RandomCrop.get_params
    tvt.RandomCrop.get_params = staticmethod(lambda im, output_size: (i, j, ch, cw))
    try:
        out = ref["voc"].transform_3(
            Image.fromarray(img, "RGB"), Image.fromarray(lab1, "L"),
            Image.fromarray(lab2, "L"), Image.fromarray(c1, "L"),
            Image.fromarray(c2, "L"), crop_size=(ch, cw),
            scale_size=(ratio, ratio), augmentation=False)
    finally:
        tvt.RandomCrop.get_params = orig
    _, rl1, rl2, rc1, rc2 = out

    _, ol, oc = apply_geometric(
        jnp.asarray(img.transpose(2, 0, 1).astype(np.float32) / 255.0),
        jnp.asarray(np.stack([lab1, lab2]).astype(np.int32)),
        jnp.asarray(np.stack([c1, c2]).astype(np.float32) / 255.0),
        jnp.asarray([h0, w0], jnp.int32), (ch, cw),
        jnp.float32(ratio),
        jnp.float32((i + 0.5) / (ph - ch + 1)),
        jnp.float32((j + 0.5) / (pw - cw + 1)),
    )
    for want, got in ((rl1.numpy()[0], np.asarray(ol[0])),
                      (rl2.numpy()[0], np.asarray(ol[1]))):
        mism = want != got
        rows, cols = np.unique(np.nonzero(mism)[0]), np.unique(np.nonzero(mism)[1])
        assert min(len(rows), len(cols)) <= 2, (len(rows), len(cols))
    for want, got in ((rc1.numpy()[0], np.asarray(oc[0])),
                      (rc2.numpy()[0], np.asarray(oc[1]))):
        mism = np.abs(want - got) > 1e-6
        rows, cols = np.unique(np.nonzero(mism)[0]), np.unique(np.nonzero(mism)[1])
        assert min(len(rows), len(cols)) <= 2, (len(rows), len(cols))


@pytest.mark.parametrize("op,factor", [
    ("brightness", 0.8), ("brightness", 1.2),
    ("contrast", 0.8), ("contrast", 1.2),
    ("saturation", 0.8), ("saturation", 1.2),
    ("hue", -0.15), ("hue", 0.2),
])
def test_photometric_ops_match_pil(ref, op, factor):
    """Each jitter op at a forced factor vs PIL's ImageEnhance/HSV path
    (what torchvision's ColorJitter executes, VOC.py:97-98).  PIL
    quantizes to uint8 between steps; compare at quantization-level
    tolerance."""
    from PIL import Image

    import torchvision.transforms.functional as tvf

    from css_tpu.ops.photometric import color_jitter

    rng = np.random.default_rng(3)
    img_u8 = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    pil = Image.fromarray(img_u8, "RGB")

    fn = {"brightness": tvf.adjust_brightness,
          "contrast": tvf.adjust_contrast,
          "saturation": tvf.adjust_saturation,
          "hue": tvf.adjust_hue}[op]
    want = np.asarray(fn(pil, factor), np.float32) / 255.0

    ident = (1.0, 1.0)
    ranges = dict(brightness=ident, contrast=ident, saturation=ident,
                  hue=(0.0, 0.0))
    ranges[op] = (factor, factor)
    img_cf = jnp.asarray(img_u8.transpose(2, 0, 1).astype(np.float32) / 255.0)
    got = np.asarray(color_jitter(jax.random.key(0), img_cf, **ranges))
    got = got.transpose(1, 2, 0)

    tol = 0.05 if op == "hue" else 0.02   # PIL quantizes hue to 1/255 turns
    err = np.abs(got - want)
    assert err.mean() < tol / 3 and np.percentile(err, 99) < tol, (
        op, factor, err.mean(), err.max())


def test_loss_gradients_match_reference_autograd(ref):
    """Not just values: dLoss/dlogits of the threshold and OHEM losses must
    match torch autograd (the training signal itself)."""
    from css_tpu.losses.cross_entropy import ohem_cross_entropy
    from css_tpu.losses.threshold import attention_threshold_loss

    torch.manual_seed(5)
    b, c, h, w = 2, 11, 13, 15
    pred_t = torch.randn(b, c, h, w, requires_grad=True)
    labels = torch.randint(-1, c, (b, h, w))
    labels[:, 0, 0] = 1
    conf = torch.rand(b, h, w)

    crit = ref["loss"].Attention_Threshold_Loss(strong_threshold=0.8)
    crit(pred_t, labels.long(), conf).backward()
    want = pred_t.grad.numpy().transpose(0, 2, 3, 1)

    got = np.asarray(jax.grad(lambda p: attention_threshold_loss(
        p, jnp.asarray(labels.numpy()), jnp.asarray(conf.numpy()),
        strong_threshold=0.8))(
        jnp.asarray(pred_t.detach().numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-6)

    pred_t2 = torch.randn(b, c, h, w, requires_grad=True)
    ohem = ref["loss"].ProbOhemCrossEntropy2d(ignore_label=-1, thresh=0.7,
                                              min_kept=120)
    ohem(pred_t2, labels.long().clone()).backward()
    want2 = pred_t2.grad.numpy().transpose(0, 2, 3, 1)
    got2 = np.asarray(jax.grad(lambda p: ohem_cross_entropy(
        p, jnp.asarray(labels.numpy()), thresh=0.7, min_kept=120))(
        jnp.asarray(pred_t2.detach().numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got2, want2, atol=1e-6)


def test_model_cross_forward_matches_reference(ref):
    """Model_cross.forward (ddp_model.py:184-239): both label spaces kept,
    prob_all from rep space at the cross temp."""
    from css_tpu.models.convert import convert_full_model
    from css_tpu.models.deeplabv3 import DeepLabV3PlusDual
    from css_tpu.models.resnet import ResNetBackbone, StageSpec
    from css_tpu.ops.interpolate import bilinear_resize
    from css_tpu.train.train_step import _rep_space_probs

    torch.manual_seed(1)
    b, hw, c, d = 2, 65, 21, 32
    temp = 0.5
    config = {"Dataset": {"crop_size": (hw, hw), "scale_size": (1.0, 1.0),
                          "mix_mode": "none"}}
    model = ref["ddp"].Model_cross(
        _PlainResNet(), num_classes=c, output_dim=d, config=config, temp=temp)
    model.train()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    protos = np.random.default_rng(2).standard_normal((c, d)).astype(np.float32)
    rng = np.random.default_rng(3)
    l_raw = rng.integers(0, 256, size=(b, hw, hw, 3)).astype(np.float32) / 255.0
    u_raw = rng.integers(0, 256, size=(b, hw, hw, 3)).astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    l_img = torch.from_numpy(((l_raw - mean) / std).transpose(0, 3, 1, 2)).contiguous()
    u_img = torch.from_numpy(((u_raw - mean) / std).transpose(0, 3, 1, 2)).contiguous()

    # reference quirk: generate_cut_gather_3 has NO mode='none' passthrough
    # (VOC.py:436-468 — its _1/_2 siblings do), so cross + mix_mode none
    # would crash upstream; stub it to identity for the deterministic run
    orig_rand = torch.rand
    orig_g3 = ref["ddp"].generate_cut_gather_3
    orig_bt3 = ref["ddp"].batch_transform_3
    captured = {}

    def spy_bt3(*a, **k):
        out = orig_bt3(*a, **k)
        captured["img"] = out[0].clone()   # PIL round trip truncates to uint8
        return out

    torch.rand = lambda *a, **k: torch.zeros(*a) if a else orig_rand(**k)
    ref["ddp"].generate_cut_gather_3 = (
        lambda im, l1, l2, g1, g2, mode=None: (im, l1.long(), l2.long(), g1, g2))
    ref["ddp"].batch_transform_3 = spy_bt3
    try:
        with torch.no_grad():
            (_, _, lab_cls_r, lab_rep_r, conf_cls_r, conf_rep_r,
             _, prob_all_r) = model(l_img, u_img, torch.from_numpy(protos.copy()))
    finally:
        torch.rand = orig_rand
        ref["ddp"].generate_cut_gather_3 = orig_g3
        ref["ddp"].batch_transform_3 = orig_bt3

    sd = {k: v.detach().numpy() for k, v in model.model.state_dict().items()}
    backbone = ResNetBackbone(stages=(
        StageSpec(64, 1, 1, 1, 1), StageSpec(128, 1, 2, 1, 1),
        StageSpec(256, 1, 1, 1, 2), StageSpec(512, 1, 1, 2, 4)),
        deep_stem=False)
    our_model = DeepLabV3PlusDual(backbone=backbone, num_classes=c, output_dim=d)
    params, stats = convert_full_model(sd, our_model)
    variables = {"params": params, "batch_stats": stats}

    def apply_train(img_nhwc):
        (pred, rep), _ = our_model.apply(
            variables, jnp.asarray(img_nhwc), train=True,
            mutable=["batch_stats"])
        return pred, rep

    u_nhwc = (u_raw - mean) / std
    pred_u_t, rep_u_t = apply_train(u_nhwc)
    sim = _rep_space_probs(rep_u_t, jnp.asarray(protos))
    sim_large = bilinear_resize(sim, (hw, hw), align_corners=True)
    rep_probs = jax.nn.softmax(sim_large / temp, axis=-1)
    pred_large = bilinear_resize(pred_u_t, (hw, hw), align_corners=True)
    cls_probs = jax.nn.softmax(pred_large, axis=-1)

    # both label spaces survive in cross (ddp_model.py:202)
    assert np.mean(lab_cls_r.numpy() !=
                   np.asarray(jnp.argmax(cls_probs, -1))) < 0.01
    assert np.mean(lab_rep_r.numpy() !=
                   np.asarray(jnp.argmax(rep_probs, -1))) < 0.01
    np.testing.assert_allclose(np.asarray(jnp.max(cls_probs, -1)),
                               conf_cls_r.numpy(), atol=8e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(jnp.max(rep_probs, -1)),
                               conf_rep_r.numpy(), atol=8e-3, rtol=1e-2)

    # student rep-space prob_all at the cross temperature; the unlabeled
    # student consumed the captured (uint8-truncated) aug image
    l_nhwc = (l_raw - mean) / std
    _, rep_l_s = apply_train(l_nhwc)
    _, rep_u_s = apply_train(captured["img"].numpy().transpose(0, 2, 3, 1))
    sim_all = _rep_space_probs(jnp.concatenate([rep_l_s, rep_u_s]),
                               jnp.asarray(protos))
    prob_all = jax.nn.softmax(sim_all / temp, axis=-1)
    np.testing.assert_allclose(
        np.asarray(prob_all).transpose(0, 3, 1, 2), prob_all_r.numpy(),
        atol=5e-3, rtol=1e-2)


def test_model_ori_pseudo_forward_matches_reference(ref):
    """Model_ori_pseudo.forward (ddp_model.py:32-70): logit-space pseudo
    labels from the teacher + dual student forward."""
    from css_tpu.models.convert import convert_full_model
    from css_tpu.models.deeplabv3 import DeepLabV3PlusDual
    from css_tpu.models.resnet import ResNetBackbone, StageSpec
    from css_tpu.ops.interpolate import bilinear_resize

    torch.manual_seed(2)
    b, hw, c, d = 2, 65, 21, 32
    config = {"Dataset": {"crop_size": (hw, hw), "scale_size": (1.0, 1.0),
                          "mix_mode": "none"}}
    model = ref["ddp"].Model_ori_pseudo(
        _PlainResNet(), num_classes=c, output_dim=d, config=config)
    model.train()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(4)
    l_raw = rng.integers(0, 256, size=(b, hw, hw, 3)).astype(np.float32) / 255.0
    u_raw = rng.integers(0, 256, size=(b, hw, hw, 3)).astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    l_img = torch.from_numpy(((l_raw - mean) / std).transpose(0, 3, 1, 2)).contiguous()
    u_img = torch.from_numpy(((u_raw - mean) / std).transpose(0, 3, 1, 2)).contiguous()

    orig_rand = torch.rand
    torch.rand = lambda *a, **k: torch.zeros(*a) if a else orig_rand(**k)
    try:
        with torch.no_grad():
            (pred_l_large_r, _, aug_label_r, aug_conf_r, _, _,
             pred_u_large_raw_r) = model(l_img, u_img)
    finally:
        torch.rand = orig_rand

    sd = {k: v.detach().numpy() for k, v in model.model.state_dict().items()}
    backbone = ResNetBackbone(stages=(
        StageSpec(64, 1, 1, 1, 1), StageSpec(128, 1, 2, 1, 1),
        StageSpec(256, 1, 1, 1, 2), StageSpec(512, 1, 1, 2, 4)),
        deep_stem=False)
    our_model = DeepLabV3PlusDual(backbone=backbone, num_classes=c, output_dim=d)
    params, stats = convert_full_model(sd, our_model)
    variables = {"params": params, "batch_stats": stats}

    def apply_train(img_nhwc):
        (pred, rep), _ = our_model.apply(
            variables, jnp.asarray(img_nhwc), train=True,
            mutable=["batch_stats"])
        return pred, rep

    u_nhwc = (u_raw - mean) / std
    pred_u_t, _ = apply_train(u_nhwc)
    pred_large = bilinear_resize(pred_u_t, (hw, hw), align_corners=True)
    probs = jax.nn.softmax(pred_large, axis=-1)
    np.testing.assert_allclose(
        np.asarray(pred_large).transpose(0, 3, 1, 2),
        pred_u_large_raw_r.numpy(), atol=3e-3, rtol=1e-2)
    assert np.mean(aug_label_r.numpy() !=
                   np.asarray(jnp.argmax(probs, -1))) < 0.01
    np.testing.assert_allclose(np.asarray(jnp.max(probs, -1)),
                               aug_conf_r.numpy(), atol=8e-3, rtol=1e-2)

    pred_l_s, _ = apply_train((l_raw - mean) / std)
    np.testing.assert_allclose(
        np.asarray(bilinear_resize(pred_l_s, (hw, hw),
                                   align_corners=True)).transpose(0, 3, 1, 2),
        pred_l_large_r.numpy(), atol=3e-3, rtol=1e-2)


# --------------------------------------------------------------------------
# the reference's uint8 quantization law (quantize=True parity mode)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("ratio,canvas,crop", [
    (1.3377, (97, 123), (64, 64)),    # upscale
    (1.0, (97, 123), (64, 64)),       # identity scale
    (0.6123, (97, 123), (48, 48)),    # antialiased downscale
    (0.8321, (45, 60), (64, 64)),     # downscale + reflect/ignore pad
    (0.5, (120, 150), (48, 48)),      # 2x antialiased downscale
])
def test_transform_quantized_uint8_law(ref, ratio, canvas, crop):
    """quantize=True vs the reference's TENSOR entry (``batch_transform`` ->
    ``tensor_to_pil`` -> PIL), i.e. with the uint8 round trip live: the
    entry truncation (``mul(255).byte()``) of image and confidence map and
    PIL's fixed-point resample rounding.

    Image: our in-jit f32 triangle weights can land one 2^-22 coefficient
    step off PIL's doubles at rounding boundaries -> rare 1/255 pixels
    (measured <=2.4% of pixels at the worst ratio, max exactly 1/255).
    Confidences/labels: bit-exact up to the nearest-neighbour boundary-tie
    lines the float-mode test already bounds."""
    from css_tpu.ops.augment import apply_geometric

    h0, w0 = canvas
    ch, cw = crop
    rng = np.random.default_rng(7)
    # uint8-born image (decoders emit on-grid pixels -> entry truncation is
    # lossless, as for the reference's uint8 tensors); teacher-like confs
    # genuinely off-grid, kept out of the 2^-12 truncation-epsilon window
    # (q8_floor docstring) which synthetic random floats would hit ~2^-12
    # of the time
    img01 = (rng.integers(0, 256, size=(h0, w0, 3)).astype(np.float32) / 255.0)
    lab = rng.integers(0, 21, size=(h0, w0)).astype(np.int64)
    conf = ((rng.integers(0, 255, size=(h0, w0)) +
             rng.uniform(0.1, 0.9, size=(h0, w0))) / 255.0).astype(np.float32)

    rh, rw = int(h0 * ratio), int(w0 * ratio)
    ph, pw = max(rh, ch), max(rw, cw)
    i = int(rng.integers(0, ph - ch + 1))
    j = int(rng.integers(0, pw - cw + 1))

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    img_norm = torch.from_numpy(
        ((img01 - mean) / std).transpose(2, 0, 1)).float()

    import torchvision.transforms as tvt

    orig_get = tvt.RandomCrop.get_params
    tvt.RandomCrop.get_params = staticmethod(
        lambda im, output_size: (i, j, ch, cw))
    try:
        ref_img, ref_lab, ref_conf = ref["voc"].batch_transform(
            img_norm[None], torch.from_numpy(lab)[None],
            torch.from_numpy(conf)[None], crop_size=(ch, cw),
            scale_size=(ratio, ratio), augmentation=False)
    finally:
        tvt.RandomCrop.get_params = orig_get
    ref_img01 = ref["voc"].denormalise(ref_img[0]).numpy()

    out_img, out_lab, out_conf = apply_geometric(
        jnp.asarray(img01.transpose(2, 0, 1)),
        jnp.asarray(lab.astype(np.int32)[None]),
        jnp.asarray(conf[None]),
        jnp.asarray([h0, w0], jnp.int32), (ch, cw),
        jnp.float32(ratio),
        jnp.float32((i + 0.5) / (ph - ch + 1)),
        jnp.float32((j + 0.5) / (pw - cw + 1)),
        quantize=True,
    )

    img_err = np.abs(ref_img01 - np.asarray(out_img))
    assert img_err.max() <= 1.0 / 255.0 + 1e-6, img_err.max() * 255
    assert np.mean(img_err < 1e-6) > 0.97, np.mean(img_err < 1e-6)

    # conf and labels: identical values except whole boundary-tie lines
    for want, got in ((ref_lab.numpy()[0], np.asarray(out_lab[0])),
                      (ref_conf.numpy()[0], np.asarray(out_conf[0]))):
        mism = np.abs(np.asarray(want, np.float64) -
                      np.asarray(got, np.float64)) > 1e-6
        rows = np.unique(np.nonzero(mism)[0])
        cols = np.unique(np.nonzero(mism)[1])
        assert min(len(rows), len(cols)) <= 2, (len(rows), len(cols))


@pytest.mark.parametrize("op,factor", [
    ("brightness", 0.77), ("brightness", 1.21),
    ("contrast", 0.8), ("contrast", 1.18),
    ("saturation", 0.76), ("saturation", 1.22),
    ("hue", -0.22), ("hue", 0.19), ("hue", 0.25), ("hue", -0.25),
])
def test_quantized_jitter_ops_vs_pil(ref, op, factor):
    """The quantize-mode jitter sub-ops vs PIL's own chain, on the 0..255
    grid: brightness/contrast/saturation are BIT-EXACT (Blend.c truncation,
    fixed-point 'L', ImageStat rounding all reproduced); hue is exact on
    >99.5% of pixels (PIL's C float hue drifts one H step on ~0.3% — see
    _pil_hue_shift255) with error bounded by one hue step's RGB effect."""
    from PIL import Image

    import torchvision.transforms.functional as tvf

    from css_tpu.ops.photometric import (_pil_hue_shift255, _q8_brightness255,
                                         _q8_contrast255, _q8_saturation255)

    rng = np.random.default_rng(3)
    img_u8 = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    pil = Image.fromarray(img_u8, "RGB")
    k = jnp.asarray(img_u8.transpose(2, 0, 1).astype(np.float32))

    fn = {"brightness": tvf.adjust_brightness,
          "contrast": tvf.adjust_contrast,
          "saturation": tvf.adjust_saturation,
          "hue": tvf.adjust_hue}[op]
    want = np.asarray(fn(pil, factor), np.int32)

    ours = {"brightness": _q8_brightness255, "contrast": _q8_contrast255,
            "saturation": _q8_saturation255, "hue": _pil_hue_shift255}[op]
    got = np.asarray(ours(k, jnp.float32(factor))).transpose(1, 2, 0)

    err = np.abs(want - got)
    if op == "hue":
        assert np.mean(err == 0) > 0.995, np.mean(err == 0)
        assert err.max() <= 8, err.max()
    else:
        assert err.max() == 0, (op, factor, err.max(), (err > 0).sum())
