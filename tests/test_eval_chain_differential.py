"""Eval-chain differential: reference ``test()`` vs css_tpu ``_evaluate``.

Round-2 verdict missing #2: the eval pieces were each proven (ConfMatrix
bit-exact, model forward atol 3e-3, transform exact) but the CHAIN — decode
JPEG/PNG from disk -> pad/crop -> normalize -> teacher forward -> x4
bilinear upsample -> argmax -> confusion matrix — was never run end-to-end
against the reference on the same files with the same weights.

Here both stacks consume the same on-disk mini VOC tree
(test_end_to_end._write_voc_tree):

  reference (ori_pseudo.py:191-211): the actual ``Pascal_VOC_Dataset`` +
  torch DataLoader + ``ConfMatrix`` + ``mean_intersection_over_union``,
  driving a converted-weight ``DeepLabv3Plus_with_rep`` on CPU;

  css_tpu: the actual ``BatchLoader`` over ``build_dataset_specs`` (native
  C++ JPEG/PNG decode when built) + ``make_eval_step`` + ``_evaluate``.

Determinism: every image is written smaller than the crop, so the
reference's random val crop (VOC.py:44-45 -> RandomCrop.get_params on the
exactly-crop-sized padded image) and our uniform crop-offset draw both
collapse to (0, 0) — the chain is crop-deterministic and only argmax
near-ties (f32 forward noise ~3e-3 between frameworks) can differ.

Assertions:
  * per-class target counts (confusion-matrix row sums) are BIT-EXACT —
    this pins the entire data chain: decode, 255->ignore, reflect pad,
    crop, label routing;
  * matrix disagreement is bounded by the argmax-flip budget (<2% of
    pixels);
  * the resulting mIoU agrees within 0.03.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import _refshim
from test_end_to_end import _write_voc_tree

pytestmark = pytest.mark.slow

C, D, CROP = 6, 16, 40


@pytest.fixture(scope="module")
def ref():
    _refshim.import_reference()
    _refshim.ensure_dist()
    import generalframeworks.dataset_helpers.VOC as ref_voc
    import generalframeworks.networks.deeplabv3.deeplabv3 as ref_dlv3
    import generalframeworks.util.meter as ref_meter
    import generalframeworks.util.miou as ref_miou

    return dict(voc=ref_voc, dlv3=ref_dlv3, meter=ref_meter, miou=ref_miou)


def test_eval_chain_matches_reference(ref, tmp_path):
    from test_reference_differential import _PlainResNet

    from css_tpu.cli.train_main import _evaluate
    from css_tpu.data import BatchLoader, build_dataset_specs, read_split_lists
    from css_tpu.models.convert import convert_full_model
    from css_tpu.models.deeplabv3 import DeepLabV3PlusDual
    from css_tpu.models.resnet import ResNetBackbone, StageSpec
    from css_tpu.train.train_step import make_eval_step

    data_root, txt_dir = _write_voc_tree(tmp_path / "VOC", n_labeled=2,
                                         n_unlabeled=2, n_val=5, num_labels=2)

    # ---- reference stack: dataset + loader + ConfMatrix + test() body ----
    torch.manual_seed(0)
    net = ref["dlv3"].DeepLabv3Plus_with_rep(
        _PlainResNet(), dilate_scale=8, num_classes=C, output_dim=D)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()

    _, _, test_idx = ref["voc"].get_pascal_idx_via_txt(
        os.path.join(txt_dir), label_num=2, seed=3407)
    test_ds = ref["voc"].Pascal_VOC_Dataset(
        data_root, test_idx, crop_size=(CROP, CROP), scale_size=(1.0, 1.0),
        augmentation=False, train=False)
    loader = torch.utils.data.DataLoader(test_ds, batch_size=2)
    meter = ref["meter"].ConfMatrix(num_classes=C, fmt=":6.4f")
    with torch.no_grad():
        for image, label in loader:           # ori_pseudo.py:198-206
            pred, _ = net(image)
            pred = torch.nn.functional.interpolate(
                pred, size=label.shape[1:], mode="bilinear",
                align_corners=True)
            meter.update(pred.argmax(1).flatten(), label.flatten())
    ref_mat = meter.mat.numpy()
    ref_miou = float(ref["miou"].mean_intersection_over_union(meter.mat))

    # ---- css_tpu stack: BatchLoader (native decode) + _evaluate ----
    backbone = ResNetBackbone(stages=(
        StageSpec(64, 1, 1, 1, 1), StageSpec(128, 1, 2, 1, 1),
        StageSpec(256, 1, 1, 1, 2), StageSpec(512, 1, 1, 2, 4)),
        deep_stem=False)
    model = DeepLabV3PlusDual(backbone=backbone, num_classes=C, output_dim=D)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = convert_full_model(sd, model)

    class _EvalState:
        ema_params = params
        ema_batch_stats = stats

    _, test_spec = build_dataset_specs("VOC", data_root, (CROP, CROP), C)
    _, _, test_ids = read_split_lists(txt_dir, 2, 3407)
    assert test_ids == test_idx
    test_loader = BatchLoader(test_spec, test_ids, 2, seed=0, shuffle=False,
                              drop_last=False)
    eval_step = jax.jit(make_eval_step(model, C, axis_name=None))
    cm = _evaluate(eval_step, _EvalState(), test_loader, (CROP, CROP), C,
                   jax.random.key(0))
    our_mat = np.asarray(cm.mat)

    # the label-side chain must agree exactly; prediction-side flips bounded
    total = ref_mat.sum()
    np.testing.assert_array_equal(ref_mat.sum(1), our_mat.sum(1))
    disagreement = np.abs(ref_mat - our_mat).sum() / 2
    print(f"[eval-chain] pixels={total} cell_disagreement={disagreement} "
          f"({100.0 * disagreement / total:.3f}%) "
          f"miou ref={ref_miou:.4f} ours={cm.miou:.4f}")
    assert disagreement / total < 0.02, (ref_mat, our_mat)
    assert abs(ref_miou - cm.miou) < 0.03, (ref_miou, cm.miou)


def _write_city_tree(root, n_val=5, num_classes=C, hw=(36, 30)):
    """Mini on-disk Cityscapes layout: leftImg8bit/val/<city>/<id>.png RGB
    images + gtFine/val/<city>/<id mapped>_gtFine_trainIds.png labels, plus
    the txt split protocol (reference Cityscapes.py:87-101, 219-225)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    ids = []
    for i in range(n_val):
        city = "frankfurt" if i % 2 == 0 else "munster"
        sid = f"{city}_{i:06d}_000019_leftImg8bit"
        img_dir = os.path.join(root, "leftImg8bit", "val", city)
        lab_dir = os.path.join(root, "gtFine", "val", city)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lab_dir, exist_ok=True)
        h, w = hw
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lab = rng.integers(0, num_classes, size=(h, w)).astype(np.uint8)
        lab[rng.random((h, w)) < 0.05] = 255
        Image.fromarray(img).save(os.path.join(img_dir, f"{sid}.png"))
        Image.fromarray(lab, mode="L").save(os.path.join(
            lab_dir, f"{sid[:-len('_leftImg8bit')]}_gtFine_trainIds.png"))
        ids.append(sid)
    txt_dir = os.path.join(root, "splits")
    d = os.path.join(txt_dir, "2", "3407")
    os.makedirs(d)
    for name, content in (("labeled_filename.txt", ids[:1]),
                          ("unlabeled_filename.txt", ids[:1]),
                          ("valid_filename.txt", ids)):
        with open(os.path.join(d, name), "w") as f:
            f.write("\n".join(content) + "\n")
    return root, txt_dir, ids


def test_eval_chain_matches_reference_cityscapes(ref, tmp_path):
    """Same chain differential on the Cityscapes layout: pins the
    leftImg8bit/gtFine path mapping (Cityscapes.py:219-225), the RGB-PNG
    native decode, and the trainIds label routing."""
    import importlib

    from test_reference_differential import _PlainResNet

    from css_tpu.cli.train_main import _evaluate
    from css_tpu.data import BatchLoader, build_dataset_specs, read_split_lists
    from css_tpu.models.convert import convert_full_model
    from css_tpu.models.deeplabv3 import DeepLabV3PlusDual
    from css_tpu.models.resnet import ResNetBackbone, StageSpec
    from css_tpu.train.train_step import make_eval_step

    ref_city = importlib.import_module(
        "generalframeworks.dataset_helpers.Cityscapes")
    data_root, txt_dir, _ = _write_city_tree(str(tmp_path / "City"))

    torch.manual_seed(1)
    net = ref["dlv3"].DeepLabv3Plus_with_rep(
        _PlainResNet(), dilate_scale=8, num_classes=C, output_dim=D)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()

    _, _, test_idx = ref_city.get_cityscapes_idx_via_txt(txt_dir, 2, 3407)
    test_ds = ref_city.Cityscapes_Dataset(
        data_root, test_idx, crop_size=(CROP, CROP), scale_size=(1.0, 1.0),
        augmentation=False, train=False)
    loader = torch.utils.data.DataLoader(test_ds, batch_size=2)
    meter = ref["meter"].ConfMatrix(num_classes=C, fmt=":6.4f")
    with torch.no_grad():
        for image, label in loader:
            pred, _ = net(image)
            pred = torch.nn.functional.interpolate(
                pred, size=label.shape[1:], mode="bilinear",
                align_corners=True)
            meter.update(pred.argmax(1).flatten(), label.flatten())
    ref_mat = meter.mat.numpy()
    ref_miou = float(ref["miou"].mean_intersection_over_union(meter.mat))

    backbone = ResNetBackbone(stages=(
        StageSpec(64, 1, 1, 1, 1), StageSpec(128, 1, 2, 1, 1),
        StageSpec(256, 1, 1, 1, 2), StageSpec(512, 1, 1, 2, 4)),
        deep_stem=False)
    model = DeepLabV3PlusDual(backbone=backbone, num_classes=C, output_dim=D)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = convert_full_model(sd, model)

    class _EvalState:
        ema_params = params
        ema_batch_stats = stats

    _, test_spec = build_dataset_specs("CityScapes", data_root, (CROP, CROP), C)
    _, _, test_ids = read_split_lists(txt_dir, 2, 3407)
    assert test_ids == test_idx
    test_loader = BatchLoader(test_spec, test_ids, 2, seed=0, shuffle=False,
                              drop_last=False)
    eval_step = jax.jit(make_eval_step(model, C, axis_name=None))
    cm = _evaluate(eval_step, _EvalState(), test_loader, (CROP, CROP), C,
                   jax.random.key(0))
    our_mat = np.asarray(cm.mat)

    total = ref_mat.sum()
    np.testing.assert_array_equal(ref_mat.sum(1), our_mat.sum(1))
    disagreement = np.abs(ref_mat - our_mat).sum() / 2
    print(f"[eval-chain/city] pixels={total} cell_disagreement={disagreement} "
          f"({100.0 * disagreement / total:.3f}%) "
          f"miou ref={ref_miou:.4f} ours={cm.miou:.4f}")
    assert disagreement / total < 0.02, (ref_mat, our_mat)
    assert abs(ref_miou - cm.miou) < 0.03, (ref_miou, cm.miou)
