"""Standalone checkpoint evaluation: confusion-matrix mIoU on the val split.

The reference has no inference/eval entry point — evaluation only happens
inside the training loop (ori_pseudo.py:191-211).  This CLI evaluates any
saved checkpoint (teacher by default, like the training loop; ``--student``
for the student weights) and prints per-class IoU + mIoU.

    python evaluate.py --config css_tpu/config/VOC_config_baseline.yaml \
        --checkpoint checkpoints/VOC_92_baseline/best_model \
        --num_labels 92 [--synthetic]
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str,
                   default="css_tpu/config/VOC_config_baseline.yaml")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num_labels", type=int, default=92)
    p.add_argument("--student", action="store_true",
                   help="evaluate the student instead of the EMA teacher")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--txt_dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--sliding", action="store_true",
                   help="paper-protocol sliding-window eval over the full "
                        "canvas (overlapping crop-size windows, averaged "
                        "probabilities) instead of the reference's single "
                        "random crop")
    p.add_argument("--stride", type=int, default=None,
                   help="sliding-window stride (default 2/3 of crop)")
    p.add_argument("--flip", action="store_true",
                   help="test-time augmentation: average softmax "
                        "probabilities with the horizontally flipped input")
    p.add_argument("--scales", type=str, default="1.0",
                   help="test-time augmentation: comma-separated input "
                        "rescales to average over (e.g. 0.75,1.0,1.25); "
                        "composes with --sliding and --flip")
    args = p.parse_args()
    try:
        scales = tuple(float(s) for s in args.scales.split(",") if s.strip())
    except ValueError:
        p.error(f"--scales must be positive floats, got {args.scales!r}")
    if not scales or any(s <= 0 for s in scales):
        p.error(f"--scales must be positive floats, got {args.scales!r}")

    from css_tpu.utils.preempt import apply_platform_override

    apply_platform_override()  # CSS_TPU_PLATFORM=cpu forces host runs

    import os
    import sys

    if not os.path.exists(args.checkpoint):
        sys.exit(f"error: checkpoint not found: {args.checkpoint}")

    import jax
    import jax.numpy as jnp

    from css_tpu.cli.train_main import _evaluate, _make_loaders
    from css_tpu.config import load_config
    from css_tpu.models import build_model
    from css_tpu.parallel import DATA_AXIS, data_mesh, sharded_eval_step
    from css_tpu.train.checkpoint import restore_checkpoint
    from css_tpu.train.state import create_train_state, make_optimizer
    from css_tpu.train.train_step import make_eval_step, make_sliding_eval_step

    cfg = load_config(args.config)
    if args.data_dir:
        cfg.set("Dataset.data_dir", args.data_dir)
    if args.txt_dir:
        cfg.set("Dataset.txt_dir", args.txt_dir)
    if args.synthetic:
        cfg.set("Dataset.name", "Synthetic")

    num_classes = cfg.require("Network.num_class")
    crop = tuple(cfg.require("Dataset.crop_size"))
    model = build_model(
        num_classes=num_classes,
        output_dim=cfg.get("Network.output_dim", 256),
        backbone=cfg.get("Network.backbone", "resnet101"),
        dtype=jnp.bfloat16 if cfg.get("Network.dtype", "bfloat16") == "bfloat16"
        else jnp.float32,
    )
    tx = make_optimizer(1e-3, 0.0, 1)
    state = create_train_state(
        jax.random.key(0), model, tx, (1, crop[0], crop[1], 3),
        num_classes=num_classes, output_dim=cfg.get("Network.output_dim", 256),
    )
    state, epoch, best = restore_checkpoint(args.checkpoint, state)
    if args.student:
        state = state.replace(ema_params=state.params,
                              ema_batch_stats=state.batch_stats)

    class _A:  # loader args shim
        num_labels = args.num_labels
        synthetic = args.synthetic

    mesh = data_mesh()
    batch = cfg.require("Dataset.batch_size") * mesh.devices.size
    _, _, test_loader = _make_loaders(cfg, _A, batch)
    if args.sliding:
        canvas = tuple(cfg.get("Dataset.canvas_size", crop))
        stride = (args.stride, args.stride) if args.stride else None
        step_fn = make_sliding_eval_step(model, num_classes, canvas, crop,
                                         stride, DATA_AXIS,
                                         flip=args.flip, scales=scales)
    else:
        step_fn = make_eval_step(model, num_classes, DATA_AXIS,
                                 flip=args.flip, scales=scales)
    eval_step = sharded_eval_step(step_fn, mesh)
    cm = _evaluate(eval_step, state, test_loader, crop, num_classes,
                   jax.random.key(cfg.get("Seed", 3407)), mesh,
                   full_canvas=args.sliding)
    which = "student" if args.student else "teacher"
    names = _class_names(num_classes)
    for i, (name, iou) in enumerate(zip(names, cm.iou)):
        print(f"  class {i:2d} {name:<15s} IoU "
              f"{'nan' if np.isnan(iou) else f'{iou:.4f}'}")
    print(f"checkpoint epoch {epoch} ({which}): mIoU {cm.miou:.4f} "
          f"(best recorded {best:.4f})")


def _class_names(num_classes: int):
    """Human-readable class names for per-class IoU printing."""
    voc = ["background", "aeroplane", "bicycle", "bird", "boat", "bottle",
           "bus", "car", "cat", "chair", "cow", "diningtable", "dog",
           "horse", "motorbike", "person", "pottedplant", "sheep", "sofa",
           "train", "tvmonitor"]
    cityscapes = ["road", "sidewalk", "building", "wall", "fence", "pole",
                  "traffic light", "traffic sign", "vegetation", "terrain",
                  "sky", "person", "rider", "car", "truck", "bus", "train",
                  "motorcycle", "bicycle"]
    for names in (voc, cityscapes):
        if len(names) == num_classes:
            return names
    return [f"class_{i}" for i in range(num_classes)]

