"""Inference CLI: segment images with a trained checkpoint.

The reference ships no inference entry point at all (SURVEY.md "What it is
NOT") — the only way to see predictions is to re-run training.  This CLI
loads a css_tpu checkpoint (EMA teacher by default, like eval), segments a
directory or list of images, and writes class-index PNGs plus optional
color overlays.

    python predict.py --checkpoint checkpoints/VOC_92/best_model \
        --config css_tpu/config/VOC_config_baseline.yaml \
        --inputs path/to/imgs_or_dir --out_dir preds/ [--sliding] [--overlay]

Images are padded to the model canvas on the host, segmented on device
(whole-canvas single pass, or --sliding for the overlapping-window
protocol), and un-padded before writing.
"""

import argparse
import os


# 21-class VOC colormap (the standard dataset palette, derived bitwise)
def _voc_palette(n):
    pal = []
    for i in range(n):
        r = g = b = 0
        cid = i
        for j in range(8):
            r |= ((cid >> 0) & 1) << (7 - j)
            g |= ((cid >> 1) & 1) << (7 - j)
            b |= ((cid >> 2) & 1) << (7 - j)
            cid >>= 3
        pal.append((r, g, b))
    return pal


# Cityscapes trainId colors (official cityscapesScripts table)
_CITYSCAPES_COLORS = [
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
    (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
    (0, 0, 230), (119, 11, 32),
]


def _colors(num_classes):
    if num_classes == 19:
        return _CITYSCAPES_COLORS
    return _voc_palette(num_classes)


def _gather_inputs(paths):
    exts = (".jpg", ".jpeg", ".png", ".bmp")
    out = []
    for p in paths:
        if os.path.isdir(p):
            out += sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.lower().endswith(exts))
        else:
            out.append(p)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str,
                   default="css_tpu/config/VOC_config_baseline.yaml")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--inputs", type=str, nargs="+", required=True,
                   help="image files and/or directories")
    p.add_argument("--out_dir", type=str, default="./predictions")
    p.add_argument("--student", action="store_true")
    p.add_argument("--sliding", action="store_true",
                   help="overlapping-window inference over the full canvas")
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--overlay", action="store_true",
                   help="also write color overlays (<name>_overlay.png)")
    p.add_argument("--batch_size", type=int, default=4)
    args = p.parse_args()

    from css_tpu.utils.preempt import apply_platform_override

    apply_platform_override()  # CSS_TPU_PLATFORM=cpu forces host runs

    import sys

    if not os.path.exists(args.checkpoint):
        sys.exit(f"error: checkpoint not found: {args.checkpoint}")
    files = _gather_inputs(args.inputs)
    if not files:
        sys.exit("error: no input images found")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from css_tpu.config import load_config
    from css_tpu.models import build_model
    from css_tpu.ops.augment import normalize_imagenet
    from css_tpu.ops.interpolate import bilinear_resize
    from css_tpu.train.checkpoint import restore_checkpoint
    from css_tpu.train.state import create_train_state, make_optimizer
    from css_tpu.train.train_step import _tile_origins

    cfg = load_config(args.config)
    num_classes = cfg.require("Network.num_class")
    crop = tuple(cfg.require("Dataset.crop_size"))
    canvas = tuple(cfg.get("Dataset.canvas_size", crop))
    model = build_model(
        num_classes=num_classes,
        output_dim=cfg.get("Network.output_dim", 256),
        backbone=cfg.get("Network.backbone", "resnet101"),
        dtype=jnp.bfloat16 if cfg.get("Network.dtype", "bfloat16") == "bfloat16"
        else jnp.float32,
    )
    state = create_train_state(
        jax.random.key(0), model, make_optimizer(1e-3, 0.0, 1),
        (1, crop[0], crop[1], 3), num_classes=num_classes,
        output_dim=cfg.get("Network.output_dim", 256),
    )
    state, epoch, _ = restore_checkpoint(args.checkpoint, state)
    params = state.params if args.student else state.ema_params
    stats = state.batch_stats if args.student else state.ema_batch_stats

    ch, cw = canvas
    oys = _tile_origins(ch, crop[0],
                        args.stride or 2 * crop[0] // 3) if args.sliding else [0]
    oxs = _tile_origins(cw, crop[1],
                        args.stride or 2 * crop[1] // 3) if args.sliding else [0]

    @jax.jit
    def predict(params, stats, image):           # image [B, ch, cw, 3] norm.
        acc = jnp.zeros(image.shape[:3] + (num_classes,), jnp.float32)
        cnt = jnp.zeros((ch, cw, 1), jnp.float32)
        windows = ([(oy, ox) for oy in oys for ox in oxs]
                   if args.sliding else [(0, 0)])
        for oy, ox in windows:
            hh = crop[0] if args.sliding else ch
            ww = crop[1] if args.sliding else cw
            win = jax.lax.dynamic_slice(image, (0, oy, ox, 0),
                                        (image.shape[0], hh, ww, 3))
            pred, _ = model.apply({"params": params, "batch_stats": stats},
                                  win, train=False)
            pred = bilinear_resize(pred, (hh, ww), align_corners=True)
            prob = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(
                    acc, (0, oy, ox, 0),
                    (image.shape[0], hh, ww, num_classes)) + prob,
                (0, oy, ox, 0))
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(cnt, (oy, ox, 0), (hh, ww, 1)) + 1.0,
                (oy, ox, 0))
        return jnp.argmax(acc / jnp.maximum(cnt, 1.0), axis=-1)

    os.makedirs(args.out_dir, exist_ok=True)
    colors = np.asarray(_colors(num_classes), np.uint8)
    which = "student" if args.student else "teacher"
    print(f"segmenting {len(files)} image(s) with {which} @ epoch {epoch} "
          f"({'sliding' if args.sliding else 'whole-canvas'})")

    for start in range(0, len(files), args.batch_size):
        chunk = files[start:start + args.batch_size]
        imgs, sizes = [], []
        for f in chunk:
            im = np.asarray(Image.open(f).convert("RGB"), np.uint8)
            oh, ow = im.shape[:2]
            h, w = oh, ow
            if h > ch or w > cw:
                scale = min(ch / h, cw / w)
                im = np.asarray(Image.fromarray(im).resize(
                    (int(w * scale), int(h * scale)), Image.BILINEAR))
                h, w = im.shape[:2]
            pad = np.zeros((ch, cw, 3), np.uint8)
            pad[:h, :w] = im
            imgs.append(pad)
            sizes.append((h, w, oh, ow))
        batch = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
        batch = normalize_imagenet(batch, channel_axis=-1)
        yhat = np.asarray(predict(params, stats, batch))
        for f, pred, (h, w, oh, ow) in zip(chunk, yhat, sizes):
            name = os.path.splitext(os.path.basename(f))[0]
            lab = pred[:h, :w].astype(np.uint8)
            if (h, w) != (oh, ow):
                # inference ran on a downscaled copy; bring the label map
                # back to the original resolution so outputs align with the
                # input pixels (nearest keeps class ids intact)
                lab = np.asarray(Image.fromarray(lab, "L").resize(
                    (ow, oh), Image.NEAREST))
            Image.fromarray(lab, "L").save(
                os.path.join(args.out_dir, f"{name}_pred.png"))
            if args.overlay:
                rgb = colors[lab]
                base = np.asarray(Image.open(f).convert("RGB"), np.uint8)
                mix = (0.5 * base + 0.5 * rgb).astype(np.uint8)
                Image.fromarray(mix).save(
                    os.path.join(args.out_dir, f"{name}_overlay.png"))
    print(f"wrote predictions to {args.out_dir}")

