#!/usr/bin/env python
"""Ablation timing of the train step on the real chip.

Usage: python tools/profile_step.py <mode>
  modes: fwd | full | nocontrast | noaug | teacher
Prints per-iteration wall time (device_get-synchronized).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.models import build_model
from css_tpu.train.state import create_train_state, make_optimizer
from css_tpu.train.train_step import StepConfig, make_train_step

BATCH, CROP = 8, 512


def main(mode: str):
    dtype = jnp.bfloat16
    model = build_model(num_classes=21, output_dim=256, backbone="resnet101",
                        dtype=dtype)
    tx = make_optimizer(6.4e-3, 5e-4, 80000)
    state = create_train_state(jax.random.key(0), model, tx,
                               (1, CROP, CROP, 3), 21, 256)
    rng = np.random.default_rng(0)
    batch = {
        "l_image": jnp.asarray(rng.random((BATCH, CROP, CROP, 3), dtype=np.float32)),
        "l_label": jnp.asarray(rng.integers(0, 21, size=(BATCH, CROP, CROP)).astype(np.int32)),
        "l_valid_hw": jnp.full((BATCH, 2), CROP, jnp.int32),
        "u_image": jnp.asarray(rng.random((BATCH, CROP, CROP, 3), dtype=np.float32)),
        "u_valid_hw": jnp.full((BATCH, 2), CROP, jnp.int32),
    }
    print(f"mode={mode} init done", flush=True)

    if mode == "fwd":
        x = batch["l_image"]

        @jax.jit
        def fn(params, stats, img):
            (p, r), _ = model.apply({"params": params, "batch_stats": stats},
                                    img, train=True, mutable=["batch_stats"])
            return p.astype(jnp.float32).sum()

        args = (state.params, state.batch_stats, x)
        run = lambda i: fn(*args)
    elif mode == "teacher":
        from css_tpu.ops.augment import (batch_transform, normalize_imagenet,
                                         to_channel_first, to_channel_last)
        from css_tpu.ops.interpolate import bilinear_resize
        from css_tpu.ops.mixing import mix_batch

        @jax.jit
        def fn(state, batch, key):
            u_cf = to_channel_first(batch["u_image"])
            u = to_channel_last(normalize_imagenet(u_cf, channel_axis=-3))
            (pred, _), _ = model.apply(
                {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
                u, train=True, mutable=["batch_stats"])
            large = bilinear_resize(pred, (CROP, CROP), align_corners=True)
            probs = jax.nn.softmax(large, axis=-1)
            conf = jnp.max(probs, -1)
            lab = jnp.argmax(probs, -1).astype(jnp.int32)
            hw = jnp.full((BATCH, 2), CROP, jnp.int32)
            k1, k2, k3 = jax.random.split(key, 3)
            img, labs, confs = batch_transform(k1, u_cf, lab[:, None], conf[:, None],
                                               hw, (CROP, CROP), (0.5, 1.5), False)
            img, labs, confs = mix_batch(k2, img, labs, confs, "cutmix", 21)
            img, labs, confs = batch_transform(k3, img, labs, confs, hw,
                                               (CROP, CROP), (1.0, 1.0), True)
            return img.astype(jnp.float32).sum()

        run = lambda i: fn(state, batch, jax.random.fold_in(jax.random.key(2), i))
    else:
        cfg = StepConfig(
            num_classes=21, crop_hw=(CROP, CROP), scale_range=(0.5, 1.5),
            strategy="ori",
            mix_mode="none" if mode == "noaug" else "cutmix",
            contrast_enabled=(mode != "nocontrast"),
        )
        step = jax.jit(make_train_step(model, tx, cfg, axis_name=None))
        key = jax.random.key(1)
        w = jnp.float32(1.0)
        flag = jnp.asarray(False)

        def run(i):
            _, m = step(state, batch, jax.random.fold_in(key, i), w, flag)
            return m["total"]

    t0 = time.perf_counter()
    jax.device_get(run(0))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        jax.device_get(run(i + 1))
        times.append(time.perf_counter() - t0)
    print(f"{mode}: {1000 * np.mean(times):.1f} ms/iter (min {1000 * np.min(times):.1f})",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
