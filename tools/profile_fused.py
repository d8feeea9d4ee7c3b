#!/usr/bin/env python
"""Ablation: fused vs two-pass step time on the VOC recipe (1 chip).

Prints ms/step for fused_forward in {False, True} at a given negative_mode.
"""

import os
import sys
import time


def main(mode="expected_pallas"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from css_tpu.models import build_model
    from css_tpu.train.state import create_train_state, make_optimizer
    from css_tpu.train.train_step import StepConfig, make_train_step

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("CSS_TPU_CACHE", "/tmp/css_tpu_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    B, CROP = 8, 512
    model = build_model(num_classes=21, output_dim=256, backbone="resnet101",
                        dtype=jnp.bfloat16)
    tx = make_optimizer(6.4e-3, 5e-4, 80000)
    state0 = create_train_state(jax.random.key(0), model, tx,
                                (1, CROP, CROP, 3), 21, 256)
    rng = np.random.default_rng(0)
    batch = {
        "l_image": jnp.asarray(rng.random((B, CROP, CROP, 3), dtype=np.float32)),
        "l_label": jnp.asarray(rng.integers(0, 21, (B, CROP, CROP)).astype(np.int32)),
        "l_valid_hw": jnp.full((B, 2), CROP, jnp.int32),
        "u_image": jnp.asarray(rng.random((B, CROP, CROP, 3), dtype=np.float32)),
        "u_valid_hw": jnp.full((B, 2), CROP, jnp.int32),
    }
    key = jax.random.key(1)
    w, flag = jnp.float32(1.0), jnp.asarray(False)

    for fused in (False, True):
        cfg = StepConfig(num_classes=21, crop_hw=(CROP, CROP),
                         scale_range=(0.5, 1.5), strategy="ori",
                         mix_mode="cutmix", negative_mode=mode,
                         fused_forward=fused)
        step = jax.jit(make_train_step(model, tx, cfg, axis_name=None))
        state = state0
        for _ in range(3):
            state, m = step(state, batch, key, w, flag)
        jax.device_get(m["total"])
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = step(state, batch, key, w, flag)
        jax.device_get(m["total"])
        dt = (time.perf_counter() - t0) / 10
        print(f"fused={fused} mode={mode}: {dt*1e3:.1f} ms/step "
              f"({2*B/dt:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
