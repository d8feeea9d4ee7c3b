#!/usr/bin/env python
"""Capture a device trace of the train step and print the top ops.

Runs a few steps of a recipe under jax.profiler.trace, then parses the
xplane protobuf with xprof's tool converters and prints the top-N HLO ops by
self time — the ground truth for where the step time goes.

Usage: python tools/profile_trace.py [mode] [out_dir] [recipe] [fused]
  mode:   negative_mode (default expected_pallas); recipe: voc|city
  fused:  pass the literal word 'fused' to trace StepConfig.fused_forward
          (the Cityscapes recipe default since round 5 — one batched l+u
          student pass with per-half GroupedBatchNorm statistics)
  city = the Cityscapes baseline (769^2, b4, 19 classes, deep-stem,
  OHEM, full backbone remat — exactly bench.py's cityscapes_769 recipe)
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(mode="expected_pallas", out_dir="/tmp/css_trace", recipe="voc",
            fused=False):
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

    if recipe == "city":
        B, CROP, C = 4, 769, 19
        model = build_model(num_classes=C, output_dim=256,
                            backbone="resnet101_stem", dtype=jnp.bfloat16,
                            remat=True)
        sup_loss, scale = "ohem", (0.5, 2.0)
    else:
        B, CROP, C = 8, 512, 21
        model = build_model(num_classes=C, output_dim=256,
                            backbone="resnet101", dtype=jnp.bfloat16)
        sup_loss, scale = "ce", (0.5, 1.5)
    tx = make_optimizer(6.4e-3, 5e-4, 80000)
    state = create_train_state(jax.random.key(0), model, tx,
                               (1, CROP, CROP, 3), C, 256)
    rng = np.random.default_rng(0)
    batch = {
        "l_image": jnp.asarray(rng.random((B, CROP, CROP, 3), dtype=np.float32)),
        "l_label": jnp.asarray(rng.integers(0, C, (B, CROP, CROP)).astype(np.int32)),
        "l_valid_hw": jnp.full((B, 2), CROP, jnp.int32),
        "u_image": jnp.asarray(rng.random((B, CROP, CROP, 3), dtype=np.float32)),
        "u_valid_hw": jnp.full((B, 2), CROP, jnp.int32),
    }
    key, w, flag = jax.random.key(1), jnp.float32(1.0), jnp.asarray(False)
    cfg = StepConfig(num_classes=C, crop_hw=(CROP, CROP),
                     scale_range=scale, strategy="ori", sup_loss=sup_loss,
                     ohem_min_kept_per_image=50000,
                     mix_mode="cutmix", negative_mode=mode,
                     fused_forward=fused)
    step = jax.jit(make_train_step(model, tx, cfg, axis_name=None))
    for _ in range(3):
        state, m = step(state, batch, key, w, flag)
    jax.device_get(m["total"])

    with jax.profiler.trace(out_dir):
        for _ in range(3):
            state, m = step(state, batch, key, w, flag)
        jax.device_get(m["total"])
    return out_dir


def report(out_dir, top=40):
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane.pb under {out_dir}"
    xspace = [paths[-1]]
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xspace, "framework_op_stats", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    lines = data.splitlines()
    print(lines[0])
    # csv: rank, host/device, type, name, occurrences, total_time, avg,
    # total_self_time, avg self, fraction columns...
    for ln in lines[1:top + 1]:
        print(ln)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "expected_pallas"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/css_trace"
    recipe = sys.argv[3] if len(sys.argv) > 3 else "voc"
    fused = len(sys.argv) > 4 and sys.argv[4] == "fused"
    d = capture(mode, out, recipe, fused)
    report(d)
