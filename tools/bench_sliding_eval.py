#!/usr/bin/env python
"""On-chip probe: sliding ms+flip eval at the TRUE Cityscapes protocol shape.

Round-4 verdict weak #6: ``make_sliding_eval_step`` had only ever been
compiled at 48^2 test canvases; the north-star comparison needs it at
1024x2048 with 769^2 windows, multi-scale + flip — dozens of ResNet-101
forwards whose compile time / HBM at shape were unknown.  Round 5
restructured the window loop into a ``lax.scan`` over the origin table
(train_step.py make_sliding_eval_step), so the program holds ONE forward
body per (scale, flip) variant regardless of window count.

This probe builds the real model (resnet101_stem, bf16) at the real shape,
compiles the full ms+flip program, and reports:
  * compile wall-time,
  * steady-state sec/image,
  * device HBM stats after the first execution.

Usage: python tools/bench_sliding_eval.py [batch] [scales] [--no-flip]
       defaults: batch 2, scales 0.75,1.0,1.25, flip on.
Run foreground/nohup from a live shell (tunnel env, CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scales = tuple(
        float(s) for s in (sys.argv[2] if len(sys.argv) > 2
                           else "0.75,1.0,1.25").split(","))
    flip = "--no-flip" not in sys.argv

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("CSS_TPU_CACHE",
                                         "/tmp/css_tpu_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from css_tpu.models import build_model
    from css_tpu.train.state import create_train_state, make_optimizer
    from css_tpu.train.train_step import make_sliding_eval_step

    ncls, crop, canvas = 19, (769, 769), (1024, 2048)
    model = build_model(num_classes=ncls, output_dim=256,
                        backbone="resnet101_stem", dtype=jnp.bfloat16)
    state = create_train_state(jax.random.key(0), model,
                               make_optimizer(1e-3, 0.0, 1),
                               (1, crop[0], crop[1], 3), num_classes=ncls,
                               output_dim=256)

    step = jax.jit(make_sliding_eval_step(
        model, ncls, canvas, crop, None, None, flip=flip, scales=scales))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, *canvas, 3), dtype=np.float32))
    lab = jnp.asarray(rng.integers(-1, ncls,
                                   size=(batch, *canvas)).astype(np.int32))
    valid = jnp.ones((batch,), bool)
    zero = jnp.zeros((ncls, ncls), jnp.int32)

    t0 = time.perf_counter()
    mat = step(state.ema_params, state.ema_batch_stats, zero, img, lab, valid)
    jax.device_get(mat)
    compile_and_first = time.perf_counter() - t0

    try:
        mem = jax.local_devices()[0].memory_stats()
        hbm = {k: round(mem[k] / 2**30, 2) for k in
               ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
               if k in mem}
    except Exception:
        hbm = None

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        mat = step(state.ema_params, state.ema_batch_stats, zero, img, lab,
                   valid)
        jax.device_get(mat)
        times.append(time.perf_counter() - t0)
    steady = float(np.median(times))

    print(json.dumps({
        "canvas": canvas, "crop": crop, "batch": batch,
        "scales": scales, "flip": flip,
        "compile_plus_first_exec_s": round(compile_and_first, 1),
        "steady_s_per_batch": round(steady, 2),
        "sec_per_image": round(steady / batch, 2),
        "hbm_gib": hbm,
        "conf_mat_total_px": int(np.asarray(mat).sum()),
    }), flush=True)


if __name__ == "__main__":
    main()
