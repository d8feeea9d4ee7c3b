#!/usr/bin/env python
"""On-chip semantics check: fused vs unfused step at the REAL 769^2 recipe.

tools/bench_city_levers.py measured fused_forward at 18.3 img/s vs 9.4
unfused at the Cityscapes shape — a 1.94x jump too large to trust without
a correctness check at the actual config.  The existing equality test
(tests/test_train_step.py::test_fused_step_equals_unfused_metrics) runs a
tiny backbone with no remat, no deep-stem, no OHEM; a fused-path bug that
only bites under those features (e.g. processing half the batch) would
halve the step time while passing that test.

This probe builds the exact cityscapes_769 bench recipe twice (identical
init key / batch / step key), runs N steps of each, and diffs every
returned metric per step.  Identical trajectories => the speedup is real
scheduling/compute, not dropped work.

Usage: python tools/check_fused_city_semantics.py [steps]  (foreground)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(fused):
    import jax
    import jax.numpy as jnp

    from css_tpu.models import build_model
    from css_tpu.train.state import create_train_state, make_optimizer
    from css_tpu.train.train_step import StepConfig, make_train_step

    crop, batch, ncls = 769, 4, 19
    model = build_model(num_classes=ncls, output_dim=256,
                        backbone="resnet101_stem", dtype=jnp.bfloat16,
                        remat=True, remat_policy="nothing")
    tx = make_optimizer(base_lr=6.4e-3, weight_decay=5e-4, total_steps=80000)
    state = create_train_state(jax.random.key(0), model, tx,
                               (1, crop, crop, 3), num_classes=ncls,
                               output_dim=256)
    cfg = StepConfig(num_classes=ncls, crop_hw=(crop, crop),
                     scale_range=(0.5, 2.0), strategy="ori",
                     mix_mode="cutmix", sup_loss="ohem",
                     ohem_min_kept_per_image=50000,
                     negative_mode="sampled_pallas", fused_forward=fused)
    step = jax.jit(make_train_step(model, tx, cfg, axis_name=None),
                   donate_argnums=(0,))
    rng = np.random.default_rng(0)
    b = {
        "l_image": jnp.asarray(rng.random((batch, crop, crop, 3),
                                          dtype=np.float32)),
        "l_label": jnp.asarray(rng.integers(
            0, ncls, size=(batch, crop, crop)).astype(np.int32)),
        "l_valid_hw": jnp.full((batch, 2), crop, jnp.int32),
        "u_image": jnp.asarray(rng.random((batch, crop, crop, 3),
                                          dtype=np.float32)),
        "u_valid_hw": jnp.full((batch, 2), crop, jnp.int32),
    }
    return state, step, b


def run(fused, steps):
    import jax
    import jax.numpy as jnp

    state, step, batch = build(fused)
    key = jax.random.key(1)
    out = []
    for _ in range(steps):
        state, metrics = step(state, batch, key, jnp.float32(1.0),
                              jnp.asarray(False))
        out.append({k: float(jax.device_get(v))
                    for k, v in metrics.items()})
    return out


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    base = run(False, steps)
    fused = run(True, steps)
    worst = 0.0
    for i, (mb, mf) in enumerate(zip(base, fused)):
        row = {}
        for k in sorted(mb):
            d = abs(mb[k] - mf[k])
            rel = d / (abs(mb[k]) + 1e-8)
            row[k] = {"base": round(mb[k], 6), "fused": round(mf[k], 6),
                      "rel": round(rel, 6)}
            if k in ("total", "sup", "unsup", "contrast"):
                worst = max(worst, rel)
        print(json.dumps({"step": i, **row}), flush=True)
    print(json.dumps({"worst_loss_rel_diff": worst,
                      "verdict": "MATCH" if worst < 5e-3 else "DIVERGED"}),
          flush=True)


if __name__ == "__main__":
    import os
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("CSS_TPU_CACHE",
                                         "/tmp/css_tpu_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    main()
