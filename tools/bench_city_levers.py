#!/usr/bin/env python
"""On-chip A/B of Cityscapes 769^2 step levers (round 4).

The round-4 trace (docs/perf_round4.md) shows two costs the VOC pass never
had at this weight: 65 ms/step of ``add_any`` (weight-gradient accumulation
across the two sequential labeled/unlabeled student passes — reference
order ddp_model.py:60-64) and 51 ms/step of ``convert_element_type`` at
the BatchNorm-statistics f32 boundaries.  Two levers target them:

  * ``fused``  — StepConfig.fused_forward: one batched b8 student pass with
    GroupedBatchNorm per-half statistics (semantics-exact,
    tests/test_train_step.py::test_fused_step_equals_unfused_metrics).
    wgrads are then computed once over the fused batch: no cross-pass
    accumulation.  Measured a wash at 512^2 (docs/perf_round3.md); the
    769^2 step has 3.5x the add_any weight.
  * BN-stat reduce form (if toggled in resnet.py) — covered by re-running
    ``base`` across code variants; this script only parameterizes
    StepConfig.

Usage:  python tools/bench_city_levers.py [variant ...]
        variants: base fused  (default: both)

Run in FOREGROUND or via nohup from a live shell (the remote-TPU tunnel
env does not survive detached shells, CLAUDE.md).  First 769^2 compile
takes >10 min cold; the persistent cache (/tmp/css_tpu_xla_cache) makes
repeats fast.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402

# bench.main() normally wires the persistent XLA cache; calling
# bench.bench_recipe directly must do the same or every 769^2 variant
# recompiles >10 min cold
try:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("CSS_TPU_CACHE",
                                     "/tmp/css_tpu_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


VARIANTS = {
    "base": {},
    "fused": {"fused_forward": True},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    out = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            img_s = bench.bench_recipe(
                backbone="resnet101_stem", crop=769, batch=4,
                sup_loss="ohem", negative_mode="sampled_pallas",
                remat=True, num_classes=19,
                cfg_overrides=VARIANTS[name],
            )
            out[name] = round(img_s, 3)
        except Exception as e:  # compile blow-ups are a known 769^2 hazard
            out[name] = f"error: {type(e).__name__}: {e}"
        print(json.dumps({"variant": name, "img_per_s": out[name],
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    print(json.dumps({"cityscapes_769_levers": out}), flush=True)


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
