#!/usr/bin/env python
"""On-chip A/B of remat schedules under the FUSED Cityscapes 769^2 step.

Round 3/4 calibrated remat on the UNFUSED graph: full-backbone remat was
required to fit b4+4 two-pass in 16 GB, and `save_mid` measured a mild
no-go (9.26 vs 9.36 img/s).  The round-5 fused adoption holds ONE set of
student activations instead of two, so less aggressive remat may now fit
and pay: the fused re-trace (docs/perf_round5.md section 5) shows the remat
recompute sweep inside the conv-dominated 408.8 ms step.

Variants (all fused_forward=True, the shipped recipe):
  full      remat=True           — the shipped default, reproduces bench.py
  layer3    remat=(2,)           — remat the 23-block layer3 only
  save_mid  remat_policy=save_mid — keep conv2 outputs, recompute conv1
  none      remat=False          — no remat (16 GB HBM may refuse)

Run in FOREGROUND or via nohup from a live shell (tunnel env, CLAUDE.md).
Each new variant is a >10 min cold 769^2 compile; the persistent cache
makes repeats fast.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402

try:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("CSS_TPU_CACHE",
                                     "/tmp/css_tpu_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


VARIANTS = {
    "full": dict(remat=True),
    "layer3": dict(remat=(2,)),
    "save_mid": dict(remat=True, remat_policy="save_mid"),
    "none": dict(remat=False),
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
                num_classes=19,
                cfg_overrides={"fused_forward": True},
                **VARIANTS[name],
            )
            out[name] = round(img_s, 3)
        except Exception as e:  # HBM refusals are an expected outcome here
            out[name] = f"error: {type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({"variant": name, "img_per_s": out[name],
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    print(json.dumps({"cityscapes_769_fused_remat": out}), flush=True)


if __name__ == "__main__":
    main()
