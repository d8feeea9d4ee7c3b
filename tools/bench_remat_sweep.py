#!/usr/bin/env python
"""Sweep per-stage backbone rematerialization on the Cityscapes 769^2 recipe.

Round-3 follow-up to the 512^2 remat no-go (docs/perf_round3.md): at 512^2
remat LOSES throughput at every granularity because the step is conv-FLOP
dominated, but the 769^2 deep-stem recipe *requires* remat to fit 16 GB HBM
— the open question is whether it needs remat on EVERY stage or whether a
partial set (e.g. layer3+4 only, the largest activation producers at
97^2x1024/2048ch) fits and runs faster.

Per variant: build the full bench recipe (bench.bench_recipe) and report
img/s, catching XLA RESOURCE_EXHAUSTED as an explicit OOM verdict.  Run
on the real chip:

    python tools/bench_remat_sweep.py            # default variant list
    python tools/bench_remat_sweep.py 2,3 3      # explicit stage sets
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import bench_recipe  # noqa: E402


def _enable_compile_cache():
    # same persistent cache bench.main() uses — without it every 769^2
    # variant recompiles cold (>10 min each)
    import jax
    cache_dir = os.environ.get("CSS_TPU_CACHE", "/tmp/css_tpu_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def parse_variant(spec: str):
    if spec in ("true", "all"):
        return True
    if spec in ("false", "none"):
        return False
    return tuple(int(s) for s in spec.split(",") if s)


def main():
    _enable_compile_cache()
    if len(sys.argv) > 1:
        variants = [parse_variant(s) for s in sys.argv[1:]]
    else:
        # all stages (current bench setting) first to pin the baseline,
        # then progressively less remat until OOM
        variants = [True, (1, 2, 3), (2, 3), (3,), (2,), False]

    results = {}
    for remat in variants:
        tag = ("all" if remat is True else
               "none" if remat is False else
               "L" + "+".join(str(i + 1) for i in remat))
        t0 = time.perf_counter()
        try:
            img_s = bench_recipe(
                backbone="resnet101_stem", crop=769, batch=4,
                sup_loss="ohem", negative_mode="sampled_pallas",
                remat=remat, num_classes=19)
            results[tag] = round(img_s, 3)
            print(f"remat={tag}: {img_s:.3f} img/s "
                  f"({time.perf_counter() - t0:.0f}s incl. compile)",
                  flush=True)
        except Exception as e:
            msg = str(e)
            oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
            results[tag] = "OOM" if oom else f"error: {type(e).__name__}"
            print(f"remat={tag}: {'OOM' if oom else msg.splitlines()[0]}",
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
