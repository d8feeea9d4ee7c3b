#!/usr/bin/env python
"""Per-chip batch-size scaling of the VOC train step (v5e, 16 GB HBM).

The recipe batch (8 labeled + 8 unlabeled per chip, reference
VOC_config_baseline.yaml Training_Setting.batch_size) is a *fidelity*
constant, not a hardware limit.  This sweep measures throughput and HBM
headroom at other per-chip batches so deployments that only care about
images/sec (or that shard a smaller global batch over fewer chips) know
the scaling law.  Each batch size is its own XLA program (static shapes);
compiles land in the persistent cache.

Measured (docs/perf_round3.md): 4/8/12/16 -> 41.3 / 55.6 / 34.5 / 49.2
img/s/chip — the recipe batch is also the hardware optimum.

Usage:  python tools/bench_scaling.py [--batches 4,8,12,16] [--steps 10]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import bench_recipe  # noqa: E402  (the canonical recipe builder)


def main():
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="4,8,12,16")
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/css_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    out = {}
    for b in [int(x) for x in args.batches.split(",")]:
        try:
            rate = bench_recipe(backbone="resnet101", crop=512, batch=b,
                                sup_loss="ce", negative_mode="sampled_pallas",
                                remat=False, steps=args.steps)
            out[b] = round(rate, 2)
            print(f"batch {b}+{b}: {rate:.2f} img/s/chip", flush=True)
        except Exception as e:  # OOM marks the HBM ceiling — record and go on
            out[b] = f"error: {type(e).__name__}"
            print(f"batch {b}+{b}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
