#!/usr/bin/env python
"""Per-chip batch-size scaling of the VOC train step (v5e, 16 GB HBM).

The recipe batch (8 labeled + 8 unlabeled per chip, reference
VOC_config_baseline.yaml Training_Setting.batch_size) is a *fidelity*
constant, not a hardware limit.  This sweep measures throughput and HBM
headroom at other per-chip batches so deployments that only care about
images/sec (or that shard a smaller global batch over fewer chips) know
the scaling law.  Each batch size is its own XLA program (static shapes);
compiles land in the persistent cache.

Usage:  python tools/bench_scaling.py [--batches 4,8,12,16] [--steps 10]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_batch(batch: int, steps: int, warmup: int = 3) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from css_tpu.models import build_model
    from css_tpu.train.state import create_train_state, make_optimizer
    from css_tpu.train.train_step import StepConfig, make_train_step

    crop, num_classes = 512, 21
    model = build_model(num_classes=num_classes, output_dim=256,
                        backbone="resnet101", dtype=jnp.bfloat16, remat=False)
    tx = make_optimizer(base_lr=6.4e-3, weight_decay=5e-4, total_steps=80000)
    state = create_train_state(
        jax.random.key(0), model, tx, (1, crop, crop, 3),
        num_classes=num_classes, output_dim=256,
    )
    cfg = StepConfig(
        num_classes=num_classes, crop_hw=(crop, crop), scale_range=(0.5, 1.5),
        strategy="ori", mix_mode="cutmix", sup_loss="ce",
        negative_mode="sampled_pallas",
    )
    step = jax.jit(make_train_step(model, tx, cfg, axis_name=None),
                   donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch_d = {
        "l_image": jnp.asarray(
            rng.random((batch, crop, crop, 3), dtype=np.float32)),
        "l_label": jnp.asarray(
            rng.integers(0, num_classes, (batch, crop, crop)).astype(np.int32)),
        "l_valid_hw": jnp.full((batch, 2), crop, jnp.int32),
        "u_image": jnp.asarray(
            rng.random((batch, crop, crop, 3), dtype=np.float32)),
        "u_valid_hw": jnp.full((batch, 2), crop, jnp.int32),
    }

    key, w, flag = jax.random.key(1), jnp.float32(1.0), jnp.asarray(False)
    for _ in range(warmup):
        state, metrics = step(state, batch_d, key, w, flag)
    jax.device_get(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_d, key, w, flag)
    jax.device_get(metrics["total"])
    return 2 * batch * steps / (time.perf_counter() - t0)


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
            rate = bench_batch(b, args.steps)
            out[b] = round(rate, 2)
            print(f"batch {b}+{b}: {rate:.2f} img/s/chip", flush=True)
        except Exception as e:  # OOM marks the HBM ceiling — record and go on
            out[b] = f"error: {type(e).__name__}"
            print(f"batch {b}+{b}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
