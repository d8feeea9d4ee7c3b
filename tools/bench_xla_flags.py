#!/usr/bin/env python
"""Sweep XLA:TPU compiler options on the primary VOC recipe.

The step is 71% convolutions at 61% conv-MFU (docs/perf_round3.md); the
remaining generic lever is the compiler's own scheduling/fusion knobs.

TPU-specific flags cannot go through XLA_FLAGS on this box: the local
client is a tunnel to a remote TPU service, and the client-side
parse_flags_from_env rejects flags its own (non-TPU) XLA build doesn't
know.  Instead we pass them as per-compile ``compiler_options`` (XLA
env_option_overrides), which travel with the compile request to the
service that does understand them.

Usage: python tools/bench_xla_flags.py [variant ...]
"""

import json
import sys
import time

VARIANTS = {
    "baseline": {},
    # scoped VMEM cap for fusions: v5e has 128 MiB VMEM; a low cap can
    # force conservative conv fusion tiles
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # overlap-oriented scheduler (mostly collectives, but also reorders
    # copies/compute on a single chip)
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
}

STEPS, WARMUP = 10, 3


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from css_tpu.models import build_model
    from css_tpu.train.state import create_train_state, make_optimizer
    from css_tpu.train.train_step import StepConfig, make_train_step

    crop, batch = 512, 8
    model = build_model(num_classes=21, output_dim=256, backbone="resnet101",
                        dtype=jnp.bfloat16)
    tx = make_optimizer(base_lr=6.4e-3, weight_decay=5e-4, total_steps=80000)
    state0 = create_train_state(jax.random.key(0), model, tx,
                                (1, crop, crop, 3), 21, 256)
    cfg = StepConfig(num_classes=21, crop_hw=(crop, crop),
                     scale_range=(0.5, 1.5), strategy="ori",
                     mix_mode="cutmix", sup_loss="ce",
                     negative_mode="sampled_pallas")
    step_fn = make_train_step(model, tx, cfg, axis_name=None)

    rng = np.random.default_rng(0)
    batch_d = {
        "l_image": jnp.asarray(rng.random((batch, crop, crop, 3), dtype=np.float32)),
        "l_label": jnp.asarray(rng.integers(0, 21, size=(batch, crop, crop)).astype(np.int32)),
        "l_valid_hw": jnp.full((batch, 2), crop, jnp.int32),
        "u_image": jnp.asarray(rng.random((batch, crop, crop, 3), dtype=np.float32)),
        "u_valid_hw": jnp.full((batch, 2), crop, jnp.int32),
    }
    key, w, flag = jax.random.key(1), jnp.float32(1.0), jnp.asarray(False)

    # NOTE: no donation — the same initial state is reused across variants,
    # and throughput differences of interest are device-side.
    lowered = jax.jit(step_fn).lower(state0, batch_d, key, w, flag)

    results = {}
    for name in names:
        opts = VARIANTS[name]
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            results[name] = f"compile failed: {type(e).__name__}: {e}"[:200]
            print(f"{name:>10}: {results[name]}", flush=True)
            continue
        t_compile = time.perf_counter() - t0

        state = state0
        for _ in range(WARMUP):
            state, metrics = compiled(state, batch_d, key, w, flag)
        jax.device_get(metrics["total"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = compiled(state, batch_d, key, w, flag)
        jax.device_get(metrics["total"])
        dt = time.perf_counter() - t0
        results[name] = round(2 * batch * STEPS / dt, 2)
        print(f"{name:>10}: {results[name]} img/s  "
              f"(compile {t_compile:.0f}s)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
