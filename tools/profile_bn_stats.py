#!/usr/bin/env python
"""Microbench: BatchNorm train-mode statistics formulations on-chip.

The round-4 Cityscapes trace shows 51 ms/step of ``convert_element_type``
at ~595 GB/s attributed to the BN-statistics f32 boundary: train-mode
GroupedBatchNorm materializes ``xf = x.astype(f32)`` (a full f32 copy of
every BN input, recomputed again under remat) feeding two reduces.  The
statistics themselves must stay f32 (dev-notes invariant #3); the question
is only how they are COMPUTED:

  A. materialized — current code: xf = x.astype(f32); mean(xf);
     mean(square(xf)).  Two reduces share one named f32 intermediate,
     which XLA may choose to materialize (write 4 + 2x read 4 B/elem).
  B. per-reduce convert — jnp.mean(x, dtype=f32) and
     mean(square(x.astype(f32))): each reduce owns its convert, so both
     can fuse generator-side (2x read 2 B/elem, nothing written).
  C. one-pass variadic reduce — lax.reduce((conv(x), conv(x)^2)) with a
     custom_vjp (analytic: d mean = ct/n, d msq = 2x ct/n): single read
     of the bf16 input (1x read 2 B/elem).

All three are f32-exact for the statistics (B/C square AFTER the f32
convert).  Timed fwd+bwd through mean/var -> a scalar surrogate loss that
mimics BN's use (normalize + sum), lax.scan-amortized per CLAUDE.md.

Usage: python tools/profile_bn_stats.py  (foreground; tunnel env needed)
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20  # in-jit scan reps to amortize the ~28 ms tunnel dispatch


def moments_materialized(x, red):
    xf = x.astype(jnp.float32)
    return jnp.mean(xf, axis=red), jnp.mean(jnp.square(xf), axis=red)


def moments_per_reduce(x, red):
    mean = jnp.mean(x, axis=red, dtype=jnp.float32)
    msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=red)
    return mean, msq


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def moments_onepass(x, red):
    n = 1.0
    for i in red:
        n *= x.shape[i]
    s, sq = jax.lax.reduce(
        (x.astype(jnp.float32), jnp.square(x.astype(jnp.float32))),
        (jnp.float32(0), jnp.float32(0)),
        lambda a, b: (a[0] + b[0], a[1] + b[1]),
        red,
    )
    return s / n, sq / n


def _onepass_fwd(x, red):
    return moments_onepass(x, red), x


def _onepass_bwd(red, x, cts):
    ct_mean, ct_msq = cts
    n = 1.0
    for i in red:
        n *= x.shape[i]
    shape = [1] * x.ndim
    for i in range(x.ndim):
        if i not in red:
            shape[i] = x.shape[i]
    g = (ct_mean.reshape(shape) / n
         + 2.0 * x.astype(jnp.float32) * (ct_msq.reshape(shape) / n))
    return (g.astype(x.dtype),)


moments_onepass.defvjp(_onepass_fwd, _onepass_bwd)

FORMS = {
    "A_materialized": moments_materialized,
    "B_per_reduce": moments_per_reduce,
    "C_onepass_vjp": moments_onepass,
}

# BN input shapes from the 769^2 Cityscapes step (b8 fused-equivalent
# traffic: student l+u + teacher u = 3 x b4) — representative strata
SHAPES = [
    ("stem_385_64", (8, 385, 385, 64)),
    ("l1_193_256", (8, 193, 193, 256)),
    ("l3_97_1024", (8, 97, 97, 1024)),
    ("l4_97_2048", (4, 97, 97, 2048)),
]


def bench(fn, x):
    red = tuple(range(x.ndim - 1))

    def loss(x):
        mean, msq = fn(x, red)
        var = msq - jnp.square(mean)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    grad = jax.value_and_grad(loss)

    @jax.jit
    def run(x):
        def body(c, _):
            v, g = grad(c)
            # fold the grad back in so scan iterations cannot be CSE'd
            return c + 0.0 * g, v
        c, vs = jax.lax.scan(body, x, None, length=REPS)
        return vs.sum() + c.sum()

    out = run(x)
    jax.device_get(out)  # compile + settle
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.device_get(run(x))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    results = {}
    for sname, shape in SHAPES:
        x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32),
                        dtype=jnp.bfloat16)
        # correctness cross-check once per shape (f32 statistics must agree)
        red = tuple(range(x.ndim - 1))
        ref = [np.asarray(t) for t in moments_materialized(x, red)]
        for fname, fn in FORMS.items():
            got = [np.asarray(t) for t in fn(x, red)]
            np.testing.assert_allclose(got[0], ref[0], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(got[1], ref[1], rtol=1e-5, atol=1e-6)
        row = {}
        for fname, fn in FORMS.items():
            row[fname] = round(bench(fn, x), 3)
        results[sname] = row
        print(json.dumps({sname: row}), flush=True)
    print(json.dumps({"bn_stat_forms_ms_fwd_bwd": results}), flush=True)


if __name__ == "__main__":
    main()
