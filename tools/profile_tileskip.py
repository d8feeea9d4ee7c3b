#!/usr/bin/env python
"""Microbench: member-aware dead-tile skipping in the Pallas InfoNCE.

Measures the 21-class fwd+bwd kernel scan (the shape the VOC recipe runs:
N = 2*8*128*128 table rows, Q = 256 anchors, D = 256) at different live
fractions.  The dead tail is contiguous — the real layout is
[labeled..., unlabeled...] and early-training weak-threshold masking zeroes
the unlabeled half — so no sorting/permutation is needed to realize it.

Usage: python tools/profile_tileskip.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from css_tpu.ops.pallas import weighted_exp_softsum

B, CROP, C, D, Q = 8, 512, 21, 256, 256
H4 = CROP // 4
N = 2 * B * H4 * H4


def timeit(fn, *args, n=6, per_call=1, label=""):
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    print(f"{label} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append((time.perf_counter() - t0) / per_call)
    print(f"{label}: {1000*np.mean(ts):.1f} ms (min {1000*np.min(ts):.1f})",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((C, Q, D)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32),
                    jnp.bfloat16)

    REPS = 10  # amortize the ~28 ms tunnel dispatch latency (CLAUDE.md)

    @jax.jit
    def scan_loss(a_all, w):
        def body(tot, a_c):
            s = weighted_exp_softsum(a_c, r, w, 2.0)
            return tot + jnp.mean(jnp.log1p(s)), None

        def loss(a_):
            t, _ = jax.lax.scan(body, jnp.float32(0.0), a_)
            return t

        def rep(tot, i):
            l, g = jax.value_and_grad(loss)(a_all + 0.0 * i)
            return tot + l + jnp.abs(g).sum(), None

        out, _ = jax.lax.scan(rep, jnp.float32(0.0),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out

    for frac in (1.0, 0.75, 0.5, 0.25):
        w = rng.random(N).astype(np.float32)
        w[int(N * frac):] = 0.0  # contiguous dead tail
        timeit(scan_loss, a, jnp.asarray(w), per_call=REPS,
               label=f"{C}-class fwd+bwd scan, live={frac:.0%}")


if __name__ == "__main__":
    main()
