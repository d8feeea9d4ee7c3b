#!/usr/bin/env python
"""On-chip microbench of the OHEM kth-statistic: full sort vs bit bisection.

The Cityscapes recipe (769^2, b4, min_kept=50000/image) computes the k-th
smallest teacher confidence over B*H*W = 2.37M values every step
(reference ProbOhemCrossEntropy2d, loss/loss.py — torch .sort on the
masked vector).  Round-3 verdict next #3 named the full XLA sort as the
obvious lever; `kth_smallest_nonneg` replaces it with 31 fused
compare-and-count passes over the float32 bit space.

Measures, on the real chip, with the loop inside jit (lax.scan) so the
~28 ms tunnel latency is amortized per CLAUDE.md:
  * jnp.sort(flat)[k-1]            (the round-3 implementation)
  * kth_smallest_nonneg(flat, k)   (31-step bisection)
  * full ohem_cross_entropy loss+grad, both kth implementations

Usage: python tools/profile_ohem.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, CROP, C = 4, 769, 19
MIN_KEPT = 50000 * B
N = B * CROP * CROP


def timed(fn, *args, label="", inner=20):
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append((time.perf_counter() - t0) / inner)
    print(f"{label}: {1000 * np.mean(ts):.2f} ms/iter "
          f"(min {1000 * np.min(ts):.2f})", flush=True)
    return float(np.min(ts))


def main(inner=20):
    from css_tpu.losses.cross_entropy import (kth_smallest_nonneg,
                                              ohem_cross_entropy)

    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.random(N, dtype=np.float32))
    logits = jnp.asarray(
        rng.standard_normal((B, CROP, CROP, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(-1, C, (B, CROP, CROP)).astype(np.int32))

    def scan_over(f, x):
        def body(c, _):
            # fold the carry in so XLA cannot hoist the work out of the scan
            return c, f(x + c * 0.0)
        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return ys.sum()

    kth_sort = jax.jit(lambda x: scan_over(
        lambda v: jnp.sort(v)[MIN_KEPT - 1], x))
    kth_bits = jax.jit(lambda x: scan_over(
        lambda v: kth_smallest_nonneg(v, MIN_KEPT), x))

    # exactness on this draw, on device
    a = float(jax.jit(lambda v: jnp.sort(v)[MIN_KEPT - 1])(flat))
    b = float(jax.jit(lambda v: kth_smallest_nonneg(v, MIN_KEPT))(flat))
    assert a == b, (a, b)
    print(f"exactness ok: kth = {a:.6f}", flush=True)

    t_sort = timed(kth_sort, flat, label=f"sort[{N}] kth", inner=inner)
    t_bits = timed(kth_bits, flat, label="bisection kth", inner=inner)

    def loss_grad(kth_impl):
        def loss(lg):
            return ohem_cross_entropy(lg, labels, thresh=0.7,
                                      min_kept=MIN_KEPT, _kth=kth_impl)
        return jax.jit(lambda lg: scan_over(
            lambda v: jax.value_and_grad(loss)(v)[0], lg))

    t_lsort = timed(loss_grad("sort"), logits,
                    label="ohem loss+grad (sort)", inner=inner)
    t_lbits = timed(loss_grad("bisect"), logits,
                    label="ohem loss+grad (bisection)", inner=inner)
    print(f"kth speedup {t_sort / t_bits:.1f}x; "
          f"full-loss delta {1000 * (t_lsort - t_lbits):.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
