#!/usr/bin/env python
"""Microbenchmark the conv shapes that dominate the train step.

The round-1 trace put ~250 ms of the 306 ms VOC step in the ResNet-101 OS8
conv stack at 30-35% MFU.  OS8 re-dilates layer3 (23 blocks, 3x3 dilation 2)
and layer4 (3 blocks, 3x3 dilation 4) — reference deeplabv3.py:93-96 — and
dilated convolutions are historically slow on TPU.  This tool measures, per
shape: plain conv, dilated conv, and the space-to-batch formulation
(dilation d -> d^2 shifted dense sub-grids stacked on the batch axis), fwd
and fwd+bwd, and prints achieved TFLOP/s.

All timing loops run INSIDE one jit via lax.scan (iterate-on-activations) so
the remote-TPU dispatch overhead (~2 ms/call on the dev tunnel) doesn't
swamp sub-millisecond kernels.

Usage: python tools/profile_conv.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

INNER = 30
REPS = 3


def timeit_scan(step_fn, x, w):
    """step_fn: (x, w) -> y with y.shape == x.shape; chained INNER times."""

    @jax.jit
    def run(x, w):
        def body(carry, _):
            y = step_fn(carry, w)
            return y, ()

        out, _ = lax.scan(body, x, None, length=INNER)
        return out

    out = run(x, w)
    jax.device_get(out.ravel()[0])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(x, w)
        jax.device_get(out.ravel()[0])
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best


def conv_flops(b, h, w, cin, cout, k=3):
    return 2 * b * h * w * cin * cout * k * k


def conv(x, w, dil):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def space_to_batch(x, d):
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = jnp.transpose(x, (2, 4, 0, 1, 3, 5))
    return x.reshape(b * d * d, h // d, w // d, c)


def batch_to_space(y, d, b):
    bd, h, w, c = y.shape
    y = y.reshape(d, d, b, h, w, c)
    y = jnp.transpose(y, (2, 3, 0, 4, 1, 5))
    return y.reshape(b, h * d, w * d, c)


def s2b_conv(x, w, d):
    b = x.shape[0]
    return batch_to_space(conv(space_to_batch(x, d), w, 1), d, b)


def grad_step(x, w, dil, fn):
    def loss(x):
        return jnp.sum(jnp.square(fn(x, w, dil).astype(jnp.float32)) * 1e-6)

    g = jax.grad(loss)(x)
    return (x + g).astype(x.dtype)


def bench_shape(name, b, hw, cin, cout, dil):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, cin)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.01, jnp.bfloat16)
    assert cin == cout, "scan chaining needs matching shapes"
    fl = conv_flops(b, hw, hw, cin, cout)

    t_plain = timeit_scan(lambda a, ww: conv(a, ww, 1).astype(a.dtype), x, w)
    t_dil = (timeit_scan(lambda a, ww: conv(a, ww, dil).astype(a.dtype), x, w)
             if dil > 1 else t_plain)
    t_s2b = (timeit_scan(lambda a, ww: s2b_conv(a, ww, dil).astype(a.dtype), x, w)
             if dil > 1 and hw % dil == 0 else t_plain)
    t_grad = timeit_scan(
        functools.partial(grad_step, dil=dil, fn=lambda a, ww, d: conv(a, ww, d)),
        x, w)
    print(f"{name:26s} plain {t_plain*1e3:6.2f} ms ({fl/t_plain/1e12:5.1f} TF/s) "
          f"dil{dil} {t_dil*1e3:6.2f} ms ({fl/t_dil/1e12:5.1f} TF/s) "
          f"s2b {t_s2b*1e3:6.2f} ms ({fl/t_s2b/1e12:5.1f} TF/s) "
          f"dil-f+b {t_grad*1e3:6.2f} ms ({3*fl/t_grad/1e12:5.1f} TF/s)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}  (INNER={INNER})", flush=True)
    bench_shape("layer3 conv2 (23x/fwd)", 8, 64, 256, 256, 2)
    bench_shape("layer4 conv2 (3x/fwd)", 8, 64, 512, 512, 4)
    bench_shape("ASPP atrous (3x/fwd)", 8, 64, 256, 256, 12)
    bench_shape("layer2 conv2 (4x/fwd)", 8, 128, 128, 128, 1)
    # batched student (fused l+u) comparison: same totals, bigger batch
    bench_shape("layer3 conv2 batch16", 16, 64, 256, 256, 2)


if __name__ == "__main__":
    main()
