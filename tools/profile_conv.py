#!/usr/bin/env python
"""Microbenchmark the conv shapes that dominate the train step.

The round-1 trace put ~250 ms of the 306 ms VOC step in the ResNet-101 OS8
conv stack at 30-35% MFU.  OS8 re-dilates layer3 (23 blocks, 3x3 dilation 2)
and layer4 (3 blocks, 3x3 dilation 4) — reference deeplabv3.py:93-96 — and
dilated convolutions are historically slow on TPU.  This tool measures, per
shape: plain conv, dilated conv, and the space-to-batch formulation
(dilation d -> d^2 shifted dense sub-grids stacked on the batch axis), fwd
and fwd+bwd, and prints achieved TFLOP/s.

Usage: python tools/profile_conv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

STEPS = 20


def timeit(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / STEPS


def conv_flops(b, h, w, cin, cout, k=3):
    return 2 * b * h * w * cin * cout * k * k


def make_conv(dil):
    @jax.jit
    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    return f


def make_conv_grad(dil):
    def loss(x, w):
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(y * y.astype(jnp.float32) * 1e-6)

    return jax.jit(jax.grad(loss, argnums=(0, 1)))


def space_to_batch(x, d):
    """[B,H,W,C] -> [B*d*d, H/d, W/d, C] of shifted sub-grids."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = jnp.transpose(x, (2, 4, 0, 1, 3, 5))
    return x.reshape(b * d * d, h // d, w // d, c)


def batch_to_space(y, d, b):
    bd, h, w, c = y.shape
    y = y.reshape(d, d, b, h, w, c)
    y = jnp.transpose(y, (2, 3, 0, 4, 1, 5))
    return y.reshape(b, h * d, w * d, c)


def make_s2b_conv(d, b):
    @jax.jit
    def f(x, w):
        xs = space_to_batch(x, d)
        y = lax.conv_general_dilated(
            xs, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return batch_to_space(y, d, b)

    return f


def bench_shape(name, b, hw, cin, cout, dil):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.01, jnp.bfloat16)
    fl = conv_flops(b, hw, hw, cin, cout)

    t_plain = timeit(make_conv(1), x, w)
    t_dil = timeit(make_conv(dil), x, w) if dil > 1 else t_plain
    t_s2b = timeit(make_s2b_conv(dil, b), x, w) if dil > 1 else t_plain
    g_dil = timeit(make_conv_grad(dil), x, w)
    print(f"{name:28s} plain {t_plain*1e3:7.2f} ms ({fl/t_plain/1e12:5.1f} TF/s)  "
          f"dil{dil} {t_dil*1e3:7.2f} ms ({fl/t_dil/1e12:5.1f} TF/s)  "
          f"s2b {t_s2b*1e3:7.2f} ms ({fl/t_s2b/1e12:5.1f} TF/s)  "
          f"dil-fwd+bwd {g_dil*1e3:7.2f} ms ({3*fl/g_dil/1e12:5.1f} TF/s)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    # layer3 block conv2: 64x64, 256ch, dil 2 (the 23x workhorse)
    bench_shape("layer3 conv2 (23x/fwd)", 8, 64, 256, 256, 2)
    # layer4 block conv2: 64x64, 512ch, dil 4
    bench_shape("layer4 conv2 (3x/fwd)", 8, 64, 512, 512, 4)
    # 1x1-heavy sanity: layer3 conv1 (1024->256) as 3x3-equivalent FLOPs ref
    # ASPP atrous convs: 64x64, 256ch, dil 12 (batch 16: student l+u)
    bench_shape("ASPP atrous (3x/fwd)", 8, 64, 256, 256, 12)
    # stem-adjacent: layer2 conv2 128ch @128 (dense, stride handled apart)
    bench_shape("layer2 conv2 (4x/fwd)", 8, 128, 128, 128, 1)


if __name__ == "__main__":
    main()
