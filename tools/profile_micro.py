#!/usr/bin/env python
"""Micro-benchmarks of augmentation / contrastive components on the chip."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, CROP, C, D = 8, 512, 21, 256
H4 = CROP // 4
N = 2 * B * H4 * H4


def timeit(fn, *args, n=4, label=""):
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    print(f"{label} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {1000*np.mean(ts):.1f} ms (min {1000*np.min(ts):.1f})", flush=True)


def main(which):
    rng = np.random.default_rng(0)
    if which == "geo":
        from css_tpu.ops.augment import batch_transform

        img = jnp.asarray(rng.random((B, 3, CROP, CROP), dtype=np.float32))
        lab = jnp.asarray(rng.integers(0, C, (B, 1, CROP, CROP)).astype(np.int32))
        conf = jnp.asarray(rng.random((B, 1, CROP, CROP), dtype=np.float32))
        hw = jnp.full((B, 2), CROP, jnp.int32)

        @jax.jit
        def geo(k, i, l, cf):
            a, b_, c_ = batch_transform(k, i, l, cf, hw, (CROP, CROP), (0.5, 1.5), False)
            return a.sum()

        @jax.jit
        def photo(k, i, l, cf):
            a, b_, c_ = batch_transform(k, i, l, cf, hw, (CROP, CROP), (1.0, 1.0), True)
            return a.sum()

        import os
        if os.environ.get("GEO_ONLY"):
            timeit(geo, jax.random.key(0), img, lab, conf, label="geometric (scale+crop)")
        else:
            timeit(photo, jax.random.key(0), img, lab, conf, label="photo (jitter+blur+flip)")
    elif which == "blur":
        from css_tpu.ops.photometric import gaussian_blur

        img = jnp.asarray(rng.random((B, 3, CROP, CROP), dtype=np.float32))

        @jax.jit
        def f(x):
            return jax.vmap(lambda im: gaussian_blur(im, jnp.float32(1.0)))(x).sum()

        timeit(f, img, label="blur b8")
    elif which == "jitter":
        from css_tpu.ops.photometric import color_jitter

        img = jnp.asarray(rng.random((B, 3, CROP, CROP), dtype=np.float32))

        @jax.jit
        def f(k, x):
            ks = jax.random.split(k, B)
            return jax.vmap(color_jitter)(ks, x).sum()

        timeit(f, jax.random.key(0), img, label="jitter b8")
    elif which == "contrast":
        from css_tpu.losses.contrastive import prototype_contrastive_loss

        rep = jnp.asarray(rng.standard_normal((2 * B, H4, H4, D)).astype(np.float32))
        labels = rng.integers(0, C, (2 * B, H4, H4))
        onehot = jnp.asarray(np.eye(C, dtype=np.float32)[labels])
        mask = jnp.asarray((rng.random((2 * B, H4, H4)) < 0.8).astype(np.float32))
        prob = jnp.asarray(rng.random((2 * B, H4, H4, C), dtype=np.float32) * 0.5)
        protos = jnp.zeros((C, D))

        @jax.jit
        def f(r, key):
            def loss(rr):
                l, p = prototype_contrastive_loss(
                    rr, onehot, mask, prob, protos, key)
                return l
            return jax.value_and_grad(loss)(r)[0]

        timeit(f, rep, jax.random.key(0), label="contrast loss+grad")
    elif which == "sort":
        keys = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
        tie = jnp.asarray(rng.random(N, dtype=np.float32))
        idx = jnp.arange(N, dtype=jnp.int32)

        @jax.jit
        def f(k, t, i):
            _, _, o = jax.lax.sort((k, t, i), num_keys=2)
            return o[:5]

        timeit(f, keys, tie, idx, label=f"sort N={N}")
    elif which == "upsample":
        from css_tpu.ops.interpolate import bilinear_resize

        x = jnp.asarray(rng.random((B, H4, H4, C), dtype=np.float32))

        @jax.jit
        def f(x):
            y = bilinear_resize(x, (CROP, CROP), align_corners=True)
            p = jax.nn.softmax(y, axis=-1)
            return jnp.max(p, -1).sum()

        timeit(f, x, label="upsample 128->512 + softmax (21ch)")


if __name__ == "__main__":
    main(sys.argv[1])
