#!/usr/bin/env python
"""Loader-only microbench: Cityscapes-sized native decode throughput.

Writes N synthetic 2048x1024 RGB PNGs + label PNGs in a Cityscapes layout,
then times BatchLoader end-to-end (native C++ decode when built, PIL
fallback otherwise).  The pipeline keeps up as long as images/sec here
exceeds the train step's consumption (769^2 recipe: ~8 img/s/chip).

Usage: python tools/bench_loader.py [n_images] [batch]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tree(root, n):
    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "leftImg8bit", "train", "synth")
    lab_dir = os.path.join(root, "gtFine", "train", "synth")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    ids = []
    base = rng.integers(0, 256, size=(1024, 2048, 3), dtype=np.uint8)
    lab = rng.integers(0, 19, size=(1024, 2048), dtype=np.uint8)
    for i in range(n):
        sid = f"synth_{i:06d}_000019_leftImg8bit"
        # vary pixels slightly so PNG sizes are realistic but writing is fast
        img = np.roll(base, i * 37, axis=1)
        Image.fromarray(img).save(os.path.join(img_dir, f"{sid}.png"))
        Image.fromarray(lab, "L").save(os.path.join(
            lab_dir, f"synth_{i:06d}_000019_gtFine_trainIds.png"))
        ids.append(sid)
    return ids


def main(n=16, batch=8):
    from css_tpu.data import BatchLoader
    from css_tpu.data import native_io
    from css_tpu.data.datasets import CityscapesSpec

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        ids = make_tree(root, n)
        print(f"wrote {n} synthetic 2048x1024 frames in "
              f"{time.perf_counter()-t0:.1f}s "
              f"(native decode available: {native_io.native_available()})")

        spec = CityscapesSpec(root=root, mode="train", canvas_hw=(1024, 2048))
        loader = BatchLoader(spec, ids, batch, seed=0, shuffle=True,
                             drop_last=True)
        # warm epoch (page cache + pools)
        for _ in loader:
            pass
        t0 = time.perf_counter()
        epochs = 3
        count = 0
        for e in range(epochs):
            loader.set_epoch(e)
            for b in loader:
                count += b["image"].shape[0]
        dt = time.perf_counter() - t0
        cores = os.cpu_count()
        print(f"loader: {count / dt:.1f} images/sec on {cores} core(s) "
              f"({count} canvases in {dt:.1f}s) — "
              f"train step consumes ~8 img/s/chip at 769^2; decode threads "
              f"scale with cores (native decode releases the GIL, ~91 ms "
              f"per 2048x1024 frame single-core)")

        # decoded-raw cache path (Dataset.cache_dir): epoch 1 decodes and
        # writes raw entries, epoch 2+ reads them back without any image
        # decoding — the decode wall disappears regardless of core count
        cspec = CityscapesSpec(root=root, mode="train", canvas_hw=(1024, 2048),
                               cache_dir=os.path.join(root, "_rawcache"))
        cloader = BatchLoader(cspec, ids, batch, seed=0, shuffle=True,
                              drop_last=True)
        for _ in cloader:  # populate cache + warm page cache
            pass
        t0 = time.perf_counter()
        count = 0
        for e in range(epochs):
            cloader.set_epoch(e)
            for b in cloader:
                count += b["image"].shape[0]
        dt = time.perf_counter() - t0
        print(f"loader+cache: {count / dt:.1f} images/sec "
              f"({count} canvases in {dt:.1f}s from the decoded-raw cache)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
