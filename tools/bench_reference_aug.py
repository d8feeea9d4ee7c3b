#!/usr/bin/env python
"""Measure the reference's IN-FORWARD host-side augmentation chain.

The reference's training step runs, on the training process itself and
inside `Model_ori_pseudo.forward` (ddp_model.py:38-57), the serial chain

    batch_transform(aug=False)  ->  generate_cut_gather  ->
    batch_transform(aug=True: jitter + blur + flip)

over the unlabeled batch as PIL round-trips — work DataLoader prefetch
workers cannot hide, because it consumes the teacher's pseudo-labels
produced inside the same step.  This tool times that chain with the
ACTUAL reference code (imported via tests/_refshim.py) on this host, to
ground bench.py's `vs_baseline` denominator: the measured chain is a hard
host-side ceiling on the reference's per-GPU throughput no matter how
fast the GPU is.

Usage: python tools/bench_reference_aug.py [batch] [crop] [max_scale]
  VOC recipe: 8 512 (scale 0.5-1.5); Cityscapes recipe: 4 769 2
  (scale 0.5-2.0, CityScapes_config_baseline.yaml)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch

from _refshim import ensure_dist, import_reference  # noqa: E402


def main(batch=8, crop=512, max_scale=1.5):
    import_reference()
    ensure_dist()  # generate_cut_gather all_gathers across the (1-proc) group
    from generalframeworks.dataset_helpers.VOC import batch_transform
    from generalframeworks.networks.ddp_model import generate_cut_gather

    rng = np.random.default_rng(0)
    images = torch.from_numpy(
        rng.random((batch, 3, crop, crop), dtype=np.float32))
    labels = torch.from_numpy(
        rng.integers(0, 21, size=(batch, crop, crop)).astype(np.int64))
    logits = torch.from_numpy(
        rng.random((batch, crop, crop), dtype=np.float32))

    def chain():
        im, la, lo = batch_transform(images, labels, logits,
                                     crop_size=(crop, crop),
                                     scale_size=(0.5, max_scale),
                                     augmentation=False)
        im, la, lo = generate_cut_gather(im, la, lo, mode="cutmix")
        im, la, lo = batch_transform(im, la, lo, crop_size=(crop, crop),
                                     scale_size=(1.0, 1.0),
                                     augmentation=True)
        return im

    chain()  # warm PIL/torch
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        chain()
        ts.append(time.perf_counter() - t0)
    ms = 1000 * np.median(ts)
    # the chain covers the unlabeled half; per-GPU throughput counts l+u
    ceiling = 2 * batch / (ms / 1000)
    print(f"reference in-forward aug chain (b{batch}, {crop}^2): "
          f"{ms:.0f} ms/step -> host-side ceiling {ceiling:.1f} img/s/GPU "
          f"(labeled+unlabeled)")


if __name__ == "__main__":
    main(*(float(a) if "." in a else int(a) for a in sys.argv[1:]))
