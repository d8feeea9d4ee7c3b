#!/usr/bin/env python
"""END-TO-END driver throughput: the real training loop on an on-disk tree.

bench.py steps one device-resident batch; nothing in it proves the host
pipeline (JPEG/PNG decode -> canvas -> BatchLoader prefetch ->
_device_prefetch H2D -> sharded step -> per-epoch eval) sustains that rate
(round-4 verdict weak #4).  This script materializes a synthetic on-disk
dataset in the exact VOC / Cityscapes layout at FULL raw-image sizes
(uint8 noise — the worst case for PNG/JPEG decode cost, so the measured
rate is a lower bound on real-data throughput), then runs ~100 steps of
the production ``run_training`` driver ("ori" strategy) and reports the
steady-state StepTimer rate next to bench.py's device-resident figure.

Usage:  python tools/bench_driver.py voc|cityscapes [max_steps]
        (foreground/nohup from a live shell — the TPU tunnel env does not
        survive detached shells, CLAUDE.md.)

Caveat on this dev box: the remote-TPU tunnel moves every canvas batch over
the wire (~13 MB/step uint8 for the VOC recipe), so a shortfall vs bench.py
here decomposes into (host pipeline) + (tunnel H2D); on a local TPU host
only the first term exists.  The printed ``h2d_probe_ms`` measures the
tunnel term directly so the decomposition is explicit.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 3407


def _write_split(txt_dir, num_labels, names):
    sd = os.path.join(txt_dir, str(num_labels), str(SEED))
    os.makedirs(sd, exist_ok=True)
    for kind, ids in names.items():
        with open(os.path.join(sd, f"{kind}_filename.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")


def make_voc_tree(root, n_l=832, n_u=256, n_val=2):
    """Full-size VOC layout: JPEGImages/<id>.jpg (320..500 px sides, q95
    noise) + SegmentationClassAug/<id>.png."""
    from PIL import Image

    done = os.path.join(root, ".complete")
    if os.path.exists(done):
        return root, os.path.join(root, "splits")
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "SegmentationClassAug"), exist_ok=True)
    names = {"labeled": [], "unlabeled": [], "valid": []}
    for kind, n in (("labeled", n_l), ("unlabeled", n_u), ("valid", n_val)):
        for i in range(n):
            sid = f"{kind}_{i:04d}"
            h = int(rng.integers(320, 501))
            w = int(rng.integers(320, 501))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "JPEGImages", f"{sid}.jpg"), quality=95)
            if kind != "unlabeled":
                lab = rng.integers(0, 21, size=(h, w)).astype(np.uint8)
                lab[:2] = 255
                Image.fromarray(lab, "L").save(
                    os.path.join(root, "SegmentationClassAug", f"{sid}.png"))
            names[kind].append(sid)
    _write_split(os.path.join(root, "splits"), n_l, names)
    open(done, "w").write("ok\n")
    return root, os.path.join(root, "splits")


def make_city_tree(root, n_l=120, n_u=48, n_val=2):
    """Full-size Cityscapes layout: leftImg8bit/train/benchcity/
    <id>_leftImg8bit.png at 1024x2048 (uint8 noise => ~6 MB PNGs, the
    decode-cost worst case) + gtFine trainIds."""
    from PIL import Image

    # v2: valid-split samples live under leftImg8bit/val (the Cityscapes
    # spec resolves them with mode="val"; the v1 tree put them in train/
    # and the first eval crashed FileNotFoundError).  Existing files from
    # a v1 tree are kept — only missing ones are (re)generated.
    done = os.path.join(root, ".complete_v2")
    if os.path.exists(done):
        return root, os.path.join(root, "splits")
    rng = np.random.default_rng(0)
    for mode in ("train", "val"):
        os.makedirs(os.path.join(root, "leftImg8bit", mode, "benchcity"),
                    exist_ok=True)
        os.makedirs(os.path.join(root, "gtFine", mode, "benchcity"),
                    exist_ok=True)
    names = {"labeled": [], "unlabeled": [], "valid": []}
    for kind, n in (("labeled", n_l), ("unlabeled", n_u), ("valid", n_val)):
        mode = "val" if kind == "valid" else "train"
        for i in range(n):
            base = f"benchcity_{kind}_{i:04d}"
            sid = f"{base}_leftImg8bit"
            img_path = os.path.join(
                root, "leftImg8bit", mode, "benchcity", f"{sid}.png")
            if not os.path.exists(img_path):
                img = rng.integers(0, 256, size=(1024, 2048, 3),
                                   dtype=np.uint8)
                Image.fromarray(img).save(img_path)
            if kind != "unlabeled":
                lab_path = os.path.join(root, "gtFine", mode, "benchcity",
                                        f"{base}_gtFine_trainIds.png")
                if not os.path.exists(lab_path):
                    lab = rng.integers(0, 19, size=(1024, 2048)).astype(
                        np.uint8)
                    lab[:4] = 255
                    Image.fromarray(lab, "L").save(lab_path)
            names[kind].append(sid)
    _write_split(os.path.join(root, "splits"), n_l, names)
    open(done, "w").write("ok\n")
    return root, os.path.join(root, "splits")


def _host_pipeline_rate(cfg, num_labels, batch, n_batches):
    """Images/sec of the host pipeline alone: the SAME BatchLoader pair the
    train loop zips (labeled + unlabeled, decode -> canvas -> batch
    assembly), iterated with no device in the loop.  This is the rate a
    local TPU host's input pipeline would sustain — the tunnel H2D term
    measured separately by _h2d_probe does not exist there."""
    from css_tpu.data import (BatchLoader, build_dataset_specs,
                              read_split_lists)

    ds = cfg["Dataset"]
    canvas = tuple(ds.get("canvas_size", ds["crop_size"]))
    train_spec, _ = build_dataset_specs(
        ds["name"], ds["data_dir"], canvas, cfg["Network"]["num_class"],
        cache_dir=None)
    labeled, unlabeled, _ = read_split_lists(ds["txt_dir"], num_labels,
                                             cfg.get("Seed", 3407))
    mk = lambda ids: BatchLoader(train_spec, ids, batch, seed=1,
                                 shuffle=True, drop_last=True)
    l_loader, u_loader = mk(labeled), mk(unlabeled)
    li, ui = iter(l_loader), iter(u_loader)
    # warm one batch from each (thread pools spin up), then time
    next(li), next(ui)
    t0 = time.perf_counter()
    done = 0
    for _ in range(n_batches - 1):
        try:
            next(li)
        except StopIteration:
            li = iter(l_loader)
            next(li)
        try:
            next(ui)
        except StopIteration:
            ui = iter(u_loader)
            next(ui)
        done += 1
    dt = time.perf_counter() - t0
    return 2 * batch * done / dt if dt > 0 else float("inf")


def _h2d_probe(batch_bytes, shape, n=8):
    """Median dispatch+sync time of one uint8 canvas H2D at batch shape."""
    import jax

    x = np.zeros(shape, np.uint8)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        y = jax.device_put(x)
        jax.device_get(y[0, 0, 0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("recipe", choices=["voc", "cityscapes"])
    p.add_argument("max_steps", nargs="?", type=int, default=100)
    p.add_argument("--tree_root", default=None)
    args = p.parse_args()

    import yaml

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("CSS_TPU_CACHE",
                                         "/tmp/css_tpu_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.recipe == "voc":
        cfg_path = os.path.join(repo, "css_tpu/config/VOC_config_baseline.yaml")
        root = args.tree_root or "/tmp/css_driver_voc832"
        data_dir, txt_dir = make_voc_tree(root)
        num_labels, batch = 832, 8  # 104 steps/epoch: one epoch covers the
        canvas = (8, 512, 512, 3)   # whole measurement, no eval in the window
        bench_ref = 55.22  # BENCH_r05 voc_sampled_pallas
    else:
        cfg_path = os.path.join(
            repo, "css_tpu/config/CityScapes_config_baseline.yaml")
        root = args.tree_root or "/tmp/css_driver_city120"
        data_dir, txt_dir = make_city_tree(root)
        num_labels, batch = 120, 4  # 30 steps/epoch
        canvas = (4, 1024, 2048, 3)
        bench_ref = 18.26  # BENCH_r05 cityscapes_769 (fused)

    cfg = yaml.safe_load(open(cfg_path))
    cfg["Dataset"].update({"data_dir": data_dir, "txt_dir": txt_dir,
                           "num_labels": num_labels, "batch_size": batch})
    if args.recipe == "cityscapes":
        cfg["Network"]["backbone"] = "resnet101_stem"
    cfg["Training_Setting"].update({
        "epoch": 10000,
        "save_dir": "/tmp/css_driver_ckpt",
        # skip the ~1 GB device_get at eval points: on the dev tunnel it
        # would swamp the steady-state rate this probe exists to measure
        "host_recovery": 0,
    })
    run_cfg = f"/tmp/css_driver_{args.recipe}.yaml"
    yaml.safe_dump(cfg, open(run_cfg, "w"))

    ns = argparse.Namespace(
        # total_iter must COVER max_steps: epochs = total_iter//steps_per_epoch
        # (the first cut's total_iter=8 silently capped the run at one epoch)
        config=run_cfg, resume="", num_labels=num_labels,
        total_iter=4 * args.max_steps,
        job_name=f"driverbench_{args.recipe}", strong_threshold=None,
        weak_threshold=None, un_threshold=None, temp=None, sche=True,
        data_dir=None, txt_dir=None, synthetic=False, num_devices=1,
        profile_dir=None, max_steps=args.max_steps,
    )

    probe_ms = _h2d_probe(np.prod(canvas), canvas)
    host_img_s = _host_pipeline_rate(cfg, num_labels, batch,
                                     min(args.max_steps, 40))

    from css_tpu.cli.train_main import run_training

    t0 = time.perf_counter()
    result = run_training("ori", ns)
    wall = time.perf_counter() - t0
    sps = result["steps_per_sec"]
    out = {
        "recipe": args.recipe,
        "steps": result["steps"],
        "steps_per_sec": round(sps, 4),
        "img_per_s": round(2 * batch * sps, 2),
        "bench_device_resident_img_per_s": bench_ref,
        # host pipeline alone (decode -> aug canvas -> batch assembly), no
        # device: the tunnel-free number a local TPU host would see
        "host_pipeline_img_per_s": round(host_img_s, 2),
        "h2d_probe_ms": round(probe_ms, 1),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
