"""Dry-run of docs/parity_runbook.md's command plumbing on synthetic data.

The north-star real-data parity run is structurally blocked (no VOC/
Cityscapes on this box); this test walks the runbook's exact command chain
end-to-end on a miniature on-disk VOC-layout tree so the moment data + TPU
time exist the run needs zero engineering: id lists -> tools/make_splits.py
-> train the recipe against the generated txt_dir -> evaluate the produced
checkpoint with the paper TTA protocol (--sliding --flip --scales).
"""

import os
import runpy
import sys

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow


def test_runbook_command_chain(tmp_path, monkeypatch, capsys):
    from test_end_to_end import _args, _tiny_yaml

    from css_tpu.cli.train_main import run_training

    # ---- step 0: a raw dataset tree + id lists (no splits yet) ----
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "VOC"
    os.makedirs(root / "JPEGImages")
    os.makedirs(root / "SegmentationClassAug")
    train_ids, val_ids = [], []
    for i in range(10):
        sid = f"img_{i:03d}"
        h, w = int(rng.integers(30, 40)), int(rng.integers(30, 40))
        Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)).save(
            root / "JPEGImages" / f"{sid}.jpg", quality=95)
        Image.fromarray(rng.integers(0, 6, (h, w)).astype(np.uint8), "L").save(
            root / "SegmentationClassAug" / f"{sid}.png")
        (train_ids if i < 7 else val_ids).append(sid)
    (tmp_path / "train_aug.txt").write_text("\n".join(train_ids) + "\n")
    (tmp_path / "val.txt").write_text("\n".join(val_ids) + "\n")

    # ---- step 1: the runbook's split generator command ----
    monkeypatch.setattr(sys, "argv", [
        "make_splits.py",
        "--train_ids", str(tmp_path / "train_aug.txt"),
        "--val_ids", str(tmp_path / "val.txt"),
        "--num_labels", "3", "--seed", "3407",
        "--out", str(tmp_path / "splits"),
    ])
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "tools",
                                "make_splits.py"), run_name="__main__")
    split_dir = tmp_path / "splits" / "3" / "3407"
    labeled = split_dir.joinpath("labeled_filename.txt").read_text().split()
    unlabeled = split_dir.joinpath("unlabeled_filename.txt").read_text().split()
    valid = split_dir.joinpath("valid_filename.txt").read_text().split()
    assert len(labeled) == 3 and len(unlabeled) == 4
    assert sorted(labeled + unlabeled) == sorted(train_ids)
    assert valid == val_ids

    # ---- step 2+3: config pointed at the data; train the recipe ----
    cfg = yaml.safe_load(open(_tiny_yaml(tmp_path)))
    cfg["Dataset"].update({"name": "VOC", "data_dir": str(root),
                           "txt_dir": str(tmp_path / "splits"),
                           "num_labels": 3})
    cfgp = tmp_path / "voc_runbook.yaml"
    cfgp.write_text(yaml.safe_dump(cfg))
    result = run_training("ori", _args(str(cfgp), tmp_path, "runbook",
                                       num_labels=3, max_steps=2))
    assert result["steps"] >= 2 and np.isfinite(result["best_miou"])
    ckpt = tmp_path / "ckpt" / "runbook" / "best_model"
    assert ckpt.exists()

    # ---- step 4: the paper TTA evaluation command ----
    import evaluate

    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--config", str(cfgp), "--checkpoint", str(ckpt),
        "--num_labels", "3", "--data_dir", str(root),
        "--txt_dir", str(tmp_path / "splits"),
        "--sliding", "--flip", "--scales", "0.75,1.0",
    ])
    evaluate.main()
    out = capsys.readouterr().out
    miou = float(out.split("mIoU")[1].split()[0])
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
