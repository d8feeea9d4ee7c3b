"""The standalone evaluate CLI restores a checkpoint and reports mIoU."""

import sys

import numpy as np
import pytest

from tests.test_end_to_end import _args, _tiny_yaml


@pytest.mark.slow
def test_evaluate_cli_round_trip(tmp_path, capsys, monkeypatch):
    from css_tpu.cli.train_main import run_training

    cfgp = _tiny_yaml(tmp_path)
    run_training("ori", _args(cfgp, tmp_path, "evaljob"))
    ckpt = tmp_path / "ckpt" / "evaljob" / "best_model"
    assert ckpt.exists()

    import evaluate

    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--config", cfgp, "--checkpoint", str(ckpt),
        "--num_labels", "8", "--synthetic",
    ])
    evaluate.main()
    out = capsys.readouterr().out
    assert "mIoU" in out
    miou = float(out.split("mIoU")[1].split()[0])
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
    # per-class IoU vector is printed (one line per class, docstring promise)
    class_lines = [l for l in out.splitlines() if l.strip().startswith("class")]
    assert len(class_lines) == 6  # tiny config has 6 classes
    assert all("IoU" in l for l in class_lines)


@pytest.mark.slow
def test_evaluate_cli_sliding_window(tmp_path, capsys, monkeypatch):
    """--sliding runs the full-canvas windowed protocol through the CLI."""
    from css_tpu.cli.train_main import run_training

    cfgp = _tiny_yaml(tmp_path)
    run_training("ori", _args(cfgp, tmp_path, "slidejob"))
    ckpt = tmp_path / "ckpt" / "slidejob" / "best_model"

    import evaluate

    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--config", cfgp, "--checkpoint", str(ckpt),
        "--num_labels", "8", "--synthetic", "--sliding", "--stride", "16",
    ])
    evaluate.main()
    out = capsys.readouterr().out
    miou = float(out.split("mIoU")[1].split()[0])
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0


@pytest.mark.slow
def test_evaluate_cli_tta_flags(tmp_path, capsys, monkeypatch):
    """--flip/--scales run the ms+flip TTA protocol through the CLI."""
    from css_tpu.cli.train_main import run_training

    cfgp = _tiny_yaml(tmp_path)
    run_training("ori", _args(cfgp, tmp_path, "ttajob"))
    ckpt = tmp_path / "ckpt" / "ttajob" / "best_model"

    import evaluate

    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--config", cfgp, "--checkpoint", str(ckpt),
        "--num_labels", "8", "--synthetic", "--flip",
        "--scales", "0.75,1.0",
    ])
    evaluate.main()
    out = capsys.readouterr().out
    miou = float(out.split("mIoU")[1].split()[0])
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0

    # malformed scales fail fast at the argparse boundary
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--config", cfgp, "--checkpoint", str(ckpt),
        "--num_labels", "8", "--synthetic", "--scales", "0,-1",
    ])
    with pytest.raises(SystemExit):
        evaluate.main()

    # non-numeric scales also fail at the argparse boundary, not with a
    # raw ValueError traceback (round-4 advisor finding)
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", "--config", cfgp, "--checkpoint", str(ckpt),
        "--num_labels", "8", "--synthetic", "--scales", "abc",
    ])
    with pytest.raises(SystemExit):
        evaluate.main()


@pytest.mark.slow
def test_predict_cli_writes_masks(tmp_path, monkeypatch):
    """predict.py segments a directory of images into index masks +
    overlays of the original sizes."""
    from PIL import Image

    from css_tpu.cli.train_main import run_training

    cfgp = _tiny_yaml(tmp_path)
    run_training("ori", _args(cfgp, tmp_path, "predjob"))
    ckpt = tmp_path / "ckpt" / "predjob" / "best_model"

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    # im2 exceeds the 40x40 canvas: predict.py downscales it for inference
    # and must resize the label map back to the original resolution
    for i, (h, w) in enumerate([(30, 28), (25, 32), (64, 50)]):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")

    import predict

    out_dir = tmp_path / "preds"
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--config", cfgp, "--checkpoint", str(ckpt),
        "--inputs", str(img_dir), "--out_dir", str(out_dir), "--overlay",
    ])
    predict.main()
    m0 = np.asarray(Image.open(out_dir / "im0_pred.png"))
    m1 = np.asarray(Image.open(out_dir / "im1_pred.png"))
    m2 = np.asarray(Image.open(out_dir / "im2_pred.png"))
    assert m0.shape == (30, 28) and m1.shape == (25, 32)
    assert m2.shape == (64, 50)  # downscaled for inference, resized back
    assert m0.max() < 6 and m2.max() < 6  # class ids within the tiny range
    assert (out_dir / "im0_overlay.png").exists()
    # the overlay of the oversized image aligns with its original pixels
    o2 = np.asarray(Image.open(out_dir / "im2_overlay.png"))
    assert o2.shape == (64, 50, 3)
