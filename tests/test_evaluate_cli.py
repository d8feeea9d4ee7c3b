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
