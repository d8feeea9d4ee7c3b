"""make_splits tool produces files the split reader round-trips."""

import subprocess
import sys

from css_tpu.data import read_split_lists


def test_make_splits_round_trip(tmp_path):
    train = tmp_path / "train.txt"
    val = tmp_path / "val.txt"
    train.write_text("\n".join(f"img{i:03d}" for i in range(40)) + "\n")
    val.write_text("\n".join(f"val{i:03d}" for i in range(10)) + "\n")
    out = tmp_path / "splits"

    r = subprocess.run(
        [sys.executable, "tools/make_splits.py", "--train_ids", str(train),
         "--val_ids", str(val), "--num_labels", "8", "--seed", "3407",
         "--out", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    labeled, unlabeled, valid = read_split_lists(str(out), 8, 3407)
    assert len(labeled) == 8 and len(unlabeled) == 32 and len(valid) == 10
    assert not set(labeled) & set(unlabeled)
    assert set(labeled) | set(unlabeled) == {f"img{i:03d}" for i in range(40)}

    # deterministic per seed
    r2 = subprocess.run(
        [sys.executable, "tools/make_splits.py", "--train_ids", str(train),
         "--val_ids", str(val), "--num_labels", "8", "--seed", "3407",
         "--out", str(tmp_path / "splits2")],
        capture_output=True, text=True,
    )
    labeled2, _, _ = read_split_lists(str(tmp_path / "splits2"), 8, 3407)
    assert labeled == labeled2
