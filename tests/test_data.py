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


def _write_interlaced_png(path, arr):
    """Minimal Adam7-interlaced PNG writer (PIL cannot write interlaced).

    ``arr`` is uint8 [H, W] (grayscale, color type 0) or [H, W, 3] (RGB,
    color type 2).  Each interlace pass serializes its sub-image rows with
    filter byte 0; all passes concatenate into one zlib stream (PNG spec
    section 8.2).
    """
    import struct
    import zlib

    h, w = arr.shape[:2]
    color_type = 2 if arr.ndim == 3 else 0
    # (x0, y0, dx, dy) for Adam7 passes 1..7
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = arr[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            raw.append(0)  # filter: None
            raw.extend(row.tobytes())

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)  # interlace=1
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(bytes(raw))))
        f.write(chunk(b"IEND", b""))


def test_native_decode_interlaced_png(tmp_path):
    """Adam7 PNGs must decode correctly on BOTH canvas-width paths (the
    streaming png_read_row path used to silently interleave passes into
    garbage; advisor round-2 finding)."""
    from PIL import Image

    from css_tpu.data import native_io

    if not native_io.native_available():
        pytest.skip("native runtime not built")

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(21, 13, 3), dtype=np.uint8)
    lab = rng.integers(0, 19, size=(21, 13), dtype=np.uint8)
    rgb_path = str(tmp_path / "interlaced_rgb.png")
    lab_path = str(tmp_path / "interlaced_lab.png")
    _write_interlaced_png(rgb_path, img)
    _write_interlaced_png(lab_path, lab)
    # sanity: PIL agrees the files are valid interlaced PNGs
    np.testing.assert_array_equal(np.asarray(Image.open(rgb_path)), img)
    np.testing.assert_array_equal(np.asarray(Image.open(lab_path)), lab)

    # wide canvas -> non-contiguous row path
    canvas = np.zeros((32, 32, 3), np.uint8)
    assert native_io.decode_png_rgb_canvas(rgb_path, canvas) == (21, 13)
    np.testing.assert_array_equal(canvas[:21, :13], img)
    # exact-width canvas -> png_read_image fast path
    tight = np.zeros((21, 13, 3), np.uint8)
    assert native_io.decode_png_rgb_canvas(rgb_path, tight) == (21, 13)
    np.testing.assert_array_equal(tight, img)

    lcanvas = np.full((32, 32), 255, np.int32)
    assert native_io.decode_png_label_canvas(lab_path, lcanvas) == (21, 13)
    np.testing.assert_array_equal(lcanvas[:21, :13], lab.astype(np.int32))


def _mini_voc_tree(tmp_path, sid="s", hw=(40, 30)):
    from PIL import Image

    os.makedirs(tmp_path / "JPEGImages", exist_ok=True)
    os.makedirs(tmp_path / "SegmentationClassAug", exist_ok=True)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    lab = rng.integers(0, 21, size=hw, dtype=np.uint8)
    lab[0, 0] = 255  # ignore value must round-trip through the cache
    Image.fromarray(img).save(tmp_path / "JPEGImages" / f"{sid}.jpg", quality=95)
    Image.fromarray(lab, mode="L").save(
        tmp_path / "SegmentationClassAug" / f"{sid}.png")
    return img, lab


def test_decoded_cache_roundtrip_and_hit(tmp_path):
    """Cached reload is byte-identical to the decode, and really does serve
    from the cache (the source files can disappear)."""
    _mini_voc_tree(tmp_path)
    cache = tmp_path / "cache"
    spec = VOCSpec(root=str(tmp_path), canvas_hw=(64, 64), cache_dir=str(cache))

    i1, l1, hw1 = spec.load("s")          # decode + populate cache
    assert (cache / "s.rawc").exists()
    i2, l2, hw2 = spec.load("s")          # cache hit
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(l1, l2)
    assert hw1.tolist() == hw2.tolist() == [40, 30]

    # delete the sources: the cached entry must be self-sufficient
    os.remove(tmp_path / "JPEGImages" / "s.jpg")
    os.remove(tmp_path / "SegmentationClassAug" / "s.png")
    i3, l3, hw3 = spec.load("s")
    np.testing.assert_array_equal(i1, i3)
    np.testing.assert_array_equal(l1, l3)
    assert hw3.tolist() == [40, 30]


def test_decoded_cache_corrupt_falls_back(tmp_path):
    """Truncated/garbage cache entries are ignored (decode + rewrite)."""
    img, lab = _mini_voc_tree(tmp_path)
    cache = tmp_path / "cache"
    spec = VOCSpec(root=str(tmp_path), canvas_hw=(64, 64), cache_dir=str(cache))
    ref_i, ref_l, _ = VOCSpec(root=str(tmp_path), canvas_hw=(64, 64)).load("s")

    os.makedirs(cache)
    for junk in (b"", b"shrt", b"\x00" * 64):
        with open(cache / "s.rawc", "wb") as f:
            f.write(junk)
        i, l, hw = spec.load("s")
        np.testing.assert_array_equal(i, ref_i)
        np.testing.assert_array_equal(l, ref_l)
        assert hw.tolist() == [40, 30]
        # the bad entry was replaced by a good one
        assert os.path.getsize(cache / "s.rawc") == 16 + 40 * 30 * 3 + 40 * 30


def test_decoded_cache_through_loader(tmp_path):
    """BatchLoader batches are identical with and without the cache."""
    for k in range(3):
        _mini_voc_tree(tmp_path, sid=f"s{k}", hw=(40, 30))
    ids = [f"s{k}" for k in range(3)]
    plain = VOCSpec(root=str(tmp_path), canvas_hw=(64, 64))
    cached = VOCSpec(root=str(tmp_path), canvas_hw=(64, 64),
                     cache_dir=str(tmp_path / "cache"))
    kw = dict(batch_size=3, seed=0, shuffle=False, drop_last=False)
    (b_plain,) = list(BatchLoader(plain, ids, **kw))
    list(BatchLoader(cached, ids, **kw))      # populate
    (b_cached,) = list(BatchLoader(cached, ids, **kw))  # serve from cache
    for key in ("image", "label", "valid_hw", "valid"):
        np.testing.assert_array_equal(b_plain[key], b_cached[key])


def test_infinite_loader_empty_split_raises():
    """A split that shards to zero batches must fail loudly, not busy-spin
    forever (the pre-fix behavior was an infinite while-loop in __next__)."""
    spec = SyntheticSpec(num_classes=5, canvas_hw=(16, 16))
    loader = BatchLoader(spec, ["a", "b"], batch_size=3, seed=0, shuffle=True,
                         drop_last=True)
    assert len(loader) == 0
    it = InfiniteLoader(loader)
    with pytest.raises(RuntimeError, match="no batches"):
        next(it)


def test_synthetic_decode_stable_across_interpreters():
    """SyntheticSpec must derive its per-sample seed from a deterministic
    hash: Python's str hash() is salted per interpreter, which silently made
    'deterministic' synthetic data differ between runs/processes."""
    import subprocess
    import sys

    code = (
        "import numpy as np\n"
        "from css_tpu.data.datasets import SyntheticSpec\n"
        "img, lab = SyntheticSpec(num_classes=5, canvas_hw=(16, 16))._decode('s3')\n"
        "print(int(img.astype(np.int64).sum()), int(lab.astype(np.int64).sum()))\n"
    )
    outs = []
    for hash_seed in ("0", "1"):
        env = dict(os.environ, PYTHONHASHSEED=hash_seed)
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr
        outs.append(out.stdout.strip())
    assert outs[0] == outs[1]


def test_pil_fallback_rgb_label_png(tmp_path, monkeypatch):
    """RGB label PNGs (trainIds replicated per channel) must decode through
    the PIL fallback too, not just the native path (first channel kept)."""
    from PIL import Image

    from css_tpu.data import native_io

    os.makedirs(tmp_path / "JPEGImages")
    os.makedirs(tmp_path / "SegmentationClassAug")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
    lab = rng.integers(0, 21, size=(20, 24), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "JPEGImages" / "s.jpg", quality=95)
    Image.fromarray(np.stack([lab] * 3, -1)).save(
        tmp_path / "SegmentationClassAug" / "s.png")

    monkeypatch.setattr(native_io, "native_available", lambda: False)
    spec = VOCSpec(root=str(tmp_path), canvas_hw=(32, 32))
    _, lcanvas, vhw = spec.load("s")
    assert vhw.tolist() == [20, 24]
    np.testing.assert_array_equal(lcanvas[:20, :24], lab)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..", "native",
                                    "libcss_io.so")),
    reason="native runtime not built",
)
def test_16bit_label_png_decodes_exact(tmp_path):
    """16-bit grayscale label PNGs: the native decoder must refuse them
    (libpng strip_16 keeps the HIGH byte -> every id < 256 becomes 0) so the
    PIL fallback reads the exact integer values."""
    from PIL import Image

    from css_tpu.data import native_io

    os.makedirs(tmp_path / "JPEGImages")
    os.makedirs(tmp_path / "SegmentationClassAug")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    lab = rng.integers(0, 21, size=(12, 10)).astype(np.uint16)
    Image.fromarray(img).save(tmp_path / "JPEGImages" / "s.jpg", quality=95)
    Image.fromarray(lab).save(tmp_path / "SegmentationClassAug" / "s.png")

    # native label decode must report failure, not return zeros
    lcanvas = np.full((16, 16), 255, np.int32)
    assert native_io.decode_png_label_canvas(
        str(tmp_path / "SegmentationClassAug" / "s.png"), lcanvas) is None

    spec = VOCSpec(root=str(tmp_path), canvas_hw=(16, 16))
    _, lcanvas, vhw = spec.load("s")
    assert vhw.tolist() == [12, 10]
    np.testing.assert_array_equal(lcanvas[:12, :10], lab.astype(np.int32))


@pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..", "native",
                                    "libcss_io.so")),
    reason="native runtime not built",
)
def test_native_corrupt_files_return_none(tmp_path):
    """Corrupt/truncated files must come back as decode failures (the error
    longjmp path), never crash or hang."""
    from css_tpu.data import native_io

    png = tmp_path / "bad.png"
    png.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    jpg = tmp_path / "bad.jpg"
    jpg.write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 64)

    lcanvas = np.full((8, 8), 255, np.int32)
    icanvas = np.zeros((8, 8, 3), np.uint8)
    for _ in range(3):  # repeat: the error path must stay reusable
        assert native_io.decode_png_label_canvas(str(png), lcanvas) is None
        assert native_io.decode_png_rgb_canvas(str(png), icanvas) is None
        assert native_io.decode_jpeg_canvas(str(jpg), icanvas) is None
