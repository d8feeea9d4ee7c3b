"""Dataset record specs: path layout + decode-to-canvas.

The host side of the pipeline is deliberately thin — decode the image/label
pair and paste it into a fixed-size uint8 canvas (image padded 0, label
padded 255=ignore) with the true (h, w) recorded.  Every stochastic
transform happens on device (css_tpu/ops/augment.py), unlike the reference
whose dataloader runs the full PIL pipeline per worker process
(dataset_helpers/VOC.py:11-27).

Path layouts mirror the reference:
  * VOC:        <root>/JPEGImages/<id>.jpg,
                <root>/SegmentationClassAug/<id>.png          (VOC.py:21-22)
  * Cityscapes: ids like ``<city>_..._leftImg8bit``; image at
                <root>/leftImg8bit/<mode>/<city>/<id>.png, label at
                <root>/gtFine/<mode>/<city>/<id minus "_leftImg8bit">_
                gtFine_trainIds.png                 (Cityscapes.py:219-225)

``SyntheticSpec`` generates deterministic pseudo-data with the same record
interface for tests and benchmarks.
"""

from __future__ import annotations

import dataclasses
import os
import threading
import zlib
from typing import Optional, Tuple

import numpy as np

__all__ = ["VOCSpec", "CityscapesSpec", "SyntheticSpec", "build_dataset_specs"]

# decoded-raw cache file header: [magic, h, w, reserved] int32
_CACHE_MAGIC = 0x43535243  # "CSRC"


@dataclasses.dataclass
class _CanvasSpec:
    canvas_hw: Tuple[int, int]
    # Opt-in decoded-raw cache: after the first decode, samples are stored as
    # header + raw pixel bytes under this directory and subsequent epochs
    # read them back at page-cache speed, eliminating the PNG/JPEG decode
    # cost entirely (the working analog of the reference's vestigial
    # ``Cityscapes_Dataset_cache``, Cityscapes.py:10-38, which re-decoded
    # every epoch anyway).  Best-effort: any read/validate failure falls
    # back to decoding (and rewrites the entry).
    cache_dir: Optional[str] = None

    def load(self, sample_id: str):
        """Returns (image_canvas uint8 [H,W,3], label_canvas int32 [H,W],
        valid_hw (h, w))."""
        ch, cw = self.canvas_hw
        icanvas = np.zeros((ch, cw, 3), np.uint8)
        lcanvas = np.full((ch, cw), 255, np.int32)
        vhw = self.load_into(sample_id, icanvas, lcanvas)
        return icanvas, lcanvas, vhw

    def load_into(self, sample_id: str, icanvas: np.ndarray,
                  lcanvas: np.ndarray) -> np.ndarray:
        """Decode straight into caller-provided canvases (e.g. rows of the
        batch arrays — the native decoders write scanlines in place, so the
        batch assembly path is copy-free).  ``icanvas`` must be pre-filled 0
        and ``lcanvas`` 255.  Returns valid_hw [2] int32."""
        if self.cache_dir:
            hw = self._load_cached_into(sample_id, icanvas, lcanvas)
            if hw is not None:
                return hw
        hw = self._decode_into(sample_id, icanvas, lcanvas)
        if self.cache_dir:
            self._store_cache(sample_id, icanvas, lcanvas, hw)
        return hw

    def _decode_into(self, sample_id: str, icanvas: np.ndarray,
                     lcanvas: np.ndarray) -> np.ndarray:
        hw = self._load_native_into(sample_id, icanvas, lcanvas)
        if hw is not None:
            return hw
        img, lab = self._decode(sample_id)
        if lab is not None and lab.ndim == 3:
            # RGB label maps: trainIds replicated per channel — keep the
            # first, matching the native decoder (css_io.cpp RGB-label path)
            lab = lab[..., 0]
        ch, cw = self.canvas_hw
        h, w = img.shape[:2]
        if h > ch or w > cw:
            raise ValueError(
                f"sample {sample_id} ({h}x{w}) exceeds canvas {self.canvas_hw}"
            )
        icanvas[:h, :w] = img
        if lab is not None:
            lcanvas[:h, :w] = lab
        return np.asarray([h, w], np.int32)

    # ---- decoded-raw cache ------------------------------------------------

    def _cache_key(self, sample_id: str) -> str:
        return sample_id

    def _cache_path(self, sample_id: str) -> str:
        return os.path.join(self.cache_dir, f"{self._cache_key(sample_id)}.rawc")

    def _load_cached_into(self, sample_id: str, icanvas, lcanvas):
        """Read a cached sample straight into the canvases; None on any
        miss/mismatch (caller decodes and rewrites)."""
        ch, cw = self.canvas_hw
        try:
            with open(self._cache_path(sample_id), "rb") as f:
                head = np.frombuffer(f.read(16), np.int32)
                if head.size != 4 or int(head[0]) != _CACHE_MAGIC:
                    return None
                h, w = int(head[1]), int(head[2])
                if not (0 < h <= ch and 0 < w <= cw):
                    return None
                img = f.read(h * w * 3)
                lab = f.read(h * w)
                if len(img) != h * w * 3 or len(lab) != h * w:
                    return None
            icanvas[:h, :w] = np.frombuffer(img, np.uint8).reshape(h, w, 3)
            lcanvas[:h, :w] = np.frombuffer(lab, np.uint8).reshape(h, w)
            return np.asarray([h, w], np.int32)
        except OSError:
            return None

    def _store_cache(self, sample_id: str, icanvas, lcanvas, hw) -> None:
        h, w = int(hw[0]), int(hw[1])
        path = self._cache_path(sample_id)
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # unique temp per writer + atomic replace: concurrent decode
            # workers caching the same sample can never interleave bytes
            tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
            with open(tmp, "wb") as f:
                np.asarray([_CACHE_MAGIC, h, w, 0], np.int32).tofile(f)
                f.write(np.ascontiguousarray(icanvas[:h, :w]).tobytes())
                # labels are 0..num_class-1 or 255-ignore — u8 round-trips
                f.write(lcanvas[:h, :w].astype(np.uint8).tobytes())
            os.replace(tmp, path)
        except OSError:
            pass  # cache is best-effort; next epoch just decodes again

    def _load_native_into(self, sample_id: str, icanvas, lcanvas):
        """C++ decode into the given canvases when the native runtime is
        built and the spec provides paths; None -> PIL fallback."""
        from css_tpu.data import native_io

        paths = self._paths(sample_id)
        if paths is None or not native_io.native_available():
            return None
        img_path, lab_path = paths
        if img_path.endswith(".jpg") or img_path.endswith(".jpeg"):
            hw = native_io.decode_jpeg_canvas(img_path, icanvas)
        elif img_path.endswith(".png"):
            hw = native_io.decode_png_rgb_canvas(img_path, icanvas)
        else:
            hw = None
        if hw is None:
            return None
        if lab_path is not None and os.path.exists(lab_path):
            if native_io.decode_png_label_canvas(lab_path, lcanvas) is None:
                return None
        return np.asarray(hw, np.int32)

    def _paths(self, sample_id: str):
        """(image_path, label_path_or_None) when path-based, else None."""
        return None

    def _decode(self, sample_id: str):
        raise NotImplementedError


@dataclasses.dataclass
class VOCSpec(_CanvasSpec):
    root: str = ""
    canvas_hw: Tuple[int, int] = (512, 512)

    def _paths(self, sample_id: str):
        return (
            os.path.join(self.root, "JPEGImages", f"{sample_id}.jpg"),
            os.path.join(self.root, "SegmentationClassAug", f"{sample_id}.png"),
        )

    def _decode(self, sample_id: str):
        from PIL import Image

        img = Image.open(os.path.join(self.root, "JPEGImages", f"{sample_id}.jpg"))
        img = np.asarray(img.convert("RGB"), np.uint8)
        lab_path = os.path.join(self.root, "SegmentationClassAug", f"{sample_id}.png")
        lab = None
        if os.path.exists(lab_path):
            lab = np.asarray(Image.open(lab_path), np.int32)
        return img, lab


@dataclasses.dataclass
class CityscapesSpec(_CanvasSpec):
    root: str = ""
    mode: str = "train"  # train | val
    canvas_hw: Tuple[int, int] = (1024, 2048)

    def _cache_key(self, sample_id: str) -> str:
        return f"{self.mode}_{sample_id}"

    def _paths(self, sample_id: str):
        city = sample_id[: sample_id.find("_")]
        lab_id = sample_id[: -len("_leftImg8bit")] + "_gtFine_trainIds"
        return (
            os.path.join(self.root, "leftImg8bit", self.mode, city,
                         f"{sample_id}.png"),
            os.path.join(self.root, "gtFine", self.mode, city, f"{lab_id}.png"),
        )

    def _decode(self, sample_id: str):
        from PIL import Image

        city = sample_id[: sample_id.find("_")]
        img_path = os.path.join(
            self.root, "leftImg8bit", self.mode, city, f"{sample_id}.png"
        )
        lab_id = sample_id[:-len("_leftImg8bit")] + "_gtFine_trainIds"
        lab_path = os.path.join(self.root, "gtFine", self.mode, city, f"{lab_id}.png")
        img = np.asarray(Image.open(img_path).convert("RGB"), np.uint8)
        lab = None
        if os.path.exists(lab_path):
            lab = np.asarray(Image.open(lab_path), np.int32)
        return img, lab


@dataclasses.dataclass
class SyntheticSpec(_CanvasSpec):
    """Deterministic random data with the record interface (tests/bench)."""

    num_classes: int = 21
    canvas_hw: Tuple[int, int] = (512, 512)
    image_hw: Optional[Tuple[int, int]] = None   # default: ~canvas-sized

    def _decode(self, sample_id: str):
        # crc32, not hash(): str hashing is salted per interpreter, which
        # would make the "deterministic" data differ across runs/processes
        seed = zlib.crc32(sample_id.encode()) & 0x7FFFFFFF
        rng = np.random.default_rng(seed)
        if self.image_hw is not None:
            h, w = self.image_hw
        else:
            h = max(int(self.canvas_hw[0] * 0.95), 1)
            w = max(int(self.canvas_hw[1] * 0.75), 1)
        # learnable task: smooth color blobs whose quantized brightness is
        # the label — end-to-end runs show real mIoU improvement, unlike
        # iid noise
        yy = np.linspace(0, 4 * np.pi, h)[:, None]
        xx = np.linspace(0, 4 * np.pi, w)[None, :]
        ph = rng.random(6) * 2 * np.pi
        fr = rng.random(6) * 1.5 + 0.25
        field = sum(np.sin(fr[i] * yy + ph[i]) * np.cos(fr[i + 3] * xx + ph[i + 3])
                    for i in range(3))
        field = (field - field.min()) / max(float(np.ptp(field)), 1e-6)
        img = np.stack([field, field ** 2, 1.0 - field], axis=-1)
        img = np.clip(img * 255 + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(np.uint8)
        lab = np.minimum((field * self.num_classes).astype(np.int32),
                         self.num_classes - 1)
        lab[rng.random((h, w)) < 0.02] = 255
        return img, lab


# Cityscapes raw labelIds -> 19 trainIds (cityscapesScripts labels table;
# the reference carries the same map unused at Cityscapes.py:194-217 because
# its label files are already *_gtFine_trainIds — provided here for users
# whose datasets only have labelIds).
_CITYSCAPES_ID_TO_TRAIN = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


def cityscapes_labelids_to_trainids(mask: np.ndarray) -> np.ndarray:
    out = np.full_like(mask, 255)
    for raw, train in _CITYSCAPES_ID_TO_TRAIN.items():
        out[mask == raw] = train
    return out


def build_dataset_specs(name: str, data_dir: str, canvas_hw: Tuple[int, int],
                        num_classes: int = 21, cache_dir: Optional[str] = None):
    """(train_spec, test_spec) for a dataset name (VOC|CityScapes|Synthetic).

    ``cache_dir`` enables the decoded-raw sample cache (epoch-2+ loads skip
    image decoding entirely)."""
    if name == "VOC":
        spec = VOCSpec(root=data_dir, canvas_hw=tuple(canvas_hw),
                       cache_dir=cache_dir)
        return spec, spec
    if name == "CityScapes":
        return (
            CityscapesSpec(root=data_dir, mode="train", canvas_hw=tuple(canvas_hw),
                           cache_dir=cache_dir),
            CityscapesSpec(root=data_dir, mode="val", canvas_hw=tuple(canvas_hw),
                           cache_dir=cache_dir),
        )
    if name == "Synthetic":
        spec = SyntheticSpec(num_classes=num_classes, canvas_hw=tuple(canvas_hw),
                             cache_dir=cache_dir)
        return spec, spec
    raise ValueError(f"unknown dataset {name}")
