"""Import helpers for the differential fidelity suite.

These tests run the *actual reference code* at /root/reference (PyTorch,
PIL) against css_tpu on identical inputs.  The dev image ships torch but not
torchvision, and the reference's loss hard-codes ``.cuda()`` and
``torch.distributed`` collectives, so three shims are needed:

* a minimal ``torchvision`` module implementing exactly the PIL-backend
  functions the reference uses (``transforms.functional`` resize/pad/crop/
  hflip/to_tensor/to_pil_image/normalize, ``transforms.RandomCrop.get_params``,
  ``transforms.ColorJitter``) with torchvision-0.8 semantics — each function
  delegates to PIL the same way torchvision's PIL backend does;
* a single-process gloo ``torch.distributed`` group so ``concat_all_gather``
  (ddp_model.py:241-250) runs unmodified;
* ``torch.Tensor.cuda`` -> identity (loss.py:147 calls ``.cuda()``; this box
  has no CUDA).

Nothing here is imported by css_tpu itself — test-only scaffolding.
"""

from __future__ import annotations

import random as _py_random
import sys
import types

import numpy as np
import torch
from PIL import Image, ImageEnhance

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# torchvision shim (PIL backend, torchvision 0.8 semantics)
# --------------------------------------------------------------------------

def _tv_resize(img, size, interpolation=Image.BILINEAR):
    # torchvision size is (h, w); PIL takes (w, h)
    if isinstance(size, int):
        w, h = img.size
        if (w <= h and w == size) or (h <= w and h == size):
            return img
        if w < h:
            return img.resize((size, int(size * h / w)), interpolation)
        return img.resize((int(size * w / h), size), interpolation)
    return img.resize(size[::-1], interpolation)


def _tv_pad(img, padding, fill=0, padding_mode="constant"):
    if isinstance(padding, int):
        padding = (padding,) * 4
    left, top, right, bottom = padding
    if padding_mode == "constant":
        from PIL import ImageOps

        return ImageOps.expand(img, border=(left, top, right, bottom), fill=fill)
    # reflect/edge/symmetric go through numpy, exactly like torchvision
    arr = np.asarray(img)
    if arr.ndim == 3:
        pad_width = ((top, bottom), (left, right), (0, 0))
    else:
        pad_width = ((top, bottom), (left, right))
    arr = np.pad(arr, pad_width, mode=padding_mode)
    return Image.fromarray(arr, mode=img.mode)


def _tv_crop(img, top, left, height, width):
    return img.crop((left, top, left + width, top + height))


def _tv_hflip(img):
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def _tv_to_tensor(pic):
    arr = np.asarray(pic)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
    if t.dtype == torch.uint8:
        return t.float().div(255.0)
    return t.float()


def _tv_to_pil_image(pic, mode=None):
    # torchvision: float tensors are mul(255).byte() unless mode == 'F'
    t = pic.detach().cpu()
    if t.is_floating_point() and mode != "F":
        t = t.mul(255).byte()
    arr = t.numpy()
    if arr.ndim == 3:
        arr = np.transpose(arr, (1, 2, 0))
        if arr.shape[2] == 1:
            arr = arr[:, :, 0]
    return Image.fromarray(arr, mode=mode)


def _tv_normalize(tensor, mean, std, inplace=False):
    if not inplace:
        tensor = tensor.clone()
    mean = torch.as_tensor(mean, dtype=tensor.dtype)
    std = torch.as_tensor(std, dtype=tensor.dtype)
    tensor.sub_(mean[:, None, None]).div_(std[:, None, None])
    return tensor


def _tv_adjust_brightness(img, factor):
    return ImageEnhance.Brightness(img).enhance(factor)


def _tv_adjust_contrast(img, factor):
    return ImageEnhance.Contrast(img).enhance(factor)


def _tv_adjust_saturation(img, factor):
    return ImageEnhance.Color(img).enhance(factor)


def _tv_adjust_hue(img, hue_factor):
    # torchvision PIL backend: rotate the uint8 H channel of HSV
    if not (-0.5 <= hue_factor <= 0.5):
        raise ValueError("hue_factor out of range")
    h, s, v = img.convert("HSV").split()
    np_h = np.asarray(h, dtype=np.uint8)
    # torchvision adds np.uint8(hue_factor * 255) relying on uint8
    # wraparound; modern numpy rejects negative uint8 construction, so
    # reproduce the mod-256 semantics explicitly
    shift = int(hue_factor * 255) % 256
    np_h = (np_h.astype(np.int16) + shift).astype(np.uint8)
    h = Image.fromarray(np_h, "L")
    return Image.merge("HSV", (h, s, v)).convert(img.mode)


class _RandomCrop:
    @staticmethod
    def get_params(img, output_size):
        w, h = img.size
        th, tw = output_size
        if w == tw and h == th:
            return 0, 0, h, w
        i = torch.randint(0, h - th + 1, size=(1,)).item()
        j = torch.randint(0, w - tw + 1, size=(1,)).item()
        return i, j, th, tw


class _ColorJitter:
    """torchvision-0.8 ColorJitter for tuple arguments (the only way the
    reference constructs it, VOC.py:97)."""

    def __init__(self, brightness, contrast, saturation, hue):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, img):
        ops = []
        if self.brightness is not None:
            f = _py_random.uniform(*self.brightness)
            ops.append(lambda im, f=f: _tv_adjust_brightness(im, f))
        if self.contrast is not None:
            f = _py_random.uniform(*self.contrast)
            ops.append(lambda im, f=f: _tv_adjust_contrast(im, f))
        if self.saturation is not None:
            f = _py_random.uniform(*self.saturation)
            ops.append(lambda im, f=f: _tv_adjust_saturation(im, f))
        if self.hue is not None:
            f = _py_random.uniform(*self.hue)
            ops.append(lambda im, f=f: _tv_adjust_hue(im, f))
        _py_random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


def install_torchvision_shim():
    """Register the shim under ``torchvision`` unless the real one exists."""
    try:
        import torchvision  # noqa: F401

        return
    except ImportError:
        pass
    if "torchvision" in sys.modules:
        return

    functional = types.ModuleType("torchvision.transforms.functional")
    functional.resize = _tv_resize
    functional.pad = _tv_pad
    functional.crop = _tv_crop
    functional.hflip = _tv_hflip
    functional.to_tensor = _tv_to_tensor
    functional.to_pil_image = _tv_to_pil_image
    functional.normalize = _tv_normalize
    functional.adjust_brightness = _tv_adjust_brightness
    functional.adjust_contrast = _tv_adjust_contrast
    functional.adjust_saturation = _tv_adjust_saturation
    functional.adjust_hue = _tv_adjust_hue

    transforms = types.ModuleType("torchvision.transforms")
    transforms.functional = functional
    transforms.RandomCrop = _RandomCrop
    transforms.ColorJitter = _ColorJitter

    torchvision = types.ModuleType("torchvision")
    torchvision.transforms = transforms

    sys.modules["torchvision"] = torchvision
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


# --------------------------------------------------------------------------
# reference import + runtime shims
# --------------------------------------------------------------------------

def patch_cuda():
    """Make ``.cuda()`` a no-op (loss.py:147 calls it; CPU-only box)."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def ensure_dist():
    """Single-process gloo group so concat_all_gather runs unmodified."""
    import torch.distributed as dist

    if not dist.is_initialized():
        import tempfile

        store_file = tempfile.mktemp(prefix="css_ref_dist_")
        dist.init_process_group(
            backend="gloo", init_method=f"file://{store_file}",
            world_size=1, rank=0,
        )


def import_reference():
    """Make /root/reference importable and return its package root name."""
    install_torchvision_shim()
    patch_cuda()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import generalframeworks  # noqa: F401

    return generalframeworks
