"""PyTorch -> Flax weight conversion for the backbone and full model.

The reference initializes its trunk from torchvision's ImageNet ResNet-101
checkpoint (``ori_pseudo.py:67-69`` loads ``./pretrained/resnet101.pth``) or
the authors' deep-stem checkpoint (``README.md:45``).  This module converts
those torch state dicts into the css_tpu Flax parameter/batch-stats pytrees:

* ``convert_resnet_backbone`` — torchvision ``resnet101()`` state dict
  (keys ``conv1/bn1/layer{1..4}.{i}...``) -> ``ResNetBackbone`` variables.
* ``convert_full_model`` — a full ``DeepLabv3Plus_with_rep``-layout state
  dict (keys ``resnet_conv1/ASPP/project/classifier/representation`` per
  deeplabv3.py:103-133) -> ``DeepLabV3PlusDual`` variables, used to ingest
  reference checkpoints for eval parity.

Conversion rules: conv kernels OIHW -> HWIO; BatchNorm ``weight/bias/
running_mean/running_var`` -> flax ``scale/bias`` params and ``mean/var``
batch stats.  Tensors are converted eagerly to numpy; no torch dependency is
required at train time (only when converting).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "convert_resnet_backbone",
    "convert_full_model",
    "load_torch_state_dict",
]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` state dict into numpy (requires torch, CPU-only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _conv(sd: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(sd[key], (2, 3, 1, 0)))  # OIHW->HWIO


def _bn(sd: Mapping[str, np.ndarray], prefix: str):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _convbn(sd, conv_key, bn_prefix):
    bn_p, bn_s = _bn(sd, bn_prefix)
    return {"conv": {"kernel": _conv(sd, conv_key)}, "bn": bn_p}, {"bn": bn_s}


def _backbone_entries(stages, deep_stem: bool):
    """Yield (flax_module_name, torch_conv_key, torch_bn_prefix) triples.

    ``stages`` is the flax backbone's ``StageSpec`` tuple; torch layer/block
    indices are recovered from it (the multigrid deep-stem flax model expands
    torch ``layer4.{0,1,2}`` into single-block stages ``layer{4,5,6}_0``).
    """
    out = []
    if deep_stem:
        out += [
            ("stem1", "conv1.0.weight", "conv1.1"),
            ("stem2", "conv1.3.weight", "conv1.4"),
            ("stem3", "conv1.6.weight", "bn1"),
        ]
    else:
        out.append(("stem", "conv1.weight", "bn1"))
    # torch layer index = position of the stage's plane width in the canonical
    # [64, 128, 256, 512] ladder; expanded multigrid stages (same planes)
    # continue the torch block counter within that layer.
    plane_to_layer = {64: 1, 128: 2, 256: 3, 512: 4}
    block_counter = {1: 0, 2: 0, 3: 0, 4: 0}
    for si, spec in enumerate(stages):
        torch_layer = plane_to_layer[spec.planes]
        for bi in range(spec.blocks):
            tprefix = f"layer{torch_layer}.{block_counter[torch_layer]}"
            fprefix = f"layer{si + 1}_{bi}"
            for cn in ("conv1", "conv2", "conv3"):
                bn = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3"}[cn]
                out.append((f"{fprefix}/{cn}", f"{tprefix}.{cn}.weight", f"{tprefix}.{bn}"))
            out.append((f"{fprefix}/downsample", f"{tprefix}.downsample.0.weight",
                        f"{tprefix}.downsample.1"))
            block_counter[torch_layer] += 1
    return out


def _assign(tree: dict, path: str, value: dict):
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_resnet_backbone(sd: Mapping[str, np.ndarray], backbone) -> Tuple[dict, dict]:
    """Convert a torchvision-resnet-style state dict for ``backbone``.

    Returns ``(params, batch_stats)`` sub-pytrees matching
    ``ResNetBackbone.init`` structure.  Downsample entries absent from the
    torch dict (blocks without downsample) are skipped automatically.
    """
    params: dict = {}
    stats: dict = {}
    for fname, conv_key, bn_prefix in _backbone_entries(backbone.stages, backbone.deep_stem):
        if conv_key not in sd:
            continue
        p, s = _convbn(sd, conv_key, bn_prefix)
        _assign(params, fname, p)
        _assign(stats, fname, s)
    return params, stats


_ASPP_MAP = [
    # (flax name inside aspp, torch conv key, torch bn prefix)
    ("conv1x1", "ASPP.convs.0.0.weight", "ASPP.convs.0.1"),
    ("atrous0", "ASPP.convs.1.0.weight", "ASPP.convs.1.1"),
    ("atrous1", "ASPP.convs.2.0.weight", "ASPP.convs.2.1"),
    ("atrous2", "ASPP.convs.3.0.weight", "ASPP.convs.3.1"),
    ("pool_conv", "ASPP.convs.4.1.weight", "ASPP.convs.4.2"),
    ("project", "ASPP.project.0.weight", "ASPP.project.1"),
]


def convert_full_model(sd: Mapping[str, np.ndarray], model) -> Tuple[dict, dict]:
    """Convert a DeepLabv3Plus_with_rep-layout state dict to flax variables.

    ``model`` is a ``DeepLabV3PlusDual`` instance (for stage layout).
    Returns full ``(params, batch_stats)`` pytrees.
    """
    backbone_sd = {
        k[len("resnet_"):]: v for k, v in sd.items() if k.startswith("resnet_")
    }
    bparams, bstats = convert_resnet_backbone(backbone_sd, model.backbone)
    params: dict = {"backbone": bparams}
    stats: dict = {"backbone": bstats}

    aspp_p: dict = {}
    aspp_s: dict = {}
    for fname, ck, bp in _ASPP_MAP:
        p, s = _convbn(sd, ck, bp)
        _assign(aspp_p, fname, p)
        _assign(aspp_s, fname, s)
    params["aspp"], stats["aspp"] = aspp_p, aspp_s

    p, s = _convbn(sd, "project.0.weight", "project.1")
    params["project"], stats["project"] = p, s

    for head in ("classifier", "representation"):
        p, s = _convbn(sd, f"{head}.0.weight", f"{head}.1")
        head_p = {"conv": p}
        head_s = {"conv": s}
        head_p["out"] = {
            "kernel": _conv(sd, f"{head}.3.weight"),
            "bias": sd[f"{head}.3.bias"],
        }
        params[head], stats[head] = head_p, head_s
    return params, stats
