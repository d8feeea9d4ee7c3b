"""Golden tests for CE/OHEM/threshold losses against torch formulas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from css_tpu.losses import (
    attention_threshold_loss,
    cross_entropy,
    ohem_cross_entropy,
)


def _rand_case(seed, b=2, h=17, w=19, c=7, ignore_frac=0.3):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w)).astype(np.int64)
    labels[rng.random((b, h, w)) < ignore_frac] = -1
    return logits, labels


@pytest.mark.parametrize("seed", [0, 1])
def test_cross_entropy_matches_torch(seed):
    logits, labels = _rand_case(seed)
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels),
        ignore_index=-1,
    ).item()
    assert abs(got - want) < 1e-5


def _torch_ohem(logits_t, labels_t, thresh, min_kept):
    """Independent torch re-derivation of OHEM semantics (loss.py:19-46)."""
    b, c, h, w = logits_t.shape
    target = labels_t.reshape(-1).clone()
    valid = target != -1
    prob = F.softmax(logits_t, dim=1).permute(1, 0, 2, 3).reshape(c, -1)
    n_valid = int(valid.sum())
    if 0 < n_valid < min_kept:
        pass  # keep all valid
    elif n_valid > 0:
        filled = prob.masked_fill(~valid.unsqueeze(0), 1.0)
        tp = filled[target.clamp(min=0), torch.arange(target.numel())]
        kth = tp.sort().values[min(min_kept, tp.numel()) - 1]
        threshold = max(float(kth), thresh)
        keep = tp <= threshold
        valid = valid & keep
    target[~valid] = -1
    return F.cross_entropy(logits_t, target.reshape(b, h, w), ignore_index=-1).item()


@pytest.mark.parametrize("min_kept", [10, 150, 100000])
def test_ohem_matches_torch(min_kept):
    logits, labels = _rand_case(3)
    got = float(
        ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.7, min_kept)
    )
    want = _torch_ohem(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(labels),
        0.7, min_kept,
    )
    assert abs(got - want) < 1e-5


def test_attention_threshold_matches_reference_formula():
    logits, labels = _rand_case(5, ignore_frac=0.2)
    rng = np.random.default_rng(6)
    conf = rng.random(labels.shape).astype(np.float32)
    got = float(
        attention_threshold_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(conf), 0.6
        )
    )
    # independent torch evaluation of the published formula (loss.py:53-64)
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    lab = torch.from_numpy(labels)
    b = lt.shape[0]
    weighting = (torch.from_numpy(conf).view(b, -1) >= 0.6).sum(-1) / (
        (lab.view(b, -1) >= 0).sum(-1)
    )
    loss = F.cross_entropy(lt, lab, reduction="none", ignore_index=-1)
    want = torch.mean(
        torch.masked_select(weighting[:, None, None] * loss, loss > 0)
    ).item()
    assert abs(got - want) < 1e-5


def test_attention_threshold_no_valid_pixels_is_finite():
    logits = jnp.zeros((1, 4, 4, 3))
    labels = -jnp.ones((1, 4, 4), jnp.int32)
    conf = jnp.zeros((1, 4, 4))
    out = attention_threshold_loss(logits, labels, conf, 0.97)
    assert np.isfinite(float(out)) and float(out) == 0.0


def test_kth_smallest_bisection_matches_sort():
    """kth_smallest_nonneg (31-step bit bisection, the 769^2 OHEM sort
    replacement) is exact vs jnp.sort at every rank regime, including
    duplicates, exact 0.0/1.0 plateaus, and denormal-free uniform draws."""
    from css_tpu.losses.cross_entropy import kth_smallest_nonneg

    rng = np.random.default_rng(0)
    cases = [
        rng.random(10_001).astype(np.float32),
        np.concatenate([np.zeros(50, np.float32), np.ones(50, np.float32),
                        rng.random(900).astype(np.float32)]),
        np.full(64, 0.25, np.float32),
        rng.random(7).astype(np.float32),
        # values > 1.5 drive the bisection's lo near hi=f32-max: guards the
        # overflow-safe midpoint (lo + (hi-lo)//2) for non-probability use
        rng.random(512).astype(np.float32) * 3e38,
    ]
    for arr in cases:
        ref = np.sort(arr)
        for k in {1, 2, len(arr) // 3, len(arr) // 2, len(arr)}:
            got = float(kth_smallest_nonneg(jnp.asarray(arr), k))
            assert got == ref[k - 1], (len(arr), k, got, ref[k - 1])
