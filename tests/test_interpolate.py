"""Golden-value tests for resize ops against torch.nn.functional."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from css_tpu.ops.interpolate import bilinear_resize, nearest_resize


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (128, 128)), ((33, 47), (512, 512)),
                                          ((64, 64), (16, 16)), ((7, 9), (7, 9))])
@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear_matches_torch(in_hw, out_hw, align_corners):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(x), out_hw, align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align_corners)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [((128, 128), (32, 32)), ((31, 45), (17, 13)),
                                          ((8, 8), (64, 64))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 4), dtype=np.float32)
    got = np.asarray(nearest_resize(jnp.asarray(x), out_hw, convention="torch"))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=out_hw, mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_nearest_int_labels():
    rng = np.random.default_rng(2)
    lab = rng.integers(-1, 21, size=(2, 64, 64), dtype=np.int32)
    got = np.asarray(nearest_resize(jnp.asarray(lab), (16, 16)))
    xt = torch.from_numpy(lab).float().unsqueeze(1)
    want = F.interpolate(xt, size=(16, 16), mode="nearest").squeeze(1).long().numpy()
    np.testing.assert_array_equal(got, want)
