"""Test-time augmentation (flip + multi-scale) in the eval steps.

Beyond-reference feature: the reference's test() (ori_pseudo.py:191-211) is a
single plain forward.  TTA averages softmax probabilities over a horizontal
flip and/or input rescales before the argmax; the TTA-free configuration must
stay exactly the original protocol.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from css_tpu.train.train_step import make_eval_step, make_sliding_eval_step
from tests.test_train_step import C, CROP, _tiny_setup


def _data(b=2, hw=CROP, seed=11):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((b, hw, hw, 3), dtype=np.float32))
    lab = jnp.asarray(rng.integers(-1, C, size=(b, hw, hw)).astype(np.int32))
    valid = jnp.asarray([True] * b)
    return img, lab, valid


def test_identity_tta_matches_plain_eval():
    """flip=False, scales=(1.0,) is bit-identical to the default step."""
    model, state, _ = _tiny_setup()
    img, lab, valid = _data()
    zero = jnp.zeros((C, C), jnp.int32)
    base = jax.jit(make_eval_step(model, C))(
        state.ema_params, state.ema_batch_stats, zero, img, lab, valid)
    tta = jax.jit(make_eval_step(model, C, flip=False, scales=(1.0,)))(
        state.ema_params, state.ema_batch_stats, zero, img, lab, valid)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(tta))


def test_flip_tta_is_mirror_consistent():
    """With flip averaging, evaluating a mirrored (image, label) pair gives
    the same confusion matrix as the original: probs_avg(flip(x)) =
    flip(probs_avg(x)) exactly at scale 1.0 (float add is commutative).  The
    plain step has no such guarantee (the net isn't equivariant)."""
    model, state, _ = _tiny_setup()
    img, lab, valid = _data(seed=13)
    zero = jnp.zeros((C, C), jnp.int32)
    step = jax.jit(make_eval_step(model, C, flip=True))
    m1 = step(state.ema_params, state.ema_batch_stats, zero, img, lab, valid)
    m2 = step(state.ema_params, state.ema_batch_stats, zero,
              img[:, :, ::-1], lab[:, :, ::-1], valid)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_multiscale_eval_counts_every_valid_pixel():
    model, state, _ = _tiny_setup()
    img, lab, valid = _data(seed=17)
    zero = jnp.zeros((C, C), jnp.int32)
    step = jax.jit(make_eval_step(model, C, flip=True, scales=(0.75, 1.0, 1.25)))
    mat = np.asarray(step(state.ema_params, state.ema_batch_stats, zero,
                          img, lab, valid))
    assert mat.sum() == int((np.asarray(lab) >= 0).sum())
    assert (mat >= 0).all()


def test_sliding_identity_tta_matches_plain_sliding():
    model, state, _ = _tiny_setup()
    canvas = 48
    img, lab, valid = _data(hw=canvas, seed=19)
    zero = jnp.zeros((C, C), jnp.int32)
    kw = dict(canvas_hw=(canvas, canvas), crop_hw=(CROP, CROP),
              stride_hw=(16, 16))
    base = jax.jit(make_sliding_eval_step(model, C, **kw))(
        state.ema_params, state.ema_batch_stats, zero, img, lab, valid)
    tta = jax.jit(make_sliding_eval_step(model, C, flip=False, scales=(1.0,),
                                         **kw))(
        state.ema_params, state.ema_batch_stats, zero, img, lab, valid)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(tta))


@pytest.mark.slow
def test_sliding_msflip_runs_and_counts():
    """ms+flip sliding eval, including a downscale below the crop size (the
    zero-pad-up-to-crop path)."""
    model, state, _ = _tiny_setup()
    canvas = 48
    img, lab, valid = _data(hw=canvas, seed=23)
    zero = jnp.zeros((C, C), jnp.int32)
    step = jax.jit(make_sliding_eval_step(
        model, C, canvas_hw=(canvas, canvas), crop_hw=(CROP, CROP),
        stride_hw=(16, 16), flip=True, scales=(0.5, 1.0)))
    mat = np.asarray(step(state.ema_params, state.ema_batch_stats, zero,
                          img, lab, valid))
    assert mat.sum() == int((np.asarray(lab) >= 0).sum())
