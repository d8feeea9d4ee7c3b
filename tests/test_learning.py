"""Does it actually learn?  Gradient-sanity beyond one-step smoke tests.

The reference's only training-correctness signal was a full GPU run
(SURVEY.md section 4).  Here: a tiny model must fit a *learnable* synthetic
segmentation task (labels are a deterministic function of the image) within
a few dozen supervised steps — catching sign errors, LR plumbing, BN-state
threading, or EMA/optimizer wiring regressions that one-step tests miss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from css_tpu.models import build_model
from css_tpu.train.state import create_train_state, make_optimizer
from css_tpu.train.train_step import StepConfig, make_train_step

C = 4
CROP = 32


@pytest.mark.slow
def test_supervised_loss_decreases():
    rng = np.random.default_rng(0)
    model = build_model(num_classes=C, output_dim=8, backbone="tiny")
    tx = make_optimizer(base_lr=0.05, weight_decay=1e-4, total_steps=200)
    state = create_train_state(jax.random.key(0), model, tx,
                               (1, CROP, CROP, 3), num_classes=C, output_dim=8)
    cfg = StepConfig(
        num_classes=C, crop_hw=(CROP, CROP), scale_range=(1.0, 1.0),
        strategy="ori", mix_mode="none", contrast_enabled=False,
        num_queries=4, num_negatives=8,
    )
    step = jax.jit(make_train_step(model, tx, cfg, axis_name=None),
                   donate_argnums=(0,))

    img = rng.random((4, CROP, CROP, 3), dtype=np.float32)
    # smooth so the label field is resolvable at the model's /4 output
    # stride: 8x8 box filter via 2-D cumsum
    def box(x, k=8):
        c = np.cumsum(np.cumsum(np.pad(x, ((0, 0), (k, 0), (k, 0))), 1), 2)
        return (c[:, k:, k:] - c[:, :-k, k:] - c[:, k:, :-k] + c[:, :-k, :-k]) / (k * k)

    smooth = box(img.mean(-1))
    edges = np.quantile(smooth, [0.25, 0.5, 0.75])
    lab = np.digitize(smooth, edges).astype(np.int32)
    batch = {
        "l_image": jnp.asarray(img),
        "l_label": jnp.asarray(lab),
        "l_valid_hw": jnp.full((4, 2), CROP, jnp.int32),
        "u_image": jnp.asarray(img),
        "u_valid_hw": jnp.full((4, 2), CROP, jnp.int32),
    }
    losses = []
    key = jax.random.key(1)
    for i in range(40):
        state, m = step(state, batch, jax.random.fold_in(key, i),
                        jnp.float32(0.0), jnp.asarray(False))
        losses.append(float(m["sup"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.75 * first, f"no learning: first={first:.3f} last={last:.3f}"
    # and the trend is downward, not noise
    t = np.arange(len(losses))
    assert np.corrcoef(t, losses)[0, 1] < -0.5
    assert np.isfinite(losses).all()
