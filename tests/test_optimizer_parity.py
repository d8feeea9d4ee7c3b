"""The optax chain must reproduce torch SGD(nesterov, momentum, coupled wd)
with per-iteration poly LR — trajectory-exact (ori_pseudo.py:95-101,189)."""

import numpy as np

import jax
import jax.numpy as jnp
import torch

from css_tpu.train.schedulers import poly_lr, rampdown_value, teacher_ema_decay
from css_tpu.train.state import make_optimizer


def test_sgd_trajectory_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((13, 7)).astype(np.float32)
    grads = [rng.standard_normal((13, 7)).astype(np.float32) for _ in range(6)]
    base_lr, wd, total = 6.4e-3, 5e-4, 10

    # torch
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=base_lr, momentum=0.9, nesterov=True,
                          weight_decay=wd)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda it: max(base_lr * (1 - it / total) ** 0.9, 1e-4) / base_lr)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()
        sched.step()
    want = wt.detach().numpy()

    # optax
    tx = make_optimizer(base_lr, wd, total)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params), want, atol=1e-6, rtol=1e-5)


def test_poly_lr_values():
    # floor at min_lr and per-iteration decay (my_lr_scheduler.py:1-12)
    assert abs(float(poly_lr(0, 6.4e-3, 100)) - 6.4e-3) < 1e-9
    assert abs(float(poly_lr(100, 6.4e-3, 100)) - 1e-4) < 1e-9  # floored
    mid = float(poly_lr(50, 6.4e-3, 100))
    assert abs(mid - 6.4e-3 * 0.5 ** 0.9) < 1e-8


def test_rampdown_matches_reference_formula():
    # rampscheduler.py:44-53: max_val * exp(mult * (frac)^2), clamped
    kw = dict(begin_epoch=0, max_epoch=200, max_value=1.0, min_value=0.0,
              ramp_mult=-5.0)
    assert float(rampdown_value(0, **kw)) == 1.0
    e = 57
    want = 1.0 * np.exp(-5.0 * (57 / 200) ** 2)
    assert abs(float(rampdown_value(e, **kw)) - want) < 1e-6
    assert float(rampdown_value(200, **kw)) == 0.0
    assert float(rampdown_value(250, **kw)) == 0.0


def test_teacher_ema_decay_schedule():
    # min(1 - 1/(t+1), alpha): warms up from 0 (ddp_model.py:26-30)
    assert float(teacher_ema_decay(0)) == 0.0
    assert abs(float(teacher_ema_decay(9)) - 0.9) < 1e-6
    assert float(teacher_ema_decay(1000)) == np.float32(0.99)
