"""Diagnose the fused-vs-unfused drift in the remat'd deep-stem + OHEM
tiny step (tests/test_train_step.py::test_fused_step_equals_unfused_metrics
[features1]).

Two candidate mechanisms for the 17/1728-element, 3e-4 param drift:
  (a) OHEM kept-set flip: fused/unfused confidences differ by accumulation
      noise, a pixel crosses the kth threshold, the CE gradient changes
      discretely;
  (b) pure bf16/f32 accumulation-order noise in the wgrads (one fused
      reduction vs two sequential ones).

This script instruments ohem_cross_entropy to capture (kth, keep_thresh,
kept mask) on both paths, runs both steps EAGERLY (same compute graph as
the jitted test, CPU f32), and reports:
  * max |pred_l| / |pred_u| forward difference,
  * whether the OHEM kept masks are identical,
  * per-layer location/magnitude of the param drift.
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import css_tpu.train.train_step as ts
from css_tpu.losses.cross_entropy import ohem_cross_entropy as real_ohem
from css_tpu.models import build_model
from css_tpu.train.state import create_train_state, make_optimizer
from css_tpu.train.train_step import StepConfig, make_train_step

CROP = 32
C = 6

captured = []


def spy_ohem(logits, labels, thresh=0.7, min_kept=200000, _kth="bisect"):
    from css_tpu.losses.cross_entropy import kth_smallest_nonneg, per_pixel_cross_entropy
    labels = labels.astype(jnp.int32)
    valid = labels >= 0
    num_valid = valid.sum()
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.where(valid, labels, 0)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=prob.dtype)
    target_prob = jnp.sum(prob * onehot, axis=-1)
    target_prob = jnp.where(valid, target_prob, 1.0)
    flat = target_prob.reshape(-1)
    k = min(int(min_kept), flat.shape[0])
    kth = kth_smallest_nonneg(flat, k)
    keep_thresh = jnp.maximum(kth, thresh)
    keep_thresh = jnp.where(min_kept > num_valid, jnp.inf, keep_thresh)
    kept = valid & (target_prob <= keep_thresh)
    def _record(kth_, thr_, kept_, tp_, logits_):
        captured.append(dict(kth=np.asarray(kth_), keep_thresh=np.asarray(thr_),
                             kept=np.asarray(kept_), tp=np.asarray(tp_),
                             logits=np.asarray(logits_, np.float32)))

    jax.debug.callback(_record, kth, keep_thresh, kept, target_prob,
                       logits.astype(jnp.float32))
    nll = per_pixel_cross_entropy(logits, jnp.where(kept, labels, -1))
    denom = jnp.maximum(kept.sum(), 1)
    return nll.sum() / denom


ts.ohem_cross_entropy = spy_ohem


def _tiny_setup(fused):
    model = build_model(num_classes=C, output_dim=16, backbone="tiny_stem",
                        axis_name=None, remat=True)
    tx = make_optimizer(base_lr=1e-2, weight_decay=5e-4, total_steps=100)
    state = create_train_state(
        jax.random.key(0), model, tx, (1, CROP, CROP, 3), num_classes=C,
        output_dim=16)
    cfg = StepConfig(
        num_classes=C, crop_hw=(CROP, CROP), scale_range=(0.5, 1.5),
        strategy="ori", num_queries=8, num_negatives=16,
        fused_forward=fused, sup_loss="ohem", ohem_min_kept_per_image=64)
    step = make_train_step(model, tx, cfg, axis_name=None)
    return state, step


def _batch(b, seed=0, canvas=40):
    rng = np.random.default_rng(seed)
    return {
        "l_image": rng.random((b, canvas, canvas, 3), dtype=np.float32),
        "l_label": rng.integers(0, C, size=(b, canvas, canvas)).astype(np.int32),
        "l_valid_hw": np.full((b, 2), canvas, np.int32),
        "u_image": rng.random((b, canvas, canvas, 3), dtype=np.float32),
        "u_valid_hw": np.full((b, 2), canvas, np.int32),
    }


batch = {k: jnp.asarray(v) for k, v in _batch(2, seed=5).items()}
key = jax.random.key(7)
w = jnp.float32(1.0)
flag = jnp.asarray(False)

state_f, step_f = _tiny_setup(True)
state_s, step_s = _tiny_setup(False)

captured.clear()
sf, mf = step_f(state_f, batch, key, w, flag)
cap_f = list(captured)
captured.clear()
ss, ms = step_s(state_s, batch, key, w, flag)
cap_s = list(captured)

print("metrics fused  :", {k: float(v) for k, v in mf.items()})
print("metrics unfused:", {k: float(v) for k, v in ms.items()})
print()
for i, (a, b) in enumerate(zip(cap_f, cap_s)):
    same_kept = np.array_equal(a["kept"], b["kept"])
    print(f"ohem call {i}: kth f={a['kth']:.8f} s={b['kth']:.8f} "
          f"thresh f={a['keep_thresh']:.8f} s={b['keep_thresh']:.8f} "
          f"kept f={a['kept'].sum()} s={b['kept'].sum()} same_kept={same_kept}")
    print(f"  max|logits diff| = {np.abs(a['logits']-b['logits']).max():.3e}"
          f"  max|target_prob diff| = {np.abs(a['tp']-b['tp']).max():.3e}")
    if not same_kept:
        flips = np.argwhere(a["kept"] != b["kept"])
        print(f"  {len(flips)} flipped pixels; tp at flips:",
              [(a['tp'][tuple(ix)], b['tp'][tuple(ix)]) for ix in flips[:5]])

def drift_report(tag, pa, pb):
    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_b = jax.tree.leaves(pb)
    worst = []
    for (path, a), b in zip(flat_a, flat_b):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        n_bad = int((d > 1e-4).sum())
        if n_bad or d.max() > 5e-5:
            worst.append((jax.tree_util.keystr(path), d.max(), n_bad, a.size))
    worst.sort(key=lambda t: -t[1])
    print(f"--- param drift: {tag}")
    for name, mx, nb, size in worst[:8]:
        print(f"{name}: max {mx:.2e}, {nb}/{size} above 1e-4")
    if not worst:
        print("(all leaves within 5e-5)")


print()
drift_report("fused-eager vs unfused-eager", sf.params, ss.params)

# CONTROL: the same unfused graph, jit-compiled vs eager — identical
# semantics, different schedule.  The drift it shows is the intrinsic
# reduction-order noise floor of this (deep-stem + BN-chain) graph; the
# fused/unfused delta must be judged against it, not against zero.
captured.clear()
state_s2, _ = _tiny_setup(False)
ssj, msj = jax.jit(step_s)(state_s2, batch, key, w, flag)
print()
print("metrics unfused-jit:", {k: float(v) for k, v in msj.items()})
drift_report("unfused-jit vs unfused-eager (noise control)",
             ssj.params, ss.params)

captured.clear()
state_f2, _ = _tiny_setup(True)
sfj, mfj = jax.jit(step_f)(state_f2, batch, key, w, flag)
drift_report("fused-jit vs unfused-jit (the test's comparison)",
             sfj.params, ssj.params)
