"""Tests for the fixed-shape prototype contrastive loss.

The reference implementation (loss/loss.py:66-149) is dynamic-shaped and
RNG-incompatible, so parity is checked against closed-form/numpy
re-derivations of its published math rather than the torch code.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from css_tpu.losses.contrastive import prototype_contrastive_loss, update_prototypes


def _flatten_case(seed, n=64, d=8, c=5):
    rng = np.random.default_rng(seed)
    rep = rng.standard_normal((n, d)).astype(np.float32)
    cls = rng.integers(0, c, size=n).astype(np.int32)
    member = rng.random(n) < 0.6
    return rep, cls, member


def test_prototype_update_first_touch_and_ema():
    rep, cls, member = _flatten_case(0)
    c, d = 5, 8
    protos = np.zeros((c, d), np.float32)
    protos[2] = np.ones(d)  # class 2 already initialized
    new, counts = update_prototypes(
        jnp.asarray(rep), jnp.asarray(cls), jnp.asarray(member),
        jnp.asarray(protos), alpha=0.99,
    )
    new = np.asarray(new)
    for i in range(c):
        sel = member & (cls == i)
        if sel.sum() == 0:
            np.testing.assert_array_equal(new[i], protos[i])
        else:
            mean = rep[sel].mean(0)
            if protos[i].sum() == 0:
                np.testing.assert_allclose(new[i], mean, atol=1e-5)
            else:
                np.testing.assert_allclose(
                    new[i], 0.99 * protos[i] + 0.01 * mean, atol=1e-5
                )
        assert counts[i] == sel.sum()


def test_contrastive_closed_form_two_singleton_classes():
    """Two classes x one valid hard pixel each: sampling is fully forced."""
    d, c, q, g, temp = 8, 2, 16, 32, 0.5
    rng = np.random.default_rng(1)
    rep = rng.standard_normal((1, 2, 2, d)).astype(np.float32)
    onehot = np.zeros((1, 2, 2, c), np.float32)
    onehot[0, 0, 0, 0] = 1.0   # pixel A -> class 0
    onehot[0, 1, 1, 1] = 1.0   # pixel B -> class 1
    mask = np.zeros((1, 2, 2), np.float32)
    mask[0, 0, 0] = mask[0, 1, 1] = 1.0
    prob = np.zeros((1, 2, 2, c), np.float32)  # low prob => everything "hard"

    loss, new_protos = prototype_contrastive_loss(
        jnp.asarray(rep), jnp.asarray(onehot), jnp.asarray(mask),
        jnp.asarray(prob), jnp.zeros((c, d)), jax.random.key(0),
        num_queries=q, num_negatives=g, temp=temp, strong_threshold=0.97,
        alpha=0.99,
    )
    a = rep[0, 0, 0] / np.linalg.norm(rep[0, 0, 0])
    b = rep[0, 1, 1] / np.linalg.norm(rep[0, 1, 1])
    cos_ab = float(a @ b)
    # per class: positive logit = cos(self, self)=1, negatives = g copies of
    # the other pixel; CE(target=0) = logsumexp - pos
    def infonce(pos, neg):
        logits = np.array([pos / temp] + [neg / temp] * g)
        m = logits.max()
        return float(m + np.log(np.exp(logits - m).sum()) - logits[0])

    want = (infonce(1.0, cos_ab) + infonce(1.0, cos_ab)) / 2
    assert abs(float(loss) - want) < 2e-3  # negatives are bf16 rows

    # expected-negatives mode: with a single forced negative pixel the
    # expectation equals the sampled sum exactly
    loss_e, _ = prototype_contrastive_loss(
        jnp.asarray(rep), jnp.asarray(onehot), jnp.asarray(mask),
        jnp.asarray(prob), jnp.zeros((c, d)), jax.random.key(0),
        num_queries=q, num_negatives=g, temp=temp, strong_threshold=0.97,
        alpha=0.99, negative_mode="expected",
    )
    assert abs(float(loss_e) - want) < 2e-3
    # prototypes initialized to the singleton means
    np.testing.assert_allclose(np.asarray(new_protos)[0], rep[0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_protos)[1], rep[0, 1, 1], atol=1e-5)


def test_contrastive_degenerate_returns_zero():
    d, c = 8, 4
    rep = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 4, d)), jnp.float32)
    onehot = jnp.zeros((1, 4, 4, c))
    mask = jnp.zeros((1, 4, 4))
    loss, protos = prototype_contrastive_loss(
        rep, onehot, mask, jnp.zeros((1, 4, 4, c)), jnp.zeros((c, d)),
        jax.random.key(1), num_queries=4, num_negatives=4,
    )
    assert float(loss) == 0.0
    np.testing.assert_array_equal(np.asarray(protos), np.zeros((c, d)))


def test_contrastive_grad_flows_and_finite():
    d, c = 8, 5
    rng = np.random.default_rng(3)
    rep = rng.standard_normal((2, 8, 8, d)).astype(np.float32)
    labels = rng.integers(0, c, size=(2, 8, 8))
    onehot = np.eye(c, dtype=np.float32)[labels]
    mask = (rng.random((2, 8, 8)) < 0.8).astype(np.float32)
    prob = rng.random((2, 8, 8, c)).astype(np.float32) * 0.5

    def f(r):
        loss, _ = prototype_contrastive_loss(
            r, jnp.asarray(onehot), jnp.asarray(mask), jnp.asarray(prob),
            jnp.zeros((c, d)), jax.random.key(2),
            num_queries=8, num_negatives=16,
        )
        return loss

    loss, grad = jax.value_and_grad(f)(jnp.asarray(rep))
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = np.asarray(grad)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_prototype_update_multidevice_psum_matches_global():
    """8-way sharded update == single-device update on the full batch, and
    the result is identical on every shard (no reference-style divergence
    when a shard lacks pixels of a class)."""
    n_dev = 8
    devs = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devs), ("data",))
    n_per, d, c = 16, 8, 4
    rng = np.random.default_rng(4)
    rep = rng.standard_normal((n_dev * n_per, d)).astype(np.float32)
    cls = rng.integers(0, c, size=n_dev * n_per).astype(np.int32)
    # class 3 exists only in shard 0
    cls[cls == 3] = 0
    cls[:4] = 3
    member = np.ones(n_dev * n_per, bool)
    protos = rng.standard_normal((c, d)).astype(np.float32)

    def shard_fn(r, k, m, p):
        new, _ = update_prototypes(r, k, m, p, alpha=0.9, axis_name="data")
        return new

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P()),
        out_specs=P(),
    )
    got = np.asarray(sharded(rep, cls, member, protos))
    want, _ = update_prototypes(
        jnp.asarray(rep), jnp.asarray(cls), jnp.asarray(member),
        jnp.asarray(protos), alpha=0.9,
    )
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_expected_pallas_equals_expected_xla():
    """The batched all-classes kernel must compute the same loss as the
    per-class XLA expected mode (identical math, one R pass)."""
    import jax.experimental.pallas as pl
    from css_tpu.ops.pallas import contrastive_kernels as ck

    # interpret mode off-TPU
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        ck.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        rng = np.random.default_rng(6)
        b, h, w, d, c = 2, 8, 8, 16, 5
        rep = rng.standard_normal((b, h, w, d)).astype(np.float32)
        lab = rng.integers(0, c, size=(b, h, w))
        onehot = np.eye(c, dtype=np.float32)[lab]
        mask = (rng.random((b, h, w)) > 0.3).astype(np.float32)
        logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
        prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        protos = rng.standard_normal((c, d)).astype(np.float32)

        vals = {}
        for mode in ("expected", "expected_pallas"):
            loss, _ = prototype_contrastive_loss(
                jnp.asarray(rep), jnp.asarray(onehot), jnp.asarray(mask),
                jnp.asarray(prob), jnp.asarray(protos), jax.random.key(3),
                num_queries=8, num_negatives=16, temp=0.5,
                strong_threshold=0.97, alpha=0.99, negative_mode=mode,
            )
            vals[mode] = float(loss)
        assert abs(vals["expected"] - vals["expected_pallas"]) < 2e-3, vals
    finally:
        if jax.default_backend() != "tpu":
            ck.pl.pallas_call = orig


def test_sampled_pallas_mode_law_and_determinism():
    """sampled_pallas (thinned-multinomial streaming negatives): same
    prototype side effect as every other mode, deterministic per key,
    finite gradients, and seed-mean converging to the expected-mode loss."""
    rng = np.random.default_rng(9)
    b, h, w, d, c = 2, 8, 8, 16, 5
    rep = rng.standard_normal((b, h, w, d)).astype(np.float32)
    lab = rng.integers(0, c, size=(b, h, w))
    onehot = np.eye(c, dtype=np.float32)[lab]
    mask = (rng.random((b, h, w)) > 0.3).astype(np.float32)
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    protos = rng.standard_normal((c, d)).astype(np.float32)

    def run(mode, key):
        return prototype_contrastive_loss(
            jnp.asarray(rep), jnp.asarray(onehot), jnp.asarray(mask),
            jnp.asarray(prob), jnp.asarray(protos), key,
            num_queries=8, num_negatives=64, temp=0.5,
            strong_threshold=0.97, alpha=0.99, negative_mode=mode,
        )

    l1, p1 = run("sampled_pallas", jax.random.key(3))
    l2, p2 = run("sampled_pallas", jax.random.key(3))
    l3, _ = run("sampled_pallas", jax.random.key(4))
    le, pe = run("expected", jax.random.key(3))
    assert float(l1) == float(l2)                 # deterministic per key
    assert float(l1) != float(l3)                 # varies with key
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(pe), atol=1e-6)

    # seed-mean ~ expected-mode value (G=64 Monte Carlo)
    vals = [float(run("sampled_pallas", jax.random.key(100 + t))[0])
            for t in range(25)]
    se = np.std(vals) / np.sqrt(len(vals))
    assert abs(np.mean(vals) - float(le)) < 4 * se + 0.03, (
        np.mean(vals), float(le), se)

    # gradient flows and is finite
    def loss_fn(r_):
        loss, _ = prototype_contrastive_loss(
            r_, jnp.asarray(onehot), jnp.asarray(mask), jnp.asarray(prob),
            jnp.asarray(protos), jax.random.key(3),
            num_queries=8, num_negatives=64, temp=0.5,
            strong_threshold=0.97, alpha=0.99,
            negative_mode="sampled_pallas",
        )
        return loss

    g = jax.grad(loss_fn)(jnp.asarray(rep))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_grouped_order_rejects_overpacked_classes():
    """num_classes >= 128 would overflow the int32 packed sort key (ignore
    bucket << 24 flips the sign) and silently corrupt class grouping — the
    boundary must fail loudly instead."""
    import jax
    import jax.numpy as jnp
    import pytest

    from css_tpu.losses.contrastive import _grouped_random_order

    cls_id = jnp.zeros((16,), jnp.int32)
    member = jnp.ones((16,), bool)
    with pytest.raises(ValueError, match="packed-key"):
        _grouped_random_order(cls_id, member, jax.random.key(0), 128)
    # 127 still fits: 127 << 24 is a valid positive int32
    _grouped_random_order(cls_id, member, jax.random.key(0), 127)
