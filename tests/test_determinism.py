"""Bitwise determinism: same seed + state + batch -> identical results.

The reference is *not* reproducible despite setting seeds (its cutout
geometry uses an unseeded numpy RNG — SURVEY.md quirks).  css_tpu training
is a pure function of (state, batch, key), so two invocations must agree
bitwise — this guards against nondeterministic ops sneaking into the step.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_train_step import _batch, _tiny_setup


def test_train_step_bitwise_deterministic():
    model, state, step = _tiny_setup(strategy="mix")
    jstep = jax.jit(step)
    batch = {k: jnp.asarray(v) for k, v in _batch(2, seed=11).items()}
    args = (jax.random.key(7), jnp.float32(0.7), jnp.asarray(False))

    s1, m1 = jstep(state, batch, *args)
    s2, m2 = jstep(state, batch, *args)
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s1.prototypes),
                                  np.asarray(s2.prototypes))


def test_different_keys_give_different_augmentation():
    model, state, step = _tiny_setup(strategy="ori")
    jstep = jax.jit(step)
    batch = {k: jnp.asarray(v) for k, v in _batch(2, seed=12).items()}
    _, m1 = jstep(state, batch, jax.random.key(1), jnp.float32(1.0),
                  jnp.asarray(False))
    _, m2 = jstep(state, batch, jax.random.key(2), jnp.float32(1.0),
                  jnp.asarray(False))
    assert float(m1["total"]) != float(m2["total"])
