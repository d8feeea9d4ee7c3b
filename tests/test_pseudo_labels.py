"""Semantics of the pseudo-label spaces (logit / representation / agreement).

Verifies the building blocks of the mix/cross strategies against manual
numpy math: cosine-similarity class probabilities (ddp_model.py:104-112) and
the agreement rule (ddp_model.py:115-118 — disagreeing pixels ignored).
"""

import numpy as np

import jax.numpy as jnp

from css_tpu.train.train_step import _rep_space_probs


def test_rep_space_probs_is_cosine_similarity():
    rng = np.random.default_rng(0)
    rep = rng.standard_normal((2, 4, 5, 8)).astype(np.float32)
    protos = rng.standard_normal((6, 8)).astype(np.float32)
    sim = np.asarray(_rep_space_probs(jnp.asarray(rep), jnp.asarray(protos)))
    rn = rep / np.linalg.norm(rep, axis=-1, keepdims=True)
    pn = protos / np.linalg.norm(protos, axis=-1, keepdims=True)
    want = np.einsum("bhwd,cd->bhwc", rn, pn)
    np.testing.assert_allclose(sim, want, atol=1e-5)
    assert sim.min() >= -1.0001 and sim.max() <= 1.0001


def test_agreement_rule_masks_disagreements():
    lab_cls = jnp.asarray([[0, 1], [2, 3]])
    lab_rep = jnp.asarray([[0, 2], [2, 0]])
    agreed = jnp.where(lab_cls == lab_rep, lab_cls, -1)
    np.testing.assert_array_equal(np.asarray(agreed), [[0, -1], [2, -1]])


def test_zero_prototypes_give_uniform_rep_probs():
    """Before any prototype is initialized, rep-space similarities are all
    zero -> softmax uniform; the mix strategy then ignores ~everything that
    disagrees with a uniform argmax, which matches the reference's early
    epochs (prototypes start at zeros, ori_pseudo.py:92)."""
    import jax

    rep = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3, 3, 8)),
                      jnp.float32)
    sim = _rep_space_probs(rep, jnp.zeros((5, 8)))
    probs = jax.nn.softmax(np.asarray(sim) / 0.5, axis=-1)
    np.testing.assert_allclose(np.asarray(probs), 0.2, atol=1e-6)
