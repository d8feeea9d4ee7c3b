"""Tests for CutOut/CutMix/ClassMix mask generation and mixing."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from css_tpu.ops.mixing import class_half_mask, cutout_box_mask, mix_batch


def test_cutout_mask_geometry():
    h, w = 64, 96
    for seed in range(5):
        m = np.asarray(cutout_box_mask(jax.random.key(seed), (h, w), ratio=2))
        zeros = (m == 0).sum()
        # area = H*W/2 with height rounded: |zeros - target| <= width/2
        assert abs(zeros - h * w / 2) <= w
        # zero region is a single rectangle
        rows = np.where((m == 0).any(1))[0]
        cols = np.where((m == 0).any(0))[0]
        assert (m[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1] == 0).all()


def test_class_half_mask_selects_half_of_present():
    rng = np.random.default_rng(0)
    label = rng.integers(0, 5, size=(32, 32)).astype(np.int32)
    label[0, :8] = -1
    present = np.unique(label)           # 6 values incl. -1
    m = np.asarray(class_half_mask(jax.random.key(1), jnp.asarray(label), 21))
    selected = {int(v) for v in present if m[label == v].all() and m[label == v].size}
    unselected = {int(v) for v in present if (m[label == v] == 0).all()}
    assert len(selected) == len(present) // 2
    assert selected | unselected == {int(v) for v in present}


def test_cutmix_single_device_partner_is_next_image():
    rng = np.random.default_rng(1)
    b, h, w = 4, 32, 32
    imgs = rng.random((b, 3, h, w)).astype(np.float32)
    labs = rng.integers(0, 21, size=(b, 1, h, w)).astype(np.int32)
    confs = rng.random((b, 1, h, w)).astype(np.float32)
    oi, ol, oc = mix_batch(
        jax.random.key(2), jnp.asarray(imgs), jnp.asarray(labs),
        jnp.asarray(confs), mode="cutmix", num_classes=21,
    )
    oi = np.asarray(oi)
    for i in range(b):
        j = (i + 1) % b
        # every output pixel equals own or partner pixel
        own = np.isclose(oi[i], imgs[i], atol=1e-6).all(0)
        par = np.isclose(oi[i], imgs[j], atol=1e-6).all(0)
        assert (own | par).all()
        assert par.any() and own.any()


def test_cutout_zeroes_and_ignores():
    rng = np.random.default_rng(2)
    imgs = rng.random((2, 3, 32, 32)).astype(np.float32) + 0.5
    labs = rng.integers(0, 21, size=(2, 1, 32, 32)).astype(np.int32)
    confs = rng.random((2, 1, 32, 32)).astype(np.float32) + 0.5
    oi, ol, oc = mix_batch(
        jax.random.key(3), jnp.asarray(imgs), jnp.asarray(labs),
        jnp.asarray(confs), mode="cutout", num_classes=21,
    )
    cut = np.asarray(oi).sum(1) == 0
    assert cut.any()
    assert (np.asarray(ol)[:, 0][cut] == -1).all()
    assert (np.asarray(oc)[:, 0][cut] == 0).all()


def test_gathered_cutmix_partner_from_rank0():
    """reference partner rule: every device mixes with device 0's shard."""
    n_dev, b, h, w = 4, 2, 16, 16
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    rng = np.random.default_rng(3)
    imgs = rng.random((n_dev * b, 3, h, w)).astype(np.float32)
    labs = rng.integers(0, 21, size=(n_dev * b, 1, h, w)).astype(np.int32)
    confs = rng.random((n_dev * b, 1, h, w)).astype(np.float32)

    def fn(k, i, l, c):
        my = jax.lax.axis_index("data")
        return mix_batch(jax.random.fold_in(k, my), i, l, c, mode="cutmix",
                         num_classes=21, axis_name="data", partner="reference")

    oi, ol, oc = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
    )(jax.random.key(5), imgs, labs, confs)
    oi = np.asarray(oi)
    rank0 = imgs[:b]
    for gi in range(n_dev * b):
        i_local = gi % b
        partner = rank0[(i_local + 1) % b]
        own = np.isclose(oi[gi], imgs[gi], atol=1e-6).all(0)
        par = np.isclose(oi[gi], partner, atol=1e-6).all(0)
        assert (own | par).all()


def test_gathered_cutmix_ring_partner():
    n_dev, b, h, w = 4, 2, 16, 16
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    rng = np.random.default_rng(4)
    imgs = rng.random((n_dev * b, 3, h, w)).astype(np.float32)
    labs = rng.integers(0, 21, size=(n_dev * b, 1, h, w)).astype(np.int32)
    confs = rng.random((n_dev * b, 1, h, w)).astype(np.float32)

    def fn(k, i, l, c):
        my = jax.lax.axis_index("data")
        return mix_batch(jax.random.fold_in(k, my), i, l, c, mode="cutmix",
                         num_classes=21, axis_name="data", partner="ring")

    oi, _, _ = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
    )(jax.random.key(6), imgs, labs, confs)
    oi = np.asarray(oi)
    for gi in range(n_dev * b):
        partner = imgs[(gi + 1) % (n_dev * b)]
        own = np.isclose(oi[gi], imgs[gi], atol=1e-6).all(0)
        par = np.isclose(oi[gi], partner, atol=1e-6).all(0)
        assert (own | par).all()
