"""CutOut / CutMix / ClassMix mask generation and cross-replica mixing.

Re-designs the reference mixing stage (dataset_helpers/VOC.py:354-534):

* ``cutout_box_mask`` — the reference's rectangle geometry
  (``generate_cutout_mask``, VOC.py:518-534): area = H*W/ratio,
  width ~ randint(W/ratio+1, W), height = round(area/width), uniform corner.
  The reference draws these from an *unseeded* numpy RNG (SURVEY.md quirks);
  here the mask derives from the step's functional PRNG key.
* ``class_half_mask`` — ClassMix: select a random half of the labels present
  in the image and mask their pixels (``generate_class_mask``,
  VOC.py:511-516).  Fixed-shape: presence per class (+1 slot for ignore),
  random scores ranked among present classes, keep rank < n_present // 2.
* ``mix_batch`` — applies masks with mixing partners.  In the reference the
  partner for gathered image i is ``(i+1) % local_batch`` of the *gathered*
  tensor, i.e. always rank 0's shard (VOC.py:386-388) — an artifact of
  all-gathering the world batch and indexing with the local batch size.
  ``partner='reference'`` reproduces that exactly with a rank-0 broadcast
  (a psum of the masked shard — O(B) traffic instead of the reference's
  all-gather of the world batch, VOC.py:536-545); ``partner='ring'`` uses
  the global neighbour ``(global_i + 1) % (world * B)`` via an in-shard roll
  plus a single ppermute of one image — the cheaper, arguably-intended
  topology that keeps traffic on neighbouring ICI links.

Masks are generated per local image from the local PRNG stream; partner
pixels use the complement of the local mask — matching the reference, where
each rank generates its own (unseeded) masks for its shard.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["cutout_box_mask", "class_half_mask", "mix_batch"]


def cutout_box_mask(rng: jax.Array, hw: Tuple[int, int], ratio: int = 2) -> jax.Array:
    """[H, W] float mask: 0 inside the cut rectangle, 1 outside."""
    h, w = hw
    area = h * w / ratio
    k_w, k_x, k_y = jax.random.split(rng, 3)
    lo = int(w / ratio + 1)
    cut_w = jax.random.randint(k_w, (), lo, w)             # [lo, w)
    cut_h = jnp.round(area / cut_w)
    x0 = jnp.floor(jax.random.uniform(k_x) * (w - cut_w + 1))
    y0 = jnp.floor(jax.random.uniform(k_y) * (h - cut_h + 1))
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = (yy >= y0) & (yy < y0 + cut_h) & (xx >= x0) & (xx < x0 + cut_w)
    return jnp.where(inside, 0.0, 1.0)


def class_half_mask(rng: jax.Array, label: jax.Array, num_classes: int) -> jax.Array:
    """[H, W] float mask: 1 on pixels of a random half of present labels.

    ``label`` may contain -1 (ignore); it participates as its own label like
    ``torch.unique`` would include it (VOC.py:513).
    """
    slots = num_classes + 1                                  # slot 0 <- label -1
    shifted = label + 1
    # one-hot reduce / matvec instead of a per-pixel traced scatter+gather:
    # H*W traced-index ops cost tens of ms on TPU, the one-hot forms <1 ms
    # (CLAUDE.md perf invariant 1)
    onehot = jax.nn.one_hot(shifted.reshape(-1), slots, dtype=jnp.float32)
    present = jnp.max(onehot, axis=0) > 0
    n_present = jnp.sum(present.astype(jnp.int32))
    scores = jnp.where(present, jax.random.uniform(rng, (slots,)), jnp.inf)
    order = jnp.argsort(scores)
    rank = jnp.zeros((slots,), jnp.int32).at[order].set(jnp.arange(slots, dtype=jnp.int32))
    selected = present & (rank < n_present // 2)
    return (onehot @ selected.astype(jnp.float32)).reshape(label.shape)


def _broadcast_from_rank0(x: jax.Array, axis_name: str) -> jax.Array:
    """Every device receives device 0's shard (psum of the masked value)."""
    idx = jax.lax.axis_index(axis_name)
    contrib = jnp.where(idx == 0, x, jnp.zeros_like(x))
    return jax.lax.psum(contrib, axis_name)


def _partner_batch(x: jax.Array, axis_name: Optional[str], partner: str) -> jax.Array:
    """Partner tensor p with p[i] = mixing partner of local image i."""
    b = x.shape[0]
    if partner == "reference" or axis_name is None:
        src = x if axis_name is None else _broadcast_from_rank0(x, axis_name)
        return jnp.roll(src, -1, axis=0)
    if partner == "ring":
        rolled = jnp.roll(x, -1, axis=0)                     # local (i+1)
        n = jax.lax.psum(1, axis_name)
        perm = [(i, (i - 1) % n) for i in range(n)]          # send my x[0] left
        first_of_next = jax.lax.ppermute(x[:1], axis_name, perm)
        return rolled.at[b - 1].set(first_of_next[0])
    raise ValueError(f"unknown partner mode {partner}")


def mix_batch(
    rng: jax.Array,
    images: jax.Array,     # [B, 3, H, W] (channel-first)
    labels: jax.Array,     # [B, K, H, W] int32
    confs: jax.Array,      # [B, L, H, W] float
    mode: str,
    num_classes: int,
    axis_name: Optional[str] = None,
    partner: str = "reference",
):
    """Apply the mixing strategy.  ``mode`` in {none, cutout, cutmix, classmix}.

    Semantics per reference ``generate_cut_gather*`` (VOC.py:354-477):
      * cutout: image and confidences zeroed in the box, labels set to -1
        (only the *first* label map is ignored-out, matching VOC.py:454-461);
      * cutmix: box-mask blend with the partner image;
      * classmix: blend mask from a random half of classes of the *own*
        first label map.
    """
    if mode == "none":
        return images, labels, confs
    b, _, h, w = images.shape
    keys = jax.random.split(rng, b)

    if mode == "cutout":
        masks = jax.vmap(lambda k: cutout_box_mask(k, (h, w), ratio=2))(keys)
    elif mode == "cutmix":
        masks = jax.vmap(lambda k: cutout_box_mask(k, (h, w), ratio=2))(keys)
    elif mode == "classmix":
        masks = jax.vmap(
            lambda k, lab: class_half_mask(k, lab, num_classes)
        )(keys, labels[:, 0])
    else:
        raise ValueError(f"unknown mix mode {mode}")

    m_img = masks[:, None, :, :]
    m_map = masks[:, None, :, :]

    if mode == "cutout":
        images = images * m_img
        first = jnp.where(m_map[:, 0] > 0, labels[:, 0], -1)
        labels = labels.at[:, 0].set(first)
        confs = confs * m_map
        return images, labels, confs

    p_images = _partner_batch(images, axis_name, partner)
    p_labels = _partner_batch(labels, axis_name, partner)
    p_confs = _partner_batch(confs, axis_name, partner)

    images = images * m_img + p_images * (1.0 - m_img)
    im = m_map.astype(labels.dtype)
    labels = labels * im + p_labels * (1 - im)
    confs = confs * m_map + p_confs * (1.0 - m_map)
    return images, labels, confs
