"""Pallas TPU kernels for the expected-negatives contrastive loss.

The 'expected' negative mode needs, per class,

    s_q = sum_n w_n * exp(<a_q, R_n> / temp)            (forward)
    M_q = sum_n w_n * exp(<a_q, R_n> / temp) * R_n      (for dL/da)

with a [Q, D] anchors, R [N, D] the normalized pixel table (no grad) and
w [N] mixture weights.  The XLA formulation materializes the [Q, N] logit
matrix in HBM (~270 MB per class at N=262k); these kernels stream R/w tile
by tile through VMEM — one [Q, TILE] matmul on the MXU, exp on the VPU, and
a reduction per tile — so nothing Q x N ever leaves the chip.  Both passes
read R exactly once.

``weighted_exp_softsum`` wires them into a ``jax.custom_vjp`` so the scan
over classes in css_tpu/losses/contrastive.py differentiates through it
transparently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["weighted_exp_softsum", "weighted_exp_softsum_stochastic",
           "thinned_multiplicities"]

TILE_N = 2048


def _fwd_kernel(a_ref, r_ref, w_ref, live_ref, inv_temp_ref, s_ref):
    """Accumulate s[Q] over the N-tile grid.

    ``live_ref`` [n_tiles] int32 marks tiles with any nonzero weight; dead
    tiles (e.g. the contiguous below-weak-threshold unlabeled half early in
    training — the table is [labeled..., unlabeled...] in original order)
    skip the matmul+exp entirely (round-2 verdict lever: member-aware tile
    skipping, achieved WITHOUT the ~9 ms permutation a sorted table costs).
    """
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    @pl.when(live_ref[it] != 0)
    def _():
        logits = jax.lax.dot_general(
            a_ref[:], r_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_temp_ref[0]                       # [Q, TILE]
        e = jnp.exp(logits) * w_ref[:].reshape(1, -1)
        s_ref[:] = s_ref[:] + jnp.sum(e, axis=1, keepdims=True)


def _bwd_kernel(a_ref, r_ref, w_ref, live_ref, inv_temp_ref, m_ref):
    """Accumulate M[Q, D] = sum_n w_n exp(l_qn) R_n over the N-tile grid."""
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _():
        m_ref[:] = jnp.zeros_like(m_ref)

    @pl.when(live_ref[it] != 0)
    def _():
        logits = jax.lax.dot_general(
            a_ref[:], r_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_temp_ref[0]
        e = (jnp.exp(logits) * w_ref[:].reshape(1, -1)).astype(jnp.bfloat16)
        m_ref[:] = m_ref[:] + jax.lax.dot_general(
            e, r_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pad_tables(r, w):
    n = r.shape[0]
    pad = (-n) % TILE_N
    if pad:
        r = jnp.pad(r, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, pad),))
    return r, w, n + pad


# --------------------------------------------------------------------------
# stochastic (thinned-multiplicity) variant — the sampled-mode negative sum
# --------------------------------------------------------------------------
#
# The reference draws, per anchor, G negatives (class ~ softmax(proto sim),
# pixel uniform in class); the denominator is the multiset sum
# sum_j exp(<a, r_j>/t).  Equivalently sum_n m_n exp(<a, r_n>/t) with
# multiplicities m ~ Multinomial(G, w), w_n = p(class(n)) / count(class(n)).
# Gathering the drawn rows is a per-row-fetch wall on TPU (~50 ms/step,
# CLAUDE.md round-3 lever #4).  Instead: draw binomially-thinned per-pixel
# multiplicities
#
#     lam_n = G * w_n;   m_n = floor(lam_n) + Bernoulli(frac(lam_n))
#
# with XLA threefry OUTSIDE the kernel (5.5M draws/step fuse into ~0.1 ms)
# and stream them through the UNCHANGED expected-mode kernel as the weight
# vector.  Marginal means are exact (E m_n = G w_n, matching the
# multinomial); the relaxations are the fixed-total-G constraint (the sum
# concentrates at G +- sqrt(G)) and one shared multiset per class's anchors
# instead of per-anchor draws — both bounded by the seed-distribution
# differential test vs the reference loss.
#
# (An in-kernel PRNG variant — pltpu.prng_random_bits per tile, both
# per-anchor [Q, TILE] and shared [8, TILE] draws — was built and measured
# 21-27 ms vs 9 ms for the 21-class fwd+bwd scan on v5e: the cost is a
# ~2 us fixed overhead per prng call, 128 tiles x 2 passes x 21 classes,
# independent of bits volume.  XLA-side generation deletes it entirely.)


def thinned_multiplicities(key, lam):
    """m[N] = floor(lam) + Bernoulli(lam - floor(lam)), no gradient.

    Deterministic in ``key`` — under jax.checkpoint/remat the same draw is
    regenerated in forward and backward, so no custom_vjp is needed.
    """
    base = jnp.floor(lam)
    u = jax.random.uniform(key, lam.shape)
    return jax.lax.stop_gradient(base + (u < lam - base).astype(lam.dtype))


def weighted_exp_softsum_stochastic(a, r, lam, inv_temp, key):
    """S[q] = sum_n m_n * exp(inv_temp * <a[q], r[n]>), m thinned-multinomial.

    ``a`` [Q, D] (differentiable), ``r`` [N, D] bf16 stop-grad table,
    ``lam`` [N] f32 expected multiplicities (G * p / count per the reference
    sampling law), ``key`` a jax PRNG key.  The multiset is shared by the
    Q anchors (identical marginal law per anchor; the per-anchor-independent
    law is the plain ``sampled`` mode).  On TPU the sum streams through the
    expected-mode Pallas kernel with m as the weights; other backends use a
    dense XLA fallback of the same math.
    """
    if lam.shape != (r.shape[0],):
        raise ValueError(
            f"weighted_exp_softsum_stochastic: lam must be [N]={r.shape[0]}, "
            f"got {lam.shape}")
    m = thinned_multiplicities(key, lam)
    if jax.default_backend() != "tpu":
        logits = jax.lax.dot_general(
            a.astype(jnp.bfloat16), r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_temp
        return jnp.sum(jnp.exp(logits) * m[None, :], axis=1)
    return weighted_exp_softsum(a, r, m, inv_temp)


def _live_tiles(w, n):
    """[n_tiles] int32: 1 where the tile has any nonzero weight."""
    return (jnp.abs(w.reshape(n // TILE_N, TILE_N)).max(axis=1) > 0.0) \
        .astype(jnp.int32)


def _run_fwd(a, r, w, inv_temp):
    q, d = a.shape
    r, w, n = _pad_tables(r, w)
    grid = (n // TILE_N,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.float32),
    )(a.astype(jnp.bfloat16), r, w, _live_tiles(w, n),
      jnp.asarray([inv_temp], jnp.float32))
    return out[:, 0]


def _run_bwd(a, r, w, inv_temp):
    q, d = a.shape
    r, w, n = _pad_tables(r, w)
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, d), jnp.float32),
    )(a.astype(jnp.bfloat16), r, w, _live_tiles(w, n),
      jnp.asarray([inv_temp], jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _weighted_exp_softsum_tiled(a, r, w, inv_temp):
    """Core kernel dispatch; callers guarantee Q % 8 == 0 and D % 128 == 0."""
    return _run_fwd(a, r, w, inv_temp)


def _vjp_fwd(a, r, w, inv_temp):
    return _run_fwd(a, r, w, inv_temp), (a, r, w)


def _vjp_bwd(inv_temp, res, g):
    a, r, w = res
    m = _run_bwd(a, r, w, inv_temp)          # [Q, D]
    da = (g * inv_temp)[:, None] * m
    return da, None, None


_weighted_exp_softsum_tiled.defvjp(_vjp_fwd, _vjp_bwd)


def weighted_exp_softsum(a, r, w, inv_temp):
    """s[q] = sum_n w[n] * exp(inv_temp * <a[q], r[n]>).

    ``a`` [Q, D] (differentiable), ``r`` [N, D] bf16 (stop-grad table),
    ``w`` [N] f32.  The TPU kernel needs Q and D on (8, 128) register-tile
    multiples; arbitrary shapes are accepted here and zero-padded to the
    tile grid (exact: zero feature columns add nothing to the dot products,
    padded anchor rows are sliced off, and N is padded against zero
    weights).  Inconsistent r/w shapes raise at this boundary instead of
    somewhere inside Mosaic.
    """
    if a.ndim != 2 or r.ndim != 2 or a.shape[1] != r.shape[1]:
        raise ValueError(
            f"weighted_exp_softsum: need a [Q, D] and r [N, D] with matching "
            f"D; got a {a.shape}, r {r.shape}")
    if w.shape != (r.shape[0],):
        raise ValueError(
            f"weighted_exp_softsum: weights w must be [N]={r.shape[0]}, "
            f"got {w.shape}")
    q, d = a.shape
    pad_q, pad_d = (-q) % 8, (-d) % 128
    if pad_q or pad_d:
        a = jnp.pad(a, ((0, pad_q), (0, pad_d)))
        r = jnp.pad(r, ((0, 0), (0, pad_d)))
    out = _weighted_exp_softsum_tiled(a, r, w, inv_temp)
    return out[:q] if pad_q else out
