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

__all__ = ["weighted_exp_softsum"]

TILE_N = 2048


def _fwd_kernel(a_ref, r_ref, w_ref, inv_temp_ref, s_ref):
    """Accumulate s[Q] over the N-tile grid."""
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    logits = jax.lax.dot_general(
        a_ref[:], r_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_temp_ref[0]                       # [Q, TILE]
    e = jnp.exp(logits) * w_ref[:].reshape(1, -1)
    s_ref[:] = s_ref[:] + jnp.sum(e, axis=1, keepdims=True)


def _bwd_kernel(a_ref, r_ref, w_ref, inv_temp_ref, m_ref):
    """Accumulate M[Q, D] = sum_n w_n exp(l_qn) R_n over the N-tile grid."""
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _():
        m_ref[:] = jnp.zeros_like(m_ref)

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
        ],
        out_specs=pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.float32),
    )(a.astype(jnp.bfloat16), r, w, jnp.asarray([inv_temp], jnp.float32))
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
        ],
        out_specs=pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, d), jnp.float32),
    )(a.astype(jnp.bfloat16), r, w, jnp.asarray([inv_temp], jnp.float32))


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
