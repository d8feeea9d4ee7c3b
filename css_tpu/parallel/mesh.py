"""Device-mesh data parallelism (the TPU-native replacement for L0).

The reference's distributed runtime (util/dist_init.py, NCCL process group +
DDP gradient all-reduce + SyncBatchNorm + manual ``concat_all_gather``)
becomes: a 1-D ``jax.sharding.Mesh`` over the ``data`` axis, a
``shard_map``-wrapped train step whose collectives (grad ``pmean``, BN-stat
``psum``, prototype ``psum``, mixing-partner broadcast) compile to XLA's
collective runtime over ICI/DCN, and ``jax.distributed.initialize`` for
multi-host (the analog of the reference's unused SLURM path,
util/dist_init.py:1-31).

The reference's always-on debug toggles (``TORCH_DISTRIBUTED_DEBUG=DETAIL``,
``detect_anomaly`` — dist_init.py:40-44) have no analog cost here; JAX debug
nan-checking can be enabled explicitly via ``debug_nans=True``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

__all__ = ["DATA_AXIS", "data_mesh", "distributed_init", "shard_batch",
           "sharded_train_step", "sharded_eval_step", "cross_process_sum"]


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     debug_nans: bool = False) -> None:
    """Multi-host runtime init (no-op for single-host).

    Mirrors the roles of the reference's ``dist_init``/``local_dist_init``:
    with explicit args or the standard cluster env vars it calls
    ``jax.distributed.initialize``; single-host callers need nothing.
    """
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    if coordinator or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator or os.environ["COORDINATOR_ADDRESS"],
            num_processes=num_processes,
            process_id=process_id,
        )
    elif (int(os.environ.get("SLURM_NTASKS", "1")) > 1
          and "SLURM_STEP_NODELIST" in os.environ):
        # SLURM rendezvous, the analog of the reference's env-driven
        # ``dist_init`` (util/dist_init.py:1-31, which reads SLURM_PROCID/
        # SLURM_NTASKS/SLURM_STEP_NODELIST).  jax.distributed ships a SLURM
        # cluster detector that resolves coordinator/num_processes/process_id
        # from the same variables, so a bare initialize() completes the
        # rendezvous.  Gated on SLURM_STEP_NODELIST (set by srun for real
        # job steps, like the reference's detector) so a single-process run
        # inside a multi-task *allocation* (sbatch/salloc with --ntasks>1
        # but no srun) doesn't block waiting for peers that never start.
        jax.distributed.initialize()


def data_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the ``data`` axis."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_array(mesh: Mesh, x: Any) -> jax.Array:
    """Place one host array with its leading axis sharded over ``data``.

    Single-host: a plain device_put.  Multi-host: ``x`` holds this process's
    LOCAL rows and the result is the global array assembled across processes
    (global batch = local batch x process_count), the jax-native equivalent
    of each DDP rank feeding its own shard.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place host arrays with the batch axis sharded over ``data``."""
    return {k: shard_array(mesh, v) for k, v in batch.items()}


def sharded_train_step(step_fn, mesh: Mesh):
    """Wrap a per-shard train step with shard_map + jit.

    ``step_fn(state, batch, rng, contrast_weight, use_rep_labels)`` runs with
    the batch sharded over ``data`` and everything else replicated; the
    returned state/metrics are replicated (grad pmean inside guarantees the
    replicas agree).
    """
    mapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), {k: P(DATA_AXIS) for k in
                        ("l_image", "l_label", "l_valid_hw", "u_image",
                         "u_valid_hw")}, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def sharded_eval_step(eval_fn, mesh: Mesh):
    """Wrap a per-shard eval step (make_eval_step with axis_name=DATA_AXIS)
    with shard_map + jit: batch inputs sharded over ``data``, model state and
    the confusion matrix replicated, psum inside makes the output matrix the
    full-batch update on every replica.  This is the device-sharded eval the
    reference lacks (every DDP rank there evaluates the FULL val set,
    ori_pseudo.py:191-211 / SURVEY.md section 3.3).
    """
    mapped = jax.shard_map(
        eval_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)


def cross_process_sum(x: np.ndarray) -> np.ndarray:
    """Sum a host array across all jax processes (no-op single-host).

    The multi-host analog of the reference's ``torch_dist_sum``
    (util/torch_dist_sum.py:1-20), used to reduce the eval confusion matrix
    so each process's val-split shard contributes exactly once.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.asarray(gathered).sum(axis=0)
