"""Test harness config: run JAX on 8 virtual CPU devices.

Multi-device collectives (psum grad sync, prototype reduction, gathered
mixing) are exercised on a virtual 8-device CPU mesh — the TPU-native
answer to "how do we test multi-node without a cluster" (the reference has no
tests at all; see SURVEY.md section 4).

Note: the environment pre-imports jax via sitecustomize with the remote-TPU
("axon") platform selected, so we must flip the already-imported jax config
to CPU rather than set JAX_PLATFORMS, and extend XLA_FLAGS before the CPU
backend is first initialized (it is lazy, so this is still in time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
