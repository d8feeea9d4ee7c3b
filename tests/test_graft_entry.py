"""Regression tests for the driver entry points in __graft_entry__.py.

Round 1's only red driver artifact was dryrun_multichip dispatching to the
real (mismatched-libtpu) TPU instead of forcing the virtual CPU mesh
(MULTICHIP_r01.json rc=1).  These tests reproduce the driver's call patterns
in fresh subprocesses — with and without a pre-initialized backend, with and
without driver-style env vars — so that regression can never silently return.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_extra=None):
    env = dict(os.environ)
    # The pytest process forces 8 virtual CPU devices via conftest; the driver
    # process does not.  Strip those vars so the subprocess sees the same
    # pristine environment the driver provides.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        # the round-3 dryrun sweeps 7 strategy/partner variants plus the
        # sharded-eval check (~6 min of CPU compiles on an idle box,
        # more under load)
        capture_output=True, text=True, timeout=1200,
    )


@pytest.mark.slow
def test_dryrun_multichip_standalone():
    r = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert r.returncode == 0, r.stderr[-2000:]
    # one line per strategy/partner variant + the sharded-eval check
    assert "dryrun_multichip(8): ori/reference ok" in r.stdout
    assert "dryrun_multichip(8): sharded eval matrix ok" in r.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init():
    """The hard case from VERDICT.md Missing #1: a backend is already live
    (entry() compiled first) when dryrun_multichip is called."""
    r = _run(
        "import jax, __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "jax.jit(fn).lower(*args)\n"  # initializes the default backend
        "g.dryrun_multichip(4)\n"
        "assert all(d.platform == 'cpu' for d in jax.devices())\n"
        "assert len(jax.devices()) == 4\n"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # one line per strategy/partner variant + the sharded-eval check
    assert "dryrun_multichip(4): ori/reference ok" in r.stdout
    assert "dryrun_multichip(4): sharded eval matrix ok" in r.stdout


@pytest.mark.slow
def test_dryrun_multichip_with_driver_env():
    """Driver may pre-set XLA_FLAGS/JAX_PLATFORMS itself; must still work."""
    r = _run(
        "import __graft_entry__ as g; g.dryrun_multichip(2)",
        env_extra={
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # one line per strategy/partner variant + the sharded-eval check
    assert "dryrun_multichip(2): ori/reference ok" in r.stdout
    assert "dryrun_multichip(2): sharded eval matrix ok" in r.stdout
