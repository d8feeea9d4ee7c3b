"""2-process x 4-device jax.distributed localhost smoke (VERDICT r1 item
#2; pod shape per round-3 verdict next #5).

Launches two real processes, each owning FOUR virtual CPU devices (the
TPU-pod topology: several chips per host), over a gloo-backed collective
runtime.  Checks that shard_array assembles the 8-row global batch
shard-for-shard correctly through make_array_from_process_local_data, and
that the sharded steps' psums span both processes and all 8 shards — i.e.
multi-host eval computes the TRUE global confusion matrix and multi-host
train leaves identical replicated state everywhere.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_eval_reduction():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join("tests", "_mp_eval_worker.py"),
             str(pid), str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: multihost eval ok" in out
        assert f"proc {pid}: multihost train ok" in out


def test_slurm_autodetect_requires_real_job_step(monkeypatch):
    """distributed_init only auto-initializes under SLURM when the process is
    part of a real srun job step (SLURM_STEP_NODELIST set, as the reference's
    dist_init reads) — a single-process run inside a multi-task *allocation*
    must stay a no-op instead of blocking on peers that never start."""
    import jax

    from css_tpu.parallel.mesh import distributed_init

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)

    # allocation without a job step: no-op
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.delenv("SLURM_STEP_NODELIST", raising=False)
    distributed_init()
    assert calls == []

    # real srun step: rendezvous via the env detector
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node[0-7]")
    distributed_init()
    assert calls == [((), {})]

    # explicit coordinator always wins over env sniffing
    calls.clear()
    distributed_init(coordinator="localhost:1234", num_processes=2,
                     process_id=1)
    assert calls and calls[0][1]["coordinator_address"] == "localhost:1234"
