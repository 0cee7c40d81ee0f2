"""Multi-process distribution tests (spawned subprocesses, CPU backend).

The reference's parallelism stops at a shared-memory thread pool; these
tests pin the framework's host-scale layer: jax.distributed init, global
('data','shard') mesh over two processes, collective-merged sharded engine,
and per-process result slices (SURVEY.md section 4(d) test plan)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, shard_size: int, timeout: int = 240):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port), str(shard_size)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} shard_size={shard_size}" in out, out[-2000:]


@pytest.mark.parametrize("shard_size", [1, 2])
def test_two_process_sharded_engine(shard_size):
    """2 processes x 4 virtual devices: replicated (Mode A) and range-sharded
    (Mode B) engines produce host-engine-exact counts on each process's
    query slice."""
    _run_workers(2, shard_size)
