"""2-process jax.distributed bring-up on CPU (VERDICT round-2 missing #4).

Spawns two REAL OS processes, each with 2 virtual CPU devices, forming a
4-device global mesh over the jax.distributed coordinator — the same
code path (`initialize_distributed`, parallel/mesh.py:30-37) a multi-host
TPU pod launch uses, minus the hardware.  Each worker holds only its
shard of an SW pair batch, runs the sharded forward, psums hit counts
across processes, all-gathers the edge list, and checks everything
against a full local reference (tests/dist_worker.py)."""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_sw(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    coordinator = f"127.0.0.1:{_free_port()}"
    nprocs = 2

    env = dict(os.environ)
    # 2 local virtual CPU devices per process -> 4 global
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"  # belt; worker also sets the config
    env["PYTHONPATH"] = repo  # deliberately WITHOUT the axon site dir
    env.pop("JAX_PLATFORM_NAME", None)

    procs = []
    for pid in range(nprocs):
        procs.append(subprocess.Popen(
            [sys.executable, worker, coordinator, str(nprocs), str(pid),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        ok = tmp_path / f"ok.{pid}"
        assert ok.exists(), f"worker {pid} wrote no OK file:\n{out}"
        assert "OK procs=2 devices=4" in ok.read_text()
