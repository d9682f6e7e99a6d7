"""Two-process jax.distributed smoke test (VERDICT round-1 item 5): the POI
batch sharded over a global mesh spanning two OS processes x 4 virtual CPU
devices each, assembled with make_array_from_process_local_data, one global
SPMD ICGN step, per-process convergence checks."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(worker_name: str, ok_marker: str):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", worker_name)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=root, text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"{ok_marker} pid={pid}" in out, out


def test_two_process_distributed_icgn():
    _run_two_process("multihost_worker.py", "MULTIHOST_OK")


def test_two_process_dvc_halo():
    """ShardedICGN3D1's z-block halo exchange with the ppermute crossing a
    process boundary (VERDICT round-3 item 6): sharded == single-device."""
    _run_two_process("multihost_halo_worker.py", "MULTIHOST_HALO_OK")
