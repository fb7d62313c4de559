"""Launch a REAL 2-process jax.distributed CPU job (VERDICT r1 item 2).

Unlike the 8-virtual-device single-process sim, this exercises the actual
multi-host code paths: jax.distributed.initialize, non-addressable global
arrays (device_get would raise), per-process addressable-shard assembly, and
the host byte-blob exchange in parallel.multihost.gather_bytes.
"""
import os
import socket
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_encode():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.splitlines()[-25:])
        assert p.returncode == 0, f"worker {i} failed:\n{tail}"
        assert f"MP_WORKER_OK {i}" in out, f"worker {i} incomplete:\n{tail}"
