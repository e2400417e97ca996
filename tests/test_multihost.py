"""Two-process multi-host smoke test (VERDICT r1 item #8).

Spawns a 2-process `jax.distributed` job on CPU (2 virtual devices per
process, 4 global) that decodes a batch sharded over a global `data` mesh
and checks each process's addressable rows against a single-process
decode — see tests/_multihost_worker.py.  This validates that the
multi-host claim in parallel/mesh.py is exercised end to end, not just
wrapped.
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_decode():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker pins its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out
