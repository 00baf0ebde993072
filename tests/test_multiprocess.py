"""True multi-process distributed execution: 2 OS processes x 4 forced CPU
devices, joined by jax.distributed (gloo) — the CPU analog of a 2-host pod
(SURVEY §4: "multi-host tests on CPU jax.distributed/multiprocess meshes").

Each process runs the sharded channelizer step over the GLOBAL
(channel=2, time=4) mesh, provides only ITS channels' input
(make_array_from_process_local_data — the DCN input-distribution path), and
asserts its local audio shards match an unsharded single-process reference.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_step():
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # workers force their own platform/device-count; scrub inherited flags
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, WORKER, str(i), "2", port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert "MULTIPROCESS OK" in out
