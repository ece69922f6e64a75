"""Multi-process jax.distributed validation (SURVEY.md §7 step 4).

Spawns 2 OS processes, each with 4 virtual CPU devices, that form one
8-device mesh through `init_distributed` (parallel/mesh.py) over the gloo CPU
collectives backend — the CI stand-in for a 2-host DCN deployment. Each
worker runs a cross-process psum and one full doc-sharded search step and
checks the merged results against the single-device oracle
(tests/multihost_worker.py).

The reference has no distributed backend at all (SURVEY.md §2.5 P8) — this
covers the TPU rebuild's replacement for "run more containers".
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_sharded_search(tmp_path):
    port = _free_port()
    # Clean env: the workers pick their own platform/flags; drop this
    # pytest process's 8-device XLA_FLAGS and any NEXT_PLAID_* remnants.
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith("NEXT_PLAID_") and k != "XLA_FLAGS"
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(HERE, "multihost_worker.py"),
                str(pid),
                str(port),
                str(tmp_path),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"PID {pid} MULTIHOST OK" in out
