"""Multi-process distribution test (VERDICT r2 next#7; SURVEY.md §4).

Spawns 2 real OS processes that jax.distributed.initialize over localhost
(Gloo CPU collectives, 2 virtual devices each -> a 4-device global mesh) and
run the fully-distributed in-situ speculative epoch renderer.  Each worker
verifies its own pixel shards against a single-device reference — the same
collective code paths a multi-host TPU pod runs over DCN.
"""

import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).parent / "mp_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_insitu_render():
    port = _free_port()
    n = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(n), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={
                k: v for k, v in __import__("os").environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
            },
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MP_OK {i}" in out, f"worker {i} no MP_OK:\n{out[-3000:]}"
