"""Multi-host (DCN) path: a REAL 2-process jax.distributed cluster on
the CPU backend (TCP collectives = the DCN stand-in), running the
distributed NTT over the global mesh and golden-checking the gathered
result. Proves SURVEY §7's cross-host story end-to-end without TPU
pod hardware (reference has no multi-machine path at all;
porla/Server/Server.hpp:1564-1686 is single-process threads)."""

import os
import socket
import subprocess
import sys

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ntt():
    port = _free_port()
    runner = os.path.join(os.path.dirname(__file__),
                          "_multihost_runner.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(runner))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, runner, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, p in enumerate(procs):
        assert p.returncode == 0, \
            f"proc {i} rc={p.returncode}\n{outs[i][-2000:]}"
        assert "golden-checked" in outs[i]
