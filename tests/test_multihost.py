"""True multi-process (DCN-style) validation of training AND retrieval.

Spawns TWO OS processes (tests/multihost_worker.py), each with 4 virtual CPU
devices, joined by jax.distributed over the gloo backend into one global
8-device mesh — the closest this single-host sandbox gets to multi-host TPU
(same partitioner, same collectives, real cross-process transport). The
workers run the production Trainer train step on host-local batch shards
(identical losses required), then the corpus-sharded warehouse kNN with
host-local corpus shards (replicated results must agree across processes
and match numpy brute force exactly, FAISS tie-break included).
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(__file__)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step_agrees():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(HERE)] + sys.path)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(pid), f"127.0.0.1:{port}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = sorted(line for out in outs for line in out.splitlines()
                     if line.startswith("RESULT"))
    assert len(results) == 2, outs
    # both processes observed the same global program state
    r0 = results[0].split(" ", 2)[2]
    r1 = results[1].split(" ", 2)[2]
    assert r0 == r1, results
    assert "step=2" in results[0]
