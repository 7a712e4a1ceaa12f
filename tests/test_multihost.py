"""Multi-host (DCN-axis) smoke: counting, junction exchange AND the
device-side distributed glue across 2 processes.

Spawns two fresh python processes that each own 4 virtual CPU devices,
form one 8-device global mesh via jax.distributed, and run the production
shard_map rounds (superkmer counting, junction exchange, distributed
compaction) with collectives crossing the process boundary — the evidence
SURVEY.md §8 step 7 asks for (the reference is single-node; its only
transport is the filesystem).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(port: int):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update({
            "MH_NPROCS": "2",
            "MH_PID": str(pid),
            "MH_PORT": str(port),
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": root,
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    return outs


@pytest.mark.slow
def test_two_process_mesh_counting():
    # the probed free port can be stolen between probe and the worker's
    # bind (ADVICE r02); retry the whole spawn on a bind failure
    for attempt in range(3):
        outs = _run_workers(_free_port())
        errs = "\n".join(err for _, _, err in outs)
        if any(rc != 0 for rc, _, _ in outs) and (
                "already in use" in errs or "Address in use" in errs
                or "bind" in errs.lower()):
            continue
        break
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-3000:]}"
    assert any("MULTIHOST_OK" in out for _, out, _ in outs), outs
