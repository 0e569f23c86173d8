"""Multi-process distributed harness — the jax analog of the reference's DistCall
(tests/test_utils.py:411): spawn N local processes, initialize jax.distributed over
a local coordinator, and verify cross-process collectives (psum over a global mesh,
evenly_divisible_all_gather of ragged per-rank batches).
"""
import json
import os
import socket
import subprocess
import sys
import tempfile

import pytest

NPROC = 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_collectives():
    port = _free_port()
    coordinator = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    with tempfile.TemporaryDirectory() as td:
        procs, outs = [], []
        for rank in range(NPROC):
            out_file = os.path.join(td, f"r{rank}.json")
            outs.append(out_file)
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
            procs.append(subprocess.Popen(
                [sys.executable, worker, coordinator, str(NPROC), str(rank), out_file],
                cwd="/root/repo", env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE))
        errs = []
        for p in procs:
            try:
                stdout, stderr = p.communicate(timeout=240)
            except subprocess.TimeoutExpired:
                p.kill()
                stdout, stderr = p.communicate()
                errs.append("timeout")
            if p.returncode != 0:
                errs.append(stderr.decode()[-2000:])
        assert not errs, errs[0]
        for rank, out_file in enumerate(outs):
            with open(out_file) as f:
                res = json.load(f)
            assert res["world_size"] == NPROC
            assert res["psum_ok"], res
            assert res["gather_ok"], res
