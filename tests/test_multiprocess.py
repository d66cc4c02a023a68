"""Multi-process ``jax.distributed`` smoke test (SURVEY.md §4 test plan;
VERDICT.md round-1 Missing #5).

Two localhost CPU processes form a distributed JAX runtime (coordinator on
a free port), build the SAME (data=2, tile=1) global mesh through
``parallel.distributed.initialize``/``global_mesh`` that a multi-host
deployment would, and each contributes its local shard to a ``psum`` whose
result every process must see identically.  This executes the
``jax.distributed.initialize`` multi-process branch that single-process
tests can't reach.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
# Force the CPU platform before any client exists (site hooks may pin an
# accelerator platform; env vars alone are too late once a client is up).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])
from hobot_stereonet_tpu.parallel import distributed

info = distributed.initialize(coordinator_address=coord, num_processes=2,
                              process_id=pid)
assert info["multi_process"] is True, info
assert info["process_count"] == 2, info

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = distributed.global_mesh(tile=1)
assert mesh.shape["data"] == 2, dict(mesh.shape)

# Each process contributes its local row; the psum must see both.
sharding = NamedSharding(mesh, P("data"))
local = jnp.full((1, 4), float(pid + 1))
glob = jax.make_array_from_single_device_arrays(
    (2, 4), sharding, [jax.device_put(local, jax.local_devices()[0])]
)
total = jax.jit(
    lambda x: jnp.sum(x), in_shardings=sharding, out_shardings=None
)(glob)
print(json.dumps({"pid": pid, "total": float(total),
                  "devices": jax.device_count()}), flush=True)
"""


@pytest.mark.multiprocess
def test_two_process_distributed_psum(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # breaks plugin registration on this rig
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    # sum over the global [2,4] array of rows (1s and 2s) = 4 + 8.
    for o in outs:
        assert o["total"] == 12.0, outs
        assert o["devices"] == 2, outs


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
