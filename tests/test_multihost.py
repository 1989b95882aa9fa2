"""Multi-host bring-up actually EXERCISED (VERDICT r2 next-step #6): two
OS processes join through `parallel.mesh.maybe_init_distributed` (the same
hook the CLIs call), see the global device set, and run a cross-process
reduction over a mesh whose `data` axis spans both processes — the DCN-axis
layout from SURVEY §5.8 (data outermost/crossing hosts, model innermost on
ICI), on a 2-local-device virtual CPU platform per process."""
import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, os, sys
import numpy as np

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lcasr_tpu.parallel.mesh import make_mesh, maybe_init_distributed

assert maybe_init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
)
assert jax.process_count() == nprocs, jax.process_count()
n_global = jax.device_count()
n_local = len(jax.local_devices())
assert n_global == nprocs * n_local, (n_global, n_local)

# (data x model) mesh: data axis OUTERMOST so it is the axis that crosses
# processes (the DCN axis); model stays within a process (the ICI axis)
mesh = make_mesh({"data": nprocs, "model": n_local})

# cross-process psum: a global array sharded over data, reduced under jit
arr = jax.make_array_from_callback(
    (n_global, 8),
    NamedSharding(mesh, P(("data", "model"), None)),
    lambda idx: np.arange(n_global, dtype=np.float32)[idx[0]][:, None]
    * np.ones((1, 8), np.float32),
)
total = jax.jit(lambda x: jnp.sum(x))(arr)
expected = float(sum(range(n_global)) * 8)
assert float(total) == expected, (float(total), expected)

if pid == 0:
    print(json.dumps({
        "ok": True,
        "processes": jax.process_count(),
        "global_devices": n_global,
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "psum": float(total),
    }))
"""


def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
    report = json.loads(outs[0][1].strip().splitlines()[-1])
    assert report["ok"] and report["processes"] == 2
    assert report["global_devices"] == 4
    assert report["mesh"]["data"] == 2 and report["mesh"]["model"] == 2
