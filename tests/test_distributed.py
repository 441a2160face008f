"""Two-process CPU smoke test for the multi-host init path.

`maybe_initialize_distributed` (ngf_tpu/parallel/mesh.py) is the one piece
of code a pod-slice run needs beyond the single-host mesh; this runs it
for real: two OS processes, each with 2 virtual CPU devices, form one
4-device `data` mesh and jit a global reduction over a process-sharded
batch — the cross-process value proves the collective actually ran over
the distributed runtime (gloo on CPU), not per-process. The reference has
no distributed backend at all (SURVEY.md §5).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

WORKER = """
import jax
from ngf_tpu.parallel.mesh import (
    data_sharding, make_mesh, maybe_initialize_distributed,
    replicated_sharding,
)

assert maybe_initialize_distributed(), "env opt-in not picked up"
assert maybe_initialize_distributed(), "second call must be a no-op True"

import numpy as np

pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
mesh = make_mesh()
local = np.arange(2.0, dtype=np.float32) + 10 * pid
arr = jax.make_array_from_process_local_data(
    data_sharding(mesh), local, (4,)
)
f = jax.jit(lambda x: x.sum(), out_shardings=replicated_sharding(mesh))
print("RESULT", pid, jax.device_count(), float(f(arr)), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def test_two_process_mesh_reduction(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            NGF_COORDINATOR=f"localhost:{port}",
            NGF_NUM_PROCESSES="2",
            NGF_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, out
        _, got_pid, ndev, total = lines[0].split()
        assert int(got_pid) == pid
        assert int(ndev) == 4  # 2 processes x 2 virtual devices
        # (0+1) from process 0 + (10+11) from process 1: the collective
        # crossed the process boundary.
        assert float(total) == 22.0


def test_noop_without_optin(monkeypatch):
    from ngf_tpu.parallel import mesh

    for var in ("NGF_COORDINATOR", "NGF_NUM_PROCESSES",
                "NGF_PROCESS_ID", "NGF_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(mesh, "_DISTRIBUTED_INITIALIZED", False)
    assert mesh.maybe_initialize_distributed() is False
    monkeypatch.setenv("NGF_DISTRIBUTED", "0")
    assert mesh.maybe_initialize_distributed() is False
