"""Two-process jax.distributed smoke test for parallel.mesh.

Spawns two clean CPU subprocesses (2 virtual devices each) that form a
4-device global mesh through ``init_distributed`` and jointly reduce a
globally-sharded array — the multi-HOST analog of the in-process
8-virtual-device mesh tests (reference scope: nn.DataParallel was
single-host only, train_patch.py:63-68; this exceeds it)."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid, port = int(sys.argv[1]), sys.argv[2]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env
import numpy as np
import jax.numpy as jnp
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import (
    batch_sharding, init_distributed, make_mesh, replicated)

assert init_distributed(), "coordinator env set but not initialized"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 per process
mesh = make_mesh()
assert mesh.devices.size == 4

# global [8] array sharded over 4 devices; each process provides its
# local half; the jitted global sum requires a cross-process psum
sharding = batch_sharding(mesh)
global_shape = (8,)
data = np.arange(8, dtype=np.float32) + 1.0
arr = jax.make_array_from_callback(
    global_shape, sharding, lambda idx: data[idx])
total = jax.jit(jnp.sum, out_shardings=replicated(mesh))(arr)
val = float(jax.device_get(total))
assert val == 36.0, val
print(f"proc{pid} ok total={val}", flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only smoke")
def test_two_process_data_parallel_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} ok total=36.0" in out, out[-1500:]
