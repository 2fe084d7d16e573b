"""Driver entry points stay valid: entry() traces to the right head
shapes (eval_shape — no compile), dryrun_multichip runs a real sharded
step on the 8-device CPU mesh, and the self-provisioning logic survives
every backend failure mode the driver environment has produced so far
(r01: backend init raises; r02: backend init HANGS)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

import __graft_entry__ as g


def test_entry_shapes():
    fn, args = g.entry()
    shapes = jax.eval_shape(fn, *args)
    assert [tuple(s.shape) for s in shapes] == [
        (1, 19, 19, 60), (1, 38, 38, 60), (1, 76, 76, 60)]


@pytest.mark.slow
def test_dryrun_multichip_8():
    g.dryrun_multichip(8)


def test_probe_device_count_failure_modes(monkeypatch):
    """The out-of-process device probe treats a crash, garbage output,
    and a HANG (the r02 driver failure: jax.devices() blocking forever
    on a mid-outage TPU relay) all as 'no devices'."""
    monkeypatch.setattr(g, "_PROBE_CODE", "import sys; sys.exit(3)")
    assert g._probe_device_count() == 0
    monkeypatch.setattr(g, "_PROBE_CODE", "print('no devices here')")
    assert g._probe_device_count() == 0
    monkeypatch.setattr(g, "_PROBE_CODE", "print('warning: x'); print(4)")
    assert g._probe_device_count() == 4
    monkeypatch.setattr(g, "_PROBE_CODE", "import time; time.sleep(600)")
    monkeypatch.setattr(g, "_PROBE_TIMEOUT_S", 3.0)
    assert g._probe_device_count() == 0


@pytest.mark.slow
def test_dryrun_falls_back_when_backend_hangs(monkeypatch):
    """Regression for the r02 rc=124: a backend whose init BLOCKS (not
    raises) must not hang the dryrun — the time-bounded probe expires
    and the CPU self-provisioning path completes the run end to end."""
    monkeypatch.setattr(g, "_PROBE_CODE", "import time; time.sleep(600)")
    monkeypatch.setattr(g, "_PROBE_TIMEOUT_S", 3.0)
    monkeypatch.delenv(g._CHILD_SENTINEL, raising=False)
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_without_conftest():
    """Invoke dryrun_multichip(8) exactly as the driver does: a fresh
    interpreter, no conftest, no XLA_FLAGS, no JAX_PLATFORMS, and NO
    platform forcing in the parent — the real backend probe runs (in a
    time-bounded subprocess), finds < 8 devices (or times out on a dead
    relay), and the entry point provisions its own 8-virtual-CPU mesh."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "_GRAFT_DRYRUN_CHILD")}
    code = ("import sys\n"
            f"sys.path.insert(0, {repo!r})\n"
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok, 8-way cpu mesh" in out.stdout, out.stdout


def test_dryrun_layout_assertions_catch_replicated_batch():
    """_assert_layouts is a real check: a replicated batch must fail."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated)
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import train as T

    mesh = make_mesh()
    n = mesh.devices.size
    assert n == 8
    exp = T.ExperimentConfig(name="t", img_size=64, patch_size=16,
                             batch_size=2 * n, max_labels=8)
    state = jax.device_put(T.init_train_state(exp, jax.random.PRNGKey(0)),
                           replicated(mesh))
    imgs = np.zeros((2 * n, 64, 64, 3), np.float32)
    good = jax.device_put(imgs, batch_sharding(mesh))
    bad = jax.device_put(imgs, replicated(mesh))
    g._assert_layouts(good, state, n, 2 * n)
    with pytest.raises(AssertionError):
        g._assert_layouts(bad, state, n, 2 * n)
