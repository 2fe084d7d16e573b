"""Driver entry points stay valid: entry() traces to the right head
shapes (eval_shape — no compile), dryrun_multichip runs a real sharded
step on the 8-device CPU mesh."""

import jax
import numpy as np

import __graft_entry__ as g


def test_entry_shapes():
    fn, args = g.entry()
    shapes = jax.eval_shape(fn, *args)
    assert [tuple(s.shape) for s in shapes] == [
        (1, 19, 19, 60), (1, 38, 38, 60), (1, 76, 76, 60)]


def test_dryrun_multichip_8():
    g.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_without_conftest():
    """Invoke dryrun_multichip(8) exactly as the driver does: a fresh
    interpreter, no conftest, no XLA_FLAGS, no JAX_PLATFORMS — the entry
    point must provision its own 8-virtual-CPU mesh (round-1 failure
    mode: it assumed the caller's environment already had 8 devices)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "_GRAFT_DRYRUN_CHILD")}
    # Force the parent probe onto CPU (1 device < 8) so the test doesn't
    # contend for the real TPU; the child re-exec path is still exercised
    # end to end because 1 < 8 triggers self-provisioning.
    code = ("import sys, jax\n"
            f"sys.path.insert(0, {repo!r})\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok, 8-way cpu mesh" in out.stdout, out.stdout
