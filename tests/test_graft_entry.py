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
