"""Parity tests for the batch-on-lanes fused stem (experimental/stem_batched.py)
against an XLA NHWC oracle, in Pallas interpret mode on CPU.

The module is a kept-but-not-default experiment: on v5e the kernel ran
only ~8% faster than the per-batch stem_fused kernels while its NHWC
<-> batched-planar layout glue cost ~3.8 ms/step (ROADMAP.md round-2
measurements), so stem_fused remains the production path. The math is
exact, and these tests keep it that way.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # >60s on one CPU core
from jax import lax

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.experimental import (
    stem_batched as SB)
from tests.test_stem_fused import make_sp, sign_safe_mask, xla_stem


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_layout_roundtrip(rng):
    x = jnp.asarray(rng.random((3, 8, 20, 5)), jnp.float32)
    p = SB.nhwc_to_batched(x, seg=128)
    back = SB.batched_to_nhwc(p, 3, 20, 5)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    xe, xo = SB.split_phases_b(x[:, :, :16], seg=128)
    m = SB.merge_phases_b(xe, xo, 3, 8, 5)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(x[:, :, :16]))


@pytest.mark.parametrize("h,s5,bsz", [(32, 4, 2), (64, 2, 3)])
def test_batched_forward_parity(h, s5, bsz, rng):
    sp = make_sp(rng)
    x = jnp.asarray(rng.random((bsz, h, h, 3)), jnp.float32)
    pre = []
    want = np.asarray(xla_stem(x, sp, collect_preacts=pre))
    seg = SB._seg(h // 2)
    xe, xo = SB.split_phases_b(x, seg)
    outs = SB.fused_stem_fwd_b(xe, xo, sp, bsz=bsz, s5=s5,
                               interpret=True, save_acts=True)
    got = np.asarray(SB.batched_to_nhwc(outs[0], bsz, h // 4, 128,
                                        lane0=1, stride=2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # saved activations match the oracle intermediates
    y0 = np.asarray(SB.merge_phases_b(outs[1], outs[2], bsz, h // 2, 32))
    np.testing.assert_allclose(
        y0, np.asarray(jnp.where(pre[0] > 0, pre[0], 0.1 * pre[0])),
        rtol=2e-5, atol=2e-5)
    for out_i, pre_i in zip(outs[3:6], pre[1:4]):
        act = np.asarray(jnp.where(pre_i > 0, pre_i, 0.1 * pre_i))
        g = np.asarray(SB.batched_to_nhwc(out_i, bsz, h // 2,
                                          act.shape[-1]))
        np.testing.assert_allclose(g, act, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("h,s5,bsz", [(32, 4, 2), (64, 2, 2)])
def test_batched_backward_parity(h, s5, bsz, rng):
    sp = make_sp(rng)
    x = jnp.asarray(rng.random((bsz, h, h, 3)), jnp.float32)
    g5 = jnp.asarray(rng.standard_normal((bsz, h // 4, h // 4, 128)),
                     jnp.float32)
    _, vjp = jax.vjp(lambda v: xla_stem(v, sp), x)
    want = np.asarray(vjp(g5)[0])
    seg = SB._seg(h // 2)
    xe, xo = SB.split_phases_b(x, seg)
    acts = SB.fused_stem_fwd_b(xe, xo, sp, bsz=bsz, s5=s5,
                               interpret=True, save_acts=True)
    y5 = SB.batched_to_nhwc(acts[0], bsz, h // 4, 128, lane0=1, stride=2)
    gp5 = g5 * jnp.where(y5 > 0, 1.0, 0.1)
    gp5dd = SB.nhwc_to_batched(
        SB.interleave_zero_rows(SB.interleave_zero_cols(gp5)), seg)
    gxe, gxo = SB.fused_stem_bwd_b(gp5dd, acts, sp, bsz=bsz, s5=s5,
                                   interpret=True)
    got = np.asarray(SB.merge_phases_b(gxe, gxo, bsz, h // 2, 3))
    ok = sign_safe_mask(x, sp)
    assert ok.mean() > 0.2
    scale = np.abs(want).max()
    np.testing.assert_allclose(got[ok], want[ok], rtol=2e-5,
                               atol=2e-5 * scale)
