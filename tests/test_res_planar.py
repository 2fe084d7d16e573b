"""Planar 152^2-residual-stage kernels (models/res_planar.py) against an
XLA NHWC oracle, in Pallas interpret mode on CPU: forward parity and the
hand-written input-cotangent chain vs jax.grad of the reference chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

import adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models.res_planar as RP
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, yolov3_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import (
    planar_conv as P)

H, C = 32, 16


def _leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _conv(x, w, b, k):
    pad = (k - 1) // 2
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _leaky(y + b)


def _ref_stage(x, sp):
    (w6, b6), (w7, b7), (w9, b9), (w10, b10) = sp
    a = _conv(x, w6, b6, 1)
    y8 = _conv(a, w7, b7, 3) + x
    c = _conv(y8, w9, b9, 1)
    return _conv(c, w10, b10, 3) + y8


def _stage_params(rng):
    def mk(k, cin, cout):
        return (jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.2,
                            jnp.float32),
                jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32))
    return [mk(1, C, C // 2), mk(3, C // 2, C),
            mk(1, C, C // 2), mk(3, C // 2, C)]


@pytest.mark.slow  # interpret-mode planar chain
def test_res152_forward_parity(rng):
    x = jnp.asarray(rng.standard_normal((2, H, H, C)), jnp.float32)
    sp = _stage_params(rng)
    want = _ref_stage(x, sp)
    y11p, *_ = RP._forward(P.to_planar(x), sp, interpret=True)
    got = P.from_planar(y11p, H, c=C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # interpret-mode planar chain
def test_res152_backward_parity(rng):
    x = jnp.asarray(rng.standard_normal((2, H, H, C)), jnp.float32)
    sp = _stage_params(rng)
    # cotangent: d/dx sum(ref^2) -> g11 = 2*y11
    want = jax.grad(lambda t: jnp.sum(_ref_stage(t, sp) ** 2))(x)
    xp = P.to_planar(x)
    y11p, a, post7, c, post10 = RP._forward(xp, sp, interpret=True)
    g11 = 2 * P.from_planar(y11p, H, c=C)
    got, zeros = RP._res_bwd((sp, a, post7, c, post10, H, C), g11,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    for (zw, zb), (w, _) in zip(zeros, sp):
        assert zw.shape == w.shape and float(jnp.abs(zw).max()) == 0


def test_res152_applicable_on_yolov3():
    net = build_network(yolov3_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(0)))
    assert RP.res152_applicable(net, params, (1, 608, 608, 3))
    # unfolded BN params must be rejected
    raw = init_params(net, jax.random.PRNGKey(0))
    assert not RP.res152_applicable(net, raw, (1, 608, 608, 3))
