"""Fused 152^2-residual-stage megakernels (ops/res_fused.py) against an
XLA NHWC oracle in Pallas interpret mode on CPU: forward parity and the
remat input-cotangent kernel vs jax.grad of the reference chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

pytestmark = pytest.mark.slow  # interpret-mode megakernels, ~min each

import adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops.res_fused as RF
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import (
    planar_conv as P)

H, C = 16, 128
S = 4


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
        return (jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1,
                            jnp.float32),
                jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32))
    return [mk(1, C, C // 2), mk(3, C // 2, C),
            mk(1, C, C // 2), mk(3, C // 2, C)]


def test_res_fused_forward_parity(rng):
    x = jnp.asarray(rng.standard_normal((2, H, H, C)), jnp.float32)
    sp = _stage_params(rng)
    want = _ref_stage(x, sp)
    fwd_ops, _ = RF.res_weights(sp, dtype=jnp.float32)
    y11p = RF.res152_fused(P.to_planar(x), fwd_ops, s=S, wq=H,
                           interpret=True)
    got = P.from_planar(y11p, H, c=C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # planar invariants: zero borders
    yp = np.asarray(y11p)
    assert np.abs(yp[:, :, :, 0]).max() == 0
    assert np.abs(yp[:, :, :, H + 1:]).max() == 0


def test_res_fused_backward_parity(rng):
    x = jnp.asarray(rng.standard_normal((1, H, H, C)), jnp.float32)
    sp = _stage_params(rng)
    want = jax.grad(lambda t: jnp.sum(_ref_stage(t, sp) ** 2))(x)
    fwd_ops, bwd_ops = RF.res_weights(sp, dtype=jnp.float32)
    xp = P.to_planar(x)
    y11p, *masks = RF.res152_fused(xp, fwd_ops, s=S, wq=H, save=True,
                                   interpret=True)
    # the save variant's primal must equal the plain one
    plain = RF.res152_fused(xp, fwd_ops, s=S, wq=H, interpret=True)
    np.testing.assert_array_equal(np.asarray(y11p), np.asarray(plain))
    g11 = 2.0 * y11p  # d/dy sum(y^2), already planar (borders zero)
    g5p = RF.res152_fused_grad(g11, tuple(masks), bwd_ops, s=S, wq=H,
                               interpret=True)
    got = P.from_planar(g5p, H, c=C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_res_fused_grad12_parity(rng):
    """The boundary-widened backward: conv12's stride-2 dgrad computed
    IN-KERNEL (res152_fused_grad12) against jax.vjp of the XLA
    stage+conv12+leaky chain."""
    x = jnp.asarray(rng.standard_normal((2, H, H, C)), jnp.float32)
    sp = _stage_params(rng)
    w12 = jnp.asarray(rng.standard_normal((3, 3, C, 2 * C)) * 0.05,
                      jnp.float32)
    b12 = jnp.asarray(rng.standard_normal(2 * C) * 0.1, jnp.float32)

    def ref(t):
        y11 = _ref_stage(t, sp)
        z = lax.conv_general_dilated(
            y11, w12, (2, 2), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b12
        return _leaky(z)

    y12_ref, vjp_fn = jax.vjp(ref, x)
    g12 = jnp.asarray(rng.standard_normal(y12_ref.shape), jnp.float32)
    (want,) = vjp_fn(g12)

    fwd_ops, bwd12_ops = RF.res12_weights(sp, w12, dtype=jnp.float32)
    xp = P.to_planar(x)
    y11p, *masks = RF.res152_fused(xp, fwd_ops, s=S, wq=H, save=True,
                                   interpret=True)
    # conv12 + gate live in XLA (the fused unit's forward tail)
    y11 = P.from_planar(y11p, H, c=C)
    z12 = lax.conv_general_dilated(
        y11, w12, (2, 2), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b12
    np.testing.assert_allclose(np.asarray(_leaky(z12)),
                               np.asarray(y12_ref), rtol=2e-4,
                               atol=2e-4)
    gp12 = g12 * jnp.where(z12 > 0, 1.0, 0.1)
    g5p = RF.res152_fused_grad12(P.to_planar(gp12), tuple(masks),
                                 bwd12_ops, s=S, wq=H, interpret=True)
    got = P.from_planar(g5p, H, c=C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
