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


def test_c12_dispatch_through_apply(rng, monkeypatch):
    """The ADV_PATCH_RES152=c12 dispatch glue in models/darknet.apply —
    fused_stem_planar handoff, outputs[12] wiring, the start=13
    sentinel, the compute_dtype cast on conv_12, and the route
    breadcrumb — end to end on the REAL yolov3 layer graph at reduced
    resolution (interpret mode): heads and input-gradient digest must
    match the default XLA route, and last_routes() must prove the c12
    route actually ran (the kernels/VJP wrappers are oracle-tested
    separately; this covers the apply() glue that only tools/c12_ab.py
    exercised before)."""
    import functools

    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
        apply, build_network, darknet, fold_bn, init_params,
        yolov3_blocks)
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import (
        stem_fused as SF)

    for mod, names in ((SF, ("fused_stem_fwd", "fused_stem_bwd_saved")),
                       (RF, ("res152_fused", "res152_fused_grad12"))):
        for n in names:
            monkeypatch.setattr(mod, n,
                                functools.partial(getattr(mod, n),
                                                  interpret=True))
    monkeypatch.setenv("ADV_PATCH_RES152", "c12")
    # the conftest forces 8 virtual CPU devices; the c12 gate is
    # single-device only, and with no mesh + numpy inputs plain jit
    # places everything on device 0, so faking the count is safe here
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)

    net = build_network(yolov3_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(1)))
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)

    want_heads = apply(net, params, x, compute_dtype=jnp.float32,
                       fused_stem=False)
    got_heads = apply(net, params, x, compute_dtype=jnp.float32,
                      fused_stem=True)
    assert darknet.last_routes() == {"stem": "c12", "res152": "c12"}
    assert len(got_heads) == len(want_heads) == 3
    for gh, wh in zip(got_heads, want_heads):
        scale = np.abs(np.asarray(wh)).max()
        np.testing.assert_allclose(np.asarray(gh), np.asarray(wh),
                                   rtol=2e-4, atol=2e-4 * scale)

    def loss(fused):
        def f(v):
            heads = apply(net, params, v, compute_dtype=jnp.float32,
                          fused_stem=fused)
            return sum(jnp.sum(h ** 2) for h in heads)
        return f

    gw = np.asarray(jax.grad(loss(False))(x))
    gg = np.asarray(jax.grad(loss(True))(x))
    # digest comparison (norm + sum): pixel-exact equality is not
    # guaranteed across the two implementations when a leaky preact
    # sits within float eps of 0, but the digests are insensitive to
    # isolated near-zero gate flips
    assert abs(np.linalg.norm(gg) - np.linalg.norm(gw)) \
        <= 1e-3 * np.linalg.norm(gw), (np.linalg.norm(gg),
                                       np.linalg.norm(gw))
    assert abs(gg.sum() - gw.sum()) <= 1e-3 * np.abs(gw).sum()
