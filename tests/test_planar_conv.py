"""Planar Pallas conv kernels: parity with the XLA conv reference
(interpret mode on CPU) for every geometry the stem uses, plus the
stem's custom backward against autodiff of an NHWC reference chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

import adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models.stem_planar as SP
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, tiny_test_blocks, yolov3_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import planar_conv as P


@pytest.mark.parametrize(
    "name,h,cin,cout,k,s,cstore,res",
    [
        ("conv0-like", 32, 3, 8, 3, 1, 8, False),
        ("conv1-like s2", 32, 8, 16, 3, 2, None, False),
        ("k1", 32, 16, 8, 1, 1, None, False),
        ("k1+res", 32, 16, 8, 1, 1, None, True),
        ("conv3-like", 32, 16, 16, 3, 1, None, False),
        ("k3+res", 32, 16, 16, 3, 1, None, True),
        ("Kchunk s2", 32, 48, 32, 3, 2, None, False),
        ("odd-rout s2", 24, 8, 8, 3, 2, None, False),
    ])
def test_planar_conv_parity(name, h, cin, cout, k, s, cstore, res, rng):
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    xp = P.to_planar(x, c_pad=cstore)
    r = None
    if res:
        r = P.to_planar(jnp.asarray(
            rng.standard_normal((2, h // s, h // s, cout)), jnp.float32))
    got = P.planar_conv(xp, w, b, r, k=k, stride=s, interpret=True)
    want = P.planar_conv_reference(xp, w, b, r, k=k, stride=s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_expand2_planar(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    xp = P.to_planar(x)
    ep = P.expand2_planar(xp, 8)
    assert ep.shape == (2, 16, 16, 128)
    dense = np.zeros((2, 16, 16, 16), np.float32)
    dense[:, ::2, ::2] = np.asarray(x)
    np.testing.assert_array_equal(
        np.asarray(P.from_planar(ep, 16, c=16)), dense)
    # still valid planar format: zero border + zero lane tail
    assert float(jnp.abs(ep[:, :, :, 0]).max()) == 0
    assert float(jnp.abs(ep[:, :, :, 17:]).max()) == 0


@pytest.mark.parametrize("k,res", [(3, False), (1, False), (1, True)])
def test_planar_conv_gate(k, res, rng):
    """gate multiplies the output (after res) by where(gate>0, 1, 0.1) —
    the fused leaky-backward mask."""
    h, cin, cout = 32, 16, 8
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    xp = P.to_planar(x)
    gate = P.to_planar(jnp.asarray(
        rng.standard_normal((2, h, h, cout)), jnp.float32))
    r = None
    if res:
        r = P.to_planar(jnp.asarray(
            rng.standard_normal((2, h, h, cout)), jnp.float32))
    got = P.planar_conv(xp, w, b, r, k=k, slope=None, gate=gate,
                        interpret=True)
    want = P.planar_conv_reference(xp, w, b, r, k=k, slope=None,
                                   gate=gate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cin,cout", [(8, 16), (48, 32)])
def test_s2_adjoint_via_expand(cin, cout, rng):
    """expand2_planar + stride-1 flipped-kernel conv is the exact
    input-cotangent of the stride-2 forward conv (linear_transpose
    oracle) — the planar stride-2 backward building block."""
    h = 16
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                    jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, h // 2, h // 2, cout)),
                    jnp.float32)

    def fwd(v):
        return jax.lax.conv_general_dilated(
            v, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)

    want = jax.linear_transpose(
        fwd, jax.ShapeDtypeStruct(x.shape, x.dtype))(g)[0]
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    gp = P.planar_conv(P.expand2_planar(P.to_planar(g), h // 2), wt,
                       jnp.zeros(cin, jnp.float32), k=3, slope=None,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(P.from_planar(gp, h, c=cin)),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


def test_planar_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)), jnp.float32)
    xp = P.to_planar(x, c_pad=8)
    assert xp.shape == (2, 16, 8, 128)
    np.testing.assert_array_equal(
        np.asarray(P.from_planar(xp, 16, c=5)), np.asarray(x))
    # borders and pad lanes are zero
    assert float(jnp.abs(xp[:, :, :, 0]).max()) == 0
    assert float(jnp.abs(xp[:, :, :, 17:]).max()) == 0
    assert float(jnp.abs(xp[:, :, 5:, :]).max()) == 0


def test_mxu_layout_kernels_match_xla(rng):
    """to_planar_mxu / from_planar_mxu (the fused-stem boundary's MXU
    shifted-identity transposes) are bit-equal to the jnp conversions,
    both dtypes, odd widths included."""
    for dt in (jnp.float32, jnp.bfloat16):
        for (h, w, c) in [(152, 152, 128), (16, 20, 8), (38, 38, 64)]:
            x = jnp.asarray(rng.random((2, h, w, c)), dt)
            want_p = P.to_planar(x)
            got_p = P.to_planar_mxu(x, interpret=True)
            assert got_p.shape == want_p.shape
            np.testing.assert_array_equal(
                np.asarray(got_p, np.float32), np.asarray(want_p, np.float32))
            got_x = P.from_planar_mxu(want_p, w, c, interpret=True)
            np.testing.assert_array_equal(
                np.asarray(got_x, np.float32),
                np.asarray(P.from_planar(want_p, w, c=c), np.float32))


def _tiny_stem_params(rng):
    sp = []
    for cin, cout, k in [(3, 8, 3), (8, 16, 3), (16, 8, 1), (8, 16, 3),
                         (16, 32, 3)]:
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.2,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
        sp.append((w, b))
    return sp


def _ref_stem(x, sp):
    def conv(v, w, b, s):
        pad = (w.shape[0] - 1) // 2
        y = lax.conv_general_dilated(
            v, w, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST)
        y = y + b
        return jnp.where(y > 0, y, 0.1 * y)
    y0 = conv(x, *sp[0], 1)
    y1 = conv(y0, *sp[1], 2)
    y2 = conv(y1, *sp[2], 1)
    y3 = conv(y2, *sp[3], 1)
    return conv(y3 + y1, *sp[4], 2)


@pytest.mark.slow
def test_stem_forward_matches_reference(rng):
    h = 64
    x = jnp.asarray(rng.standard_normal((2, h, h, 3)) * 0.5, jnp.float32)
    sp = _tiny_stem_params(rng)
    y5 = SP._forward(x, sp, interpret=True)[4]
    got = SP.from_planar(y5, h // 4, c=32)
    want = _ref_stem(x, sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_stem_backward_matches_autodiff(rng):
    """The custom (mixed planar/XLA) backward must equal jax.grad of the
    NHWC reference chain — this is the patch-gradient path."""
    h = 64
    x = jnp.asarray(rng.standard_normal((2, h, h, 3)) * 0.5, jnp.float32)
    sp = _tiny_stem_params(rng)
    g_ref = jax.grad(lambda v: jnp.sum(_ref_stem(v, sp) ** 2))(x)
    y0, y1, y2, y3, y5 = SP._forward(x, sp, interpret=True)
    out = SP.from_planar(y5, h // 4, c=32)
    g_pl, _ = SP._stem_bwd((x, sp, y0, y1, y2, y3, y5), 2 * out,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_stem_applicable():
    net = build_network(yolov3_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(0)))
    assert SP.stem_applicable(net, params, (8, 608, 608, 3))
    assert SP.stem_applicable(net, params, (8, 64, 64, 3))
    # unfolded BN params -> not applicable
    raw = init_params(net, jax.random.PRNGKey(0))
    assert not SP.stem_applicable(net, raw, (8, 608, 608, 3))
    # non-square / wrong channels / tiny -> not applicable
    assert not SP.stem_applicable(net, params, (8, 608, 304, 3))
    assert not SP.stem_applicable(net, params, (8, 608, 608, 4))
    assert not SP.stem_applicable(net, params, (8, 32, 32, 3))
    # the tiny test net is a miniature yolov3: same stem pattern
    tiny = build_network(tiny_test_blocks())
    tparams = fold_bn(tiny, init_params(tiny, jax.random.PRNGKey(0)))
    assert SP.stem_applicable(tiny, tparams, (8, 64, 64, 3))
