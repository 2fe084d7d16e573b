"""Parity tests for the fused stem megakernels (ops/stem_fused.py)
against an XLA NHWC oracle, in Pallas interpret mode on CPU.

Covers single-stripe (both halos clamp in one grid cell), multi-stripe,
and non-default stripe sizes; backward is checked against jax.vjp of
the oracle (full input-cotangent through all five convs + shortcut)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import (
    stem_fused as SF)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def make_sp(rng, dtype=jnp.float32):
    sp = []
    for cin, cout, k in [(3, 32, 3), (32, 64, 3), (64, 32, 1),
                         (32, 64, 3), (64, 128, 3)]:
        sp.append((jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1,
                               dtype),
                   jnp.asarray(rng.standard_normal(cout) * 0.1,
                               jnp.float32)))
    return sp


def xla_stem(v, sp, collect_preacts=None):
    def conv(u, w, b, s):
        pad = (w.shape[0] - 1) // 2
        y = lax.conv_general_dilated(
            u, w, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST)
        y = y + b
        if collect_preacts is not None:
            collect_preacts.append(y)
        return jnp.where(y > 0, y, 0.1 * y)
    y0 = conv(v, *sp[0], 1)
    y1 = conv(y0, *sp[1], 2)
    y2 = conv(y1, *sp[2], 1)
    y3 = conv(y2, *sp[3], 1)
    return conv(y3 + y1, *sp[4], 2)


def sign_safe_mask(x, sp, tol=1e-6, radius=12):
    """Boolean [B, H, W] mask of input-cotangent pixels unaffected by
    sign-boundary pre-activations. At an exact sign boundary the
    oracle's conv and the kernel's matmul can round a ~1e-8
    pre-activation to different signs, flipping that cell's leaky
    sub-gradient (1.0 vs 0.1) — a measure-zero, numerically legitimate
    divergence (seed 7 at h=64 hits |preact| = 3e-8). A random input
    has ~20 such cells below 1e-6, so instead of redrawing, exclude
    each cell's (receptive-field-bounded) influence region from the
    gradient comparison."""
    pre = []
    xla_stem(x, sp, collect_preacts=pre)
    b, h = x.shape[0], x.shape[1]
    ok = np.ones((b, h, h), bool)
    for p in pre:
        f = h // p.shape[1]
        bad = np.argwhere(np.abs(np.asarray(p)).min(axis=-1) < tol)
        for bi, r, c in bad:
            r0, c0 = r * f + f // 2, c * f + f // 2
            ok[bi, max(r0 - radius, 0):r0 + radius,
               max(c0 - radius, 0):c0 + radius] = False
    return ok


def test_split_merge_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    xe, xo = SF.split_phases(x)
    np.testing.assert_array_equal(
        np.asarray(SF.merge_phases(xe, xo, 8, 3)), np.asarray(x))


@pytest.mark.parametrize("h,s5", [(32, 8), (64, 4), (64, 8), (64, 2)])
@pytest.mark.slow
def test_fused_stem_forward_parity(h, s5, rng):
    sp = make_sp(rng)
    x = jnp.asarray(rng.random((2, h, h, 3)), jnp.float32)
    want = np.asarray(xla_stem(x, sp))
    xe, xo = SF.split_phases(x)
    y5p = SF.fused_stem_fwd(xe, xo, sp, s5=s5, interpret=True)
    got = np.asarray(SF.from_planar(y5p, h // 4, c=128))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("h,s5", [(32, 8), (64, 4), (64, 8)])
@pytest.mark.slow
def test_fused_stem_backward_parity(h, s5, rng):
    sp = make_sp(rng)
    x = jnp.asarray(rng.random((2, h, h, 3)), jnp.float32)
    g5 = jnp.asarray(rng.standard_normal((2, h // 4, h // 4, 128)),
                     jnp.float32)
    _, vjp = jax.vjp(lambda v: xla_stem(v, sp), x)
    want = np.asarray(vjp(g5)[0])
    xe, xo = SF.split_phases(x)
    y5p = SF.fused_stem_fwd(xe, xo, sp, s5=s5, interpret=True)
    gxe, gxo = SF.fused_stem_bwd(xe, xo, y5p, SF.to_planar(g5), sp,
                                 s5=s5, interpret=True)
    got = np.asarray(SF.merge_phases(gxe, gxo, h // 2, 3))
    ok = sign_safe_mask(x, sp)
    assert ok.mean() > 0.2, "sign-safe mask degenerate"
    scale = np.abs(want).max()
    np.testing.assert_allclose(got[ok], want[ok], rtol=2e-5,
                               atol=2e-5 * scale)


@pytest.mark.slow
def test_fused_stem_custom_vjp(rng, monkeypatch):
    """The NHWC drop-in wrapper: forward output and jax.grad cotangent
    both match the XLA oracle (interpret mode)."""
    monkeypatch.setattr(SF, "fused_stem_fwd",
                        functools.partial(SF.fused_stem_fwd,
                                          interpret=True))
    monkeypatch.setattr(SF, "fused_stem_bwd_saved",
                        functools.partial(SF.fused_stem_bwd_saved,
                                          interpret=True))
    h = 32
    sp = make_sp(rng)
    x = jnp.asarray(rng.random((2, h, h, 3)), jnp.float32)
    g5 = jnp.asarray(rng.standard_normal((2, h // 4, h // 4, 128)),
                     jnp.float32)

    def loss(fn, v):
        return jnp.sum(fn(v) * g5)

    want_y = np.asarray(xla_stem(x, sp))
    got_y = np.asarray(SF.fused_stem(x, sp))
    np.testing.assert_allclose(got_y, want_y, rtol=2e-5, atol=2e-5)
    want_g = np.asarray(jax.grad(
        lambda v: loss(lambda u: xla_stem(u, sp), v))(x))
    got_g = np.asarray(jax.grad(
        lambda v: loss(lambda u: SF.fused_stem(u, sp), v))(x))
    ok = sign_safe_mask(x, sp)
    assert ok.mean() > 0.2, "sign-safe mask degenerate"
    scale = np.abs(want_g).max()
    np.testing.assert_allclose(got_g[ok], want_g[ok], rtol=2e-5,
                               atol=2e-5 * scale)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["planar", "remat"])
def test_fused_stem_variant_custom_vjp(variant, rng, monkeypatch):
    """The planar-out wrapper (the c12 stage handoff — planar y5 out,
    planar g5 in) and the remat-backward wrapper both match the XLA
    oracle end to end under jax.grad (interpret mode)."""
    for name in ("fused_stem_fwd", "fused_stem_bwd_saved",
                 "fused_stem_bwd"):
        monkeypatch.setattr(SF, name,
                            functools.partial(getattr(SF, name),
                                              interpret=True))
    h = 32
    sp = make_sp(rng)
    x = jnp.asarray(rng.random((2, h, h, 3)), jnp.float32)
    g5 = jnp.asarray(rng.standard_normal((2, h // 4, h // 4, 128)),
                     jnp.float32)
    if variant == "planar":
        def fn(v):
            return SF.from_planar(SF.fused_stem_planar(v, sp),
                                  h // 4, c=128)
    else:
        def fn(v):
            return SF.fused_stem_remat(v, sp)

    want_y = np.asarray(xla_stem(x, sp))
    got_y = np.asarray(fn(x))
    np.testing.assert_allclose(got_y, want_y, rtol=2e-5, atol=2e-5)
    want_g = np.asarray(jax.grad(
        lambda v: jnp.sum(xla_stem(v, sp) * g5))(x))
    got_g = np.asarray(jax.grad(lambda v: jnp.sum(fn(v) * g5))(x))
    ok = sign_safe_mask(x, sp)
    assert ok.mean() > 0.2, "sign-safe mask degenerate"
    scale = np.abs(want_g).max()
    np.testing.assert_allclose(got_g[ok], want_g[ok], rtol=2e-5,
                               atol=2e-5 * scale)


def test_fused_applicable_rejects_other_channel_widths():
    """The megakernels hard-code yolov3 stem widths; a structurally
    similar stem with different filter counts (e.g. the tiny test cfg)
    must fall back instead of reshaping garbage."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import models as M

    tiny = M.build_network(M.tiny_test_blocks())
    params = M.fold_bn(tiny, M.init_params(tiny, jax.random.PRNGKey(0)))
    assert not SF.fused_applicable(tiny, params, (1, 64, 64, 3))
    full = M.build_network(M.yolov3_blocks(width=64, height=64))
    fparams = M.fold_bn(full, M.init_params(full, jax.random.PRNGKey(0)))
    assert SF.fused_applicable(full, fparams, (1, 64, 64, 3))
    # and apply() with the flag forced on must still run the tiny net
    heads = M.apply(tiny, params, jnp.zeros((1, 64, 64, 3)),
                    fused_stem=True)
    assert len(heads) >= 1


def test_apply_explicit_fused_stem_guarded_on_multidevice():
    """An EXPLICIT fused_stem=True without a mesh on a >1-device host
    (this suite runs on 8 virtual devices) must fall back to the XLA
    walk like the auto-default does — GSPMD would otherwise treat the
    opaque pallas_call as replicated and silently gather a sharded
    batch. Same inputs, same heads, no pallas attempted."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import models as M

    assert jax.device_count() > 1
    net = M.build_network(M.yolov3_blocks(width=64, height=64))
    params = M.fold_bn(net, M.init_params(net, jax.random.PRNGKey(2)))
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3),
                                                    np.float32))
    want = M.apply(net, params, x, fused_stem=False)
    got = M.apply(net, params, x, fused_stem=True)  # guarded -> same path
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


@pytest.mark.slow
def test_fused_stem_shard_map():
    """The multi-device path: fused_stem under shard_map over a 4-way
    batch-sharded mesh (the wiring darknet.apply(mesh=...) uses) —
    forward and jax.grad match the XLA oracle.

    Runs in a clean subprocess: shard_map + grad + interpret-mode
    pallas intermittently segfaults the XLA CPU client when run late
    in a long pytest session (observed once at ~150 prior tests);
    isolation turns a suite-killing SIGSEGV into an ordinary failure
    and gives the check a fresh backend."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags +
                            " --xla_force_host_platform_device_count=4"
                            ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = """
import functools, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
# force the MXU boundary-layout kernel path (TPU-gated by default) so
# the shard_map + conversion-kernel combination is what multi-chip TPU
# meshes actually run
os.environ["ADV_PATCH_MXU_LAYOUT"] = "1"
from test_stem_fused import make_sp, sign_safe_mask, xla_stem
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import planar_conv as PC
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import stem_fused as SF
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

SF.fused_stem_fwd = functools.partial(SF.fused_stem_fwd, interpret=True)
SF.fused_stem_bwd_saved = functools.partial(SF.fused_stem_bwd_saved,
                                            interpret=True)
SF.from_planar_mxu = functools.partial(PC.from_planar_mxu, interpret=True)
SF.to_planar_mxu = functools.partial(PC.to_planar_mxu, interpret=True)
rng = np.random.default_rng(7)
h, bsz = 32, 4
sp = make_sp(rng)
x = jnp.asarray(rng.random((bsz, h, h, 3)), jnp.float32)
g5 = jnp.asarray(rng.standard_normal((bsz, h // 4, h // 4, 128)),
                 jnp.float32)
mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
fn = shard_map(SF.fused_stem, mesh=mesh,
               in_specs=(P("data"), P()), out_specs=P("data"),
               check_vma=False)
want_y = np.asarray(xla_stem(x, sp))
got_y = np.asarray(fn(x, sp))
np.testing.assert_allclose(got_y, want_y, rtol=2e-5, atol=2e-5)
want_g = np.asarray(jax.grad(lambda v: jnp.sum(xla_stem(v, sp) * g5))(x))
got_g = np.asarray(jax.grad(lambda v: jnp.sum(fn(v, sp) * g5))(x))
ok = sign_safe_mask(x, sp)
assert ok.mean() > 0.2
scale = np.abs(want_g).max()
np.testing.assert_allclose(got_g[ok], want_g[ok], rtol=2e-5,
                           atol=2e-5 * scale)
print("shard_map fused stem: ok")
""".format(repo=repo, tests=os.path.join(repo, "tests"))
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    assert "shard_map fused stem: ok" in res.stdout
