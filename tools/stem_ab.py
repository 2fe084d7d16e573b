#!/usr/bin/env python
"""Honest (scan-chained, single scalar fetch) A/B of the YOLOv3 stem
forward+backward: XLA autodiff vs the planar Pallas custom_vjp, plus
per-piece timings of the planar backward chain.

Usage: python tools/stem_ab.py [batch] [h]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import stem_planar as SP
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops.planar_conv import (
    expand2_planar, planar_conv, to_planar)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H = int(sys.argv[2]) if len(sys.argv) > 2 else 608
DT = jnp.bfloat16
ITERS = 20

rng = np.random.default_rng(0)
sp = []
for cin, cout, k in [(3, 32, 3), (32, 64, 3), (64, 32, 1), (32, 64, 3),
                     (64, 128, 3)]:
    sp.append((jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05,
                           DT),
               jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.float32)))
x0 = jnp.asarray(rng.random((B, H, H, 3)), DT)


def timed(fn, x, iters=ITERS):
    @jax.jit
    def run(x):
        def body(x, _):
            s = fn(x)
            return x + s.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), ()
        x, _ = lax.scan(body, x, None, length=iters)
        return x.reshape(-1)[0]
    float(run(x))
    t0 = time.perf_counter()
    out = float(run(x))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(out)
    return dt


def xla_stem(v):
    def conv(u, w, b, s):
        pad = (w.shape[0] - 1) // 2
        y = lax.conv_general_dilated(
            u, w.astype(u.dtype), (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + b.astype(y.dtype)
        return jnp.where(y > 0, y, 0.1 * y)
    y0 = conv(v, *sp[0], 1)
    y1 = conv(y0, *sp[1], 2)
    y2 = conv(y1, *sp[2], 1)
    y3 = conv(y2, *sp[3], 1)
    return conv(y3 + y1, *sp[4], 2)


def loss_xla(v):
    return jnp.sum(xla_stem(v).astype(jnp.float32))


def loss_planar(v):
    return jnp.sum(SP.planar_stem(v, sp).astype(jnp.float32))


print(f"batch={B} H={H} dev={jax.devices()[0]}", flush=True)
print(f"XLA    fwd      : {timed(lambda v: jnp.sum(xla_stem(v).astype(jnp.float32)), x0)*1e3:7.2f} ms", flush=True)
print(f"planar fwd      : {timed(lambda v: jnp.sum(SP.planar_stem(v, sp).astype(jnp.float32)), x0)*1e3:7.2f} ms", flush=True)
print(f"XLA    fwd+bwd  : {timed(lambda v: jnp.vdot(g := jax.grad(loss_xla)(v), g), x0)*1e3:7.2f} ms", flush=True)
print(f"planar fwd+bwd  : {timed(lambda v: jnp.vdot(g := jax.grad(loss_planar)(v), g), x0)*1e3:7.2f} ms", flush=True)

# --- per-piece (planar backward), each chained on its own input
fwd = jax.jit(lambda v: SP._forward(v, sp))
y0, y1, y2, y3, y5 = fwd(x0)
g5 = jnp.asarray(rng.random((B, H // 4, H // 4, 128)), DT)
(w0, _), (w1, _), (w2, _), (w3, _), (w5, _) = sp
w5t, w3t, w2t, w1t = (SP._flip_t(w) for w in (w5, w3, w2, w1))
w0t = SP._pad_cout(SP._flip_t(w0))


def zb(w):
    return jnp.zeros(w.shape[-1], jnp.float32)


gp5 = jax.jit(lambda g: SP._leaky_bwd_planar(to_planar(g), y5))(g5)
e5 = jax.jit(lambda g: expand2_planar(g, H // 4))(gp5)
g_sc = jax.jit(lambda e: planar_conv(e, w5t, zb(w5t), k=3, slope=None))(e5)
gp3 = jax.jit(lambda g: SP._leaky_bwd_planar(g, y3))(g_sc)
gp2 = jax.jit(lambda g: planar_conv(g, w3t, zb(w3t), k=3, slope=None,
                                    gate=y2))(gp3)
gp1 = jax.jit(lambda g: planar_conv(g, w2t, zb(w2t), res=g_sc, k=1,
                                    slope=None, gate=y1))(gp2)
e1 = jax.jit(lambda g: expand2_planar(g, H // 2))(gp1)
gp0 = jax.jit(lambda e: planar_conv(e, w1t, zb(w1t), k=3, slope=None,
                                    gate=y0))(e1)

pieces = [
    ("mask5+to_planar", lambda g: jnp.sum(
        SP._leaky_bwd_planar(to_planar(g), y5).astype(jnp.float32)), g5),
    ("expand2@%d" % (H // 4), lambda g: jnp.sum(
        expand2_planar(g, H // 4).astype(jnp.float32)), gp5),
    ("conv5-dx K384", lambda e: jnp.sum(
        planar_conv(e, w5t, zb(w5t), k=3, slope=None)
        .astype(jnp.float32)), e5),
    ("mask3", lambda g: jnp.sum(
        SP._leaky_bwd_planar(g, y3).astype(jnp.float32)), g_sc),
    ("conv3-dx+gate", lambda g: jnp.sum(
        planar_conv(g, w3t, zb(w3t), k=3, slope=None, gate=y2)
        .astype(jnp.float32)), gp3),
    ("conv2-dx k1+res+gate", lambda g: jnp.sum(
        planar_conv(g, w2t, zb(w2t), res=g_sc, k=1, slope=None, gate=y1)
        .astype(jnp.float32)), gp2),
    ("expand2@%d" % (H // 2), lambda g: jnp.sum(
        expand2_planar(g, H // 2).astype(jnp.float32)), gp1),
    ("conv1-dx K192+gate", lambda e: jnp.sum(
        planar_conv(e, w1t, zb(w1t), k=3, slope=None, gate=y0)
        .astype(jnp.float32)), e1),
    ("conv0-dx", lambda g: jnp.sum(
        planar_conv(g, w0t, zb(w0t), k=3, slope=None)
        .astype(jnp.float32)), gp0),
]
total = 0.0
for name, f, arg in pieces:
    dt = timed(f, arg)
    total += dt
    print(f"{name:22s}: {dt*1e3:7.2f} ms", flush=True)
print(f"{'sum':22s}: {total*1e3:7.2f} ms")
