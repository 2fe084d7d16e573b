#!/usr/bin/env python
"""Honest (scan-chained, single scalar fetch) A/B of the YOLOv3 stem:
XLA autodiff vs planar per-layer Pallas vs the fused stripe megakernels
(ops/stem_fused.py), forward and forward+backward.

Usage: python tools/stem_fused_ab.py [batch] [h] [s5]
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
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import stem_fused as SF

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H = int(sys.argv[2]) if len(sys.argv) > 2 else 608
S5 = int(sys.argv[3]) if len(sys.argv) > 3 else None
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


def fused(v):
    xe, xo = SF.split_phases(v)
    return SF.fused_stem_fwd(xe, xo, sp, s5=S5)


def loss_fused(v):
    return jnp.sum(SF.fused_stem(v, sp).astype(jnp.float32))


print(f"batch={B} H={H} s5={S5} dev={jax.devices()[0]}", flush=True)
# numerical sanity on-device before timing
ref = np.asarray(xla_stem(x0[:1]).astype(jnp.float32))
got = np.asarray(SF.fused_stem(x0[:1], sp).astype(jnp.float32))
err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
print(f"fused fwd rel-err vs XLA (bf16): {err:.3e}", flush=True)
print(f"XLA    fwd      : {timed(lambda v: jnp.sum(xla_stem(v).astype(jnp.float32)), x0)*1e3:7.2f} ms", flush=True)
print(f"planar fwd      : {timed(lambda v: jnp.sum(SP.planar_stem(v, sp).astype(jnp.float32)), x0)*1e3:7.2f} ms", flush=True)
print(f"fused  fwd      : {timed(lambda v: jnp.sum(fused(v).astype(jnp.float32)), x0)*1e3:7.2f} ms", flush=True)
def loss_fused_remat(v):
    return jnp.sum(SF.fused_stem_remat(v, sp).astype(jnp.float32))


print(f"XLA    fwd+bwd  : {timed(lambda v: jnp.vdot(g := jax.grad(loss_xla)(v), g), x0)*1e3:7.2f} ms", flush=True)
print(f"fused  fwd+bwd (remat): {timed(lambda v: jnp.vdot(g := jax.grad(loss_fused_remat)(v), g), x0)*1e3:7.2f} ms", flush=True)
print(f"fused  fwd+bwd (saved): {timed(lambda v: jnp.vdot(g := jax.grad(loss_fused)(v), g), x0)*1e3:7.2f} ms", flush=True)
