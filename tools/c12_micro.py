#!/usr/bin/env python
"""Kernel-level decomposition of the conv12-widened stage backward
(the c12 A/B post-mortem): times, at the given batch, each piece the
end-to-end step A/B composes —

  - res152_fused_grad   (g11-fed saved-mask stage backward, round 3)
  - XLA conv12 dgrad    (the stride-2 input cotangent the widening
                         pulled in-kernel)
  - res152_fused_grad12 (g12-fed widened backward = conv12-dx chained
                         into the stage chain in one pallas_call)
  - res152_fused fwd    (save=True, identical in both variants)

Dependency-chained device-side with one scalar fetch per series
(relay-honest, same pattern as tools/conv_micro.py).

Usage: python tools/c12_micro.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import res_fused as RF
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops.planar_conv import to_planar
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import (
    enable_compile_cache)

enable_compile_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
H, C, S = 152, 128, 8
DT = jnp.bfloat16


def timed(fn, x, *rest, iters=20):
    """All arrays are jit ARGUMENTS (closed-over jnp arrays would be
    inlined as HLO literal constants — the b24 int8 masks alone are
    ~100 MB, overflowing the remote-compile relay's request limit)."""
    @jax.jit
    def run(x, *rest):
        def body(x, _):
            y = fn(x, *rest)
            s = (y.reshape(-1)[0]).astype(x.dtype)
            return x + s * jnp.asarray(1e-30, x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x.reshape(-1)[0]

    float(run(x, *rest))
    t0 = time.perf_counter()
    out = float(run(x, *rest))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(out)
    return dt * 1e3


def main():
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, DT)

    sp = [
        (mk((1, 1, C, C // 2)), mk((C // 2,), 0.01).astype(jnp.float32)),
        (mk((3, 3, C // 2, C)), mk((C,), 0.01).astype(jnp.float32)),
        (mk((1, 1, C, C // 2)), mk((C // 2,), 0.01).astype(jnp.float32)),
        (mk((3, 3, C // 2, C)), mk((C,), 0.01).astype(jnp.float32)),
    ]
    w12 = mk((3, 3, C, 2 * C))
    fwd_ops, bwd12_ops = RF.res12_weights(sp, w12, dtype=DT)
    bwd_ops = bwd12_ops[1:]

    xp = to_planar(jnp.asarray(rng.standard_normal((B, H, H, C)), DT))
    y11p, *masks = RF.res152_fused(xp, fwd_ops, s=S, wq=H, save=True)
    masks = tuple(masks)
    g11p = to_planar(jnp.asarray(rng.standard_normal((B, H, H, C)), DT))
    gp12 = to_planar(
        jnp.asarray(rng.standard_normal((B, H // 2, H // 2, 2 * C)), DT))

    t_fwd = timed(lambda x, ops: RF.res152_fused(x, ops, s=S, wq=H,
                                                 save=True)[0],
                  xp, fwd_ops)
    t_bwd = timed(lambda g, m, ops: RF.res152_fused_grad(g, m, ops,
                                                         s=S, wq=H),
                  g11p, masks, bwd_ops)
    t_bwd12 = timed(lambda g, m, ops: RF.res152_fused_grad12(
        g, m, ops, s=S, wq=H), gp12, masks, bwd12_ops)

    # XLA's own conv12 dgrad on NHWC (what the unwidened path pays)
    g12n = jnp.asarray(rng.standard_normal((B, H // 2, H // 2, 2 * C)), DT)
    xn = jnp.asarray(rng.standard_normal((B, H, H, C)), DT)

    def c12(x):
        return jax.lax.conv_general_dilated(
            x, w12, (2, 2), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def c12_dx(g, x):
        _, vjp = jax.vjp(c12, x)
        return vjp(g)[0]

    t_xla12 = timed(c12_dx, g12n, xn)

    print(f"b{B} 152^2 stage, bf16, s={S}:")
    print(f"  fused fwd (save)        {t_fwd:7.3f} ms")
    print(f"  fused bwd  g11-fed      {t_bwd:7.3f} ms")
    print(f"  fused bwd  g12-widened  {t_bwd12:7.3f} ms")
    print(f"  XLA conv12 dgrad        {t_xla12:7.3f} ms")
    print(f"  widened - (g11 + xla12) {t_bwd12 - t_bwd - t_xla12:+7.3f} ms")


if __name__ == "__main__":
    main()
