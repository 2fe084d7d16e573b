#!/usr/bin/env python
"""Per-layer conv micro-benchmark on the current device.

Times forward and input-gradient (the patch-attack backward only needs
dL/dx, never dL/dW) for each distinct conv shape in the YOLOv3-DOTA
front end, plus representative residual-tower shapes. Dependency-chained
inside one jitted scan; a single scalar fetch per series (honest timing
through the axon relay, see ROADMAP).

Usage: python tools/conv_micro.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16


def conv(x, w, stride):
    pad = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed(fn, x, iters=30):
    @jax.jit
    def run(x):
        def body(x, _):
            y = fn(x)
            # serialize via a negligible real dependence (0*y can be
            # algebraically simplified; 1e-30*y cannot)
            s = (y.reshape(-1)[0]).astype(x.dtype)
            return x + s * jnp.asarray(1e-30, x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x.reshape(-1)[0]
    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    out = float(run(x))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(out)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    key = jax.random.PRNGKey(0)
    shapes = [
        # (name, H, Cin, Cout, k, stride)
        ("conv0  608^2 3->32 k3s1", 608, 3, 32, 3, 1),
        ("conv1  608^2 32->64 k3s2", 608, 32, 64, 3, 2),
        ("conv2  304^2 64->32 k1s1", 304, 64, 32, 1, 1),
        ("conv3  304^2 32->64 k3s1", 304, 32, 64, 3, 1),
        ("conv5  304^2 64->128 k3s2", 304, 64, 128, 3, 2),
        ("res152 152^2 128->128 k3", 152, 128, 128, 3, 1),
        ("res76  76^2 256->256 k3", 76, 256, 256, 3, 1),
        ("res38  38^2 512->512 k3", 38, 512, 512, 3, 1),
    ]
    print(f"batch={b} dtype={DT.__name__} dev={jax.devices()[0]}")
    total_f = total_g = 0.0
    for name, h, cin, cout, k, s in shapes:
        kx, kw, key = jax.random.split(key, 3)
        x = jax.random.normal(kx, (b, h, h, cin), DT)
        w = jax.random.normal(kw, (k, k, cin, cout), DT) * 0.1

        tf = timed(lambda x: conv(x, w, s), x)
        # input-grad: vjp w.r.t. x only (patch-only backprop)
        ho = h // s
        cot = jax.random.normal(key, (b, ho, ho, cout), DT)
        def in_grad(x):
            _, vjp = jax.vjp(lambda x_: conv(x_, w, s), x)
            return vjp(cot)[0]
        tg = timed(in_grad, x)

        flops = 2 * b * ho * ho * cout * cin * k * k
        print(f"{name:28s} fwd {tf*1e3:7.3f} ms ({flops/tf/1e12:5.1f} TF/s)"
              f"   dx {tg*1e3:7.3f} ms ({flops/tg/1e12:5.1f} TF/s)")
        total_f += tf
        total_g += tg
    print(f"{'sum':28s} fwd {total_f*1e3:7.3f} ms"
          f"            dx {total_g*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
