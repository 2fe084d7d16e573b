#!/usr/bin/env python
"""Prototype + A/B: stride-2 conv input-cotangent via polyphase
decomposition (4 half-res NHWC convs + depth-to-space interleave) vs
XLA autodiff's lhs-dilated conv.

The lhs-dilated formulation convolves a zero-interleaved (4x area, 75%
zeros) image with the full 3x3 kernel — 4x the forward FLOPs. The
polyphase form computes each output-parity class with its own sub-kernel
(1x1 / 1x2 / 2x1 / 2x2 taps) at HALF resolution — exactly forward FLOPs,
on channel-rich NHWC convs the MXU tiles well — then interleaves with
two stack+reshape layout passes.

Usage: python tools/s2dx_poly_ab.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
DT = jnp.bfloat16
ITERS = 20


def conv_s2(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2dx_xla(g, w, xshape):
    """XLA's own adjoint (lhs-dilated conv)."""
    fn = lambda v: conv_s2(v, w)
    return jax.linear_transpose(
        fn, jax.ShapeDtypeStruct(xshape, g.dtype))(g)[0]


def s2dx_poly(g, w, xshape):
    """Polyphase adjoint.

    fwd: y[i,j] = sum_{dy,dx} w[dy,dx] x[2i+dy-1, 2j+dx-1]  (pad 1)
    adj: dx[2a+rp, 2b+rq] uses dy with (rp+1-dy) even, i=(2a+rp+1-dy)/2:
      rp=0: dy=1, i=a
      rp=1: dy=0 -> i=a+1 ; dy=2 -> i=a
    and same for columns. Each parity class is a small conv of g (padded
    by 1 at the high edge) with transposed taps.
    """
    h, wd = xshape[1], xshape[2]
    cin = w.shape[2]
    # wt[dy][dx]: [cout, cin] matrices (channel-transposed taps)
    wt = w.astype(g.dtype)

    def tap(dy, dx, ga):
        # contract channels: ga [B,Ha,Wa,cout] @ w[dy,dx,cin,cout]^T
        return jnp.einsum("bhwo,io->bhwi", ga, wt[dy, dx],
                          preferred_element_type=jnp.float32)

    gp = jnp.pad(g, ((0, 0), (0, 1), (0, 1), (0, 0)))
    g00 = gp[:, :-1, :-1]   # g[a, b]
    g01 = gp[:, :-1, 1:]    # g[a, b+1]
    g10 = gp[:, 1:, :-1]    # g[a+1, b]
    g11 = gp[:, 1:, 1:]     # g[a+1, b+1]

    ee = tap(1, 1, g00)                      # dx[2a, 2b]
    eo = tap(1, 0, g01) + tap(1, 2, g00)     # dx[2a, 2b+1]
    oe = tap(0, 1, g10) + tap(2, 1, g00)     # dx[2a+1, 2b]
    oo = (tap(0, 0, g11) + tap(0, 2, g10)
          + tap(2, 0, g01) + tap(2, 2, g00))  # dx[2a+1, 2b+1]

    ha, wa = g.shape[1], g.shape[2]
    even = jnp.stack([ee, eo], axis=3).reshape(B, ha, 2 * wa, cin)
    odd = jnp.stack([oe, oo], axis=3).reshape(B, ha, 2 * wa, cin)
    out = jnp.stack([even, odd], axis=2).reshape(B, 2 * ha, 2 * wa, cin)
    return out[:, :h, :wd].astype(g.dtype)


def s2dx_poly_conv(g, w, xshape):
    """Same math, but each parity class as one conv over a sub-kernel
    (single conv call per class instead of 1-4 einsums)."""
    h, wd = xshape[1], xshape[2]
    cin = w.shape[2]
    wr = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
    # wr[ky,kx] = w[2-ky, 2-kx]^T ; dx = conv(g_dilated, wr) pad 1.
    # Parity sub-kernels of wr: rows ky with (rp+1-(2-ky)) even etc. —
    # equivalently from the derivation:
    #   rp=0 row taps: dy=1 -> wr row 1 ; rp=1: dy=0 -> wr row 2 (on
    #   g[a+1]) and dy=2 -> wr row 0 (on g[a]).
    def sub(dys, dxs):
        # kernel [len(dys), len(dxs), cout, cin] convolving g padded so
        # index a+1 is available; dys/dxs given in (g-offset, w-index)
        k = jnp.stack([jnp.stack([wt for (_, wt) in
                                  [(ox, wr[2 - dy, 2 - dx])
                                   for (ox, dx) in dxs]], axis=0)
                       for (_, dy) in dys], axis=0)
        return k

    def conv(ga, k):
        return lax.conv_general_dilated(
            ga, k, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    gp = jnp.pad(g, ((0, 0), (0, 1), (0, 1), (0, 0)))
    # taps ordered by g offset ascending (conv slides ascending)
    row_e = [(0, 1)]               # (g row offset a+0, dy)
    row_o = [(0, 2), (1, 0)]       # offsets a+0 (dy=2), a+1 (dy=0)
    col_e = [(0, 1)]
    col_o = [(0, 2), (1, 0)]

    def make(rows, cols):
        # wr[a, b] = w[2-a, 2-b]^T is [cout, cin]; swap to [cin?]: HWIO
        # wants I=cout (g's channels), O=cin (x's channels) -> use
        # w[dy, dx] directly: [cin, cout] -> transpose to [cout, cin]
        k = jnp.stack([jnp.stack([w[dy, dx].T.astype(g.dtype)
                                  for (_, dx) in cols], axis=0)
                       for (_, dy) in rows], axis=0)
        kh, kw = len(rows), len(cols)
        ga = gp[:, :g.shape[1] + kh - 1, :g.shape[2] + kw - 1]
        return conv(ga, k)

    ee = make(row_e, col_e)
    eo = make(row_e, col_o)
    oe = make(row_o, col_e)
    oo = make(row_o, col_o)
    ha, wa = g.shape[1], g.shape[2]
    even = jnp.stack([ee, eo], axis=3).reshape(B, ha, 2 * wa, cin)
    odd = jnp.stack([oe, oo], axis=3).reshape(B, ha, 2 * wa, cin)
    out = jnp.stack([even, odd], axis=2).reshape(B, 2 * ha, 2 * wa, cin)
    return out[:, :h, :wd].astype(g.dtype)


def timed(fn, *args):
    @jax.jit
    def run(*a):
        def body(c, _):
            o = fn(*a[:-1], c) if False else fn(*a)
            return c, jnp.sum(o.astype(jnp.float32))
        _, outs = lax.scan(body, a[0], None, length=ITERS)
        return outs[-1]
    float(run(*args))
    t0 = time.perf_counter()
    out = float(run(*args))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(out)
    return dt


def chain_timed(fn, g, w, xshape):
    """Scan-chain on g so iterations are serialized."""
    @jax.jit
    def run(g):
        def body(g, _):
            o = fn(g, w, xshape)
            # fold a scalar of o back into g to serialize
            return g + jnp.sum(o.astype(g.dtype)) * jnp.asarray(1e-30, g.dtype), ()
        g, _ = lax.scan(body, g, None, length=ITERS)
        return jnp.sum(g.astype(jnp.float32))
    float(run(g))
    t0 = time.perf_counter()
    out = float(run(g))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(out)
    return dt


CASES = [
    # (name, H_in, cin, cout) for the 5 darknet s2 convs
    ("s2 608^2  32-> 64", 608, 32, 64),
    ("s2 304^2  64->128", 304, 64, 128),
    ("s2 152^2 128->256", 152, 128, 256),
    ("s2  76^2 256->512", 76, 256, 512),
    ("s2  38^2 512->1024", 38, 512, 1024),
]


def main():
    print(f"batch={B} dev={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    for name, h, cin, cout in CASES:
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.float32)
        xshape = (B, h, h, cin)
        g = jnp.asarray(rng.standard_normal((B, h // 2, h // 2, cout)),
                        DT)
        # correctness (f32, small-tol vs oracle) — on-device, scalar fetch
        @jax.jit
        def errs(g32):
            want = s2dx_xla(g32, w, xshape)
            den = jnp.abs(want).max() + 1e-9
            e1 = jnp.abs(s2dx_poly(g32, w, xshape) - want).max() / den
            e2 = jnp.abs(s2dx_poly_conv(g32, w, xshape) - want).max() / den
            return e1, e2
        err, err2 = (float(v) for v in errs(g.astype(jnp.float32)))
        wb = w.astype(DT)
        t_xla = chain_timed(s2dx_xla, g, wb, xshape)
        t_poly = chain_timed(s2dx_poly, g, wb, xshape)
        t_pc = chain_timed(s2dx_poly_conv, g, wb, xshape)
        print(f"{name}: xla {t_xla*1e3:6.2f} ms | poly-einsum "
              f"{t_poly*1e3:6.2f} ms | poly-conv {t_pc*1e3:6.2f} ms "
              f"(relerr {err:.1e}/{err2:.1e})", flush=True)


if __name__ == "__main__":
    main()
