"""Planar-Pallas fast path for the YOLOv3 stem (layers 0-5).

Replaces the five slowest convs of the victim forward (measured 1.6-18
TF/s under XLA NHWC at 608^2, ~10 ms of a 32 ms train step at batch 8)
with the planar kernels from ``ops.planar_conv`` (~5.4 ms), fusing the
block-1 shortcut into conv3's epilogue. Activations stay planar across
the whole stem; one transpose in at C=3 (trivial) and one out at C=128
(lane-dense) — measured ~0.1 ms round trip.

The backward is hand-written and runs entirely on the planar kernels
over the saved planar activations (leaky's input sign is recoverable
from its output sign, so no pre-activations are stored): stride-1/1x1
input-grads are flipped-kernel planar convs; stride-2 input-grads are
zero-interleave (one lax.pad) + the same stride-1 kernel, the exact
adjoint of the forward's conv-then-decimate formulation; leaky masks
are fused into the conv epilogues (``gate``). It matches jax.grad of
the NHWC reference chain to test tolerance.

Only the patch (network input) is ever differentiated in this framework
(reference train_patch.py:131 optimizes patch pixels only), so the
parameter cotangents returned are symbolic zeros.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..ops.planar_conv import (expand2_planar, from_planar,
                               from_planar_auto, planar_conv, to_planar,
                               to_planar_auto)

# layer indices of the stem in the yolov3 block list and their conv
# geometry: (k, stride, fused_residual_from)
STEM_CONVS = (0, 1, 2, 3, 5)


def stem_applicable(net, params, x_shape) -> bool:
    """Layers 0..5 must match conv(3,s1)+conv(3,s2)+conv(1)+conv(3)+
    shortcut(1)+conv(3,s2), leaky, BN-folded, square input divisible by
    32, and nothing outside the stem may consume outputs 0..4."""
    if len(net.layers) < 6:
        return False
    kinds = [l.kind for l in net.layers[:6]]
    if kinds != ["convolutional"] * 4 + ["shortcut", "convolutional"]:
        return False
    convs = [net.layers[i].conv for i in (0, 1, 2, 3, 5)]
    geom = [(c.size, c.stride) for c in convs]
    if geom != [(3, 1), (3, 2), (1, 1), (3, 1), (3, 2)]:
        return False
    if any(c.activation != "leaky" for c in convs):
        return False
    if net.layers[4].shortcut_from != 1:
        return False
    # nothing OUTSIDE the stem may consume the stem's internals
    for l in net.layers[6:]:
        if any(s < 5 for s in l.route_from) or -1 < l.shortcut_from < 5:
            return False
    if any("gamma" in params.get(f"conv_{i}", {}) for i in STEM_CONVS):
        return False
    b, h, w, c = x_shape
    return (c == 3 and h == w and h % 32 == 0 and h >= 64
            and (h // 4) % 8 == 0)


def _stem_params(params, compute_dtype):
    out = []
    for i in STEM_CONVS:
        p = params[f"conv_{i}"]
        out.append((p["w"].astype(compute_dtype),
                    p["b"].astype(jnp.float32)))
    return out


def _forward(x, sp, interpret=False):
    """x: NHWC [B,H,W,3] in compute dtype. Returns planar activations
    (y0, y1, y2, y3, y5)."""
    (w0, b0), (w1, b1), (w2, b2), (w3, b3), (w5, b5) = sp
    xp = to_planar_auto(x, c_pad=8)
    y0 = planar_conv(xp, w0, b0, k=3, interpret=interpret)
    y1 = planar_conv(y0, w1, b1, k=3, stride=2, interpret=interpret)
    y2 = planar_conv(y1, w2, b2, k=1, interpret=interpret)
    # shortcut kept OUT of the conv3 kernel: the backward recovers
    # leaky's input sign from the conv output, which must be
    # pre-residual. The planar add is lane-dense and cheap in XLA.
    y3 = planar_conv(y2, w3, b3, k=3, interpret=interpret)
    y4 = y3 + y1
    y5 = planar_conv(y4, w5, b5, k=3, stride=2, interpret=interpret)
    return y0, y1, y2, y3, y5


def _leaky_bwd_planar(gp, yp):
    """Planar-layout leaky backward: zero borders stay zero (g's
    borders are zero and multiply keeps them so)."""
    return gp * jnp.where(yp > 0, 1.0, 0.1).astype(gp.dtype)


def _flip_t(w):
    """HWIO kernel of the input-gradient conv: spatial flip + ci<->co."""
    return jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)


def _pad_cout(w, m=8):
    extra = (-w.shape[-1]) % m
    if extra:
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, extra),))
    return w


@jax.custom_vjp
def planar_stem(x, sp):
    """NHWC [B,H,W,3] -> NHWC [B,H/4,W/4,cout] via the planar kernels.
    ``sp``: list of (w_hwio, bias) for convs 0,1,2,3,5 (BN-folded).
    ``cout`` comes from conv 5's weights (128 on yolov3-dota;
    stem_applicable admits any channel ladder of the same geometry)."""
    _, _, _, _, y5 = _forward(x, sp)
    return from_planar_auto(y5, x.shape[1] // 4, sp[-1][0].shape[-1])


def _stem_fwd(x, sp):
    y0, y1, y2, y3, y5 = _forward(x, sp)
    out = from_planar_auto(y5, x.shape[1] // 4, sp[-1][0].shape[-1])
    return out, (x, sp, y0, y1, y2, y3, y5)


def _stem_bwd(resid, g5, interpret=False):
    """Fully planar backward — every input-cotangent is a planar Pallas
    conv. Stride-1/1x1 input-grads use flipped+transposed kernels
    directly; the two stride-2 input-grads use the exact adjoint of the
    forward kernels' own formulation (conv_s1 then even-index
    decimation): zero-interleave rows/cols (``expand2_planar``, one
    lax.pad) then the same stride-1 kernel. The big leaky-backward masks
    (y2, y1, y0) are fused into the producing conv's epilogue via the
    ``gate`` operand; only the small y5/y3 masks remain XLA elementwise.
    (The previous mixed planar/XLA chain lost ~2 ms/step at b8 to
    batch-minor layout copies around XLA's lhs-dilated s2 grads and the
    unfused masks — measured in ROADMAP.md.)"""
    x, sp, y0, y1, y2, y3, y5 = resid
    (w0, _), (w1, _), (w2, _), (w3, _), (w5, _) = sp
    h = x.shape[1]

    def zb(w):  # zero bias for cotangent convs
        return jnp.zeros(w.shape[-1], jnp.float32)

    # conv5 (s2): pre-act sign from y5 at decimated resolution (the
    # zero-interleaved positions carry zero cotangent either way)
    gp5 = _leaky_bwd_planar(to_planar_auto(g5), y5)
    w5t = _flip_t(w5)
    g_sc = planar_conv(expand2_planar(gp5, h // 4), w5t, zb(w5t),
                       k=3, slope=None, interpret=interpret)
    # shortcut output feeds conv3's branch and (residually) y1; g_sc is
    # consumed raw twice, so its mask cannot be epilogue-fused
    gp3 = _leaky_bwd_planar(g_sc, y3)               # y3 is pre-residual
    w3t = _flip_t(w3)
    gp2 = planar_conv(gp3, w3t, zb(w3t), k=3, slope=None, gate=y2,
                      interpret=interpret)
    w2t = _flip_t(w2)
    gp1 = planar_conv(gp2, w2t, zb(w2t), res=g_sc, k=1, slope=None,
                      gate=y1, interpret=interpret)
    # conv1 (s2) input-grad, with y0's leaky mask fused
    w1t = _flip_t(w1)
    gp0 = planar_conv(expand2_planar(gp1, h // 2), w1t, zb(w1t),
                      k=3, slope=None, gate=y0, interpret=interpret)
    w0t = _pad_cout(_flip_t(w0))                    # cout 3 -> 8 aligned
    g_x0p = planar_conv(gp0, w0t, zb(w0t), k=3, slope=None,
                        interpret=interpret)
    g_x0 = from_planar_auto(g_x0p, h, 3)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, sp)
    return g_x0, zeros


planar_stem.defvjp(_stem_fwd, _stem_bwd)
