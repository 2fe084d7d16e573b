"""Space-to-depth packed stem: exact re-expression of the first two convs.

The detector's first layers — conv 3x3/1 on [608, 608, 3] then conv
3x3/2 — are layout-starved on TPU: a 3-channel minor dim is padded to
128 lanes (42x wasted reads), so these two layers cost as much as the
rest of the backbone combined. Packing the input 2x2 into channels
([B, 304, 304, 12]) and *exactly* rewriting both convs on the packed
grid fixes the layout:

- conv0 becomes four 2x2 convs over 12 channels (one per output
  sub-position), concatenated into a 4*32-channel packed activation;
- conv1 (stride 2) becomes one 2x2 stride-1 conv over those 128
  channels, landing on the normal [304, 304, 64] grid.

The rewritten kernels are scatters of the original weights (computed
from params at trace time), and the asymmetric paddings reproduce the
original zero padding exactly, so outputs match the plain layers to
float tolerance (see tests). FLOPs rise ~2x for these two layers (the
2x2 packed footprints cover more taps than the originals), but MXU/lane
utilization rises far more.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..models.darknet import ConvSpec, _activate


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel = (dy*2+dx)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _packed_kernel_conv0(w0: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Original [3, 3, C, O] kernel -> packed [2, 2, 4C, O] kernel for the
    output sub-position (dy, dx). Tap at original offset (u-1, v-1) maps
    to packed cell (pr, pc) sub (dy', dx')."""
    k, _, c, o = w0.shape
    assert k == 3
    out = jnp.zeros((2, 2, 4 * c, o), w0.dtype)
    for u in range(3):
        t = dy + u - 1
        pr, dyp = t // 2, t % 2
        ku = pr + (1 - dy)          # pad_lo = 1 - dy
        for v in range(3):
            s = dx + v - 1
            pc, dxp = s // 2, s % 2
            kv = pc + (1 - dx)
            cp = (dyp * 2 + dxp) * c
            out = out.at[ku, kv, cp:cp + c, :].add(w0[u, v])
    return out


def _packed_kernel_conv1(w1: jnp.ndarray) -> jnp.ndarray:
    """Original stride-2 [3, 3, C, O] kernel -> packed stride-1
    [2, 2, 4C, O] kernel (output grid == packed grid). The packed input
    channel layout is (dy*2+dx)*C + c (the conv0 sub-position concat)."""
    k, _, c, o = w1.shape
    assert k == 3
    out = jnp.zeros((2, 2, 4 * c, o), w1.dtype)
    for u in range(3):
        t = u - 1
        pr, dyp = t // 2, t % 2
        ku = pr + 1                  # pad_lo = 1
        for v in range(3):
            s = v - 1
            pc, dxp = s // 2, s % 2
            kv = pc + 1
            cp = (dyp * 2 + dxp) * c
            out = out.at[ku, kv, cp:cp + c, :].add(w1[u, v])
    return out


def _conv2x2(x, w, pad_r, pad_c, compute_dtype):
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=(1, 1), padding=[pad_r, pad_c],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def packed_stem_apply(x: jnp.ndarray, spec0: ConvSpec,
                      p0: Dict[str, jnp.ndarray], spec1: ConvSpec,
                      p1: Dict[str, jnp.ndarray], compute_dtype
                      ) -> jnp.ndarray:
    """Exact packed evaluation of conv0 (3x3/1) + conv1 (3x3/2) on
    BN-folded params {"w", "b"}. Returns the post-conv1 activation
    [B, H/2, W/2, O1]."""
    xp = _space_to_depth(x)
    c0 = spec0.filters
    subs = []
    for dy in range(2):
        for dx in range(2):
            kw = _packed_kernel_conv0(p0["w"], dy, dx)
            pad_r = (1 - dy, dy)
            pad_c = (1 - dx, dx)
            subs.append(_conv2x2(xp, kw, pad_r, pad_c, compute_dtype))
    y0 = jnp.concatenate(subs, axis=-1)          # [B, H/2, W/2, 4*C0]
    b0 = jnp.tile(p0["b"].astype(y0.dtype), 4)
    y0 = _activate(y0 + b0, spec0.activation)

    kw1 = _packed_kernel_conv1(p1["w"])
    y1 = _conv2x2(y0, kw1, (1, 0), (1, 0), compute_dtype)
    y1 = y1 + p1["b"].astype(y1.dtype)
    return _activate(y1, spec1.activation)


def stem_applicable(net) -> bool:
    """The packed stem applies when layers 0/1 are BN-foldable convs of
    shape 3x3/1 then 3x3/2 with a small input channel count and even
    input size."""
    if len(net.layers) < 2:
        return False
    l0, l1 = net.layers[0], net.layers[1]
    return (l0.kind == "convolutional" and l1.kind == "convolutional"
            and l0.conv.size == 3 and l0.conv.stride == 1
            and l1.conv.size == 3 and l1.conv.stride == 2
            and l0.conv.in_ch <= 8
            and net.width % 2 == 0 and net.height % 2 == 0
            and 0 not in net.saved_outputs)
