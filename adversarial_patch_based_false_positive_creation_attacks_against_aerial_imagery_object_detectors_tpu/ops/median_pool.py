"""Differentiable median filter (the EOT stack's patch smoother).

Semantics match the reference's MedianPool2d (median_pool.py:8-52): reflect
padding computed by the "same" rule, k x k windows at the given stride, and
the *lower* median of the k*k window (torch.median picks the lower of the
two middle elements for even counts; for k=7 the count is odd so it's the
exact median). Gradient flows to the selected element only, matching
torch's subgradient choice.

TPU-first implementation: instead of unfold (materializing a [.., k, k]
window tensor and a generic sort), we build the k*k shifted views of the
padded image (static Python loop, fused by XLA into a single elementwise
DAG) and take the median across that leading axis. For the common k=7 the
windows tensor is [49, C, H, W] -- tiny for a 224^2 patch (7 MB) and fully
vectorized on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _same_pad_amounts(size: int, k: int, stride: int):
    if size % stride == 0:
        p = max(k - stride, 0)
    else:
        p = max(k - (size % stride), 0)
    lo = p // 2
    return lo, p - lo


def median_pool_2d(x: jnp.ndarray, k: int = 7, stride: int = 1) -> jnp.ndarray:
    """Median-pool the trailing two spatial dims of ``x`` ([..., H, W])."""
    *lead, h, w = x.shape
    pt, pb = _same_pad_amounts(h, k, stride)
    pl, pr = _same_pad_amounts(w, k, stride)
    pad_width = [(0, 0)] * len(lead) + [(pt, pb), (pl, pr)]
    xp = jnp.pad(x, pad_width, mode="reflect")
    oh = (h + pt + pb - k) // stride + 1
    ow = (w + pl + pr - k) // stride + 1
    windows = []
    for di in range(k):
        for dj in range(k):
            sl = xp[..., di:di + (oh - 1) * stride + 1:stride,
                    dj:dj + (ow - 1) * stride + 1:stride]
            windows.append(sl)
    stack = jnp.stack(windows, axis=0)  # [k*k, ..., oh, ow]
    # torch.median returns the lower middle element: index (n-1)//2 of the
    # sorted window. jnp.median averages the two middles for even n, so
    # sort explicitly and pick the lower median to match.
    n = k * k
    sorted_stack = jnp.sort(stack, axis=0)
    return sorted_stack[(n - 1) // 2]


def median_pool_nhwc(x: jnp.ndarray, k: int = 7, stride: int = 1) -> jnp.ndarray:
    """Median-pool an NHWC (or HWC) tensor over H, W."""
    x_hw_last = jnp.moveaxis(x, -1, -3)  # [..., C, H, W]
    out = median_pool_2d(x_hw_last, k, stride)
    return jnp.moveaxis(out, -3, -1)
