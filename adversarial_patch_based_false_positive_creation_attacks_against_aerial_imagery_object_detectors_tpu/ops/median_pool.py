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


# ---------------------------------------------------------------------------
# custom-VJP fast path (stride 1)
# ---------------------------------------------------------------------------
#
# The autodiff backward of sort routes the cotangent through a scatter —
# slow on TPU. The median's subgradient only needs the *selected element's*
# position: we recompute the k*k shifted windows, pick the same element the
# stable sort picked (the ((n-1)//2 - #less)-th tied occurrence), and
# accumulate the cotangent with k*k static shifted adds plus a static
# reflect-padding fold. No scatter, fully fusible.

def _windows(xp: jnp.ndarray, k: int, oh: int, ow: int):
    return [xp[..., di:di + oh, dj:dj + ow]
            for di in range(k) for dj in range(k)]


def _reflect_fold(dpad: jnp.ndarray, h: int, w: int, pt: int, pb: int,
                  pl: int, pr: int) -> jnp.ndarray:
    """Adjoint of reflect padding: fold border cotangents back inside."""
    rows = dpad[..., pt:pt + h, :]
    if pt:
        rows = rows.at[..., 1:pt + 1, :].add(
            jnp.flip(dpad[..., :pt, :], axis=-2))
    if pb:
        rows = rows.at[..., h - 1 - pb:h - 1, :].add(
            jnp.flip(dpad[..., pt + h:, :], axis=-2))
    out = rows[..., :, pl:pl + w]
    if pl:
        out = out.at[..., :, 1:pl + 1].add(
            jnp.flip(rows[..., :, :pl], axis=-1))
    if pr:
        out = out.at[..., :, w - 1 - pr:w - 1].add(
            jnp.flip(rows[..., :, pl + w:], axis=-1))
    return out


def median_pool_2d_fast(x: jnp.ndarray, k: int = 7) -> jnp.ndarray:
    """``median_pool_2d`` (stride 1) with a scatter-free custom VJP whose
    subgradient choice matches the sort-based autodiff exactly."""

    @jax.custom_vjp
    def _mp(x):
        return median_pool_2d(x, k, 1)

    def _fwd(x):
        med = median_pool_2d(x, k, 1)
        return med, (x, med)

    def _bwd(res, g):
        x, med = res
        *lead, h, w = x.shape
        pt, pb = _same_pad_amounts(h, k, 1)
        pl, pr = _same_pad_amounts(w, k, 1)
        pad_width = [(0, 0)] * len(lead) + [(pt, pb), (pl, pr)]
        xp = jnp.pad(x, pad_width, mode="reflect")
        wins = _windows(xp, k, h, w)
        # occurrence index the stable sort selected among ties
        n_mid = (k * k - 1) // 2
        less = sum((wv < med).astype(jnp.int32) for wv in wins)
        target = n_mid - less + 1          # 1-based tied-occurrence rank
        csum = jnp.zeros_like(less)
        dpad = jnp.zeros(xp.shape, x.dtype)
        for idx, wv in enumerate(wins):
            di, dj = divmod(idx, k)
            eq = wv == med
            csum = csum + eq.astype(jnp.int32)
            sel = eq & (csum == target)
            contrib = jnp.where(sel, g, 0.0)
            pads = ([(0, 0)] * len(lead)
                    + [(di, xp.shape[-2] - h - di),
                       (dj, xp.shape[-1] - w - dj)])
            dpad = dpad + jnp.pad(contrib, pads)
        return (_reflect_fold(dpad, h, w, pt, pb, pl, pr),)

    _mp.defvjp(_fwd, _bwd)
    return _mp(x)


def median_pool_nhwc_fast(x: jnp.ndarray, k: int = 7) -> jnp.ndarray:
    x_hw_last = jnp.moveaxis(x, -1, -3)
    out = median_pool_2d_fast(x_hw_last, k)
    return jnp.moveaxis(out, -3, -1)
