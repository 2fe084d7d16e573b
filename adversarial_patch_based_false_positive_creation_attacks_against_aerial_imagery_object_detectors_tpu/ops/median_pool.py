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
from jax import lax


def _same_pad_amounts(size: int, k: int, stride: int):
    if size % stride == 0:
        p = max(k - stride, 0)
    else:
        p = max(k - (size % stride), 0)
    lo = p // 2
    return lo, p - lo


def median_pool_2d(x: jnp.ndarray, k: int = 7, stride: int = 1,
                   stable: bool = True) -> jnp.ndarray:
    """Median-pool the trailing two spatial dims of ``x`` ([..., H, W]).

    ``stable=False`` sorts windows unstably: the median *value* is
    identical (stability only reorders equal keys), but the TPU backend
    then skips the s32 iota tiebreak payload it adds to stabilize sorts
    — about 2x less sort traffic. Only use it where the sort's tie
    *permutation* is never consumed (e.g. the custom-VJP fast path,
    which recomputes tie routing itself); the autodiff of the stable
    path routes tie gradients through the sort's permutation."""
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
    if stable:
        sorted_stack = jnp.sort(stack, axis=0)
    else:
        sorted_stack = lax.sort(stack, dimension=0, is_stable=False)
    return sorted_stack[(n - 1) // 2]


def median_pool_nhwc(x: jnp.ndarray, k: int = 7, stride: int = 1) -> jnp.ndarray:
    """Median-pool an NHWC (or HWC) tensor over H, W."""
    x_hw_last = jnp.moveaxis(x, -1, -3)  # [..., C, H, W]
    out = median_pool_2d(x_hw_last, k, stride)
    return jnp.moveaxis(out, -3, -1)


def _batcher_pairs(n: int):
    """Comparator pairs of Batcher's odd-even merge sort for ``n`` a
    power of two (classic iterative formulation)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (p * 2) == (i + j + k) // (p * 2):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


def median_select(windows: list) -> jnp.ndarray:
    """Exact lower median of a list of same-shaped arrays via a Batcher
    min/max selection network — no sort, no materialized [n, ...] stack.

    On TPU a stable sort of the [k*k, C, H, W] window stack costs an s32
    iota tiebreak payload plus stack materialization (~1.6 ms/step for
    the 7x7/224^2 EOT median); the network is a pure elementwise min/max
    DAG that XLA fuses and the VPU chews through in ~0.1 ms. The list is
    padded with +inf to the next power of two (padding only shifts ranks
    above the median), the full sorting network is emitted, and XLA's
    DCE prunes comparators outside output ``(n-1)//2``'s cone."""
    n = len(windows)
    m = 1
    while m < n:
        m *= 2
    vals = list(windows)
    if m > n:
        inf = jnp.full_like(windows[0], jnp.inf)
        vals += [inf] * (m - n)
    for i, j in _batcher_pairs(m):
        a, b = vals[i], vals[j]
        vals[i] = jnp.minimum(a, b)
        vals[j] = jnp.maximum(a, b)
    return vals[(n - 1) // 2]


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


def _median_net(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Stride-1 same-padded lower-median via the selection network."""
    *lead, h, w = x.shape
    pt, pb = _same_pad_amounts(h, k, 1)
    pl, pr = _same_pad_amounts(w, k, 1)
    pad_width = [(0, 0)] * len(lead) + [(pt, pb), (pl, pr)]
    xp = jnp.pad(x, pad_width, mode="reflect")
    return median_select(_windows(xp, k, h, w))


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
        # selection network: identical median values to the sort path
        # (ties only reorder equal keys); the VJP below recomputes tie
        # routing itself, so the sort's permutation is never needed
        return _median_net(x, k)

    def _fwd(x):
        med = _median_net(x, k)
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
