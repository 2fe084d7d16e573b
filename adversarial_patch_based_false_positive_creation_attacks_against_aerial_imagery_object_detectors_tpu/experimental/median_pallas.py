"""Pallas TPU kernel: k x k median filter via rank selection.

The jnp implementation sorts a [k*k, C, H, W] window stack — a generic
XLA sort. Here the window stack for one channel lives in VMEM and the
median is computed by *rank counting*: the median value is the window
element whose rank satisfies
``count_less <= (n-1)//2 < count_less + count_eq`` (exactly the element a
stable sort places at the lower-median index, ties included). That is
O(n^2) VPU compare-adds streaming from VMEM — no sort, no HBM round
trips per pass (Mosaic constraint: dynamic window selection indexes the
*leading* dim, which has no sublane-alignment requirement).

Used as the forward of the median pool on TPU; the backward stays the
scatter-free shifted-adds custom VJP (median_pool.py), which recomputes
selection independently, so the forward implementation choice does not
affect gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.median_pool import _same_pad_amounts


def _median_kernel(win_ref, out_ref, *, n: int, oh: int, ow: int):
    mid = (n - 1) // 2

    def outer(kk, med):
        wk = win_ref[0, kk]

        def inner(j, cnt):
            less, eq = cnt
            wj = win_ref[0, j]
            return (less + (wj < wk).astype(jnp.int32),
                    eq + (wj == wk).astype(jnp.int32))

        less, eq = jax.lax.fori_loop(
            0, n, inner,
            (jnp.zeros((oh, ow), jnp.int32),
             jnp.zeros((oh, ow), jnp.int32)))
        is_med = (less <= mid) & (less + eq > mid)
        return jnp.where(is_med, wk, med)

    out_ref[0] = jax.lax.fori_loop(
        0, n, outer, jnp.full((oh, ow), -jnp.inf, jnp.float32))


def median_pool_2d_pallas(x: jnp.ndarray, k: int = 7,
                          interpret: bool = False) -> jnp.ndarray:
    """Stride-1 "same" median pool of ``x`` [..., H, W] (float32)."""
    *lead, h, w = x.shape
    pt, pb = _same_pad_amounts(h, k, 1)
    pl_, pr = _same_pad_amounts(w, k, 1)
    xp = jnp.pad(x.astype(jnp.float32),
                 [(0, 0)] * len(lead) + [(pt, pb), (pl_, pr)],
                 mode="reflect")
    xp = xp.reshape(-1, h + pt + pb, w + pl_ + pr)
    c = xp.shape[0]
    n = k * k
    windows = jnp.stack(
        [xp[:, di:di + h, dj:dj + w]
         for di in range(k) for dj in range(k)], axis=1)  # [C, n, H, W]
    kernel = functools.partial(_median_kernel, n=n, oh=h, ow=w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        grid=(c,),
        in_specs=[pl.BlockSpec((1, n, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(windows)
    return out.reshape(*lead, h, w).astype(x.dtype)
