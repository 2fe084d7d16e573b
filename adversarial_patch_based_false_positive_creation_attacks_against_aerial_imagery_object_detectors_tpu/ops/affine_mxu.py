"""MXU-native affine warp: two 1-D interpolation matmul passes.

TPU gathers are slow (poor vectorization, pathological tiled layouts for
small minor dims) and their autodiff adjoint is a scatter — worse. This
module instead factors the inverse-affine bilinear warp into two 1-D
linear resamplings expressed as (batched) matmuls:

    src = A @ out + t,  A = [[a, b], [c, d]]
        = X @ Y with X = [[det/d, b/d], [0, 1]],  Y = [[1, 0], [c, d]]

    pass X:  mid[y, X]  = sum_x hat(p*X + q*y + u1 - x) * img[y, x]
    pass Y:  out[Y, X]  = sum_y hat(c*X + d*Y + v2 - y) * mid[y, X]

with hat(t) = max(0, 1-|t|). Both passes (and their transposes in the
backward pass) are dense matmuls on the MXU; the interpolation matrices
are built from iota arithmetic on the VPU. When ``|d| < |b|`` the factor
is ill-conditioned (rotations near +-90 deg), so the source image is
transposed per sample and the coefficient rows swapped — a free relayout,
never a branch.

Semantics: zeros padding outside the source, per-tap linear weights — for
axis-aligned transforms this is *exactly* the bilinear warp
(grid_sample parity); for rotated transforms it is a sheared tensor-
product interpolation whose output differs from 2-D bilinear by a small
resampling residual (see tests for bounds). The EOT's random geometry
makes the training objective an expectation over transforms, so this
residual shifts nothing systematically, and it buys a ~50x faster
backward than the exact gather/scatter formulation.

The mask (warped all-ones canvas, the reference's
``grid_sample(ones)``, load_data.py:749) falls out of the same matmuls
via an appended ones channel.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .affine import _affine_pixel_coeffs


def _hat(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


# byte budget for one interpolation-matrix chunk (fp32 elements =
# bytes/4); bounds the peak [B, y_chunk, ow, w] hat-matrix temp. Wider
# chunks mean fewer pass-X strips for XLA's strip concatenate to
# pad+add together — profiled at b24/608^2, the 12-strip default-256MB
# concatenate cost ~1.3 ms of pad_add fusions and 1 GB (3 strips)
# measured 73.9 -> 71.6 ms/step with b8 unchanged (ROADMAP round 5);
# ADV_PATCH_WARP_CHUNK_MB overrides for A/B or smaller-HBM parts.
_CHUNK_BUDGET = int(os.environ.get("ADV_PATCH_WARP_CHUNK_MB", "1024")
                    ) * 1024 * 1024 // 4


def affine_warp_mxu(img: jnp.ndarray, theta: jnp.ndarray,
                    out_hw: Tuple[int, int],
                    src_hw: Optional[Tuple[int, int]] = None,
                    offset: Tuple[float, float] = (0.0, 0.0)):
    """Warp square ``img`` [B, P, P, C] by per-sample affines ``theta``
    (affine_grid convention; non-differentiable). Returns
    (out [B, oh, ow, C], mask [B, oh, ow, 1]).
    """
    theta = jax.lax.stop_gradient(theta)
    b, h, w, c = img.shape
    assert h == w, "MXU warp requires a square source (patches are square)"
    oh, ow = out_hw
    src = tuple(src_hw) if src_hw is not None else (h, w)
    a11, a12, a21, a22, b1, b2 = _affine_pixel_coeffs(
        theta, out_hw, src, offset)

    # per-sample conditioning swap: transpose source, swap coefficient rows
    swap = jnp.abs(a12) > jnp.abs(a22)
    sel = lambda p, q: jnp.where(swap, q, p)
    A11, A12, B1 = sel(a11, a21), sel(a12, a22), sel(b1, b2)
    A21, A22, B2 = sel(a21, a11), sel(a22, a12), sel(b2, b1)
    img_t = jnp.where(swap[:, None, None, None],
                      jnp.swapaxes(img, 1, 2), img)

    # ones channel rides along to produce the mask
    ones = jnp.ones((b, h, w, 1), img.dtype)
    x4 = jnp.concatenate([img_t, ones], axis=-1)        # [B, h, w, C+1]

    d = A22
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    det = A11 * A22 - A12 * A21
    p = det / safe_d
    q = A12 / safe_d
    u1 = B1 - q * B2

    f32 = jnp.float32
    xs = jnp.arange(w, dtype=f32)
    ys = jnp.arange(h, dtype=f32)
    Xs = jnp.arange(ow, dtype=f32)
    Ys = jnp.arange(oh, dtype=f32)

    # ---- pass X: [B, h, ow, C+1] = M1 @ img rows, chunked over y ----------
    # M1[b, y, X, x] = hat(p X + q y + u1 - x)
    y_chunk = max(8, min(h, _CHUNK_BUDGET // max(b * ow * w, 1)))
    mids = []
    for y0 in range(0, h, y_chunk):
        yc = ys[y0:y0 + y_chunk]
        argx = (p[:, None, None] * Xs[None, None, :]
                + q[:, None, None] * yc[None, :, None]
                + u1[:, None, None])                     # [B, yc, ow]
        m1 = _hat(argx[..., None] - xs)                  # [B, yc, ow, w]
        mids.append(jnp.einsum(
            "byXx,byxc->byXc", m1.astype(img.dtype),
            x4[:, y0:y0 + y_chunk]))
    mid = jnp.concatenate(mids, axis=1)                  # [B, h, ow, C+1]

    # ---- pass Y: [B, oh, ow, C+1], chunked over output columns -----------
    # M2[b, X, Y, y] = hat(r X + s Y + v2 - y),  r = A21, s = A22, v2 = B2
    x_chunk = max(8, min(ow, _CHUNK_BUDGET // max(b * oh * h, 1)))
    outs = []
    for x0 in range(0, ow, x_chunk):
        xc = Xs[x0:x0 + x_chunk]
        arg = (A21[:, None, None] * xc[None, :, None]
               + A22[:, None, None] * Ys[None, None, :]
               + B2[:, None, None])                      # [B, cw, oh]
        m2 = _hat(arg[..., None] - ys)                   # [B, cw, oh, h]
        outs.append(jnp.einsum(
            "bXYy,byXc->bYXc", m2.astype(img.dtype),
            mid[:, :, x0:x0 + x_chunk, :]))
    out4 = jnp.concatenate(outs, axis=2)                 # [B, oh, ow, C+1]
    return out4[..., :c], out4[..., c:]
