"""Batched inverse-affine bilinear warp (PyTorch parity, gather-based).

Replaces the reference's ``F.affine_grid`` + ``F.grid_sample`` pair
(load_data.py:745-749) with a single fused source-coordinate + gather op:

- output-pixel normalized coords follow ``align_corners=False``:
  ``x_n = (2j + 1)/W - 1``;
- the 2x3 ``theta`` maps output normalized coords to *source* normalized
  coords (inverse warp, exactly the affine_grid contract);
- sampling is bilinear with ``padding_mode="zeros"``.

A key TPU-first fusion: the reference zero-pads the 224 patch onto a 608
canvas and warps the whole canvas (plus a second whole-canvas warp for the
all-ones mask). Because bilinear sampling with zero padding is translation
equivariant, warping the padded canvas equals sampling the *unpadded*
patch at ``canvas_coord - pad_offset`` — and the warped mask is simply the
sum of bilinear weights whose taps land inside the patch. ``affine_sample``
therefore samples the small patch directly and returns the mask for free,
removing two 608^2 canvas materializations and one full warp per step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def output_grid_coords(out_hw: Tuple[int, int], dtype=jnp.float32):
    """Normalized align_corners=False output coords: x_n [ow], y_n [oh]."""
    oh, ow = out_hw
    x_n = (2.0 * jnp.arange(ow, dtype=dtype) + 1.0) / ow - 1.0
    y_n = (2.0 * jnp.arange(oh, dtype=dtype) + 1.0) / oh - 1.0
    return x_n, y_n


def affine_source_coords(theta: jnp.ndarray, out_hw: Tuple[int, int],
                         src_hw: Tuple[int, int]):
    """Source *pixel* coords (ix, iy), each [B, oh, ow], for a batch of
    2x3 affines ``theta`` [B, 2, 3] in normalized-coordinate convention."""
    oh, ow = out_hw
    sh, sw = src_hw
    x_n, y_n = output_grid_coords(out_hw, theta.dtype)
    xg = x_n[None, None, :]                      # [1,1,ow]
    yg = y_n[None, :, None]                      # [1,oh,1]
    t = theta[:, :, :, None, None]               # [B,2,3,1,1]
    xs = t[:, 0, 0] * xg + t[:, 0, 1] * yg + t[:, 0, 2]   # [B,oh,ow]
    ys = t[:, 1, 0] * xg + t[:, 1, 1] * yg + t[:, 1, 2]
    # normalized -> pixel (align_corners=False)
    ix = ((xs + 1.0) * sw - 1.0) * 0.5
    iy = ((ys + 1.0) * sh - 1.0) * 0.5
    return ix, iy


def bilinear_gather(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
                    with_mask: bool = False):
    """Bilinear-sample ``img`` [B, H, W, C] at pixel coords ``ix, iy``
    [B, oh, ow] with zero padding. Returns [B, oh, ow, C] (and the
    in-bounds bilinear weight-sum mask [B, oh, ow, 1] if requested)."""
    b, h, w, c = img.shape
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    fx = ix - ix0
    fy = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy

    flat = img.reshape(b, h * w, c)

    def tap(iyk, ixk, wk):
        valid = ((ixk >= 0) & (ixk < w) & (iyk >= 0) & (iyk < h))
        idx = (jnp.clip(iyk, 0, h - 1) * w
               + jnp.clip(ixk, 0, w - 1)).reshape(b, -1)
        vals = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
        vals = vals.reshape(*ixk.shape, c)
        wv = (wk * valid).astype(img.dtype)
        return vals * wv[..., None], wv

    v00, m00 = tap(iy0, ix0, w00)
    v01, m01 = tap(iy0, ix1, w01)
    v10, m10 = tap(iy1, ix0, w10)
    v11, m11 = tap(iy1, ix1, w11)
    out = v00 + v01 + v10 + v11
    if with_mask:
        mask = (m00 + m01 + m10 + m11)[..., None]
        return out, mask
    return out


def affine_sample(img: jnp.ndarray, theta: jnp.ndarray,
                  out_hw: Tuple[int, int],
                  src_hw: Optional[Tuple[int, int]] = None,
                  offset: Tuple[float, float] = (0.0, 0.0),
                  with_mask: bool = False):
    """Warp ``img`` [B, H, W, C] by per-sample inverse affines ``theta``
    [B, 2, 3].

    ``src_hw`` is the virtual source-space size theta's normalized coords
    refer to (defaults to img's H, W); ``offset = (off_y, off_x)`` shifts
    source pixel coords before indexing ``img`` — set it to the canvas pad
    to emulate warping a zero-padded canvas without materializing it.
    """
    if src_hw is None:
        src_hw = img.shape[1:3]
    ix, iy = affine_source_coords(theta, out_hw, src_hw)
    ix = ix - offset[1]
    iy = iy - offset[0]
    return bilinear_gather(img, ix, iy, with_mask=with_mask)


def _block_gather(img: jnp.ndarray, iy_start: jnp.ndarray,
                  ix_start: jnp.ndarray, block: Tuple[int, int]
                  ) -> jnp.ndarray:
    """Gather [bh, bw, C] blocks from ``img`` [H, W, C] at per-point start
    indices (each [N]). One lax.gather with a multi-element slice — far
    better DMA granularity on TPU than per-tap row gathers (the gathered
    unit is bh*bw*C contiguous-ish elements instead of C)."""
    starts = jnp.stack([iy_start, ix_start], axis=-1)  # [N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        img, starts, dnums,
        slice_sizes=(block[0], block[1], img.shape[2]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _hat(d: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _bilinear_block_sample(img: jnp.ndarray, ix: jnp.ndarray,
                           iy: jnp.ndarray):
    """Forward bilinear sample via one 2x2-block gather per output pixel.

    img: [B, H, W, C]; ix, iy: [B, oh, ow] pixel coords. Exactly equal to
    ``bilinear_gather`` (zeros padding); returns (out, mask)."""
    b, h, w, c = img.shape
    _, oh, ow = ix.shape
    padded = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ix = jnp.where(jnp.isfinite(ix), ix, -1e6)
    iy = jnp.where(jnp.isfinite(iy), iy, -1e6)
    iy0 = jnp.clip(jnp.floor(iy), -1.0, float(h - 1))
    ix0 = jnp.clip(jnp.floor(ix), -1.0, float(w - 1))
    sy = (iy0.astype(jnp.int32) + 1).reshape(b, -1)   # [B, N] in [0, h]
    sx = (ix0.astype(jnp.int32) + 1).reshape(b, -1)

    blocks = jax.vmap(lambda im, y, x: _block_gather(im, y, x, (2, 2)))(
        padded, sy, sx)                               # [B, N, 2, 2, C]
    blocks = blocks.reshape(b, oh, ow, 2, 2, c)

    # tap positions: rows iy0 + {0,1}, cols ix0 + {0,1}
    wy = jnp.stack([_hat(iy - iy0), _hat(iy - iy0 - 1.0)], -1)  # [B,oh,ow,2]
    wx = jnp.stack([_hat(ix - ix0), _hat(ix - ix0 - 1.0)], -1)
    wgt = wy[..., :, None] * wx[..., None, :]                   # [B,oh,ow,2,2]
    out = jnp.einsum("bhwyx,bhwyxc->bhwc", wgt, blocks)
    # mask: weight mass of taps that hit *real* (unpadded) pixels
    vy = jnp.stack([(iy0 >= 0) & (iy0 <= h - 1),
                    (iy0 + 1 >= 0) & (iy0 + 1 <= h - 1)], -1)
    vx = jnp.stack([(ix0 >= 0) & (ix0 <= w - 1),
                    (ix0 + 1 >= 0) & (ix0 + 1 <= w - 1)], -1)
    valid = (vy[..., :, None] & vx[..., None, :]).astype(img.dtype)
    mask = jnp.sum(wgt * valid, axis=(-1, -2))[..., None]
    return out, mask


def _affine_pixel_coeffs(theta: jnp.ndarray, out_hw: Tuple[int, int],
                         src_hw: Tuple[int, int],
                         offset: Tuple[float, float]):
    """Source pixel coords as an explicit affine of output pixel coords:
    ix = a11*ox + a12*oy + b1 ; iy = a21*ox + a22*oy + b2. Returns the six
    per-sample coefficients (each [B])."""
    oh, ow = out_hw
    sh, sw = src_hw
    t = theta
    a11 = t[:, 0, 0] * (sw / ow)
    a12 = t[:, 0, 1] * (sw / oh)
    a21 = t[:, 1, 0] * (sh / ow)
    a22 = t[:, 1, 1] * (sh / oh)
    xn0 = 1.0 / ow - 1.0
    yn0 = 1.0 / oh - 1.0
    xs0 = t[:, 0, 0] * xn0 + t[:, 0, 1] * yn0 + t[:, 0, 2]
    ys0 = t[:, 1, 0] * xn0 + t[:, 1, 1] * yn0 + t[:, 1, 2]
    b1 = ((xs0 + 1.0) * sw - 1.0) * 0.5 - offset[1]
    b2 = ((ys0 + 1.0) * sh - 1.0) * 0.5 - offset[0]
    return a11, a12, a21, a22, b1, b2


def affine_sample_bwd_window(img_shape, theta, out_hw, src_hw, offset,
                             g_out: jnp.ndarray, window: int) -> jnp.ndarray:
    """Exact adjoint of the bilinear affine warp as a *gather*.

    The autodiff adjoint of the forward gather is a scatter-add over the
    whole output canvas — pathologically slow on TPU. But the bilinear
    weight of patch pixel p in output pixel o is hat(ix(o)-px)*hat(iy(o)-py)
    and ix, iy are affine in o, so the output pixels contributing to p lie
    in a bounded window around the *inverse-affine* image of p. We gather
    a static (2*window+1)^2 neighbourhood of g_out per patch pixel and
    accumulate the same hat weights — exact as long as
    ``window >= ceil(max_zoom * sqrt(2)) + 1`` (max_zoom = output pixels
    per patch pixel).
    """
    b, h, w, c = img_shape
    oh, ow = out_hw
    a11, a12, a21, a22, b1, b2 = _affine_pixel_coeffs(
        theta, out_hw, src_hw, offset)
    det = a11 * a22 - a12 * a21
    safe_det = jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    i11 = a22 / safe_det
    i12 = -a12 / safe_det
    i21 = -a21 / safe_det
    i22 = a11 / safe_det

    px = jnp.arange(w, dtype=g_out.dtype)[None, None, :]   # [1,1,w]
    py = jnp.arange(h, dtype=g_out.dtype)[None, :, None]   # [1,h,1]
    rx = px - b1[:, None, None]                            # [B,h,w]
    ry = py - b2[:, None, None]
    ox0 = i11[:, None, None] * rx + i12[:, None, None] * ry
    oy0 = i21[:, None, None] * rx + i22[:, None, None] * ry
    ox0 = jnp.where(jnp.isfinite(ox0), ox0, -1e6)
    oy0 = jnp.where(jnp.isfinite(oy0), oy0, -1e6)
    k = 2 * window + 1
    # block start (padded coords): clamp so the K-slice stays in bounds;
    # weights are computed from the *fetched* positions, so clamping far-
    # away bases is safe (their hats evaluate to 0).
    sy = jnp.clip(jnp.floor(oy0).astype(jnp.int32), 0, oh - 1)  # [B,h,w]
    sx = jnp.clip(jnp.floor(ox0).astype(jnp.int32), 0, ow - 1)

    g_pad = jnp.pad(g_out, ((0, 0), (window, window), (window, window),
                            (0, 0)))
    blocks = jax.vmap(
        lambda gp, y, x: _block_gather(gp, y, x, (k, k)))(
        g_pad, sy.reshape(b, -1), sx.reshape(b, -1))
    blocks = blocks.reshape(b, h, w, k, k, c)

    # fetched out coords: y = sy + r - window, x = sx + s - window
    r_off = jnp.arange(k, dtype=g_out.dtype) - window
    oy_f = sy.astype(g_out.dtype)[..., None] + r_off          # [B,h,w,K]
    ox_f = sx.astype(g_out.dtype)[..., None] + r_off
    # src coords are affine in (ox, oy): separate the two contributions
    bc = lambda v: v[:, None, None, None, None]               # [B,1,1,1,1]
    ix_f = (bc(a11) * ox_f[..., None, :] + bc(a12) * oy_f[..., :, None]
            + bc(b1))                                         # [B,h,w,K,K]
    iy_f = (bc(a21) * ox_f[..., None, :] + bc(a22) * oy_f[..., :, None]
            + bc(b2))
    wgt = _hat(ix_f - px[..., None, None]) * _hat(iy_f - py[..., None, None])
    # out-of-canvas rows/cols were zero-padded, so no validity mask needed
    return jnp.einsum("bhwyx,bhwyxc->bhwc", wgt, blocks)


def affine_sample_fast(img: jnp.ndarray, theta: jnp.ndarray,
                       out_hw: Tuple[int, int],
                       src_hw: Optional[Tuple[int, int]] = None,
                       offset: Tuple[float, float] = (0.0, 0.0),
                       window: int = 4):
    """``affine_sample(..., with_mask=True)`` with a custom VJP: forward is
    the same gather; backward w.r.t. ``img`` is the windowed inverse-affine
    gather above (no scatter). ``theta`` is treated as non-differentiable
    (EOT geometry is random, never optimized) — its gradient is zero.
    """
    src = tuple(src_hw) if src_hw is not None else img.shape[1:3]

    @jax.custom_vjp
    def _sample(img, theta):
        ix, iy = affine_source_coords(theta, out_hw, src)
        return _bilinear_block_sample(img, ix - offset[1], iy - offset[0])

    def _fwd(img, theta):
        return _sample(img, theta), (img.shape, theta)

    def _bwd(res, g):
        img_shape, theta = res
        g_out, _ = g   # mask does not depend on img
        d_img = affine_sample_bwd_window(
            img_shape, theta, out_hw, src, offset, g_out, window)
        return d_img, jnp.zeros_like(theta)

    _sample.defvjp(_fwd, _bwd)
    return _sample(img, theta)


def rotation_scale_translation_theta(angle: jnp.ndarray, scale: jnp.ndarray,
                                     tx: jnp.ndarray, ty: jnp.ndarray
                                     ) -> jnp.ndarray:
    """The reference's EOT affine (load_data.py:734-743): inverse map
    combining rotation by ``angle``, zoom by ``scale``, and translation
    such that the patch center lands at normalized target offset
    (tx, ty) = ((0.5 - x)*2, (0.5 - y)*2). All args are [B]."""
    sin, cos = jnp.sin(angle), jnp.cos(angle)
    inv = 1.0 / scale
    row0 = jnp.stack([cos * inv, sin * inv, (tx * cos + ty * sin) * inv], -1)
    row1 = jnp.stack([-sin * inv, cos * inv, (-tx * sin + ty * cos) * inv], -1)
    return jnp.stack([row0, row1], axis=1)  # [B, 2, 3]
