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
