"""Expectation-over-transformation patch pipeline (train mode).

Functional, fully batched rewrite of the reference's ``PatchTransformer``
(load_data.py:414-794) + ``PatchApplier`` (load_data.py:797-833):

  median-pool(7x7) -> per-sample contrast/brightness/uniform-noise ->
  clamp -> random rotation U(-pi, pi) -> scale from a reference box ->
  random center -> one inverse-affine warp -> clamp -> mask -> composite.

TPU-first differences (outputs equal to the reference's, see tests):

- No 608^2 zero-padded canvas is materialized and no second whole-canvas
  warp for the mask: the warp samples the 224 patch directly with a pad
  offset and returns the in-bounds weight sum as the mask
  (``ops.affine.affine_sample`` — bilinear+zeros is translation
  equivariant, so this is exact).
- The per-sample Python loops are replaced by vectorized reductions; the
  reference-box selection (``lab_transform``, load_data.py:453-509) is one
  argmax/argmin + ``where``.
- Randomness is an explicit ``jax.random`` key (reference: global torch
  RNG), so a training run is exactly reproducible.

Deliberately replicated reference quirks (behavior of record):

- The "smallest" labeled box used in the reference-box average is almost
  always a 1e-6 padding row (DotaDataset pads labels with 1e-6,
  load_data.py:968-978), so the selected box is ~half the largest box.
- The patch target size uses *columns 2 and 3* of the averaged 5-col
  label row — i.e. the y-center and width (load_data.py:654-668), not
  width/height. ``size_cols=(3, 4)`` gives the (w, h) variant.
- Empty scenes (all-ones label sentinel, area > 0.99) fall back to a
  0.25-valued dummy row.
- The random center is clamped as x = max(U, 0.2), y = min(U, 0.8)
  (load_data.py:693-707): x in [0.2, 1), y in (0, 0.8].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.affine import (
    affine_sample_fast, rotation_scale_translation_theta)
from ..ops.affine_mxu import affine_warp_mxu
from ..ops.median_pool import median_pool_nhwc_fast


@dataclasses.dataclass(frozen=True)
class EOTConfig:
    img_size: int = 608
    scale_factor: float = 2.0        # SCALE_FACTOR, load_data.py:32
    min_contrast: float = 0.8
    max_contrast: float = 1.2
    min_brightness: float = -0.1
    max_brightness: float = 0.1
    noise_factor: float = 0.10
    min_angle: float = -math.pi
    max_angle: float = math.pi
    do_rotate: bool = True
    photometric: bool = True         # eval mode disables jitter
    median_kernel: int = 7
    size_cols: Tuple[int, int] = (2, 3)  # reference behavior; (3,4) = w,h
    center_clamp: Tuple[float, float] = (0.2, 0.8)
    warp_method: str = "mxu"             # "mxu" | "gather" (see warp_patch)
    # dtype of the geometric half (warp matmuls + canvas-size temps +
    # composite). None keeps the patch dtype (f32 — exact eval paths);
    # "bfloat16" halves the step's 608^2-canvas HBM traffic and is what
    # the detector consumes anyway. Interpolation-matrix ARGUMENTS are
    # always computed in f32 (bf16 cannot index 608 pixel positions);
    # only the hat weights / pixel values are stored narrow.
    warp_dtype: Optional[str] = None


def select_reference_box(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample reference row: mean of the largest- and smallest-area
    label rows, or a 0.25 dummy for empty scenes. labels: [B, L, 5]
    (cls, x, y, w, h normalized). Returns [B, 5]."""
    area = labels[..., 3] * labels[..., 4]              # [B, L]
    max_idx = jnp.argmax(area, axis=1)
    min_idx = jnp.argmin(area, axis=1)
    take = lambda idx: jnp.take_along_axis(
        labels, idx[:, None, None], axis=1)[:, 0]       # [B, 5]
    selected = (take(max_idx) + take(min_idx)) / 2.0
    empty = jnp.max(area, axis=1) > 0.99                # all-ones sentinel
    return jnp.where(empty[:, None], 0.25, selected)


def patch_scale_and_center(labels: jnp.ndarray, key: jax.Array,
                           patch_size: int, cfg: EOTConfig):
    """Random patch center (pixels) and per-sample warp zoom factor."""
    ref = select_reference_box(labels)                  # [B, 5]
    c0, c1 = cfg.size_cols
    half = cfg.img_size / cfg.scale_factor
    target_size = jnp.sqrt((ref[:, c0] * half) ** 2
                           + (ref[:, c1] * half) ** 2)  # [B]
    scale = target_size / patch_size

    kx, ky = jax.random.split(key)
    b = labels.shape[0]
    tx = jnp.maximum(jax.random.uniform(kx, (b,)), cfg.center_clamp[0])
    ty = jnp.minimum(jax.random.uniform(ky, (b,)), cfg.center_clamp[1])
    centers = jnp.stack([tx, ty], axis=1) * cfg.img_size  # [B, 2] (x, y) px
    return scale, centers, tx, ty


def photometric_jitter(patch: jnp.ndarray, key: jax.Array, batch: int,
                       cfg: EOTConfig) -> jnp.ndarray:
    """Per-sample contrast/brightness plus per-pixel uniform noise.
    patch: [P, P, 3] -> [B, P, P, 3], clamped to [0, 1]."""
    kc, kb, kn = jax.random.split(key, 3)
    contrast = jax.random.uniform(
        kc, (batch, 1, 1, 1), minval=cfg.min_contrast,
        maxval=cfg.max_contrast)
    brightness = jax.random.uniform(
        kb, (batch, 1, 1, 1), minval=cfg.min_brightness,
        maxval=cfg.max_brightness)
    noise = cfg.noise_factor * jax.random.uniform(
        kn, (batch, *patch.shape), minval=-1.0, maxval=1.0)
    out = patch[None] * contrast + brightness + noise
    return jnp.clip(out, 0.0, 1.0)


def warp_patch(batch_patch: jnp.ndarray, angle: jnp.ndarray,
               scale: jnp.ndarray, tx: jnp.ndarray, ty: jnp.ndarray,
               img_size: int, method: str = "mxu"):
    """Geometric half of the EOT: place per-sample patches
    [B, P, P, 3] onto the image canvas at normalized centers (tx, ty)
    with the given rotation/zoom. Returns (adv, mask).

    ``method``: "mxu" (default) uses the matmul-factored warp
    (ops.affine_mxu — MXU fwd+bwd, exact for axis-aligned transforms,
    small sheared-interpolation residual under rotation); "gather" uses
    the exact grid_sample-parity bilinear gather with the windowed-gather
    custom VJP.
    """
    p = batch_patch.shape[1]
    theta = rotation_scale_translation_theta(
        angle, scale, (0.5 - tx) * 2.0, (0.5 - ty) * 2.0)
    pad = (img_size - p) // 2
    if method == "mxu":
        warped, mask = affine_warp_mxu(
            batch_patch, theta, (img_size, img_size),
            src_hw=(img_size, img_size), offset=(pad, pad))
    else:
        warped, mask = affine_sample_fast(
            batch_patch, theta, (img_size, img_size),
            src_hw=(img_size, img_size), offset=(pad, pad),
            window=max_zoom_window(img_size, p))
    return jnp.clip(warped, 0.0, 1.0) * mask, mask


def max_zoom_window(img_size: int, patch_size: int,
                    scale_factor: float = 2.0) -> int:
    """Backward-gather window covering the worst-case EOT zoom: target
    size <= sqrt(2)*img/scale_factor, so zoom <= that / patch_size and
    the window needs ceil(zoom*sqrt(2)) + 1 output pixels of slack."""
    max_zoom = math.sqrt(2.0) * img_size / (scale_factor * patch_size)
    return int(math.ceil(max_zoom * math.sqrt(2.0))) + 1


def transform_patch(patch: jnp.ndarray, labels: jnp.ndarray, key: jax.Array,
                    cfg: EOTConfig = EOTConfig()):
    """EOT-transform ``patch`` [P, P, 3] for a batch of scenes.

    Returns ``(adv [B, S, S, 3], mask [B, S, S, 1], centers [B, 2])`` where
    ``adv`` is the clamped warped patch (already mask-multiplied) on the
    image canvas and ``centers`` are the patch pixel centers (x, y) used by
    the creation losses' cell extraction.
    """
    p = patch.shape[0]
    s = cfg.img_size
    b = labels.shape[0]
    k_jit, k_geom, k_angle = jax.random.split(key, 3)

    smoothed = median_pool_nhwc_fast(patch, cfg.median_kernel)
    if cfg.photometric:
        batch_patch = photometric_jitter(smoothed, k_jit, b, cfg)
    else:
        batch_patch = jnp.broadcast_to(
            jnp.clip(smoothed, 0.0, 1.0)[None], (b, p, p, 3))

    scale, centers, tx, ty = patch_scale_and_center(
        labels, k_geom, p, cfg)
    if cfg.do_rotate:
        angle = jax.random.uniform(
            k_angle, (b,), minval=cfg.min_angle, maxval=cfg.max_angle)
    else:
        angle = jnp.zeros((b,))

    if cfg.warp_dtype is not None:
        batch_patch = batch_patch.astype(jnp.dtype(cfg.warp_dtype))
    adv, mask = warp_patch(batch_patch, angle, scale, tx, ty, s,
                           method=cfg.warp_method)
    return adv, mask, centers


def paste_patch(images: jnp.ndarray, adv: jnp.ndarray) -> jnp.ndarray:
    """Composite: exact-zero adv pixels are transparent (the reference's
    ``torch.where(adv == 0, img, adv)`` contract, load_data.py:820).
    Runs in ``adv``'s dtype: under a narrow ``warp_dtype`` the composite
    and everything downstream (the detector consumes bf16 anyway) stay
    narrow instead of re-widening the 608^2 canvas."""
    return jnp.where(adv == 0.0, images.astype(adv.dtype), adv)


def apply_eot_patch(patch: jnp.ndarray, images: jnp.ndarray,
                    labels: jnp.ndarray, key: jax.Array,
                    cfg: EOTConfig = EOTConfig()):
    """Fused transform + composite. images: [B, S, S, 3] in [0, 1].
    Returns (patched images, patch centers [B, 2])."""
    adv, _, centers = transform_patch(patch, labels, key, cfg)
    return paste_patch(images, adv), centers
