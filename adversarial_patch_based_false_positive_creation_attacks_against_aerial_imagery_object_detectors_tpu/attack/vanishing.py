"""Legacy vanishing-attack transformer: one patch per labeled object.

Reference: ``PatchTransformer_vanishing`` (load_data.py:985-1230). For
the classic "make the detector miss" attack, the patch is pasted over
*every* labeled box: centered at each label's (x, y), sized
diag(w, h)/8 (``pre_scale=8``, load_data.py:1116), full +-180 deg
rotation, photometric jitter unless ``test_real``, optional 'left' /
'right' horizontal offset (x -+ w/6) and optional +-0.2*w,h positional
jitter (``rand_loc``).

Output: [B, L, S, S, 3] per-label patch canvases; composite sequentially
with ``paste_vanishing``. Padding label rows (1e-6) collapse to sub-pixel
patches that vanish in the composite, exactly as in the reference.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .eot import photometric_jitter, warp_patch, EOTConfig
from ..ops.median_pool import median_pool_nhwc_fast


@dataclasses.dataclass(frozen=True)
class VanishingConfig:
    img_size: int = 608
    pre_scale: float = 8.0
    min_angle: float = -math.pi
    max_angle: float = math.pi
    do_rotate: bool = True
    rand_loc: bool = False
    orient: Optional[str] = None      # None | "left" | "right"
    test_real: bool = False           # skip photometric jitter
    median_kernel: int = 7


def transform_patch_vanishing(patch: jnp.ndarray, labels: jnp.ndarray,
                              key: jax.Array,
                              cfg: VanishingConfig = VanishingConfig()):
    """patch [P, P, 3], labels [B, L, 5] -> adv [B, L, S, S, 3]."""
    b, l, _ = labels.shape
    p = patch.shape[0]
    s = cfg.img_size
    n = b * l
    k_jit, k_angle, k_ox, k_oy = jax.random.split(key, 4)

    smoothed = median_pool_nhwc_fast(patch, cfg.median_kernel)
    if cfg.test_real:
        batch_patch = jnp.broadcast_to(
            jnp.clip(smoothed, 0.0, 1.0)[None], (n, p, p, 3))
    else:
        jcfg = EOTConfig(img_size=s)
        batch_patch = photometric_jitter(smoothed, k_jit, n, jcfg)

    flat = labels.reshape(n, labels.shape[-1])
    target_x = flat[:, 1]
    target_y = flat[:, 2]
    w = flat[:, 3]
    h = flat[:, 4]
    if cfg.rand_loc:
        target_x = target_x + w * jax.random.uniform(
            k_ox, (n,), minval=-0.2, maxval=0.2)
        target_y = target_y + h * jax.random.uniform(
            k_oy, (n,), minval=-0.2, maxval=0.2)
    if cfg.orient == "left":
        target_x = target_x - w / 6.0
    elif cfg.orient == "right":
        target_x = target_x + w / 6.0

    target_size = jnp.sqrt((w * s / cfg.pre_scale) ** 2
                           + (h * s / cfg.pre_scale) ** 2)
    scale = target_size / p
    if cfg.do_rotate:
        angle = jax.random.uniform(
            k_angle, (n,), minval=cfg.min_angle, maxval=cfg.max_angle)
    else:
        angle = jnp.zeros((n,))

    adv, _ = warp_patch(batch_patch, angle, scale, target_x, target_y, s)
    return adv.reshape(b, l, s, s, 3)


def paste_vanishing(images: jnp.ndarray, adv: jnp.ndarray) -> jnp.ndarray:
    """Sequential per-label composite (PatchApplier over the L axis)."""
    def body(img, layer):
        return jnp.where(layer == 0.0, img, layer), None
    out, _ = jax.lax.scan(body, images, jnp.moveaxis(adv, 1, 0))
    return out
