"""Eval-time patch placement with interference avoidance.

Reference: ``PatchTransformer_test_mode`` (load_data.py:1233-1722). At
test time the patch must land where it does NOT overlap any existing
detection, so the metrics count *created* objects only:

1. median-pool the patch; **no** photometric jitter (load_data.py:1487
   commented out); clamp;
2. rotation limited to +-90 deg (test_mode=True, load_data.py:1254-1259);
3. reference box from the 7-col (conf 0.01) labels — mean of largest and
   smallest area rows, 0.25 dummy when the scene has exactly one label
   row or the all-ones sentinel (load_data.py:1295-1318);
4. stage-1 warp: rotation+scale only; the warped mask's row extent gives
   the patch's bounding half-edge (load_data.py:1650-1664);
5. an occupancy map marks borders and every labeled box dilated by that
   half-edge, filling smallest-area boxes first with the reference's
   early-termination rules (``inter_axis_cal``, load_data.py:1322-1430);
6. a random free pixel becomes the patch center; stage-2 warp translates
   the patch there; clamp, multiply by the mask.

The occupancy map and center draw are host-side numpy (inherently
sequential, data-dependent); the two warps run through the exact
grid_sample-parity gather path.

Deliberately replicated quirks: the occupancy map indexes rows with the
label *x*-center and columns with *y* (load_data.py:1406), and the chosen
free pixel's row becomes target_x (load_data.py:1686) — the same x/y swap
as the trainer's cell extraction, self-consistent end to end. The
reference's ``random.randint(0, len(free))`` can index one past the end;
we draw in [0, len(free)) instead.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.affine import affine_sample, rotation_scale_translation_theta
from ..ops.median_pool import median_pool_nhwc_fast


@dataclasses.dataclass(frozen=True)
class EvalEOTConfig:
    img_size: int = 608
    scale_factor: float = 2.0
    max_angle: float = math.pi / 2      # test_mode: +-90 deg
    median_kernel: int = 7


def select_reference_box_7col(labels: np.ndarray) -> np.ndarray:
    """labels [L, 7] -> [7] reference row (load_data.py:1295-1318).
    Non-finite rows (exp-overflow detections from untrained victims) are
    treated as zero-area."""
    if len(labels) == 1:
        return np.full(7, 0.25, np.float32)
    labels = np.nan_to_num(labels, nan=0.0, posinf=0.0, neginf=0.0)
    area = labels[:, 2] * labels[:, 3]
    if area.max() > 0.99:
        return np.full(7, 0.25, np.float32)
    sel = (labels[area.argmax()] + labels[area.argmin()]) / 2.0
    return sel.astype(np.float32)


def interference_map(labels: np.ndarray, semi_edge: float,
                     img_size: int) -> np.ndarray:
    """Occupancy map over the canvas (inter_axis_cal parity, including
    the early-termination layer-dropping rules). labels: [L, 7]
    normalized. Returns [S, S] float; free cells are exactly 0.
    Uses the native C++ kernel when available."""
    from ..utils import native
    # exp-overflow detections (untrained victims) would overflow the
    # integer box fills; treat them as zero-size
    labels = np.nan_to_num(labels, nan=0.0, posinf=0.0, neginf=0.0)
    out = native.interference_map(labels, semi_edge, img_size)
    if out is not None:
        return out
    se = int(semi_edge)
    labs = labels * img_size
    order = np.argsort(labs[:, 2] * labs[:, 3], kind="stable")
    n = len(labs)
    layers = np.zeros((n, img_size, img_size), np.float32)
    if se > 0:
        layers[:, :se, :] = 1
        layers[:, -se:, :] = 1
        layers[:, :, :se] = 1
        layers[:, :, -se:] = 1
    for i in range(n):
        if not (layers.sum(axis=0) == 0).any():
            return layers[0:i - 1].sum(axis=0)
        row = labs[order[i]]
        cx, cy, w, h = row[0], row[1], row[2], row[3]
        # reference quirk: rows indexed by x-center, cols by y-center
        r0, r1 = int(cx - w / 2 - se), int(cx + w / 2 + se)
        c0, c1 = int(cy - h / 2 - se), int(cy + h / 2 + se)
        layers[i, max(r0, 0):max(r1, 0), max(c0, 0):max(c1, 0)] = 1
    total = layers.sum(axis=0)
    if not (total == 0).any():
        return layers[0:n - 1].sum(axis=0)
    return total


def mask_semi_edge(mask: np.ndarray) -> float:
    """Half the row-extent of the warped mask (load_data.py:1650-1664)."""
    rows = np.nonzero(mask[..., 0] == 1.0)[0]
    if len(rows) == 0:
        rows = np.nonzero(mask[..., 0] > 0)[0]
    if len(rows) == 0:
        return 0.0
    return float(rows.max() - rows.min()) / 2.0


def transform_patch_eval(patch: jnp.ndarray, labels: np.ndarray,
                         rng: np.random.Generator,
                         cfg: EvalEOTConfig = EvalEOTConfig()
                         ) -> Tuple[np.ndarray, Tuple[float, float]]:
    """Place ``patch`` [P, P, 3] on one scene with labels [L, 7].

    Returns (adv [S, S, 3] masked warped patch, (target_x, target_y)
    normalized center). Composite with ``paste_patch``.
    """
    s = cfg.img_size
    p = patch.shape[0]
    smoothed = jnp.clip(
        median_pool_nhwc_fast(patch, cfg.median_kernel), 0.0, 1.0)[None]

    ref = select_reference_box_7col(labels)
    half = s / cfg.scale_factor
    target_size = math.sqrt((ref[2] * half) ** 2 + (ref[3] * half) ** 2)
    # Degenerate-label guard: zero-area reference rows (e.g. a label
    # file whose every detection is exp-overflow garbage from an
    # untrained victim, sanitized to zero by select_reference_box_7col)
    # give scale 0, and unlike the reference's FORWARD affine_grid our
    # inverse-affine warp would invert a singular matrix into a NaN
    # canvas. Clamp to a visible floor; sane label sets are unaffected.
    scale = min(max(target_size / p, 1e-2), s / p)
    angle = float(rng.uniform(-cfg.max_angle, cfg.max_angle))

    # stage 1: rotation + scale about the canvas center
    theta1 = rotation_scale_translation_theta(
        jnp.asarray([angle]), jnp.asarray([scale], jnp.float32),
        jnp.zeros(1), jnp.zeros(1))
    pad = (s - p) // 2
    stage1, mask1 = affine_sample(
        smoothed, theta1, (s, s), src_hw=(s, s), offset=(pad, pad),
        with_mask=True)
    mask_np = np.asarray(mask1[0])
    semi_edge = mask_semi_edge(mask_np)

    occupancy = interference_map(labels, semi_edge, s)
    free = np.argwhere(occupancy == 0)
    if len(free) == 0:
        free = np.array([[s // 2, s // 2]])
    pick = free[rng.integers(0, len(free))]
    target_x = float(pick[0]) / s        # row -> x (reference quirk)
    target_y = float(pick[1]) / s

    # stage 2: pure translation of the stage-1 canvas
    theta2 = jnp.asarray(
        [[[1.0, 0.0, (0.5 - target_x) * 2.0],
          [0.0, 1.0, (0.5 - target_y) * 2.0]]], jnp.float32)
    stage2 = affine_sample(stage1, theta2, (s, s))
    mask2 = affine_sample(mask1, theta2, (s, s))
    adv = np.asarray(jnp.clip(stage2, 0.0, 1.0) * mask2)[0]
    return adv, (target_x, target_y)
