"""Creation-attack losses, jit-differentiable.

Covers the reference's loss stack:

- cell extraction of objectness/class scores at the patch's grid cell on
  all three scales (``obj_cls_conf_find`` + reshapers,
  train_patch.py:428-524) — here one batched gather instead of per-image
  Python loops (which forced device syncs in the reference);
- the creation objective ``no_obj = 4 * (1 - mean(max_9 obj))``
  (train_patch.py:230-239);
- targeted class CE over softmax of the *sigmoided* class scores
  (train_patch.py:526-548 — the reference feeds probabilities to
  CrossEntropyLoss; replicated), and the margin variant
  (train_patch.py:550-577);
- non-printability score (load_data.py:340-389), total variation
  (load_data.py:392-411), Hasler-Süsstrunk colorfulness
  (load_data.py:1724-1754);
- whole-image max obj/cls extraction (MaxProbExtractor,
  load_data.py:125-337) for the legacy vanishing-attack recipes.

Deliberately replicated quirk: the reference's cell index is
``floor(center_x/stride) * S + floor(center_y/stride)``
(train_patch.py:461-467) while the head's flat layout is row-major
``y * S + x`` — i.e. the extracted cell has its x/y *swapped*. Default
``swap_xy=True`` reproduces this; pass ``False`` for the geometrically
faithful cell.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Patch-regularization losses
# ---------------------------------------------------------------------------

def nps_loss(patch: jnp.ndarray, printable_colors: jnp.ndarray) -> jnp.ndarray:
    """Non-printability score. patch [P, P, 3]; colors [K, 3].

    Per pixel: min over the K printable colors of
    sqrt(sum_c (p - c + 1e-6)^2 + 1e-6); summed, divided by patch numel.
    """
    diff = patch[None] - printable_colors[:, None, None, :] + 0.000001
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 0.000001)  # [K, P, P]
    return jnp.sum(jnp.min(dist, axis=0)) / patch.size


def total_variation(patch: jnp.ndarray) -> jnp.ndarray:
    """Mean |dx| + |dy| with the reference's +1e-6 inside the abs."""
    dx = jnp.abs(patch[:, 1:, :] - patch[:, :-1, :] + 0.000001)
    dy = jnp.abs(patch[1:, :, :] - patch[:-1, :, :] + 0.000001)
    return (jnp.sum(dx) + jnp.sum(dy)) / patch.size


def colorfulness(patch: jnp.ndarray) -> jnp.ndarray:
    """Hasler-Süsstrunk colorfulness (minimized for inconspicuous
    patches; arXiv 1908.08505). patch [P, P, 3] RGB. Uses the unbiased
    variance (torch.var default)."""
    r, g, b = patch[..., 0], patch[..., 1], patch[..., 2]
    rg = r - g
    yb = 0.5 * (r + g) - b
    sigma = jnp.sqrt(jnp.var(rg, ddof=1) + jnp.var(yb, ddof=1))
    mu = jnp.sqrt(jnp.mean(rg) ** 2 + jnp.mean(yb) ** 2)
    return sigma + 0.3 * mu


# ---------------------------------------------------------------------------
# Cell extraction + creation losses
# ---------------------------------------------------------------------------

def extract_cell_scores(heads: Sequence[jnp.ndarray], centers: jnp.ndarray,
                        img_size: int, num_classes: int = 15,
                        swap_xy: bool = True):
    """Sigmoided (obj, cls) scores of the patch's cell on each scale.

    heads: raw NHWC heads [B, S, S, 3*(5+C)]; centers: [B, 2] pixel (x, y).
    Returns (obj [B, 3*n_heads], cls [B, 3*n_heads, C]) in scale-major,
    anchor-minor order (matching the reference's [B, 9] / [B, 9, 15]).
    """
    objs: List[jnp.ndarray] = []
    clss: List[jnp.ndarray] = []
    batch = centers.shape[0]
    for head in heads:
        s = head.shape[1]
        stride = img_size // s
        cell = jnp.floor_divide(centers.astype(jnp.int32), stride)  # [B,2]
        cx, cy = cell[:, 0], cell[:, 1]
        row, col = (cx, cy) if swap_xy else (cy, cx)
        # one-hot contractions instead of x[bidx, row, col]: exact (one
        # 1.0*x product per output), and the TRANSPOSE is a fusible
        # broadcast-multiply instead of a scatter-add — the gather form
        # cost a [B,S,S,3,(5+C)] scatter + 5-D layout copy per step in
        # the backward (profiled b24: ~0.4 ms copy + scatter fusion).
        row_oh = (row[:, None] == jnp.arange(s)).astype(head.dtype)
        col_oh = (col[:, None] == jnp.arange(s)).astype(head.dtype)
        x = head.reshape(batch, s, s, 3 * (5 + num_classes))
        cells = jnp.einsum("brf,br->bf",
                           jnp.einsum("brcf,bc->brf", x, col_oh),
                           row_oh).reshape(batch, 3, 5 + num_classes)
        scores = jax.nn.sigmoid(cells[..., 4:])     # [B, 3, 1+C]
        objs.append(scores[..., 0])
        clss.append(scores[..., 1:])
    return (jnp.concatenate(objs, axis=1),
            jnp.concatenate(clss, axis=1))


def weighted_mean(x: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Mean of x [B] over the batch; with ``weights`` [B] (1 = real
    sample, 0 = padding) the mean runs over real samples only — used to
    pad a final non-mesh-divisible batch without biasing the loss."""
    if weights is None:
        return jnp.mean(x)
    return jnp.sum(x * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def creation_obj_loss(cell_obj: jnp.ndarray, weights=None) -> jnp.ndarray:
    """4 * (1 - mean over batch of the max objectness among the 9 cell
    anchors) — drive at least one anchor's objectness to 1."""
    return 4.0 * (1.0 - weighted_mean(jnp.max(cell_obj, axis=1), weights))


def creation_cls_ce_loss(cell_cls: jnp.ndarray, target_id: int,
                         weights=None) -> jnp.ndarray:
    """Targeted CE over the 9 anchors' class scores.

    cell_cls: [B, 9, C] *sigmoided* class scores; the reference applies
    CrossEntropyLoss (= log_softmax + NLL) directly on these
    probabilities, so we softmax the sigmoided scores. Mean over anchors,
    then mean over batch.
    """
    logp = jax.nn.log_softmax(cell_cls, axis=-1)
    return -weighted_mean(jnp.mean(logp[..., target_id], axis=1), weights)


def creation_cls_margin_loss(cell_cls: jnp.ndarray,
                             target_id: int) -> jnp.ndarray:
    """Margin variant (train_patch.py:550-577 case-2): sum over batch of
    mean over anchors of (max_class_prob - target_class_prob)."""
    diff = jnp.max(cell_cls, axis=-1) - cell_cls[..., target_id]
    return jnp.sum(jnp.mean(diff, axis=1))


def max_prob_extract(heads: Sequence[jnp.ndarray], cls_id: int,
                     num_classes: int = 15, sigmoid_mode: bool = False):
    """Whole-image max objectness and max target-class score
    (MaxProbExtractor semantics; raw logits unless ``sigmoid_mode``).

    Returns (max_obj [B], max_cls [B]).
    """
    objs, clss = [], []
    for head in heads:
        b, s, _, _ = head.shape
        x = head.reshape(b, s, s, 3, 5 + num_classes)
        obj = x[..., 4].reshape(b, -1)
        cls = x[..., 5 + cls_id].reshape(b, -1)
        if sigmoid_mode:
            obj, cls = jax.nn.sigmoid(obj), jax.nn.sigmoid(cls)
        objs.append(obj)
        clss.append(cls)
    all_obj = jnp.concatenate(objs, axis=1)
    all_cls = jnp.concatenate(clss, axis=1)
    return jnp.max(all_obj, axis=1), jnp.max(all_cls, axis=1)


def max_combined_prob(heads: Sequence[jnp.ndarray], cls_id: int, combiner,
                      num_classes: int = 15, sigmoid_mode: bool = False
                      ) -> jnp.ndarray:
    """Per-image max over all positions of ``combiner(obj, cls[cls_id])``
    — the det-loss used by the legacy vanishing recipes
    (``config.loss_target`` over the flattened 22743 positions).
    Returns [B]."""
    vals = []
    for head in heads:
        b, s, _, _ = head.shape
        x = head.reshape(b, s, s, 3, 5 + num_classes)
        obj = x[..., 4]
        cls = x[..., 5 + cls_id]
        if sigmoid_mode:
            obj, cls = jax.nn.sigmoid(obj), jax.nn.sigmoid(cls)
        vals.append(combiner(obj, cls).reshape(b, -1))
    return jnp.max(jnp.concatenate(vals, axis=1), axis=1)
