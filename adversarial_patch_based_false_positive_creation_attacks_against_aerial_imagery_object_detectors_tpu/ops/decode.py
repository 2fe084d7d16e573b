"""Raw-head -> box decode, fully vectorized.

Replaces the reference's per-cell triple Python loop
(utils.py:125-245 ``get_region_boxes``) and its normalized twin
(load_data.py:63-122 ``bbox_decode``) with one batched elementwise pass:

    x = (sigmoid(t_x) + grid_x) / S        y = (sigmoid(t_y) + grid_y) / S
    w = exp(t_w) * anchor_w / img_w        h = exp(t_h) * anchor_h / img_h
    obj = sigmoid(t_obj)                   cls = sigmoid(t_cls)

Heads are NHWC ``[B, S, S, 3*(5+C)]``; ``head.reshape(B, S, S, 3, 5+C)``
matches the torch channel order (anchor-major), so decoded values agree
with the reference elementwise. Outputs are normalized to [0, 1] image
coords (the reference decodes to pixels then divides by width/height in
``do_detect`` — algebraically identical).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def decode_head(head: jnp.ndarray, anchors: np.ndarray,
                img_size: Tuple[int, int], num_classes: int = 15):
    """Decode one raw head.

    head: [B, S, S, 3*(5+C)] raw logits (NHWC).
    anchors: [3, 2] anchor (w, h) in image pixels for this head.
    Returns (boxes [B, S*S*3, 4] normalized xywh, obj [B, S*S*3],
    cls [B, S*S*3, C] sigmoid class scores).
    """
    b, s, s2, _ = head.shape
    assert s == s2
    x = head.reshape(b, s, s, 3, 5 + num_classes)
    grid = jnp.arange(s, dtype=head.dtype)
    gx = grid[None, None, :, None]  # columns -> x
    gy = grid[None, :, None, None]  # rows    -> y
    bx = (jax.nn.sigmoid(x[..., 0]) + gx) / s
    by = (jax.nn.sigmoid(x[..., 1]) + gy) / s
    aw = jnp.asarray(anchors[:, 0], head.dtype)[None, None, None, :]
    ah = jnp.asarray(anchors[:, 1], head.dtype)[None, None, None, :]
    bw = jnp.exp(x[..., 2]) * aw / img_size[0]
    bh = jnp.exp(x[..., 3]) * ah / img_size[1]
    obj = jax.nn.sigmoid(x[..., 4])
    cls = jax.nn.sigmoid(x[..., 5:])
    boxes = jnp.stack([bx, by, bw, bh], axis=-1)
    n = s * s * 3
    return (boxes.reshape(b, n, 4), obj.reshape(b, n),
            cls.reshape(b, n, num_classes))


def decode_all_heads(heads: Sequence[jnp.ndarray], anchor_groups: np.ndarray,
                     img_size: Tuple[int, int], num_classes: int = 15):
    """Decode + concat all heads -> (boxes [B,N,4], obj [B,N], cls [B,N,C]),
    N = 3*(S1^2+S2^2+S3^2) (= 22743 at 608^2)."""
    outs = [decode_head(h, anchor_groups[i], img_size, num_classes)
            for i, h in enumerate(heads)]
    boxes = jnp.concatenate([o[0] for o in outs], axis=1)
    obj = jnp.concatenate([o[1] for o in outs], axis=1)
    cls = jnp.concatenate([o[2] for o in outs], axis=1)
    return boxes, obj, cls


def head_cell_scores(head: jnp.ndarray, num_classes: int = 15):
    """Raw per-cell (obj, cls) logits in anchor-major layout
    [B, S, S, 3], [B, S, S, 3, C] — the trainer-side view used by the
    creation losses (no decode, no sigmoid)."""
    b, s, _, _ = head.shape
    x = head.reshape(b, s, s, 3, 5 + num_classes)
    return x[..., 4], x[..., 5:]
