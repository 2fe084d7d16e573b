"""IoU and non-maximum suppression.

Two implementations with identical greedy semantics to the reference
(utils.py:93-112 ``nms`` with the xywh IoU of utils.py:27-58):

- ``greedy_nms_host``: numpy, variable-length — the eval/CLI path (the
  reference also runs NMS on host).
- ``greedy_nms_device``: jit-friendly fixed-size masked version (static
  ``max_det`` detections, validity mask) for fully on-device pipelines;
  TPU-compatible control flow via ``lax.fori_loop``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Jacobi-NMS pass bound before falling back to the exact serial scan
# (see greedy_nms_device); module-level so tests can pin it low and
# exercise the fallback.
JACOBI_MAX_PASSES = 32


def iou_xywh_matrix(boxes_a, boxes_b, xp=np):
    """Pairwise IoU for center-format boxes [N,4] x [M,4] -> [N,M].

    Matches the reference's union-box formulation (utils.py:38-58),
    including its behavior on degenerate boxes.
    """
    ax1 = boxes_a[:, 0] - boxes_a[:, 2] / 2.0
    ax2 = boxes_a[:, 0] + boxes_a[:, 2] / 2.0
    ay1 = boxes_a[:, 1] - boxes_a[:, 3] / 2.0
    ay2 = boxes_a[:, 1] + boxes_a[:, 3] / 2.0
    bx1 = boxes_b[:, 0] - boxes_b[:, 2] / 2.0
    bx2 = boxes_b[:, 0] + boxes_b[:, 2] / 2.0
    by1 = boxes_b[:, 1] - boxes_b[:, 3] / 2.0
    by2 = boxes_b[:, 1] + boxes_b[:, 3] / 2.0

    uw = xp.maximum(ax2[:, None], bx2[None, :]) - xp.minimum(
        ax1[:, None], bx1[None, :])
    uh = xp.maximum(ay2[:, None], by2[None, :]) - xp.minimum(
        ay1[:, None], by1[None, :])
    cw = boxes_a[:, 2][:, None] + boxes_b[:, 2][None, :] - uw
    ch = boxes_a[:, 3][:, None] + boxes_b[:, 3][None, :] - uh
    carea = xp.where((cw <= 0) | (ch <= 0), 0.0, cw * ch)
    uarea = (boxes_a[:, 2] * boxes_a[:, 3])[:, None] + (
        boxes_b[:, 2] * boxes_b[:, 3])[None, :] - carea
    return carea / uarea


def greedy_nms_host(boxes: np.ndarray, scores: np.ndarray,
                    iou_thresh: float) -> np.ndarray:
    """Greedy NMS on host. boxes [N,4] xywh, scores [N]. Returns kept
    indices in descending-score order. Uses the native C++ kernel when
    available (utils/native.py)."""
    n = len(scores)
    if n == 0:
        return np.zeros((0,), dtype=np.int64)
    from ..utils import native
    kept = native.greedy_nms(boxes, scores, iou_thresh)
    if kept is not None:
        return kept
    order = np.argsort(-scores, kind="stable")
    iou = iou_xywh_matrix(boxes[order], boxes[order])
    alive = np.ones(n, dtype=bool)
    keep = []
    for i in range(n):
        if not alive[i]:
            continue
        keep.append(order[i])
        alive[i + 1:] &= iou[i, i + 1:] <= iou_thresh
    return np.asarray(keep, dtype=np.int64)


def merge_nms_host(boxes: np.ndarray, obj: np.ndarray, cls: np.ndarray,
                   conf_thresh: float = 0.5, iou_thresh: float = 0.5,
                   class_agnostic: bool = False, max_det: int = 300,
                   merge: bool = True) -> np.ndarray:
    """The reference's alternative vectorized NMS
    (utils.py:639-732 ``non_max_suppression``): combined score
    obj*cls, per-class box offsets (unless class_agnostic), greedy NMS,
    then merge-NMS — kept boxes are replaced by the IoU-weighted mean of
    their cluster, and kept only if the cluster is redundant (>1 member).

    boxes [N,4] xywh normalized; obj [N]; cls [N,C] class scores.
    Returns [M, 7] rows (x, y, w, h, obj, cls_conf, cls_id).
    """
    if len(boxes) == 0:
        return np.zeros((0, 7), np.float32)
    keep_cand = obj > conf_thresh
    boxes, obj, cls = boxes[keep_cand], obj[keep_cand], cls[keep_cand]
    if len(boxes) == 0:
        return np.zeros((0, 7), np.float32)
    conf = cls * obj[:, None]
    cls_id = conf.argmax(axis=1)
    score = conf[np.arange(len(conf)), cls_id]
    sel = score > conf_thresh
    boxes, obj, cls_id, score = boxes[sel], obj[sel], cls_id[sel], score[sel]
    if len(boxes) == 0:
        return np.zeros((0, 7), np.float32)
    # per-class offset trick: disjoint coordinate islands per class
    off = 0.0 if class_agnostic else cls_id.astype(np.float32) * 8.0
    shifted = boxes.copy()
    shifted[:, 0] += off
    keep = greedy_nms_host(shifted, score, iou_thresh)[:max_det]
    out_boxes = boxes[keep].copy()
    if merge and 1 < len(boxes) < 3000:
        iou = iou_xywh_matrix(shifted[keep], shifted)
        clusters = iou > iou_thresh
        weights = clusters * score[None, :]
        denom = weights.sum(axis=1, keepdims=True)
        out_boxes = (weights @ boxes) / np.maximum(denom, 1e-12)
        redundant = clusters.sum(axis=1) > 1
        keep = keep[redundant]
        out_boxes = out_boxes[redundant]
    return np.concatenate([
        out_boxes, obj[keep, None],
        (score[keep] / np.maximum(obj[keep], 1e-12))[:, None],
        cls_id[keep, None].astype(np.float32)], axis=1).astype(np.float32)


def _nms_prep(boxes, scores, iou_thresh, max_det):
    """Top-k prune + suppression matrix. Returns (top_idx, sup_mat,
    valid) with sup_mat[j, i]: higher-ranked j suppresses i while j is
    alive."""
    n = scores.shape[0]
    k = min(max_det * 8, n)  # prune candidates before the O(k^2) IoU
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    iou = iou_xywh_matrix(top_boxes, top_boxes, xp=jnp)
    rk = jnp.arange(k)
    sup_mat = (iou > iou_thresh) & (rk[:, None] < rk[None, :])
    return top_idx, sup_mat, top_scores > 0


def _jacobi_alive(sup_mat, valid, max_passes):
    """Jacobi iteration toward the greedy fixpoint, capped. Returns
    (alive, converged)."""
    def cond(st):
        a, prev, it = st
        return jnp.any(a != prev) & (it < max_passes)

    def body(st):
        a, _, it = st
        return (valid & ~jnp.any(sup_mat & a[:, None], axis=0), a,
                it + 1)

    alive, prev_alive, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), 0))
    return alive, ~jnp.any(alive != prev_alive)


def _serial_alive(sup_mat, valid):
    """Textbook rank-order scan from scratch: if i is alive it kills
    every lower-ranked overlap; exact by construction."""
    def step(i, a):
        return a & ~(sup_mat[i] & a[i])
    return jax.lax.fori_loop(0, sup_mat.shape[0], step, valid)


def _compact(alive, top_idx, max_det):
    """Survivors to the first max_det slots."""
    k = top_idx.shape[0]
    rank = jnp.cumsum(alive) - 1
    sel = jnp.where(alive, rank, k)
    out_idx = jnp.zeros((max_det,), dtype=top_idx.dtype)
    out_valid = jnp.zeros((max_det,), dtype=bool)
    in_range = (sel < max_det) & alive
    slot = jnp.where(in_range, sel, max_det)  # max_det drops out of bounds
    out_idx = out_idx.at[slot].set(top_idx, mode="drop")
    out_valid = out_valid.at[slot].set(True, mode="drop")
    return out_idx, out_valid


def greedy_nms_device_batch(boxes: jnp.ndarray, scores: jnp.ndarray,
                            iou_thresh: float, max_det: int):
    """Batched fixed-size greedy NMS under jit: boxes [B,N,4], scores
    [B,N] -> (indices [B,max_det], valid [B,max_det],
    saturated [B] bool).

    ``saturated[b]`` is the pruning contract's truth signal: NMS only
    considers the top ``k = 8*max_det`` candidates by score (the O(k^2)
    IoU matrix is what the prune bounds), and the reference's NMS runs
    over ALL thresholded candidates (utils.py:93-112). When image b has
    MORE than k positive-score candidates, the cut may drop would-be
    survivors; ``saturated[b]`` is True exactly then (k-th ranked score
    still positive with n > k), so callers can escalate (re-run at a
    higher conf threshold, fall back to the host path as
    ``Detector.detect_batch`` does at evals/detect.py) or flag the
    result as a lower bound. With n <= k it is constant False: pruning
    kept everything.

    The Jacobi pass runs vmapped; the exact serial fallback for a
    capped (non-converged) image is decided ONCE at batch level.
    Putting the ``lax.cond`` inside the vmapped body instead converts
    it to a ``select`` that executes BOTH branches — the O(k) serial
    scan then runs unconditionally per image (measured: full-device
    detect b16 fell from ~600 to ~485 img/s)."""
    prep = jax.vmap(functools.partial(
        _nms_prep, iou_thresh=iou_thresh, max_det=max_det))
    top_idx, sup_mat, valid = prep(boxes, scores)
    if scores.shape[1] > top_idx.shape[1]:  # n > k: prune was real
        saturated = valid[:, -1]
    else:
        saturated = jnp.zeros(scores.shape[0], bool)
    alive, converged = jax.vmap(functools.partial(
        _jacobi_alive, max_passes=JACOBI_MAX_PASSES))(sup_mat, valid)

    def redo(operands):
        # recompute the suppression matrices from the raw candidates:
        # keeping the [B,k,k] sup_mat live ACROSS the cond instead
        # costs the fast path a real HBM round trip of it (measured
        # ~3 ms/batch at b16 k=2400); redo is the rare case and can
        # pay the recompute itself.
        bx, sc = operands
        _, sup, val = prep(bx, sc)
        return jax.vmap(_serial_alive)(sup, val)

    alive = jax.lax.cond(jnp.all(converged), lambda op: alive, redo,
                         (boxes, scores))
    out_idx, out_valid = jax.vmap(functools.partial(
        _compact, max_det=max_det))(alive, top_idx)
    return out_idx, out_valid, saturated


def greedy_nms_device(boxes: jnp.ndarray, scores: jnp.ndarray,
                      iou_thresh: float, max_det: int):
    """Fixed-size greedy NMS under jit.

    boxes [N,4], scores [N] (invalid candidates must carry score<=0).
    Returns (indices [max_det], valid [max_det] bool, saturated scalar
    bool): the top-scoring surviving boxes, greedy-suppressed exactly
    like the host version, plus the pruning-contract signal (True iff
    more than the kept ``8*max_det`` candidates scored positive — see
    ``greedy_nms_device_batch``).
    Do NOT vmap this over a batch — use ``greedy_nms_device_batch``
    (vmapping the internal lax.cond turns it into an always-both-
    branches select; see there).
    """
    top_idx, sup_mat, valid = _nms_prep(boxes, scores, iou_thresh,
                                        max_det)

    # Greedy NMS is the unique fixpoint of
    #     alive[i] = valid[i] & ~any_j(sup_mat[j, i] & alive[j])
    # (unique by induction over rank, since j < i strictly). Jacobi
    # iteration converges to it from any start in at most
    # longest-suppression-chain passes — each pass ONE vectorized [k,k]
    # masked reduction, instead of the k serial scalar steps of the
    # textbook loop (measured ~14 ms/batch at k=2400 on TPU, where a
    # fori_loop iteration is latency-bound). Real and random scenes
    # converge in a handful of passes (measured: full-device detect
    # 37.7 -> 26.6 ms/batch at b16 incl. dense random-weight garbage).
    # This framework *fabricates* dense overlapping detections, though,
    # so deep suppression chains are plausible inputs, and unbounded
    # Jacobi on an O(k)-deep chain would do O(k) passes of O(k^2) work.
    # Worst-case latency is made predictable by capping the passes and
    # finishing the rare non-converged case with the exact serial scan
    # (one O(k) fori_loop of O(k) work — cheaper than one more ceiling
    # of Jacobi passes), so the result is the greedy fixpoint either way.
    alive, converged = _jacobi_alive(sup_mat, valid, JACOBI_MAX_PASSES)
    alive = jax.lax.cond(converged, lambda op: alive,
                         lambda op: _serial_alive(*op), (sup_mat, valid))
    if scores.shape[0] > top_idx.shape[0]:
        saturated = valid[-1]
    else:
        saturated = jnp.zeros((), bool)
    out_idx, out_valid = _compact(alive, top_idx, max_det)
    return out_idx, out_valid, saturated
