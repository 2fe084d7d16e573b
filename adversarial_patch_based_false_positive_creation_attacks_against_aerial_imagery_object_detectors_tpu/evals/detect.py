"""Detection path: image -> 3 raw heads -> decode -> threshold -> NMS.

The ``do_detect`` contract (reference utils.py:450-519): pad/resize the
image, forward, decode each head with the (quirk-paired) anchor group,
keep boxes with obj*cls_max > conf_thresh, normalize, greedy-NMS at
nms_thresh; each detection is the 7-tuple
``[x, y, w, h, obj, cls_conf, cls_id]`` (normalized xywh).

TPU-first: decode + thresholding are one jitted batched pass over all
22743 candidates; only the (fixed-size, top-k pruned) survivor set goes
to the host for the final greedy NMS — the reference instead looped over
every grid cell in Python.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.assets import load_anchor_groups
from ..models import darknet
from ..ops.decode import decode_all_heads
from ..ops.nms import (greedy_nms_device_batch, greedy_nms_host)

MAX_CANDIDATES = 4096  # pre-NMS cap; conf 0.01 sweeps can be wide


class Detector:
    """Jit-compiled victim-detector inference wrapper."""

    def __init__(self, net: darknet.Network, params: darknet.Params,
                 anchor_groups: Optional[np.ndarray] = None,
                 img_size: int = 608, num_classes: int = 15,
                 compute_dtype=jnp.bfloat16,
                 max_candidates: int = MAX_CANDIDATES):
        self.net = net
        self.params = params
        self.img_size = img_size
        self.num_classes = num_classes
        self.anchor_groups = (anchor_groups if anchor_groups is not None
                              else load_anchor_groups())
        self.max_candidates = max_candidates
        # inference is forward-only: the Pallas stems are a pure win
        # there (fused megakernel 4.5 ms vs planar 5.3 vs XLA 8.2 at b8
        # 608^2), so opt in on TPU; apply() falls back fused -> planar
        # -> XLA when the stem geometry doesn't match
        on_tpu = jax.default_backend() == "tpu"

        def _decode_fields(params, images):
            heads = darknet.apply(net, params, images, compute_dtype,
                                  planar_stem=on_tpu, fused_stem=on_tpu)
            boxes, obj, cls = decode_all_heads(
                heads, self.anchor_groups, (img_size, img_size),
                num_classes)
            cls_conf = jnp.max(cls, axis=-1)
            cls_id = jnp.argmax(cls, axis=-1)
            score = obj * cls_conf
            # Pack all per-candidate fields into 8-float rows so the
            # pruning is ONE row gather (TPU gathers hate tiny rows).
            return jnp.stack(
                [boxes[..., 0], boxes[..., 1], boxes[..., 2],
                 boxes[..., 3], obj, cls_conf,
                 cls_id.astype(boxes.dtype), score], axis=-1)  # [B,N,8]

        @jax.jit
        def _infer(params, images):
            # top-k prune on device; host applies the threshold + NMS.
            vals = _decode_fields(params, images)
            score = vals[..., 7]
            k = min(max_candidates, score.shape[1])
            _, top_idx = jax.lax.top_k(score, k)
            return jnp.take_along_axis(vals, top_idx[..., None], axis=1)

        self._infer = _infer
        # un-pruned fallback: every candidate comes to the host. Used
        # only when the pruned set saturates the conf threshold (dense
        # post-attack scenes at conf 0.01), so the sweep is never
        # silently truncated (reference conf-0.01 protocol:
        # test_patch_DOTA_metrics.py:162).
        self._infer_full = jax.jit(_decode_fields)

        @jax.jit
        def _detect_device(params, images, conf_thresh, nms_thresh):
            if images.dtype == jnp.uint8:
                # serving path: ship 8-bit over the (PCIe/relay) link,
                # normalize on device — 4x less host->device traffic
                images = images.astype(jnp.float32) / 255.0
            heads = darknet.apply(net, params, images, compute_dtype,
                                  planar_stem=on_tpu, fused_stem=on_tpu)
            boxes, obj, cls = decode_all_heads(
                heads, self.anchor_groups, (img_size, img_size),
                num_classes)
            cls_conf = jnp.max(cls, axis=-1)
            cls_id = jnp.argmax(cls, axis=-1).astype(boxes.dtype)
            # candidates pass obj*cls > conf; NMS ranks by obj
            # (reference semantics: utils.py:99,217-219)
            nms_score = jnp.where(obj * cls_conf > conf_thresh, obj, 0.0)

            # max_det=300 (the reference's merge-NMS cap) keeps the
            # O(k^2) on-device IoU matrix small (k = 8*max_det). The
            # batched entry point keeps the rare serial-fallback cond
            # OUTSIDE the vmap (a vmapped cond executes both branches).
            idx, valid, saturated = greedy_nms_device_batch(
                boxes, nms_score, nms_thresh, max_det=300)

            def gather_rows(boxes_i, obj_i, cc_i, cid_i, idx_i, valid_i):
                row = jnp.concatenate([
                    boxes_i[idx_i], obj_i[idx_i, None], cc_i[idx_i, None],
                    cid_i[idx_i, None]], axis=1)
                return jnp.where(valid_i[:, None], row, 0.0)

            dets = jax.vmap(gather_rows)(boxes, obj, cls_conf, cls_id,
                                         idx, valid)
            return dets, valid, saturated

        self._detect_device = _detect_device

    def forward_heads(self, images: np.ndarray):
        """Raw heads (NHWC) for a [B, S, S, 3] batch."""
        return darknet.apply(self.net, self.params, jnp.asarray(images))

    def detect_batch(self, images: np.ndarray, conf_thresh: float,
                     nms_thresh: float) -> List[np.ndarray]:
        """Detect on a [B, S, S, 3] float batch. Returns per-image [N, 7]
        arrays (x, y, w, h, obj, cls_conf, cls_id), NMS'd, normalized."""
        vals = np.asarray(self._infer(self.params, jnp.asarray(images)))
        score = vals[..., 7]
        n_pruned = score.shape[1]
        # the pruned set keeps the top `max_candidates` by score; if
        # every pruned row of some image clears conf_thresh there may be
        # more survivors beyond the cut — redo with the full candidate
        # set (exact, just more host traffic) instead of truncating.
        saturated = np.all(score > conf_thresh, axis=1) & (
            n_pruned == self.max_candidates)
        if saturated.any():
            vals = np.asarray(
                self._infer_full(self.params, jnp.asarray(images)))
            score = vals[..., 7]
        results = []
        for i in range(images.shape[0]):
            keep = score[i] > conf_thresh
            boxes = vals[i, keep, 0:4]
            obj = vals[i, keep, 4]
            cls_conf = vals[i, keep, 5]
            cls_id = vals[i, keep, 6]
            # reference NMS sorts by obj conf (utils.py:99)
            kept = greedy_nms_host(boxes, obj, nms_thresh)
            det = np.concatenate([
                boxes[kept], obj[kept, None], cls_conf[kept, None],
                cls_id[kept, None].astype(np.float32)], axis=1)
            results.append(det.astype(np.float32))
        return results

    def detect(self, image: np.ndarray, conf_thresh: float,
               nms_thresh: float) -> np.ndarray:
        """Single image [S, S, 3] -> [N, 7] detections."""
        return self.detect_batch(image[None], conf_thresh, nms_thresh)[0]

    def detect_batch_device(self, images, conf_thresh: float,
                            nms_thresh: float):
        """Fully on-device detection (one jit call: forward + decode +
        threshold + greedy NMS). Returns fixed-size
        (dets [B, 300, 7], valid [B, 300], saturated [B] bool) device
        arrays — the serving path; semantics match ``detect_batch``
        (NMS ranked by obj, candidates thresholded on obj*cls).

        Pruning contract: NMS runs over the top 2,400 (= 8*300)
        above-threshold candidates per image. ``saturated[b]`` is True
        iff image b had MORE above-threshold candidates than that — the
        only case where results can be incomplete (this framework
        *fabricates* dense detections, so a post-attack scene at a low
        serving conf threshold can hit it). The host path
        (``detect_batch``) instead re-runs un-pruned on saturation and
        is always exact; dense-sweep work (the conf-0.01 metrics
        protocol) should use it."""
        return self._detect_device(
            self.params, jnp.asarray(images),
            jnp.float32(conf_thresh), jnp.float32(nms_thresh))


def detections_to_label_rows(dets: np.ndarray, with_conf: bool = True
                             ) -> np.ndarray:
    """7-col rows as-is, or 5-col ``cls x y w h`` training rows."""
    if with_conf:
        return dets
    return np.concatenate([dets[:, 6:7], dets[:, 0:4]], axis=1)
