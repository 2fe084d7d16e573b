"""Analytic conv FLOP counts for a compiled ``Network``.

Used by ``bench.py`` to report MFU next to steps/min: the patch-training
step's FLOPs are overwhelmingly the detector's 75 convolutions, run
forward once and once more as the input-cotangent (dgrad) chain — the
detector weights are frozen (reference ``train_patch.py:131`` optimizes
the patch alone), so no weight-gradient convolutions exist in the
program. dgrad FLOPs equal forward FLOPs exactly: every (input, output)
element pair connected by a kernel weight contributes one MAC in each
direction.

The count is conv-only (EOT warp matmuls, median network, losses and the
optimizer are O(patch or canvas) elementwise — <2% of the conv total at
608^2), so the derived MFU is a slight *under*-estimate.
"""

from __future__ import annotations

from typing import Dict

from .darknet import Network

# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets).
_PEAK_BF16: Dict[str, float] = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def peak_flops_bf16(device_kind: str) -> float | None:
    """Per-chip bf16 peak for a ``jax.Device.device_kind``, else None.

    Exact match first; otherwise longest prefix whose unmatched
    remainder carries no alphabetic qualifier (a digit/space suffix
    like a core index is fine). The alpha guard keeps efficiency /
    inference variants NOT in the table (e.g. "TPU v4 lite", "TPU
    v4i") from inheriting the big chip's peak — better to omit MFU
    (None) than to commit one that's ~2x off."""
    if device_kind in _PEAK_BF16:
        return _PEAK_BF16[device_kind]
    matches = []
    for k, v in _PEAK_BF16.items():
        if device_kind.startswith(k):
            rest = device_kind[len(k):]
            if not any(ch.isalpha() for ch in rest):
                matches.append((len(k), v))
    return max(matches)[1] if matches else None


def conv_fwd_flops_per_image(net: Network) -> float:
    """Total forward conv FLOPs (2*MACs) for ONE image at the network's
    configured input size. Walks the layer graph tracking spatial dims
    exactly as ``apply`` does (same-padded convs, stride-2 downsamples,
    maxpool, upsample, route/shortcut keep the source dims)."""
    h, w = net.height, net.width
    dims = []  # per-layer (h, w) OUTPUT dims
    total = 0.0
    for layer in net.layers:
        if layer.kind == "convolutional":
            s = layer.conv.stride
            oh, ow = -(-h // s), -(-w // s)  # same padding
            total += 2.0 * oh * ow * layer.conv.filters * \
                layer.conv.in_ch * layer.conv.size ** 2
            h, w = oh, ow
        elif layer.kind == "maxpool":
            s = layer.pool_stride
            h, w = -(-h // s), -(-w // s)
        elif layer.kind == "upsample":
            h, w = h * layer.scale, w * layer.scale
        elif layer.kind == "route":
            h, w = dims[layer.route_from[0]]
        elif layer.kind == "shortcut":
            h, w = dims[layer.shortcut_from]
        # yolo: passthrough
        dims.append((h, w))
    return total


def train_step_flops_per_image(net: Network) -> float:
    """Conv FLOPs of one patch-optimization step per image: forward +
    the full input-cotangent (dgrad) chain. No wgrad (frozen victim)."""
    return 2.0 * conv_fwd_flops_per_image(net)


def mfu(step_seconds: float, batch: int, net: Network,
        device_kind: str, n_devices: int = 1) -> float | None:
    """Model FLOP utilization of the training step, or None if the
    device kind has no known bf16 peak (e.g. CPU)."""
    peak = peak_flops_bf16(device_kind)
    if peak is None or step_seconds <= 0:
        return None
    flops = train_step_flops_per_image(net) * batch
    return flops / step_seconds / (peak * n_devices)
