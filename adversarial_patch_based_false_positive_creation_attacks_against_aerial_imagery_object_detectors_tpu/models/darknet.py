"""Functional darknet/YOLOv3 victim model, TPU-native.

Design (vs. the reference's ``darknet_v3.py`` nn.ModuleList walk):

- **Pure function of (params, image)** — the network structure is compiled
  from the block list once; the forward is a Python loop emitted into a
  single XLA program under ``jit``.
- **NHWC layout** with HWIO kernels: the natural TPU conv layout (the MXU
  consumes the channel dim as the contraction axis).
- **BN folding**: the victim detector only ever runs in eval mode
  (reference ``train_patch.py:60``), so each conv+BN pair is an affine and
  is folded into the conv kernel/bias at load time
  (``fold_bn``) — one fused conv per layer instead of conv+4 elementwise.
- **Raw heads out** — the model returns the three raw prediction maps
  ``[B, S, S, 3*(5+C)]`` for S in (H/32, H/16, H/8) with *no* sigmoid or
  box decode (the contract from reference ``darknet_v3.py:195-221``; the
  trainer indexes raw logits per cell, eval decodes separately).

``head.reshape(B, S, S, 3, 5 + C)`` is anchor-major/component-minor,
matching the torch channel order ``a*(5+C)+c`` so weight-level parity with
the reference holds elementwise.
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .darknet_cfg import Block, parse_darknet_cfg

Params = Dict[str, Dict[str, jnp.ndarray]]

BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    index: int          # module index (for params key / weight file order)
    in_ch: int
    filters: int
    size: int
    stride: int
    pad: int
    bn: bool
    activation: str     # "leaky" | "mish" | "linear"


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    kind: str           # convolutional | maxpool | upsample | route | shortcut | yolo
    conv: Optional[ConvSpec] = None
    # maxpool
    pool_size: int = 0
    pool_stride: int = 0
    # upsample
    scale: int = 0
    # route: absolute module indices to concat; shortcut: absolute source index
    route_from: Tuple[int, ...] = ()
    shortcut_from: int = -1
    # yolo
    mask: Tuple[int, ...] = ()
    anchors: Tuple[Tuple[int, int], ...] = ()
    num_classes: int = 0


@dataclasses.dataclass(frozen=True)
class Network:
    """Compiled network structure: static layer specs + bookkeeping."""
    layers: Tuple[LayerSpec, ...]
    width: int
    height: int
    channels: int
    num_classes: int
    yolo_indices: Tuple[int, ...]
    # module indices whose outputs are needed later (route/shortcut sources)
    saved_outputs: Tuple[int, ...]


def build_network(blocks: Sequence[Block]) -> Network:
    """Compile a parsed block list into a static ``Network`` description."""
    net_info = blocks[0]
    assert net_info["type"] == "net"
    width = int(net_info.get("width", 608))
    height = int(net_info.get("height", 608))
    channels = int(net_info.get("channels", 3))

    layers: List[LayerSpec] = []
    out_channels: List[int] = []
    yolo_indices: List[int] = []
    needed: set = set()
    num_classes = 0

    for i, block in enumerate(blocks[1:]):
        kind = block["type"]
        if kind == "convolutional":
            bn = bool(int(block.get("batch_normalize", 0)))
            filters = int(block["filters"])
            size = int(block["size"])
            in_ch = out_channels[-1] if out_channels else channels
            spec = ConvSpec(
                index=i, in_ch=in_ch, filters=filters, size=size,
                stride=int(block["stride"]), pad=(size - 1) // 2, bn=bn,
                activation=block.get("activation", "linear"),
            )
            layers.append(LayerSpec("convolutional", conv=spec))
            out_channels.append(filters)
        elif kind == "maxpool":
            layers.append(LayerSpec(
                "maxpool", pool_size=int(block["size"]),
                pool_stride=int(block["stride"])))
            out_channels.append(out_channels[-1])
        elif kind == "upsample":
            layers.append(LayerSpec("upsample", scale=int(block["stride"])))
            out_channels.append(out_channels[-1])
        elif kind == "route":
            srcs = tuple(
                (i + int(x)) if int(x) < 0 else int(x)
                for x in block["layers"].split(","))
            needed.update(srcs)
            layers.append(LayerSpec("route", route_from=srcs))
            out_channels.append(sum(out_channels[s] for s in srcs))
        elif kind == "shortcut":
            frm = int(block["from"])
            src = i + frm if frm < 0 else frm
            needed.add(src)
            needed.add(i - 1)
            layers.append(LayerSpec("shortcut", shortcut_from=src))
            out_channels.append(out_channels[-1])
        elif kind == "yolo":
            mask = tuple(int(x) for x in block["mask"].split(","))
            flat = [int(x) for x in block["anchors"].replace(",", " ").split()]
            anchors = tuple(
                (flat[2 * m], flat[2 * m + 1]) for m in mask)
            num_classes = int(block["classes"])
            layers.append(LayerSpec(
                "yolo", mask=mask, anchors=anchors, num_classes=num_classes))
            yolo_indices.append(i)
            out_channels.append(out_channels[-1])
        else:
            raise ValueError(f"unsupported block type: {kind!r}")

    return Network(
        layers=tuple(layers), width=width, height=height, channels=channels,
        num_classes=num_classes, yolo_indices=tuple(yolo_indices),
        saved_outputs=tuple(sorted(needed)),
    )


def network_from_cfg(source) -> Network:
    return build_network(parse_darknet_cfg(source))


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def conv_specs(net: Network) -> List[ConvSpec]:
    return [l.conv for l in net.layers if l.kind == "convolutional"]


def init_params(net: Network, key: jax.Array,
                dtype=jnp.float32) -> Params:
    """Random-init parameters (He-normal kernels, identity-ish BN)."""
    params: Params = {}
    for spec in conv_specs(net):
        key, wkey = jax.random.split(key)
        fan_in = spec.in_ch * spec.size * spec.size
        w = jax.random.normal(
            wkey, (spec.size, spec.size, spec.in_ch, spec.filters), dtype
        ) * np.sqrt(2.0 / fan_in)
        p = {"w": w}
        if spec.bn:
            p["gamma"] = jnp.ones((spec.filters,), dtype)
            p["beta"] = jnp.zeros((spec.filters,), dtype)
            p["mean"] = jnp.zeros((spec.filters,), dtype)
            p["var"] = jnp.ones((spec.filters,), dtype)
        else:
            p["b"] = jnp.zeros((spec.filters,), dtype)
        params[f"conv_{spec.index}"] = p
    return params


def fold_bn(net: Network, params: Params) -> Params:
    """Fold eval-mode batch-norm into conv kernel + bias.

    y = gamma * (conv(x) - mean) / sqrt(var + eps) + beta
      = conv(x; w * s) + (beta - mean * s),   s = gamma / sqrt(var + eps)

    Returns a params tree with only {"w", "b"} per conv. Numerically
    equivalent to unfolded eval BN up to float rounding.
    """
    folded: Params = {}
    for spec in conv_specs(net):
        p = params[f"conv_{spec.index}"]
        if "gamma" in p:
            s = p["gamma"] / jnp.sqrt(p["var"] + BN_EPS)
            folded[f"conv_{spec.index}"] = {
                "w": p["w"] * s,            # s broadcasts over O (last axis)
                "b": p["beta"] - p["mean"] * s,
            }
        else:
            folded[f"conv_{spec.index}"] = {"w": p["w"], "b": p["b"]}
    return folded


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _activate(x: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "leaky":
        return jnp.where(x > 0, x, 0.1 * x)
    if activation == "mish":
        return x * jnp.tanh(jax.nn.softplus(x))
    return x


def _conv_layer(x: jnp.ndarray, spec: ConvSpec, p: Dict[str, jnp.ndarray],
                compute_dtype) -> jnp.ndarray:
    w = p["w"].astype(compute_dtype)
    # no preferred_element_type: the MXU accumulates bf16 convs in fp32
    # internally, and mixed in/out dtypes break the transpose (backward)
    # conv. Activations stay in compute_dtype end to end; heads are cast
    # to fp32 at collection.
    #
    # Precision: at f32 the MXU's DEFAULT conv precision is a bf16
    # multi-pass that deviates from true f32 by >1e-3 over 75 chained
    # convs (measured: 356/1415 golden boxes off at conf 0.01 on v5e vs
    # 25 on CPU). f32 is the reference-parity/eval path, so it pays for
    # HIGHEST; bf16 (the training/serving compute dtype) keeps DEFAULT.
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w,
        window_strides=(spec.stride, spec.stride),
        padding=[(spec.pad, spec.pad), (spec.pad, spec.pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if "gamma" in p:  # unfolded BN (eval-mode affine)
        s = p["gamma"] / jnp.sqrt(p["var"] + BN_EPS)
        y = y * s.astype(y.dtype) + (p["beta"] - p["mean"] * s).astype(y.dtype)
    else:
        y = y + p["b"].astype(y.dtype)
    return _activate(y, spec.activation)


def _maxpool(x: jnp.ndarray, size: int, stride: int) -> jnp.ndarray:
    if size == 2 and stride == 1:
        # darknet quirk: pad right/bottom by one, then 2x2/1 valid pool
        pads = [(0, 0, 0), (0, 1, 0), (0, 1, 0), (0, 0, 0)]
        x = jax.lax.pad(x, jnp.array(-jnp.inf, x.dtype), pads)
        padding = [(0, 0)] * 4
    else:
        p = (size - 1) // 2
        padding = [(0, 0), (p, p), (p, p), (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding)


def _upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    # nearest-neighbour, matching torch F.interpolate(mode="nearest")
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


# Trace-time dispatch breadcrumb: which front-end routes the most
# recent ``apply`` trace in this process took. A/B tools assert on it
# so a silently-failed gate (wrong env combo, inapplicable geometry,
# the multi-device guard) can never report a fallback timing under a
# fast-path label — the same invariant bench.py enforces by tagging
# fused-stem fallbacks in its output.
_routes_tls = threading.local()


def _last_routes() -> Dict[str, str]:
    """Per-THREAD route breadcrumb (trace-time state must not leak
    between concurrent apply() traces, e.g. async compilation or a
    threaded A/B harness)."""
    d = getattr(_routes_tls, "d", None)
    if d is None:
        d = {"stem": "xla", "res152": "xla"}
        _routes_tls.d = d
    return d


def last_routes() -> Dict[str, str]:
    """Routes taken by the most recent ``apply`` TRACE on this thread:
    ``{"stem": "c12"|"fused"|"fused-shard"|"planar"|"packed"|"xla",
    "res152": "c12"|"fused"|"planar"|"xla"}``. Trace-time only — a
    jit cache hit re-traces nothing, so read it right after the first
    call of a freshly built step."""
    return dict(_last_routes())


def apply(net: Network, params: Params, x: jnp.ndarray,
          compute_dtype=jnp.float32,
          packed_stem: bool = False,
          planar_stem: Optional[bool] = None,
          fused_stem: Optional[bool] = None,
          mesh=None) -> List[jnp.ndarray]:
    """Run the detector. ``x``: [B, H, W, 3] float in [0, 1] (NHWC).

    Returns the three raw heads [B, S, S, 3*(5+C)] in float32, in cfg order
    (stride 32, 16, 8) — mirroring the reference's ``[head19, head38,
    head76]`` contract (reference darknet_v3.py:195-221), NHWC instead of
    NCHW.

    ``packed_stem`` evaluates the first two convs via an exact
    space-to-depth rewrite (experimental/packed_stem.py) when applicable. Measured on
    v5e it is slightly *slower* than XLA's native handling of the
    3-channel stem (14.7 vs 13.4 ms fwd at batch 8), so it defaults off;
    it is kept as a validated option for hardware where small-channel
    convs are worse. Requires BN-folded params.

    ``fused_stem`` / ``planar_stem`` select the Pallas fast paths for
    layers 0-5 (ops/stem_fused.py megakernels / ops/planar_conv.py
    per-layer kernels); tried in that order, falling back to the plain
    XLA conv walk when the stem geometry doesn't match. ``None`` =
    resolve from env/platform (see inline comments).
    """
    outputs: Dict[int, jnp.ndarray] = {}
    heads: List[jnp.ndarray] = []
    saved = set(net.saved_outputs)
    prev = x
    start = 0
    _last_routes().update(stem="xla", res152="xla")
    if fused_stem is None:
        # The fused stripe megakernels (ops/stem_fused.py) keep the
        # whole 5-conv stem chain in VMEM, forward and input-backward
        # (flash-style recompute): measured 31.1 vs 32.0 ms/train-step
        # and 4.5 vs 8.2 ms fwd at b8 608^2 on one v5e. Default ON for
        # single-device TPU only — under a >1-device auto-SPMD mesh
        # GSPMD treats the opaque pallas_call as replicated, which
        # would silently gather the sharded batch.
        # ADV_PATCH_FUSED_STEM=0/1 overrides either way. A >1-device
        # ``mesh`` routes the stem through shard_map (batch sharded on
        # the mesh's first axis, weights replicated) so each device
        # runs the kernel on its local batch.
        env = os.environ.get("ADV_PATCH_FUSED_STEM")
        if env is not None:
            fused_stem = env == "1"
        else:
            # Measured train-step crossovers (v5e, 608^2 bf16): at local
            # batch 1 the kernel's (batch, stripe) grid is too shallow
            # to pipeline (7.3 XLA vs 8.0 ms fused); everywhere else the
            # fused stem wins since the MXU boundary-layout kernels
            # (b8 25.1 vs ~27.7, b16 52.3 vs 59.3, b24 82.7 vs 88.8 —
            # b24 flipped from the pre-layout-kernel measurement).
            # Auto-default: local batch >= 2.
            local_b = x.shape[0] // (1 if mesh is None
                                     else mesh.devices.size)
            fused_stem = (jax.default_backend() == "tpu"
                          and local_b >= 2
                          and (jax.device_count() == 1
                               or mesh is not None))
    if fused_stem and mesh is None and jax.device_count() > 1:
        # The same >1-device guard the auto-default applies must also
        # gate an EXPLICIT fused_stem=True (e.g. Detector on TPU): with
        # no mesh to shard_map over, GSPMD treats the opaque pallas_call
        # as replicated and would silently gather a sharded batch.
        fused_stem = False
    if fused_stem:
        from . import stem_planar
        from ..ops import stem_fused
        n_dev = 1 if mesh is None else mesh.devices.size
        if (stem_fused.fused_applicable(net, params, x.shape)
                and x.shape[0] % n_dev == 0):
            sp = stem_planar._stem_params(params, compute_dtype)
            xc = x.astype(compute_dtype)
            # ADV_PATCH_RES152=c12: chain the 152^2-stage megakernel
            # DIRECTLY on the stem's planar output and pull conv12's
            # stride-2 dgrad inside the fused backward (the round-3
            # post-mortem's boundary-widening). Single-device only
            # (the combined unit is not shard_map-wrapped).
            if (os.environ.get("ADV_PATCH_RES152") == "c12"
                    and n_dev == 1 and jax.device_count() == 1):
                from . import res_planar
                if res_planar.c12_applicable(net, params, x.shape):
                    sp6 = res_planar._stage_params(params, compute_dtype)
                    p12 = params["conv_12"]
                    y5p = stem_fused.fused_stem_planar(xc, sp)
                    prev = res_planar.res152_c12_fused(
                        y5p, sp6, p12["w"].astype(compute_dtype),
                        p12["b"])
                    outputs[12] = prev
                    start = 13
                    _last_routes().update(stem="c12", res152="c12")
            # ADV_PATCH_STEM_REMAT=1: backward rematerializes stem
            # activations in VMEM instead of restoring the forward's
            # saved planar exports — A/B lever for large batches where
            # the save/restore HBM traffic scales with B. Measured
            # (ROADMAP): saved-activation wins at b8 AND b24; remat
            # kept as a memory-pressure option.
            stem_fn = (stem_fused.fused_stem_remat
                       if os.environ.get("ADV_PATCH_STEM_REMAT") == "1"
                       else stem_fused.fused_stem)
            if start != 13:  # the c12 route above consumed the stem
                if n_dev > 1:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P
                    axis = mesh.axis_names[0]
                    fn = shard_map(
                        stem_fn, mesh=mesh,
                        in_specs=(P(axis), P()), out_specs=P(axis),
                        check_vma=False)
                    prev = fn(xc, sp)
                else:
                    prev = stem_fn(xc, sp)
                outputs[5] = prev
                start = 6
                _last_routes()["stem"] = ("fused-shard" if n_dev > 1
                                        else "fused")
    if start == 0 and planar_stem is None:
        # Default OFF: the planar FORWARD wins (5.3 vs 8.2 ms at b8 —
        # inference paths like Detector opt in explicitly), but
        # differentiating through the custom_vjp still loses end to end
        # (train step 39.3 vs 32.1 ms at b8) even with the fully planar
        # backward: the s2 input-grads pay for zero-interleaved
        # expansion and the saved planar residuals block XLA's own
        # stem-backward fusion/remat. Measured A/B in ROADMAP.md.
        # ADV_PATCH_PLANAR_STEM=0/1 overrides for experiments.
        env = os.environ.get("ADV_PATCH_PLANAR_STEM")
        planar_stem = env == "1"
    if start == 0 and planar_stem:
        from . import stem_planar
        if stem_planar.stem_applicable(net, params, x.shape):
            sp = stem_planar._stem_params(params, compute_dtype)
            prev = stem_planar.planar_stem(x.astype(compute_dtype), sp)
            outputs[5] = prev
            start = 6
            _last_routes()["stem"] = "planar"
    if start == 6:
        # Optional continuation of the Pallas fast path through the
        # 152^2 residual stage (layers 6-11, two stride-1 residual
        # blocks) on the per-layer planar kernels
        # (models/res_planar.py). Default OFF — measured WORSE than
        # XLA at b8 608^2 (26.6 vs 23.6 ms/step): the planar rows pad
        # 152 active lanes to 256 (+68% HBM per inter-layer tensor)
        # and cin=128 is where XLA's convs are already strong; the
        # layout-flip-flop savings don't cover that. Kept as a
        # validated option (ADV_PATCH_RES152=1) and as the oracle-
        # tested basis for a future whole-stage megakernel (which
        # would keep intermediates in VMEM and dodge both costs).
        env = os.environ.get("ADV_PATCH_RES152")
        single = mesh is None and jax.device_count() == 1
        # "fused" = whole-stage megakernel (ops/res_fused.py);
        # "1" = per-layer planar (measured dead end, kept for A/B);
        # "0" = XLA walk. Default: pending the fused on-chip A/B.
        mode = env if env in ("fused", "1") and single else "0"
        if mode != "0":
            from . import res_planar
            if (mode == "fused"
                    and res_planar.fused_res_applicable(
                        net, params, x.shape)):
                sp6 = res_planar._stage_params(params, compute_dtype)
                prev = res_planar.res152_fused_stage(
                    prev.astype(compute_dtype), sp6)
                outputs[11] = prev
                start = 12
                _last_routes()["res152"] = "fused"
            elif (mode == "1"
                    and res_planar.res152_applicable(
                        net, params, x.shape)):
                sp6 = res_planar._stage_params(params, compute_dtype)
                prev = res_planar.res152_planar(
                    prev.astype(compute_dtype), sp6)
                outputs[11] = prev
                start = 12
                _last_routes()["res152"] = "planar"
    if start == 0 and packed_stem and "b" in params.get("conv_0", {}):
        from ..experimental.packed_stem import packed_stem_apply, stem_applicable
        if stem_applicable(net):
            prev = packed_stem_apply(
                x, net.layers[0].conv, params["conv_0"],
                net.layers[1].conv, params["conv_1"], compute_dtype)
            if 1 in saved:
                outputs[1] = prev
            start = 2
            _last_routes()["stem"] = "packed"
    for i, layer in enumerate(net.layers[start:], start=start):
        if layer.kind == "convolutional":
            prev = _conv_layer(prev, layer.conv, params[f"conv_{i}"],
                               compute_dtype)
        elif layer.kind == "maxpool":
            prev = _maxpool(prev, layer.pool_size, layer.pool_stride)
        elif layer.kind == "upsample":
            prev = _upsample(prev, layer.scale)
        elif layer.kind == "route":
            prev = jnp.concatenate([outputs[s] for s in layer.route_from],
                                   axis=-1)
        elif layer.kind == "shortcut":
            prev = outputs[i - 1] + outputs[layer.shortcut_from]
        elif layer.kind == "yolo":
            heads.append(prev.astype(jnp.float32))
        if i in saved or (i + 1 < len(net.layers)
                          and net.layers[i + 1].kind == "shortcut"):
            outputs[i] = prev
    return heads


def head_strides(net: Network, img_size: int) -> List[int]:
    """Static stride of each yolo head for a given square input size."""
    # Heads come out at img_size/32, /16, /8 for YOLOv3; compute generically
    # by walking the layer strides.
    strides = []
    cur = 1
    cur_by_index: Dict[int, int] = {}
    for i, layer in enumerate(net.layers):
        if layer.kind == "convolutional":
            cur *= layer.conv.stride
        elif layer.kind == "maxpool":
            cur *= layer.pool_stride
        elif layer.kind == "upsample":
            cur //= layer.scale
        elif layer.kind == "route":
            cur = cur_by_index[layer.route_from[0]]
        elif layer.kind == "shortcut":
            cur = cur_by_index[layer.shortcut_from]
        elif layer.kind == "yolo":
            strides.append(cur)
        cur_by_index[i] = cur
    return strides


def describe_network(net: Network, img_size: Optional[int] = None) -> str:
    """Human-readable layer table (the reference's ``print_cfg``,
    cfg.py:58-173): per-layer filters/size/stride and activation-map
    shapes, plus totals."""
    size = img_size if img_size is not None else net.width
    lines = ["layer      type           filters  size/str      output"]
    hw = size
    hw_by_index = {}
    ch_by_index = {}
    ch = net.channels
    n_params = 0
    for i, layer in enumerate(net.layers):
        if layer.kind == "convolutional":
            s = layer.conv
            hw = (hw + 2 * s.pad - s.size) // s.stride + 1
            ch = s.filters
            n_params += s.size * s.size * s.in_ch * s.filters + (
                4 * s.filters if s.bn else s.filters)
            desc = (f"conv{'+bn' if s.bn else '   '}      {s.filters:5d}"
                    f"  {s.size}x{s.size}/{s.stride}")
        elif layer.kind == "maxpool":
            hw = hw // layer.pool_stride
            desc = (f"maxpool            "
                    f"  {layer.pool_size}x{layer.pool_size}/"
                    f"{layer.pool_stride}")
        elif layer.kind == "upsample":
            hw = hw * layer.scale
            desc = f"upsample             x{layer.scale}    "
        elif layer.kind == "route":
            hw = hw_by_index[layer.route_from[0]]
            ch = sum(ch_by_index[s] for s in layer.route_from)
            desc = ("route " + ",".join(str(s) for s in layer.route_from)
                    ).ljust(26)
        elif layer.kind == "shortcut":
            hw = hw_by_index[layer.shortcut_from]
            ch = ch_by_index[layer.shortcut_from]
            desc = f"shortcut {layer.shortcut_from}".ljust(26)
        else:  # yolo
            desc = f"yolo mask={','.join(map(str, layer.mask))}".ljust(26)
        hw_by_index[i] = hw
        ch_by_index[i] = ch
        lines.append(f"{i:5d}  {desc:32s}  {hw:4d}x{hw:<4d}x{ch}")
    lines.append(f"total conv parameters: {n_params:,}")
    return "\n".join(lines)
