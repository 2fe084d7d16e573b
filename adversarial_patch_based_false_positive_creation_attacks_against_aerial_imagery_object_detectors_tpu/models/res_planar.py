"""Planar-Pallas fast path for the 152^2 residual stage (layers 6-11).

The two residual blocks after the stem (conv 1x1 128->64, conv 3x3
64->128, shortcut — twice; reference darknet_v3.py:9-100 builds them
from cfg/yolov3-dota.cfg) are the next bandwidth-bound region after the
stem: XLA's backward at 152^2 flip-flops W-minor/C-minor conv layouts
between its own dgrad convs (profiled ~3.4 ms/step of layout copies +
add_any fusions at b24, tools/step_profile.py), and the leaky backward
masks are separate elementwise passes. Running the stage on the planar
kernels (ops/planar_conv.py) pins ONE layout end to end and fuses each
mask into the producing conv's epilogue (``gate``).

Everything here is stride-1, so the backward is the clean flipped-kernel
planar-conv chain — none of the stem's zero-interleave s2 adjoints.

Forward keeps the pre-residual conv outputs (their SIGN is the leaky
mask the backward needs; recovering them as y8-y5 post hoc could flip
signs near zero under fp rounding, so they are saved as computed).
Only the patch is ever differentiated (reference train_patch.py:131),
so parameter cotangents are symbolic zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.planar_conv import from_planar_auto, planar_conv, to_planar_auto

# layer indices of the stage in the yolov3 block list
RES152_CONVS = (6, 7, 9, 10)
_STAGE = range(6, 12)


def res152_applicable(net, params, x_shape) -> bool:
    """Layers 6..11 must be two stride-1 leaky residual blocks
    (conv 1x1 c->c/2, conv 3x3 c/2->c, shortcut) over BN-folded params,
    with nothing outside the stage consuming its internals."""
    if len(net.layers) < 12:
        return False
    kinds = [net.layers[i].kind for i in _STAGE]
    if kinds != ["convolutional", "convolutional", "shortcut"] * 2:
        return False
    c_in = net.layers[5].conv.filters if net.layers[5].conv else 0
    convs = [net.layers[i].conv for i in RES152_CONVS]
    geom = [(c.size, c.stride, c.filters) for c in convs]
    half = c_in // 2
    if geom != [(1, 1, half), (3, 1, c_in)] * 2:
        return False
    if any(c.activation != "leaky" for c in convs):
        return False
    if (net.layers[8].shortcut_from != 5
            or net.layers[11].shortcut_from != 8):
        return False
    if any("gamma" in params.get(f"conv_{i}", {}) for i in RES152_CONVS):
        return False
    # nothing outside 6..11 may consume the stage's internals (5..10)
    for l in net.layers[12:]:
        if any(5 <= s < 11 for s in l.route_from) or 5 <= l.shortcut_from < 11:
            return False
    return True


def _stage_params(params, compute_dtype):
    out = []
    for i in RES152_CONVS:
        p = params[f"conv_{i}"]
        out.append((p["w"].astype(compute_dtype),
                    p["b"].astype(jnp.float32)))
    return out


def _flip_t(w):
    """HWIO kernel of the input-gradient conv: spatial flip + ci<->co."""
    return jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)


def _mask(g, post):
    """leaky' from the post-activation sign (leaky is monotone and
    sign-preserving). Planar zero borders stay zero."""
    return g * jnp.where(post > 0, 1.0, 0.1).astype(g.dtype)


def _forward(xp, sp, interpret=False):
    """xp: planar [B, H, C, Wl]. Returns (y11, a, post7, c, post10)."""
    (w6, b6), (w7, b7), (w9, b9), (w10, b10) = sp
    a = planar_conv(xp, w6, b6, k=1, interpret=interpret)
    post7 = planar_conv(a, w7, b7, k=3, interpret=interpret)
    y8 = post7 + xp
    c = planar_conv(y8, w9, b9, k=1, interpret=interpret)
    post10 = planar_conv(c, w10, b10, k=3, interpret=interpret)
    return post10 + y8, a, post7, c, post10


@jax.custom_vjp
def res152_planar(x, sp):
    """NHWC [B, H, W, C] -> NHWC [B, H, W, C], layers 6-11. The
    NHWC<->planar conversions live INSIDE the custom_vjp: the MXU
    conversion kernels (planar_conv.to_planar_mxu/from_planar_mxu) have
    no autodiff rules, and their adjoints are each other (both are
    exact permutations-with-zero-pad)."""
    y11, *_ = _forward(to_planar_auto(x), sp)
    return from_planar_auto(y11, x.shape[2], x.shape[3])


def _res_fwd(x, sp):
    y11, a, post7, c, post10 = _forward(to_planar_auto(x), sp)
    out = from_planar_auto(y11, x.shape[2], x.shape[3])
    return out, (sp, a, post7, c, post10, x.shape[2], x.shape[3])


def _res_bwd(resid, g11_nhwc, interpret=False):
    """Input-cotangent chain: flipped-kernel planar convs with the leaky
    masks fused into the producing conv's epilogue (``gate``) wherever
    the cotangent is consumed exactly once; the two shortcut branch
    points (g11, g8) are consumed raw twice so their masks stay
    elementwise."""
    sp, a, post7, c, post10, w_img, c_img = resid
    g11 = to_planar_auto(g11_nhwc)
    (w6, _), (w7, _), (w9, _), (w10, _) = sp

    def zb(w):
        return jnp.zeros(w.shape[-1], jnp.float32)

    g_pre10 = _mask(g11, post10)
    w10t = _flip_t(w10)
    # gate=c folds g_pre9 = (W10^T g_pre10) * leaky'(pre9) into one call
    g_pre9 = planar_conv(g_pre10, w10t, zb(w10t), k=3, slope=None,
                         gate=c, interpret=interpret)
    w9t = _flip_t(w9)
    g8 = planar_conv(g_pre9, w9t, zb(w9t), res=g11, k=1, slope=None,
                     interpret=interpret)
    g_pre7 = _mask(g8, post7)
    w7t = _flip_t(w7)
    g_pre6 = planar_conv(g_pre7, w7t, zb(w7t), k=3, slope=None,
                         gate=a, interpret=interpret)
    w6t = _flip_t(w6)
    g_xp = planar_conv(g_pre6, w6t, zb(w6t), res=g8, k=1, slope=None,
                       interpret=interpret)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, sp)
    return from_planar_auto(g_xp, w_img, c_img), zeros


res152_planar.defvjp(_res_fwd, _res_bwd)


# ---------------------------------------------------------------------------
# Whole-stage megakernel variant (ops/res_fused.py)
# ---------------------------------------------------------------------------

def _pick_s(h: int) -> int:
    for s in (8, 4, 2):
        if h % s == 0:
            return s
    raise ValueError(f"stage height {h} not even")


def fused_res_applicable(net, params, x_shape) -> bool:
    """res152_applicable plus the megakernel's own constraints: the
    yolov3 width of record (128) and an even stage height."""
    from ..ops.res_fused import CIN
    if not res152_applicable(net, params, x_shape):
        return False
    if net.layers[5].conv.filters != CIN:
        return False
    h = x_shape[1] // 4  # stage resolution after the s4 stem
    return h % 2 == 0 and x_shape[1] == x_shape[2]


@jax.custom_vjp
def res152_fused_stage(x, sp):
    """NHWC [B, H, W, 128] -> NHWC, layers 6-11 via the whole-stage
    megakernels (one pallas_call per direction; conversions inside the
    custom_vjp as in res152_planar). The differentiable path's forward
    additionally exports int8 leaky'-sign masks that the saved-mask
    backward consumes (no recompute; the chain only needs gates)."""
    from ..ops import res_fused as RF
    fwd_ops, _ = RF.res_weights(sp, dtype=x.dtype)
    y11p = RF.res152_fused(to_planar_auto(x), fwd_ops,
                           s=_pick_s(x.shape[1]), wq=x.shape[2])
    return from_planar_auto(y11p, x.shape[2], x.shape[3])


def _fused_fwd(x, sp):
    from ..ops import res_fused as RF
    fwd_ops, bwd_ops = RF.res_weights(sp, dtype=x.dtype)
    y11p, *masks = RF.res152_fused(
        to_planar_auto(x), fwd_ops, s=_pick_s(x.shape[1]),
        wq=x.shape[2], save=True)
    return (from_planar_auto(y11p, x.shape[2], x.shape[3]),
            (tuple(masks), bwd_ops, sp, x.shape[2], x.shape[3]))


def _fused_bwd(resid, g):
    from ..ops import res_fused as RF
    masks, bwd_ops, sp, w_img, c_img = resid
    g11p = to_planar_auto(g.astype(bwd_ops[0].dtype))
    g5p = RF.res152_fused_grad(g11p, masks, bwd_ops,
                               s=_pick_s(g11p.shape[1]), wq=w_img)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, sp)
    return from_planar_auto(g5p, w_img, c_img), zeros


res152_fused_stage.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Boundary-widened variant: planar-direct stem handoff + conv12 inside
# ---------------------------------------------------------------------------

def c12_applicable(net, params, x_shape) -> bool:
    """fused_res_applicable plus: layer 12 is the stride-2 3x3 leaky
    conv 128->256 (BN-folded), and nothing outside 6..12 consumes the
    stage internals INCLUDING layer 11 (it becomes kernel-internal)."""
    if not fused_res_applicable(net, params, x_shape):
        return False
    if len(net.layers) < 13 or net.layers[12].kind != "convolutional":
        return False
    c12 = net.layers[12].conv
    if (c12.size, c12.stride, c12.filters) != (3, 2, 256) or \
            c12.activation != "leaky":
        return False
    if "gamma" in params.get("conv_12", {}):
        return False
    for l in net.layers[13:]:
        if any(5 <= s < 12 for s in l.route_from) or \
                5 <= l.shortcut_from < 12:
            return False
    # conv12's in-kernel dgrad splits each stage stripe at h/2, so the
    # picked stripe size must itself halve into a multi-row g12 stripe
    # (s in {8, 4}; _pick_s's s=2 fallback would hand the halo pattern
    # a width-1 g12 stripe, which is untested).
    return _pick_s(x_shape[1] // 4) % 4 == 0


def _conv12(y11, w12, b12):
    prec = (jax.lax.Precision.HIGHEST if y11.dtype == jnp.float32
            else None)
    z = jax.lax.conv_general_dilated(
        y11, w12.astype(y11.dtype), (2, 2), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec) + b12.astype(jnp.float32).astype(y11.dtype)
    return z


@jax.custom_vjp
def res152_c12_fused(y5p, sp, w12, b12):
    """PLANAR y5 [B, H, 128, Wl] (from stem_fused.fused_stem_planar)
    -> NHWC y12 [B, H/2, W/2, 256]: the 152^2 stage megakernel chained
    DIRECTLY on the stem's planar output (no NHWC round trip at the
    boundary), with conv12 + leaky as the XLA forward tail. The
    backward consumes g12 — HALF the HBM bytes of g11 — and computes
    conv12's stride-2 input cotangent INSIDE the fused stage kernel
    (ops/res_fused.res152_fused_grad12), returning a PLANAR g5 for the
    stem backward to consume directly."""
    from ..ops import res_fused as RF
    fwd_ops, _ = RF.res_weights(sp, dtype=y5p.dtype)
    h = y5p.shape[1]
    y11p = RF.res152_fused(y5p, fwd_ops, s=_pick_s(h), wq=h)
    y11 = from_planar_auto(y11p, h, 128)
    z12 = _conv12(y11, w12, b12)
    return jnp.where(z12 > 0, z12, 0.1 * z12)


def _c12_fwd(y5p, sp, w12, b12):
    from ..ops import res_fused as RF
    fwd_ops, bwd12_ops = RF.res12_weights(sp, w12, dtype=y5p.dtype)
    h = y5p.shape[1]
    y11p, *masks = RF.res152_fused(y5p, fwd_ops, s=_pick_s(h), wq=h,
                                   save=True)
    y11 = from_planar_auto(y11p, h, 128)
    z12 = _conv12(y11, w12, b12)
    y12 = jnp.where(z12 > 0, z12, 0.1 * z12)
    m12 = (z12 > 0).astype(jnp.int8)
    return y12, (tuple(masks), bwd12_ops, m12, h, sp, w12, b12)


def _c12_bwd(resid, g12):
    from ..ops import res_fused as RF
    masks, bwd12_ops, m12, h, sp, w12, b12 = resid
    dt = bwd12_ops[0].dtype
    gp12 = (g12.astype(dt)
            * jnp.where(m12 > 0, 1.0, 0.1).astype(dt))
    g5p = RF.res152_fused_grad12(to_planar_auto(gp12), masks,
                                 bwd12_ops, s=_pick_s(h), wq=h)
    zeros_sp = jax.tree_util.tree_map(jnp.zeros_like, sp)
    return (g5p, zeros_sp, jnp.zeros_like(w12), jnp.zeros_like(b12))


res152_c12_fused.defvjp(_c12_fwd, _c12_bwd)
