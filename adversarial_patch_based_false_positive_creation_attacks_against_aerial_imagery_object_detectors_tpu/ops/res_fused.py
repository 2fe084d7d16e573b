"""Fused stripe-pipelined Pallas megakernels for the 152^2 residual
stage (yolov3 layers 6-11: conv 1x1 c->c/2, conv 3x3 c/2->c, shortcut,
twice).

Why a megakernel: XLA runs this stage at ~9 ms of a 74 ms b24 step
(per-conv near roofline would be ~2.7 incl. dgrads) plus ~3.4 ms of
W/C-minor layout flip-flop copies between its own dgrad convs, and the
per-layer planar version (models/res_planar.py) measured WORSE than XLA
(26.6 vs 23.6 ms/step at b8): its inter-layer HBM round trips pay a
+68% lane-padding tax per tensor. One pallas_call per direction keeps
every intermediate in VMEM.

Design rules (each measured here or in ops/stem_fused.py):
- Python-unrolled row loops (fori_loop serializes Mosaic pipelining).
- Paired-row blocked matmuls over block-sparse weight matrices: each
  3x3 conv processes TWO output rows per MXU dot ([256, 768] against a
  linear write-once shifted-tap cache); each 1x1 conv pair is one
  block-diagonal [128, 256] dot against two stacked planar rows.
- Body-only stores: planar border/tail lanes are zeroed ONCE (first
  two grid steps — out buffers are double-buffered) and never written
  again; the first cut's 3-store rows (body + 2 border zeroes) made
  the kernels op-issue-bound (fwd 1.2 ms at b8 for 0.14 ms of FLOPs).
- The backward consumes int8 leaky'-sign masks EXPORTED by the
  forward instead of rematerializing activations: the cotangent chain
  only needs gates, never values (only the patch is differentiated —
  reference train_patch.py:131 — so there are no weight gradients
  either). The remat variant measured 3.1 ms vs ~1.2 ms of transpose
  FLOPs; masks cost the forward one int8 store per row and ~0.2 ms of
  HBM round trip.

Layout: planar rows [B, H, C, Wl] (ops/planar_conv.to_planar format:
lane 0 and lane wq+1 are zero borders). The stage is fully stride-1 so
every tensor shares one geometry. Semantics match the XLA NHWC chain
exactly up to f32-accumulation rounding (tests/test_res_fused.py).
Reference analog: stock torch Conv2d+BN+Leaky blocks
(darknet_v3.py:9-100); this file exists purely for TPU speed-of-light.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem_fused import (LEAKY, _blkw, _halo_copy_multi, _in_range,
                         _shift_block, _store_out_row)

CIN = 128   # stage width (yolov3: 128); MID = CIN // 2


def _w1x1_pair(wm):
    """Block-diagonal pair matrix [2*cout, 2*cin] for a 1x1 conv
    ([cout, cin] ``wm``) applied to two stacked planar rows."""
    co, ci = wm.shape
    return _blkw((2 * co, 2 * ci), [(0, 0, wm), (co, ci, wm)],
                 jnp.float32)


def _w3x3_pair(w):
    """Pair matrix [2*cout, 4*3*cin] for a 3x3 s1 conv (HWIO ``w``)
    over a linear cache of [3 lane-shifts x cin] row blocks (the
    _w3_pair convention of ops/stem_fused.py)."""
    ci, co = w.shape[2], w.shape[3]
    blk = 3 * ci
    entries = []
    for r in range(2):
        for dy in range(3):
            for dx in range(3):
                entries.append((r * co, (r + dy) * blk + dx * ci,
                                w[dy, dx].T))
    return _blkw((2 * co, 4 * blk), entries, jnp.float32)


def _flip_t(w):
    return jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)


def _w12dx_pair(w12):
    """conv12-dx pair matrix [512, 1024] for the stride-2 3x3 conv INTO
    76^2 (yolov3 layer 12, 128->256) whose input cotangent is the
    dominant 152^2-shaped work left outside the stage boundary (the
    round-3 megakernel post-mortem). Rows [evenE, oddE, evenO, oddO]
    (128 cin each), cols (block: [g(t) sl1, g(t) sl2, g(t+1) sl1,
    g(t+1) sl2], cout256). Identical stride-2 adjoint parity calculus
    to stem_fused._w5dx_pair: even output rows take the dy=1 taps of
    g12 row t; odd rows take dy=2 of t and dy=0 of t+1; even lanes
    take dx=1, odd lanes dx=2 (@sl1) and dx=0 (@sl2)."""
    b = {("p", 1): 0, ("p", 2): 256, ("p1", 1): 512, ("p1", 2): 768}
    return [
        (0, b[("p", 1)], w12[1, 1]),                     # evenE
        (128, b[("p1", 1)], w12[0, 1]),                  # oddE
        (128, b[("p", 1)], w12[2, 1]),
        (256, b[("p", 2)], w12[1, 0]),                   # evenO
        (256, b[("p", 1)], w12[1, 2]),
        (384, b[("p1", 2)], w12[0, 0]),                  # oddO
        (384, b[("p1", 1)], w12[0, 2]),
        (384, b[("p", 2)], w12[2, 0]),
        (384, b[("p", 1)], w12[2, 2]),
    ]


def _bias_pair(b):
    return jnp.concatenate([b, b]).astype(jnp.float32)[:, None]


def res_weights(sp, dtype=jnp.bfloat16):
    """Kernel operands from [(w6, b6), (w7, b7), (w9, b9), (w10, b10)]
    HWIO/bias params (BN-folded). Returns (fwd_ops, bwd_ops)."""
    (w6, b6), (w7, b7), (w9, b9), (w10, b10) = sp
    fwd = (_w1x1_pair(w6[0, 0].T).astype(dtype),
           _w3x3_pair(w7).astype(dtype),
           _w1x1_pair(w9[0, 0].T).astype(dtype),
           _w3x3_pair(w10).astype(dtype),
           _bias_pair(b6), _bias_pair(b7),
           _bias_pair(b9), _bias_pair(b10))
    w6t, w7t = _flip_t(w6), _flip_t(w7)
    w9t, w10t = _flip_t(w9), _flip_t(w10)
    bwd = (_w1x1_pair(w6t[0, 0].T).astype(dtype),
           _w3x3_pair(w7t).astype(dtype),
           _w1x1_pair(w9t[0, 0].T).astype(dtype),
           _w3x3_pair(w10t).astype(dtype))
    return fwd, bwd


def res12_weights(sp, w12, dtype=jnp.bfloat16):
    """(fwd_ops, bwd12_ops) for the conv12-widened stage: the stage
    operands of ``res_weights`` plus the conv12 dgrad pair matrix
    (RAW HWIO w12 [3,3,128,256]; the stride-2 flip is baked into the
    parity table, like stem_fused._w5dx_pair)."""
    fwd, bwd = res_weights(sp, dtype)
    w12dx = _blkw((512, 1024), _w12dx_pair(w12), dtype)
    return fwd, (w12dx,) + bwd


def _store_body(ref, i, y, wq, scale=None):
    """Body-lane-only store into planar row i of a 3-D [rows, C, Wl]
    buffer whose border/tail lanes were zeroed up front."""
    if scale is not None:
        y = y * scale
    ref[pl.ds(i, 1), :, 1:wq + 1] = y[None].astype(ref.dtype)


def _store_body4(ref, i, y, wq, scale=None):
    """Blocked 4-D [1, rows, C, Wl] OUTPUT store. Output windows are
    revolving buffers (not persistent like scratch), so borders are
    written every time."""
    if scale is not None:
        y = y * scale
    _store_out_row(ref, i, y, wq)


def _zero_edges(refs3, wq):
    """Zero border + tail lanes of persistent SCRATCH buffers once, on
    the first grid step; body-only stores never touch them again.
    (Blocked outputs are revolving buffers and get full-row stores
    instead.)"""
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        for ref in refs3:
            ref[:, :, 0:1] = jnp.zeros_like(ref[:, :, 0:1])
            ref[:, :, wq + 1:] = jnp.zeros_like(ref[:, :, wq + 1:])


def _conv1x1_pairs(dst, src, wd, bias, *, n_out, base, h, wq, prec,
                   src_off=0, res=None, res_off=0, slope=True):
    """dst rows [0, n_out) = act(wd @ [src row pair]) (+ res), in-range
    scaled, body stores. src row for dst row i is i + src_off."""
    c2 = wd.shape[0]
    co = c2 // 2
    for p in range(n_out // 2):
        i = 2 * p
        x2 = src[pl.ds(i + src_off, 2)]
        x2 = x2.reshape(x2.shape[1] * 2, x2.shape[2])
        acc = jnp.dot(wd[:], x2[:, 1:wq + 1], precision=prec,
                      preferred_element_type=jnp.float32)
        y = acc + bias[:] if bias is not None else acc
        if slope:
            y = jnp.maximum(y, y * LEAKY)
        for r in range(2):
            yr = y[r * co:(r + 1) * co]
            if res is not None:
                yr = yr + res[pl.ds(i + r + res_off, 1)][0][
                    :, 1:wq + 1].astype(jnp.float32)
            _store_body(dst, i + r, yr, wq,
                        scale=_in_range(base, i + r, h))


def _conv3x3_pairs(dst, src, sh, wp, bias, *, n_out, n_src, base, h,
                   wq, prec, sl, gate=None, gate_off=0, slope=True,
                   dst4=None):
    """dst rows [0, n_out) = act(3x3 conv of src) via one paired dot
    per row pair against a linear shifted-tap cache; optional int8
    leaky' ``gate`` multiply (backward masks), in-range scaled.
    dst row i consumes src rows i..i+2 (caller aligns offsets).
    ``dst4``: store into a blocked 4-D output instead."""
    ci = src.shape[1]
    blk = 3 * ci
    co = wp.shape[0] // 2
    for r in range(n_src):
        _shift_block(sh, r * blk, src, r, wq, sl)
    for p in range(n_out // 2):
        i = 2 * p
        acc = jnp.dot(wp[:], sh[i * blk:(i + 4) * blk, :wq],
                      precision=prec, preferred_element_type=jnp.float32)
        y = acc + bias[:] if bias is not None else acc
        if slope:
            y = jnp.maximum(y, y * LEAKY)
        for r in range(2):
            yr = y[r * co:(r + 1) * co]
            if gate is not None:
                g = gate[pl.ds(i + r + gate_off, 1)][0][:, 1:wq + 1]
                yr = yr * jnp.where(g.astype(jnp.float32) > 0, 1.0,
                                    LEAKY)
            if dst4 is not None:
                _store_body4(dst4, i + r, yr, wq)
            else:
                _store_body(dst, i + r, yr, wq,
                            scale=_in_range(base, i + r, h))


def _sgn_rows(dst4, src, lo, n, wq):
    """Export int8 leaky'-sign masks of src rows [lo, lo+n) into a
    blocked [1, n, C, Wl] int8 output (all lanes — src borders are
    zero so border masks are 0; compare in f32, Mosaic has no
    packed-bf16 predicate)."""
    del wq
    v = src[pl.ds(lo, n)]
    dst4[0] = (v.astype(jnp.float32) > 0).astype(jnp.int8)


def _fwd_kernel(xp_hbm, w6d, w7p, w9d, w10p, b6d, b7d, b9d, b10d,
                *refs, s, h, n_stripes, wq, prec, save):
    if save:
        (y11_out, am_o, p7m_o, cm_o, p10m_o,
         x_loc, a_loc, p7_loc, y8_loc, c_loc, p10_loc, sh, sem) = refs
        refs4 = (y11_out, am_o, p7m_o, cm_o, p10m_o)
    else:
        (y11_out, x_loc, a_loc, p7_loc, y8_loc, c_loc, p10_loc, sh,
         sem) = refs
        refs4 = (y11_out,)
    b = pl.program_id(0)
    rb = pl.program_id(1)
    base = rb * s - 2
    sl = (slice(0, wq), slice(1, wq + 1), slice(2, wq + 2))
    _zero_edges((a_loc, p7_loc, y8_loc, c_loc, p10_loc), wq)
    _halo_copy_multi([(xp_hbm, x_loc, 2, 2, s, h)], sem, b,
                     n_stripes=n_stripes)
    # a rows base-2.. (s+4)
    _conv1x1_pairs(a_loc, x_loc, w6d, b6d, n_out=s + 4, base=base,
                   h=h, wq=wq, prec=prec)
    # post7 rows base-1.. (s+2)
    _conv3x3_pairs(p7_loc, a_loc, sh, w7p, b7d, n_out=s + 2,
                   n_src=s + 4, base=base + 1, h=h, wq=wq, prec=prec,
                   sl=sl)
    # y8 rows base-1.. (s+2) = post7 + x (x local row j+1)
    for j in range(s + 2):
        _store_body(
            y8_loc, j,
            (p7_loc[pl.ds(j, 1)][0][:, 1:wq + 1].astype(jnp.float32)
             + x_loc[pl.ds(j + 1, 1)][0][:, 1:wq + 1].astype(
                 jnp.float32)),
            wq, scale=_in_range(base + 1, j, h))
    # c rows base-1.. (s+2)
    _conv1x1_pairs(c_loc, y8_loc, w9d, b9d, n_out=s + 2, base=base + 1,
                   h=h, wq=wq, prec=prec)
    # post10 rows base.. (s)
    _conv3x3_pairs(p10_loc, c_loc, sh, w10p, b10d, n_out=s,
                   n_src=s + 2, base=base + 2, h=h, wq=wq, prec=prec,
                   sl=sl)
    # y11 = post10 + y8 (y8 local row r+1)
    for r in range(s):
        _store_body4(
            y11_out, r,
            (p10_loc[pl.ds(r, 1)][0][:, 1:wq + 1].astype(jnp.float32)
             + y8_loc[pl.ds(r + 1, 1)][0][:, 1:wq + 1].astype(
                 jnp.float32)),
            wq)
    if save:
        # int8 leaky' sign masks of the stripe's own rows (the backward
        # gates; values are never needed)
        _sgn_rows(am_o, a_loc, 2, s, wq)
        _sgn_rows(p7m_o, p7_loc, 1, s, wq)
        _sgn_rows(cm_o, c_loc, 1, s, wq)
        _sgn_rows(p10m_o, p10_loc, 0, s, wq)


def _gate_i8(y, mask, i, wq):
    m = mask[pl.ds(i, 1)][0][:, 1:wq + 1]
    return y * jnp.where(m.astype(jnp.float32) > 0, 1.0, LEAKY)


def _bwd_kernel(g11_hbm, am_hbm, p7m_hbm, cm_hbm, p10m_hbm,
                w6td, w7tp, w9td, w10tp, g5_out,
                g11_loc, am, p7m, cm, p10m, gp10_loc, gp9_loc, g8_loc,
                gp6_loc, sh, sem, *, s, h, n_stripes, wq, prec):
    """Saved-mask input-cotangent chain — no activation recompute; the
    five inputs are the output cotangent and the forward's int8 gates."""
    b = pl.program_id(0)
    rb = pl.program_id(1)
    _zero_edges((gp10_loc, gp9_loc, g8_loc, gp6_loc), wq)
    _halo_copy_multi([(g11_hbm, g11_loc, 2, 2, s, h),
                      (am_hbm, am, 0, 0, s, h),
                      (p7m_hbm, p7m, 1, 1, s, h),
                      (cm_hbm, cm, 1, 1, s, h),
                      (p10m_hbm, p10m, 2, 2, s, h)], sem, b,
                     n_stripes=n_stripes)
    _stage_chain(g11_loc, am, p7m, cm, p10m, w6td, w7tp, w9td, w10tp,
                 g5_out, gp10_loc, gp9_loc, g8_loc, gp6_loc, sh,
                 s=s, h=h, rb=rb, wq=wq, prec=prec)


def _bwd12_kernel(g12_hbm, am_hbm, p7m_hbm, cm_hbm, p10m_hbm,
                  w12dx, se12_t, so12_t, w6td, w7tp, w9td, w10tp,
                  g5_out,
                  g12b, g11_loc, am, p7m, cm, p10m, gp10_loc, gp9_loc,
                  g8_loc, gp6_loc, sh, sem, *,
                  s, h, n_stripes, wq, wq12, prec):
    """Boundary-widened saved-mask backward: consumes the PRE-GATED
    conv12 cotangent g_pre12 (76^2, 256ch planar — HALF the HBM input
    bytes of g11) and computes conv12's stride-2 input cotangent
    in-kernel (conv5-dx pattern: paired phase dots + one-hot lane
    interleave) before the stage chain. This moves the dominant
    152^2-shaped dgrad of the step INSIDE the fused stage boundary."""
    b = pl.program_id(0)
    rb = pl.program_id(1)
    _zero_edges((g11_loc, gp10_loc, gp9_loc, g8_loc, gp6_loc), wq)
    _halo_copy_multi([(g12_hbm, g12b, 1, 2, s // 2, h // 2),
                      (am_hbm, am, 0, 0, s, h),
                      (p7m_hbm, p7m, 1, 1, s, h),
                      (cm_hbm, cm, 1, 1, s, h),
                      (p10m_hbm, p10m, 2, 2, s, h)], sem, b,
                     n_stripes=n_stripes)
    # conv12-dx: g11 rows [rb*s-2, rb*s+s+2) from g12 rows
    # [rb*s/2-1, rb*s/2+s/2+2). Cache: two lane-shift blocks (256ch)
    # per g12 buffer row; one [512, 1024] dot per g11 row pair, then
    # two one-hot interleave dots merge the even/odd lane phases.
    n_g12 = s // 2 + 3
    for r in range(n_g12):
        g = g12b[pl.ds(r, 1)][0]
        sh[(2 * r) * 256:(2 * r + 1) * 256, :wq12] = g[:, 1:wq12 + 1]
        sh[(2 * r + 1) * 256:(2 * r + 2) * 256, :wq12] = g[:, 2:wq12 + 2]
    base11 = rb * s - 2
    for t in range(s // 2 + 2):
        out = jnp.dot(w12dx[:], sh[2 * t * 256:(2 * t + 4) * 256, :wq12],
                      precision=prec,
                      preferred_element_type=jnp.float32)  # [512, wq12]
        gpair = (jnp.dot(out[0:256].astype(g11_loc.dtype), se12_t[:],
                         precision=prec,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(out[256:512].astype(g11_loc.dtype), so12_t[:],
                           precision=prec,
                           preferred_element_type=jnp.float32))
        _store_body(g11_loc, 2 * t, gpair[0:CIN], wq,
                    scale=_in_range(base11, 2 * t, h))
        _store_body(g11_loc, 2 * t + 1, gpair[CIN:2 * CIN], wq,
                    scale=_in_range(base11, 2 * t + 1, h))
    _stage_chain(g11_loc, am, p7m, cm, p10m, w6td, w7tp, w9td, w10tp,
                 g5_out, gp10_loc, gp9_loc, g8_loc, gp6_loc, sh,
                 s=s, h=h, rb=rb, wq=wq, prec=prec)


def _stage_chain(g11_loc, am, p7m, cm, p10m, w6td, w7tp, w9td, w10tp,
                 g5_out, gp10_loc, gp9_loc, g8_loc, gp6_loc, sh, *,
                 s, h, rb, wq, prec):
    """The layers-11..6 input-cotangent chain, shared by the g11-fed
    and g12-fed (conv12-widened) backward kernels. Expects g11_loc rows
    [0, s+4) = g11 rows [rb*s-2, rb*s+s+2) (zero out of range)."""
    sl = (slice(0, wq), slice(1, wq + 1), slice(2, wq + 2))
    # g_pre10 rows base-2.. (s+4) = g11 * leaky'(post10)
    for k in range(s + 4):
        g = g11_loc[pl.ds(k, 1)][0][:, 1:wq + 1].astype(jnp.float32)
        _store_body(gp10_loc, k, _gate_i8(g, p10m, k, wq), wq,
                    scale=_in_range(rb * s - 2, k, h))
    # g_pre9 rows base-1.. (s+2): W10^T over gp10, gated by leaky'(c)
    _conv3x3_pairs(gp9_loc, gp10_loc, sh, w10tp, None, n_out=s + 2,
                   n_src=s + 4, base=rb * s - 1, h=h, wq=wq, prec=prec,
                   sl=sl, gate=cm, gate_off=0, slope=False)
    # g8 rows base-1.. (s+2) = W9^T gp9 + g11 (g11 local row j+1)
    _conv1x1_pairs(g8_loc, gp9_loc, w9td, None, n_out=s + 2,
                   base=rb * s - 1, h=h, wq=wq, prec=prec,
                   res=g11_loc, res_off=1, slope=False)
    # g_pre7 rows base-1.. (s+2) = g8 * leaky'(post7): overwrite g11
    # (dead once g8 holds the residual sum)
    for j in range(s + 2):
        g = g8_loc[pl.ds(j, 1)][0][:, 1:wq + 1].astype(jnp.float32)
        _store_body(g11_loc, j, _gate_i8(g, p7m, j, wq), wq,
                    scale=_in_range(rb * s - 1, j, h))
    # g_pre6 rows base.. (s): W7^T over gp7 (= g11 rows), gated by
    # leaky'(a)
    _conv3x3_pairs(gp6_loc, g11_loc, sh, w7tp, None, n_out=s,
                   n_src=s + 2, base=rb * s, h=h, wq=wq, prec=prec,
                   sl=sl, gate=am, gate_off=0, slope=False)
    # g5 rows base.. (s) = W6^T gp6 + g8 (g8 local row r+1)
    c2 = w6td.shape[0]
    co = c2 // 2
    for p in range(s // 2):
        i = 2 * p
        x2 = gp6_loc[pl.ds(i, 2)]
        x2 = x2.reshape(x2.shape[1] * 2, x2.shape[2])
        acc = jnp.dot(w6td[:], x2[:, 1:wq + 1], precision=prec,
                      preferred_element_type=jnp.float32)
        for r in range(2):
            y = (acc[r * co:(r + 1) * co]
                 + g8_loc[pl.ds(i + r + 1, 1)][0][:, 1:wq + 1].astype(
                     jnp.float32))
            _store_body4(g5_out, i + r, y, wq)


def _common(xp, s):
    b, h, c, wl = xp.shape
    assert c == CIN, (c, CIN)
    assert h % s == 0, (h, s)
    return b, h, wl, h // s


def _blocked(shape_tail, dtype, b, h):
    """(BlockSpec, ShapeDtypeStruct) for a [B, H, *tail]-shaped output
    blocked (1, s, *tail[1:]) per stripe."""
    spec = pl.BlockSpec((1,) + shape_tail,
                        lambda b_, r_: (b_, r_, 0, 0),
                        memory_space=pltpu.VMEM)
    return spec, jax.ShapeDtypeStruct((b, h) + shape_tail[1:], dtype)


@functools.partial(jax.jit,
                   static_argnames=("s", "wq", "save", "interpret"))
def res152_fused(xp, fwd_ops, *, s=8, wq, save=False, interpret=False):
    """Planar [B, H, 128, Wl] -> planar [B, H, 128, Wl] (layers 6-11).
    With ``save`` also returns the int8 leaky'-sign masks
    (a, post7, c, post10) the saved-mask backward consumes."""
    b, h, wl, n_stripes = _common(xp, s)
    mid = CIN // 2
    w6d, w7p, w9d, w10p, b6d, b7d, b9d, b10d = fwd_ops
    prec = None if xp.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    kernel = functools.partial(_fwd_kernel, s=s, h=h,
                               n_stripes=n_stripes, wq=wq, prec=prec,
                               save=save)
    outs = [_blocked((s, CIN, wl), xp.dtype, b, h)]
    if save:
        outs += [_blocked((s, mid, wl), jnp.int8, b, h),
                 _blocked((s, CIN, wl), jnp.int8, b, h),
                 _blocked((s, mid, wl), jnp.int8, b, h),
                 _blocked((s, CIN, wl), jnp.int8, b, h)]
    result = pl.pallas_call(
        kernel,
        grid=(b, n_stripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[spec for spec, _ in outs],
        out_shape=[sds for _, sds in outs],
        scratch_shapes=[
            pltpu.VMEM((s + 4, CIN, wl), xp.dtype),   # x
            pltpu.VMEM((s + 4, mid, wl), xp.dtype),   # a
            pltpu.VMEM((s + 2, CIN, wl), xp.dtype),   # post7
            pltpu.VMEM((s + 2, CIN, wl), xp.dtype),   # y8
            pltpu.VMEM((s + 2, mid, wl), xp.dtype),   # c
            pltpu.VMEM((s, CIN, wl), xp.dtype),       # post10
            pltpu.VMEM(((s + 4) * 3 * mid, wl), xp.dtype),  # tap cache
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w6d, w7p, w9d, w10p, b6d, b7d, b9d, b10d)
    return result if save else result[0]


@functools.partial(jax.jit, static_argnames=("s", "wq", "interpret"))
def res152_fused_grad(g11, masks, bwd_ops, *, s=8, wq, interpret=False):
    """Saved-mask input cotangent: (g11 planar, int8 masks) -> g5
    planar. ``masks`` = (am, p7m, cm, p10m) from the save forward."""
    b, h, wl, n_stripes = _common(g11, s)
    mid = CIN // 2
    am, p7m, cm, p10m = masks
    w6td, w7tp, w9td, w10tp = bwd_ops
    prec = (None if g11.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    kernel = functools.partial(_bwd_kernel, s=s, h=h,
                               n_stripes=n_stripes, wq=wq, prec=prec)
    cache_rows = max((s + 4) * 3 * CIN, (s + 2) * 3 * CIN)
    return pl.pallas_call(
        kernel,
        grid=(b, n_stripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, s, CIN, wl),
                               lambda b_, r_: (b_, r_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, CIN, wl), g11.dtype),
        scratch_shapes=[
            pltpu.VMEM((s + 4, CIN, wl), g11.dtype),  # g11, then gp7
            pltpu.VMEM((s, mid, wl), jnp.int8),       # a mask
            pltpu.VMEM((s + 2, CIN, wl), jnp.int8),   # post7 mask
            pltpu.VMEM((s + 2, mid, wl), jnp.int8),   # c mask
            pltpu.VMEM((s + 4, CIN, wl), jnp.int8),   # post10 mask
            pltpu.VMEM((s + 4, CIN, wl), g11.dtype),  # g_pre10
            pltpu.VMEM((s + 2, mid, wl), g11.dtype),  # g_pre9
            pltpu.VMEM((s + 2, CIN, wl), g11.dtype),  # g8
            pltpu.VMEM((s, mid, wl), g11.dtype),      # g_pre6
            pltpu.VMEM((cache_rows, wl), g11.dtype),  # tap cache
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(g11, am, p7m, cm, p10m, w6td, w7tp, w9td, w10tp)


@functools.partial(jax.jit, static_argnames=("s", "wq", "interpret"))
def res152_fused_grad12(gp12, masks, bwd12_ops, *, s=8, wq,
                        interpret=False):
    """Boundary-widened saved-mask input cotangent: the PRE-GATED
    conv12 cotangent (planar [B, H/2, 256, Wl12], g12 * leaky'(z12))
    + the stage's int8 masks -> g5 planar [B, H, 128, Wl]. conv12's
    stride-2 dgrad runs in-kernel (see _bwd12_kernel); ``bwd12_ops`` =
    ``res12_weights(...)[1]``."""
    from .stem_fused import _onehot_sel, _round_up
    b, h12, c12, wl12 = gp12.shape
    assert c12 == 2 * CIN, (c12,)
    h = 2 * h12
    wq12 = wq // 2
    assert wl12 == _round_up(wq12 + 2, 128), (wl12, wq12)
    wl = _round_up(wq + 2, 128)
    n_stripes = h // s
    assert h % s == 0 and s % 2 == 0, (h, s)
    mid = CIN // 2
    am, p7m, cm, p10m = masks
    w12dx, w6td, w7tp, w9td, w10tp = bwd12_ops
    dt = gp12.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    se12_t = _onehot_sel(wq, wq12, 2, 0, dt).T   # [wq12, wq]: u -> 2u
    so12_t = _onehot_sel(wq, wq12, 2, 1, dt).T   # u -> 2u+1
    kernel = functools.partial(_bwd12_kernel, s=s, h=h,
                               n_stripes=n_stripes, wq=wq, wq12=wq12,
                               prec=prec)
    cache_rows = max((s + 4) * 3 * CIN, (s + 6) * 2 * CIN)
    return pl.pallas_call(
        kernel,
        grid=(b, n_stripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((1, s, CIN, wl),
                               lambda b_, r_: (b_, r_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, CIN, wl), dt),
        scratch_shapes=[
            pltpu.VMEM((s // 2 + 3, 2 * CIN, wl12), dt),  # g_pre12
            pltpu.VMEM((s + 4, CIN, wl), dt),         # g11, then gp7
            pltpu.VMEM((s, mid, wl), jnp.int8),       # a mask
            pltpu.VMEM((s + 2, CIN, wl), jnp.int8),   # post7 mask
            pltpu.VMEM((s + 2, mid, wl), jnp.int8),   # c mask
            pltpu.VMEM((s + 4, CIN, wl), jnp.int8),   # post10 mask
            pltpu.VMEM((s + 4, CIN, wl), dt),         # g_pre10
            pltpu.VMEM((s + 2, mid, wl), dt),         # g_pre9
            pltpu.VMEM((s + 2, CIN, wl), dt),         # g8
            pltpu.VMEM((s, mid, wl), dt),             # g_pre6
            pltpu.VMEM((cache_rows, wl), dt),         # tap cache
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(gp12, am, p7m, cm, p10m, w12dx, se12_t, so12_t,
      w6td, w7tp, w9td, w10tp)
