"""Batch-on-lanes fused Pallas stem: whole-batch rows per MXU dot.

Same math as ops/stem_fused.py (5-conv YOLOv3 stem, forward + full
input-cotangent chain, reference analog darknet_v3.py:9-100) but the
planar rows concatenate ALL batch images on the lane axis: a row is
``[C, B*SEG]`` where each SEG-lane segment holds one image's width
(value j at in-segment lane j+1, zero borders/slack). Every paired-row
blocked matmul then runs at N = B*SEG lanes instead of 304 — the same
op count per stripe serves the whole batch, attacking the per-op bound
that left the per-batch kernels at ~11 ms fwd+bwd (b8 608^2 v5e;
ROADMAP.md round-2 table).

Differences from stem_fused.py, all in service of lane-batching:

- Grid is (n_stripes,) — batch is inside the row.
- Shifted cache rows are built by whole-row static slices
  (``cache[l] = src[l+dx-1]``): with zero borders and >=78 slack lanes
  per segment, a +-1 lane shift never leaks real data across segment
  boundaries; the two edge lanes that do go stale are killed by the
  per-segment validity mask multiplied into every store.
- conv5 runs lane-DENSE (stride-2 only in rows): computing the odd
  lane positions too costs 2x conv5 FLOPs but avoids any one-hot
  decimation matmul; XLA slices out the even lanes. The backward
  mirrors it: XLA zero-interleaves g5 lanes and rows, and conv5-dx is
  a plain stride-1 transpose conv (flipped kernel) over the dense
  cotangent.
- The backward never recomputes: the forward exports its (batched
  planar) activations and the backward halo-DMAs them per stripe.

Phase-split of the two full-resolution layers (conv0/conv1) is kept
exactly as in stem_fused (even/odd lanes as separate planar tensors),
as are all block-sparse paired-row weight builders that don't touch
conv5.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.planar_conv import _round_up
from ..ops.stem_fused import (LEAKY, _PIECES_E, _PIECES_O, _blkw, _flip_t,
                         _leaky_f32, _mask_of, _pad_cin, _pad_cout,
                         _w0_pair, _w0t_pair, _w1_pair, _w1dx_pair,
                         _w3_pair, _w3t_pair)


# ---------------------------------------------------------------------------
# XLA-side layout
# ---------------------------------------------------------------------------

def _seg(w_vals: int) -> int:
    return _round_up(w_vals + 2, 128)


def nhwc_to_batched(x: jnp.ndarray, seg: int) -> jnp.ndarray:
    """NHWC [B, H, W, C] -> batched planar [H, C, B*seg] (value j at
    segment lane j+1)."""
    b, h, w, c = x.shape
    p = jnp.zeros((b, h, c, seg), x.dtype)
    p = p.at[:, :, :, 1:w + 1].set(x.transpose(0, 1, 3, 2))
    return p.transpose(1, 2, 0, 3).reshape(h, c, b * seg)


def batched_to_nhwc(p: jnp.ndarray, bsz: int, w: int, c: int,
                    lane0: int = 1, stride: int = 1) -> jnp.ndarray:
    """Batched planar [H, C', B*seg] -> NHWC [B, H, W, c]; ``lane0`` /
    ``stride`` select the value lanes (stride=2 decimates a dense row)."""
    h, cp, tot = p.shape
    seg = tot // bsz
    q = p.reshape(h, cp, bsz, seg)[:, :c, :,
                                   lane0:lane0 + stride * w:stride]
    return q.transpose(2, 0, 3, 1)


def split_phases_b(x: jnp.ndarray, seg: int):
    """NHWC [B, H, W, C<=8] -> (E, O) batched planar, C padded to 8."""
    c = x.shape[-1]
    if c < 8:
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, 8 - c),))
    return (nhwc_to_batched(x[:, :, 0::2], seg),
            nhwc_to_batched(x[:, :, 1::2], seg))


def merge_phases_b(pe, po, bsz, w_half, c):
    e = batched_to_nhwc(pe, bsz, w_half, c)
    o = batched_to_nhwc(po, bsz, w_half, c)
    b, h, _, _ = e.shape
    return jnp.stack([e, o], axis=3).reshape(b, h, 2 * w_half, c)


def interleave_zero_cols(g: jnp.ndarray) -> jnp.ndarray:
    """NHWC [B, H, W, C] -> [B, H, 2W, C] with g at even w positions."""
    b, h, w, c = g.shape
    return jnp.stack([g, jnp.zeros_like(g)], axis=3).reshape(
        b, h, 2 * w, c)


def interleave_zero_rows(g: jnp.ndarray) -> jnp.ndarray:
    """NHWC [B, H, W, C] -> [B, 2H, W, C] with g at even h positions."""
    b, h, w, c = g.shape
    return jnp.stack([g, jnp.zeros_like(g)], axis=2).reshape(
        b, 2 * h, w, c)


def _lane_mask(bsz: int, seg: int, w_vals: int) -> jnp.ndarray:
    """[1, B*seg] f32: 1 on value lanes (1..w_vals per segment)."""
    lane = jnp.arange(seg)
    one = jnp.logical_and(lane >= 1, lane <= w_vals)
    return jnp.tile(one.astype(jnp.float32), bsz)[None]


# ---------------------------------------------------------------------------
# conv5 weight builders (lane-dense)
# ---------------------------------------------------------------------------

def _w5_pair(w5):
    """Lane-dense conv5 pair matrix [256, 960]: rows (r, cout128), cols
    (s4-row block 2r+dy, piece3=dx, cin64). Row stride 2 stays; lanes
    are computed densely (both parities)."""
    entries = []
    for r in range(2):
        for dy in range(3):
            for dx in range(3):
                entries.append((r * 128, (2 * r + dy) * 192 + dx * 64,
                                w5[dy, dx].T))
    return entries


def _w5t_pair(w5t):
    """conv5-dx over the fully zero-interleaved dense cotangent: plain
    stride-1 transpose-conv pair matrix [128, 1536]: rows (r, cin64),
    cols (gp5dd-row block r+dy, piece3=dx, cout128)."""
    entries = []
    for r in range(2):
        for dy in range(3):
            for dx in range(3):
                entries.append((r * 64, (r + dy) * 384 + dx * 128,
                                w5t[dy, dx].T))
    return entries


# ---------------------------------------------------------------------------
# Kernel helpers (batched-lane variants)
# ---------------------------------------------------------------------------

def _halo_copy_b(src, dst, sem, *, ht, hb, rps, h_src, n_stripes):
    """DMA rows [rb*rps-ht, rb*rps+rps+hb) of src into dst, zeroing
    out-of-image halo rows (no batch index — batch lives in lanes)."""
    rb = pl.program_id(0)
    rtot = rps + ht + hb
    first = rb == 0
    last = rb == n_stripes - 1

    def cp(src0, d0, n):
        c = pltpu.make_async_copy(src.at[pl.ds(src0, n)],
                                  dst.at[pl.ds(d0, n)], sem)
        c.start()
        c.wait()

    if n_stripes == 1:
        cp(0, ht, h_src)
    else:
        @pl.when(jnp.logical_and(first, jnp.logical_not(last)))
        def _():
            cp(0, ht, rtot - ht)

        @pl.when(jnp.logical_and(last, jnp.logical_not(first)))
        def _():
            cp(rb * rps - ht, 0, rtot - hb)

        @pl.when(jnp.logical_and(jnp.logical_not(first),
                                 jnp.logical_not(last)))
        def _():
            cp(rb * rps - ht, 0, rtot)

    @pl.when(first)
    def _():
        dst[0:ht] = jnp.zeros_like(dst[0:ht])

    @pl.when(last)
    def _():
        dst[rtot - hb:rtot] = jnp.zeros_like(dst[rtot - hb:rtot])


def _shiftrow(sh, r0, src, i, dxs):
    """Write len(dxs) cache blocks from row i of src: block for tap dx
    holds ``cache[l] = src_row[l + dx - 1]``. The one rolled-in edge
    lane per shifted row is explicitly zeroed — it would land on a
    masked output lane anyway, but a stale NaN there would survive the
    multiplicative store mask (NaN * 0 = NaN)."""
    row = src[pl.ds(i, 1)][0]
    c, wl = row.shape
    for k, dx in enumerate(dxs):
        r = r0 + k * c
        if dx == 0:
            sh[r:r + c, 1:wl] = row[:, 0:wl - 1]
            sh[r:r + c, 0:1] = jnp.zeros((c, 1), sh.dtype)
        elif dx == 1:
            sh[r:r + c, :] = row
        else:
            sh[r:r + c, 0:wl - 1] = row[:, 1:wl]
            sh[r:r + c, wl - 1:wl] = jnp.zeros((c, 1), sh.dtype)


def _phase_block_b(sh, r0, pe, po, i):
    """One phase-layout cache block [O dx0, E dx1, O dx1, E dx2]."""
    e = pe[pl.ds(i, 1)][0]
    o = po[pl.ds(i, 1)][0]
    c, wl = e.shape
    sh[r0 + 0 * c:r0 + 1 * c, 1:wl] = o[:, 0:wl - 1]
    sh[r0 + 0 * c:r0 + 1 * c, 0:1] = jnp.zeros((c, 1), sh.dtype)
    sh[r0 + 1 * c:r0 + 2 * c, :] = e
    sh[r0 + 2 * c:r0 + 3 * c, :] = o
    sh[r0 + 3 * c:r0 + 4 * c, 0:wl - 1] = e[:, 1:wl]
    sh[r0 + 3 * c:r0 + 4 * c, wl - 1:wl] = jnp.zeros((c, 1), sh.dtype)


def _dot_b(w_ref, sh, k, prec):
    return jnp.dot(w_ref[:], sh[0:k, :], precision=prec,
                   preferred_element_type=jnp.float32)


def _store_rowb(ref, i, y, mask, scale=None):
    """Masked store of [C, W] into row i (borders/slack/stale -> 0)."""
    m = mask[:] if scale is None else mask[:] * scale
    ref[pl.ds(i, 1)] = (y * m)[None].astype(ref.dtype)


def _in_range(base, i, h):
    g = base + i
    ok = jnp.logical_and(g >= 0, g < h)
    return ok.astype(jnp.float32)


def _pairs(n_rows, body):
    assert n_rows % 2 == 0, n_rows
    for p in range(n_rows // 2):
        body(p)


# ---------------------------------------------------------------------------
# Shared forward stages
# ---------------------------------------------------------------------------

def _compute_y0_b(xe, xo, y0e, y0o, w0p_ref, b0_ref, mask, sh, *,
                  n_rows, base, h, prec):
    bias = b0_ref[:].astype(jnp.float32)

    def pair(p):
        i = 2 * p
        for bb in range(4):
            _phase_block_b(sh, bb * 32, xe, xo, i + bb)
        y = _leaky_f32(_dot_b(w0p_ref, sh, 128, prec), bias)
        i0 = _in_range(base, i, h)
        i1 = _in_range(base, i + 1, h)
        _store_rowb(y0e, i, y[0:32], mask, scale=i0)
        _store_rowb(y0o, i, y[32:64], mask, scale=i0)
        _store_rowb(y0e, i + 1, y[64:96], mask, scale=i1)
        _store_rowb(y0o, i + 1, y[96:128], mask, scale=i1)

    _pairs(n_rows, pair)


def _compute_y123_b(y0e, y0o, y1b, y2b, y3b, w1p_ref, w2d_ref, w3p_ref,
                    b1_ref, b2_ref, b3_ref, mask, sh, *, n1, base1, n3,
                    base3, h1, prec):
    b1 = b1_ref[:].astype(jnp.float32)
    b2 = b2_ref[:].astype(jnp.float32)
    b3 = b3_ref[:].astype(jnp.float32)
    half = (lax.broadcasted_iota(jnp.int32, (128, 1), 0) < 64).astype(
        jnp.float32)
    half2 = (lax.broadcasted_iota(jnp.int32, (64, 1), 0) < 32).astype(
        jnp.float32)

    def pair1(p):
        j = 2 * p
        for bb in range(5):
            # conv1 pieces: [y0O dx0, y0E dx1, y0O dx1]
            yr = j * 2 + bb
            _shiftrow(sh, bb * 96, y0o, yr, (0,))
            _shiftrow(sh, bb * 96 + 32, y0e, yr, (1,))
            _shiftrow(sh, bb * 96 + 64, y0o, yr, (1,))
        i0 = _in_range(base1, j, h1)
        i1 = _in_range(base1, j + 1, h1)
        sv = half * i0 + (1.0 - half) * i1
        y1 = _leaky_f32(_dot_b(w1p_ref, sh, 480, prec), b1) * sv
        _store_rowb(y1b, j, y1[0:64], mask)
        _store_rowb(y1b, j + 1, y1[64:128], mask)
        y2 = _leaky_f32(jnp.dot(w2d_ref[:], y1.astype(y1b.dtype),
                                precision=prec,
                                preferred_element_type=jnp.float32), b2)
        y2 = y2 * (half2 * i0 + (1.0 - half2) * i1)
        _store_rowb(y2b, j, y2[0:32], mask)
        _store_rowb(y2b, j + 1, y2[32:64], mask)

    _pairs(n1, pair1)

    def pair3(p):
        i = 2 * p
        for bb in range(4):
            _shiftrow(sh, bb * 96, y2b, i + bb, (0, 1, 2))
        y3 = _leaky_f32(_dot_b(w3p_ref, sh, 384, prec), b3)
        _store_rowb(y3b, i, y3[0:64], mask,
                    scale=_in_range(base3, i, h1))
        _store_rowb(y3b, i + 1, y3[64:128], mask,
                    scale=_in_range(base3, i + 1, h1))

    _pairs(n3, pair3)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel_b(xe_hbm, xo_hbm, w0p, w1p, w2d, w3p, w5p,
                  b0, b1, b2, b3, b5, mask, *refs,
                  s5, h, n_stripes, prec, save):
    if save:
        (y5_out, y0e_o, y0o_o, y1_o, y2_o, y3_o,
         xe, xo, y0e, y0o, y1b, y2b, y3b, s4b, sh, sem) = refs
    else:
        (y5_out, xe, xo, y0e, y0o, y1b, y2b, y3b, s4b, sh,
         sem) = refs
    rb = pl.program_id(0)
    a = rb * s5
    h1 = h // 2

    _halo_copy_b(xe_hbm, xe, sem, ht=6, hb=6, rps=4 * s5, h_src=h,
                 n_stripes=n_stripes)
    _halo_copy_b(xo_hbm, xo, sem, ht=6, hb=6, rps=4 * s5, h_src=h,
                 n_stripes=n_stripes)

    # y0 rows [4a-5, 4b+5)
    _compute_y0_b(xe, xo, y0e, y0o, w0p, b0, mask, sh,
                  n_rows=4 * s5 + 10, base=4 * a - 5, h=h, prec=prec)
    # y1/y2 rows [2a-2, 2b+2); y3 rows [2a-1, 2b+1)
    _compute_y123_b(y0e, y0o, y1b, y2b, y3b, w1p, w2d, w3p, b1, b2, b3,
                    mask, sh, n1=2 * s5 + 4, base1=2 * a - 2,
                    n3=2 * s5 + 2, base3=2 * a - 1, h1=h1, prec=prec)

    # s4 = y3 + y1 (y1 local for y3 local i: i+1)
    for i in range(2 * s5 + 2):
        s4b[pl.ds(i, 1)] = (y3b[pl.ds(i, 1)] + y1b[pl.ds(i + 1, 1)])

    if save:
        y0e_o[:] = y0e[5:5 + 4 * s5]
        y0o_o[:] = y0o[5:5 + 4 * s5]
        y1_o[:] = y1b[2:2 + 2 * s5]
        y2_o[:] = y2b[2:2 + 2 * s5]
        y3_o[:] = y3b[1:1 + 2 * s5]

    # conv5, lane-dense (row stride 2): s4 local rows for stripe-row r:
    # 2r+dy; one [256, 960] dot per output-row pair.
    bias5 = b5[:].astype(jnp.float32)

    def pair5(p):
        r = 2 * p
        for bb in range(5):
            _shiftrow(sh, bb * 192, s4b, 2 * r + bb, (0, 1, 2))
        y = _leaky_f32(_dot_b(w5p, sh, 960, prec), bias5)
        _store_rowb(y5_out, r, y[0:128], mask)
        _store_rowb(y5_out, r + 1, y[128:256], mask)

    _pairs(s5, pair5)


def _pick_s5(h5: int, cap: int) -> int:
    for s in (cap, 8, 4, 2, 1):
        if s <= cap and h5 % s == 0:
            return s
    return 1


def _fwd_weights_b(sp, dt):
    (w0, b0), (w1, b1), (w2, b2), (w3, b3), (w5, b5) = sp
    w0p = _blkw((128, 128), _w0_pair(_pad_cin(w0)), dt)
    w1p = _blkw((128, 480), _w1_pair(w1), dt)
    w2m = w2.reshape(w2.shape[2], w2.shape[3]).T
    w2d = _blkw((64, 128), [(0, 0, w2m), (32, 64, w2m)], dt)
    w3p = _blkw((128, 384), _w3_pair(w3), dt)
    w5p = _blkw((256, 960), _w5_pair(w5), dt)
    biases = [
        jnp.tile(b0.reshape(-1, 1), (4, 1)).astype(jnp.float32),
        jnp.tile(b1.reshape(-1, 1), (2, 1)).astype(jnp.float32),
        jnp.tile(b2.reshape(-1, 1), (2, 1)).astype(jnp.float32),
        jnp.tile(b3.reshape(-1, 1), (2, 1)).astype(jnp.float32),
        jnp.tile(b5.reshape(-1, 1), (2, 1)).astype(jnp.float32),
    ]
    return w0p, w1p, w2d, w3p, w5p, biases


@functools.partial(jax.jit,
                   static_argnames=("bsz", "s5", "interpret",
                                    "save_acts"))
def fused_stem_fwd_b(xe, xo, sp, bsz: int, s5: Optional[int] = None,
                     interpret: bool = False, save_acts: bool = False):
    """Batched planar phases -> lane-dense planar y5 [H/4, 128, B*seg]
    (+ the intermediate activations when ``save_acts``)."""
    h, _, tot = xe.shape
    seg = tot // bsz
    wq = h // 2
    assert seg == _seg(wq), (seg, wq)
    h5 = h // 4
    if s5 is None:
        s5 = _pick_s5(h5, 4 if save_acts else 8)
    assert h5 % s5 == 0 and s5 % 2 == 0
    n_stripes = h5 // s5
    dt = xe.dtype
    prec = lax.Precision.HIGHEST if dt == jnp.float32 else None
    w0p, w1p, w2d, w3p, w5p, biases = _fwd_weights_b(sp, dt)
    mask = _lane_mask(bsz, seg, wq)

    kernel = functools.partial(
        _fwd_kernel_b, s5=s5, h=h, n_stripes=n_stripes, prec=prec,
        save=save_acts)
    grid = (n_stripes,)
    out_shape = jax.ShapeDtypeStruct((h5, 128, tot), dt)
    out_spec = pl.BlockSpec((s5, 128, tot), lambda r_: (r_, 0, 0),
                            memory_space=pltpu.VMEM)
    if save_acts:
        def act_out(rows_per_stripe, c, total_rows):
            return (jax.ShapeDtypeStruct((total_rows, c, tot), dt),
                    pl.BlockSpec((rows_per_stripe, c, tot),
                                 lambda r_: (r_, 0, 0),
                                 memory_space=pltpu.VMEM))
        acts = [act_out(4 * s5, 32, h), act_out(4 * s5, 32, h),
                act_out(2 * s5, 64, h // 2), act_out(2 * s5, 32, h // 2),
                act_out(2 * s5, 64, h // 2)]
        out_shape = (out_shape,) + tuple(a[0] for a in acts)
        out_spec = (out_spec,) + tuple(a[1] for a in acts)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * 2
                + [vm() for _ in range(11)])
    scratch = [
        pltpu.VMEM((4 * s5 + 12, 8, tot), dt),      # xe
        pltpu.VMEM((4 * s5 + 12, 8, tot), dt),      # xo
        pltpu.VMEM((4 * s5 + 10, 32, tot), dt),     # y0e
        pltpu.VMEM((4 * s5 + 10, 32, tot), dt),     # y0o
        pltpu.VMEM((2 * s5 + 4, 64, tot), dt),      # y1
        pltpu.VMEM((2 * s5 + 4, 32, tot), dt),      # y2
        pltpu.VMEM((2 * s5 + 2, 64, tot), dt),      # y3
        pltpu.VMEM((2 * s5 + 2, 64, tot), dt),      # s4
        pltpu.VMEM((960, tot), dt),                 # sh cache
        pltpu.SemaphoreType.DMA(()),
    ]
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(xe, xo, w0p, w1p, w2d, w3p, w5p, *biases, mask)


# ---------------------------------------------------------------------------
# Backward kernel (saved activations, pre-gated zero-interleaved gp5)
# ---------------------------------------------------------------------------

def _bwd_kernel_b(gp5_hbm, y0e_hbm, y0o_hbm, y1_hbm, y2_hbm, y3_hbm,
                  w5tp, w3tp, w2td, w1dx, w0tp, mask,
                  gxe_out, gxo_out,
                  gp5b, y0e, y0o, y1b, y2b, y3b,
                  gs4, gp3, gp2, gp1, gp0e, gp0o, sh, sem, *,
                  s5, h, n_stripes, prec):
    """Input-cotangent for one stripe from forward-saved activations.
    ``gp5_hbm`` is the conv5 cotangent already leaky-gated and
    zero-interleaved (rows and lanes) by XLA to half-res density, so
    conv5-dx is a plain stride-1 transpose conv."""
    rb = pl.program_id(0)
    a = rb * s5
    h1 = h // 2

    _halo_copy_b(gp5_hbm, gp5b, sem, ht=3, hb=3, rps=2 * s5, h_src=h1,
                 n_stripes=n_stripes)
    _halo_copy_b(y0e_hbm, y0e, sem, ht=7, hb=7, rps=4 * s5, h_src=h,
                 n_stripes=n_stripes)
    _halo_copy_b(y0o_hbm, y0o, sem, ht=7, hb=7, rps=4 * s5, h_src=h,
                 n_stripes=n_stripes)
    _halo_copy_b(y1_hbm, y1b, sem, ht=3, hb=3, rps=2 * s5, h_src=h1,
                 n_stripes=n_stripes)
    _halo_copy_b(y2_hbm, y2b, sem, ht=3, hb=3, rps=2 * s5, h_src=h1,
                 n_stripes=n_stripes)
    _halo_copy_b(y3_hbm, y3b, sem, ht=2, hb=2, rps=2 * s5, h_src=h1,
                 n_stripes=n_stripes)

    # --- conv5-dx: gs4 rows [2a-2, 2a+2s5+2); gp5 local base 2a-3
    base_gs4 = 2 * a - 2

    def pair_gs4(p):
        i = 2 * p
        for bb in range(4):
            _shiftrow(sh, bb * 384, gp5b, i + bb, (0, 1, 2))
        out = _dot_b(w5tp, sh, 1536, prec)              # [128, W]
        _store_rowb(gs4, i, out[0:64], mask,
                    scale=_in_range(base_gs4, i, h1))
        _store_rowb(gs4, i + 1, out[64:128], mask,
                    scale=_in_range(base_gs4, i + 1, h1))

    _pairs(2 * s5 + 4, pair_gs4)

    # --- gp3 = g_s4 * leaky'(y3) (gs4 itself is reused as the residual)
    for i in range(2 * s5 + 4):
        g = gs4[pl.ds(i, 1)][0].astype(jnp.float32)
        m = _mask_of(y3b[pl.ds(i, 1)][0])
        gp3[pl.ds(i, 1)] = (g * m)[None].astype(gp3.dtype)

    # --- conv3t + y2 gate -> gp2 rows [2a-1, 2a+2s5+1)
    base_gp = 2 * a - 1

    def pair_gp2(p):
        i = 2 * p
        for bb in range(4):
            _shiftrow(sh, bb * 192, gp3, i + bb, (0, 1, 2))
        out = _dot_b(w3tp, sh, 768, prec)               # [64, W]
        for r in (i, i + 1):
            m2 = _mask_of(y2b[pl.ds(r + 2, 1)][0])
            _store_rowb(gp2, r, out[(r - i) * 32:(r - i) * 32 + 32] * m2,
                        mask, scale=_in_range(base_gp, r, h1))

    _pairs(2 * s5 + 2, pair_gp2)

    # --- conv2t (block-diag pair) + residual + y1 gate -> gp1
    def pair_gp1(p):
        i = 2 * p
        sh[0:32, :] = gp2[pl.ds(i, 1)][0]
        sh[32:64, :] = gp2[pl.ds(i + 1, 1)][0]
        out = _dot_b(w2td, sh, 64, prec)                # [128, W]
        for r in (i, i + 1):
            g = (out[(r - i) * 64:(r - i) * 64 + 64]
                 + gs4[pl.ds(r + 1, 1)][0].astype(jnp.float32))
            m1 = _mask_of(y1b[pl.ds(r + 2, 1)][0])
            _store_rowb(gp1, r, g * m1, mask,
                        scale=_in_range(base_gp, r, h1))

    _pairs(2 * s5 + 2, pair_gp1)

    # --- conv1-dx -> phase-split gp0, y0 gates fused.
    # Rows [4a-2, 4a+4s5+2); the last (odd) row is dead.
    base_gp0 = 4 * a - 2
    n_gp1 = 2 * s5 + 2

    def pair_gp0(p):
        p1 = min(p + 1, n_gp1 - 1)
        _shiftrow(sh, 0, gp1, p, (1, 2))
        _shiftrow(sh, 128, gp1, p1, (1, 2))
        out = _dot_b(w1dx, sh, 256, prec)               # [128, W]
        for k, r in enumerate((2 * p, 2 * p + 1)):
            ind = _in_range(base_gp0, r, h)
            me = _mask_of(y0e[pl.ds(r + 5, 1)][0])
            mo = _mask_of(y0o[pl.ds(r + 5, 1)][0])
            _store_rowb(gp0e, r, out[k * 64:k * 64 + 32] * me, mask,
                        scale=ind)
            _store_rowb(gp0o, r, out[k * 64 + 32:k * 64 + 64] * mo,
                        mask, scale=ind)

    _pairs(4 * s5 + 4, pair_gp0)

    # --- conv0t: one [32, 512] dot per gx row pair, phases in/out
    def pair_gx(p):
        q = 2 * p
        for bb in range(4):
            _phase_block_b(sh, bb * 128, gp0e, gp0o, q + 1 + bb)
        out = _dot_b(w0tp, sh, 512, prec)               # [32, W]
        _store_rowb(gxe_out, q, out[0:8], mask)
        _store_rowb(gxo_out, q, out[8:16], mask)
        _store_rowb(gxe_out, q + 1, out[16:24], mask)
        _store_rowb(gxo_out, q + 1, out[24:32], mask)

    _pairs(4 * s5, pair_gx)


def _bwd_weights_b(sp, dt):
    (w0, b0), (w1, b1), (w2, b2), (w3, b3), (w5, b5) = sp
    w5tp = _blkw((128, 1536), _w5t_pair(_flip_t(w5)), dt)
    w3tp = _blkw((64, 768), _w3t_pair(_flip_t(w3)), dt)
    w2tm = w2.reshape(w2.shape[2], w2.shape[3])
    w2td = _blkw((128, 64), [(0, 0, w2tm), (64, 32, w2tm)], dt)
    w1dxp = _blkw((128, 256), _w1dx_pair(w1), dt)
    w0tp = _blkw((32, 512), _w0t_pair(_pad_cout(_flip_t(w0))), dt)
    return w5tp, w3tp, w2td, w1dxp, w0tp


@functools.partial(jax.jit,
                   static_argnames=("bsz", "s5", "interpret"))
def fused_stem_bwd_b(gp5dd, acts, sp, bsz: int,
                     s5: Optional[int] = None,
                     interpret: bool = False):
    """(pre-gated zero-interleaved gp5, forward-saved activations) ->
    phase-split batched planar (gxE, gxO)."""
    _, y0e_, y0o_, y1_, y2_, y3_ = acts
    h, _, tot = y0e_.shape
    seg = tot // bsz
    wq = h // 2
    h5 = h // 4
    if s5 is None:
        s5 = _pick_s5(h5, 4)
    assert h5 % s5 == 0 and s5 % 2 == 0
    n_stripes = h5 // s5
    dt = y0e_.dtype
    prec = lax.Precision.HIGHEST if dt == jnp.float32 else None

    w5tp, w3tp, w2td, w1dxp, w0tp = _bwd_weights_b(sp, dt)
    mask = _lane_mask(bsz, seg, wq)

    kernel = functools.partial(
        _bwd_kernel_b, s5=s5, h=h, n_stripes=n_stripes, prec=prec)
    grid = (n_stripes,)
    out_sds = jax.ShapeDtypeStruct((h, 8, tot), dt)
    out_spec = pl.BlockSpec((4 * s5, 8, tot), lambda r_: (r_, 0, 0),
                            memory_space=pltpu.VMEM)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * 6
                + [vm() for _ in range(6)])
    scratch = [
        pltpu.VMEM((2 * s5 + 6, 128, tot), dt),     # gp5dd
        pltpu.VMEM((4 * s5 + 14, 32, tot), dt),     # y0e
        pltpu.VMEM((4 * s5 + 14, 32, tot), dt),     # y0o
        pltpu.VMEM((2 * s5 + 6, 64, tot), dt),      # y1
        pltpu.VMEM((2 * s5 + 6, 32, tot), dt),      # y2
        pltpu.VMEM((2 * s5 + 4, 64, tot), dt),      # y3
        pltpu.VMEM((2 * s5 + 4, 64, tot), dt),      # g_s4
        pltpu.VMEM((2 * s5 + 4, 64, tot), dt),      # gp3
        pltpu.VMEM((2 * s5 + 2, 32, tot), dt),      # gp2
        pltpu.VMEM((2 * s5 + 2, 64, tot), dt),      # gp1
        pltpu.VMEM((4 * s5 + 4, 32, tot), dt),      # gp0e
        pltpu.VMEM((4 * s5 + 4, 32, tot), dt),      # gp0o
        pltpu.VMEM((1536, tot), dt),                # sh cache
        pltpu.SemaphoreType.DMA(()),
    ]
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs, out_specs=(out_spec, out_spec),
        out_shape=(out_sds, out_sds), scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(gp5dd, y0e_, y0o_, y1_, y2_, y3_,
      w5tp, w3tp, w2td, w1dxp, w0tp, mask)


# ---------------------------------------------------------------------------
# custom_vjp wrapper (NHWC in / NHWC out)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_stem_batched(x, sp):
    """NHWC [B,H,W,3] -> NHWC [B,H/4,W/4,128] via the batch-on-lanes
    megakernels. Only the input cotangent is real (the framework
    differentiates patch pixels only, reference train_patch.py:131)."""
    b, h = x.shape[0], x.shape[1]
    seg = _seg(h // 2)
    xe, xo = split_phases_b(x, seg)
    y5d = fused_stem_fwd_b(xe, xo, sp, bsz=b)
    return batched_to_nhwc(y5d, b, h // 4, 128, lane0=1, stride=2)


def _fsb_fwd(x, sp):
    b, h = x.shape[0], x.shape[1]
    seg = _seg(h // 2)
    xe, xo = split_phases_b(x, seg)
    acts = fused_stem_fwd_b(xe, xo, sp, bsz=b, save_acts=True)
    out = batched_to_nhwc(acts[0], b, h // 4, 128, lane0=1, stride=2)
    return out, (acts, out, sp, b)


def _fsb_bwd(resid, g5):
    acts, y5, sp, b = resid
    h = acts[1].shape[0]
    seg = acts[1].shape[-1] // b
    # leaky-gate at quarter res, then zero-interleave lanes+rows to
    # half-res density (the kernel's conv5-dx is stride-1 over this)
    gp5 = g5.astype(jnp.float32) * jnp.where(y5 > 0, 1.0, LEAKY)
    gp5dd = nhwc_to_batched(
        interleave_zero_rows(interleave_zero_cols(
            gp5.astype(acts[0].dtype))), seg)
    gxe, gxo = fused_stem_bwd_b(gp5dd, acts, sp, bsz=b)
    gx = merge_phases_b(gxe, gxo, b, h // 2, 3)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, sp)
    return gx, zeros


fused_stem_batched.defvjp(_fsb_fwd, _fsb_bwd)
