"""Fused stripe-pipelined Pallas megakernels for the YOLOv3 stem.

One pallas_call computes the whole 5-conv stem (conv0 3x3s1 C3->32,
conv1 3x3s2 32->64, conv2 1x1 64->32, conv3 3x3s1 32->64, block-1
shortcut, conv5 3x3s2 ->128) per row-stripe entirely in VMEM: HBM is
touched only for the input image and the stem output. A second
megakernel computes the full input-cotangent chain by *recomputing* the
stripe's activations in VMEM (flash-style remat) and chaining the five
transpose-convs — HBM traffic is x, y5, g5 and g_x only.

Why: the per-layer planar kernels (ops/planar_conv.py) already beat XLA
on the forward (5.2 vs 8.2 ms at b8 608^2) but lose the backward to
inter-layer HBM round trips and zero-interleaved stride-2 expansions
(ROADMAP.md round-2 measurements). The stem moves ~1.1 GB of
intermediate activations per step through HBM under either scheme while
carrying only 162 GFLOP (b8, fwd+input-bwd) — it is bandwidth-bound at
~5-8% MFU while the C>=128 towers run at ~76%. Fusing the chain keeps
every intermediate in VMEM.

Two kernel-level design rules, both measured on v5e:

- Column phase-split: activations of the two 608-row layers are kept as
  even/odd *lane phases* (each 304-wide, dense in a 384-lane planar
  row). conv0 emits phases directly; conv1 (stride 2) consumes them
  with plain shifted-row matmuls — the stride-2 lane decimation
  disappears (a strided lane-slice does not lower on Mosaic; the
  per-layer kernels burn a one-hot select-matmul on it). The backward
  mirrors this: conv1-dx *produces* phase-split cotangents (the 608-lane
  interleave is never materialized) and only conv5-dx pays a one-hot
  interleave at 304 lanes; the final 3-channel g_x phases are
  interleaved by XLA outside the kernel.
- Paired-row blocked matmuls: per-row small matmuls are op-count bound
  (first cut: bwd 17 ms from ~700 matmuls/stores per stripe). Each
  conv instead processes TWO output rows (and both phases) per dot by
  assembling a block-sparse weight matrix over a K of shared cache
  blocks — e.g. conv0 is one [128,128]@[128,304] dot per row pair
  instead of four [32,72] dots, and conv1-dx's nine tap matmuls
  collapse into one [128,256] dot.

Row loops are Python-unrolled (fori_loop rows serialize Mosaic's
software pipelining; measured 7.96 -> 4.38 ms on the first-cut fwd).

Semantics match the XLA NHWC stem exactly up to f32-accumulation
rounding (oracle-tested in tests/test_stem_fused.py). Reference analog:
the stem is stock torch Conv2d+BN+Leaky (darknet_v3.py:9-100); this
file exists purely for TPU speed-of-light.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .planar_conv import (_round_up, from_planar, from_planar_mxu,
                          to_planar, to_planar_mxu, use_mxu_layout)

LEAKY = 0.1

_use_mxu_layout = use_mxu_layout


def _y5_to_nhwc(y5p, w_img: int):
    if _use_mxu_layout():
        return from_planar_mxu(y5p, w_img, 128)
    return from_planar(y5p, w_img, c=128)


def _g5_to_planar(g5):
    if _use_mxu_layout():
        return to_planar_mxu(g5)
    return to_planar(g5)

# E-phase output taps read pieces [src@-1, src@0-alt, src@0] of a
# phase-block; O-phase taps read [src@0-alt, src@0, src@+1]. With the
# block layout [O sl0, E sl1, O sl1, E sl2] both phases map onto piece
# indices:
_PIECES_E = ((0, 0), (1, 1), (2, 2))   # (piece, dx)
_PIECES_O = ((1, 0), (2, 1), (3, 2))


# ---------------------------------------------------------------------------
# XLA-side layout helpers
# ---------------------------------------------------------------------------

def split_phases(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC [B, H, W, C<=8] -> (even-lane, odd-lane) planar phases, each
    [B, H, 8, round_up(W/2+2, 128)] with value j at lane j+1.

    Stays on the jnp path: the MXU conversion kernels need the NHWC
    side's minor dim lane-aligned, and here it is C=3 (a C=3 pallas
    operand forces a 3->128 lane-padded tiling copy — measured 12.8 ms
    for [8,608,608,3], 100x the jnp path). Same for merge_phases."""
    xe = to_planar(x[:, :, 0::2, :], c_pad=8)
    xo = to_planar(x[:, :, 1::2, :], c_pad=8)
    return xe, xo


def merge_phases(pe: jnp.ndarray, po: jnp.ndarray, w_half: int,
                 c: int) -> jnp.ndarray:
    """Inverse of split_phases -> NHWC [B, H, 2*w_half, c]."""
    e = from_planar(pe, w_half, c=c)
    o = from_planar(po, w_half, c=c)
    b, h, _, _ = e.shape
    return jnp.stack([e, o], axis=3).reshape(b, h, 2 * w_half, c)


def _onehot_sel(n_in: int, n_out: int, step: int, offset: int, dtype):
    """[n_in, n_out] one-hot: row (step*j + offset) -> col j."""
    r = lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0)
    c = lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
    return (r == step * c + offset).astype(dtype)


def _pad_cin(w, m=8):
    extra = (-w.shape[2]) % m
    if extra:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, extra), (0, 0)))
    return w


def _pad_cout(w, m=8):
    extra = (-w.shape[-1]) % m
    if extra:
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, extra),))
    return w


def _flip_t(w):
    return jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)


def _blkw(shape, entries, dt):
    """Block-sparse weight matrix: zeros except the (row0, col0, block)
    entries. Built once at trace time."""
    w = jnp.zeros(shape, jnp.float32)
    for r0, c0, m in entries:
        w = w.at[r0:r0 + m.shape[0], c0:c0 + m.shape[1]].set(
            m.astype(jnp.float32))
    return w.astype(dt)


def _w0_pair(w0p):
    """conv0 pair matrix [128, 128]: rows (r, phase, cout32), cols
    (x-row block r+dy, piece, cin8)."""
    entries = []
    for r in range(2):
        for ph, pieces in ((0, _PIECES_E), (1, _PIECES_O)):
            for dy in range(3):
                for piece, dx in pieces:
                    entries.append((r * 64 + ph * 32,
                                    (r + dy) * 32 + piece * 8,
                                    w0p[dy, dx].T))
    return entries


def _w1_pair(w1):
    """conv1 pair matrix [128, 480]: rows (r, cout64), cols (y0-row
    block 2r+dy, piece3, cin32); pieces [O sl0, E sl1, O sl1]."""
    entries = []
    for r in range(2):
        for dy in range(3):
            for piece, dx in ((0, 0), (1, 1), (2, 2)):
                entries.append((r * 64, (2 * r + dy) * 96 + piece * 32,
                                w1[dy, dx].T))
    return entries


def _w3_pair(w3):
    """conv3 pair matrix [128, 384]: rows (r, cout64), cols (y2-row
    block r+dy, piece3=dx, cin32)."""
    entries = []
    for r in range(2):
        for dy in range(3):
            for dx in range(3):
                entries.append((r * 64, (r + dy) * 96 + dx * 32,
                                w3[dy, dx].T))
    return entries


def _w5dx_pair(w5):
    """conv5-dx pair matrix [256, 512]: rows [evenE, oddE, evenO, oddO]
    (64 each), cols (block: [g(p) sl1, g(p) sl2, g(p+1) sl1, g(p+1)
    sl2], cout128). Row/col parity of the stride-2 adjoint:
    dx[r even] <- dy=1 taps on g[r/2]; dx[r odd] <- dy=0 on g[(r+1)/2],
    dy=2 on g[(r-1)/2]; even lanes <- dx=1, odd lanes <- dx=0 (@+1) and
    dx=2 (@0)."""
    b = {("p", 1): 0, ("p", 2): 128, ("p1", 1): 256, ("p1", 2): 384}
    return [
        (0, b[("p", 1)], w5[1, 1]),                      # evenE
        (64, b[("p1", 1)], w5[0, 1]),                    # oddE
        (64, b[("p", 1)], w5[2, 1]),
        (128, b[("p", 2)], w5[1, 0]),                    # evenO
        (128, b[("p", 1)], w5[1, 2]),
        (192, b[("p1", 2)], w5[0, 0]),                   # oddO
        (192, b[("p1", 1)], w5[0, 2]),
        (192, b[("p", 2)], w5[2, 0]),
        (192, b[("p", 1)], w5[2, 2]),
    ]


def _w1dx_pair(w1):
    """conv1-dx pair matrix [128, 256]: rows [evenE, evenO, oddE, oddO]
    (32 each), cols (block: [g(p) sl1, g(p) sl2, g(p+1) sl1, g(p+1)
    sl2], cout64). Same parity calculus as conv5-dx but the phase-split
    output needs no lane interleave."""
    b = {("p", 1): 0, ("p", 2): 64, ("p1", 1): 128, ("p1", 2): 192}
    return [
        (0, b[("p", 1)], w1[1, 1]),                      # evenE
        (32, b[("p", 2)], w1[1, 0]),                     # evenO
        (32, b[("p", 1)], w1[1, 2]),
        (64, b[("p1", 1)], w1[0, 1]),                    # oddE
        (64, b[("p", 1)], w1[2, 1]),
        (96, b[("p1", 2)], w1[0, 0]),                    # oddO
        (96, b[("p1", 1)], w1[0, 2]),
        (96, b[("p", 2)], w1[2, 0]),
        (96, b[("p", 1)], w1[2, 2]),
    ]


def _w3t_pair(w3t, rows=2):
    """conv3t matrix [rows*32, (rows+2)*192]: rows (r, cin32), cols
    (gp3-row block r+dy, piece3=dx, cout64). ``rows=4`` is the
    quad-row variant that fills the MXU's 128 M-rows."""
    entries = []
    for r in range(rows):
        for dy in range(3):
            for dx in range(3):
                entries.append((r * 32, (r + dy) * 192 + dx * 64,
                                w3t[dy, dx].T))
    return entries


def _w0t_pair(w0tp, rows=2):
    """conv0t matrix [rows*16, (rows+2)*128]: rows (r, phase, cin->8),
    cols (gp0-row block r+dy, piece4, cout32); same phase-piece pattern
    as conv0 forward (the s1 adjoint with a flipped kernel preserves
    it). ``rows=8`` is the oct-row variant that fills the MXU's 128
    M-rows (8 rows x 2 phases x 8 channels)."""
    entries = []
    for r in range(rows):
        for ph, pieces in ((0, _PIECES_E), (1, _PIECES_O)):
            for dy in range(3):
                for piece, dx in pieces:
                    entries.append((r * 16 + ph * 8,
                                    (r + dy) * 128 + piece * 32,
                                    w0tp[dy, dx].T))
    return entries


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------

def _halo_copy(src, dst, sem, b, *, ht, hb, rps, h_src, n_stripes):
    """DMA rows [rb*rps-ht, rb*rps+rps+hb) of src[b] into dst, zeroing
    out-of-image halo rows. All copy sizes static per branch."""
    rb = pl.program_id(1)
    rtot = rps + ht + hb
    first = rb == 0
    last = rb == n_stripes - 1

    def cp(src0, d0, n):
        c = pltpu.make_async_copy(src.at[b, pl.ds(src0, n)],
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


def _halo_copy_multi(specs, sem, b, *, n_stripes):
    """Start ALL halo DMAs before waiting on any. ``specs``: list of
    (src, dst, ht, hb, rps, h_src). The per-tensor start+wait of
    ``_halo_copy`` serializes the transfers — with 7 activation
    buffers that serialization is ~2.7 ms of the saved backward's
    floor at b8 608^2 (measured by stage-skipping)."""
    rb = pl.program_id(1)
    first = rb == 0
    last = rb == n_stripes - 1

    def run(kind):
        copies = []
        for (src, dst, ht, hb, rps, h_src) in specs:
            rtot = rps + ht + hb
            if kind == "one":
                src0, d0, n = 0, ht, h_src
            elif kind == "first":
                src0, d0, n = 0, ht, rtot - ht
            elif kind == "last":
                src0, d0, n = rb * rps - ht, 0, rtot - hb
            else:
                src0, d0, n = rb * rps - ht, 0, rtot
            copies.append(pltpu.make_async_copy(
                src.at[b, pl.ds(src0, n)], dst.at[pl.ds(d0, n)], sem))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    if n_stripes == 1:
        run("one")
    else:
        @pl.when(jnp.logical_and(first, jnp.logical_not(last)))
        def _():
            run("first")

        @pl.when(jnp.logical_and(last, jnp.logical_not(first)))
        def _():
            run("last")

        @pl.when(jnp.logical_and(jnp.logical_not(first),
                                 jnp.logical_not(last)))
        def _():
            run("mid")

    for (src, dst, ht, hb, rps, h_src) in specs:
        rtot = rps + ht + hb

        if ht:  # halo-free tensors (res_fused masks) have no fill rows
            @pl.when(first)
            def _(dst=dst, ht=ht):
                dst[0:ht] = jnp.zeros_like(dst[0:ht])

        if hb:
            @pl.when(last)
            def _(dst=dst, rtot=rtot, hb=hb):
                dst[rtot - hb:rtot] = jnp.zeros_like(
                    dst[rtot - hb:rtot])


def _store_row(ref, i, y, wq, scale=None):
    """Store [C, wq] into planar row i (zero borders); optional scalar
    multiply (in-range indicator)."""
    if scale is not None:
        y = y * scale
    c = y.shape[0]
    wl = ref.shape[-1]
    ref[pl.ds(i, 1), :, 1:wq + 1] = y[None].astype(ref.dtype)
    ref[pl.ds(i, 1), :, 0:1] = jnp.zeros((1, c, 1), ref.dtype)
    ref[pl.ds(i, 1), :, wq + 1:] = jnp.zeros((1, c, wl - wq - 1),
                                             ref.dtype)


def _store_out_row(ref, i, y, wq):
    """Store [C, wq] into blocked output row i (zero borders)."""
    c = y.shape[0]
    wl = ref.shape[-1]
    ref[0, pl.ds(i, 1), :, 1:wq + 1] = y[None].astype(ref.dtype)
    ref[0, pl.ds(i, 1), :, 0:1] = jnp.zeros((1, c, 1), ref.dtype)
    ref[0, pl.ds(i, 1), :, wq + 1:] = jnp.zeros((1, c, wl - wq - 1),
                                                ref.dtype)


def _leaky_f32(acc, bias):
    y = acc + bias
    return jnp.maximum(y, y * LEAKY)


def _mask_of(y):
    """leaky' recovered from the output sign (monotone activation)."""
    return jnp.where(y.astype(jnp.float32) > 0, 1.0, LEAKY)


def _in_range(base, i, h):
    g = base + i
    ok = jnp.logical_and(g >= 0, g < h)
    return ok.astype(jnp.float32)


def _phase_block(sh, r0, pe, po, i, wq, sl):
    """Write one phase-layout cache block [O sl0, E sl1, O sl1, E sl2]
    (4 x C rows) from phase refs at row i."""
    sl0, sl1, sl2 = sl
    c = pe.shape[1]
    e = pe[pl.ds(i, 1)][0]
    o = po[pl.ds(i, 1)][0]
    sh[r0 + 0 * c:r0 + 1 * c, :wq] = o[:, sl0]
    sh[r0 + 1 * c:r0 + 2 * c, :wq] = e[:, sl1]
    sh[r0 + 2 * c:r0 + 3 * c, :wq] = o[:, sl1]
    sh[r0 + 3 * c:r0 + 4 * c, :wq] = e[:, sl2]


def _shift_block(sh, r0, ref, i, wq, sl):
    """Write one full-width cache block [row sl0, row sl1, row sl2]."""
    sl0, sl1, sl2 = sl
    c = ref.shape[1]
    r = ref[pl.ds(i, 1)][0]
    sh[r0 + 0 * c:r0 + 1 * c, :wq] = r[:, sl0]
    sh[r0 + 1 * c:r0 + 2 * c, :wq] = r[:, sl1]
    sh[r0 + 2 * c:r0 + 3 * c, :wq] = r[:, sl2]


# Row loops are Python-unrolled; Mosaic software-pipelines the unrolled
# bodies (measured 7.96 -> 4.38 ms fwd vs lax.fori_loop rows).
def _pairs(n_rows, body):
    assert n_rows % 2 == 0, n_rows
    for p in range(n_rows // 2):
        body(p)


# ---------------------------------------------------------------------------
# Shared compute stages (forward recompute)
# ---------------------------------------------------------------------------

def _compute_y0_phases(xe, xo, y0e, y0o, w0p_ref, b0_ref, sh, *, n_rows,
                       base, h, wq, prec, sl):
    """conv0, one [128,128] dot per row pair -> both rows x both phases.
    x local rows for y0 local i are i..i+2.

    Linear write-once cache: one phase block per x row, written before
    any dot; each pair's dot reads a sliding contiguous window. The
    previous per-pair shared 4-block cache made every dot a WAR hazard
    for the NEXT pair's cache writes — the serial cache-write -> dot ->
    store chain ROADMAP flagged — and rewrote every overlapping block
    twice."""
    bias = b0_ref[:].astype(jnp.float32)
    for i in range(n_rows + 2):
        _phase_block(sh, i * 32, xe, xo, i, wq, sl)

    def pair(p):
        i = 2 * p
        y = _leaky_f32(
            jnp.dot(w0p_ref[:], sh[i * 32:(i + 4) * 32, :wq],
                    precision=prec, preferred_element_type=jnp.float32),
            bias)
        i0 = _in_range(base, i, h)
        i1 = _in_range(base, i + 1, h)
        _store_row(y0e, i, y[0:32], wq, scale=i0)
        _store_row(y0o, i, y[32:64], wq, scale=i0)
        _store_row(y0e, i + 1, y[64:96], wq, scale=i1)
        _store_row(y0o, i + 1, y[96:128], wq, scale=i1)

    _pairs(n_rows, pair)


def _compute_y123(y0e, y0o, y1b, y2b, y3b, w1p_ref, w2d_ref, w3p_ref,
                  b1_ref, b2_ref, b3_ref, sh, *, n1, base1, n3, base3,
                  off3, h1, wq, prec, sl):
    """conv1 (s2 from y0 phases) + conv2 (1x1, fused on the hot rows) +
    conv3 (3x3 s1), all one dot per row pair.

    y0 local rows for y1 local j: 2j..2j+2; conv3's y2 local row for y3
    local i is i+dy+off3."""
    b1 = b1_ref[:].astype(jnp.float32)
    b2 = b2_ref[:].astype(jnp.float32)
    b3 = b3_ref[:].astype(jnp.float32)
    # per-half row indicators as arithmetic (where with scalar arms
    # trips a Mosaic relayout)
    half = (lax.broadcasted_iota(jnp.int32, (128, 1), 0) < 64).astype(
        jnp.float32)
    half2 = (lax.broadcasted_iota(jnp.int32, (64, 1), 0) < 32).astype(
        jnp.float32)
    sl0, sl1, _ = sl

    # linear write-once cache over y0 rows (see _compute_y0_phases)
    for yr in range(2 * n1 + 1):
        # conv1 pieces: [y0O sl0, y0E sl1, y0O sl1]
        o = y0o[pl.ds(yr, 1)][0]
        sh[yr * 96:yr * 96 + 32, :wq] = o[:, sl0]
        sh[yr * 96 + 32:yr * 96 + 64, :wq] = \
            y0e[pl.ds(yr, 1)][0][:, sl1]
        sh[yr * 96 + 64:yr * 96 + 96, :wq] = o[:, sl1]

    def pair1(p):
        j = 2 * p
        i0 = _in_range(base1, j, h1)
        i1 = _in_range(base1, j + 1, h1)
        sv = half * i0 + (1.0 - half) * i1
        y1 = _leaky_f32(
            jnp.dot(w1p_ref[:], sh[2 * j * 96:(2 * j + 5) * 96, :wq],
                    precision=prec, preferred_element_type=jnp.float32),
            b1) * sv
        _store_row(y1b, j, y1[0:64], wq)
        _store_row(y1b, j + 1, y1[64:128], wq)
        # conv2 on the stored rounding of the hot rows
        y2 = _leaky_f32(jnp.dot(w2d_ref[:], y1.astype(y1b.dtype),
                                precision=prec,
                                preferred_element_type=jnp.float32), b2)
        y2 = y2 * (half2 * i0 + (1.0 - half2) * i1)
        _store_row(y2b, j, y2[0:32], wq)
        _store_row(y2b, j + 1, y2[32:64], wq)

    _pairs(n1, pair1)

    # linear cache over y2 rows (overwrites the conv1 cache; one WAR
    # boundary per stage instead of per pair)
    for r in range(n3 + 2):
        _shift_block(sh, r * 96, y2b, r + off3, wq, sl)

    def pair3(p):
        i = 2 * p
        y3 = _leaky_f32(
            jnp.dot(w3p_ref[:], sh[i * 96:(i + 4) * 96, :wq],
                    precision=prec, preferred_element_type=jnp.float32),
            b3)
        _store_row(y3b, i, y3[0:64], wq, scale=_in_range(base3, i, h1))
        _store_row(y3b, i + 1, y3[64:128], wq,
                   scale=_in_range(base3, i + 1, h1))

    _pairs(n3, pair3)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(xe_hbm, xo_hbm, w0p, w1p, w2d, w3p, w5m,
                b0, b1, b2, b3, b5, sel5, *refs,
                s5, h, n_stripes, wq, prec, save):
    if save:
        (y5_out, y0e_o, y0o_o, y1_o, y2_o, y3_o,
         xe, xo, y0e, y0o, y1b, y2b, y3b, s4b, sh, sem) = refs
    else:
        (y5_out, xe, xo, y0e, y0o, y1b, y2b, y3b, s4b, sh,
         sem) = refs
    b = pl.program_id(0)
    rb = pl.program_id(1)
    a = rb * s5
    h1 = h // 2
    wh5 = wq // 2
    sl = (slice(0, wq), slice(1, wq + 1), slice(2, wq + 2))

    _halo_copy(xe_hbm, xe, sem, b, ht=6, hb=6, rps=4 * s5, h_src=h,
               n_stripes=n_stripes)
    _halo_copy(xo_hbm, xo, sem, b, ht=6, hb=6, rps=4 * s5, h_src=h,
               n_stripes=n_stripes)

    # y0 rows [4a-5, 4b+5); x local offset: (g0-1) - (4a-6) = i
    _compute_y0_phases(xe, xo, y0e, y0o, w0p, b0, sh,
                       n_rows=4 * s5 + 10, base=4 * a - 5, h=h, wq=wq,
                       prec=prec, sl=sl)
    # y1/y2 rows [2a-2, 2b+2); y3 rows [2a-1, 2b+1)
    _compute_y123(y0e, y0o, y1b, y2b, y3b, w1p, w2d, w3p, b1, b2, b3,
                  sh, n1=2 * s5 + 4, base1=2 * a - 2, n3=2 * s5 + 2,
                  base3=2 * a - 1, off3=0, h1=h1, wq=wq, prec=prec,
                  sl=sl)

    # s4 = y3 + y1 (y1 local for y3 local i: i+1)
    for i in range(2 * s5 + 2):
        s4b[pl.ds(i, 1)] = (y3b[pl.ds(i, 1)] + y1b[pl.ds(i + 1, 1)])

    if save:
        # export the stripe's own (non-halo) activation rows for the
        # saved-activation backward. The backward only consumes leaky'
        # GATES (activation signs), so store int8 sign masks — half
        # the HBM traffic and backward VMEM of bf16 values.
        def sgn(v):
            # compare in f32: Mosaic has no packed-bf16 predicate
            return (v.astype(jnp.float32) > 0).astype(jnp.int8)
        y0e_o[0] = sgn(y0e[5:5 + 4 * s5])       # y0 base 4a-5
        y0o_o[0] = sgn(y0o[5:5 + 4 * s5])
        y1_o[0] = sgn(y1b[2:2 + 2 * s5])        # y1/y2 base 2a-2
        y2_o[0] = sgn(y2b[2:2 + 2 * s5])
        y3_o[0] = sgn(y3b[1:1 + 2 * s5])        # y3 base 2a-1

    # conv5 (s2): one [128,576] all-dy dot per row (M=128 fills the
    # MXU; a [256,960] row-PAIR variant measured ~0.35 ms slower — f32
    # accumulator spill) + one-hot lane decimation, fed from a linear
    # write-once s4 cache. s4 local rows for y5 stripe-row r: 2r+dy.
    bias5 = b5[:].astype(jnp.float32)
    for r2 in range(2 * s5 + 1):
        _shift_block(sh, r2 * 192, s4b, r2, wq, sl)

    for r in range(s5):
        acc = jnp.dot(w5m[:], sh[2 * r * 192:(2 * r + 3) * 192, :wq],
                      precision=prec, preferred_element_type=jnp.float32)
        y = _leaky_f32(acc, bias5).astype(y5_out.dtype)
        dec = jnp.dot(y, sel5[:], precision=prec,
                      preferred_element_type=jnp.float32)
        _store_out_row(y5_out, r, dec, wh5)


def _sh_rows_grad(s5: int, recompute: bool) -> int:
    """Rows of the linear write-once tap cache for the grad chain (all
    five stages reuse one buffer sequentially), plus — for the remat
    kernel — the activation-recompute stages at their wider bases."""
    rows = max((2 * s5 + 6) * 128,      # conv5-dx (g5 row, slice) blocks
               (2 * s5 + 4) * 192,      # conv3t gp3 shift blocks
               (4 * s5 + 6) * 64,       # conv1-dx (gp1 row, slice)
               (4 * s5 + 3) * 128)      # conv0t gp0 phase blocks
    if recompute:
        rows = max(rows, (4 * s5 + 16) * 32, (4 * s5 + 13) * 96,
                   (2 * s5 + 6) * 96)
    return rows


def _pick_s5(h5: int, vmem_rows: int = 8) -> int:
    for s in (vmem_rows, 4, 2, 1):
        if h5 % s == 0:
            return s
    return 1


def _fwd_weights(sp, dt):
    (w0, b0), (w1, b1), (w2, b2), (w3, b3), (w5, b5) = sp
    w0p = _blkw((128, 128), _w0_pair(_pad_cin(w0)), dt)
    w1p = _blkw((128, 480), _w1_pair(w1), dt)
    w2m = w2.reshape(w2.shape[2], w2.shape[3]).T
    w2d = _blkw((64, 128), [(0, 0, w2m), (32, 64, w2m)], dt)
    w3p = _blkw((128, 384), _w3_pair(w3), dt)
    # conv5 all-dy matrix [128, 576]: cols (dy, dx, cin64) — one dot per
    # y5 row over a 3-s4-row cache window
    w5m = (w5.transpose(3, 0, 1, 2).reshape(128, 576)).astype(dt)
    biases = [
        jnp.tile(b0.reshape(-1, 1), (4, 1)).astype(jnp.float32),
        jnp.tile(b1.reshape(-1, 1), (2, 1)).astype(jnp.float32),
        jnp.tile(b2.reshape(-1, 1), (2, 1)).astype(jnp.float32),
        jnp.tile(b3.reshape(-1, 1), (2, 1)).astype(jnp.float32),
        b5.reshape(-1, 1).astype(jnp.float32),
    ]
    return w0p, w1p, w2d, w3p, w5m, biases


@functools.partial(jax.jit,
                   static_argnames=("s5", "interpret", "save_acts"))
def fused_stem_fwd(xe, xo, sp, s5: Optional[int] = None,
                   interpret: bool = False, save_acts: bool = False):
    """Phase-split planar x -> planar y5 [B, H/4, 128, Wl5].

    ``save_acts=True`` additionally returns the intermediate planar
    activations ``(y5, y0e, y0o, y1, y2, y3)`` for the
    saved-activation backward (``fused_stem_bwd_saved``)."""
    bsz, h, _, wlh = xe.shape
    wq = h // 2
    assert wlh == _round_up(wq + 2, 128)
    h5 = h // 4
    if s5 is None:
        s5 = _pick_s5(h5)
    assert h5 % s5 == 0
    n_stripes = h5 // s5
    dt = xe.dtype
    prec = lax.Precision.HIGHEST if dt == jnp.float32 else None
    wl5 = _round_up(wq // 2 + 2, 128)
    w0p, w1p, w2d, w3p, w5m, biases = _fwd_weights(sp, dt)
    sel5 = _onehot_sel(wq, wq // 2, 2, 0, dt)

    kernel = functools.partial(
        _fwd_kernel, s5=s5, h=h, n_stripes=n_stripes, wq=wq, prec=prec,
        save=save_acts)
    grid = (bsz, n_stripes)
    out_shape = jax.ShapeDtypeStruct((bsz, h5, 128, wl5), dt)
    out_spec = pl.BlockSpec((1, s5, 128, wl5),
                            lambda b_, r_: (b_, r_, 0, 0),
                            memory_space=pltpu.VMEM)
    if save_acts:
        def act_out(rows_per_stripe, c, total_rows):
            return (jax.ShapeDtypeStruct((bsz, total_rows, c, wlh),
                                         jnp.int8),
                    pl.BlockSpec((1, rows_per_stripe, c, wlh),
                                 lambda b_, r_: (b_, r_, 0, 0),
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
        pltpu.VMEM((4 * s5 + 12, 8, wlh), dt),      # xe
        pltpu.VMEM((4 * s5 + 12, 8, wlh), dt),      # xo
        pltpu.VMEM((4 * s5 + 10, 32, wlh), dt),     # y0e
        pltpu.VMEM((4 * s5 + 10, 32, wlh), dt),     # y0o
        pltpu.VMEM((2 * s5 + 4, 64, wlh), dt),      # y1
        pltpu.VMEM((2 * s5 + 4, 32, wlh), dt),      # y2
        pltpu.VMEM((2 * s5 + 2, 64, wlh), dt),      # y3
        pltpu.VMEM((2 * s5 + 2, 64, wlh), dt),      # s4
        # linear write-once tap cache, sized for the largest stage
        # (conv0 / conv1 / conv3 / conv5 windows)
        pltpu.VMEM((max((4 * s5 + 12) * 32, (4 * s5 + 9) * 96,
                        (2 * s5 + 4) * 96, (2 * s5 + 1) * 192), wlh),
                   dt),
        pltpu.SemaphoreType.DMA(()),
    ]
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xe, xo, w0p, w1p, w2d, w3p, w5m, *biases, sel5)


# ---------------------------------------------------------------------------
# Backward kernel (recompute + full input-cotangent chain)
# ---------------------------------------------------------------------------

def _bwd_kernel(xe_hbm, xo_hbm, y5_hbm, g5_hbm,
                w0p, w1p, w2d, w3p, b0, b1, b2, b3,
                w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp, se_t, so_t,
                gxe_out, gxo_out,
                xe, xo, y0e, y0o, y1b, y2b, y3b, y5b, g5b,
                gs4, gp3, gp2, gp1, gp0e, gp0o, sh, sem, *,
                s5, h, n_stripes, wq, prec):
    """Input-cotangent of the fused stem for one (batch, stripe) cell,
    rematerializing the stripe's activations in VMEM. See module
    docstring; every stage is one blocked dot per row pair."""
    b = pl.program_id(0)
    rb = pl.program_id(1)
    a = rb * s5
    h1, h5 = h // 2, h // 4
    sl = (slice(0, wq), slice(1, wq + 1), slice(2, wq + 2))

    _halo_copy(xe_hbm, xe, sem, b, ht=8, hb=8, rps=4 * s5, h_src=h,
               n_stripes=n_stripes)
    _halo_copy(xo_hbm, xo, sem, b, ht=8, hb=8, rps=4 * s5, h_src=h,
               n_stripes=n_stripes)
    _halo_copy(y5_hbm, y5b, sem, b, ht=1, hb=2, rps=s5, h_src=h5,
               n_stripes=n_stripes)
    _halo_copy(g5_hbm, g5b, sem, b, ht=1, hb=2, rps=s5, h_src=h5,
               n_stripes=n_stripes)

    # --- recompute activations (bases shifted vs fwd: one extra halo)
    _compute_y0_phases(xe, xo, y0e, y0o, w0p, b0, sh,
                       n_rows=4 * s5 + 14, base=4 * a - 7, h=h, wq=wq,
                       prec=prec, sl=sl)
    _compute_y123(y0e, y0o, y1b, y2b, y3b, w1p, w2d, w3p, b1, b2, b3,
                  sh, n1=2 * s5 + 6, base1=2 * a - 3, n3=2 * s5 + 4,
                  base3=2 * a - 2, off3=0, h1=h1, wq=wq, prec=prec,
                  sl=sl)

    _grad_chain(w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp, se_t, so_t,
                gxe_out, gxo_out,
                y0e, y0o, y1b, y2b, y3b, y5b, g5b,
                gs4, gp3, gp2, gp1, gp0e, gp0o, sh,
                a=a, s5=s5, h=h, wq=wq, prec=prec)


def _grad_chain(w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp, se_t, so_t,
                gxe_out, gxo_out,
                y0e, y0o, y1b, y2b, y3b, y5b, g5b,
                gs4, gp3, gp2, gp1, gp0e, gp0o, sh, *,
                a, s5, h, wq, prec):
    """The five transpose-conv stages, shared by the remat and
    saved-activation backward kernels. Expects activation refs laid out
    at the remat bases: y0 at 4a-7 (n=4s5+14), y1/y2 at 2a-3
    (n=2s5+6), y3 at 2a-2 (n=2s5+4), y5/g5 at a-1 (n=s5+3)."""
    h1 = h // 2
    wh5 = wq // 2
    sl = (slice(0, wq), slice(1, wq + 1), slice(2, wq + 2))
    sl1 = sl[1]
    g_sl = (slice(1, wh5 + 1), slice(2, wh5 + 2))

    # --- gp5 = g5 * leaky'(y5), in place, one whole-buffer elementwise
    # (zero-filled halo stays zero)
    g5b[:] = (g5b[:].astype(jnp.float32)
              * _mask_of(y5b[:])).astype(g5b.dtype)

    # --- conv5-dx: one [256,512] dot + two interleave dots per pair,
    # fed from a linear write-once cache (one block per (g5 row, lane
    # slice); a pair's 4-block window is blocks [2p, 2p+4)). The
    # previous shared per-pair cache serialized every dot against the
    # next pair's cache writes (WAR) — see _compute_y0_phases.
    base_gs4 = 2 * a - 2
    n_g5 = s5 + 3
    for r in range(n_g5):
        g = g5b[pl.ds(r, 1)][0]
        sh[(2 * r) * 128:(2 * r + 1) * 128, :wh5] = g[:, g_sl[0]]
        sh[(2 * r + 1) * 128:(2 * r + 2) * 128, :wh5] = g[:, g_sl[1]]

    def pair_gs4(p):
        out = jnp.dot(w5dx[:], sh[2 * p * 128:(2 * p + 4) * 128, :wh5],
                      precision=prec,
                      preferred_element_type=jnp.float32)  # [256, wh5]
        gpair = (jnp.dot(out[0:128].astype(gs4.dtype), se_t[:],
                         precision=prec,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(out[128:256].astype(gs4.dtype), so_t[:],
                           precision=prec,
                           preferred_element_type=jnp.float32))
        _store_row(gs4, 2 * p, gpair[0:64], wq,
                   scale=_in_range(base_gs4, 2 * p, h1))
        _store_row(gs4, 2 * p + 1, gpair[64:128], wq,
                   scale=_in_range(base_gs4, 2 * p + 1, h1))

    _pairs(2 * s5 + 4, pair_gs4)

    # --- gp3 = g_s4 * leaky'(y3), one whole-buffer elementwise (gs4
    # itself is reused as the residual)
    gp3[:] = (gs4[:].astype(jnp.float32)
              * _mask_of(y3b[:])).astype(gp3.dtype)

    # --- conv3t + y2 gate -> gp2 rows [2a-1, 2b+1). Quad rows fill
    # M=128 (a [64,768] pair dot costs the same MXU passes at M=32
    # utilization); the 2-row remainder uses the pair matrix.
    base_gp = 2 * a - 1
    n_gp2 = 2 * s5 + 2
    for r in range(n_gp2 + 2):
        _shift_block(sh, r * 192, gp3, r, wq, sl)

    def rows_gp2(i, nr, wmat, k):
        out = jnp.dot(wmat[:], sh[i * 192:i * 192 + k, :wq],
                      precision=prec,
                      preferred_element_type=jnp.float32)  # [nr*32, wq]
        for r in range(i, i + nr):
            m2 = _mask_of(y2b[pl.ds(r + 2, 1)][0][:, sl1])
            _store_row(gp2, r, out[(r - i) * 32:(r - i) * 32 + 32] * m2,
                       wq, scale=_in_range(base_gp, r, h1))

    i = 0
    while i + 4 <= n_gp2:
        rows_gp2(i, 4, w3tq, 1152)
        i += 4
    while i + 2 <= n_gp2:
        rows_gp2(i, 2, w3tp, 768)
        i += 2

    # --- conv2t (block-diag) + residual + y1 gate -> gp1; quad rows
    # per dot, 2-row remainder on the lower-left pair sub-block.
    n_gp1r = 2 * s5 + 2
    for r in range(n_gp1r):
        sh[r * 32:(r + 1) * 32, :wq] = gp2[pl.ds(r, 1)][0][:, sl1]

    def rows_gp1(i, nr):
        out = jnp.dot(w2td[0:nr * 64, 0:nr * 32],
                      sh[i * 32:(i + nr) * 32, :wq],
                      precision=prec,
                      preferred_element_type=jnp.float32)
        for r in range(i, i + nr):
            g = (out[(r - i) * 64:(r - i) * 64 + 64]
                 + gs4[pl.ds(r + 1, 1)][0][:, sl1].astype(jnp.float32))
            m1 = _mask_of(y1b[pl.ds(r + 2, 1)][0][:, sl1])
            _store_row(gp1, r, g * m1, wq,
                       scale=_in_range(base_gp, r, h1))

    i = 0
    while i + 4 <= n_gp1r:
        rows_gp1(i, 4)
        i += 4
    while i + 2 <= n_gp1r:
        rows_gp1(i, 2)
        i += 2

    # --- conv1-dx: one [128,256] dot per pair -> phase-split gp0,
    # y0 gates fused. Rows [4a-2, 4b+2); the last (odd) row is dead.
    base_gp0 = 4 * a - 2
    n_gp1 = 2 * s5 + 2
    # one extra clamped block reproduces the old last-pair row clamp
    for r in range(n_gp1 + 1):
        g = gp1[pl.ds(min(r, n_gp1 - 1), 1)][0]
        sh[(2 * r) * 64:(2 * r + 1) * 64, :wq] = g[:, sl[1]]
        sh[(2 * r + 1) * 64:(2 * r + 2) * 64, :wq] = g[:, sl[2]]

    def pair_gp0(p):
        out = jnp.dot(w1dx[:], sh[2 * p * 64:(2 * p + 4) * 64, :wq],
                      precision=prec,
                      preferred_element_type=jnp.float32)  # [128, wq]
        for k, r in enumerate((2 * p, 2 * p + 1)):
            ind = _in_range(base_gp0, r, h)
            me = _mask_of(y0e[pl.ds(r + 5, 1)][0][:, sl1])
            mo = _mask_of(y0o[pl.ds(r + 5, 1)][0][:, sl1])
            _store_row(gp0e, r, out[k * 64:k * 64 + 32] * me, wq,
                       scale=ind)
            _store_row(gp0o, r, out[k * 64 + 32:k * 64 + 64] * mo, wq,
                       scale=ind)

    _pairs(4 * s5 + 4, pair_gp0)

    # --- conv0t, phase-split in/out. Oct rows (8 gx rows x 2 phases x
    # 8 ch) fill M=128 — the [32,512] pair dot burned the same MXU
    # passes at 25% M utilization; a <8-row remainder (odd s5) uses
    # the pair matrix.
    n_gx = 4 * s5
    for r in range(1, n_gx + 3):
        _phase_block(sh, r * 128, gp0e, gp0o, r, wq, sl)

    def rows_gx(q, nr, wmat, k):
        out = jnp.dot(wmat[:], sh[(q + 1) * 128:(q + 1) * 128 + k, :wq],
                      precision=prec,
                      preferred_element_type=jnp.float32)  # [nr*16, wq]
        for j in range(nr):
            _store_out_row(gxe_out, q + j, out[j * 16:j * 16 + 8], wq)
            _store_out_row(gxo_out, q + j,
                           out[j * 16 + 8:j * 16 + 16], wq)

    q = 0
    while q + 8 <= n_gx:
        rows_gx(q, 8, w0to, 1280)
        q += 8
    while q + 2 <= n_gx:
        rows_gx(q, 2, w0tp, 512)
        q += 2


@functools.partial(jax.jit, static_argnames=("s5", "interpret"))
def fused_stem_bwd(xe, xo, y5p, g5p, sp, s5: Optional[int] = None,
                   interpret: bool = False):
    """Input-cotangent: phase-split planar x + saved planar y5 + planar
    cotangent g5 -> phase-split planar (gxE, gxO)."""
    bsz, h, _, wlh = xe.shape
    wq = h // 2
    h5 = h // 4
    if s5 is None:
        s5 = _pick_s5(h5)
    assert h5 % s5 == 0
    n_stripes = h5 // s5
    dt = xe.dtype
    prec = lax.Precision.HIGHEST if dt == jnp.float32 else None
    (w0, b0), (w1, b1), (w2, b2), (w3, b3), (w5, b5) = sp
    wl5 = y5p.shape[-1]

    w0p, w1p, w2d, w3p, _, biases = _fwd_weights(sp, dt)
    w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp = _bwd_weights(sp, dt)
    se_t = _onehot_sel(wq, wq // 2, 2, 0, dt).T   # [wh5, wq]: u -> 2u
    so_t = _onehot_sel(wq, wq // 2, 2, 1, dt).T   # u -> 2u+1

    kernel = functools.partial(
        _bwd_kernel, s5=s5, h=h, n_stripes=n_stripes, wq=wq, prec=prec)
    grid = (bsz, n_stripes)
    out_sds = jax.ShapeDtypeStruct((bsz, h, 8, wlh), dt)
    out_spec = pl.BlockSpec((1, 4 * s5, 8, wlh),
                            lambda b_, r_: (b_, r_, 0, 0),
                            memory_space=pltpu.VMEM)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * 4
                + [vm() for _ in range(17)])
    scratch = [
        pltpu.VMEM((4 * s5 + 16, 8, wlh), dt),      # xe
        pltpu.VMEM((4 * s5 + 16, 8, wlh), dt),      # xo
        pltpu.VMEM((4 * s5 + 14, 32, wlh), dt),     # y0e
        pltpu.VMEM((4 * s5 + 14, 32, wlh), dt),     # y0o
        pltpu.VMEM((2 * s5 + 6, 64, wlh), dt),      # y1
        pltpu.VMEM((2 * s5 + 6, 32, wlh), dt),      # y2
        pltpu.VMEM((2 * s5 + 4, 64, wlh), dt),      # y3
        pltpu.VMEM((s5 + 3, 128, wl5), dt),         # y5
        pltpu.VMEM((s5 + 3, 128, wl5), dt),         # g5 -> gp5
        pltpu.VMEM((2 * s5 + 4, 64, wlh), dt),      # g_s4
        pltpu.VMEM((2 * s5 + 4, 64, wlh), dt),      # gp3
        pltpu.VMEM((2 * s5 + 2, 32, wlh), dt),      # gp2
        pltpu.VMEM((2 * s5 + 2, 64, wlh), dt),      # gp1
        pltpu.VMEM((4 * s5 + 4, 32, wlh), dt),      # gp0e
        pltpu.VMEM((4 * s5 + 4, 32, wlh), dt),      # gp0o
        pltpu.VMEM((_sh_rows_grad(s5, recompute=True), wlh), dt),
        pltpu.SemaphoreType.DMA(()),
    ]
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs, out_specs=(out_spec, out_spec),
        out_shape=(out_sds, out_sds), scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xe, xo, y5p, g5p, w0p, w1p, w2d, w3p, *biases[:4],
      w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp, se_t, so_t)


def _bwd_kernel_sv(y0e_hbm, y0o_hbm, y1_hbm, y2_hbm, y3_hbm,
                   y5_hbm, g5_hbm,
                   w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp,
                   se_t, so_t,
                   gxe_out, gxo_out,
                   y0e, y0o, y1b, y2b, y3b, y5b, g5b,
                   gs4, gp3, gp2, gp1, gp0e, gp0o, sh, sem, *,
                   s5, h, n_stripes, wq, prec):
    """Input-cotangent from forward-saved activations: no recompute —
    the stripe's (halo'd) activations are DMA'd from HBM and only the
    five transpose-conv stages run (~40% fewer ops per stripe than the
    remat kernel)."""
    b = pl.program_id(0)
    rb = pl.program_id(1)
    a = rb * s5
    h1, h5 = h // 2, h // 4

    _halo_copy_multi([
        (y0e_hbm, y0e, 7, 7, 4 * s5, h),
        (y0o_hbm, y0o, 7, 7, 4 * s5, h),
        (y1_hbm, y1b, 3, 3, 2 * s5, h1),
        (y2_hbm, y2b, 3, 3, 2 * s5, h1),
        (y3_hbm, y3b, 2, 2, 2 * s5, h1),
        (y5_hbm, y5b, 1, 2, s5, h5),
        (g5_hbm, g5b, 1, 2, s5, h5),
    ], sem, b, n_stripes=n_stripes)

    _grad_chain(w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp, se_t, so_t,
                gxe_out, gxo_out,
                y0e, y0o, y1b, y2b, y3b, y5b, g5b,
                gs4, gp3, gp2, gp1, gp0e, gp0o, sh,
                a=a, s5=s5, h=h, wq=wq, prec=prec)


def _bwd_weights(sp, dt):
    (w0, b0), (w1, b1), (w2, b2), (w3, b3), (w5, b5) = sp
    w5dx = _blkw((256, 512), _w5dx_pair(w5), dt)
    w1dx = _blkw((128, 256), _w1dx_pair(w1), dt)
    w3t = _flip_t(w3)
    w3tq = _blkw((128, 1152), _w3t_pair(w3t, rows=4), dt)
    w3tp = _blkw((64, 768), _w3t_pair(w3t), dt)
    w2tm = w2.reshape(w2.shape[2], w2.shape[3])
    w2td = _blkw((256, 128), [(0, 0, w2tm), (64, 32, w2tm),
                              (128, 64, w2tm), (192, 96, w2tm)], dt)
    w0t = _pad_cout(_flip_t(w0))
    w0to = _blkw((128, 1280), _w0t_pair(w0t, rows=8), dt)
    w0tp = _blkw((32, 512), _w0t_pair(w0t), dt)
    return w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp


@functools.partial(jax.jit, static_argnames=("s5", "interpret"))
def fused_stem_bwd_saved(acts, g5p, sp, s5: Optional[int] = None,
                         interpret: bool = False):
    """Input-cotangent from ``fused_stem_fwd(..., save_acts=True)``
    outputs: planar activations + planar cotangent g5 -> phase-split
    planar (gxE, gxO)."""
    y5p, y0e_, y0o_, y1_, y2_, y3_ = acts
    bsz, h, _, wlh = y0e_.shape
    wq = h // 2
    h5 = h // 4
    if s5 is None:
        s5 = _pick_s5(h5)
    assert h5 % s5 == 0
    n_stripes = h5 // s5
    dt = y5p.dtype
    gdt = y0e_.dtype                            # int8 sign masks
    prec = lax.Precision.HIGHEST if dt == jnp.float32 else None
    wl5 = y5p.shape[-1]

    w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp = _bwd_weights(sp, dt)
    se_t = _onehot_sel(wq, wq // 2, 2, 0, dt).T
    so_t = _onehot_sel(wq, wq // 2, 2, 1, dt).T

    kernel = functools.partial(
        _bwd_kernel_sv, s5=s5, h=h, n_stripes=n_stripes, wq=wq,
        prec=prec)
    grid = (bsz, n_stripes)
    out_sds = jax.ShapeDtypeStruct((bsz, h, 8, wlh), dt)
    out_spec = pl.BlockSpec((1, 4 * s5, 8, wlh),
                            lambda b_, r_: (b_, r_, 0, 0),
                            memory_space=pltpu.VMEM)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * 7
                + [vm() for _ in range(9)])
    scratch = [
        pltpu.VMEM((4 * s5 + 14, 32, wlh), gdt),    # y0e sign
        pltpu.VMEM((4 * s5 + 14, 32, wlh), gdt),    # y0o sign
        pltpu.VMEM((2 * s5 + 6, 64, wlh), gdt),     # y1 sign
        pltpu.VMEM((2 * s5 + 6, 32, wlh), gdt),     # y2 sign
        pltpu.VMEM((2 * s5 + 4, 64, wlh), gdt),     # y3 sign
        pltpu.VMEM((s5 + 3, 128, wl5), dt),         # y5
        pltpu.VMEM((s5 + 3, 128, wl5), dt),         # g5 -> gp5
        pltpu.VMEM((2 * s5 + 4, 64, wlh), dt),      # g_s4
        pltpu.VMEM((2 * s5 + 4, 64, wlh), dt),      # gp3
        pltpu.VMEM((2 * s5 + 2, 32, wlh), dt),      # gp2
        pltpu.VMEM((2 * s5 + 2, 64, wlh), dt),      # gp1
        pltpu.VMEM((4 * s5 + 4, 32, wlh), dt),      # gp0e
        pltpu.VMEM((4 * s5 + 4, 32, wlh), dt),      # gp0o
        pltpu.VMEM((_sh_rows_grad(s5, recompute=False), wlh), dt),
        pltpu.SemaphoreType.DMA(()),
    ]
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs, out_specs=(out_spec, out_spec),
        out_shape=(out_sds, out_sds), scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(y0e_, y0o_, y1_, y2_, y3_, y5p, g5p,
      w5dx, w1dx, w3tq, w3tp, w2td, w0to, w0tp, se_t, so_t)


# ---------------------------------------------------------------------------
# custom_vjp wrapper (NHWC in / NHWC out) — the drop-in stem
# ---------------------------------------------------------------------------

def fused_applicable(net, params, x_shape) -> bool:
    """stem_planar.stem_applicable AND the yolov3 channel widths these
    kernels hard-code in their block-sparse weight matrices
    (3->32->64->32->64->128); the planar per-layer kernels are
    channel-generic, the megakernels are not."""
    from ..models.stem_planar import STEM_CONVS, stem_applicable
    if not stem_applicable(net, params, x_shape):
        return False
    filters = tuple(net.layers[i].conv.filters for i in STEM_CONVS)
    return filters == (32, 64, 32, 64, 128)


@jax.custom_vjp
def fused_stem(x, sp):
    """NHWC [B,H,W,3] -> NHWC [B,H/4,W/4,128] through the fused
    megakernels. ``sp``: list of (w_hwio, bias) for convs 0,1,2,3,5
    (BN-folded). The backward consumes activations saved by the
    forward (no recompute); ~0.5 GB of planar residuals at b8 608^2
    bf16 — use ``fused_stem_remat`` where memory is tighter than
    time. Only the input cotangent is real — this framework only ever
    differentiates the patch pixels (reference train_patch.py:131);
    parameter cotangents are zeros."""
    xe, xo = split_phases(x)
    y5p = fused_stem_fwd(xe, xo, sp)
    return _y5_to_nhwc(y5p, x.shape[1] // 4)


def _fs_fwd(x, sp):
    xe, xo = split_phases(x)
    acts = fused_stem_fwd(xe, xo, sp, save_acts=True)
    out = _y5_to_nhwc(acts[0], x.shape[1] // 4)
    return out, (acts, sp)


def _fs_bwd(resid, g5):
    acts, sp = resid
    h = acts[1].shape[1]
    gxe, gxo = fused_stem_bwd_saved(
        acts, _g5_to_planar(g5.astype(acts[0].dtype)), sp)
    gx = merge_phases(gxe, gxo, h // 2, 3)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, sp)
    return gx, zeros


fused_stem.defvjp(_fs_fwd, _fs_bwd)


@jax.custom_vjp
def fused_stem_planar(x, sp):
    """``fused_stem`` variant that STOPS AT PLANAR: NHWC [B,H,W,3] ->
    planar y5 [B, H/4, 128, Wl5], and its backward consumes a PLANAR
    g5 cotangent. Exists so a downstream planar consumer (the
    conv12-widened 152^2 stage, models/res_planar.res152_c12_fused)
    can chain directly on the stem's native layout — deleting the
    planar->NHWC->planar round trips at the stem/stage boundary in
    both directions."""
    xe, xo = split_phases(x)
    return fused_stem_fwd(xe, xo, sp)


def _fsp_fwd(x, sp):
    xe, xo = split_phases(x)
    acts = fused_stem_fwd(xe, xo, sp, save_acts=True)
    return acts[0], (acts, sp)


def _fsp_bwd(resid, g5p):
    acts, sp = resid
    h = acts[1].shape[1]
    gxe, gxo = fused_stem_bwd_saved(acts, g5p.astype(acts[0].dtype), sp)
    gx = merge_phases(gxe, gxo, h // 2, 3)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, sp)
    return gx, zeros


fused_stem_planar.defvjp(_fsp_fwd, _fsp_bwd)


@jax.custom_vjp
def fused_stem_remat(x, sp):
    """``fused_stem`` variant whose backward rematerializes the stem
    activations in VMEM instead of saving them (slower, near-zero
    residual memory: x phases + y5 only)."""
    xe, xo = split_phases(x)
    y5p = fused_stem_fwd(xe, xo, sp)
    return _y5_to_nhwc(y5p, x.shape[1] // 4)


def _fsr_fwd(x, sp):
    xe, xo = split_phases(x)
    y5p = fused_stem_fwd(xe, xo, sp)
    out = _y5_to_nhwc(y5p, x.shape[1] // 4)
    return out, (xe, xo, y5p, sp)


def _fsr_bwd(resid, g5):
    xe, xo, y5p, sp = resid
    h = xe.shape[1]
    gxe, gxo = fused_stem_bwd(xe, xo, y5p,
                              _g5_to_planar(g5.astype(xe.dtype)), sp)
    gx = merge_phases(gxe, gxo, h // 2, 3)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, sp)
    return gx, zeros


fused_stem_remat.defvjp(_fsr_fwd, _fsr_bwd)
