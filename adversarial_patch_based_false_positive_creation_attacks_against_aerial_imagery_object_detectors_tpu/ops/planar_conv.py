"""Planar Pallas conv kernels for the low-channel high-resolution
front end of the detector.

Why: XLA's NHWC convs on TPU run the YOLOv3-DOTA stem (608^2 C3->32,
608^2 C32->64/s2, 304^2 C64->32 1x1, 304^2 C32->64, 304^2 C64->128/s2)
at 1.6-18 TF/s while the C>=128 residual towers hit ~150 TF/s — the
channel dim is far too small for the 128-lane vector layout, so both
HBM traffic and MXU feeds are mostly padding. These kernels instead use
a *planar* activation layout ``[B, H, C, W+2]`` (image width on lanes —
dense at W=608/304 — channels on sublanes, 1-pixel zero border baked
into W for the 3x3 taps) and compute each conv as per-output-row MXU
matmuls ``W[cout, 3cin] @ SH[3cin, W]`` over a shifted-row cache built
in VMEM. The stem stays in planar layout end to end (one cheap
transpose in at C=3, one out at C=128).

Semantics match ``lax.conv_general_dilated`` + bias + leaky exactly up
to f32-accumulation rounding (parity-tested against XLA in
tests/test_planar_conv.py). Used by ``models.darknet.apply`` through a
``custom_vjp`` whose backward is the XLA transpose conv (the forward
kernels are the measured hot spot; a Pallas backward can slot in behind
the same interface).

No reference analog: the reference's stem is stock torch Conv2d
(darknet_v3.py:9-100); this file exists purely for TPU speed-of-light.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Layout helpers
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def to_planar(x: jnp.ndarray, c_pad: Optional[int] = None) -> jnp.ndarray:
    """[B, H, W, C] NHWC -> [B, H, C', Wl] planar.

    The W dim moves to lanes: shifted right by 1 (zero border for the
    3x3 taps) and zero-padded to a multiple of 128 (Mosaic DMA views
    need a tile-aligned lane extent). ``c_pad`` zero-pads the channel
    dim (second-minor must be tile-aligned too; use 8 for C=3 inputs —
    planar_conv zero-pads the kernel's input channels to match)."""
    b, h, w_img, c = x.shape
    xp = jnp.transpose(x, (0, 1, 3, 2))
    extra_c = (c_pad - c) if c_pad else 0
    wl = _round_up(w_img + 2, 128)
    return jnp.pad(xp, ((0, 0), (0, 0), (0, extra_c),
                        (1, wl - w_img - 1)))


def from_planar(xp: jnp.ndarray, w_img: Optional[int] = None,
                c: Optional[int] = None) -> jnp.ndarray:
    """[B, H, C, Wl] planar -> [B, H, W, C] NHWC. ``w_img`` defaults to
    H (square images)."""
    w_img = w_img if w_img is not None else xp.shape[1]
    c = c if c is not None else xp.shape[2]
    return jnp.transpose(xp[:, :, :c, 1:w_img + 1], (0, 1, 3, 2))


def use_mxu_layout() -> bool:
    """NHWC<->planar conversions at the stem-kernel boundaries via the
    MXU shifted-identity kernels (TPU only; XLA lowers the jnp
    transpose+pad as ~1 ms/step of layout copies at b8 and picks
    unstable conv layouts around the loose boundary).
    ADV_PATCH_MXU_LAYOUT=0/1 forces either way (=1 is used by tests to
    exercise the kernel path off-TPU in interpret mode)."""
    import os
    env = os.environ.get("ADV_PATCH_MXU_LAYOUT")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def to_planar_auto(x: jnp.ndarray, c_pad: Optional[int] = None):
    """MXU conversion kernel when profitable, jnp fallback otherwise.
    The NHWC side's minor dim must be lane-aligned: a pallas operand
    with C=3 minor forces a 3->128 lane-padded tiling copy (measured
    12.8 ms for [8,608,608,3] — 100x worse than the jnp path)."""
    if use_mxu_layout() and x.shape[-1] % 128 == 0:
        return to_planar_mxu(x, c_pad=c_pad)
    return to_planar(x, c_pad=c_pad)


def from_planar_auto(xp: jnp.ndarray, w_img: int, c: int):
    if use_mxu_layout() and c % 128 == 0:
        return from_planar_mxu(xp, w_img, c)
    return from_planar(xp, w_img, c=c)


def _shift_mat(w_in: int, w_out: int, wl: int, dtype, step: int = 1,
               offset: int = 0):
    """[w_in, wl] one-hot: input column ``step*j + offset`` -> lane
    ``j+1`` for j < w_out (to_planar's 1-lane border shift; step=2
    folds the stride-2 phase decimation into the same dot). One matrix
    serves both conversion directions."""
    r = lax.broadcasted_iota(jnp.int32, (w_in, wl), 0)
    c = lax.broadcasted_iota(jnp.int32, (w_in, wl), 1)
    return ((r == step * (c - 1) + offset) & (c >= 1)
            & (c <= w_out)).astype(dtype)


def _row_chunk(h: int) -> int:
    for hs in (8, 4, 2):
        if h % hs == 0:
            return hs
    return 1


@functools.partial(jax.jit,
                   static_argnames=("c_pad", "step", "offset", "interpret"))
def to_planar_mxu(x: jnp.ndarray, c_pad: Optional[int] = None,
                  step: int = 1, offset: int = 0,
                  interpret: bool = False) -> jnp.ndarray:
    """``to_planar`` as a Pallas kernel: per image row, ONE MXU dot
    against a shifted identity emits the whole transposed,
    border-shifted, lane-padded planar row. ``step``/``offset``
    additionally fold a strided column decimation into the dot
    (``step=2, offset=0|1`` = split_phases' even/odd lanes).

    Why: at the stem kernels' boundaries XLA lowers the transpose+pad
    as a data-formatting copy chain (~1 ms/step at b8 152^2x128 each
    way) and the loose layouts invite extra conv-layout copies; the dot
    form rides the MXU at a few percent of that and pins default
    layouts. Exact for any dtype: every output element is a single
    1.0*x product, f32-accumulated."""
    b, h, w_in, c = x.shape
    w_out = (w_in - offset + step - 1) // step
    wl = _round_up(w_out + 2, 128)
    cp = max(c_pad or c, c)
    hs = _row_chunk(h)
    shift = _shift_mat(w_in, w_out, wl, x.dtype, step, offset)
    prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)

    def kernel(x_ref, s_ref, o_ref):
        s = s_ref[...]
        for r in range(hs):
            t = lax.dot_general(
                x_ref[0, r], s, (((0,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
            if cp > c:
                t = jnp.concatenate(
                    [t, jnp.zeros((cp - c, wl), o_ref.dtype)], axis=0)
            o_ref[0, r] = t

    return pl.pallas_call(
        kernel, grid=(b, h // hs),
        in_specs=[pl.BlockSpec((1, hs, w_in, c), lambda b_, r_: (b_, r_, 0, 0)),
                  pl.BlockSpec((w_in, wl), lambda b_, r_: (0, 0))],
        out_specs=pl.BlockSpec((1, hs, cp, wl), lambda b_, r_: (b_, r_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, cp, wl), x.dtype),
        interpret=interpret,
    )(x, shift)


@functools.partial(jax.jit, static_argnames=("w_img", "c", "interpret"))
def from_planar_mxu(xp: jnp.ndarray, w_img: int, c: int,
                    interpret: bool = False) -> jnp.ndarray:
    """``from_planar`` as a Pallas kernel (see ``to_planar_mxu``): the
    same shifted identity, contracted on lanes, un-shifts and
    re-transposes the planar row back to NHWC."""
    b, h, cp, wl = xp.shape
    hs = _row_chunk(h)
    shift = _shift_mat(w_img, w_img, wl, xp.dtype)
    prec = (lax.Precision.HIGHEST if xp.dtype == jnp.float32 else None)

    def kernel(x_ref, s_ref, o_ref):
        s = s_ref[...]
        for r in range(hs):
            o_ref[0, r] = lax.dot_general(
                s, x_ref[0, r, :c], (((1,), (1,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel, grid=(b, h // hs),
        in_specs=[pl.BlockSpec((1, hs, cp, wl), lambda b_, r_: (b_, r_, 0, 0)),
                  pl.BlockSpec((w_img, wl), lambda b_, r_: (0, 0))],
        out_specs=pl.BlockSpec((1, hs, w_img, c), lambda b_, r_: (b_, r_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w_img, c), xp.dtype),
        interpret=interpret,
    )(xp, shift)


def _leaky(x, slope):
    return jnp.maximum(x, x * slope) if slope is not None else x


def expand2_planar(xp: jnp.ndarray, w_img: int) -> jnp.ndarray:
    """Zero-interleave rows and image columns: planar [B, H, C, Wl] at
    (H, W) -> planar [B, 2H, C, Wl'] at (2H, 2W) with value (i, j) at
    (2i, 2j). This is the exact adjoint of the stride-2 forward kernels'
    even-index decimation, so
    ``planar_conv(expand2_planar(g), flip_t(w), 0, k=3, slope=None)``
    is the exact input-cotangent of ``planar_conv(x, w, b, k=3,
    stride=2)`` (one lax.pad with interior padding — a pure layout op)."""
    b, h, c, _ = xp.shape
    interior = xp[:, :, :, 1:w_img + 1]
    w2 = 2 * w_img
    wl2 = _round_up(w2 + 2, 128)
    z = jnp.zeros_like(interior)
    # stack+reshape interleaves (value at even index) — measured much
    # faster on TPU than lax.pad with interior padding, which lowers
    # scatter-like
    lanes = jnp.stack([interior, z], axis=-1).reshape(b, h, c, w2)
    rows = jnp.stack([lanes, jnp.zeros_like(lanes)],
                     axis=2).reshape(b, 2 * h, c, w2)
    return jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (1, wl2 - w2 - 1)))


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------

def _k3_kernel(x_hbm, w_ref, b_ref, out_ref, xp, sh, sem, *,
               h_in, w_img, cin, cout, r_out, stride, slope, small_cin,
               prec=None, res_ref=None, gate_ref=None, gate_slope=0.1):
    """3x3 conv, stride 1 or 2.

    x_hbm: [B, H, cin, W+2] in ANY/HBM; manual halo DMA.
    w_ref: small_cin -> [cout, 9*cin] (taps (dy,dx,ci));
           else        [3, cout, 3*cin] per-dy (taps (dx,ci)).
    out_ref: [1, r_out, cout, Wo+2] VMEM block.
    xp:  [r_in, cin, W+2] scratch (input rows, W-borders from storage)
    sh:  small_cin -> [r_out, 9*cin, W] shifted cache per OUTPUT row
         else        [r_in, 3*cin, W] shifted cache per INPUT row
    """
    rb = pl.program_id(1)
    b = pl.program_id(0)
    # rows [h0, h0+r_in) feed r_out output rows: r_in = (r_out-1)*s + 3
    r_in = r_out * stride + 3 - stride

    # --- halo DMA: h0 = rb*r_out*s - 1. The top block misses its first
    # row; the bottom block overflows by one for stride 1 (s2 fits).
    h0 = rb * (r_out * stride) - 1
    top = rb == 0
    bot = h0 + r_in > h_in

    @pl.when(top)
    def _():
        xp[0] = jnp.zeros_like(xp[0])

    @pl.when(bot)
    def _():
        xp[r_in - 1] = jnp.zeros_like(xp[r_in - 1])

    src0 = jnp.maximum(h0, 0)

    # constant-size DMA per static case (sizes must be static)
    def copy(nr, d0):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src0, nr)], xp.at[pl.ds(d0, nr)], sem)
        cp.start()
        cp.wait()

    interior = jnp.logical_not(jnp.logical_or(top, bot))

    @pl.when(interior)
    def _():
        copy(r_in, 0)

    @pl.when(jnp.logical_and(top, jnp.logical_not(bot)))
    def _():
        copy(r_in - 1, 1)

    @pl.when(jnp.logical_and(bot, jnp.logical_not(top)))
    def _():
        copy(r_in - 1, 0)

    @pl.when(jnp.logical_and(top, bot))
    def _():
        copy(r_in - 2, 1)

    # --- shifted caches
    if small_cin:
        # per-output-row 9-tap cache: one K=9cin matmul per row
        for r in range(r_out):
            for dy in range(3):
                for dx in range(3):
                    t = dy * 3 + dx
                    sh[r, t * cin:(t + 1) * cin, :] = \
                        xp[r * stride + dy, :, dx:dx + w_img]
    else:
        for ri in range(r_in):
            for dx in range(3):
                sh[ri, dx * cin:(dx + 1) * cin, :] = \
                    xp[ri, :, dx:dx + w_img]

    # --- per-row matmuls + epilogue
    bias = b_ref[:].astype(jnp.float32)  # [cout, 1]

    def conv_row(r):
        if small_cin:
            acc = jnp.dot(w_ref[:], sh[r], precision=prec,
                          preferred_element_type=jnp.float32)
        else:
            k = 3 * cin
            acc = jnp.zeros((cout, w_img), jnp.float32)
            for dy in range(3):
                a = sh[r * stride + dy]
                wd = w_ref[dy]
                if k <= 128:
                    acc = acc + jnp.dot(wd, a, precision=prec,
                                        preferred_element_type=jnp.float32)
                else:
                    for c0 in range(0, k, 128):
                        c1 = min(c0 + 128, k)
                        acc = acc + jnp.dot(
                            wd[:, c0:c1], a[c0:c1], precision=prec,
                            preferred_element_type=jnp.float32)
        return _leaky(acc + bias, slope)

    def write_row(r, y):
        wo = y.shape[1]
        if res_ref is not None:
            y = y + res_ref[0, r, :, 1:wo + 1].astype(jnp.float32)
        if gate_ref is not None:
            # vector-vector select (where with scalar arms trips a
            # Mosaic relayout); compare in f32 (packed-bf16 cmpf is
            # unsupported on v5e)
            gv = gate_ref[0, r, :, 1:wo + 1].astype(jnp.float32)
            y = jnp.where(gv > 0, y, y * gate_slope)
        wl_out = out_ref.shape[3]
        out_ref[0, r, :, 1:wo + 1] = y.astype(out_ref.dtype)
        out_ref[0, r, :, 0:1] = jnp.zeros((cout, 1), out_ref.dtype)
        out_ref[0, r, :, wo + 1:] = jnp.zeros((cout, wl_out - wo - 1),
                                              out_ref.dtype)

    if stride == 1:
        for r in range(r_out):
            write_row(r, conv_row(r))
    else:
        # Lane decimation: strided slices/gathers don't lower on Mosaic;
        # a one-hot select-matmul does (exact — each output is a single
        # 1.0 * value product). Run it in the output dtype (for bf16
        # that's the rounding the reference conv applies anyway) and on
        # PAIRS of rows so M=2*cout fills the MXU.
        wo = w_img // 2
        sel = (lax.broadcasted_iota(jnp.int32, (w_img, wo), 0) ==
               2 * lax.broadcasted_iota(jnp.int32, (w_img, wo), 1)
               ).astype(out_ref.dtype)

        def decimate(y):
            return lax.dot_general(
                y, sel, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        for r in range(0, r_out - 1, 2):
            pair = jnp.concatenate(
                [conv_row(r).astype(out_ref.dtype),
                 conv_row(r + 1).astype(out_ref.dtype)], axis=0)
            dec = decimate(pair)
            write_row(r, dec[:cout])
            write_row(r + 1, dec[cout:])
        if r_out % 2:
            write_row(r_out - 1,
                      decimate(conv_row(r_out - 1).astype(out_ref.dtype)))


def _k1_kernel(x_ref, w_ref, b_ref, out_ref, *, cout, slope, w_img,
               prec=None, res_ref=None, gate_ref=None, gate_slope=0.1):
    """1x1 conv: blocked matmul over [cin, Wl] rows. No halo, auto-DMA."""
    r_out = x_ref.shape[1]
    wl = x_ref.shape[3]
    bias = b_ref[:].astype(jnp.float32)
    # zero borders + lane tail via mask (they would otherwise become
    # leaky(bias))
    lanes = lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    mask = (lanes >= 1) & (lanes <= w_img)
    for r in range(r_out):
        acc = jnp.dot(w_ref[:], x_ref[0, r], precision=prec,
                      preferred_element_type=jnp.float32)
        y = _leaky(acc + bias, slope)
        if res_ref is not None:
            y = y + res_ref[0, r].astype(jnp.float32)
        if gate_ref is not None:
            gv = gate_ref[0, r].astype(jnp.float32)
            y = jnp.where(gv > 0, y, y * gate_slope)
        out_ref[0, r] = jnp.where(mask, y, 0.0).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

SMALL_CIN_MAX = 8  # 9*cin <= 72 <= 128: single-matmul-per-row path

VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16M scoped limit


def _auto_r_out(h_out, cin, cout, stride, wl_in, wl_out, w_img, isize, k,
                n_out_blocks=1):
    """Largest row-block (pow2-ish) whose scratch + blocks fit VMEM.
    ``n_out_blocks``: out + any res/gate operands blocked like it."""
    for r in (16, 8, 4, 2, 1):
        if h_out % r:
            continue
        r_in = r * stride + 3 - stride
        if r_in > h_out * stride:  # block halo must fit in the image
            continue
        sh = (r * 9 * cin * w_img if cin <= SMALL_CIN_MAX
              else r_in * 3 * cin * w_img) if k == 3 else 0
        xp_s = r_in * cin * wl_in if k == 3 else 2 * r * cin * wl_in
        est = isize * (xp_s + sh + 2 * n_out_blocks * r * cout * wl_out)
        if est <= VMEM_BUDGET:
            return r
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("k", "stride", "slope", "r_out", "w_img",
                     "gate_slope", "interpret"))
def planar_conv(xp: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                res: Optional[jnp.ndarray] = None, *,
                k: int, stride: int = 1, slope: Optional[float] = 0.1,
                r_out: Optional[int] = None, w_img: Optional[int] = None,
                gate: Optional[jnp.ndarray] = None,
                gate_slope: float = 0.1,
                interpret: bool = False) -> jnp.ndarray:
    """Conv + bias + leaky (+ residual add, + gate) on planar activations.

    xp: [B, H, cin, Wl] (to_planar format); w: [k, k, cin, cout] HWIO;
    b: [cout]; res: optional [B, H_out, cout, Wl_out] added *after* the
    activation (darknet shortcut semantics); w_img: image width
    (defaults to H — square). ``gate``: optional [B, H_out, cout,
    Wl_out] tensor whose sign scales the output LAST (after res):
    ``out *= where(gate > 0, 1, gate_slope)`` — the fused leaky-backward
    mask used by the stem's backward pass (stem_planar._stem_bwd).
    Returns [B, H_out, cout, Wl_out] planar, dtype of xp.
    """
    batch, h_in, cin, wl_in = xp.shape
    w_img = w_img if w_img is not None else h_in
    cout = w.shape[-1]
    if w.shape[2] < cin:  # channel-padded planar input (e.g. C=3 -> 8)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin - w.shape[2]), (0, 0)))
    h_out = h_in // stride
    w_out = w_img // stride
    wl_out = _round_up(w_out + 2, 128)
    if r_out is None:
        n_out = 1 + (res is not None) + (gate is not None)
        r_out = _auto_r_out(h_out, cin, cout, stride, wl_in, wl_out,
                            w_img, xp.dtype.itemsize, k, n_out)
    assert h_out % r_out == 0, (h_out, r_out)
    assert wl_in == _round_up(w_img + 2, 128), (wl_in, w_img)
    grid = (batch, h_out // r_out)
    out_shape = jax.ShapeDtypeStruct((batch, h_out, cout, wl_out),
                                     xp.dtype)
    out_spec = pl.BlockSpec((1, r_out, cout, wl_out),
                            lambda b_, r_: (b_, r_, 0, 0),
                            memory_space=pltpu.VMEM)
    bias2d = b.reshape(cout, 1)
    # f32 inputs: force exact MXU mode (default truncates to bf16)
    prec = (lax.Precision.HIGHEST if xp.dtype == jnp.float32
            else None)

    if k == 1:
        wmat = w.reshape(cin, cout).T.astype(xp.dtype)  # [cout, cin]
        in_specs = [
            pl.BlockSpec((1, r_out, cin, wl_in),
                         lambda b_, r_: (b_, r_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = [xp, wmat, bias2d]
        extra = []
        for name, t in (("res_ref", res), ("gate_ref", gate)):
            if t is not None:
                in_specs.append(out_spec)
                args.append(t)
                extra.append(name)
        kernel = functools.partial(
            _k1_kernel, cout=cout, slope=slope, w_img=w_img, prec=prec,
            gate_slope=gate_slope)

        def body(x_, w_, b_, *rest):
            opt, o_ = rest[:len(extra)], rest[len(extra)]
            kernel(x_, w_, b_, o_, **dict(zip(extra, opt)))

        return pl.pallas_call(
            body, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
        )(*args)

    assert k == 3
    small = cin <= SMALL_CIN_MAX
    r_in = r_out * stride + 3 - stride
    if small:
        wmat = w.transpose(3, 0, 1, 2).reshape(cout, 9 * cin)
        sh_shape = (r_out, 9 * cin, w_img)
    else:
        wmat = w.transpose(0, 3, 1, 2).reshape(3, cout, 3 * cin)
        sh_shape = (r_in, 3 * cin, w_img)
    wmat = wmat.astype(xp.dtype)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # x: manual halo DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
    ]
    args = [xp, wmat, bias2d]
    extra = []
    for name, t in (("res_ref", res), ("gate_ref", gate)):
        if t is not None:
            in_specs.append(out_spec)
            args.append(t)
            extra.append(name)

    base = functools.partial(
        _k3_kernel, h_in=h_in, w_img=w_img, cin=cin, cout=cout,
        r_out=r_out, stride=stride, slope=slope, small_cin=small,
        prec=prec, gate_slope=gate_slope)

    def body(x_, w_, b_, *rest):
        opt = rest[:len(extra)]
        o_, xp_, sh_, sem_ = rest[len(extra):]
        base(x_, w_, b_, o_, xp_, sh_, sem_, **dict(zip(extra, opt)))

    return pl.pallas_call(
        body, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((r_in, cin, wl_in), xp.dtype),
            pltpu.VMEM(sh_shape, xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Reference (XLA) implementation for parity tests
# ---------------------------------------------------------------------------

def planar_conv_reference(xp, w, b, res=None, *, k, stride=1, slope=0.1,
                          w_img=None, gate=None, gate_slope=0.1):
    """Same contract as planar_conv, via lax.conv (for tests/backward)."""
    x = from_planar(xp, w_img, c=w.shape[2])
    pad = (k - 1) // 2
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b.astype(y.dtype)
    if slope is not None:
        y = jnp.where(y > 0, y, slope * y)
    yp = to_planar(y)
    if res is not None:
        yp = yp + res
    if gate is not None:
        yp = yp * jnp.where(gate > 0, 1.0, gate_slope).astype(yp.dtype)
    return yp
