"""Pallas TPU kernels: fused downconvert (NCO mix + halfband cascade).

The CDownConvert analog (pebblelib/downconvert.cpp:257-325 fuses oscillator +
decimation per-sample for CPU speed): here ONE Pallas kernel keeps the entire
wideband front end in VMEM — read the [C, 2, N] float32 IQ block from HBM
once, generate the per-channel phase ramp, complex-multiply, run every
decimate-by-2 polyphase stage on-chip, and write only the 2^k-times-smaller
baseband block (plus the per-stage carry tails) back to HBM.  The op is
bandwidth-bound, so eliminating the per-stage HBM round-trips puts it at the
speed-of-light input-read bound.

Grid: channel tiles (TILE_C channels per program); everything inside a tile
is plain jnp on VMEM refs (VPU work, static shapes).  Falls back to the
ops.mixer + ops.decimator XLA path when unavailable (use_pallas=False or
non-TPU backends — the kernel also runs under interpret=True for CPU tests).

STATUS: numerically validated in interpret mode (tests/test_pallas.py).
Mosaic currently rejects the stride-2 lane access the even/odd split needs
('tpu.reshape'/'extract_strided_slice' limitations), so real-TPU compilation
requires the planned time-major [N, channels-on-lanes] layout where the
even/odd split lands on the sublane dimension; until then the XLA polyphase
path (ops.fir.fir_decimate2_polyphase, 0.04 ms/block for 64ch x 32k on v5e)
is the production front end.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TWO_PI = 2.0 * math.pi


def _cascade_kernel(taps_list, n, tile_c,
                    x_ref, phase_ref, fhi_ref, flo_ref, *refs):
    """refs: [tail_in_0..k-1, y_ref, tail_out_0..k-1]."""
    k = len(taps_list)
    tail_in = refs[:k]
    y_ref = refs[k]
    tail_out = refs[k + 1:]

    xr = x_ref[:, 0, :]
    xi = x_ref[:, 1, :]

    # ---- NCO mix: exact split-precision phase ramp (ops.mixer semantics) ----
    i = jax.lax.broadcasted_iota(jnp.int32, (tile_c, n), 1).astype(jnp.float32)
    fhi = fhi_ref[:, 0][:, None]
    flo = flo_ref[:, 0][:, None]
    ramp = jnp.mod(i * fhi, 1.0) + i * flo
    ph = jnp.mod(phase_ref[:, 0][:, None] + ramp, 1.0)
    ang = TWO_PI * ph
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    # (xr + j*xi) * exp(-j*ang)
    yr = xr * c + xi * s
    yi = xi * c - xr * s

    # ---- halfband cascade, polyphase shifted adds, all in VMEM -------------
    for st in range(k):
        taps = taps_list[st]
        t = len(taps)
        tr = tail_in[st][:, 0, :]
        ti = tail_in[st][:, 1, :]
        er = jnp.concatenate([tr, yr], axis=-1)  # [TC, L + T - 1]
        ei = jnp.concatenate([ti, yi], axis=-1)
        ln = yr.shape[-1]
        m = ln // 2
        # new tails = last T-1 columns of the extended input
        tail_out[st][:, 0, :] = er[:, -(t - 1):]
        tail_out[st][:, 1, :] = ei[:, -(t - 1):]
        # even/odd split via strided slices (Mosaic rejects lane reshapes)
        l2 = er.shape[-1]
        if l2 % 2:
            er = jnp.concatenate([er, jnp.zeros((tile_c, 1), jnp.float32)], -1)
            ei = jnp.concatenate([ei, jnp.zeros((tile_c, 1), jnp.float32)], -1)
            l2 += 1
        ee_r = jax.lax.slice(er, (0, 0), (tile_c, l2), (1, 2))
        eo_r = jax.lax.slice(er, (0, 1), (tile_c, l2), (1, 2))
        ee_i = jax.lax.slice(ei, (0, 0), (tile_c, l2), (1, 2))
        eo_i = jax.lax.slice(ei, (0, 1), (tile_c, l2), (1, 2))
        acc_r = None
        acc_i = None
        for j in range(t):
            h = float(taps[j])
            if h == 0.0:
                continue
            idx = t - 1 - j
            off = idx // 2
            if (idx & 1) == 0:
                term_r = h * jax.lax.slice_in_dim(ee_r, off, off + m, axis=1)
                term_i = h * jax.lax.slice_in_dim(ee_i, off, off + m, axis=1)
            else:
                term_r = h * jax.lax.slice_in_dim(eo_r, off, off + m, axis=1)
                term_i = h * jax.lax.slice_in_dim(eo_i, off, off + m, axis=1)
            acc_r = term_r if acc_r is None else acc_r + term_r
            acc_i = term_i if acc_i is None else acc_i + term_i
        yr, yi = acc_r, acc_i

    y_ref[:, 0, :] = yr
    y_ref[:, 1, :] = yi


@functools.partial(jax.jit, static_argnames=("taps_tuple", "tile_c", "interpret"))
def fused_downconvert(x_ri: jax.Array, phase0: jax.Array, f_hi: jax.Array,
                      f_lo: jax.Array, tails_ri: tuple,
                      taps_tuple: tuple, tile_c: int = 8,
                      interpret: bool = False):
    """x_ri: [C, 2, N] f32; phase0/f_hi/f_lo: [C]; tails_ri: per-stage
    [C, 2, T_s-1] f32.  taps_tuple: tuple of tap tuples (static).

    Returns (y_ri [C, 2, N/2^k], new_tails_ri tuple, new_phase [C]).
    """
    c, _, n = x_ri.shape
    k = len(taps_tuple)
    m_out = n >> k
    assert c % tile_c == 0, (c, tile_c)
    grid = (c // tile_c,)

    def row_map(i):
        return (i, 0, 0)

    in_specs = [
        pl.BlockSpec((tile_c, 2, n), row_map),
        pl.BlockSpec((tile_c, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile_c, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile_c, 1), lambda i: (i, 0)),
    ]
    for taps in taps_tuple:
        in_specs.append(pl.BlockSpec((tile_c, 2, len(taps) - 1), row_map))

    out_shapes = [jax.ShapeDtypeStruct((c, 2, m_out), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_c, 2, m_out), row_map)]
    for taps in taps_tuple:
        out_shapes.append(jax.ShapeDtypeStruct((c, 2, len(taps) - 1), jnp.float32))
        out_specs.append(pl.BlockSpec((tile_c, 2, len(taps) - 1), row_map))

    kernel = functools.partial(_cascade_kernel, taps_tuple, n, tile_c)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_ri, phase0[:, None], f_hi[:, None], f_lo[:, None], *tails_ri)
    y_ri = outs[0]
    new_tails = tuple(outs[1:])
    # phase advance (host formula, same as ops.mixer.mix)
    nf = jnp.float32(n)
    new_phase = jnp.mod(phase0 + jnp.mod(nf * f_hi, 1.0) + nf * f_lo, 1.0)
    return y_ri, new_tails, new_phase


def plan_taps_tuple(plan) -> tuple:
    """ops.decimator.DecimatorPlan -> static taps tuple for the kernel."""
    return tuple(tuple(float(v) for v in st.taps) for st in plan.stages)


# --------------------------------------------------------------------------
# v2: TIME-MAJOR layout [time, channels] — channels ride the 128 lanes and
# the even/odd decimation split lands on the SUBLANE (major) dimension, which
# Mosaic supports (the lane-dim stride-2 access of the channel-major kernel
# above does not lower).  This is the kernel that compiles for real TPUs.
# --------------------------------------------------------------------------

def _cascade_tm_kernel(taps_list, b, c_lanes,
                       xr_ref, xi_ref, phase_ref, fhi_ref, flo_ref, *refs):
    """Time-major: xr/xi [B, C]; tails per stage [2*(T-1), C] stacked (re then
    im rows); outputs y_r/y_i [B/2^k, C] + new tails."""
    k = len(taps_list)
    tail_in = refs[:k]
    yr_ref, yi_ref = refs[k], refs[k + 1]
    tail_out = refs[k + 2:]

    # ---- NCO mix (phase ramp along the sublane/time dim) -------------------
    i = jax.lax.broadcasted_iota(jnp.int32, (b, c_lanes), 0).astype(jnp.float32)
    fhi = fhi_ref[0, :][None, :]
    flo = flo_ref[0, :][None, :]
    ph = jnp.mod(phase_ref[0, :][None, :] + jnp.mod(i * fhi, 1.0) + i * flo, 1.0)
    ang = TWO_PI * ph
    cs = jnp.cos(ang)
    sn = jnp.sin(ang)
    xr = xr_ref[:, :]
    xi = xi_ref[:, :]
    yr = xr * cs + xi * sn
    yi = xi * cs - xr * sn

    for st in range(k):
        taps = taps_list[st]
        t = len(taps)
        tl = tail_in[st]
        er = jnp.concatenate([tl[: t - 1, :], yr], axis=0)   # [L+T-1, C]
        ei = jnp.concatenate([tl[t - 1:, :], yi], axis=0)
        ln = yr.shape[0]
        m = ln // 2
        tail_out[st][: t - 1, :] = er[-(t - 1):, :]
        tail_out[st][t - 1:, :] = ei[-(t - 1):, :]
        l2 = er.shape[0]
        if l2 % 2:
            pad = jnp.zeros((1, c_lanes), jnp.float32)
            er = jnp.concatenate([er, pad], axis=0)
            ei = jnp.concatenate([ei, pad], axis=0)
            l2 += 1
        er2 = er.reshape(l2 // 2, 2, c_lanes)
        ei2 = ei.reshape(l2 // 2, 2, c_lanes)
        ee_r, eo_r = er2[:, 0, :], er2[:, 1, :]
        ee_i, eo_i = ei2[:, 0, :], ei2[:, 1, :]
        acc_r = acc_i = None
        for j in range(t):
            h = float(taps[j])
            if h == 0.0:
                continue
            idx = t - 1 - j
            off = idx // 2
            src_r = ee_r if (idx & 1) == 0 else eo_r
            src_i = ee_i if (idx & 1) == 0 else eo_i
            term_r = h * jax.lax.slice_in_dim(src_r, off, off + m, axis=0)
            term_i = h * jax.lax.slice_in_dim(src_i, off, off + m, axis=0)
            acc_r = term_r if acc_r is None else acc_r + term_r
            acc_i = term_i if acc_i is None else acc_i + term_i
        yr, yi = acc_r, acc_i

    yr_ref[:, :] = yr
    yi_ref[:, :] = yi


def _cascade_tm_grid_kernel(taps_list, sub_block, c_lanes, nsub,
                            xr_ref, xi_ref, phase_ref, fhi_ref, flo_ref,
                            *refs):
    """Grid variant: one kernel instance, grid=(nsub,) sub-blocks executed
    sequentially on the core.  The per-stage carry tails live in the tail
    OUTPUT refs (constant index map -> the block stays resident in VMEM across
    grid iterations); iteration 0 seeds them from the tail inputs.

    refs: [tail_in_0..k-1, yr, yi, tail_out_0..k-1]."""
    k = len(taps_list)
    tail_in = refs[:k]
    yr_ref, yi_ref = refs[k], refs[k + 1]
    tail_out = refs[k + 2:]

    s = pl.program_id(0)

    # ---- NCO mix: phase = phase0 + (s*sub_block + i) * (fhi + flo) ---------
    i = jax.lax.broadcasted_iota(jnp.int32, (sub_block, c_lanes), 0
                                 ).astype(jnp.float32)
    fhi = fhi_ref[0, :][None, :]
    flo = flo_ref[0, :][None, :]
    k0 = (s * sub_block).astype(jnp.float32)
    ph0 = jnp.mod(phase_ref[0, :][None, :]
                  + jnp.mod(k0 * fhi, 1.0) + k0 * flo, 1.0)
    ph = jnp.mod(ph0 + jnp.mod(i * fhi, 1.0) + i * flo, 1.0)
    ang = TWO_PI * ph
    cs = jnp.cos(ang)
    sn = jnp.sin(ang)
    xr = xr_ref[:, :]
    xi = xi_ref[:, :]
    yr = xr * cs + xi * sn
    yi = xi * cs - xr * sn

    first = s == 0
    for st in range(k):
        taps = taps_list[st]
        t = len(taps)
        tl = jnp.where(first, tail_in[st][:, :], tail_out[st][:, :])
        er = jnp.concatenate([tl[: t - 1, :], yr], axis=0)   # [L+T-1, C]
        ei = jnp.concatenate([tl[t - 1:, :], yi], axis=0)
        ln = yr.shape[0]
        m = ln // 2
        tail_out[st][: t - 1, :] = er[-(t - 1):, :]
        tail_out[st][t - 1:, :] = ei[-(t - 1):, :]
        l2 = er.shape[0]
        if l2 % 2:
            pad = jnp.zeros((1, c_lanes), jnp.float32)
            er = jnp.concatenate([er, pad], axis=0)
            ei = jnp.concatenate([ei, pad], axis=0)
            l2 += 1
        er2 = er.reshape(l2 // 2, 2, c_lanes)
        ei2 = ei.reshape(l2 // 2, 2, c_lanes)
        ee_r, eo_r = er2[:, 0, :], er2[:, 1, :]
        ee_i, eo_i = ei2[:, 0, :], ei2[:, 1, :]
        acc_r = acc_i = None
        for j in range(t):
            h = float(taps[j])
            if h == 0.0:
                continue
            idx = t - 1 - j
            off = idx // 2
            src_r = ee_r if (idx & 1) == 0 else eo_r
            src_i = ee_i if (idx & 1) == 0 else eo_i
            term_r = h * jax.lax.slice_in_dim(src_r, off, off + m, axis=0)
            term_i = h * jax.lax.slice_in_dim(src_i, off, off + m, axis=0)
            acc_r = term_r if acc_r is None else acc_r + term_r
            acc_i = term_i if acc_i is None else acc_i + term_i
        yr, yi = acc_r, acc_i

    yr_ref[:, :] = yr
    yi_ref[:, :] = yi


def fused_downconvert_planes(xr_t: jax.Array, xi_t: jax.Array,
                             phase0: jax.Array, f_hi: jax.Array,
                             f_lo: jax.Array, tails_tm: list,
                             taps_tuple: tuple, sub_block: int = 512,
                             interpret: bool = False):
    """Transpose-free core: time-major planes in, time-major planes out.

    xr_t/xi_t: [N, C] f32; tails_tm: per stage [2*(T-1), C] (re rows then im
    rows).  Returns (yr [M, C], yi [M, C], new_tails_tm list).

    One pallas_call with grid=(N/sub_block,): sub-blocks run sequentially on
    the core with the carry tails resident in VMEM, so there is a single
    kernel instance to compile and a single launch per block (the previous
    Python-loop formulation emitted N/sub_block separate pallas_calls, which
    dominated both compile time and dispatch overhead).
    """
    n, c = xr_t.shape
    k = len(taps_tuple)
    assert n % sub_block == 0
    nsub = n // sub_block
    m_sub = sub_block >> k
    phase_row = phase0[None, :]
    fhi_row = f_hi[None, :].astype(jnp.float32)
    flo_row = f_lo[None, :].astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((sub_block, c), lambda s: (s, 0)),
        pl.BlockSpec((sub_block, c), lambda s: (s, 0)),
        pl.BlockSpec((1, c), lambda s: (0, 0)),
        pl.BlockSpec((1, c), lambda s: (0, 0)),
        pl.BlockSpec((1, c), lambda s: (0, 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((nsub * m_sub, c), jnp.float32),
                  jax.ShapeDtypeStruct((nsub * m_sub, c), jnp.float32)]
    out_specs = [pl.BlockSpec((m_sub, c), lambda s: (s, 0)),
                 pl.BlockSpec((m_sub, c), lambda s: (s, 0))]
    for taps in taps_tuple:
        rows = 2 * (len(taps) - 1)
        in_specs.append(pl.BlockSpec((rows, c), lambda s: (0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((rows, c), jnp.float32))
        out_specs.append(pl.BlockSpec((rows, c), lambda s: (0, 0)))

    kernel = functools.partial(_cascade_tm_grid_kernel, taps_tuple, sub_block,
                               c, nsub)
    outs = pl.pallas_call(
        kernel,
        grid=(nsub,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xr_t, xi_t, phase_row, fhi_row, flo_row, *tails_tm)
    return outs[0], outs[1], list(outs[2:])


@functools.partial(jax.jit,
                   static_argnames=("taps_tuple", "sub_block", "interpret"))
def fused_downconvert_tm(x_ri: jax.Array, phase0: jax.Array, f_hi: jax.Array,
                         f_lo: jax.Array, tails_ri: tuple, taps_tuple: tuple,
                         sub_block: int = 4096, interpret: bool = False):
    """Time-major fused downconvert (TPU-compiling variant).

    Same contract as fused_downconvert: x_ri [C, 2, N] f32, per-channel
    phase/freq [C], tails_ri per stage [C, 2, T-1].  Streams the block through
    the kernel in `sub_block`-sample chunks (VMEM bound), threading tails.
    """
    c, _, n = x_ri.shape
    # time-major planes [N, C]
    xr_t = jnp.transpose(x_ri[:, 0, :])
    xi_t = jnp.transpose(x_ri[:, 1, :])
    # tails -> stacked time-major [2*(T-1), C]
    tails_tm = [
        jnp.concatenate([jnp.transpose(t_ri[:, 0, :]),
                         jnp.transpose(t_ri[:, 1, :])], axis=0)
        for t_ri in tails_ri
    ]
    yr, yi, tails_tm = fused_downconvert_planes(
        xr_t, xi_t, phase0, f_hi, f_lo, tails_tm, taps_tuple,
        sub_block=sub_block, interpret=interpret)
    y_ri = jnp.stack([jnp.transpose(yr), jnp.transpose(yi)], axis=1)
    new_tails = tuple(
        jnp.stack([jnp.transpose(tm[: tm.shape[0] // 2, :]),
                   jnp.transpose(tm[tm.shape[0] // 2:, :])], axis=1)
        for tm in tails_tm
    )
    nf = jnp.float32(n)
    new_phase = jnp.mod(phase0 + jnp.mod(nf * f_hi, 1.0) + nf * f_lo, 1.0)
    return y_ri, new_tails, new_phase


# ---------------------------------------------------------------------------
# Fused FRONT END: DC blocker + NCO mix + composed-FIR decimation, one kernel.
#
# The staged XLA front end (dc_removal_chunked -> mixer.mix -> decimator.apply)
# costs ~40 distinct full-rate HBM passes per block (measured 0.35 ms/block at
# 64ch x 32k on v5e through the tunnel); this kernel reads the input once,
# does everything in VMEM, and turns the ENTIRE halfband cascade into a single
# MXU dot against the composed response (decimator.compose_response — the
# noble-identity collapse of conv h1 ↓2 conv h2 ↓2 ... into conv H ↓2^k).
#
# Layout: time-major [N, C] float32 planes, C channels on lanes.  Grid over
# time sub-blocks; the D-sample post-mix history and the DC estimate live in
# output refs with constant index maps, so they stay VMEM-resident across the
# sequential grid steps (same pattern as _cascade_tm_grid_kernel).
# ---------------------------------------------------------------------------

DC_CHUNK = 512  # matches ops.iir.dc_removal_chunked default


def build_composed_w(h: np.ndarray, factor: int, sub_block: int,
                     pad: int) -> np.ndarray:
    """W [pad + D + sub, sub/factor] f32 with W[w, o] = H[D + pad + F*o - w]
    (zero outside [0, D]): the Toeplitz block mapping a tail-extended
    time-major input chunk to its decimated outputs, y = W^T @ xext."""
    d = len(h) - 1
    o_out = sub_block // factor
    wn = pad + d + sub_block
    w = np.zeros((wn, o_out), np.float32)
    for o in range(o_out):
        base = pad + d + factor * o
        w[base - d: base + 1, o] = h[::-1]
    return w


def _front_kernel(sub_block, c_lanes, d_rows, dc_alpha_c, nchunk, nsub_blk,
                  raw_rows,
                  xr_ref, xi_ref, phase_ref, fhi_ref, flo_ref, wt_ref,
                  dc_in_ref, tail_in_ref,
                  yr_ref, yi_ref, dc_out_ref, tail_out_ref,
                  rawr_ref, rawi_ref):
    """One grid step: sub_block input rows -> sub_block/F output rows.

    dc refs: [2, C] (re, im of the chunked-EWMA DC estimate).
    tail refs: [2 * d_rows, C] post-mix history planes (re rows, then im).
    wt_ref: [o_out, d_rows + sub_block] composed-response Toeplitz transpose.
    rawr/rawi: [n_blocks, raw_rows, C] — each *logical block*'s trailing
    raw input rows (display-spectrum tails), written on its last sub-block.
    Exporting them here keeps the entry planes single-consumer with the
    default 2D layout (the backend's default 3D layout is (0,2,1) N-minor,
    so any XLA-side [K, N, C] view of the input costs a full retiling copy).
    """
    s = pl.program_id(0)
    first = s == 0
    xr = xr_ref[:, :]
    xi = xi_ref[:, :]

    @pl.when(s % nsub_blk == nsub_blk - 1)
    def _():
        rawr_ref[0, :, :] = xr[sub_block - raw_rows:, :]
        rawi_ref[0, :, :] = xi[sub_block - raw_rows:, :]

    # ---- DC blocker: piecewise-constant per DC_CHUNK, EWMA across chunks
    # (exact dc_removal_chunked semantics: means -> first-order recurrence
    # with alpha^chunk -> subtract) --------------------------------------
    mr = jnp.where(first, dc_in_ref[0:1, :], dc_out_ref[0:1, :])
    mi = jnp.where(first, dc_in_ref[1:2, :], dc_out_ref[1:2, :])
    xr3 = xr.reshape(nchunk, DC_CHUNK, c_lanes)
    xi3 = xi.reshape(nchunk, DC_CHUNK, c_lanes)
    mean_r = jnp.mean(xr3, axis=1)  # [nchunk, C]
    mean_i = jnp.mean(xi3, axis=1)
    a = dc_alpha_c
    ms_r = []
    ms_i = []
    for k in range(nchunk):  # tiny unrolled recurrence (nchunk = sub/512)
        mr = a * mr + (1.0 - a) * mean_r[k:k + 1, :]
        mi = a * mi + (1.0 - a) * mean_i[k:k + 1, :]
        ms_r.append(mr)
        ms_i.append(mi)
    dc_out_ref[0:1, :] = mr
    dc_out_ref[1:2, :] = mi
    m_r = jnp.concatenate(ms_r, axis=0)[:, None, :]  # [nchunk, 1, C]
    m_i = jnp.concatenate(ms_i, axis=0)[:, None, :]
    zr = (xr3 - m_r).reshape(sub_block, c_lanes)
    zi = (xi3 - m_i).reshape(sub_block, c_lanes)

    # ---- NCO mix, factorized (coarse 128-sample chunks x fine ramp):
    # osc[q*128 + r] = exp(-j*2*pi*(ph0 + (q*128 + r)*f)) -----------------
    fhi = fhi_ref[0, :][None, :]
    flo = flo_ref[0, :][None, :]
    k0 = (s * sub_block).astype(jnp.float32)
    ph0 = jnp.mod(phase_ref[0, :][None, :]
                  + jnp.mod(k0 * fhi, 1.0) + k0 * flo, 1.0)
    nq = sub_block // 128
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (128, c_lanes), 0
                                     ).astype(jnp.float32)
    fine_arg = jnp.mod(jnp.mod(r_idx * fhi, 1.0) + r_idx * flo, 1.0)
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (nq, c_lanes), 0
                                     ).astype(jnp.float32) * 128.0
    coarse_arg = jnp.mod(ph0 + jnp.mod(q_idx * fhi, 1.0) + q_idx * flo, 1.0)
    fr_ = jnp.cos(TWO_PI * fine_arg)
    fi_ = jnp.sin(TWO_PI * fine_arg)
    cr_ = jnp.cos(TWO_PI * coarse_arg)
    ci_ = jnp.sin(TWO_PI * coarse_arg)
    # osc = (cr - j*ci)(fr - j*fi); y = z * osc
    or_ = cr_[:, None, :] * fr_[None, :, :] - ci_[:, None, :] * fi_[None, :, :]
    oi_ = cr_[:, None, :] * fi_[None, :, :] + ci_[:, None, :] * fr_[None, :, :]
    zr3 = zr.reshape(nq, 128, c_lanes)
    zi3 = zi.reshape(nq, 128, c_lanes)
    yr = (zr3 * or_ + zi3 * oi_).reshape(sub_block, c_lanes)
    yi = (zi3 * or_ - zr3 * oi_).reshape(sub_block, c_lanes)

    # ---- composed-FIR decimation: one MXU dot per plane ------------------
    tl = jnp.where(first, tail_in_ref[:, :], tail_out_ref[:, :])
    er = jnp.concatenate([tl[:d_rows, :], yr], axis=0)   # [d_rows + sub, C]
    ei = jnp.concatenate([tl[d_rows:, :], yi], axis=0)
    tail_out_ref[:d_rows, :] = er[-d_rows:, :]
    tail_out_ref[d_rows:, :] = ei[-d_rows:, :]
    wt = wt_ref[:, :]
    yr_ref[:, :] = jnp.dot(wt, er, preferred_element_type=jnp.float32)
    yi_ref[:, :] = jnp.dot(wt, ei, preferred_element_type=jnp.float32)


def fused_front_planes(xr_t: jax.Array, xi_t: jax.Array,
                       dc_ri: jax.Array, phase0: jax.Array,
                       f_hi: jax.Array, f_lo: jax.Array,
                       tail_tm: jax.Array, wt: jax.Array,
                       factor: int, d_rows: int, dc_alpha: float,
                       sub_block: int = 2048, n_block: int = 0,
                       raw_rows: int = 0, interpret: bool = False):
    """Whole front end in one pallas_call.

    xr_t/xi_t: [N, C] f32 time-major planes (the raw input layout) — N may
    span many logical blocks (n_block rows each; defaults to N).
    dc_ri: [2, C] DC estimate (re, im).  phase0/f_hi/f_lo: [C].
    tail_tm: [2*d_rows, C] post-mix history (re rows then im rows); d_rows =
    composed delay D padded so that d_rows + sub_block stays 8-aligned.
    wt: [sub/factor, d_rows + sub_block] from build_composed_w().T.

    Returns (yr [M, C], yi [M, C], dc_ri', tail_tm', phase',
    raw_r [K, raw_rows, C], raw_i) with M = N/factor, K = N/n_block; raw_*
    hold each logical block's trailing raw input rows (display tails).
    """
    n, c = xr_t.shape
    assert n % sub_block == 0 and sub_block % DC_CHUNK == 0
    if not n_block:
        n_block = n
    assert n % n_block == 0 and n_block % sub_block == 0
    k_blocks = n // n_block
    nsub_blk = n_block // sub_block
    nsub = n // sub_block
    m_sub = sub_block // factor
    nchunk = sub_block // DC_CHUNK
    a_c = float(dc_alpha) ** DC_CHUNK
    raw_rows = min(raw_rows, sub_block) or 8

    kern = functools.partial(_front_kernel, sub_block, c, d_rows, a_c,
                             nchunk, nsub_blk, raw_rows)
    in_specs = [
        pl.BlockSpec((sub_block, c), lambda s: (s, 0)),
        pl.BlockSpec((sub_block, c), lambda s: (s, 0)),
        pl.BlockSpec((1, c), lambda s: (0, 0)),
        pl.BlockSpec((1, c), lambda s: (0, 0)),
        pl.BlockSpec((1, c), lambda s: (0, 0)),
        pl.BlockSpec((m_sub, d_rows + sub_block), lambda s: (0, 0)),
        pl.BlockSpec((2, c), lambda s: (0, 0)),
        pl.BlockSpec((2 * d_rows, c), lambda s: (0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nsub * m_sub, c), jnp.float32),
        jax.ShapeDtypeStruct((nsub * m_sub, c), jnp.float32),
        jax.ShapeDtypeStruct((2, c), jnp.float32),
        jax.ShapeDtypeStruct((2 * d_rows, c), jnp.float32),
        jax.ShapeDtypeStruct((k_blocks, raw_rows, c), jnp.float32),
        jax.ShapeDtypeStruct((k_blocks, raw_rows, c), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((m_sub, c), lambda s: (s, 0)),
        pl.BlockSpec((m_sub, c), lambda s: (s, 0)),
        pl.BlockSpec((2, c), lambda s: (0, 0)),
        pl.BlockSpec((2 * d_rows, c), lambda s: (0, 0)),
        pl.BlockSpec((1, raw_rows, c), lambda s, _n=nsub_blk: (s // _n, 0, 0)),
        pl.BlockSpec((1, raw_rows, c), lambda s, _n=nsub_blk: (s // _n, 0, 0)),
    ]
    yr, yi, dc2, tail2, raw_r, raw_i = pl.pallas_call(
        kern, grid=(nsub,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(xr_t, xi_t, phase0[None, :], f_hi[None, :].astype(jnp.float32),
      f_lo[None, :].astype(jnp.float32), wt, dc_ri, tail_tm)
    phase2 = jnp.mod(phase0 + jnp.mod(n * f_hi, 1.0) + n * f_lo, 1.0)
    return yr, yi, dc2, tail2, phase2, raw_r, raw_i
