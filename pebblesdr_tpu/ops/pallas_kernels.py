"""Pallas TPU kernel: the fused wideband FRONT END.

One kernel runs the entire full-rate half of the receive chain — DC blocker +
NCO mixer + the whole halfband decimator cascade — replacing the reference's
per-sample CDownConvert loop (pebblelib/downconvert.cpp:257-325) and the
separate DCRemoval/Mixer/Decimator steps (application/receiver.cpp:814-911):

  * the input block is read from HBM exactly ONCE (the staged XLA pipeline
    costs ~40 full-rate passes; honest-synced measurement on v5e: 0.16 vs
    0.35 ms/block for 64ch x 32k);
  * the DC blocker is the chunked-EWMA formulation (exact
    ops.iir.dc_removal_chunked semantics, chunk=512);
  * the oscillator is factorized (coarse x fine phasor tables — 16x fewer
    transcendentals than a per-sample ramp) with split-precision phase
    (ops.mixer semantics, zero amplitude drift vs the reference's
    renormalized recursive oscillator, mixer.cpp:61-67);
  * the decimator cascade is collapsed by the noble identity into ONE
    composed FIR (ops.decimator.compose_response) applied as a Toeplitz-block
    MXU dot per time sub-block — no per-stage state, just a D-sample raw
    history (D = composed group delay, ~710 for the 32x plan).

Layout contract: time-major [N, C] float32 planes with channels on lanes.
Feed 2D arrays — this backend's default layout for rank-3+ arrays is
N-minor ((0,2,1)), and any XLA-side reshape/slice of a big 3D input into the
kernel costs a full ~50 GB/s retiling pass.

Grid: sequential time sub-blocks; the DC estimate and the post-mix history
live in constant-index output refs, so they stay VMEM-resident across grid
steps.  Streaming-exact: block-by-block == one-shot (tests/test_pallas.py
validates against the staged XLA ops in interpret mode; the same kernel
compiles for real TPUs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TWO_PI = 2.0 * math.pi

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
