"""Pallas TPU kernel: the fused wideband FRONT END.

One kernel runs the entire full-rate half of the receive chain — DC blocker +
NCO mixer + the whole halfband decimator cascade — replacing the reference's
per-sample CDownConvert loop (pebblelib/downconvert.cpp:257-325) and the
separate DCRemoval/Mixer/Decimator steps (application/receiver.cpp:814-911):

  * the input block is read from HBM exactly ONCE (the staged XLA pipeline
    costs ~40 full-rate passes);
  * the DC blocker is the chunked-EWMA formulation (exact
    ops.iir.dc_removal_chunked semantics, chunk=512);
  * the oscillator is factorized (coarse phasors computed per sub-block x a
    128-sample fine phasor table precomputed OUTSIDE the kernel — the fine
    table is grid-invariant, so the per-step transcendental count drops from
    sub_block to sub_block/128 per channel) with split-precision phase
    (ops.mixer semantics, zero amplitude drift vs the reference's
    renormalized recursive oscillator, mixer.cpp:61-67);
  * the decimator cascade is collapsed by the noble identity into ONE
    composed FIR (ops.decimator.compose_response) applied as a Toeplitz-block
    MXU dot per time sub-block — no per-stage state, just a D-sample raw
    history (D = composed group delay, ~710 for the 32x plan).

Layout contract (v2, lane-packed): ONE time-major [N, 2C] float32 plane with
re in lanes [0, C) and im in lanes [C, 2C).  At the flagship C=64 this fills
all 128 vector lanes; the unpacked two-plane form wasted half the DMA and
VPU lanes (honest-synced on v5e, 64ch x 32k: 0.118 -> 0.066 ms/block, with a
copy-only floor of 0.049).  Every elementwise stage runs on the packed plane;
the complex mix needs the half-swapped plane [im | re], one lane-roll.  The
composed FIR becomes a single [m, K] @ [K, 2C] MXU dot (real taps apply to re
and im identically).

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
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi

DC_CHUNK = 512  # matches ops.iir.dc_removal_chunked default


def _atan2(y, x):
    """Four-quadrant arctangent from Mosaic-lowerable primitives (the TPU
    Pallas lowering has no atan2): octant reduction + the Cephes atanf
    4-term polynomial (~2e-7 max error over the reduced range — far below
    the f32 FM discriminator's own noise floor)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    a = mn / jnp.maximum(mx, 1e-30)
    big = a > 0.4142135623730951          # tan(pi/8): second reduction
    t = jnp.where(big, (a - 1.0) / (a + 1.0), a)
    s = t * t
    p = ((8.05374449538e-2 * s - 1.38776856032e-1) * s
         + 1.99777106478e-1) * s - 3.33329491539e-1
    r = p * s * t + t
    r = jnp.where(big, r + 0.7853981633974483, r)
    r = jnp.where(ay > ax, 1.5707963267948966 - r, r)
    # IEEE signed zero: atan2(+-0, -0.0) = +-pi (XLA/libm semantics — the
    # first-ever discriminator sample multiplies by a zero seed and lands
    # exactly here, so the kernel must agree with the XLA path); a plain
    # x < 0 misses -0.0, the reciprocal's sign does not
    neg_x = (x < 0) | ((x == 0) & (1.0 / x < 0))
    r = jnp.where(neg_x, 3.141592653589793 - r, r)
    return jnp.where(y < 0, -r, r)



def _split_bf16(w):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= w to ~2^-17 relative."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(wh, wl, e):
    """~f32-accurate MXU dot from three bf16 passes (Mosaic supports only
    DEFAULT=1 bf16 pass or HIGHEST=6 passes for f32; 6 passes double the
    whole-chain block time while one pass loses 2^-8 — enough to lift the
    S-meter noise floor by ~30 dB on hardware.  The classic split
    w = wh + wl, e = eh + el recovers ~2^-16 with the wl*el term dropped):
    wh/wl [m, K] bf16; e [K, L] f32 -> [m, L] f32."""
    eh = e.astype(jnp.bfloat16)
    el = (e - eh.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(wh, eh, preferred_element_type=jnp.float32)
            + jnp.dot(wh, el, preferred_element_type=jnp.float32)
            + jnp.dot(wl, eh, preferred_element_type=jnp.float32))


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


def _front_kernel(sub_block, c, d_rows, dc_alpha_c, nchunk, nsub_blk,
                  raw_rows, factor, m_tile, disc_gain, interpret,
                  iqbal, nb_mode, nb_thr, nb_bw, nb_alpha_c, in_scale,
                  comp_decim, comp_hist_rows, y_tail, *refs):
    """One grid step: sub_block packed rows -> sub_block/F packed rows.

    c is the packed HALF-width.  For the plain layout that is the channel
    count; for the TIME-FOLDED layout (small channel counts) c = fold*C and
    the lanes are [re(g0) re(g1) ... | im(g0) im(g1) ...] with lane group g
    holding time segment g — physically DENSE on the TPU's (8, 128) tiling,
    where a narrow [N, 2C] plane at C<=32 pads its minor dim to 128 lanes
    and wastes the corresponding HBM bandwidth.  The kernel is layout-
    oblivious: per-group seams arrive as per-lane phases / DC seeds / tail
    halos (see fused_front_packed fold>1).

    x_ref: [sub, 2c] packed.  dc/tail refs: [1, 2c] / [d_rows, 2c].
    phase/fhi/flo: [1, 2c] duplicated halves.  fr1/fi1/fi2/fr2: [128, 2c]
    precomputed fine-phasor tables ([fr|fr], [fi|fi], [fi|-fi], [fr|-fr]).
    wt_ref: [m_sub, d_rows + sub] composed-response Toeplitz transpose.
    raw_ref: [n_blocks, raw_rows, 2c] — each *logical block*'s trailing raw
    input rows (display-spectrum tails), written on its last sub-block.

    disc_gain != 0 (WFM): the kernel also emits the FM DISCRIMINATOR of the
    decimated composite — atan2(y[m]·conj(y[m-1]))·gain — as a [m_sub, c]
    real plane per step, with the previous composite sample carried in a
    constant-index ref (seeded per lane group by the wrapper).  The
    composite is already in VMEM after the Toeplitz dot, so the demod's
    dominant transcendental pass costs no extra HBM traffic and the
    [C, N] channel-major relayout of the composite disappears from the
    WFM tail entirely.
    """
    # ref unpacking follows the in_specs/out_specs assembly order in
    # fused_front_packed: optional stages contribute refs only when enabled
    refs = list(refs)
    (x_ref, phase_ref, fhi_ref, flo_ref,
     fr1_ref, fi1_ref, fi2_ref, fr2_ref,
     wth_ref, wtl_ref, dc_in_ref, tail_in_ref) = refs[:12]
    pos = 12
    if iqbal:
        s1_ref, s2_ref = refs[pos:pos + 2]
        pos += 2
    if nb_mode:
        nb_avg_in_ref, nb_tail_in_ref = refs[pos:pos + 2]
        pos += 2
    if disc_gain:
        disc_in_ref = refs[pos]
        pos += 1
        if comp_decim:
            cwh_ref, cwl_ref, chist_in_ref = refs[pos:pos + 3]
            pos += 3
    y_ref, dc_out_ref, tail_out_ref, raw_ref = refs[pos:pos + 4]
    pos += 4
    if nb_mode:
        nb_avg_out_ref, nb_tail_out_ref = refs[pos:pos + 2]
        pos += 2
    if disc_gain:
        disc_ref, dlast_ref = refs[pos:pos + 2]
        if comp_decim:
            chist_out_ref = refs[pos + 2]
    s = pl.program_id(0)
    first = s == 0
    xx = x_ref[:, :]
    if in_scale:
        # i16 ENTRY PLANES: the input DMA (the kernel's dominant HBM read)
        # moves native-ADC int16 — half the f32 bytes, full 96 dB dynamic
        # range (bf16's 8-bit mantissa would cap ~48 dB); dequantize once
        # in VMEM.  Everything downstream (incl. the raw display export)
        # stays f32.
        xx = xx.astype(jnp.float32) * in_scale

    @pl.when(s % nsub_blk == nsub_blk - 1)
    def _():
        raw_ref[0, :, :] = xx[sub_block - raw_rows:, :]

    # ---- DC blocker: piecewise-constant per DC_CHUNK, EWMA across chunks
    # (exact dc_removal_chunked semantics); packed lanes are independent ----
    m = jnp.where(first, dc_in_ref[0:1, :], dc_out_ref[0:1, :])
    x3 = xx.reshape(nchunk, DC_CHUNK, 2 * c)
    means = jnp.mean(x3, axis=1)              # [nchunk, 2C]
    a = dc_alpha_c
    ms = []
    for k in range(nchunk):  # tiny unrolled recurrence (nchunk = sub/512)
        m = a * m + (1.0 - a) * means[k:k + 1, :]
        ms.append(m)
    dc_out_ref[0:1, :] = m
    mm = jnp.concatenate(ms, axis=0)[:, None, :]
    z = (x3 - mm).reshape(sub_block, 2 * c)

    def _swap(v):
        if interpret:  # pltpu.roll is Mosaic-only
            return jnp.concatenate([v[:, c:], v[:, :c]], axis=1)
        return pltpu.roll(v, c, 1)

    # ---- static IQ balance (iqbalance.cpp:65-75), packed 2x2 lane mix:
    # re' = gain*re, im' = im + phase*re  ==  z*S1 + swap(z)*S2 with
    # S1 = [gain | 1], S2 = [0 | phase] — runtime params, no recompile ------
    if iqbal:
        z = z * s1_ref[0:1, :] + _swap(z) * s2_ref[0:1, :]

    # ---- noise blanker (noiseblanker.cpp:45-98), chunked-EWMA semantics
    # (scanops.noise_blanker_chunked is the exact twin): piecewise-constant
    # magnitude average per DC_CHUNK, spikes vs the chunk-entry average,
    # CAUSAL blank_width dilation with a carried spike tail ----------------
    # the half-swapped plane: used by the noise blanker's magnitude AND the
    # complex mix below — ONE roll serves both (the NB mask is half-
    # symmetric, so blanking commutes with the mix and applies to the
    # mixed product at the end; see below)
    zsw = _swap(z)
    nb_w = None
    nb_scale = None
    if nb_mode:
        # POWER-domain detection (scanops.noise_blanker_chunked twin): the
        # tracked average is the RMS (EWMA of |x|^2) and the spike test is
        # |x|^2 > thr^2 * avg2 — algebraically |x| > thr*RMS, which skips
        # the full-rate sqrt pass entirely (NB1; NB2's substitution pays
        # one rsqrt on the selected samples' scale)
        mag2 = z * z + zsw * zsw                      # per-lane |channel|^2
        mag3 = mag2.reshape(nchunk, DC_CHUNK, 2 * c)
        means_nb = jnp.mean(mag3, axis=1)             # [nchunk, 2C]
        m_nb = jnp.where(first, nb_avg_in_ref[0:1, :], nb_avg_out_ref[0:1, :])
        avg_rows = []
        for k in range(nchunk):
            avg_rows.append(m_nb)                     # average ENTERING k
            m_nb = nb_alpha_c * m_nb + (1.0 - nb_alpha_c) * means_nb[k:k + 1, :]
        nb_avg_out_ref[0:1, :] = m_nb
        avg_s = jnp.concatenate(avg_rows, axis=0)[:, None, :]  # [nchunk,1,2C]
        thr2 = nb_thr * nb_thr
        spike = (mag3 > thr2 * jnp.maximum(avg_s, 1e-18)).reshape(
            sub_block, 2 * c).astype(jnp.float32)
        t_rows = nb_tail_in_ref.shape[0]              # 16 (tile-aligned)
        assert t_rows > (nb_bw - 1) and t_rows % 8 == 0
        tl_nb = jnp.where(first, nb_tail_in_ref[:, :], nb_tail_out_ref[:, :])
        # causal width-bw dilation as LOG-STEP rolls on the tile-aligned
        # extended buffer (f32 0/1 flags — Mosaic's rotate only supports
        # 32-bit data).  Sublane rolls wrap, but the contamination indices
        # stay < t_rows (total shift <= bw-1 < 16) — entirely inside the
        # prepended tail rows we slice off, and the final [t_rows:] slice
        # is tile-aligned (no relayout).
        ext_nb = jnp.concatenate([tl_nb, spike], axis=0)  # [16 + sub, 2C]
        shifts = []
        cum = 0
        sh = 1
        while cum < nb_bw - 1:
            sh = min(sh, nb_bw - 1 - cum)
            shifts.append(sh)
            cum += sh
            sh = cum + 1
        w = ext_nb
        for sh in shifts:
            if interpret:
                w = jnp.maximum(w, jnp.roll(w, sh, axis=0))
            else:
                w = jnp.maximum(w, pltpu.roll(w, sh, 0))
        nb_w = w[t_rows:, :]
        nb_tail_out_ref[:, :] = spike[sub_block - t_rows:, :]
        if nb_mode != 1:   # NB2: substitute at the running RMS level —
            # the real per-sample scale commutes with the complex rotation,
            # so it too applies to the MIXED product (one fused pass)
            avg_full = jnp.broadcast_to(
                avg_s, (nchunk, DC_CHUNK, 2 * c)).reshape(sub_block, 2 * c)
            nb_scale = jnp.sqrt(avg_full / jnp.maximum(mag2, 1e-24))

    # ---- NCO mix, fully packed: osc = conj phasor, factorized coarse x fine;
    # yr = zr*or + zi*oi ; yi = zi*or - zr*oi  ==  y = z*A + roll(z, C)*B
    # with A = [or|or] and B = [oi|-oi] built from the packed tables --------
    fhi = fhi_ref[0, :][None, :]
    flo = flo_ref[0, :][None, :]
    k0 = (s * sub_block).astype(jnp.float32)
    ph0 = jnp.mod(phase_ref[0, :][None, :]
                  + jnp.mod(k0 * fhi, 1.0) + k0 * flo, 1.0)
    nq = sub_block // 128
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (nq, 2 * c), 0
                                     ).astype(jnp.float32) * 128.0
    coarse = jnp.mod(ph0 + jnp.mod(q_idx * fhi, 1.0) + q_idx * flo, 1.0)
    cr2 = jnp.cos(TWO_PI * coarse)            # [nq, 2C]
    ci2 = jnp.sin(TWO_PI * coarse)
    fr1 = fr1_ref[:, :]
    fi1 = fi1_ref[:, :]
    fi2 = fi2_ref[:, :]
    fr2 = fr2_ref[:, :]
    a_ = cr2[:, None, :] * fr1[None, :, :] - ci2[:, None, :] * fi1[None, :, :]
    b_ = cr2[:, None, :] * fi2[None, :, :] + ci2[:, None, :] * fr2[None, :, :]
    z3 = z.reshape(nq, 128, 2 * c)
    zs3 = zsw.reshape(nq, 128, 2 * c)         # [im | re], rolled above
    ypk = z3 * a_ + zs3 * b_
    if nb_w is not None:
        # blanking/substitution applied to the MIXED product (exactly
        # commutes: the mask is half-symmetric and NB2's scale is real)
        w3 = nb_w.reshape(nq, 128, 2 * c)
        if nb_scale is None:
            ypk = jnp.where(w3 > 0, 0.0, ypk)
        else:
            ypk = jnp.where(w3 > 0, ypk * nb_scale.reshape(nq, 128, 2 * c),
                            ypk)
    ypk = ypk.reshape(sub_block, 2 * c)

    # ---- composed-FIR decimation: packed MXU dot(s).  The dense Toeplitz
    # block is banded (band = D+1 of d_rows + sub rows); at small decimation
    # factors the band is a few % of the matrix, so tile the output rows —
    # each m_tile-row tile only reads its own span of the extended input
    # (factor 4 WFM plan: 6.5x fewer MACs than the single dense dot) --------
    tl = jnp.where(first, tail_in_ref[:, :], tail_out_ref[:, :])
    e2 = jnp.concatenate([tl, ypk], axis=0)   # [d_rows + sub, 2C]
    tail_out_ref[:, :] = e2[-d_rows:, :]
    m_sub = sub_block // factor
    if m_tile >= m_sub:
        yout = _dot3(wth_ref[:, :], wtl_ref[:, :], e2)
    else:
        # The Toeplitz band is shift-invariant: every m_tile-row output tile
        # multiplies the SAME [m_tile, span] band block against its own span
        # of the extended input (wt[ti*m_tile + r, ti*m_tile*F + k] depends
        # only on (r, k)).  So stack the tile spans along the lane dimension
        # and run ONE wide MXU dot — at small channel counts this lifts lane
        # occupancy from 2C to ntiles*2C (C=16 WFM: 32 -> 256 lanes) and the
        # kernel only needs the compact band block in VMEM (83 kB vs the
        # 4.3 MB full Toeplitz at the factor-4 plan).
        span = d_rows + m_tile * factor
        ntiles = m_sub // m_tile
        spans = [e2[ti * m_tile * factor: ti * m_tile * factor + span, :]
                 for ti in range(ntiles)]
        estk = jnp.concatenate(spans, axis=1)  # [span, ntiles*2C]
        ystk = _dot3(wth_ref[:, :], wtl_ref[:, :], estk)
        yout = jnp.concatenate(
            [ystk[:, ti * 2 * c:(ti + 1) * 2 * c] for ti in range(ntiles)],
            axis=0)
    if y_tail:
        # WFM tm path: the composite is consumed downstream ONLY as each
        # block's trailing zoom window (display/S-meter) — emit just that
        # (early sub-blocks overwrite slot 0 of their block's window; the
        # covering sub-blocks land last in sequential grid order)
        y_ref[0, :, :] = yout
    else:
        y_ref[:, :] = yout
    if disc_gain:
        # FM discriminator on the composite while it is still in VMEM
        yprev = jnp.concatenate(
            [jnp.where(first, disc_in_ref[0:1, :], dlast_ref[0:1, :]),
             yout[:-1]], axis=0)
        dlast_ref[0:1, :] = yout[-1:, :]
        yr, yi = yout[:, :c], yout[:, c:]
        pr, pi = yprev[:, :c], yprev[:, c:]
        d_full = _atan2(yi * pr - yr * pi,
                        yr * pr + yi * pi) * disc_gain
        if comp_decim:
            # hq composite decimation IN VMEM (the separate XLA pass costs
            # a full HBM round-trip of the 2x-rate plane, ~0.07 ms/block
            # at 64ch): banded Toeplitz dot, split into the carried-history
            # rows and the current rows (Mosaic rejects the row concat)
            hist = jnp.where(first, chist_in_ref[:, :], chist_out_ref[:, :])
            hr = comp_hist_rows
            disc_ref[:, :] = (
                _dot3(cwh_ref[:, :hr], cwl_ref[:, :hr], hist)
                + _dot3(cwh_ref[:, hr:], cwl_ref[:, hr:], d_full))
            chist_out_ref[:, :] = d_full[-hr:, :]
        else:
            disc_ref[:, :] = d_full


def fold_plane(x_pk: jax.Array, fold: int) -> jax.Array:
    """[N, 2C] plane -> [N/fold, 2*fold*C] time-folded plane (device-side).

    Lane layout: [re(g0) re(g1) ... | im(g0) im(g1) ...]; lane group g holds
    contiguous time segment g.  On TPU a [N, 2C] f32 plane at C<=32 is
    physically tiled to 128 lanes — reading it costs the bandwidth of the
    padded width — so folding is the difference between touching 4-8x the
    logical bytes and touching them once.  Feeders should BUILD the folded
    layout host-side (fold_plane_np) and skip this relayout."""
    n, c2 = x_pk.shape
    c = c2 // 2
    xg = x_pk.reshape(fold, n // fold, c2)
    return jnp.concatenate([xg[g, :, :c] for g in range(fold)]
                           + [xg[g, :, c:] for g in range(fold)], axis=1)


def pick_fold(channels: int, k_blocks: int) -> int:
    """The time-fold factor the Receiver/feeders/bench all agree on: the
    largest power of two G with 2*C*G <= 128 (fill the tile lanes) that
    divides the dispatch's block count (whole logical blocks per group)."""
    fold = 1
    while 2 * channels * (fold * 2) <= 128 and k_blocks % (fold * 2) == 0:
        fold *= 2
    return fold


def fold_plane_np(plane: np.ndarray, fold: int) -> np.ndarray:
    """Host-side twin of fold_plane (numpy; what feeders/benches ship)."""
    n, c2 = plane.shape
    c = c2 // 2
    xg = plane.reshape(fold, n // fold, c2)
    return np.concatenate([xg[g, :, :c] for g in range(fold)]
                          + [xg[g, :, c:] for g in range(fold)], axis=1)


def _fold_prologue(x_f, dc, phase0, f_hi, f_lo, tail, fold,
                   dc_alpha, d_rows, extra_rows: int = 0,
                   in_scale: float = 0.0):
    """Closed-form group seams for the time-folded input layout.

    x_f: [seg, 2*fold*C] folded plane (lane group g = time segment g).
    Group g>0 needs (a) the DC-blocker estimate entering its first chunk —
    the chunked-EWMA closed form over ALL previous groups' chunk means (the
    sharded_dc_chunks formulation, parallel/time_shard.py) — and (b) the
    last d_rows post-mix samples of group g-1 as its composed-FIR history,
    reconstructed by DC-removing (with the exact per-chunk estimates the
    unfolded kernel would use) and NCO-mixing those boundary rows.  Group 0
    consumes the carried state unchanged, so folded == unfolded
    streaming-exactly (up to f32 association).

    Returns (dc_in [1, 2*fold*C], tail_in [d_rows, 2*fold*C], strip) where
    strip is the [d_rows + extra_rows, 2*fold*C] post-mix boundary history
    (tail_in = its last d_rows rows; extra_rows > 0 lets the caller reach
    further back, e.g. for the discriminator's previous-output seed at
    full-rate offset -factor).  Group 0's strip rows beyond the carried
    d_rows are ZERO (the carried state doesn't reach further back).
    """
    seg, c2e = x_f.shape
    gc = c2e // 2
    c = gc // fold
    ncg = seg // DC_CHUNK
    a_c = float(dc_alpha) ** DC_CHUNK
    # i16 entry: the mean reduces the int plane directly (i16 HBM reads);
    # scale lands on the tiny chunk-mean/boundary-row arrays only
    means = jnp.mean(x_f.reshape(ncg, DC_CHUNK, c2e).astype(jnp.float32),
                     axis=1)                                    # [ncg, 2GC]
    if in_scale:
        means = means * in_scale
    m_re = means[:, :gc].reshape(ncg, fold, c)                  # [j, g', c]
    m_im = means[:, gc:].reshape(ncg, fold, c)

    # --- DC seed entering each group: weighted sum over ALL prior chunks
    w = np.zeros((fold, fold, ncg), np.float64)                 # [g, g', j]
    seedc = np.zeros((fold,), np.float64)
    for g in range(fold):
        seedc[g] = a_c ** (g * ncg)
        for gp in range(g):
            expo = (g - 1 - gp) * ncg + (ncg - 1 - np.arange(ncg))
            w[g, gp, :] = (1.0 - a_c) * a_c ** expo
    with jax.ensure_compile_time_eval():
        w_d = jnp.asarray(w.astype(np.float32))
        seedc_d = jnp.asarray(seedc.astype(np.float32))
    dc_re, dc_im = dc[0, :c], dc[0, c:]
    seeds_re = (jnp.einsum("gpj,jpc->gc", w_d, m_re,
                           precision="highest")
                + seedc_d[:, None] * dc_re[None, :])            # [G, c]
    seeds_im = (jnp.einsum("gpj,jpc->gc", w_d, m_im,
                           precision="highest")
                + seedc_d[:, None] * dc_im[None, :])
    dc_in = jnp.concatenate([seeds_re.reshape(1, gc),
                             seeds_im.reshape(1, gc)], axis=1)

    # --- post-mix halo tails: group g's history = the DC-removed + mixed
    #     last (d_rows + extra_rows) rows of group g-1
    nrows = d_rows + extra_rows
    r0 = seg - nrows
    rows = jax.lax.slice(x_f, (r0, 0), (seg, c2e)).astype(jnp.float32)
    if in_scale:
        rows = rows * in_scale                                  # [nrows, 2GC]
    jlo = r0 // DC_CHUNK
    nj = ncg - jlo
    wj = np.zeros((nj, ncg), np.float64)
    for idx, j in enumerate(range(jlo, ncg)):
        wj[idx, :j + 1] = (1.0 - a_c) * a_c ** (j - np.arange(j + 1))
    with jax.ensure_compile_time_eval():
        wj_d = jnp.asarray(wj.astype(np.float32))
        sj_d = jnp.asarray(
            (a_c ** (1.0 + np.arange(jlo, ncg))).astype(np.float32))
    sel = jnp.asarray((np.arange(r0, seg) // DC_CHUNK) - jlo)   # [nrows]
    fhi_r = jnp.asarray(f_hi, jnp.float32)[None, :]
    flo_r = jnp.asarray(f_lo, jnp.float32)[None, :]
    pad0 = jnp.zeros((extra_rows, c), jnp.float32)
    strips_re = [jnp.concatenate([pad0, tail[:, :c]], axis=0)]  # group 0
    strips_im = [jnp.concatenate([pad0, tail[:, c:]], axis=0)]
    for g in range(1, fold):
        gp = g - 1
        # per-chunk DC estimates of group g-1's trailing chunks
        m_j = (jnp.einsum("ij,jc->ic", wj_d, m_re[:, gp, :],
                          precision="highest")
               + sj_d[:, None] * seeds_re[gp][None, :])         # [nj, c]
        m_j_im = (jnp.einsum("ij,jc->ic", wj_d, m_im[:, gp, :],
                             precision="highest")
                  + sj_d[:, None] * seeds_im[gp][None, :])
        zr = rows[:, gp * c:(gp + 1) * c] - m_j[sel]
        zi = rows[:, gc + gp * c:gc + (gp + 1) * c] - m_j_im[sel]
        # NCO mix at the global sample index (same split-precision ramp
        # arithmetic as the kernel's coarse/fine factorization)
        k = jnp.asarray(np.arange(gp * seg + r0, gp * seg + seg,
                                  dtype=np.float32))[:, None]
        ph = jnp.mod(phase0[None, :] + jnp.mod(k * fhi_r, 1.0)
                     + k * flo_r, 1.0)
        cosv = jnp.cos(TWO_PI * ph)
        sinv = jnp.sin(TWO_PI * ph)
        strips_re.append(zr * cosv + zi * sinv)
        strips_im.append(zi * cosv - zr * sinv)
    strip = jnp.concatenate(strips_re + strips_im, axis=1)
    return dc_in, strip[extra_rows:], strip


def fused_front_packed(x_pk: jax.Array, dc: jax.Array, phase0: jax.Array,
                       f_hi: jax.Array, f_lo: jax.Array,
                       tail: jax.Array, wt: jax.Array,
                       factor: int, d_rows: int, dc_alpha: float,
                       sub_block: int = 2048, n_block: int = 0,
                       raw_rows: int = 0, fold: int = 1,
                       disc_gain: float = 0.0,
                       h_np: np.ndarray | None = None,
                       disc_last: jax.Array | None = None,
                       comp_taps: np.ndarray | None = None,
                       comp_hist: jax.Array | None = None,
                       y_tail_rows: int = 0,
                       iq_gain: jax.Array | None = None,
                       iq_phase: jax.Array | None = None,
                       nb: tuple | None = None,
                       nb_avg: jax.Array | None = None,
                       nb_tail: jax.Array | None = None,
                       interpret: bool = False):
    """Whole front end in one pallas_call, lane-packed layout.

    x_pk: [N, 2C] f32 packed plane (re lanes, then im lanes) — N may span
    many logical blocks (n_block rows each; defaults to N).
    dc: [1, 2C] DC estimate.  phase0/f_hi/f_lo: [C] (unpacked; packed here).
    tail: [d_rows, 2C] post-mix history; d_rows = composed delay D padded so
    that d_rows + sub_block stays 8-aligned.
    wt: [sub/factor, d_rows + sub_block] from build_composed_w().T.

    fold > 1 enables the virtual-channel TIME-FOLD for small channel counts:
    x_pk must then be the FOLDED plane [N/fold, 2*fold*C] (fold_plane /
    fold_plane_np layout: lane group g = contiguous time segment g).  On the
    TPU's (8, 128) tiling a narrow [N, 2C] plane at C<=32 physically pads
    its minor dim to 128 lanes, so every pass over it moves 128/2C times the
    logical bytes; the folded plane is dense, and the kernel's tiles are
    [*, 2*fold*C] wide with all lanes live.  Group seams are closed-form
    (_fold_prologue); results match fold=1 streaming-exactly (up to f32
    association).  Requires (N/fold) % n_block == 0 (whole logical blocks
    per group).

    disc_gain != 0 additionally emits the FM discriminator of the decimated
    composite (the WFM demod's first stage, computed while the composite is
    in VMEM): a [N/(fold*factor), fold*C] time-major real plane appended to
    the return tuple, plus the carried previous-composite sample.  The
    previous decimated output sits at full-rate offset -factor, which can
    predate the carried d_rows tail, so it is explicit state: `disc_last`
    [1, 2C] (the WFM demod's state.last, repacked) seeds group 0; groups
    g>0 derive their seed from the prologue's extended post-mix strip with
    one dot against h_np (the composed response).

    iq_gain/iq_phase (scalars) enable the static IQ-balance lane mix after
    the DC blocker (iqbalance.cpp:65-75) — runtime params, no recompile.

    nb = (threshold, blank_width, alpha, mode) enables the in-kernel noise
    blanker (mode 'blank'|'average'; exact twin of
    scanops.noise_blanker_chunked — POWER-domain RMS detection), with
    carried state nb_avg [1, 2C] (the |x|^2 EWMA) and nb_tail [16, 2C]
    (trailing spike flags; 16 rows = the bf16 dilation tile height).  NB
    requires fold == 1 (its nonlinear state has no closed-form group seams).

    Returns (y_pk, dc', tail', phase' [C], raw [K, raw_rows, 2C]
    [, nb_avg', nb_tail'] [, disc, disc_last']) with K = N/n_block;
    dc'/tail'/raw/disc_last' are always in the UNFOLDED [*, 2C] layout.
    y_pk is [N/factor, 2C] for fold=1, else [N/(fold*factor), 2*fold*C] in
    the folded layout — decode with unpack_to_complex(y_pk, fold=fold).
    """
    seg, c2e = x_pk.shape
    ce = c2e // 2                      # packed half-width seen by the kernel
    c = ce // fold                     # logical channel count
    c2 = 2 * c
    n = seg * fold                     # logical sample count
    # i16 entry planes (native ADC container): dequantized in-kernel so the
    # input DMA moves half the bytes; full-scale int16 == 1.0
    in_scale = (1.0 / 32768.0
                if jnp.issubdtype(x_pk.dtype, jnp.integer) else 0.0)
    assert seg % sub_block == 0 and sub_block % DC_CHUNK == 0
    if not n_block:
        n_block = seg
    assert seg % n_block == 0 and n_block % sub_block == 0
    k_blocks_g = seg // n_block        # logical blocks per group
    nsub_blk = n_block // sub_block
    nsub = seg // sub_block            # grid length (per-group sub-blocks)
    m_sub = sub_block // factor
    nchunk = sub_block // DC_CHUNK
    a_c = float(dc_alpha) ** DC_CHUNK
    raw_rows = min(raw_rows, sub_block) or 8

    # packed parameter vectors + grid-invariant fine-phasor tables (the
    # oscillator's inner 128-sample period; XLA hoists these out of scans).
    # With fold > 1 each group's phase lane is offset by its global start
    # sample (same split-precision ramp arithmetic as the kernel).
    if fold > 1:
        ph_half = jnp.concatenate([
            jnp.mod(phase0 + jnp.mod(np.float32(g * seg) * f_hi, 1.0)
                    + np.float32(g * seg) * f_lo, 1.0)
            for g in range(fold)])
        fhi_half = jnp.tile(jnp.asarray(f_hi, jnp.float32), fold)
        flo_half = jnp.tile(jnp.asarray(f_lo, jnp.float32), fold)
        dc_in, tail_in, strip = _fold_prologue(
            x_pk, dc, phase0, f_hi, f_lo, tail, fold, dc_alpha, d_rows,
            extra_rows=factor if disc_gain else 0, in_scale=in_scale)
    else:
        ph_half = jnp.asarray(phase0, jnp.float32)
        fhi_half = jnp.asarray(f_hi, jnp.float32)
        flo_half = jnp.asarray(f_lo, jnp.float32)
        dc_in, tail_in = dc, tail
    fhi2 = jnp.concatenate([fhi_half, fhi_half]).astype(jnp.float32)
    flo2 = jnp.concatenate([flo_half, flo_half]).astype(jnp.float32)
    ph2 = jnp.concatenate([ph_half, ph_half]).astype(jnp.float32)
    r_idx = jnp.arange(128, dtype=jnp.float32)[:, None]
    fine = jnp.mod(jnp.mod(r_idx * fhi2[None, :], 1.0)
                   + r_idx * flo2[None, :], 1.0)
    fr = jnp.cos(TWO_PI * fine)               # [128, 2ce] = [fr | fr]
    fi = jnp.sin(TWO_PI * fine)
    sign = jnp.concatenate([jnp.ones((ce,), jnp.float32),
                            -jnp.ones((ce,), jnp.float32)])[None, :]
    fi2_t = fi * sign                          # [fi | -fi]
    fr2_t = fr * sign                          # [fr | -fr]

    # output-row tile: >= 64 rows for MXU shape, and no smaller than the
    # band's own reach (d_rows/factor rows share any input row); a single
    # dense dot when m_sub is already small (the factor-32 AM plan).
    # Narrow (sub-tile-width) planes also take the dense dot: the tiled
    # path's lane-concat of spans trips Mosaic ("result/input offset
    # mismatch") below the full 128-lane width
    m_tile = m_sub
    if m_sub > 64 and m_sub % 64 == 0 and c2e >= 128:
        m_tile = 64
        while m_tile * factor < d_rows and m_tile < m_sub:
            m_tile *= 2

    # tiled path ships only the shared band block (shift-invariant Toeplitz)
    if m_tile < m_sub:
        span = d_rows + m_tile * factor
        wt = jax.lax.slice(wt, (0, 0), (m_tile, span))
        wt_rows, wt_cols = m_tile, span
    else:
        wt_rows, wt_cols = m_sub, d_rows + sub_block

    iqbal = iq_gain is not None
    nb_mode = 0
    if nb is not None:
        assert fold == 1, "in-kernel noise blanker requires fold == 1"
        nb_thr, nb_bw, nb_alpha, nb_mode_s = nb
        nb_mode = 1 if nb_mode_s == "blank" else 2
        nb_a_c = float((1.0 - nb_alpha) ** DC_CHUNK)
    else:
        nb_thr, nb_bw, nb_a_c = 0.0, 0, 0.0
    comp_decim = 0
    comp_hist_rows = 0
    if comp_taps is not None:
        assert disc_gain and fold == 1, \
            "in-kernel composite decimation needs disc_gain and fold == 1"
        assert comp_hist is not None
        comp_decim = 2
        tc = len(comp_taps)
        comp_hist_rows = ((tc - 1 + 7) // 8) * 8
        assert comp_hist.shape == (comp_hist_rows, ce)
    if y_tail_rows:
        # WFM tm path only: downstream consumes just the zoom windows.
        # Works folded too — logical-block row ranges align across lane
        # groups, so the same per-step window mapping applies
        assert disc_gain, "y-tail emission is the WFM tm path only"
        assert y_tail_rows % m_sub == 0 and y_tail_rows <= n_block // factor
    kern = functools.partial(_front_kernel, sub_block, ce, d_rows, a_c,
                             nchunk, nsub_blk, raw_rows, factor, m_tile,
                             float(disc_gain), interpret,
                             iqbal, nb_mode, float(nb_thr), int(nb_bw),
                             nb_a_c, in_scale, comp_decim, comp_hist_rows,
                             int(y_tail_rows))
    in_specs = [
        pl.BlockSpec((sub_block, c2e), lambda s: (s, 0)),
        pl.BlockSpec((1, c2e), lambda s: (0, 0)),
        pl.BlockSpec((1, c2e), lambda s: (0, 0)),
        pl.BlockSpec((1, c2e), lambda s: (0, 0)),
        pl.BlockSpec((128, c2e), lambda s: (0, 0)),
        pl.BlockSpec((128, c2e), lambda s: (0, 0)),
        pl.BlockSpec((128, c2e), lambda s: (0, 0)),
        pl.BlockSpec((128, c2e), lambda s: (0, 0)),
        pl.BlockSpec((wt_rows, wt_cols), lambda s: (0, 0)),
        pl.BlockSpec((wt_rows, wt_cols), lambda s: (0, 0)),
        pl.BlockSpec((1, c2e), lambda s: (0, 0)),
        pl.BlockSpec((d_rows, c2e), lambda s: (0, 0)),
    ]
    if y_tail_rows:
        nz_sub = y_tail_rows // m_sub
        y_shape = jax.ShapeDtypeStruct((k_blocks_g, y_tail_rows, c2e),
                                       jnp.float32)
        y_spec = pl.BlockSpec(
            (1, m_sub, c2e),
            lambda s, _n=nsub_blk, _z=nz_sub: (
                s // _n, jnp.maximum(s % _n - (_n - _z), 0), 0))
    else:
        y_shape = jax.ShapeDtypeStruct((nsub * m_sub, c2e), jnp.float32)
        y_spec = pl.BlockSpec((m_sub, c2e), lambda s: (s, 0))
    out_shapes = [
        y_shape,
        jax.ShapeDtypeStruct((1, c2e), jnp.float32),
        jax.ShapeDtypeStruct((d_rows, c2e), jnp.float32),
        jax.ShapeDtypeStruct((k_blocks_g, raw_rows, c2e), jnp.float32),
    ]
    out_specs = [
        y_spec,
        pl.BlockSpec((1, c2e), lambda s: (0, 0)),
        pl.BlockSpec((d_rows, c2e), lambda s: (0, 0)),
        pl.BlockSpec((1, raw_rows, c2e), lambda s, _n=nsub_blk: (s // _n, 0, 0)),
    ]
    wt_hi, wt_lo = _split_bf16(wt)
    args = [x_pk, ph2[None, :], fhi2[None, :], flo2[None, :],
            fr, fi, fi2_t, fr2_t, wt_hi, wt_lo, dc_in, tail_in]
    if iqbal:
        g = jnp.asarray(iq_gain, jnp.float32)
        p_ = jnp.asarray(iq_phase, jnp.float32)
        ones = jnp.ones((ce,), jnp.float32)
        s1 = jnp.concatenate([g * ones, ones])[None, :]
        s2 = jnp.concatenate([0.0 * ones, p_ * ones])[None, :]
        args += [s1, s2]
        in_specs += [pl.BlockSpec((1, c2e), lambda s: (0, 0)),
                     pl.BlockSpec((1, c2e), lambda s: (0, 0))]
    if nb_mode:
        assert nb_avg is not None and nb_tail is not None
        t_rows = nb_tail.shape[0]
        args += [nb_avg, nb_tail]
        in_specs += [pl.BlockSpec((1, c2e), lambda s: (0, 0)),
                     pl.BlockSpec((t_rows, c2e), lambda s: (0, 0))]
        out_shapes += [jax.ShapeDtypeStruct((1, c2e), jnp.float32),
                       jax.ShapeDtypeStruct((t_rows, c2e), jnp.float32)]
        out_specs += [pl.BlockSpec((1, c2e), lambda s: (0, 0)),
                      pl.BlockSpec((t_rows, c2e), lambda s: (0, 0))]
    if disc_gain:
        assert disc_last is not None
        if fold > 1:
            # groups g>0: previous composite output = composed-FIR dot of h
            # against the extended post-mix strip at full-rate offset
            # -factor (the sample the unfolded stream produced just before
            # each group's first output); group 0 = the carried disc_last
            assert h_np is not None
            d = len(h_np) - 1
            ll = d_rows + factor
            w = np.zeros((1, ll), np.float64)
            w[0, ll - factor - np.arange(d + 1)] = np.asarray(h_np,
                                                             np.float64)
            with jax.ensure_compile_time_eval():
                w_d = jnp.asarray(w.astype(np.float32))
            sfull = w_d @ strip                         # [1, 2ce]
            disc_in = jnp.concatenate(
                [disc_last[:, :c], sfull[:, c:ce],
                 disc_last[:, c:], sfull[:, ce + c:]], axis=1)
        else:
            disc_in = disc_last
        args.append(disc_in)                            # [1, 2ce]
        in_specs.append(pl.BlockSpec((1, c2e), lambda s: (0, 0)))
        if comp_decim:
            # banded comp-decim operator, zero-padded on top so the carried
            # history block is 8-row aligned (the leading pad rows have
            # zero weight and never influence outputs)
            from pebblesdr_tpu.ops.fir import banded_fir_matrix as _bfm

            wc0 = np.asarray(_bfm(np.asarray(comp_taps, np.float32),
                                  m_sub, comp_decim))
            pad = comp_hist_rows - (len(comp_taps) - 1)
            wc = np.zeros((m_sub + comp_hist_rows, m_sub // comp_decim),
                          np.float32)
            wc[pad:, :] = wc0
            with jax.ensure_compile_time_eval():
                wc_hi, wc_lo = _split_bf16(jnp.asarray(
                    np.ascontiguousarray(wc.T)))
            args += [wc_hi, wc_lo, comp_hist]
            wcr, wcc = m_sub // comp_decim, m_sub + comp_hist_rows
            in_specs += [pl.BlockSpec((wcr, wcc), lambda s: (0, 0)),
                         pl.BlockSpec((wcr, wcc), lambda s: (0, 0)),
                         pl.BlockSpec((comp_hist_rows, ce),
                                      lambda s: (0, 0))]
            out_shapes.append(jax.ShapeDtypeStruct(
                (nsub * m_sub // comp_decim, ce), jnp.float32))
            out_specs.append(pl.BlockSpec((m_sub // comp_decim, ce),
                                          lambda s: (s, 0)))
        else:
            out_shapes.append(
                jax.ShapeDtypeStruct((nsub * m_sub, ce), jnp.float32))
            out_specs.append(pl.BlockSpec((m_sub, ce), lambda s: (s, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((1, c2e), jnp.float32))
        out_specs.append(pl.BlockSpec((1, c2e), lambda s: (0, 0)))
        if comp_decim:
            out_shapes.append(jax.ShapeDtypeStruct((comp_hist_rows, ce),
                                                   jnp.float32))
            out_specs.append(pl.BlockSpec((comp_hist_rows, ce),
                                          lambda s: (0, 0)))
    # raise the Mosaic scoped-VMEM limit above the 16 MB default: v5e has
    # 128 MB VMEM, and larger sub_blocks (fewer grid steps — the dominant
    # per-step fixed cost at ~3 us/step) need headroom for the pipeline's
    # double buffers + straight-line temporaries
    outs = pl.pallas_call(
        kern, grid=(nsub,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(*args)
    outs = list(outs)
    y, dc2, tail2, raw = outs[:4]
    opos = 4
    if nb_mode:
        nb_avg2, nb_tail2 = outs[opos:opos + 2]
        opos += 2
    if disc_gain:
        disc, dlast = outs[opos:opos + 2]
        chist2 = outs[opos + 2] if comp_decim else None
    phase2 = jnp.mod(phase0 + jnp.mod(n * f_hi, 1.0) + n * f_lo, 1.0)
    if fold > 1:
        # carried dc/tail = the LAST group's lanes; raw unfolds to the
        # global [K, raw_rows, 2C] block order
        gl = (fold - 1) * c
        dc2 = jnp.concatenate([dc2[:, gl:gl + c], dc2[:, ce + gl:ce + gl + c]],
                              axis=1)
        tail2 = jnp.concatenate([tail2[:, gl:gl + c],
                                 tail2[:, ce + gl:ce + gl + c]], axis=1)
        r5 = raw.reshape(k_blocks_g, raw_rows, 2, fold, c)
        raw = jnp.transpose(r5, (3, 0, 1, 2, 4)).reshape(
            fold * k_blocks_g, raw_rows, c2)
    ret = [y, dc2, tail2, phase2, raw]
    if nb_mode:
        ret += [nb_avg2, nb_tail2]
    if disc_gain:
        if fold > 1:
            gl = (fold - 1) * c
            dlast = jnp.concatenate(
                [dlast[:, gl:gl + c], dlast[:, ce + gl:ce + gl + c]], axis=1)
        ret += [disc, dlast]
        if comp_decim:
            ret.append(chist2)
    return tuple(ret)


def pack_planes(xr_t: jax.Array, xi_t: jax.Array) -> jax.Array:
    """[N, C] re/im planes -> [N, 2C] packed (one copy; feeders should build
    the packed layout directly and skip this)."""
    return jnp.concatenate([xr_t, xi_t], axis=-1)


def unpack_to_complex(y_pk: jax.Array, fold: int = 1) -> jax.Array:
    """[M, 2C] packed -> [C, M] complex64.  With fold > 1, y_pk is the
    folded [M/fold, 2*fold*C] layout from fused_front_packed(fold=...):
    lane group g holds time segment g, so the unfold transposes groups back
    into one contiguous [C, M] stream."""
    if fold == 1:
        c = y_pk.shape[-1] // 2
        return jax.lax.complex(y_pk[:, :c].T, y_pk[:, c:].T)
    m, c2e = y_pk.shape
    c = c2e // (2 * fold)
    re = jnp.transpose(y_pk[:, :fold * c].reshape(m, fold, c), (2, 1, 0))
    im = jnp.transpose(y_pk[:, fold * c:].reshape(m, fold, c), (2, 1, 0))
    return jax.lax.complex(re.reshape(c, fold * m), im.reshape(c, fold * m))


# ----------------------------------------------------- fused WFM stereo tail

def _wfm_tail_kernel(sub_block, c, d_rows, l_chunk, m_tile, factor,
                     interpret,
                     raw_ref, p0_ref, wf_ref, wth_ref, wtl_ref, tail_in_ref,
                     y_ref, tail_out_ref):
    """One grid step of the fused WFM stereo tail: demux + decimating LP.

    raw_ref: [sub, C] f32 composite FM (discriminator output).
    p0/wf: [sub/l_chunk, C] per-chunk pilot phase-ramp params
    (phase = p0 + wf*t within the chunk, from pll.pilot_open_core).
    tail refs: [d_rows, 2C] packed [mono | lmr] input history.
    wt_ref: [m_tile, d_rows + m_tile*factor] shared Toeplitz band block.
    y_ref: [sub/factor, 2C] packed [mono_a | lmr_a] decimated audio.
    """
    s = pl.program_id(0)
    first = s == 0
    raw = raw_ref[:, :]                           # [sub, C]

    # ---- stereo demux: lmr = raw * 2*sin(2*phase), phase linear per chunk
    nch = sub_block // l_chunk
    t_in = jax.lax.broadcasted_iota(
        jnp.int32, (nch, l_chunk, c), 1).astype(jnp.float32)
    p0 = p0_ref[:, :]
    wf = wf_ref[:, :]
    ph2 = 2.0 * (p0[:, None, :] + wf[:, None, :] * t_in)
    s2 = jnp.sin(ph2).reshape(sub_block, c)
    lmr = raw * (2.0 * s2)
    apl = jnp.concatenate([raw, lmr], axis=1)     # [sub, 2C] packed plane

    # ---- decimating audio LP: shared-band Toeplitz dot (same structure as
    # the front kernel's composed-FIR stage, incl. the lane-stacked tiling)
    tl = jnp.where(first, tail_in_ref[:, :], tail_out_ref[:, :])
    e2 = jnp.concatenate([tl, apl], axis=0)       # [d_rows + sub, 2C]
    tail_out_ref[:, :] = e2[-d_rows:, :]
    m_sub = sub_block // factor
    if m_tile >= m_sub:
        y_ref[:, :] = _dot3(wth_ref[:, :], wtl_ref[:, :], e2)
    else:
        span = d_rows + m_tile * factor
        ntiles = m_sub // m_tile
        spans = [e2[ti * m_tile * factor: ti * m_tile * factor + span, :]
                 for ti in range(ntiles)]
        estk = jnp.concatenate(spans, axis=1)     # [span, ntiles*2C]
        ystk = _dot3(wth_ref[:, :], wtl_ref[:, :], estk)
        for ti in range(ntiles):
            y_ref[ti * m_tile:(ti + 1) * m_tile, :] = (
                ystk[:, ti * 2 * c:(ti + 1) * 2 * c])


def wfm_tail_packed(raw_t: jax.Array, p0_t: jax.Array, wf_t: jax.Array,
                    tail: jax.Array, wt: jax.Array, factor: int,
                    d_rows: int, l_chunk: int, sub_block: int = 2048,
                    interpret: bool = False):
    """Fused WFM stereo demux + decimating audio LP, time-major.

    raw_t: [N, C] f32 composite FM stream (time-major).  At small channel
    counts callers pass the TIME-FOLDED layout instead — [N/G, G*C] with
    lane group g = time segment g (dense on the TPU (8, 128) tiling) — plus
    correspondingly folded p0/wf and a [d_rows, 2*G*C] tail whose per-group
    histories the caller seeds (wfm.wfm_demod builds the group halos
    closed-form).  The kernel is layout-oblivious: c below is simply the
    lane half-width.
    p0_t/wf_t: [N/l_chunk, C] pilot chunk params (time-major).
    tail: [d_rows, 2C] packed [mono | lmr] history; wt from
    build_composed_w(audio_taps, factor, sub_block, pad).T.

    Returns (audio_pk [N/factor, 2C] = [mono_a | lmr_a], tail').

    Replaces the XLA demux-multiply + windowed banded-matmul LP (which cost
    ~0.05 ms/block at 64ch: the window-copy relayout dominated); the kernel
    reads the composite exactly once and keeps the band block in VMEM.
    """
    n, c = raw_t.shape
    assert n % sub_block == 0 and sub_block % l_chunk == 0
    nsub = n // sub_block
    m_sub = sub_block // factor
    nch = sub_block // l_chunk

    m_tile = m_sub
    if m_sub > 64 and m_sub % 64 == 0:
        m_tile = 64
        while m_tile * factor < d_rows and m_tile < m_sub:
            m_tile *= 2
    if m_tile < m_sub:
        span = d_rows + m_tile * factor
        wt = jax.lax.slice(wt, (0, 0), (m_tile, span))
        wt_rows, wt_cols = m_tile, span
    else:
        wt_rows, wt_cols = m_sub, d_rows + sub_block

    kern = functools.partial(_wfm_tail_kernel, sub_block, c, d_rows, l_chunk,
                             m_tile, factor, interpret)
    in_specs = [
        pl.BlockSpec((sub_block, c), lambda s: (s, 0)),
        pl.BlockSpec((nch, c), lambda s: (s, 0)),
        pl.BlockSpec((nch, c), lambda s: (s, 0)),
        pl.BlockSpec((wt_rows, wt_cols), lambda s: (0, 0)),
        pl.BlockSpec((wt_rows, wt_cols), lambda s: (0, 0)),
        pl.BlockSpec((d_rows, 2 * c), lambda s: (0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nsub * m_sub, 2 * c), jnp.float32),
        jax.ShapeDtypeStruct((d_rows, 2 * c), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((m_sub, 2 * c), lambda s: (s, 0)),
        pl.BlockSpec((d_rows, 2 * c), lambda s: (0, 0)),
    ]
    wt_hi, wt_lo = _split_bf16(wt)
    y, tail2 = pl.pallas_call(
        kern, grid=(nsub,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(raw_t, p0_t, wf_t, wt_hi, wt_lo, tail)
    return y, tail2
