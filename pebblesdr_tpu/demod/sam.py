"""SAM (synchronous AM) demodulator: PLL carrier recovery + sideband mix.

Capability parity with Demod_SAM (application/demod/demod_sam.cpp:5-112):
PLL (BW 100 Hz, zeta .707, +-1 kHz range) locks to the carrier; the signal is
coherently mixed to baseband; DC removed; a 0..band Hz analytic (Hilbert)
filter splits hi/lo sidebands; output L=lo+hi / R=hi-lo (we emit the mono sum,
with the stereo-ish pair available).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.core.block import pytree_dataclass, static_field
from pebblesdr_tpu.ops import fir, iir, pll


@pytree_dataclass
class SAMConfig:
    sample_rate: float = static_field()
    pll: pll.PLLConfig = static_field()
    hilbert_taps: np.ndarray = static_field()
    algorithm: str = static_field(default="aimed")  # 'aimed' (two-stage
    #                               blockwise carrier loop, vectorizes) |
    #                               'scan' (per-sample loop, the reference's
    #                               exact recurrence, demod_sam.cpp:5-112)
    pll_chunk: int = static_field(default=8)   # blockwise loop stability
    #                               needs alpha*chunk << 1: the SAM loop is
    #                               100 Hz BW at ~32 ksps, so chunk 8 keeps
    #                               the rescaled gain at 0.22 (chunk 64 put
    #                               it at 1.8 — divergent)
    # stage-2 smoother for 'aimed': "open" (default) = the scan-free
    # open-loop tracker (pll.costas_open_run square=False — the aimed
    # residual is a strong near-DC carrier, and symmetric AM perturbs the
    # chunk phasors' magnitude only, so the estimate is unbiased); "loop" =
    # the chunked type-2 loop scan (the round-2 form)
    smooth: str = static_field(default="open")
    open_track: pll.CostasOpenConfig = static_field(default=None)
    # sideband split convention: "analytic" (default) = one complex
    # analytic (Hilbert) bandpass on the coherent baseband — ~60+ dB image
    # rejection (documented deviation); "rails" = the reference's EXACT
    # phasing method (CFir::ProcessFilter filters the re rail with the
    # in-phase BP and the im rail with the quadrature BP independently,
    # fir.cpp ProcessFilter CPX overload; 40 dB CuteSDR Kaiser design,
    # demod_sam.cpp InitLPFilter(0,1,40,4500,5500)+GenerateHBFilter(5000)).
    # "rails" exists for bit-faithful parity vs the compiled reference
    # (tools/refharness) and measures ~70+ dB against it.
    sideband: str = static_field(default="analytic")
    rail_taps_i: np.ndarray = static_field(default=None)
    rail_taps_q: np.ndarray = static_field(default=None)

    @staticmethod
    def make(sample_rate: float, bandwidth: float = 10000.0,
             algorithm: str = "aimed",
             smooth: str = "open",
             sideband: str = "analytic") -> "SAMConfig":
        cfg = pll.make_pll_config(sample_rate, bw_hz=100.0, zeta=0.707,
                                  range_hz=1000.0, detector="atan2")
        # analytic filter 0..bandwidth/2 (demod_sam.cpp GenerateHBFilter(5000));
        # unit passband gain (design_hilbert's 2x is the analytic-signal
        # convention; the sideband split wants hi = upper sideband as-is)
        taps = 0.5 * fir.design_hilbert(61, bandwidth / 4.0, bandwidth / 2.0,
                                        sample_rate)
        # reference-exact rail pair: CuteSDR Kaiser LP 40 dB / 4500 / 5500,
        # shifted +5000 Hz (demod_sam.cpp ctor), applied per-rail
        h = fir.design_cfir_kaiser_lp(40.0, 4500.0, 5500.0, sample_rate)
        hbi, hbq = fir.design_rail_pair(h, 5000.0, sample_rate)
        return SAMConfig(sample_rate=sample_rate, pll=cfg, hilbert_taps=taps,
                         algorithm=algorithm, smooth=smooth,
                         open_track=pll.make_costas_open_config(
                             sample_rate, range_hz=200.0, bw_hz=50.0,
                             chunk=64, square=False),
                         sideband=sideband,
                         rail_taps_i=hbi.astype(np.float32),
                         rail_taps_q=hbq.astype(np.float32))


@pytree_dataclass
class SAMState:
    pll: pll.PLLState
    track: pll.CostasOpenState   # 'aimed'+'open' stage-2 smoother state
    dc: jax.Array      # mono (L) DC blocker state
    dc_r: jax.Array    # sideband-mix (R) DC blocker state
    hilbert_tail: jax.Array
    align: jax.Array   # [C, (T-1)//2] delay aligning base with the Hilbert
    #                    filter's group delay
    aim: jax.Array     # [C] carried aim-ramp phase ('aimed' algorithm)


def sam_init(cfg: SAMConfig, channels: int) -> SAMState:
    if cfg.sideband == "rails":
        t = len(cfg.rail_taps_i)
        return SAMState(
            pll=pll.pll_init(cfg.pll, channels),
            track=pll.costas_open_init(channels),
            dc=jnp.zeros((channels,), jnp.float32),
            dc_r=jnp.zeros((channels,), jnp.float32),
            hilbert_tail=jnp.zeros((2 * channels, t - 1), jnp.float32),
            align=jnp.zeros((channels, 0), jnp.complex64),
            aim=jnp.zeros((channels,), jnp.float32),
        )
    return SAMState(
        pll=pll.pll_init(cfg.pll, channels),
        track=pll.costas_open_init(channels),
        dc=jnp.zeros((channels,), jnp.float32),
        dc_r=jnp.zeros((channels,), jnp.float32),
        hilbert_tail=fir.fir_tail_init(channels, len(cfg.hilbert_taps)),
        align=jnp.zeros((channels, (len(cfg.hilbert_taps) - 1) // 2),
                        jnp.complex64),
        aim=jnp.zeros((channels,), jnp.float32),
    )


def sam_demod(cfg: SAMConfig, state: SAMState, x: jax.Array,
              n_block: int = 0):
    """x: [C, N] complex64 -> (state', audio [C, N] float32 mono)."""
    state2, mono, _l, _r = sam_demod_stereo(cfg, state, x, n_block=n_block)
    return state2, mono


def sam_demod_stereo(cfg: SAMConfig, state: SAMState, x: jax.Array,
                     n_block: int = 0):
    """Full SAM with the reference's sideband mix (demod_sam.cpp:5-112):
    after PLL carrier recovery, the analytic (Hilbert) filter isolates the
    upper sideband; L = lo+hi (== the coherent mono), R = hi-lo — the
    'mono-aural mix' that lets the ear separate the sidebands.

    algorithm='aimed' (default): two-stage blockwise carrier loop (conj-
    product frequency aim + chunked residual loop) — vectorizes, supports
    n_block concatenated logical blocks in one call (batched step_many).
    algorithm='scan': the reference's per-sample PLL recurrence.

    Returns (state', mono, left, right), each [C, N] float32.
    """
    aim = state.aim
    nb_len = n_block or x.shape[-1]
    pll_state, track_state = state.pll, state.track
    if cfg.algorithm == "aimed" and nb_len % 128 == 0:
        if cfg.smooth == "open":
            track_state, aim, phases, _ = pll.pll_run_aimed(
                cfg.pll, state.track, state.aim, x, n_block=n_block,
                smooth_cfg=cfg.open_track)
        else:
            pll_state, aim, phases, _ = pll.pll_run_aimed(
                cfg.pll, state.pll, state.aim, x, chunk=cfg.pll_chunk,
                n_block=n_block)
    else:  # 'scan', or a block too short for the multi-resolution aim
        pll_state, phases, _ = pll.pll_run(cfg.pll, state.pll, x)
    base = x * jnp.exp(-1j * phases.astype(jnp.complex64))
    if cfg.sideband == "rails":
        # Reference-exact phasing method (demod_sam.cpp:83-112 +
        # CFir::ProcessFilter CPX overload): DC-remove the coherent rails
        # (DC_ALPHA 0.9999), then filter re with the in-phase BP and im
        # with the quadrature BP INDEPENDENTLY; L = re+im, R = re-im,
        # mono = (L+R)/2 = filtered re rail.
        c = x.shape[0]
        rails = jnp.concatenate([base.real, base.imag], axis=0)
        dc2, rails = iir.dc_removal_apply(
            jnp.concatenate([state.dc, state.dc_r], axis=0), rails,
            alpha=0.9999)
        y_i, y_q, tail = fir.fir_apply_real_signal_pair(
            rails, state.hilbert_tail,
            np.asarray(cfg.rail_taps_i), np.asarray(cfg.rail_taps_q))
        re_f = y_i[:c]
        im_f = y_q[c:]
        left = re_f + im_f
        right = re_f - im_f
        mono = re_f
        return (SAMState(pll=pll_state, track=track_state,
                         dc=dc2[:c], dc_r=dc2[c:], hilbert_tail=tail,
                         align=state.align, aim=aim),
                mono, left, right)
    taps_c = jnp.asarray(cfg.hilbert_taps, jnp.complex64)
    hi, tail = fir.fir_apply_complex(base, taps_c, state.hilbert_tail,
                                     taps_np=cfg.hilbert_taps)
    # align base with hi: the linear-phase Hilbert FIR delays by (T-1)/2
    n = base.shape[-1]
    full = jnp.concatenate([state.align, base], axis=-1)
    base_d = full[:, :n]
    new_align = full[:, n:]
    mono_raw = base_d.real                    # lo + hi
    hi_minus_lo = (2.0 * hi - base_d).real    # hi - lo (still carries carrier)
    # one stacked DC pass for both outputs (the wfm deemph pattern)
    c = mono_raw.shape[0]
    dc2, both = iir.dc_removal_apply(
        jnp.concatenate([state.dc, state.dc_r], axis=0),
        jnp.concatenate([mono_raw, hi_minus_lo], axis=0), alpha=0.999)
    dc, dc_r = dc2[:c], dc2[c:]
    mono, right = both[:c], both[c:]
    left = mono
    return (SAMState(pll=pll_state, track=track_state, dc=dc, dc_r=dc_r,
                     hilbert_tail=tail, align=new_align, aim=aim),
            mono, left, right)
