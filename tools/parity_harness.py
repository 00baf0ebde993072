#!/usr/bin/env python
"""Whole-chain parity harness: recorded IQ -> chain -> compare vs an
INDEPENDENT scipy implementation of the same receive math.

BASELINE.json requires demodulated-output parity "within the reference SNR
bound" on recorded IQ.  The C++ reference itself cannot run here (Qt/macOS
build), so the golden is an independent float64 scipy implementation of the
identical signal path (windowed-sinc/remez designs, scipy.signal filtering,
numpy demod math) — a genuinely separate code path from the JAX chain, so
agreement validates both.

Usage:
  python tools/parity_harness.py --make-fixture /tmp/fix.wav   # synthesize
  python tools/parity_harness.py /tmp/fix.wav --mode AM --tune 250000
Prints per-stage and end-to-end SNR of (jax chain) vs (scipy golden); exits
nonzero below --min-snr (default 40 dB).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import scipy.signal

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pebblesdr_tpu.demod.modes import DemodMode, from_string  # noqa: E402
from pebblesdr_tpu.io import wav  # noqa: E402
from pebblesdr_tpu.ops import decimator as decim_mod  # noqa: E402
from pebblesdr_tpu.ops import fir as fir_mod  # noqa: E402
from pebblesdr_tpu.ops import iir as iir_mod  # noqa: E402


def scipy_golden(iq: np.ndarray, fs: int, tune_hz: float, mode: "DemodMode",
                 lo_cut: float, hi_cut: float, protect_bw: float,
                 audio_rate: int, blk: int) -> np.ndarray:
    """Independent float64 implementation of the chain (no JAX): AM and
    USB/LSB goldens share the front end."""
    x = iq.astype(np.complex128)
    n = np.arange(len(x))
    alpha = 0.9999
    # 1) DC removal (one-pole)
    mean = scipy.signal.lfilter([1 - alpha], [1, -alpha], x)
    x = x - mean
    # 2) mix
    x = x * np.exp(-2j * np.pi * tune_hz * n / fs)
    # 3) halfband cascade (same plan/taps as the chain)
    plan = decim_mod.build_plan(fs, protect_bw)
    for st in plan.stages:
        x = scipy.signal.lfilter(st.taps, [1.0], x)[::2]
    rate = plan.rate_out
    # 4) FastFIR bandpass: identical windowed-sinc design
    ntaps = blk + 1
    taps = fir_mod.design_bandpass_complex(lo_cut, hi_cut, rate, ntaps)
    x = scipy.signal.lfilter(taps, [1.0], x)
    # 5) demod
    if mode == DemodMode.AM:
        mag = np.abs(x)
        dc = scipy.signal.lfilter([1 - alpha], [1, -alpha], mag)
        audio = mag - dc
        lp = fir_mod.design_lowpass_kaiser(6000.0, rate, atten_db=50.0)
        audio = scipy.signal.lfilter(lp, [1.0], audio)
    elif mode == DemodMode.USB:
        audio = x.real + x.imag
    elif mode == DemodMode.LSB:
        audio = x.real - x.imag
    else:
        raise ValueError(f"no scipy golden for {mode}")
    # 6) resample to audio rate
    from fractions import Fraction

    fr = Fraction(int(audio_rate), int(rate))
    audio = scipy.signal.resample_poly(audio, fr.numerator, fr.denominator)
    return audio


def _front64(iq: np.ndarray, fs: int, tune_hz: float, protect_bw: float):
    """Shared float64 front end: DC removal -> mix -> halfband cascade.
    Returns (x, rate_out)."""
    x = iq.astype(np.complex128)
    n = np.arange(len(x))
    alpha = 0.9999
    mean = scipy.signal.lfilter([1 - alpha], [1, -alpha], x)
    x = x - mean
    x = x * np.exp(-2j * np.pi * tune_hz * n / fs)
    plan = decim_mod.build_plan(fs, protect_bw)
    for st in plan.stages:
        x = scipy.signal.lfilter(st.taps, [1.0], x)[::2]
    return x, plan.rate_out


def _bandpass64(x: np.ndarray, rate: float, lo_cut: float, hi_cut: float,
                blk: int) -> np.ndarray:
    taps = fir_mod.design_bandpass_complex(lo_cut, hi_cut, rate, blk + 1)
    return scipy.signal.lfilter(taps, [1.0], x)


def _resample64(audio: np.ndarray, rate: float, audio_rate: int) -> np.ndarray:
    from fractions import Fraction

    fr = Fraction(int(audio_rate), int(round(rate)))
    return scipy.signal.resample_poly(audio, fr.numerator, fr.denominator)


def _pll64(cfg, x: np.ndarray) -> np.ndarray:
    """Float64 per-sample PLL mirroring ops.pll.pll_run semantics (alpha/beta
    gains, fdev clamp, amp EWMA, detector family) — an independent sequential
    implementation of the same loop spec.  Returns the per-sample phase USED
    to mix each sample."""
    import math

    dev_lo = cfg.freq_lo - cfg.freq_center
    dev_hi = cfg.freq_hi - cfg.freq_center
    phase = 0.0
    fdev = 0.0
    amp = 1.0
    phases = np.empty(len(x), np.float64)
    two_pi = 2.0 * math.pi
    for i, xt in enumerate(x):
        phases[i] = phase
        amp += 1e-3 * (abs(xt) - amp)
        if cfg.detector == "pilot":
            a_half = max((math.pi / 4.0) * amp, 1e-6)
            err = xt.real * math.cos(phase) / a_half
        else:
            z = xt * complex(math.cos(-phase), math.sin(-phase))
            if cfg.detector == "atan2":
                err = math.atan2(z.imag, z.real)
            elif cfg.detector == "costas":
                err = z.real * z.imag / max(amp * amp, 1e-12)
            else:
                err = z.imag * (1.0 if z.real >= 0 else -1.0)
        fdev = min(max(fdev + cfg.beta * err, dev_lo), dev_hi)
        phase = phase + (cfg.freq_center + fdev) + cfg.alpha * err
        phase = math.fmod(phase + math.pi, two_pi)
        if phase < 0:
            phase += two_pi
        phase -= math.pi
    return phases


def scipy_golden_nfm(iq: np.ndarray, fs: int, tune_hz: float, rx) -> np.ndarray:
    """NFM conj-product discriminator golden (demod path of demod_nfm.cpp
    FM2 :124-140): bandpass -> angle(x*conj(prev))*gain -> 0.999 DC tracker
    -> voice LP -> resample."""
    x, rate = _front64(iq, fs, tune_hz, rx.info.max_output_bw)
    x = _bandpass64(x, rate, rx.info.lo_cut, rx.info.hi_cut, rx.blk)
    cfg = rx.nfm_cfg
    prev = np.concatenate([[0.0 + 0.0j], x[:-1]])
    delta = x * np.conj(prev)
    gain = rate / (2.0 * np.pi * cfg.max_deviation)
    audio = np.arctan2(delta.imag, delta.real) * gain
    a = 0.999
    dc = scipy.signal.lfilter([1 - a], [1, -a], audio)
    audio = audio - dc
    audio = scipy.signal.lfilter(cfg.voice_taps.astype(np.float64), [1.0],
                                 audio)
    return _resample64(audio, rate, rx.cfg.audio_rate)


def scipy_golden_sam(iq: np.ndarray, fs: int, tune_hz: float, rx) -> np.ndarray:
    """SAM golden (demod_sam.cpp:5-112 capability): float64 per-sample PLL
    carrier recovery -> coherent mix -> 0.999 DC removal -> resample (mono)."""
    x, rate = _front64(iq, fs, tune_hz, rx.info.max_output_bw)
    x = _bandpass64(x, rate, rx.info.lo_cut, rx.info.hi_cut, rx.blk)
    phases = _pll64(rx.sam_cfg.pll, x)
    base = x * np.exp(-1j * phases)
    mono = base.real
    a = 0.999
    dc = scipy.signal.lfilter([1 - a], [1, -a], mono)
    mono = mono - dc
    return _resample64(mono, rate, rx.cfg.audio_rate)


def scipy_golden_wfm(iq: np.ndarray, fs: int, tune_hz: float, rx,
                     stereo: bool, return_stereo: bool = False):
    """WFM golden (demod_wfm.cpp mono :207-232 / stereo :255-365), fully
    INDEPENDENT of the chain's WFM design (VERDICT r2 item 8 — the previous
    golden reused rx.wfm_cfg's taps and mirrored the open-pilot algorithm):

      * composite discriminator: float64 conj-product angle (shared math is
        the DEFINITION of FM, not an implementation);
      * pilot recovery: the textbook analytic-signal method — narrow 19 kHz
        FIR bandpass (own firwin design) -> scipy.signal.hilbert ->
        unwrapped instantaneous phase; nothing like the chain's windowed
        chunk-DFT open loop;
      * audio LP: own Kaiser design (kaiserord; 15 kHz pass / 19 kHz stop);
      * de-emphasis: the standard RC recursion from the time constant.

    Only rate bookkeeping (decimation geometry, 75 kHz deviation constant)
    is shared.  Returns LEFT at the audio rate (or (L, R) with
    return_stereo=True so tests can assert the GOLDEN's own stereo
    separation — the parity equalizer then cannot mask demux errors).
    """
    import math

    x, rate = _front64(iq, fs, tune_hz, rx.info.max_output_bw)
    cfg = rx.wfm_cfg
    prev = np.concatenate([[0.0 + 0.0j], x[:-1]])
    delta = x * np.conj(prev)
    gain = rate / (2.0 * np.pi * 75000.0)
    raw = np.arctan2(delta.imag, delta.real) * gain
    # own audio LP design (15 kHz pass, stop at the 19 kHz pilot, 60 dB)
    ntaps, beta = scipy.signal.kaiserord(60.0, (19000.0 - 15000.0)
                                         / (rate / 2.0))
    ntaps |= 1  # odd length -> integer group delay
    lp = scipy.signal.firwin(ntaps, 17000.0, window=("kaiser", beta),
                             fs=rate)
    dec = cfg.audio_decim
    audio_rate = rate / dec
    mono = scipy.signal.lfilter(lp, [1.0], raw)[::dec]
    if stereo:
        # analytic-signal pilot: narrow FIR bandpass around 19 kHz, then
        # hilbert -> instantaneous phase.  pilot = A sin(psi) convention:
        # analytic real part is A cos(theta), so psi = theta + pi/2 and
        # sin(2 psi) = -sin(2 theta).
        nbp, bbp = scipy.signal.kaiserord(50.0, 400.0 / (rate / 2.0))
        nbp |= 1
        bp = scipy.signal.firwin(nbp, [18800.0, 19200.0],
                                 window=("kaiser", bbp), pass_zero=False,
                                 fs=rate)
        pilot = scipy.signal.lfilter(bp, [1.0], raw)
        # compensate the bandpass group delay so pilot phase aligns with raw
        gd = (nbp - 1) // 2
        pilot = np.concatenate([pilot[gd:], np.zeros(gd)])
        theta = np.angle(scipy.signal.hilbert(pilot))
        lmr = raw * 2.0 * (-np.sin(2.0 * theta))
        lmr_a = scipy.signal.lfilter(lp, [1.0], lmr)[::dec]
        left = mono + lmr_a
        right = mono - lmr_a
    else:
        left = mono
        right = mono
    a = math.exp(-1.0 / (cfg.deemphasis_us * 1e-6 * audio_rate))
    left = scipy.signal.lfilter([1 - a], [1, -a], left)
    right = scipy.signal.lfilter([1 - a], [1, -a], right)
    left = _resample64(left, audio_rate, rx.cfg.audio_rate)
    right = _resample64(right, audio_rate, rx.cfg.audio_rate)
    return (left, right) if return_stereo else left


def run_chain(iq: np.ndarray, fs: int, mode: DemodMode, tune_hz: float,
              frames: int):
    import jax
    import jax.numpy as jnp

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig

    cfg = ReceiverConfig(sample_rate=fs, frames_per_buffer=frames,
                         mode=mode, agc_mode="off")
    rx = Receiver(cfg)
    state = jax.jit(lambda: rx.init_state())()
    params = rx.default_params(tune_hz)
    outs = []
    nb = len(iq) // frames
    for i in range(nb):
        blk = iq[i * frames:(i + 1) * frames]
        ri = np.stack([blk.real, blk.imag]).astype(np.float32)[None]
        state, out = rx.step(state, params, jax.lax.complex(
            jnp.asarray(ri[:, 0]), jnp.asarray(ri[:, 1])))
        outs.append(np.asarray(out["audio"])[0])
    return np.concatenate(outs, axis=-1), rx


def snr_db(ref: np.ndarray, got: np.ndarray, skip: int, eq_taps: int = 33) -> float:
    """Parity SNR with a short least-squares equalizer.

    The two implementations use different (both correct) resampler filters, so
    they differ by a small LINEAR filter (fractional group delay + ripple); a
    33-tap LS fit absorbs exactly that and nothing else — remaining error is
    genuine nonlinear/numerical mismatch.  (A half-sample delay alone would
    read as ~24 dB on a 1 kHz tone without this.)
    """
    n = min(len(ref), len(got))
    r, g = ref[skip:n], got[skip:n]
    m = len(r) - eq_taps
    cols = np.stack([g[i:i + m] for i in range(eq_taps)], axis=1)
    target = r[eq_taps // 2: eq_taps // 2 + m]
    w, *_ = np.linalg.lstsq(cols, target, rcond=None)
    err = target - cols @ w
    return 10 * np.log10(max(np.mean(target**2), 1e-20)
                         / max(np.mean(err**2), 1e-20))


def make_fixture(path: str) -> None:
    fs, secs = 2_048_000, 2.0
    t = np.arange(int(fs * secs)) / fs
    env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
    iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64)
    rng = np.random.default_rng(0)
    iq += (1e-3 * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
           ).astype(np.complex64)
    wav.write_iq_wav(path, iq, fs, center_freq_hz=250_000.0, demod_mode="AM")
    print(f"fixture written: {path} ({secs}s AM @ +250 kHz, 2.048 Msps)")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("wav_path", nargs="?")
    p.add_argument("--make-fixture", metavar="PATH")
    p.add_argument("--mode", default="AM")
    p.add_argument("--tune", type=float, default=None)
    p.add_argument("--frames", type=int, default=32768)
    p.add_argument("--min-snr", type=float, default=40.0)
    args = p.parse_args(argv)

    if args.make_fixture:
        make_fixture(args.make_fixture)
        return 0
    if not args.wav_path:
        p.error("wav_path required (or --make-fixture)")

    iq, info = wav.read_iq_wav(args.wav_path)
    mode = from_string(args.mode or info.demod_mode)
    tune = args.tune if args.tune is not None else info.center_freq_hz
    supported = (DemodMode.AM, DemodMode.USB, DemodMode.LSB, DemodMode.FMN,
                 DemodMode.SAM, DemodMode.FMM, DemodMode.FMS)
    if mode not in supported:
        print(f"scipy golden implemented for {[m.value for m in supported]}",
              file=sys.stderr)
        return 2

    got, rx = run_chain(iq, info.sample_rate, mode, tune, args.frames)
    if mode == DemodMode.FMN:
        golden = scipy_golden_nfm(iq, info.sample_rate, tune, rx)
    elif mode == DemodMode.SAM:
        golden = scipy_golden_sam(iq, info.sample_rate, tune, rx)
    elif mode in (DemodMode.FMM, DemodMode.FMS):
        golden = scipy_golden_wfm(iq, info.sample_rate, tune, rx,
                                  stereo=(mode == DemodMode.FMS))
        if got.ndim == 2:  # stereo [2, M]: compare the left channel
            got = got[0]
    else:
        golden = scipy_golden(iq, info.sample_rate, tune, mode,
                              rx.info.lo_cut, rx.info.hi_cut,
                              rx.info.max_output_bw,
                              rx.cfg.audio_rate, rx.blk)
    skip = rx.cfg.audio_rate // 2  # DC-blocker settling
    s = snr_db(golden, got.astype(np.float64), skip)
    print(f"chain vs scipy-golden SNR: {s:.1f} dB "
          f"({len(got)} samples, skip {skip})")
    if s < args.min_snr:
        print(f"FAIL: below {args.min_snr} dB", file=sys.stderr)
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
