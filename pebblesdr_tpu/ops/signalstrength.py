"""Signal strength estimation: in-band power, noise floor, SNR, squelch source.

Capability parity with SignalStrength (application/signalstrength.cpp):
  * preferred frequency-domain estimate (fdEstimate :289-378): peak/average
    power over the bandpass bins, noise from side bins +-1 bandpass-width away,
    SNR = signal - noise, drives both the S-meter and the squelch;
  * Welford/RMS time-domain estimate (:195-285) as a fallback.

Operates on the *linear power* spectrum (pre-dB) of the demod-rate block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.core import db as dbu


def band_bins(lo_hz: float, hi_hz: float, sample_rate: float, n_bins: int):
    """fftshifted bin index range [start, stop) covering lo..hi Hz."""
    res = sample_rate / n_bins
    start = int(np.floor(lo_hz / res)) + n_bins // 2
    stop = int(np.ceil(hi_hz / res)) + n_bins // 2
    start = max(0, min(n_bins - 1, start))
    stop = max(start + 1, min(n_bins, stop))
    return start, stop


def band_masks(lo_hz: float, hi_hz: float, sample_rate: float, n_bins: int):
    """(band_mask, noise_mask) [n_bins] float32 — runtime inputs so retuning
    the bandpass never recompiles the jitted chain."""
    start, stop = band_bins(lo_hz, hi_hz, sample_rate, n_bins)
    width = stop - start
    band = np.zeros(n_bins, np.float32)
    band[start:stop] = 1.0
    noise = np.zeros(n_bins, np.float32)
    noise[max(0, start - width):start] = 1.0
    noise[stop:min(n_bins, stop + width)] = 1.0
    if noise.sum() == 0:
        noise[:] = 1.0
    return band, noise


def fd_estimate_masked(power_lin: jax.Array, band_mask: jax.Array,
                       noise_mask: jax.Array):
    """Mask-based fdEstimate: power_lin [C, bins], masks [bins] float32.

    Returns dict(signal_db, peak_db, noise_db, snr_db) each [C].
    """
    nb = jnp.maximum(jnp.sum(band_mask), 1.0)
    nn = jnp.maximum(jnp.sum(noise_mask), 1.0)
    sig_avg = jnp.sum(power_lin * band_mask, axis=-1) / nb
    sig_peak = jnp.max(power_lin * band_mask, axis=-1)
    noise = jnp.sum(power_lin * noise_mask, axis=-1) / nn
    return {
        "signal_db": dbu.power_to_db(sig_avg),
        "peak_db": dbu.power_to_db(sig_peak),
        "noise_db": dbu.power_to_db(noise),
        "snr_db": dbu.power_to_db(sig_avg) - dbu.power_to_db(noise),
    }


def fd_estimate(power_lin: jax.Array, start: int, stop: int):
    """power_lin: [C, bins] linear fftshifted power spectrum.

    Returns dict(signal_db, peak_db, noise_db, snr_db) each [C].
    Noise is measured in two side windows of the same width directly below and
    above the bandpass (clipped to the spectrum edges), like fdEstimate.
    """
    n_bins = power_lin.shape[-1]
    width = stop - start
    band = power_lin[:, start:stop]
    sig_avg = jnp.mean(band, axis=-1)
    sig_peak = jnp.max(band, axis=-1)

    lo_s = max(0, start - width)
    lo_e = max(lo_s + 1, start)
    hi_s = min(n_bins - 1, stop)
    hi_e = min(n_bins, stop + width)
    noise = (jnp.sum(power_lin[:, lo_s:lo_e], axis=-1)
             + jnp.sum(power_lin[:, hi_s:hi_e], axis=-1)) / (
        (lo_e - lo_s) + (hi_e - hi_s))

    return {
        "signal_db": dbu.power_to_db(sig_avg),
        "peak_db": dbu.power_to_db(sig_peak),
        "noise_db": dbu.power_to_db(noise),
        "snr_db": dbu.power_to_db(sig_avg) - dbu.power_to_db(noise),
    }


def td_estimate(x: jax.Array):
    """Time-domain RMS/peak estimate [C] in dB (signalstrength.cpp:195-285)."""
    p = jnp.abs(x) ** 2
    return {
        "rms_db": dbu.power_to_db(jnp.mean(p, axis=-1)),
        "peak_db": dbu.power_to_db(jnp.max(p, axis=-1)),
    }
