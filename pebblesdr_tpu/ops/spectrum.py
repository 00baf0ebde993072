"""Windowed-FFT power spectrum: dB spectra, averaging, overload, screen mapping.

Capability parity with FFT/SignalSpectrum (pebblelib/fft.{h,cpp},
application/signalspectrum.cpp):
  * window apply + input overload detect (fft.cpp:129-157),
  * unfold to -f..+f bin order (fft.cpp:183-225)  -> jnp.fft.fftshift,
  * power spectrum in dB normalized by N and window coherent gain
    (calcPowerAverages, fft.cpp:324+), with a display dB offset,
  * exponential power averaging across frames,
  * mapFFTToScreen pixel binning (signalspectrum.cpp:137-168): max-bin
    reduction of FFT bins onto a pixel grid.

The reference's four FFT backends (FFTW/Ooura/CuteSDR/Accelerate, fft.cpp:45-65)
collapse to XLA's native batched FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.core import db as dbu
from pebblesdr_tpu.core import windows as win
from pebblesdr_tpu.core.block import pytree_dataclass

MIN_BINS = 2048   # fft.h:21
MAX_BINS = 65535  # fft.h:22
OVERLOAD_LEVEL = 1.0  # |sample| above full scale = ADC overload (fft.cpp:138-142 analog)


def make_window(n_bins: int, kind: win.WindowType = win.WindowType.BLACKMAN_HARRIS):
    """Returns (window [n] float32 device-ready, coherent_gain scalar)."""
    w = win.window(kind, n_bins, periodic=True)
    return np.asarray(w, np.float32), win.coherent_gain(w)


@pytree_dataclass
class SpectrumState:
    avg_power: jax.Array  # [C, bins] linear power running average


def state_init(channels: int, n_bins: int) -> SpectrumState:
    return SpectrumState(avg_power=jnp.zeros((channels, n_bins), jnp.float32))


def power_spectrum(x: jax.Array, window: jax.Array, coherent_gain: float,
                   db_offset: float = 0.0):
    """x: [C, N] complex64 -> (spectrum_db [C, N] fftshifted, overload [C] bool).

    0 dB == full-scale coherent tone (window coherent gain normalized out,
    matching fft.cpp:351-360 semantics).
    """
    n = x.shape[-1]
    overload = jnp.max(jnp.abs(x.real), axis=-1) > OVERLOAD_LEVEL
    xw = x * window[None, :]
    spec = jnp.fft.fftshift(jnp.fft.fft(xw, axis=-1), axes=-1)
    norm = 1.0 / (n * coherent_gain)
    power = jnp.abs(spec * norm) ** 2
    return dbu.power_to_db(power) + db_offset, overload


def averaged_spectrum(state: SpectrumState, x: jax.Array, window: jax.Array,
                      coherent_gain: float, smoothing: float = 0.0,
                      db_offset: float = 0.0):
    """Like power_spectrum but with exponential averaging in the linear-power
    domain.  smoothing=0 -> no averaging.  Returns (state', db [C,N], overload)."""
    n = x.shape[-1]
    overload = jnp.max(jnp.abs(x.real), axis=-1) > OVERLOAD_LEVEL
    xw = x * window[None, :]
    spec = jnp.fft.fftshift(jnp.fft.fft(xw, axis=-1), axes=-1)
    norm = 1.0 / (n * coherent_gain)
    power = jnp.abs(spec * norm) ** 2
    a = jnp.asarray(smoothing, jnp.float32)
    avg = a * state.avg_power + (1.0 - a) * power
    return SpectrumState(avg_power=avg), dbu.power_to_db(avg) + db_offset, overload


def map_to_screen(spectrum_db: jax.Array, n_pixels: int):
    """Max-bin FFT->pixel reduction (mapFFTToScreen capability,
    signalspectrum.cpp:137-168).  Requires bins % n_pixels == 0 (the chain
    planner picks bin counts accordingly); max preserves narrow signals."""
    c, bins = spectrum_db.shape
    assert bins % n_pixels == 0, "bins must divide evenly into pixels"
    return jnp.max(spectrum_db.reshape(c, n_pixels, bins // n_pixels), axis=-1)
