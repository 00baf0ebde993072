"""FFT window functions with coherent-gain / ENBW metadata.

Capability parity with the reference WindowFunction (pebblelib/windowfunction.h:7-31):
window families RECTANGULAR/HANNING/HAMMING/BLACKMAN/BLACKMANHARRIS/
BLACKMAN_NUTTALL/FLATTOP, each with its coherent gain (mean of window, used to
normalize spectra — fft.cpp:351-360) and equivalent-noise bandwidth.

Windows are designed host-side in float64 (numpy) and returned as numpy arrays;
callers move them on-device once at chain-build time.
"""

from __future__ import annotations

import enum

import numpy as np


class WindowType(enum.Enum):
    RECTANGULAR = "rectangular"
    HANNING = "hanning"
    HAMMING = "hamming"
    BLACKMAN = "blackman"
    BLACKMAN_HARRIS = "blackmanharris"
    BLACKMAN_NUTTALL = "blackmannuttall"
    FLATTOP = "flattop"


# cosine-sum coefficients a0..a3(.. a4 for flattop)
_COSINE_SUM = {
    WindowType.HANNING: [0.5, 0.5],
    WindowType.HAMMING: [0.54, 0.46],
    WindowType.BLACKMAN: [0.42, 0.5, 0.08],
    WindowType.BLACKMAN_HARRIS: [0.35875, 0.48829, 0.14128, 0.01168],
    WindowType.BLACKMAN_NUTTALL: [0.3635819, 0.4891775, 0.1365995, 0.0106411],
    WindowType.FLATTOP: [0.21557895, 0.41663158, 0.277263158, 0.083578947, 0.006947368],
}


def window(kind: WindowType, n: int, periodic: bool = True) -> np.ndarray:
    """Return the window of length n as float64.

    periodic=True (denominator n) matches spectral-analysis use; the reference
    uses symmetric (n-1) windows for its FIR designs — pass periodic=False there.
    """
    if kind == WindowType.RECTANGULAR:
        return np.ones(n, dtype=np.float64)
    coeffs = _COSINE_SUM[kind]
    denom = n if periodic else n - 1
    x = 2.0 * np.pi * np.arange(n) / denom
    w = np.zeros(n, dtype=np.float64)
    for k, a in enumerate(coeffs):
        w += ((-1.0) ** k) * a * np.cos(k * x)
    return w


def coherent_gain(w: np.ndarray) -> float:
    """Mean of window — scales a coherent tone; used to normalize dB spectra."""
    return float(np.mean(w))


def enbw(w: np.ndarray) -> float:
    """Equivalent noise bandwidth in bins: N*sum(w^2)/sum(w)^2."""
    return float(len(w) * np.sum(w**2) / np.sum(w) ** 2)
