"""Goertzel tone detection: single-bin DFT power + OOK (on/off keying) detector.

Capability parity with Goertzel/GoertzelOOK (pebblelib/goertzel.{h,cpp}):
  * classic power and complex non-integer-k single-bin DFT (goertzel.h:34-54),
  * GoertzelOOK: main/low/high compare bins, threshold modes, debounce with
    attack/decay counters (goertzel.h:84-104),
  * DTMF / CTCSS tone tables (goertzel.h:194-277).

TPU-first design: the reference runs a per-sample 2nd-order recurrence.  A
Goertzel bin is just a dot product with exp(-j*2*pi*k*n/N), so we reshape the
stream into [bins, N] frames and evaluate ALL detection bins for ALL frames as
one matmul (MXU) — mathematically identical (including non-integer k), with no
sequential state at all.  Only the OOK debounce (a handful of per-frame
counter updates) remains a scan, over frames rather than samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.core.block import pytree_dataclass

# DTMF: (low Hz, high Hz) per key (goertzel.h:194-230 capability)
DTMF_FREQS = {
    "1": (697, 1209), "2": (697, 1336), "3": (697, 1477), "A": (697, 1633),
    "4": (770, 1209), "5": (770, 1336), "6": (770, 1477), "B": (770, 1633),
    "7": (852, 1209), "8": (852, 1336), "9": (852, 1477), "C": (852, 1633),
    "*": (941, 1209), "0": (941, 1336), "#": (941, 1477), "D": (941, 1633),
}

# CTCSS sub-audible squelch tones in Hz (goertzel.h:232-277 capability)
CTCSS_TONES = [
    67.0, 69.3, 71.9, 74.4, 77.0, 79.7, 82.5, 85.4, 88.5, 91.5, 94.8, 97.4,
    100.0, 103.5, 107.2, 110.9, 114.8, 118.8, 123.0, 127.3, 131.8, 136.5,
    141.3, 146.2, 151.4, 156.7, 162.2, 167.9, 173.8, 179.9, 186.2, 192.8,
    203.5, 210.7, 218.1, 225.7, 233.6, 241.8, 250.3,
]


def dft_vectors(freqs_hz, sample_rate: float, n: int) -> np.ndarray:
    """[num_bins, n] complex64 DFT basis rows (non-integer k supported)."""
    freqs = np.atleast_1d(np.asarray(freqs_hz, np.float64))
    t = np.arange(n, dtype=np.float64)
    return np.exp(-2j * np.pi * freqs[:, None] * t[None, :] / sample_rate).astype(
        np.complex64)


def goertzel_power(x: jax.Array, basis: jax.Array):
    """x: [C, F, N] complex frames, basis [B, N] -> power [C, F, B].

    Normalized so a unit-amplitude tone exactly on bin gives power 1.0.
    """
    n = x.shape[-1]
    resp = jnp.einsum("cfn,bn->cfb", x, basis) / n
    return jnp.abs(resp) ** 2


def frame_stream(x: jax.Array, frame: int) -> jax.Array:
    """[C, N] -> [C, N//frame, frame] (N must divide; chain planner ensures)."""
    c, n = x.shape
    return x.reshape(c, n // frame, frame)


@pytree_dataclass
class OOKState:
    noise_floor: jax.Array  # [C] EWMA of off-power
    signal_peak: jax.Array  # [C] EWMA of on-power
    state: jax.Array        # [C] bool current mark/space decision
    run: jax.Array          # [C] int32 samples in current state (debounce)


def ook_init(channels: int) -> OOKState:
    return OOKState(
        noise_floor=jnp.full((channels,), 1e-6, jnp.float32),
        signal_peak=jnp.full((channels,), 1e-3, jnp.float32),
        state=jnp.zeros((channels,), bool),
        run=jnp.zeros((channels,), jnp.int32),
    )


def ook_detect(state: OOKState, power_main: jax.Array, power_low: jax.Array,
               power_high: jax.Array, debounce: int = 2, avg_alpha: float = 0.05):
    """OOK decision per frame (GoertzelOOK::processResult capability,
    goertzel.cpp:664+): mark when the main bin dominates the compare bins and
    exceeds the adaptive mid-threshold; debounced over `debounce` frames.

    power_*: [C, F].  Returns (state', marks [C, F] bool).
    """

    def step(carry, pows):
        nf, sp, st, run = carry
        pm, pl, ph = pows
        compare = jnp.maximum(pl, ph)
        thresh = jnp.sqrt(jnp.maximum(nf * sp, 1e-18))  # geometric mid
        raw = (pm > 2.0 * compare) & (pm > thresh)
        # track envelopes
        nf2 = jnp.where(raw, nf, (1 - avg_alpha) * nf + avg_alpha * pm)
        sp2 = jnp.where(raw, (1 - avg_alpha) * sp + avg_alpha * pm, sp)
        # debounce: require `debounce` consecutive frames to flip
        same = raw == st
        run2 = jnp.where(same, jnp.zeros_like(run), run + 1)
        flip = run2 >= debounce
        st2 = jnp.where(flip, raw, st)
        run2 = jnp.where(flip, jnp.zeros_like(run2), run2)
        return (nf2, sp2, st2, run2), st2

    carry0 = (state.noise_floor, state.signal_peak, state.state, state.run)
    seq = (jnp.moveaxis(power_main, 1, 0), jnp.moveaxis(power_low, 1, 0),
           jnp.moveaxis(power_high, 1, 0))
    (nf, sp, st, run), marks = jax.lax.scan(step, carry0, seq)
    return (OOKState(noise_floor=nf, signal_peak=sp, state=st, run=run),
            jnp.moveaxis(marks, 0, 1))
