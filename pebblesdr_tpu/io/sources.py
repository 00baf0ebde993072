"""IQ sample sources — the device-plugin layer, host side.

Capability parity with the DeviceInterface plugin surface
(pebblelib/device_interfaces.h:42-174) for the sources that make sense on a
TPU host: file playback (plugins/FileSDRDevice), synthetic test devices
(plugins/ExampleSDRDevice, plugins/MorseGenDevice), and network IQ
(rtl_tcp client — see io/rtl_tcp.py).  USB hardware plugins are out of scope
on a TPU host (SURVEY.md §2.5: vendored USB libs not reimplemented).

A Source yields fixed-length complex64 blocks via read_block(n); standard keys
(sample rate, center frequency, startup demod mode) mirror the reference's
StandardKeys get/set surface.  Real-time pacing (the reference's producer
thread nanosleep, filesdrdevice.cpp:226-243) is available via pace=True.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, Optional

import numpy as np

from pebblesdr_tpu.io import wav


@dataclasses.dataclass
class SourceInfo:
    sample_rate: int
    center_freq_hz: float = 0.0
    demod_mode: str = ""
    name: str = ""


class Source:
    """Base source: read_block(n) -> complex64 [n]; None at end of stream."""

    info: SourceInfo

    def read_block(self, n: int) -> Optional[np.ndarray]:
        raise NotImplementedError

    def blocks(self, n: int, max_blocks: int | None = None) -> Iterator[np.ndarray]:
        count = 0
        while max_blocks is None or count < max_blocks:
            b = self.read_block(n)
            if b is None:
                return
            yield b
            count += 1

    # StandardKeys-ish surface (device_interfaces.h:46-111 analog)
    def get(self, key: str):
        return getattr(self.info, key)

    def set(self, key: str, value) -> None:
        setattr(self.info, key, value)


class FileSource(Source):
    """IQ WAV playback (FileSDRDevice capability): loops the file, exposes the
    recorded center frequency / demod mode, optional real-time pacing."""

    def __init__(self, path: str, loop: bool = True, pace: bool = False):
        self.iq, winfo = wav.read_iq_wav(path)
        self.info = SourceInfo(sample_rate=winfo.sample_rate,
                               center_freq_hz=winfo.center_freq_hz,
                               demod_mode=winfo.demod_mode, name=path)
        self.loop = loop
        self.pace = pace
        self.pos = 0
        self._t0 = None
        self._sent = 0

    def read_block(self, n: int) -> Optional[np.ndarray]:
        if self.pos + n > len(self.iq):
            if not self.loop:
                return None
            reps = [self.iq[self.pos:]]
            need = n - (len(self.iq) - self.pos)
            while need > len(self.iq):
                reps.append(self.iq)
                need -= len(self.iq)
            reps.append(self.iq[:need])
            out = np.concatenate(reps)
            self.pos = need
        else:
            out = self.iq[self.pos:self.pos + n]
            self.pos += n
        if self.pace:
            if self._t0 is None:
                self._t0 = time.monotonic()
            self._sent += n
            due = self._t0 + self._sent / self.info.sample_rate
            delay = due - time.monotonic()
            if delay > 0:
                time.sleep(delay)
        return out


class SyntheticSource(Source):
    """Tone(s) + calibrated noise generator (ExampleSDRDevice / TestBench
    injection capability).  tones: list of (freq_hz, amplitude)."""

    def __init__(self, sample_rate: int, tones=((100_000.0, 0.5),),
                 noise_db: float | None = None, seed: int = 0):
        self.info = SourceInfo(sample_rate=sample_rate, name="synthetic")
        self.tones = list(tones)
        self.noise_db = noise_db
        self.rng = np.random.default_rng(seed)
        self.n_sent = 0

    def read_block(self, n: int) -> np.ndarray:
        t = (self.n_sent + np.arange(n)) / self.info.sample_rate
        out = np.zeros(n, np.complex64)
        for f, a in self.tones:
            out += (a * np.exp(2j * np.pi * f * t)).astype(np.complex64)
        if self.noise_db is not None:
            amp = 10.0 ** (self.noise_db / 20.0) / np.sqrt(2.0)
            out += amp * (self.rng.standard_normal(n)
                          + 1j * self.rng.standard_normal(n)).astype(np.complex64)
        self.n_sent += n
        return out


# Morse timing: dot=1 unit, dash=3, intra-char gap=1, char gap=3, word gap=7
_MORSE = {
    "a": ".-", "b": "-...", "c": "-.-.", "d": "-..", "e": ".", "f": "..-.",
    "g": "--.", "h": "....", "i": "..", "j": ".---", "k": "-.-", "l": ".-..",
    "m": "--", "n": "-.", "o": "---", "p": ".--.", "q": "--.-", "r": ".-.",
    "s": "...", "t": "-", "u": "..-", "v": "...-", "w": ".--", "x": "-..-",
    "y": "-.--", "z": "--..", "0": "-----", "1": ".----", "2": "..---",
    "3": "...--", "4": "....-", "5": ".....", "6": "-....", "7": "--...",
    "8": "---..", "9": "----.", ".": ".-.-.-", ",": "--..--", "?": "..--..",
    "/": "-..-.", "=": "-...-",
}


def morse_envelope(text: str, wpm: float, sample_rate: float) -> np.ndarray:
    """On/off keying envelope for text at wpm (PARIS timing: unit = 1.2/wpm s)."""
    unit = int(round(1.2 / wpm * sample_rate))
    env = []
    for word in text.lower().split():
        for ch in word:
            code = _MORSE.get(ch)
            if code is None:
                continue
            for sym in code:
                env.append(np.ones(unit * (3 if sym == "-" else 1), np.float32))
                env.append(np.zeros(unit, np.float32))
            env.append(np.zeros(2 * unit, np.float32))  # char gap (1+2=3)
        env.append(np.zeros(4 * unit, np.float32))      # word gap (3+4=7)
    return np.concatenate(env) if env else np.zeros(0, np.float32)


class MorseGenSource(Source):
    """Synthetic CW test device (MorseGenDevice capability,
    morsegendevice.h:88-142): up to 5 parallel Morse generators at distinct
    frequencies/WPM/amplitudes plus calibrated noise; loops its message."""

    def __init__(self, sample_rate: int,
                 generators=(("cq cq cq de pebble tpu", 20.0, 10_000.0, 0.5),),
                 noise_db: float | None = -60.0, seed: int = 1):
        # generators: (text, wpm, freq_hz, amplitude)
        self.info = SourceInfo(sample_rate=sample_rate, name="morsegen",
                               demod_mode="CWU")
        self.envs = []
        self.freqs = []
        self.amps = []
        for text, wpm, freq, amp in generators:
            self.envs.append(morse_envelope(text, wpm, sample_rate))
            self.freqs.append(freq)
            self.amps.append(amp)
        self.noise_db = noise_db
        self.rng = np.random.default_rng(seed)
        self.n_sent = 0

    def read_block(self, n: int) -> np.ndarray:
        t = (self.n_sent + np.arange(n)) / self.info.sample_rate
        out = np.zeros(n, np.complex64)
        for env, f, a in zip(self.envs, self.freqs, self.amps):
            if len(env) == 0:
                continue
            idx = (self.n_sent + np.arange(n)) % len(env)
            out += (a * env[idx] * np.exp(2j * np.pi * f * t)).astype(np.complex64)
        if self.noise_db is not None:
            amp = 10.0 ** (self.noise_db / 20.0) / np.sqrt(2.0)
            out += amp * (self.rng.standard_normal(n)
                          + 1j * self.rng.standard_normal(n)).astype(np.complex64)
        self.n_sent += n
        return out
