"""CW (Morse) decoder: Goertzel-OOK tone detection + adaptive-WPM timing decode.

Capability parity with MorseDigitalModem (plugins/MorseDigitalModem/morse.cpp):
  * tone detection on the demod-rate stream via Goertzel OOK with compare bins
    (:790-830) — here the matmul Goertzel over fixed frames (ops.goertzel);
  * mark/space timing -> dot/dash classification with adaptive WPM tracking
    via dot/dash moving averages (morse.h:86-178);
  * MorseCode table lookup -> text (modem.morse_code).

Split TPU/host: frame powers + OOK decisions are the jit'd device part
(MorseModem.detect); run-length timing and table lookup are a tiny host state
machine (MorseDecoder.feed) — the analog of the reference's consumer-thread
character assembly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.modem.morse_code import MORSE_TO_CHAR
from pebblesdr_tpu.ops import goertzel


class MorseModem:
    """Device side: complex demod-rate input [C, N] -> mark booleans [C, F]."""

    def __init__(self, sample_rate: float, tone_hz: float = 1000.0,
                 frame: int | None = None, wpm_hint: float = 20.0):
        # frame ~ 1/4 dot at the hinted WPM (dot = 1.2/wpm seconds)
        if frame is None:
            frame = max(8, int(1.2 / wpm_hint * sample_rate / 4))
        self.frame = int(frame)
        self.frame_rate = sample_rate / self.frame
        self.sample_rate = sample_rate
        self.tone_hz = tone_hz
        bins = [tone_hz, tone_hz - 2 * self.frame_rate / 2,
                tone_hz + 2 * self.frame_rate / 2]
        self.basis = jnp.asarray(goertzel.dft_vectors(bins, sample_rate, self.frame))
        self._detect = jax.jit(self._detect_impl)

    def init_state(self, channels: int) -> goertzel.OOKState:
        return goertzel.ook_init(channels)

    def detect(self, state: goertzel.OOKState, x: jax.Array):
        """x: [C, N] complex64 (N divisible by frame) -> (state', marks [C, F])."""
        return self._detect(state, x)

    def _detect_impl(self, state, x):
        frames = goertzel.frame_stream(x, self.frame)
        p = goertzel.goertzel_power(frames, self.basis)
        return goertzel.ook_detect(state, p[:, :, 0], p[:, :, 1], p[:, :, 2])


@dataclasses.dataclass
class MorseDecoder:
    """Host side: mark/space run-length -> characters, adaptive WPM.

    frames_per_unit tracks the dot length in frames (EWMA over classified
    dots/dashes — the reference's dot/dash threshold moving averages,
    morse.h:86-178)."""

    frame_rate: float
    wpm: float = 20.0
    _symbol: str = ""
    _text: str = ""
    _run_state: bool = False
    _run_len: int = 0

    def __post_init__(self):
        self.frames_per_unit = 1.2 / self.wpm * self.frame_rate

    @property
    def tracked_wpm(self) -> float:
        return 1.2 * self.frame_rate / self.frames_per_unit

    def feed(self, marks: np.ndarray) -> str:
        """marks: [F] bool frames.  Returns newly decoded text."""
        out = []
        for m in np.asarray(marks).astype(bool):
            if m == self._run_state:
                self._run_len += 1
                # very long space: flush pending word boundary
                if (not m) and self._run_len == int(7 * self.frames_per_unit):
                    out.append(self._finish_char(word_gap=True))
            else:
                out.append(self._end_run())
                self._run_state = bool(m)
                self._run_len = 1
        new = "".join(s for s in out if s)
        self._text += new
        return new

    def _end_run(self) -> str:
        u = self.frames_per_unit
        n = self._run_len
        if self._run_len == 0:
            return ""
        if self._run_state:  # mark ended: dot or dash
            if n < 2.0 * u:
                self._symbol += "."
                self.frames_per_unit += 0.1 * (n - self.frames_per_unit)
            else:
                self._symbol += "-"
                self.frames_per_unit += 0.1 * (n / 3.0 - self.frames_per_unit)
            return ""
        # space ended
        if n < 2.0 * u:
            return ""  # intra-character gap
        if n < 5.0 * u:
            return self._finish_char()
        return self._finish_char(word_gap=True)

    def _finish_char(self, word_gap: bool = False) -> str:
        ch = MORSE_TO_CHAR.get(self._symbol, "" if not self._symbol else "?")
        self._symbol = ""
        if word_gap and ch:
            return ch + " "
        if word_gap:
            return ""
        return ch

    def flush(self) -> str:
        s = self._end_run()
        s += self._finish_char()
        self._run_len = 0
        self._text += s
        return s

    @property
    def text(self) -> str:
        return self._text
