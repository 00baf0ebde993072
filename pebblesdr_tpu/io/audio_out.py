"""Audio output factory: demodulated audio -> file / pipe / null sinks.

Capability parity with Audio/AudioQT/AudioPA (pebblelib/audio.{h,cpp}
factory, audioqt.cpp, audiopa.cpp: StartOutput(dev, rate) +
SendToOutput(buf, n, gain, mute)): same surface, with sinks that make sense
on a headless TPU host — WAV file, raw-PCM pipe to an external player
(aplay/ffplay when present), and null.  No sound-card stack is reimplemented
(SURVEY §2.5: vendored portaudio not reimplemented).
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np


class AudioOutput:
    """SendToOutput surface (audio.h:27 capability)."""

    def start(self, rate: int, channels: int = 1) -> None:
        raise NotImplementedError

    def send(self, audio: np.ndarray, gain: float = 1.0, mute: bool = False) -> None:
        raise NotImplementedError

    def stop(self) -> None:
        pass


class NullOutput(AudioOutput):
    def __init__(self):
        self.samples_sent = 0

    def start(self, rate: int, channels: int = 1) -> None:
        self.rate = rate

    def send(self, audio, gain=1.0, mute=False) -> None:
        self.samples_sent += np.asarray(audio).shape[-1]


class WavOutput(AudioOutput):
    def __init__(self, path: str):
        self.path = path
        self._chunks: list[np.ndarray] = []

    def start(self, rate: int, channels: int = 1) -> None:
        self.rate = rate
        self.channels = channels

    def send(self, audio, gain=1.0, mute=False) -> None:
        a = np.asarray(audio, np.float32)
        if mute:
            a = np.zeros_like(a)
        self._chunks.append(a * gain)

    def stop(self) -> None:
        from pebblesdr_tpu.io import wav

        if self._chunks:
            wav.write_audio_wav(self.path, np.concatenate(self._chunks, axis=-1),
                                self.rate)


class PipeOutput(AudioOutput):
    """Pipe float32 PCM into an external player (aplay/ffplay/custom cmd)."""

    def __init__(self, command: list[str] | None = None):
        self.command = command
        self.proc: subprocess.Popen | None = None

    def start(self, rate: int, channels: int = 1) -> None:
        cmd = self.command
        if cmd is None:
            if shutil.which("aplay"):
                cmd = ["aplay", "-q", "-f", "FLOAT_LE", "-r", str(rate),
                       "-c", str(channels)]
            elif shutil.which("ffplay"):
                cmd = ["ffplay", "-nodisp", "-loglevel", "quiet", "-f", "f32le",
                       "-ar", str(rate), "-ch_layout",
                       "mono" if channels == 1 else "stereo", "-i", "pipe:0"]
            else:
                raise RuntimeError("no audio player found (aplay/ffplay)")
        self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)

    def send(self, audio, gain=1.0, mute=False) -> None:
        a = np.asarray(audio, np.float32) * (0.0 if mute else gain)
        if a.ndim == 2:  # [channels, n] -> interleaved
            a = a.T.reshape(-1)
        self.proc.stdin.write(a.astype("<f4").tobytes())

    def stop(self) -> None:
        if self.proc:
            self.proc.stdin.close()
            self.proc.wait(timeout=5)


def factory(kind: str = "null", **kwargs) -> AudioOutput:
    """Audio::Factory analog: 'null' | 'wav' | 'pipe'."""
    if kind == "null":
        return NullOutput()
    if kind == "wav":
        return WavOutput(**kwargs)
    if kind == "pipe":
        return PipeOutput(**kwargs)
    raise ValueError(kind)
