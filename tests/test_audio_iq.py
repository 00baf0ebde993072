"""AudioIqSource — the soundcard audio-IQ device class (FunCube/SoftRock
transport, deviceinterfacebase.h:100-112).  The hardware stream is faked
via the stream_factory hook (WavStream); the PortAudio input path shares
the audio_out ctypes binding and raises clearly when libportaudio is
absent."""

import numpy as np
import pytest

from pebblesdr_tpu.io.audio_iq import AudioIqSource, WavStream
from pebblesdr_tpu.io import registry


def _tone_frames(fs=96000, f=12000.0, secs=0.25, phase=0.0):
    t = np.arange(int(fs * secs)) / fs
    i = np.cos(2 * np.pi * f * t + phase).astype(np.float32)
    q = np.sin(2 * np.pi * f * t + phase).astype(np.float32)
    return np.stack([i, q], axis=1)


def _peak_freq(iq, fs):
    sp = np.abs(np.fft.fft(iq * np.hanning(len(iq))))
    freqs = np.fft.fftfreq(len(iq), 1 / fs)
    return freqs[np.argmax(sp)]


class TestAudioIqSource:
    def test_tone_loopback(self):
        fs, f = 96000, 12000.0
        src = AudioIqSource(sample_rate=fs,
                            stream_factory=lambda: WavStream(_tone_frames(fs, f)))
        blk = src.read_block(8192)
        assert blk.dtype == np.complex64
        assert len(blk) == 8192
        # I=cos, Q=sin -> analytic e^{j2pi f t}: positive-frequency tone
        assert abs(_peak_freq(blk, fs) - f) < fs / 8192 * 2
        # amplitude preserved
        assert abs(np.abs(blk).mean() - 1.0) < 1e-3

    def test_order_swap_mirrors_spectrum(self):
        fs, f = 96000, 12000.0
        src = AudioIqSource(sample_rate=fs, order="qi",
                            stream_factory=lambda: WavStream(_tone_frames(fs, f)))
        blk = src.read_block(8192)
        # swapped rails conjugate the tone: peak at -f
        assert abs(_peak_freq(blk, fs) + f) < fs / 8192 * 2

    def test_i_only_and_q_only(self):
        fs = 96000
        frames = _tone_frames(fs, 8000.0)
        for order in ("i", "q"):
            src = AudioIqSource(sample_rate=fs, order=order,
                                stream_factory=lambda: WavStream(frames))
            blk = src.read_block(4096)
            assert np.allclose(blk.real, blk.imag)

    def test_gain_and_balance(self):
        fs = 96000
        src = AudioIqSource(sample_rate=fs, gain=0.5, balance_gain=1.1,
                            balance_phase=0.02, apply_balance=True,
                            stream_factory=lambda: WavStream(
                                _tone_frames(fs, 5000.0)))
        blk = src.read_block(4096)
        raw = _tone_frames(fs, 5000.0)[:4096] * 0.5
        expect_q = raw[:, 1] * 1.1 + raw[:, 0] * 0.02
        np.testing.assert_allclose(blk.real, raw[:, 0], atol=1e-6)
        np.testing.assert_allclose(blk.imag, expect_q, atol=1e-6)

    def test_standard_keys_surface(self):
        src = AudioIqSource(sample_rate=48000,
                            stream_factory=lambda: WavStream(
                                np.zeros((64, 2), np.float32)))
        assert src.get("iq_order") == "iq"
        src.set("iq_balance_gain", 1.05)
        src.set("iq_balance_phase", -0.01)
        assert src.get("iq_balance_gain") == 1.05
        assert src.get("iq_balance_phase") == -0.01
        with pytest.raises(ValueError):
            src.set("iq_order", "bogus")

    def test_registry_create(self):
        src = registry.create(
            "audio", sample_rate=48000,
            stream_factory=lambda: WavStream(np.zeros((256, 2), np.float32)))
        assert isinstance(src, AudioIqSource)
        assert "audio" in registry.available()

    def test_wavstream_end_of_stream(self):
        src = AudioIqSource(sample_rate=48000,
                            stream_factory=lambda: WavStream(
                                np.ones((100, 2), np.float32), loop=False))
        b1 = src.read_block(64)
        assert len(b1) == 64
        b2 = src.read_block(64)  # only 36 left
        assert b2 is None or len(b2) <= 36
        assert src.read_block(64) is None

    def test_missing_portaudio_is_clear(self):
        import ctypes.util

        if ctypes.util.find_library("portaudio"):
            pytest.skip("libportaudio present on this host")
        with pytest.raises(RuntimeError, match="portaudio"):
            AudioIqSource(sample_rate=48000)

    def test_chain_demodulates_audio_iq(self):
        """Loopback through the receive chain: an AM station synthesized as
        the stereo capture stream must demodulate end-to-end."""
        import jax
        import jax.numpy as jnp

        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode

        fs = 256_000
        t = np.arange(int(fs * 1.0)) / fs
        env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
        iq = 0.5 * env * np.exp(2j * np.pi * 40_000.0 * t)
        frames = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
        src = AudioIqSource(sample_rate=fs,
                            stream_factory=lambda: WavStream(frames))
        cfg = ReceiverConfig(sample_rate=fs, frames_per_buffer=16384,
                             mode=DemodMode.AM, agc_mode="off")
        rx = Receiver(cfg)
        state = jax.jit(lambda: rx.init_state())()
        params = rx.default_params(40_000.0)
        outs = []
        for blk in src.blocks(16384, max_blocks=12):
            ri = np.stack([blk.real, blk.imag]).astype(np.float32)[None]
            state, out = rx.step(state, params, jax.lax.complex(
                jnp.asarray(ri[:, 0]), jnp.asarray(ri[:, 1])))
            outs.append(np.asarray(out["audio"])[0])
        audio = np.concatenate(outs, axis=-1)
        ar = cfg.audio_rate
        tail = audio[len(audio) // 2:]
        tt = np.arange(len(tail)) / ar
        a = np.stack([np.sin(2 * np.pi * 1000 * tt),
                      np.cos(2 * np.pi * 1000 * tt)], 1)
        c, *_ = np.linalg.lstsq(a, tail, rcond=None)
        amp = np.hypot(c[0], c[1])
        assert amp > 0.15, f"AM tone not recovered from audio-IQ: {amp:.3f}"