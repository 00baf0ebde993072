"""Robustness: multi-channel WFM batching, long-run state stability,
dB-offset calibration."""

import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.demod.modes import DemodMode

FS, N = 2_048_000, 32768


class TestMultiChannelWFM:
    def test_three_stereo_channels(self):
        """Three channels tuned to three different FM stations recover their
        own audio — catches batching bugs in the pilot PLL / demux path."""
        c = 3
        nb = 16
        t = np.arange(nb * N) / FS
        stations = [-700_000.0, 0.0, 700_000.0]
        tones = [800.0, 1500.0, 2500.0]
        capture = np.zeros(nb * N, np.complex64)
        for f0, tone in zip(stations, tones):
            comp = (0.45 * np.sin(2 * np.pi * tone * t)
                    + 0.1 * np.sin(2 * np.pi * 19000.0 * t))
            phase = 2 * np.pi * np.cumsum(75000.0 * comp) / FS
            capture += (0.4 * np.exp(1j * (2 * np.pi * f0 * t + phase))
                        ).astype(np.complex64)
        iq = np.broadcast_to(capture, (c, nb * N)).copy()

        rx = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                     channels=c, mode=DemodMode.FMS))
        state = rx.init_state()
        params = rx.default_params(stations)
        outs = []
        for i in range(nb):
            state, out = rx.step(state, params,
                                 jnp.asarray(iq[:, i * N:(i + 1) * N]))
            outs.append(np.asarray(out["audio"]))
        audio = np.concatenate(outs, axis=-1)[:, :, 8 * rx.audio_blk:]

        def amp(x, f):
            tt = np.arange(x.shape[-1]) / 48000.0
            b = np.stack([np.cos(2 * np.pi * f * tt),
                          np.sin(2 * np.pi * f * tt)])
            coef, *_ = np.linalg.lstsq(b.T, x, rcond=None)
            return float(np.hypot(*coef))

        for ch, tone in enumerate(tones):
            own = amp(audio[ch, 0], tone)
            other = max(amp(audio[ch, 0], tones[(ch + 1) % c]),
                        amp(audio[ch, 0], tones[(ch + 2) % c]))
            assert own > 0.25, f"ch{ch} lost its audio"
            assert own / max(other, 1e-9) > 10, f"ch{ch} cross-talk"


class TestLongRunStability:
    def test_no_drift_or_nans_over_many_blocks(self):
        """Stream 100 blocks: all outputs finite, carried phases stay bounded,
        audio level steady (float32 carry-state does not degrade)."""
        rx = Receiver(ReceiverConfig(sample_rate=512_000, frames_per_buffer=8192,
                                     mode=DemodMode.AM, agc_mode="off"))
        state = rx.init_state()
        params = rx.default_params(123_456.0)
        t0 = np.arange(8192) / 512_000
        rms = []
        import pebblesdr_tpu.core.siggen as sg
        for i in range(100):
            t = t0 + i * 8192 / 512_000
            env = (1 + 0.5 * np.cos(2 * np.pi * 700.0 * t)) / 2
            iq = (0.5 * env * np.exp(2j * np.pi * 123_456.0 * t)
                  ).astype(np.complex64)[None]
            state, out = rx.step(state, params, jnp.asarray(iq))
            a = np.asarray(out["audio"])
            assert np.all(np.isfinite(a)), f"NaN at block {i}"
            rms.append(float(np.sqrt(np.mean(a**2))))
        # mixer phase bounded in [0, 1)
        ph = float(np.asarray(state.mixer.phase)[0])
        assert 0.0 <= ph < 1.0
        # steady-state level stable to 1% over the last 50 blocks
        tail = np.asarray(rms[50:])
        assert tail.std() / tail.mean() < 0.01


class TestDbOffset:
    def test_offset_shifts_spectrum_not_snr(self):
        iqt = np.exp(2j * np.pi * 100_000.0 * np.arange(8192) / 512_000)
        iq = (0.5 * iqt).astype(np.complex64)[None]
        outs = {}
        for off in (0.0, 10.0):
            rx = Receiver(ReceiverConfig(sample_rate=512_000,
                                         frames_per_buffer=8192,
                                         mode=DemodMode.AM, db_offset=off))
            state = rx.init_state()
            state, out = rx.step(state, rx.default_params(100_000.0),
                                 jnp.asarray(iq))
            outs[off] = out
        peak0 = float(np.max(np.asarray(outs[0.0]["spectrum"])))
        peak10 = float(np.max(np.asarray(outs[10.0]["spectrum"])))
        assert peak10 - peak0 == pytest.approx(10.0, abs=0.1)
        snr0 = float(np.asarray(outs[0.0]["smeter"]["snr_db"])[0])
        snr10 = float(np.asarray(outs[10.0]["smeter"]["snr_db"])[0])
        assert snr0 == pytest.approx(snr10, abs=0.2)
