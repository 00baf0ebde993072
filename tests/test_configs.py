"""Configuration-space robustness: every mode x option combination builds,
compiles and runs one block (catches geometry/planner regressions broadly),
plus SAM sideband-mix behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.demod.modes import MODE_INFO, DemodMode


ALL_MODES = [m for m in DemodMode if m != DemodMode.NONE]


class TestAllConfigsRun:
    @pytest.mark.parametrize("mode", ALL_MODES)
    def test_mode_builds_and_steps(self, mode):
        fs, n = 2_048_000, 32768
        cfg = ReceiverConfig(sample_rate=fs, frames_per_buffer=n, channels=2,
                             mode=mode, rds=(mode == DemodMode.FMS))
        rx = Receiver(cfg)
        t = np.arange(n) / fs
        iq = np.broadcast_to(
            (0.3 * np.exp(2j * np.pi * 100_000.0 * t)).astype(np.complex64),
            (2, n)).copy()
        state = rx.init_state()
        state, out = rx.step(state, rx.default_params(100_000.0),
                             jnp.asarray(iq))
        assert np.all(np.isfinite(np.asarray(out["audio"])))

    @pytest.mark.parametrize("opts", [
        dict(enable_noise_blanker=True),
        dict(enable_iq_balance=True),
        dict(enable_anf=True),
        dict(taps=True),
        dict(agc_mode="long"),
        dict(agc_mode="fast", agc_stride=8),
    ])
    def test_option_combination(self, opts):
        fs, n = 512_000, 8192
        cfg = ReceiverConfig(sample_rate=fs, frames_per_buffer=n,
                             mode=DemodMode.AM, **opts)
        rx = Receiver(cfg)
        t = np.arange(n) / fs
        iq = (0.3 * np.exp(2j * np.pi * 100_000.0 * t)).astype(np.complex64)[None]
        state = rx.init_state()
        state, out = rx.step(state, rx.default_params(100_000.0),
                             jnp.asarray(iq))
        assert np.all(np.isfinite(np.asarray(out["audio"])))

    def test_bad_frames_rejected(self):
        with pytest.raises(ValueError, match="not divisible"):
            Receiver(ReceiverConfig(sample_rate=2_048_000,
                                    frames_per_buffer=1000,
                                    mode=DemodMode.AM))


class TestSamStereoMix:
    def test_sideband_separation(self):
        """USB-only content: R = hi-lo equals +mono; LSB-only: R = -mono."""
        from pebblesdr_tpu.demod import sam

        fs = 32000.0
        cfg = sam.SAMConfig.make(fs, bandwidth=10000.0)
        t = np.arange(32768) / fs
        for sideband, sign in [(+1, +1.0), (-1, -1.0)]:
            # carrier + single sideband tone at 1 kHz
            x = (1.0 + 0.5 * np.exp(sideband * 2j * np.pi * 1000.0 * t)
                 ).astype(np.complex64)[None]
            st = sam.sam_init(cfg, 1)
            for _ in range(2):
                st, mono, left, right = sam.sam_demod_stereo(cfg, st, jnp.asarray(x))
            m = np.asarray(mono)[0][4096:]
            r = np.asarray(right)[0][4096:]
            corr = np.corrcoef(m, r)[0, 1]
            assert corr * sign > 0.9, f"sideband {sideband}: corr {corr}"
