"""Whole-chain parity vs the independent scipy golden (tools/parity_harness):
the float32 JAX chain must match the float64 scipy implementation of the same
receive math to >60 dB after linear-filter equalization (SURVEY.md §4b)."""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools import parity_harness as ph  # noqa: E402


class TestWholeChainParity:
    def test_am_chain_vs_scipy_golden(self, tmp_path):
        import jax
        import jax.numpy as jnp  # noqa: F401

        fs = 2_048_000
        secs = 1.0
        t = np.arange(int(fs * secs)) / fs
        env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
        iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64)
        rng = np.random.default_rng(0)
        iq += (1e-3 * (rng.standard_normal(len(t))
                       + 1j * rng.standard_normal(len(t)))).astype(np.complex64)

        from pebblesdr_tpu.demod.modes import DemodMode

        got, rx = ph.run_chain(iq, fs, DemodMode.AM, 250_000.0, 32768)
        golden = ph.scipy_golden(iq, fs, 250_000.0, DemodMode.AM,
                                 rx.info.lo_cut, rx.info.hi_cut,
                                 rx.info.max_output_bw,
                                 rx.cfg.audio_rate, rx.blk)
        snr = ph.snr_db(golden, got.astype(np.float64),
                        skip=rx.cfg.audio_rate // 2)
        assert snr > 60.0, f"parity SNR {snr:.1f} dB"

    def test_usb_chain_vs_scipy_golden(self):
        from pebblesdr_tpu.demod.modes import DemodMode

        fs = 2_048_000
        t = np.arange(int(fs * 1.0)) / fs
        # two-tone USB voice-band signal at +400 kHz
        iq = (0.3 * np.exp(2j * np.pi * (400_000.0 + 700.0) * t)
              + 0.2 * np.exp(2j * np.pi * (400_000.0 + 1900.0) * t)
              ).astype(np.complex64)
        got, rx = ph.run_chain(iq, fs, DemodMode.USB, 400_000.0, 32768)
        golden = ph.scipy_golden(iq, fs, 400_000.0, DemodMode.USB,
                                 rx.info.lo_cut, rx.info.hi_cut,
                                 rx.info.max_output_bw,
                                 rx.cfg.audio_rate, rx.blk)
        snr = ph.snr_db(golden, got.astype(np.float64),
                        skip=rx.cfg.audio_rate // 4)
        assert snr > 60.0, f"USB parity SNR {snr:.1f} dB"

    def test_nfm_chain_vs_scipy_golden(self):
        from pebblesdr_tpu.demod.modes import DemodMode

        fs = 2_048_000
        t = np.arange(int(fs * 1.0)) / fs
        # NFM voice tone: 1 kHz at 3 kHz deviation, carrier at +150 kHz
        ph_mod = 2 * np.pi * np.cumsum(
            3000.0 * np.sin(2 * np.pi * 1000.0 * t)) / fs
        iq = (0.5 * np.exp(1j * (2 * np.pi * 150_000.0 * t + ph_mod))
              ).astype(np.complex64)
        got, rx = ph.run_chain(iq, fs, DemodMode.FMN, 150_000.0, 32768)
        golden = ph.scipy_golden_nfm(iq, fs, 150_000.0, rx)
        snr = ph.snr_db(golden, got.astype(np.float64),
                        skip=rx.cfg.audio_rate // 2)
        assert snr > 60.0, f"NFM parity SNR {snr:.1f} dB"

    def test_sam_chain_vs_scipy_golden(self):
        from pebblesdr_tpu.demod.modes import DemodMode

        fs = 2_048_000
        t = np.arange(int(fs * 1.0)) / fs
        # AM at +250.2 kHz, tuned to 250.0 kHz: the PLL must pull in 200 Hz
        env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
        iq = (0.5 * env * np.exp(2j * np.pi * 250_200.0 * t)
              ).astype(np.complex64)
        got, rx = ph.run_chain(iq, fs, DemodMode.SAM, 250_000.0, 32768)
        golden = ph.scipy_golden_sam(iq, fs, 250_000.0, rx)
        snr = ph.snr_db(golden, got.astype(np.float64),
                        skip=rx.cfg.audio_rate // 2)  # PLL pull-in + DC settle
        assert snr > 55.0, f"SAM parity SNR {snr:.1f} dB"

    def test_wfm_stereo_chain_vs_scipy_golden(self):
        from pebblesdr_tpu.demod.modes import DemodMode

        fs = 2_048_000
        secs = 1.0
        t = np.arange(int(fs * secs)) / fs
        # stereo composite: L-only 1 kHz (mono + L-R both carry it); the
        # 38 kHz subcarrier is PHASE-COHERENT with the sin pilot (sin(2θ) —
        # the broadcast convention; a quadrature cos subcarrier is not a
        # valid stereo signal and demuxes to zero in any correct receiver)
        th = 2 * np.pi * 19000.0 * t
        comp = (0.45 * np.sin(2 * np.pi * 1000.0 * t)
                + 0.1 * np.sin(th)
                + 0.45 * np.sin(2 * np.pi * 1000.0 * t) * np.sin(2 * th))
        phm = 2 * np.pi * np.cumsum(75000.0 * comp) / fs
        iq = (0.5 * np.exp(1j * (2 * np.pi * 300_000.0 * t + phm))
              ).astype(np.complex64)
        got, rx = ph.run_chain(iq, fs, DemodMode.FMS, 300_000.0, 32768)
        left = got[0] if got.ndim == 2 else got
        golden, golden_r = ph.scipy_golden_wfm(iq, fs, 300_000.0, rx,
                                               stereo=True,
                                               return_stereo=True)

        # the GOLDEN must itself demux stereo (L-only -> quiet R); without
        # this the parity equalizer can mask demux errors (VERDICT r2 item 8)
        def tone_amp(x):
            tt = np.arange(len(x)) / rx.cfg.audio_rate
            a = np.stack([np.sin(2 * np.pi * 1000 * tt),
                          np.cos(2 * np.pi * 1000 * tt),
                          np.ones(len(x))], 1)
            c, *_ = np.linalg.lstsq(a, x, rcond=None)
            return float(np.hypot(c[0], c[1]))

        half = len(golden) // 2
        g_sep = 20 * np.log10(tone_amp(golden[half:])
                              / max(tone_amp(golden_r[half:]), 1e-12))
        # ~33 dB measured: the 256 kHz Carson-band front (which the golden
        # shares — it is the geometry under test) caps separation near
        # 35 dB regardless of demux quality; a broken demux reads ~0 dB
        assert g_sep > 30.0, f"golden separation {g_sep:.1f} dB"
        snr = ph.snr_db(golden, left.astype(np.float64),
                        skip=rx.cfg.audio_rate // 2)
        # fully independent golden (own LP design, analytic-signal pilot):
        # measured 90+ dB — same class as the NFM/SAM goldens
        assert snr > 70.0, f"WFM stereo parity SNR {snr:.1f} dB"
