"""TestBench: injection + tap capture behave like the reference's golden path."""

import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.chain.testbench import TestBench
from pebblesdr_tpu.demod.modes import DemodMode

FS, N = 512_000, 8192


class TestTestBench:
    def _rx(self):
        return Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                       mode=DemodMode.AM, taps=True,
                                       agc_mode="off"))

    def test_requires_taps(self):
        rx = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                     mode=DemodMode.AM))
        with pytest.raises(ValueError):
            TestBench(rx)

    def test_injected_tone_at_calibrated_level(self):
        """Inject a -40 dB tone into silence; the raw_iq tap spectrum must show
        it at -40 dB (the reference's calibrated-injection check)."""
        rx = self._rx()
        tb = TestBench(rx, inject=("tone", {"freq_hz": 100_000.0, "db": -40.0}))
        state = rx.init_state()
        params = rx.default_params(100_000.0)
        silence = jnp.zeros((1, N), jnp.complex64)
        for _ in range(4):
            state, _ = tb.step(state, params, silence)
        freqs, db = tb.tap_spectrum_db("raw_iq", FS)
        peak_idx = np.argmax(db)
        assert abs(freqs[peak_idx] - 100_000.0) < FS / 4096
        assert db[peak_idx] == pytest.approx(-40.0, abs=1.0)

    def test_noise_injection_floor(self):
        rx = self._rx()
        tb = TestBench(rx, inject=("noise", {"db": -60.0}))
        state = rx.init_state()
        params = rx.default_params(0.0)
        silence = jnp.zeros((1, N), jnp.complex64)
        for _ in range(4):
            state, _ = tb.step(state, params, silence)
        x = tb.tap("raw_iq")[0]
        total_db = 10 * np.log10(np.mean(np.abs(x) ** 2))
        assert total_db == pytest.approx(-60.0, abs=1.0)

    def test_taps_flow_through_chain(self):
        rx = self._rx()
        tb = TestBench(rx, inject=("tone", {"freq_hz": 100_000.0, "db": -20.0}))
        state = rx.init_state()
        params = rx.default_params(100_000.0)
        for _ in range(3):
            state, out = tb.step(state, params, jnp.zeros((1, N), jnp.complex64))
        assert set(tb.history) >= {"raw_iq", "post_mixer", "post_bp",
                                   "post_demod", "audio"}
        # post_mixer: tone tuned to DC -> energy concentrated near 0 Hz
        freqs, db = tb.tap_spectrum_db("post_mixer", rx.demod_rate)
        assert abs(freqs[np.argmax(db)]) < rx.demod_rate / 1024

    def test_save(self, tmp_path):
        rx = self._rx()
        tb = TestBench(rx, inject=("sweep", {"start_hz": -100e3, "stop_hz": 100e3,
                                             "rate_hz_per_sec": 1e7, "db": -30.0}))
        state = rx.init_state()
        params = rx.default_params(0.0)
        state, _ = tb.step(state, params, jnp.zeros((1, N), jnp.complex64))
        p = str(tmp_path / "taps.npz")
        tb.save(p)
        data = np.load(p)
        assert "raw_iq_re" in data and "audio" in data


class TestNfmVariants:
    def test_derivative_matches_conj(self):
        from pebblesdr_tpu.demod import nfm

        fs = 48000.0
        t = np.arange(16384) / fs
        mod = np.sin(2 * np.pi * 700 * t)
        phase = 2 * np.pi * np.cumsum(3000.0 * mod) / fs
        x = np.exp(1j * phase).astype(np.complex64)[None]
        outs = {}
        for alg in ("conj", "derivative"):
            cfg = nfm.NFMConfig.make(fs, algorithm=alg)
            st = nfm.nfm_init(cfg, 1)
            st, audio = nfm.nfm_demod(cfg, st, jnp.asarray(x))
            outs[alg] = np.asarray(audio)[0][2000:]
        # small-deviation: derivative form ~ conj form
        corr = np.corrcoef(outs["conj"], outs["derivative"])[0, 1]
        assert corr > 0.99


class TestTriggeredCapture:
    """Scope-style trigger modes (testbench.h:79-233 capability)."""

    def test_rising_edge_normal_mode(self):
        from pebblesdr_tpu.chain.testbench import TriggeredCapture

        fs = 48000.0
        t = np.arange(8192) / fs
        sig = np.sin(2 * np.pi * 100.0 * t).astype(np.float32)  # ~17 cycles
        tc = TriggeredCapture(mode="normal", level=0.5, slope="rising",
                              n_pre=64, n_post=256)
        for i in range(0, len(sig), 1024):
            tc.feed(sig[i:i + 1024])
        assert len(tc.captures) >= 10
        for cap in tc.captures:
            # the trigger sample crosses the level upward
            assert cap[tc.n_pre - 1] < 0.5 <= cap[tc.n_pre]
            assert len(cap) == 64 + 256

    def test_falling_edge(self):
        from pebblesdr_tpu.chain.testbench import TriggeredCapture

        sig = np.sin(2 * np.pi * np.arange(4096) / 256.0).astype(np.float32)
        tc = TriggeredCapture(mode="normal", level=-0.2, slope="falling",
                              n_pre=32, n_post=64)
        tc.feed(sig)
        assert tc.captures
        for cap in tc.captures:
            assert cap[tc.n_pre - 1] >= -0.2 > cap[tc.n_pre]

    def test_single_mode_fires_once_until_rearm(self):
        from pebblesdr_tpu.chain.testbench import TriggeredCapture

        sig = np.sin(2 * np.pi * np.arange(4096) / 128.0).astype(np.float32)
        tc = TriggeredCapture(mode="single", level=0.0, n_pre=16, n_post=32)
        tc.feed(sig)
        assert len(tc.captures) == 1
        tc.feed(sig)
        assert len(tc.captures) == 1
        tc.rearm()
        tc.feed(sig)
        assert len(tc.captures) == 2

    def test_trigger_spanning_block_boundary(self):
        from pebblesdr_tpu.chain.testbench import TriggeredCapture

        # single rising step near a block edge: post-window arrives in the
        # NEXT feed and the capture must still fire exactly once
        sig = np.zeros(2048, np.float32)
        sig[1000:] = 1.0
        tc = TriggeredCapture(mode="normal", level=0.5, n_pre=100,
                              n_post=200)
        n1 = tc.feed(sig[:1050])
        n2 = tc.feed(sig[1050:])
        assert n1 + n2 == 1
        cap = tc.captures[0]
        assert cap[tc.n_pre - 1] < 0.5 <= cap[tc.n_pre]

    def test_complex_tap_triggers_on_real(self):
        from pebblesdr_tpu.chain.testbench import TriggeredCapture

        x = (np.exp(2j * np.pi * np.arange(2048) / 256.0)
             ).astype(np.complex64)
        tc = TriggeredCapture(mode="normal", level=0.0, n_pre=8, n_post=16)
        tc.feed(x)
        assert tc.captures and np.iscomplexobj(tc.captures[0])


class TestPresetsData:
    def test_shipped_station_db_loads(self):
        from pebblesdr_tpu.utils import settings

        st = settings.load_stations()
        assert len(st) >= 40
        wwv = [p for p in st if p.name.startswith("WWV ")]
        assert any(p.freq_hz == 10_000_000 for p in wwv)
        mem = settings.load_memory()
        assert any(p.mode == "FM-Stereo" for p in mem)

    def test_stations_near_window(self):
        from pebblesdr_tpu.utils import settings

        st = settings.load_stations()
        # a 2.048 MHz capture centered at 10 MHz sees WWV/BPM 10 MHz
        near = settings.stations_near(st, 10e6, 2.048e6)
        assert near and all(abs(p.freq_hz - 10e6) <= 1.024e6 for p in near)
        assert any("WWV" in p.name for p in near)

    def test_eibi_import(self, tmp_path):
        from pebblesdr_tpu.utils import settings

        p = tmp_path / "sked.csv"
        p.write_text(
            "kHz:75;Time(UTC);Days;ITU;Station;Lng;Target;Remarks\n"
            "5930;0000-2400;;CZE;Radio Prague Int.;Cz;Eu;\n"
            "9420;0500-2200;;GRC;Voice of Greece;Gr;Eu;\n"
            "bogus;;;;not a row;;;\n", encoding="latin-1")
        rows = settings.import_eibi_csv(str(p))
        assert len(rows) == 2
        assert rows[0].name == "Radio Prague Int."
        assert rows[0].freq_hz == 5_930_000.0
        rows_cz = settings.import_eibi_csv(str(p), langs=("Cz",))
        assert len(rows_cz) == 1
