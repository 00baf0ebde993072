"""End-to-end CW decode: MorseGenSource -> Goertzel OOK -> timing decoder
(the MorseGenDevice fixture-device test strategy, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.io import sources
from pebblesdr_tpu.modem.morse import MorseDecoder, MorseModem


class TestMorseRoundtrip:
    def _decode(self, text, wpm, snr_db=None, tone=1000.0, fs=8000):
        src = sources.MorseGenSource(
            fs, generators=((text, wpm, tone, 1.0),),
            noise_db=snr_db, seed=3)
        modem = MorseModem(fs, tone_hz=tone, wpm_hint=wpm)
        dec = MorseDecoder(frame_rate=modem.frame_rate, wpm=wpm)
        st = modem.init_state(1)
        n_blocks = 40
        blk = 40 * modem.frame
        for _ in range(n_blocks):
            x = src.read_block(blk)
            st, marks = modem.detect(st, jnp.asarray(x[None]))
            dec.feed(np.asarray(marks)[0])
            if text in dec.text:
                break
        dec.flush()
        return dec.text

    def test_clean_20wpm(self):
        got = self._decode("cq cq de n1ddy", 20.0)
        assert "cq cq de n1ddy" in got

    def test_clean_35wpm(self):
        got = self._decode("the quick brown fox", 35.0)
        assert "the quick brown fox" in got

    def test_noisy(self):
        # tone at 0 dB, noise at -20 dB total power
        got = self._decode("paris paris", 20.0, snr_db=-20.0)
        assert "paris paris" in got

    def test_fading_channel(self):
        """CW decode through slow QSB (20 dB fade depth at 0.25 Hz) with
        noise at -30 dB: the noise-squelch threshold (tied to the noise
        floor, not the fading signal) rides the fade (VERDICT round-1
        item 5 fixture — stated SNR: 30 dB at crest, 10 dB in the trough)."""
        fs, wpm, text = 8000, 20.0, "paris paris paris"
        src = sources.MorseGenSource(
            fs, generators=((text, wpm, 1000.0, 1.0, True),),
            noise_db=-30.0, seed=5, fade_hz=0.25, fade_depth_db=20.0)
        modem = MorseModem(fs, tone_hz=1000.0, wpm_hint=wpm,
                           threshold_mode="noise")
        dec = MorseDecoder(frame_rate=modem.frame_rate, wpm=wpm)
        st = modem.init_state(1)
        for _ in range(80):
            x = src.read_block(40 * modem.frame)
            st, marks = modem.detect(st, jnp.asarray(x[None]))
            dec.feed(np.asarray(marks)[0])
            if "paris paris" in dec.text:
                break
        assert "paris paris" in dec.text, dec.text

    def test_scenario_presets(self):
        """Named scenarios build; the 'single' scenario decodes cleanly."""
        assert set(sources.MORSE_SCENARIOS) >= {"ladder", "single", "fading",
                                                "weak", "pileup"}
        src = sources.MorseGenSource.from_scenario("single", 8000)
        modem = MorseModem(8000, tone_hz=1000.0, wpm_hint=20.0)
        dec = MorseDecoder(frame_rate=modem.frame_rate, wpm=20.0)
        st = modem.init_state(1)
        for _ in range(40):
            x = src.read_block(40 * modem.frame)
            st, marks = modem.detect(st, jnp.asarray(x[None]))
            dec.feed(np.asarray(marks)[0])
            if "pebble" in dec.text:
                break
        assert "pebble" in dec.text

    def test_pileup_compare_mode(self):
        """Three stations 150 Hz apart: compare mode's off-tone bins keep
        the 1 kHz station decodable despite the neighbors."""
        fs = 8000
        src = sources.MorseGenSource.from_scenario("pileup", fs, seed=2)
        modem = MorseModem(fs, tone_hz=1000.0, wpm_hint=22.0,
                           bandwidth_hz=75.0, threshold_mode="compare")
        dec = MorseDecoder(frame_rate=modem.frame_rate, wpm=22.0)
        st = modem.init_state(1)
        for _ in range(80):
            x = src.read_block(40 * modem.frame)
            st, marks = modem.detect(st, jnp.asarray(x[None]))
            dec.feed(np.asarray(marks)[0])
            if "de p1 k" in dec.text:
                break
        assert "de p1 k" in dec.text, dec.text


class TestNEstimation:
    def test_shortest_bit(self):
        from pebblesdr_tpu.ops import goertzel
        # 120 wpm morse: 10 ms dot at 8 ksps -> N <= 80 (goertzel.cpp:438-446)
        assert goertzel.est_n_for_shortest_bit(10.0, 8000) == 80

    def test_bin_bandwidth(self):
        from pebblesdr_tpu.ops import goertzel
        # 100 Hz bin at 8 ksps -> N >= 80
        assert goertzel.est_n_for_bin_bandwidth(100.0, 8000) == 80

    def test_choose_n_combines(self):
        from pebblesdr_tpu.ops import goertzel
        # timing cap wins when the bandwidth asks for a longer N
        assert goertzel.choose_n(8000, ms_shortest_bit=10.0,
                                 bandwidth_hz=50.0) == 80
        assert goertzel.choose_n(8000, ms_shortest_bit=40.0,
                                 bandwidth_hz=100.0) == 80

    def test_compare_bins(self):
        from pebblesdr_tpu.ops import goertzel
        lo, hi = goertzel.compare_bin_freqs(1000.0, 80, 8000.0)
        assert lo == 1000.0 - 75.0 and hi == 1000.0 + 75.0


class TestWpmTracking:
    def test_wpm_tracking(self):
        """Decoder hinted at 20 WPM still tracks a 28 WPM sender."""
        src = sources.MorseGenSource(8000, generators=(("hello hello hello", 28.0, 1000.0, 1.0),), noise_db=None)
        modem = MorseModem(8000, tone_hz=1000.0, wpm_hint=20.0)
        dec = MorseDecoder(frame_rate=modem.frame_rate, wpm=20.0)
        st = modem.init_state(1)
        for _ in range(60):
            x = src.read_block(40 * modem.frame)
            st, marks = modem.detect(st, jnp.asarray(x[None]))
            dec.feed(np.asarray(marks)[0])
        assert "hello" in dec.text
        assert abs(dec.tracked_wpm - 28.0) < 5.0
