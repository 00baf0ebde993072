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
