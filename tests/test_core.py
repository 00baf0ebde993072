import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.core import db, iqformat, siggen, windows


class TestWindows:
    def test_hann_coherent_gain(self):
        w = windows.window(windows.WindowType.HANNING, 1024)
        assert windows.coherent_gain(w) == pytest.approx(0.5, abs=1e-3)

    def test_hann_enbw(self):
        w = windows.window(windows.WindowType.HANNING, 4096)
        assert windows.enbw(w) == pytest.approx(1.5, abs=1e-2)

    def test_rectangular(self):
        w = windows.window(windows.WindowType.RECTANGULAR, 128)
        assert np.all(w == 1.0)

    def test_blackman_harris_sidelobes(self):
        n = 1024
        w = windows.window(windows.WindowType.BLACKMAN_HARRIS, n)
        spec = np.abs(np.fft.fft(w, 16 * n))
        spec /= spec[0]
        sidelobe = np.max(spec[16 * 8:8 * n])  # away from main lobe
        assert 20 * np.log10(sidelobe) < -90  # BH -92 dB sidelobes


class TestDB:
    def test_roundtrip(self):
        assert float(db.db_to_power(db.power_to_db(0.5))) == pytest.approx(0.5, rel=1e-5)

    def test_amplitude(self):
        assert float(db.amplitude_to_db(0.1)) == pytest.approx(-20.0, abs=1e-4)

    def test_s_units(self):
        assert float(db.db_to_s_units(-73.0)) == pytest.approx(9.0)
        assert float(db.db_to_s_units(-79.0)) == pytest.approx(8.0)


class TestIQFormat:
    def test_u8_decode(self):
        raw = np.array([128, 128, 255, 0], dtype=np.uint8)
        x = iqformat.decode_iq(jnp.asarray(raw), "u8")
        np.testing.assert_allclose(np.asarray(x), [0 + 0j, 0.9921875 - 1j], atol=1e-6)

    def test_i16_decode_swap(self):
        raw = np.array([16384, -16384], dtype=np.int16)
        x = iqformat.decode_iq(jnp.asarray(raw), "i16", swap_iq=True)
        np.testing.assert_allclose(np.asarray(x), [-0.5 + 0.5j], atol=1e-6)

    def test_host_matches_device(self):
        rng = np.random.default_rng(0)
        raw = rng.integers(-32768, 32767, 64, dtype=np.int16)
        a = iqformat.decode_iq_host(raw.tobytes(), "i16")
        b = np.asarray(iqformat.decode_iq(jnp.asarray(raw), "i16"))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_u8_encode_roundtrip(self):
        x = (np.linspace(-0.9, 0.9, 32) + 1j * np.linspace(0.9, -0.9, 32)).astype(np.complex64)
        enc = iqformat.encode_iq_u8(x)
        back = iqformat.decode_iq_host(enc, "u8")
        np.testing.assert_allclose(back, x, atol=1 / 64)


class TestSigGen:
    def test_tone_block_continuity(self):
        st = siggen.tone_init()
        st1, a = siggen.tone(st, 512, 1000.0, 48000.0)
        st2, b = siggen.tone(st1, 512, 1000.0, 48000.0)
        _, full = siggen.tone(siggen.tone_init(), 1024, 1000.0, 48000.0)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(a), np.asarray(b)]), np.asarray(full),
            atol=2e-3)

    def test_tone_frequency(self):
        _, y = siggen.tone(siggen.tone_init(), 4800, 1000.0, 48000.0)
        spec = np.abs(np.fft.fft(np.asarray(y)))
        assert np.argmax(spec) == 100  # 1000 Hz = bin 100 at 4800 pts/48k

    def test_noise_power(self):
        y = siggen.noise(jax.random.key(0), 1 << 16, db_level=-20.0)
        p = float(jnp.mean(jnp.abs(y) ** 2))
        assert 10 * np.log10(p) == pytest.approx(-20.0, abs=0.3)

    def test_sweep_pulse(self):
        st = siggen.sweep_init(100.0)
        _, y = siggen.sweep(st, 256, 100.0, 2000.0, 1e5, 48000.0,
                            pulse_on_samples=32, pulse_period_samples=64)
        y = np.asarray(y)
        assert np.all(np.abs(y[32:64]) == 0)
        assert np.all(np.abs(y[:32]) > 0.99)
