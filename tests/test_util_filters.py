import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from pebblesdr_tpu.ops import iir, util_filters as uf


class TestMovingAvg:
    def test_uniform_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 200)).astype(np.float32)
        y, _ = uf.moving_avg(jnp.asarray(x), 8)
        ext = np.concatenate([np.zeros((1, 7), np.float32), x], axis=1)
        ref = np.stack([np.convolve(ext[0], np.ones(8) / 8, mode="valid")])
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)

    def test_weighted(self):
        x = jnp.ones((1, 16))
        w = jnp.asarray([1.0, 2.0, 3.0])
        y, _ = uf.moving_avg(x, 3, weights=w)
        # steady state: weighted mean of ones == 1
        assert float(y[0, -1]) == pytest.approx(1.0, abs=1e-6)

    def test_variance(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 500)).astype(np.float32)
        m, var, std = uf.moving_variance(jnp.asarray(x), 100)
        assert float(var[0, -1]) == pytest.approx(np.var(x[0, -100:]), rel=0.05)


class TestMedian:
    def test_impulse_rejected(self):
        x = np.zeros((1, 64), np.float32)
        x[0, 30] = 10.0
        y = uf.median_filter(jnp.asarray(x), 5)
        assert np.abs(np.asarray(y)).max() == 0.0

    def test_preserves_step(self):
        x = np.concatenate([np.zeros(32), np.ones(32)]).astype(np.float32)[None]
        y = np.asarray(uf.median_filter(jnp.asarray(x), 5))[0]
        assert y[10] == 0.0 and y[50] == 1.0


class TestDelayLine:
    def test_delay(self):
        x = jnp.asarray(np.arange(16, dtype=np.float32)[None])
        y, tail = uf.delay_line(x, 4)
        np.testing.assert_array_equal(np.asarray(y)[0, 4:], np.arange(12))
        np.testing.assert_array_equal(np.asarray(y)[0, :4], 0)
        y2, _ = uf.delay_line(x + 16, 4, tail)
        np.testing.assert_array_equal(np.asarray(y2)[0, :4], [12, 13, 14, 15])


class TestButterworth:
    def test_matches_scipy(self):
        coefs = uf.design_butterworth(4, 1000.0, 48000.0)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 2048)).astype(np.float32)
        states = [iir.biquad_state_init(1) for _ in coefs]
        _, y = uf.butterworth_apply(states, jnp.asarray(x), coefs)
        sos = scipy.signal.butter(4, 1000.0, fs=48000.0, output="sos")
        ref = scipy.signal.sosfilt(sos, x, axis=1)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-3)


class TestALaw:
    def test_roundtrip_snr(self):
        t = np.linspace(0, 1, 8000, endpoint=False)
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        enc = uf.alaw_compress(x)
        dec = uf.alaw_expand(enc)
        err = dec - x
        snr = 10 * np.log10(np.mean(x**2) / np.mean(err**2))
        assert snr > 30  # a-law ~ 38 dB SQNR for sine

    def test_silence(self):
        z = uf.alaw_expand(uf.alaw_compress(np.zeros(10, np.float32)))
        assert np.abs(z).max() < 1e-3


class TestSampleClock:
    def test_timing(self):
        clk = uf.SampleClock(48000.0)
        clk.tick(48000)
        assert clk.seconds == pytest.approx(1.0)
        mark = clk.count
        clk.tick(24000)
        assert clk.duration(mark) == pytest.approx(0.5)
