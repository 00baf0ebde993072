"""Polyphase filterbank channelizer vs the direct mix+filter+decimate form
(the standard PFB identity), plus streaming exactness and frequency mapping."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from pebblesdr_tpu.ops import pfb

FS = 1_024_000
M = 8


def _direct_channel(x, p, m):
    """Reference: channel m = e^{2πi m(M−1)/M} · lowpass(x·e^{−2πi m t/M})
    sampled at t = kM + M − 1."""
    mm = p.n_chan
    t = np.arange(len(x))
    xm = x * np.exp(-2j * np.pi * m * t / mm)
    lp = sps.lfilter(p.h.astype(np.float64), [1.0], xm)
    s = np.arange(mm - 1, len(x), mm)
    return lp[s] * np.exp(2j * np.pi * m * (mm - 1) / mm)


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


class TestPfbIdentity:
    def test_all_channels_match_direct(self):
        p = pfb.plan(FS, M, taps_per_branch=8)
        n = 4096
        x = _rand(n)
        st = pfb.init_state(p)
        _, y = pfb.apply(p, st, jnp.asarray(x[None, :]))
        y = np.asarray(y)[0]  # [M, K]
        assert y.shape == (M, n // M)
        for m in range(M):
            ref = _direct_channel(x.astype(np.complex128), p, m)
            np.testing.assert_allclose(y[m], ref, atol=2e-5)

    def test_streaming_exact(self):
        p = pfb.plan(FS, M)
        n = 2048
        x = _rand(3 * n, seed=4)
        st = pfb.init_state(p)
        chunks = []
        for b in range(3):
            st, y = pfb.apply(p, st, jnp.asarray(x[None, b * n:(b + 1) * n]))
            chunks.append(np.asarray(y)[0])
        got = np.concatenate(chunks, axis=-1)
        _, ref = pfb.apply(p, pfb.init_state(p), jnp.asarray(x[None, :]))
        np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-6)


class TestLargeM:
    def test_fft_path_matches_direct(self):
        """M > 128 switches to the batched-FFT transform; it must satisfy the
        same PFB identity as the dense-DFT path."""
        m_big = 256
        p = pfb.plan(FS, m_big, taps_per_branch=6)
        n = m_big * 24
        x = _rand(n, seed=9)
        _, y = pfb.apply(p, pfb.init_state(p), jnp.asarray(x[None, :]))
        y = np.asarray(y)[0]
        assert y.shape == (m_big, n // m_big)
        for m in (0, 1, 100, m_big - 1):
            ref = _direct_channel(x.astype(np.complex128), p, m)
            np.testing.assert_allclose(y[m], ref, atol=3e-5)


class TestChannelMapping:
    def test_tone_lands_in_its_channel(self):
        p = pfb.plan(FS, M, taps_per_branch=12)
        freqs = pfb.channel_freqs(p)
        n = 8192
        t = np.arange(n) / FS
        for m in (0, 1, 3, M - 1):
            f0 = freqs[m] + 0.1 * p.fs_out  # slightly off-center in channel m
            x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
            _, y = pfb.apply(p, pfb.init_state(p), jnp.asarray(x[None, :]))
            power = np.mean(np.abs(np.asarray(y)[0]) ** 2, axis=-1)
            assert np.argmax(power) == m
            # adjacent-channel rejection from the Kaiser prototype
            others = np.delete(power, m)
            assert 10 * np.log10(power[m] / np.max(others)) > 40

    def test_channel_baseband_frequency(self):
        p = pfb.plan(FS, M)
        freqs = pfb.channel_freqs(p)
        n = 8192
        t = np.arange(n) / FS
        off = 3000.0  # Hz offset within channel 2
        x = np.exp(2j * np.pi * (freqs[2] + off) * t).astype(np.complex64)
        _, y = pfb.apply(p, pfb.init_state(p), jnp.asarray(x[None, :]))
        ch = np.asarray(y)[0, 2]
        tail = ch[len(ch) // 2:]  # skip filter transient
        spec = np.fft.fftshift(np.fft.fft(tail))
        fbin = np.fft.fftshift(np.fft.fftfreq(len(tail), 1.0 / p.fs_out))
        peak = fbin[np.argmax(np.abs(spec))]
        assert abs(peak - off) < p.fs_out / len(tail) * 2

    def test_indivisible_block_raises(self):
        p = pfb.plan(FS, M)
        with pytest.raises(ValueError, match="not divisible"):
            pfb.apply(p, pfb.init_state(p), jnp.zeros((1, 100), jnp.complex64))


class TestOversampled:
    def _direct_os(self, x, p, m):
        """os=2 reference: channel m = lowpass(x·e^{−2πi m t/M}) sampled at
        t = (k+1)·hop − 1 (the streaming grid — each output consumes hop
        fresh samples), times the critical path's constant phase."""
        mm = p.n_chan
        t = np.arange(len(x))
        xm = x * np.exp(-2j * np.pi * m * t / mm)
        lp = sps.lfilter(p.h.astype(np.float64), [1.0], xm)
        s = np.arange(p.hop - 1, len(x), p.hop)
        return lp[s] * np.exp(2j * np.pi * m * (mm - 1) / mm)

    def test_os2_matches_direct(self):
        p = pfb.plan(FS, M, taps_per_branch=8, os=2)
        assert p.hop == M // 2 and p.fs_out == FS / (M // 2)
        n = 4096
        x = _rand(n, seed=2)
        _, y = pfb.apply(p, pfb.init_state(p), jnp.asarray(x[None, :]))
        y = np.asarray(y)[0]
        assert y.shape == (M, n // (M // 2))
        for m in range(M):
            ref = self._direct_os(x.astype(np.complex128), p, m)
            np.testing.assert_allclose(y[m], ref, atol=2e-5)

    def test_os2_streaming_exact(self):
        p = pfb.plan(FS, M, os=2)
        n = 2048
        x = _rand(3 * n, seed=5)
        st = pfb.init_state(p)
        chunks = []
        for b in range(3):
            st, y = pfb.apply(p, st, jnp.asarray(x[None, b * n:(b + 1) * n]))
            chunks.append(np.asarray(y)[0])
        got = np.concatenate(chunks, axis=-1)
        _, ref = pfb.apply(p, pfb.init_state(p), jnp.asarray(x[None, :]))
        np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-6)

    def test_os2_edge_station_keeps_sidebands(self):
        """The critical bank's inherent loss (chain/pfb_bank.py docstring):
        a station halfway between channel centers keeps its full band only
        with the oversampled prototype."""
        m_big = 64
        n = m_big * 512
        t = np.arange(n) / FS
        # DSB station at a channel EDGE: carrier at center + fs/(2M),
        # +-5 kHz sidebands (channel spacing fs/M = 16 kHz)
        edge = FS / m_big / 2.0
        x = ((1.0 + 0.8 * np.cos(2 * np.pi * 5000.0 * t))
             * np.exp(2j * np.pi * edge * t)).astype(np.complex64)
        power = {}
        for os in (1, 2):
            p = pfb.plan(FS, m_big, os=os)
            _, y = pfb.apply(p, pfb.init_state(p), jnp.asarray(x[None, :]))
            ch = np.asarray(y)[0, 0][m_big:]  # channel 0, skip transient
            # the upper sideband sits at edge+5k = 13 kHz off channel center;
            # measure its recovered power via the envelope's 5 kHz line
            env = np.abs(ch)
            spec = np.abs(np.fft.rfft(env - env.mean()))
            fbin = np.fft.rfftfreq(len(env), 1.0 / p.fs_out)
            b5k = np.argmin(np.abs(fbin - 5000.0))
            power[os] = spec[b5k] / len(env)
        # critical sampling clips the outer sideband: SSB reception halves
        # the envelope line (~0.18 of the 0.4 full-depth value); the
        # oversampled bank recovers BOTH sidebands essentially exactly
        assert power[2] > 0.35, power      # ~full 0.8-depth AM envelope
        assert power[1] < 0.25, power      # one sideband lost
        assert power[2] > 2.0 * power[1], power


class TestOs2Guards:
    def test_odd_frame_count_rejected(self):
        """The os=2 per-frame twiddle needs whole frame pairs per call for
        streaming parity consistency (code-review r3 finding 2)."""
        p = pfb.plan(FS, M, os=2)
        with pytest.raises(ValueError, match="frame pairs"):
            pfb.apply(p, pfb.init_state(p),
                      jnp.zeros((1, 3 * p.hop), jnp.complex64))
