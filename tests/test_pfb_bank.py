"""PFB dense-bank front end: parity vs the mixer-front Receiver, streaming
exactness, retune without recompile (VERDICT round-1 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.chain.pfb_bank import PfbBankReceiver, pick_bank_size
from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.demod.modes import DemodMode
from pebblesdr_tpu.ops import pfb

FS = 2_048_000
N = 32768
M = 64  # channel rate 32 kHz


def tone_fit(x, f, rate):
    from scipy import signal as sps

    t = np.arange(x.shape[-1]) / rate
    basis = np.stack([np.cos(2 * np.pi * f * t), np.sin(2 * np.pi * f * t),
                      np.ones_like(t)])
    coef, *_ = np.linalg.lstsq(basis.T, x, rcond=None)
    resid = x - coef @ basis
    # exclude the <100 Hz demod-DC-blocker transient from the noise estimate
    # (the 0.9999 blocker has a ~0.3 s tail; see the verify-skill gotcha)
    sos = sps.butter(4, 100.0, "highpass", fs=rate, output="sos")
    resid = sps.sosfilt(sos, resid)[len(resid) // 4:]
    return np.hypot(coef[0], coef[1]), resid


def am_capture(tunes, n_samp, depth=0.8, amp=0.4):
    t = np.arange(n_samp) / FS
    env = (1 + depth * np.cos(2 * np.pi * 1000.0 * t)) / 2
    iq = np.zeros(n_samp, np.complex128)
    for f in tunes:
        iq += amp * env * np.exp(2j * np.pi * f * t)
    return iq.astype(np.complex64)


class TestPickBankSize:
    def test_puts_channel_rate_in_band(self):
        assert pick_bank_size(2_048_000) == 128     # 16 kHz channels
        assert pick_bank_size(512_000) == 32        # 16 kHz
        m = pick_bank_size(8_192_000)
        assert 16000 <= 8_192_000 / m <= 64000


class TestBankVsMixerFront:
    def test_matches_mixer_front(self):
        """Same stations through the PFB bank and through the classic
        C-mixer-front Receiver: both must recover the 1 kHz program tone at
        the same amplitude with high SNR (different-but-correct filtering, so
        the assert is on the demodulated program, not bit equality)."""
        centers = pfb.channel_freqs(pfb.plan(FS, M))
        tunes = np.array([centers[3], centers[10], centers[M - 5],
                          centers[20] + 5000.0])  # one off-grid station
        n_blocks = 40  # the alpha=0.9999 DC blocker settles in ~0.3 s
        iq = am_capture(tunes, n_blocks * N)

        bank = PfbBankReceiver(FS, N, tunes, mode=DemodMode.AM, n_bank=M,
                               agc_mode="off")
        st = bank.init_state()
        audio_b = []
        for i in range(n_blocks):
            st, out = bank.step(st, jnp.asarray(iq[i * N:(i + 1) * N]),
                                spectra=False)
            audio_b.append(np.asarray(out["audio"]))
        audio_b = np.concatenate(audio_b, axis=-1)

        rx = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                     channels=len(tunes), mode=DemodMode.AM,
                                     agc_mode="off"))
        params = rx.default_params(tunes)
        st2 = rx.init_state()
        audio_m = []
        cap = np.broadcast_to(iq, (len(tunes), len(iq)))
        for i in range(n_blocks):
            st2, out = rx.step(st2, params,
                               jnp.asarray(cap[:, i * N:(i + 1) * N]),
                               spectra=False)
            audio_m.append(np.asarray(out["audio"]))
        audio_m = np.concatenate(audio_m, axis=-1)

        skip = 24000  # DC-blocker transient
        for c in range(len(tunes)):
            amp_b, res_b = tone_fit(audio_b[c, skip:].astype(np.float64),
                                    1000.0, 48000)
            amp_m, res_m = tone_fit(audio_m[c, skip:].astype(np.float64),
                                    1000.0, 48000)
            snr_b = 10 * np.log10(amp_b**2 / 2 / np.mean(res_b**2))
            assert snr_b > 40.0, (c, snr_b)
            # same program amplitude through either front (2% tolerance)
            assert abs(amp_b - amp_m) < 0.02 * amp_m, (c, amp_b, amp_m)

    def test_step_many_matches_steps(self):
        tunes = np.array([100_000.0, -200_000.0])
        bank = PfbBankReceiver(FS, N, tunes, mode=DemodMode.AM, n_bank=M,
                               agc_mode="off")
        iq = am_capture(tunes, 4 * N)
        st = bank.init_state()
        seq = []
        for i in range(4):
            st, out = bank.step(st, jnp.asarray(iq[i * N:(i + 1) * N]),
                                spectra=False)
            seq.append(np.asarray(out["audio"]))
        st2 = bank.init_state()
        st2, outs = bank.step_many(st2, jnp.asarray(iq), spectra=False)
        np.testing.assert_allclose(
            np.asarray(outs["audio"]),
            np.stack(seq), rtol=0, atol=1e-5)

    def test_plane_input_matches_complex(self):
        tunes = np.array([100_000.0])
        bank = PfbBankReceiver(FS, N, tunes, mode=DemodMode.AM, n_bank=M,
                               agc_mode="off")
        iq = am_capture(tunes, N)
        st = bank.init_state()
        _, out_c = bank.step(st, jnp.asarray(iq), spectra=False)
        st2 = bank.init_state()
        plane = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
        _, out_p = bank.step(st2, jnp.asarray(plane), spectra=False)
        np.testing.assert_allclose(np.asarray(out_p["audio"]),
                                   np.asarray(out_c["audio"]),
                                   rtol=0, atol=1e-6)

    def test_retune_no_recompile(self):
        tunes = np.array([100_000.0, -200_000.0])
        bank = PfbBankReceiver(FS, N, tunes, mode=DemodMode.AM, n_bank=M,
                               agc_mode="off")
        iq = am_capture(tunes, N)
        st = bank.init_state()
        st, _ = bank.step(st, jnp.asarray(iq), spectra=False)
        n_compiles = bank._step._cache_size()
        bank.retune(np.array([250_000.0, -400_000.0]))  # new channels too
        st, _ = bank.step(st, jnp.asarray(iq), spectra=False)
        assert bank._step._cache_size() == n_compiles

    def test_residual_bound(self):
        tunes = np.array([123_456.0])
        bank = PfbBankReceiver(FS, N, tunes, n_bank=M)
        assert np.all(np.abs(bank.residuals) <= FS / (2 * M) + 1e-6)


class TestShardedBank:
    def test_sharded_matches_single_chip(self):
        """Time-sharded PFB front + channel-sharded tails on the 8-device
        CPU mesh == the single-chip PfbBankReceiver (VERDICT r2 item 5b)."""
        import jax
        from jax.sharding import Mesh

        from pebblesdr_tpu.parallel.pfb_shard import build_sharded_bank_step

        fs, frames, m = 1_024_000, 16384, 32
        plan = pfb.plan(fs, m)
        centers = pfb.channel_freqs(plan)
        tunes = centers[[1, 5, 9, 13]] + np.array([0.0, 1000.0, -500.0, 0.0])
        bank = PfbBankReceiver(fs, frames, tunes, mode=DemodMode.AM, n_bank=m,
                               agc_mode="off")
        rng = np.random.default_rng(3)
        x = (rng.normal(size=3 * frames)
             + 1j * rng.normal(size=3 * frames)).astype(np.complex64)

        st = bank.init_state()
        ref = []
        for b in range(3):
            st, out = bank.step(st, jnp.asarray(x[b * frames:(b + 1) * frames]))
            ref.append(np.asarray(out["audio"]))
        ref = np.concatenate(ref, -1)

        devs = np.array(jax.devices("cpu")[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("channel", "time"))
        step = build_sharded_bank_step(bank, mesh)
        st2 = bank.init_state()
        got = []
        with mesh:
            for b in range(3):
                st2, out = step(st2, bank.params,
                                jnp.asarray(x[b * frames:(b + 1) * frames]))
                got.append(np.asarray(out["audio"]))
        got = np.concatenate(got, -1)
        scale = max(np.abs(ref).max(), 1e-9)
        assert np.abs(got - ref).max() / scale < 2e-4

    def test_oversampled_bank_builds_and_runs(self):
        fs, frames, m = 1_024_000, 16384, 32
        plan = pfb.plan(fs, m, os=2)
        centers = pfb.channel_freqs(plan)
        bank = PfbBankReceiver(fs, frames, centers[[2, 6]],
                               mode=DemodMode.AM, n_bank=m, oversample=2,
                               agc_mode="off")
        assert bank.ch_rate == fs // (m // 2)
        st = bank.init_state()
        t = np.arange(frames) / fs
        x = (0.5 * (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t))
             * np.exp(2j * np.pi * centers[2] * t)).astype(np.complex64)
        st, out = bank.step(st, jnp.asarray(x))
        assert out["audio"].shape[0] == 2


class TestBatchedTailGate:
    def test_nontrivial_front_takes_scan_path(self):
        """oversample=2 gives the tail Receiver a real decimation stage; the
        batched fast path must fall back to the per-block scan and still
        match sequential steps (code-review r3 finding 1)."""
        fs, frames, m = 1_024_000, 16384, 16   # ch_rate 128k -> tail decim x2
        centers = pfb.channel_freqs(pfb.plan(fs, m, os=2))
        t = np.arange(3 * frames) / fs
        x = (0.5 * (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t))
             * np.exp(2j * np.pi * centers[3] * t)).astype(np.complex64)
        bank = PfbBankReceiver(fs, frames, centers[[3, 7]],
                               mode=DemodMode.AM, n_bank=m, oversample=2,
                               agc_mode="off")
        assert len(bank.rx.plan.stages) >= 1
        st = bank.init_state()
        ref = []
        for b in range(3):
            st, out = bank.step(st, jnp.asarray(x[b * frames:(b + 1) * frames]))
            ref.append(np.asarray(out["audio"]))
        ref = np.concatenate(ref, -1)
        st2 = bank.init_state()
        st2, ob = bank.step_many(st2, jnp.asarray(x))
        got = np.moveaxis(np.asarray(ob["audio"]), 0, 1).reshape(ref.shape)
        scale = max(np.abs(ref).max(), 1e-9)
        assert np.abs(got - ref).max() / scale < 1e-5

    def test_dc_removal_override_takes_scan_path(self):
        fs, frames, m = 1_024_000, 16384, 32
        centers = pfb.channel_freqs(pfb.plan(fs, m))
        bank = PfbBankReceiver(fs, frames, centers[[2, 6]],
                               mode=DemodMode.AM, n_bank=m,
                               enable_dc_removal=True, agc_mode="off")
        rng = np.random.default_rng(1)
        x = (rng.normal(size=2 * frames) + 0.2
             + 1j * rng.normal(size=2 * frames)).astype(np.complex64)
        st = bank.init_state()
        ref = []
        for b in range(2):
            st, out = bank.step(st, jnp.asarray(x[b * frames:(b + 1) * frames]))
            ref.append(np.asarray(out["audio"]))
        ref = np.concatenate(ref, -1)
        st2 = bank.init_state()
        st2, ob = bank.step_many(st2, jnp.asarray(x))
        got = np.moveaxis(np.asarray(ob["audio"]), 0, 1).reshape(ref.shape)
        scale = max(np.abs(ref).max(), 1e-9)
        assert np.abs(got - ref).max() / scale < 1e-5
