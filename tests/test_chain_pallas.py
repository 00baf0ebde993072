"""Receiver with the fused Pallas front end (interpret mode on CPU) must match
the XLA front end bit-close."""

import numpy as np
import jax.numpy as jnp
import pytest

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.demod.modes import DemodMode

FS, N, C = 1_024_000, 16384, 8


class TestPallasChainParity:
    def test_am_chain_matches(self):
        t = np.arange(4 * N) / FS
        iq = np.broadcast_to(
            ((1 + 0.7 * np.cos(2 * np.pi * 800 * t)) / 2
             * np.exp(2j * np.pi * 200_000 * t)).astype(np.complex64),
            (C, 4 * N)).copy()

        audios = {}
        for use_pallas in (False, True):
            cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                 channels=C, mode=DemodMode.AM,
                                 agc_mode="off", use_pallas=use_pallas)
            rx = Receiver(cfg)
            state = rx.init_state()
            params = rx.default_params(200_000.0)
            outs = []
            for i in range(4):
                state, out = rx.step(state, params,
                                     jnp.asarray(iq[:, i * N:(i + 1) * N]))
                outs.append(np.asarray(out["audio"]))
            audios[use_pallas] = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(audios[True], audios[False], atol=2e-4)

    def test_nb_iqbal_chain_keeps_pallas_and_matches(self):
        """enable_noise_blanker / static IQ balance no longer drop the fused
        front (VERDICT r3 item 4): the chain keeps use_pallas and matches
        the staged path, spikes actually blanked."""
        t = np.arange(4 * N) / FS
        iq = np.broadcast_to(
            ((1 + 0.7 * np.cos(2 * np.pi * 800 * t)) / 2
             * np.exp(2j * np.pi * 200_000 * t)).astype(np.complex64),
            (C, 4 * N)).copy()
        rng = np.random.default_rng(3)
        spikes = rng.choice(4 * N, 40, replace=False)
        iq[:, spikes] += 12.0 - 12.0j

        audios = {}
        for use_pallas in (False, True):
            cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                 channels=C, mode=DemodMode.AM,
                                 agc_mode="off", use_pallas=use_pallas,
                                 enable_noise_blanker=True,
                                 enable_iq_balance=True)
            rx = Receiver(cfg)
            assert rx.use_pallas == use_pallas  # NB no longer disables it
            state = rx.init_state()
            params = rx.default_params(200_000.0)
            import dataclasses
            params = dataclasses.replace(
                params, iq_gain=jnp.asarray(1.04, jnp.float32),
                iq_phase=jnp.asarray(0.015, jnp.float32))
            outs = []
            for i in range(4):
                state, out = rx.step(state, params,
                                     jnp.asarray(iq[:, i * N:(i + 1) * N]))
                outs.append(np.asarray(out["audio"]))
            audios[use_pallas] = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(audios[True], audios[False], atol=2e-4)
        # and the blanker worked: with NB on (alone — the IQ-balance gain
        # intentionally scales the audio, so it must stay out of this
        # comparison), the audio is much closer to the CLEAN (spike-free)
        # chain output than a NB-off run is
        iq_clean = np.broadcast_to(
            ((1 + 0.7 * np.cos(2 * np.pi * 800 * t)) / 2
             * np.exp(2j * np.pi * 200_000 * t)).astype(np.complex64),
            (C, 4 * N)).copy()
        res = {}
        for name, nb_on, sig in (("clean", False, iq_clean),
                                 ("spiky", False, iq),
                                 ("nb", True, iq)):
            cfg2 = ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                  channels=C, mode=DemodMode.AM,
                                  agc_mode="off", use_pallas=True,
                                  enable_noise_blanker=nb_on)
            rx = Receiver(cfg2)
            params = rx.default_params(200_000.0)
            state = rx.init_state()
            outs = []
            for i in range(4):
                state, out = rx.step(state, params,
                                     jnp.asarray(sig[:, i * N:(i + 1) * N]))
                outs.append(np.asarray(out["audio"]))
            res[name] = np.concatenate(outs, axis=-1)
        # skip block 0: the blanker's magnitude average initializes at zero,
        # so its first chunk blanks until the average learns (startup only)
        m = res["nb"].shape[-1] // 4
        err_nb = np.sqrt(np.mean((res["nb"][:, m:]
                                  - res["clean"][:, m:]) ** 2))
        err_off = np.sqrt(np.mean((res["spiky"][:, m:]
                                   - res["clean"][:, m:]) ** 2))
        assert err_nb < 0.5 * err_off, (err_nb, err_off)


class TestNbWithWfm:
    def test_wfm_stereo_nb_batched_matches_sequential(self):
        """NB coexists with the WFM in-kernel discriminator (both optional
        ref groups active in one pallas_call): batched step_many == K
        sequential steps, NB-on, stereo."""
        import functools

        import jax

        t = np.arange(3 * N) / FS
        a = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
        th = 2 * np.pi * 19000.0 * t
        comp = 0.45 * a + 0.1 * np.sin(th) + 0.45 * a * np.sin(2 * th)
        phase = 2 * np.pi * np.cumsum(75000.0 * comp) / FS
        iq = (0.5 * np.exp(1j * (2 * np.pi * 200_000.0 * t + phase))
              ).astype(np.complex64)
        rng = np.random.default_rng(4)
        iq[rng.choice(3 * N, 25, replace=False)] += 10.0 + 10.0j
        iq = iq[None, :] * np.ones((2, 1), np.float32)
        x_pk = np.concatenate([iq.real.astype(np.float32).T,
                               iq.imag.astype(np.float32).T], axis=1)

        from pebblesdr_tpu.demod.modes import DemodMode as DM
        cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=N, channels=2,
                             mode=DM.FMS, use_pallas=True,
                             enable_noise_blanker=True)
        rx = Receiver(cfg)
        assert rx.use_pallas and rx.batched_capable
        assert rx.pick_fold(4) == 1   # NB disables the time-fold
        params = rx.default_params(200_000.0)

        st = rx.init_state()
        step = jax.jit(functools.partial(rx._step_impl, spectra=False))
        seq = []
        for k in range(3):
            st, o = step(st, params, jnp.asarray(x_pk[k * N:(k + 1) * N]))
            seq.append(np.asarray(o["audio"]))
        audio_seq = np.concatenate(seq, axis=-1)

        st2 = rx.init_state()
        st2, ob = jax.jit(functools.partial(rx._step_many_impl,
                                            spectra=False))(
            st2, params, jnp.asarray(x_pk))
        audio_b = np.moveaxis(np.asarray(ob["audio"]), 0, -2).reshape(
            audio_seq.shape)
        scale = max(np.abs(audio_seq).max(), 1e-6)
        assert np.abs(audio_seq - audio_b).max() / scale < 2e-3


class TestWfmTailKernel:
    def test_wfm_kernel_matches_xla_tail(self):
        """The fused Pallas stereo tail (demux + decimating LP,
        pallas_kernels.wfm_tail_packed) must match the XLA demux multiply +
        banded-matmul LP on the same stream (interpret mode on CPU)."""
        C = 2
        t = np.arange(6 * N) / FS
        left = np.sin(2 * np.pi * 700.0 * t)
        right = np.sin(2 * np.pi * 2500.0 * t)
        comp = (0.45 * (left + right) / 2
                + 0.45 * (left - right) / 2
                * np.sin(2 * 2 * np.pi * 19000.0 * t)
                + 0.1 * np.sin(2 * np.pi * 19000.0 * t))
        ph = 2 * np.pi * np.cumsum(75000.0 * comp) / FS
        iq = np.broadcast_to(
            (0.5 * np.exp(1j * (2 * np.pi * 200_000.0 * t + ph))
             ).astype(np.complex64), (C, 6 * N)).copy()

        audios = {}
        for use_pallas in (False, True):
            cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                 channels=C, mode=DemodMode.FMS,
                                 use_pallas=use_pallas)
            rx = Receiver(cfg)
            assert rx.wfm_cfg.pallas_tail == use_pallas
            state = rx.init_state()
            params = rx.default_params(200_000.0)
            outs = []
            for i in range(6):
                state, out = rx.step(state, params,
                                     jnp.asarray(iq[:, i * N:(i + 1) * N]))
                outs.append(np.asarray(out["audio"]))
            audios[use_pallas] = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(audios[True], audios[False], atol=5e-4)

    def test_non_pow2_audio_decim_falls_back(self):
        """audio_decim=6 (1.536 Msps -> 384 kHz composite) admits no
        power-of-two kernel sub-block; the build must fall back to the XLA
        tail instead of dividing by zero at trace time (advisor r2 finding 1)."""
        fs2, frames = 1_536_000, 24576
        cfg = ReceiverConfig(sample_rate=fs2, frames_per_buffer=frames,
                             channels=2, mode=DemodMode.FMS, use_pallas=True)
        rx = Receiver(cfg)
        assert rx.wfm_cfg.audio_decim == 6
        assert rx.wfm_cfg.tail_sub == 0 and not rx.wfm_cfg.pallas_tail
        state = rx.init_state()
        params = rx.default_params(200_000.0)
        iq = np.zeros((2, frames), np.complex64)
        state, out = rx.step(state, params, jnp.asarray(iq))
        assert out["audio"].shape[0] == 2


def test_wfm_mixed_folded_unfolded_dispatches():
    """A C<=32 WFM Receiver must serve FOLDED dispatches (fused tm tail)
    and UNFOLDED ones (narrow-lane XLA fallback; Mosaic rejects sub-tile
    kernel planes) against the SAME packed state, streaming-exactly: the
    packed [d_rows, 2C] tail's pad rows are zero-weighted, so the
    cross-layout conversion is exact (round 5)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode

    FS, N, C, KF = 2_048_000, 32768, 2, 4
    t = np.arange(KF * N) / FS
    a = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    th = 2 * np.pi * 19000.0 * t
    comp = 0.45 * a + 0.1 * np.sin(th) + 0.45 * a * np.sin(2 * th)
    phase = 2 * np.pi * np.cumsum(75000.0 * comp) / FS
    iq = (0.5 * np.exp(1j * (2 * np.pi * 250_000.0 * t + phase))
          ).astype(np.complex64)
    iq = iq[None, :] * np.ones((C, 1), np.float32)
    x_pk = np.concatenate(
        [np.ascontiguousarray(iq.real.astype(np.float32).T),
         np.ascontiguousarray(iq.imag.astype(np.float32).T)], axis=1)

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=N, channels=C,
                         mode=DemodMode.FMS, use_pallas=True,
                         batched_many=True, agc_mode="off")
    rx = Receiver(cfg)
    params = rx.default_params(250_000.0)
    step = jax.jit(functools.partial(rx._step_many_impl, spectra=False))

    # reference: four UNFOLDED single-block dispatches (XLA tail)
    st = rx.init_state()
    ref = []
    for k in range(KF):
        st, o = step(st, params, jnp.asarray(x_pk[k * N:(k + 1) * N]))
        ref.append(np.asarray(o["audio"]))
    audio_ref = np.concatenate([r.reshape(-1, *r.shape[2:]).swapaxes(0, 0)
                                for r in ref], axis=0)

    # mixed: one FOLDED 2-block dispatch (kernel tail), then two unfolded
    # single-block dispatches, against the same carried state
    from pebblesdr_tpu.ops import pallas_kernels as pk

    st2 = rx.init_state()
    folded = pk.fold_plane_np(x_pk[:2 * N], 2)
    st2, o1 = step(st2, params, jnp.asarray(folded))
    got = [np.asarray(o1["audio"])]
    for k in (2, 3):
        st2, o = step(st2, params, jnp.asarray(x_pk[k * N:(k + 1) * N]))
        got.append(np.asarray(o["audio"]))
    audio_got = np.concatenate([g.reshape(-1, *g.shape[2:])
                                for g in got], axis=0)
    audio_ref = np.concatenate([r.reshape(-1, *r.shape[2:])
                                for r in ref], axis=0)
    scale = max(np.abs(audio_ref).max(), 1e-6)
    assert audio_got.shape == audio_ref.shape
    assert np.abs(audio_got - audio_ref).max() / scale < 5e-3
