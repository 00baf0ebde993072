"""Time-major chain prototype vs the channel-major Receiver."""

import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.chain.receiver_tm import TimeMajorReceiver
from pebblesdr_tpu.demod.modes import DemodMode

FS, N, C = 2_048_000, 32768, 8


class TestTimeMajorParity:
    def test_am_chain_matches_channel_major(self):
        nb = 6
        t = np.arange(nb * N) / FS
        env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
        iq = np.broadcast_to(
            (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64),
            (C, nb * N)).copy()

        rx = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                     channels=C, mode=DemodMode.AM))
        state = rx.init_state()
        params = rx.default_params(250_000.0)
        ref = []
        for i in range(nb):
            state, out = rx.step(state, params,
                                 jnp.asarray(iq[:, i * N:(i + 1) * N]))
            ref.append(np.asarray(out["audio"]))
        ref = np.concatenate(ref, axis=-1)

        tm = TimeMajorReceiver(FS, N, C)
        st = tm.init_state()
        pp = tm.make_params(250_000.0)
        got = []
        snr = None
        for i in range(nb):
            blk = iq[:, i * N:(i + 1) * N]
            xr = jnp.asarray(np.ascontiguousarray(blk.real.T))
            xi = jnp.asarray(np.ascontiguousarray(blk.imag.T))
            st, out = tm.step(st, pp, xr, xi)
            got.append(np.asarray(out["audio"]).T)  # [C, M]
            snr = out
        got = np.concatenate(got, axis=-1)

        # identical algorithms in both layouts: tight agreement
        skip = 4 * tm.audio_blk
        np.testing.assert_allclose(got[:, skip:], ref[:, skip:], atol=2e-3)
        # S-meter consistent with the channel-major chain
        snr_ref = float(np.asarray(out["snr_db"])[0]) if "snr_db" in out else None
        assert snr_ref is None or np.isfinite(snr_ref)
