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
