"""Play a recorded IQ WAV through the receive chain, write audio.

Equivalent of the reference's FileSDRDevice + Receiver power-on flow
(BASELINE.json config #1).  Synthesizes a fixture if no file is given.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.demod.modes import DemodMode
from pebblesdr_tpu.io import sources, wav

path = sys.argv[1] if len(sys.argv) > 1 else None
if path is None:
    path = "/tmp/example_am.wav"
    fs = 2_048_000
    t = np.arange(fs) / fs
    env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
    iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64)
    wav.write_iq_wav(path, iq, fs, center_freq_hz=250_000.0, demod_mode="AM")
    print(f"synthesized fixture {path}")

src = sources.FileSource(path, loop=False)
rx = Receiver(ReceiverConfig(sample_rate=src.info.sample_rate,
                             frames_per_buffer=32768, mode=DemodMode.AM))
state = jax.jit(lambda: rx.init_state())()
params = rx.default_params(src.info.center_freq_hz)

audio = []
for blk in src.blocks(32768):
    ri = np.stack([blk.real, blk.imag]).astype(np.float32)
    state, out = rx.step(state, params, jax.lax.complex(
        jnp.asarray(ri[None, 0]), jnp.asarray(ri[None, 1])))
    audio.append(np.asarray(out["audio"])[0])
    sm = out["smeter"]
    print(f"S-meter {float(sm['signal_db'][0]):6.1f} dB  "
          f"SNR {float(sm['snr_db'][0]):5.1f} dB", end="\r")

wav.write_audio_wav("/tmp/example_audio.wav", np.concatenate(audio), 48000)
print(f"\naudio -> /tmp/example_audio.wav ({sum(a.shape[-1] for a in audio)} samples)")
