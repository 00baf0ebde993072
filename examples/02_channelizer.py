"""64-channel channelizer: one wideband capture -> 64 concurrent AM demods
(BASELINE.json config #4).  Each channel gets its own tune frequency; the
whole thing is ONE jitted step over [channels, block]."""

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.demod.modes import DemodMode

FS, N, C = 2_048_000, 32768, 64

# one capture with 8 AM stations; all 64 channels watch different slots
rng = np.random.default_rng(0)
t = np.arange(4 * N) / FS
capture = np.zeros(4 * N, np.complex64)
station_freqs = np.linspace(-800_000, 800_000, 8)
for i, f in enumerate(station_freqs):
    env = (1 + 0.8 * np.cos(2 * np.pi * (500 + 200 * i) * t)) / 2
    capture += (0.2 * env * np.exp(2j * np.pi * f * t)).astype(np.complex64)

rx = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N, channels=C,
                             mode=DemodMode.AM))
state = jax.jit(lambda: rx.init_state())()
tunes = np.linspace(-800_000, 800_000, C)  # 64 watchers across the band
params = rx.default_params(tunes)

iq = np.broadcast_to(capture[:N], (C, N)).copy()
for i in range(4):
    blk = np.broadcast_to(capture[i * N:(i + 1) * N], (C, N))
    ri = np.stack([blk.real, blk.imag], axis=1).astype(np.float32)
    state, out = rx.step(state, params, jax.lax.complex(
        jnp.asarray(ri[:, 0]), jnp.asarray(ri[:, 1])))

sm = np.asarray(out["smeter"]["signal_db"])
print("per-channel signal levels (dB):")
for c in range(0, C, 8):
    row = " ".join(f"{sm[k]:6.1f}" for k in range(c, c + 8))
    print(f"  ch{c:02d}+ {row}")
hot = np.flatnonzero(sm > -60)
print(f"channels on a station: {list(hot)} "
      f"(expected near multiples of {C // 8})")
