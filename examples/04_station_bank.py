"""Dense-bank monitoring: ONE wideband capture -> many stations at once.

The polyphase filterbank front (chain.pfb_bank) channelizes the whole
capture in one pass — front cost sublinear per station — and every station
gets the full receive chain (fine tune, bandpass, AGC, demod, S-meter,
squelch) at the low channel rate.  The shipped station DB picks the tunes.

Run:  python examples/04_station_bank.py
"""

import os

# run on CPU: the demo is about capability, not speed (and network-attached
# accelerators may not move complex64 constants)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from pebblesdr_tpu.chain.pfb_bank import PfbBankReceiver  # noqa: E402
from pebblesdr_tpu.demod.modes import DemodMode  # noqa: E402
from pebblesdr_tpu.utils import settings  # noqa: E402

FS = 2_048_000
FRAMES = 32768
CENTER = 10_000_000.0  # capture centered on 10 MHz (31 m broadcast band)

# 1. stations inside the capture window, from the shipped DB
stations = settings.stations_near(settings.load_stations(), CENTER, FS * 0.9)
tunes = np.array([p.freq_hz - CENTER for p in stations])
print(f"{len(stations)} DB stations inside the {FS/1e6:.3f} MHz window:")
for p in stations:
    print(f"  {p.name:>18s}  {p.freq_hz/1e6:9.4f} MHz  {p.mode}")

# 2. the bank: oversample=2 keeps edge-station sidebands intact
bank = PfbBankReceiver(FS, FRAMES, tunes, mode=DemodMode.AM,
                       oversample=2, agc_mode="med")
state = bank.init_state()

# 3. synthesize a capture: put a modulated carrier on the first station
t = np.arange(4 * FRAMES) / FS
env = (1 + 0.8 * np.cos(2 * np.pi * 600.0 * t)) / 2
iq = (0.5 * env * np.exp(2j * np.pi * tunes[0] * t)).astype(np.complex64)
rng = np.random.default_rng(0)
iq += 1e-4 * (rng.standard_normal(len(t))
              + 1j * rng.standard_normal(len(t))).astype(np.complex64)

# 4. run — K blocks per dispatch through the batched bank tail
state, out = bank.step_many(state, jnp.asarray(
    np.stack([iq.real, iq.imag], axis=1)))
snr = np.asarray(out["smeter"]["snr_db"])[-1]
audio = np.asarray(out["audio"])          # [K, C, M]
print("\nper-station SNR / audio RMS after 4 blocks:")
for i, p in enumerate(stations):
    rms = float(np.sqrt(np.mean(audio[:, i] ** 2)))
    mark = "  <-- active" if i == 0 else ""
    print(f"  {p.name:>18s}  {snr[i]:7.1f} dB  rms {rms:.4f}{mark}")
