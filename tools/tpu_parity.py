"""TPU-vs-CPU parity of the batched fast paths: the SAME inputs through the
real Mosaic-compiled kernels (axon TPU) and the interpret-mode CPU path.
Audio is float32 so it crosses the axon boundary.

This is the check that caught the round-3 hardware-precision bug: interpret
-mode tests run f32 matmuls exactly, but on REAL TPUs f32 dots default to
ONE bf16 MXU pass — the S-meter noise floor read ~13-30 dB wrong and WFM
audio differed ~3% while every CPU test passed.  All accuracy-bearing dots
now run 3-pass-split (Pallas _dot3) or Precision.HIGH (XLA); this harness
asserts audio rel < 5e-3 and S-meter < 0.5 dB between backends.  Run it
after ANY kernel or spectrum change."""
import os
import subprocess
import sys

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "run"


def build_inputs(mode, c, k):
    fs, n = 2_048_000, 32768
    t = np.arange(k * n) / fs
    if mode.startswith("wfm"):
        a = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
        th = 2 * np.pi * 19000.0 * t
        comp = 0.45 * a + 0.1 * np.sin(th) + 0.45 * a * np.sin(2 * th)
        ph = 2 * np.pi * np.cumsum(75000.0 * comp) / fs
        iq = 0.5 * np.exp(1j * (2 * np.pi * 250_000.0 * t + ph))
    else:
        env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
        iq = 0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)
    rng = np.random.default_rng(0)
    iq = (iq + 1e-4 * (rng.standard_normal(len(t))
                       + 1j * rng.standard_normal(len(t)))).astype(np.complex64)
    x = np.concatenate(
        [np.broadcast_to(iq.real.astype(np.float32)[:, None], (k * n, c)),
         np.broadcast_to(iq.imag.astype(np.float32)[:, None], (k * n, c))],
        axis=1)
    return fs, n, x


def run_one(platform, mode, c, k, out_path):
    if platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode

    fs, n, x = build_inputs(mode, c, k)
    dm = DemodMode.FMS if mode.startswith("wfm") else DemodMode.AM
    cfg = ReceiverConfig(sample_rate=fs, frames_per_buffer=n, channels=c,
                         mode=dm, rds=("rds" in mode), agc_stride=16,
                         use_pallas=True)
    rx = Receiver(cfg)
    assert rx.batched_capable
    state = jax.jit(lambda: rx.init_state())()
    params = rx.default_params(250_000.0)
    step = jax.jit(functools.partial(rx._step_many_impl, spectra=True))
    state, out = step(state, params, jnp.asarray(x))
    np.savez(out_path, audio=np.asarray(out["audio"]),
             spectrum=np.asarray(out["spectrum"]),
             snr=np.asarray(out["smeter"]["snr_db"]))


if MODE == "worker":
    run_one(sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]),
            sys.argv[6])
    sys.exit(0)

for mode, c, k in (("am", 64, 8), ("am", 16, 8), ("wfm", 16, 8),
                   ("wfm_rds", 64, 8)):
    paths = {}
    for plat in ("tpu", "cpu"):
        p = f"/tmp/parity_{mode}_{c}_{plat}.npz"
        env = dict(os.environ)
        subprocess.run([sys.executable, __file__, "worker", plat, mode,
                        str(c), str(k), p], check=True, env=env,
                       capture_output=True)
        paths[plat] = p
    a = np.load(paths["tpu"])
    b = np.load(paths["cpu"])
    sa, sb = a["audio"], b["audio"]
    scale = max(np.abs(sb).max(), 1e-9)
    d_audio = np.abs(sa - sb).max() / scale
    d_spec = np.abs(a["spectrum"] - b["spectrum"]).max()
    d_snr = np.abs(a["snr"] - b["snr"]).max()
    status = "OK" if (d_audio < 5e-3 and d_snr < 0.5) else "FAIL"
    print(f"{mode}_{c}ch: audio rel {d_audio:.2e}  spectrum dB {d_spec:.3f}"
          f"  snr dB {d_snr:.3f}  {status}", flush=True)
