#!/usr/bin/env python
"""Knock-one-stage-out probe of the BATCHED demod-rate tail (_tail_many).

bench.py's matrix told us the am_16ch block is ~0.023 ms front +
~0.028 ms tail + dispatch share; this tool finds WHERE in the tail the
time goes by monkeypatching individual stages to identities and re-timing
the whole honest-synced dispatch.  Diagnostics only — never imported by
the package.  Run ALONE on the tunnel:

    TP_CHANNELS=16 TP_BLOCKS=64 /opt/venv/bin/python tools/tailprobe.py
"""

import os
import sys
import time
import functools
import contextlib

import numpy as np

C = int(os.environ.get("TP_CHANNELS", "16"))
K = int(os.environ.get("TP_BLOCKS", "64"))
N = int(os.environ.get("TP_FRAMES", "32768"))
FS = 2_048_000
STEPS = int(os.environ.get("TP_STEPS", "30"))
SPECTRA_EVERY = int(os.environ.get("TP_SPECTRA_EVERY", "6"))


@contextlib.contextmanager
def patched(*patches):
    """patches: (obj, attr, replacement).  Restores on exit."""
    saved = [(o, a, getattr(o, a)) for o, a, _ in patches]
    try:
        for o, a, r in patches:
            setattr(o, a, r)
        yield
    finally:
        for o, a, v in saved:
            setattr(o, a, v)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode
    from pebblesdr_tpu.demod import am as am_mod
    from pebblesdr_tpu.ops import agc, fastfir, resampler, spectrum
    from pebblesdr_tpu.ops.pallas_kernels import fold_plane_np, pick_fold

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=N, channels=C,
                         mode=DemodMode.AM, agc_stride=16)
    rx = Receiver(cfg)
    assert rx.batched_capable
    params = rx.default_params(250_000.0)
    state = jax.jit(lambda: rx.init_state())()

    t = np.arange(N) / FS
    env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
    iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64)
    plane = np.concatenate([
        np.broadcast_to(iq.real.astype(np.float32)[:, None], (N, C)),
        np.broadcast_to(iq.imag.astype(np.float32)[:, None], (N, C)),
    ], axis=1)
    fold = pick_fold(C, K)
    if fold > 1:
        plane_f = fold_plane_np(np.tile(plane, (fold, 1)), fold)
        iq_dev = jax.jit(lambda b: jnp.tile(b, (K // fold, 1)))(
            jnp.asarray(plane_f))
    else:
        iq_dev = jax.jit(lambda b: jnp.tile(b, (K, 1)))(jnp.asarray(plane))
    sync = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    print(f"# C={C} K={K} fold={fold} plane {iq_dev.shape}", file=sys.stderr)

    def time_variant(name, *patches, spectra_on=True):
        with patched(*patches):
            @functools.partial(jax.jit, static_argnames=("spectra",))
            def step(st, pr, xin, spectra=True):
                return rx._step_many_impl(st, pr, xin, spectra=spectra)

            def sp(i):
                return spectra_on and (i % SPECTRA_EVERY == 0)

            st = state
            t0 = time.perf_counter()
            for i in range(3):
                st, out = step(st, params, iq_dev, spectra=sp(i))
            float(sync(out["audio"]))
            comp = time.perf_counter() - t0

            dts = []
            for _ in range(3):
                stt = st
                t0 = time.perf_counter()
                for i in range(STEPS):
                    stt, out = step(stt, params, iq_dev, spectra=sp(i))
                float(sync(out["audio"]))
                dts.append(time.perf_counter() - t0)
        dt = min(dts)
        blk_ms = dt / (STEPS * K) * 1e3
        # `comp` times 3 warm-up steps + a device sync, not just compilation
        print(f"{name:24s} block {blk_ms:.4f} ms   (warmup {comp:.0f}s, "
              f"windows {['%.2f' % d for d in dts]})")
        return blk_ms

    ident2 = lambda st, x, *a, **kw: (st, x)

    base = time_variant("full")
    time_variant("no_display_spectra", spectra_on=False)
    time_variant("fastfir=identity",
                 (fastfir, "apply_many", ident2))
    time_variant("agc=identity",
                 (agc, "agc_apply", lambda c_, st, x: (st, x)))
    time_variant("amdemod=real",
                 (am_mod, "am_demod", lambda c_, st, x: (st, jnp.abs(x))))
    def cheap_resamp(p, st, x):
        out_len = (x.shape[1] // p.n_in) * p.n_out
        return st, x[:, :out_len]

    time_variant("resamp=slice",
                 (resampler, "apply_many", cheap_resamp))
    time_variant("zoomdft=cheap",
                 (spectrum, "_shifted_power",
                  lambda xw: xw.real * xw.real + xw.imag * xw.imag))
    # everything downstream of S-meter knocked out together
    time_variant("ff+agc+dem+rs=ident",
                 (fastfir, "apply_many", ident2),
                 (agc, "agc_apply", lambda c_, st, x: (st, x)),
                 (am_mod, "am_demod", lambda c_, st, x: (st, jnp.abs(x))),
                 (resampler, "apply_many", cheap_resamp))
    print(f"# base {base:.4f} ms/block", file=sys.stderr)


if __name__ == "__main__":
    main()
