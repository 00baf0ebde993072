#!/usr/bin/env python
"""Stage-ablation timer for the AM chain: where does the block time go?

Times a lax.scan over K blocks (same dispatch amortization as bench.py) of
progressively larger chain prefixes, printing the incremental cost of each
stage.  Run on the real TPU:  python tools/ablate.py
"""

import os
import time

import numpy as np

CHANNELS = int(os.environ.get("ABL_CHANNELS", "64"))
FRAMES = int(os.environ.get("ABL_FRAMES", "32768"))
BLOCKS = int(os.environ.get("ABL_BLOCKS", "8"))
STEPS = int(os.environ.get("ABL_STEPS", "20"))
FS = 2_048_000


def main():
    import jax
    import jax.numpy as jnp

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode
    from pebblesdr_tpu.demod import am as am_mod
    from pebblesdr_tpu.ops import (agc, decimator, fastfir, iir, mixer,
                                   resampler, signalstrength, spectrum)
    from pebblesdr_tpu.core import db as dbu

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=FRAMES,
                         channels=CHANNELS, mode=DemodMode.AM, agc_stride=16)
    rx = Receiver(cfg)
    params = rx.default_params(250_000.0)

    t = np.arange(FRAMES) / FS
    env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
    iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64)
    iq_ri = np.broadcast_to(
        np.stack([iq.real, iq.imag]).astype(np.float32)[None, :, :, None],
        (BLOCKS, 2, FRAMES, CHANNELS)).copy()
    iq_dev = jnp.asarray(iq_ri)

    def partial_step(state, params, blk_tm, upto, spectra):
        """Prefix of Receiver._step_impl; `upto` picks how far to run."""
        out = {}
        blk = jax.lax.complex(blk_tm[0].T, blk_tm[1].T)
        dc, x = iir.dc_removal_chunked(state.dc, blk, alpha=0.9999)
        new = dict(dc=dc)
        if upto >= 1:
            mix_state, x = mixer.mix(state.mixer, x, params.tune_hi,
                                     params.tune_lo)
            decim_state, x = decimator.apply(rx.plan, state.decim, x)
            new.update(mixer=mix_state, decim=decim_state)
        if upto >= 2:  # zoomed power + smeter (always-on squelch source)
            xw = x * rx.w_zoom[None, :]
            norm = 1.0 / (x.shape[-1] * rx.cg_zoom)
            power_lin = spectrum._shifted_power(xw) * (norm * norm)
            power_lin = jax.lax.optimization_barrier(power_lin)
            sm = signalstrength.fd_estimate_masked(power_lin, params.sm_band,
                                                   params.sm_noise)
            out["snr"] = sm["snr_db"]
        if upto >= 3:
            mask = jax.lax.complex(params.bp_mask[0], params.bp_mask[1])
            ff_state, x = fastfir.apply(state.fastfir, x, mask)
            new.update(fastfir=ff_state)
        if upto >= 4:
            agc_state, x = agc.agc_apply(rx.agc_cfg, state.agc, x)
            demod_state, audio = am_mod.am_demod(rx.am_cfg, state.demod, x)
            new.update(agc=agc_state, demod=demod_state)
            x = audio
        if upto >= 5:
            resamp_state, x = resampler.apply(rx.rs_plan, state.resamp, x)
            new.update(resamp=resamp_state)
        if upto >= 6 and spectra:
            raw_tail = jax.lax.complex(
                jnp.transpose(blk_tm[0, -cfg.spectrum_bins:, :]),
                jnp.transpose(blk_tm[1, -cfg.spectrum_bins:, :]))
            spec_full_state, full_db, overload = spectrum.averaged_spectrum(
                state.spec_full, raw_tail,
                rx.w_full, rx.cg_full, smoothing=0.5)
            out["spectrum"] = full_db
            new.update(spec_full=spec_full_state)
        out["x"] = x
        import dataclasses as _dc
        return _dc.replace(state, **new), out

    import functools

    def make_fn(upto, spectra):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fn(state, params, iq_ri):
            def body(st, blk_ri):
                return partial_step(st, params, blk_ri, upto, spectra)
            return jax.lax.scan(body, state, iq_ri)
        return fn

    # HONEST SYNC (see bench.py): block_until_ready() can lie over the axon
    # tunnel; only a pre-warmed scalar fetch truly drains the queue.
    sync = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    names = ["dc only", "+mix+cascade", "+zoompower+smeter", "+fastfir",
             "+agc+am", "+resampler", "+full-spectrum"]
    prev = 0.0
    for upto in range(7):
        fn = make_fn(upto, spectra=(upto >= 6))
        state = jax.jit(lambda: rx.init_state())()
        st, out = fn(state, params, iq_dev)
        float(sync(out["x"]))
        st, out = fn(st, params, iq_dev)
        float(sync(out["x"]))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, out = fn(st, params, iq_dev)
        float(sync(out["x"]))
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        print(f"{names[upto]:>20s}: {dt:7.3f} ms/block  (+{dt-prev:６.3f})"
              .replace("６", "6"))
        prev = dt

    # full _step_many for reference
    state = jax.jit(lambda: rx.init_state())()

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("spectra",))
    def full(state, iq_ri, spectra):
        return rx._step_many_impl(state, params, iq_ri, spectra=spectra)

    for spectra in (False, True):
        st = jax.jit(lambda: rx.init_state())()
        st, out = full(st, iq_dev, spectra)
        float(sync(out["audio"]))
        st, out = full(st, iq_dev, spectra)
        float(sync(out["audio"]))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, out = full(st, iq_dev, spectra)
        float(sync(out["audio"]))
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        print(f"full step_many spectra={spectra!s:>5s}: {dt:7.3f} ms/block")


if __name__ == "__main__":
    main()
