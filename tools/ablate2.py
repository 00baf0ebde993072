#!/usr/bin/env python
"""Drop-one-stage ablation of the full AM chain: which stage carries the cost?

Clones Receiver._step_impl with individual stages no-op'd (keeping shapes and
state threading identical) and times a scan over K blocks.
"""

import os
import time
import functools
import dataclasses as dc

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
    from pebblesdr_tpu.ops import (agc, decimator, fastfir, fir, iir, mixer,
                                   resampler, signalstrength, spectrum)

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=FRAMES,
                         channels=CHANNELS, mode=DemodMode.AM, agc_stride=16)
    rx = Receiver(cfg)
    params = rx.default_params(250_000.0)

    t = np.arange(FRAMES) / FS
    env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
    iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64)
    iq_dev = jnp.asarray(np.broadcast_to(
        np.stack([iq.real, iq.imag]).astype(np.float32),
        (BLOCKS, CHANNELS, 2, FRAMES)).copy())

    def step(state, blk, drop):
        out = {}
        dc_c, x = iir.dc_removal_chunked(state.dc, blk, alpha=0.9999)
        mix_state, x = mixer.mix(state.mixer, x, params.tune_hi, params.tune_lo)
        decim_state, x = decimator.apply(rx.plan, state.decim, x)

        if "zoompow" not in drop:
            xw = x * rx.w_zoom[None, :]
            norm = 1.0 / (x.shape[-1] * rx.cg_zoom)
            power_lin = spectrum._shifted_power(xw) * (norm * norm)
            power_lin = jax.lax.optimization_barrier(power_lin)
            sm = signalstrength.fd_estimate_masked(power_lin, params.sm_band,
                                                   params.sm_noise)
            out["snr"] = sm["snr_db"]
            squelch_open = sm["snr_db"] > -999.0
        else:
            squelch_open = jnp.ones((CHANNELS,), bool)

        if "fastfir" not in drop:
            mask = jax.lax.complex(params.bp_mask[0], params.bp_mask[1])
            ff_state, x = fastfir.apply(state.fastfir, x, mask)
        else:
            ff_state = state.fastfir
        if "agc" not in drop:
            agc_state, x = agc.agc_apply(rx.agc_cfg, state.agc, x)
        else:
            agc_state = state.agc
        if "amdc" not in drop:
            dc2, audio = iir.dc_removal_apply(state.demod.dc, jnp.abs(x),
                                              alpha=0.9999)
        else:
            dc2, audio = state.demod.dc, jnp.abs(x)
        if "amfir" not in drop:
            audio, lp_tail = fir.fir_apply_real_signal(
                audio, None, state.demod.lp_tail, taps_np=rx.am_cfg.taps)
        else:
            lp_tail = state.demod.lp_tail
        demod_state = am_mod.AMState(dc=dc2, lp_tail=lp_tail)
        if "resamp" not in drop:
            resamp_state, audio = resampler.apply(rx.rs_plan, state.resamp,
                                                  audio)
        else:
            resamp_state = state.resamp
            audio = audio[:, :rx.audio_blk]
        gate = squelch_open.astype(jnp.float32)
        out["audio"] = audio * gate[:, None]
        new_state = dc.replace(state, dc=dc_c, mixer=mix_state,
                               decim=decim_state, fastfir=ff_state,
                               agc=agc_state, demod=demod_state,
                               resamp=resamp_state)
        return new_state, out

    import dataclasses as dc

    def make_fn(drop):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fn(state, iq_ri):
            def body(st, b):
                blk = jax.lax.complex(b[:, 0], b[:, 1])
                return step(st, blk, drop)
            return jax.lax.scan(body, state, iq_ri)
        return fn

    cases = [("none", ()), ("zoompow", ("zoompow",)), ("fastfir", ("fastfir",)),
             ("agc", ("agc",)), ("amdc", ("amdc",)), ("amfir", ("amfir",)),
             ("resamp", ("resamp",)),
             ("all-tail", ("zoompow", "fastfir", "agc", "amdc", "amfir",
                           "resamp"))]
    base = None
    for name, drop in cases:
        fn = make_fn(drop)
        st = jax.jit(lambda: rx.init_state())()
        st, out = fn(st, iq_dev)
        out["audio"].block_until_ready()
        st, out = fn(st, iq_dev)
        out["audio"].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, out = fn(st, iq_dev)
        out["audio"].block_until_ready()
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        note = ""
        if base is None:
            base = dt
        else:
            note = f"  (saves {base-dt:+.3f})"
        print(f"drop {name:>9s}: {dt:7.3f} ms/block{note}")


if __name__ == "__main__":
    main()
