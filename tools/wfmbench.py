#!/usr/bin/env python
"""Honest per-stage timing of the WFM-stereo tail on the TPU.

Geometry matches the 16ch x 32k bench block: composite rate = fs/factor,
N_comp = 32768/factor per block, scanned over BLOCKS blocks/dispatch.
"""

import functools
import os
import sys
import time

import numpy as np

CHANNELS = int(os.environ.get("WB_CHANNELS", "16"))
FRAMES = int(os.environ.get("WB_FRAMES", "32768"))
BLOCKS = int(os.environ.get("WB_BLOCKS", "32"))
STEPS = int(os.environ.get("WB_STEPS", "30"))
FS = 2_048_000


def main():
    import jax
    import jax.numpy as jnp

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode
    from pebblesdr_tpu.demod import wfm as wfm_mod
    from pebblesdr_tpu.ops import fir, iir, pll, resampler

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=FRAMES,
                         channels=CHANNELS, mode=DemodMode.FMS)
    rx = Receiver(cfg)
    wcfg = rx.wfm_cfg
    ncomp = rx.blk
    print(f"composite rate {rx.demod_rate}, N_comp {ncomp}, "
          f"audio_decim {wcfg.audio_decim}", file=sys.stderr)

    sync = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    rng = np.random.default_rng(0)
    comp_ri = jnp.asarray(rng.normal(size=(BLOCKS, 2, CHANNELS, ncomp))
                          .astype(np.float32))

    def measure(name, make_fn):
        fn, carry = make_fn()
        s, out = fn(carry, comp_ri)
        float(sync(out))
        s, out = fn(carry, comp_ri)
        float(sync(out))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, out = fn(carry, comp_ri)
        float(sync(out))
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        print(f"{name:>32s}: {dt:7.3f} ms/block")
        return dt

    def scan_of(body, make_carry0):
        @jax.jit
        def fn(carry, xs):
            return jax.lax.scan(body, carry, xs)
        return fn, jax.jit(make_carry0)()

    which = sys.argv[1:] or ["all"]

    if {"all", "demod"} & set(which):
        def mk():
            st0 = None
            def body(st, blk):
                x = jax.lax.complex(blk[0], blk[1])
                st, out = wfm_mod.wfm_demod(wcfg, st, x)
                return st, jnp.abs(out["left"]) + jnp.abs(out["right"])
            return scan_of(body, lambda: wfm_mod.wfm_init(wcfg, CHANNELS))
        measure("wfm_demod full stereo", mk)

    if {"all", "disc"} & set(which):
        def mk():
            def body(last, blk):
                x = jax.lax.complex(blk[0], blk[1])
                last, raw = wfm_mod.discriminator(last, x, 1.0)
                return last, jnp.abs(raw)
            return scan_of(body, lambda: jnp.zeros((CHANNELS,), jnp.complex64))
        measure("discriminator only", mk)

    if {"all", "pilot"} & set(which):
        def mk():
            def body(bq, blk):
                bq2, pilot = iir.biquad_apply(bq, blk[0], wcfg.pilot_bp)
                return bq2, jnp.abs(pilot)
            return scan_of(body, lambda: iir.biquad_state_init(CHANNELS))
        measure("pilot biquad BP", mk)

        def mk2():
            def body(ps, blk):
                ps2, phases, _ = pll.pll_run_blockwise(
                    wcfg.pilot_pll, ps, blk[0].astype(jnp.complex64),
                    chunk=wcfg.pilot_chunk)
                return ps2, jnp.abs(phases)
            return scan_of(body, lambda: pll.pll_init(wcfg.pilot_pll, CHANNELS))
        measure("pilot PLL blockwise", mk2)

    if {"all", "lp"} & set(which):
        def mk():
            taps = jnp.asarray(wcfg.audio_taps, jnp.float32)
            def body(tails, blk):
                ta, tb = tails
                a, ta2 = fir.fir_apply_real_signal(blk[0], taps, ta,
                                                   decim=wcfg.audio_decim)
                b, tb2 = fir.fir_apply_real_signal(blk[1], taps, tb,
                                                   decim=wcfg.audio_decim)
                return (ta2, tb2), jnp.abs(a) + jnp.abs(b)
            mk0 = lambda: fir.fir_tail_init(CHANNELS, len(wcfg.audio_taps),
                                            jnp.float32)
            return scan_of(body, lambda: (mk0(), mk0()))
        measure("2x audio LP FIR (decim)", mk)

    if {"all", "tailiir"} & set(which):
        def mk():
            n_a = ncomp // wcfg.audio_decim
            s0 = lambda: (iir.biquad_state_init(CHANNELS),
                  iir.biquad_state_init(CHANNELS),
                  jnp.zeros((CHANNELS,), jnp.float32),
                  jnp.zeros((CHANNELS,), jnp.float32))
            alpha = iir.deemphasis_alpha(wcfg.deemphasis_us, wcfg.audio_rate)
            def body(st, blk):
                nl, nr, dl, dr = st
                a = blk[0, :, :n_a]
                b = blk[1, :, :n_a]
                nl2, a2 = iir.biquad_apply(nl, a, wcfg.pilot_notch)
                nr2, b2 = iir.biquad_apply(nr, b, wcfg.pilot_notch)
                dl2, a3 = iir.first_order_apply(dl, a2, alpha, 1.0 - alpha)
                dr2, b3 = iir.first_order_apply(dr, b2, alpha, 1.0 - alpha)
                return (nl2, nr2, dl2, dr2), jnp.abs(a3) + jnp.abs(b3)
            return scan_of(body, s0)
        measure("2x notch + 2x deemph (audio)", mk)

    if {"all", "resamp"} & set(which):
        def mk():
            n_a = ncomp // wcfg.audio_decim
            def body(rs, blk):
                lr = jnp.concatenate([blk[0, :, :n_a], blk[1, :, :n_a]], axis=0)
                rs2, y = resampler.apply(rx.rs_plan, rs, lr)
                return rs2, jnp.abs(y)
            return scan_of(body, lambda: resampler.state_init(
                rx.rs_plan, 2 * CHANNELS, jnp.float32))
        measure("stereo fract resampler", mk)


if __name__ == "__main__":
    main()
