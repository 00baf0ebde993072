#!/usr/bin/env python
"""Honest component benchmarks for the receive chain on the axon TPU tunnel.

CRITICAL harness rule (discovered the hard way): over the axon tunnel,
`block_until_ready()` does NOT reliably wait for device completion — it can
return at enqueue time, making a 0.3 ms/block computation "measure" as
0.02 ms/block, and the backlog then drains into whatever is timed next.
The ONLY trustworthy sync is fetching a small float32 scalar to the host
through a PRE-WARMED jitted reduction (`float(sync(x))`), which cannot
complete until every queued dependency has executed.  Use >=40 steps: there
is also a ~25 ms fixed queue fill/drain cost per timed region.

Usage: python tools/truebench.py [front|chain|pallas|all]
"""

import functools
import os
import sys
import time
import dataclasses as dc

import numpy as np

CHANNELS = int(os.environ.get("TB_CHANNELS", "64"))
FRAMES = int(os.environ.get("TB_FRAMES", "32768"))
BLOCKS = int(os.environ.get("TB_BLOCKS", "8"))
STEPS = int(os.environ.get("TB_STEPS", "40"))
FS = 2_048_000


def main():
    import jax
    import jax.numpy as jnp

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode
    from pebblesdr_tpu.ops import decimator, iir, mixer

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=FRAMES,
                         channels=CHANNELS, mode=DemodMode.AM, agc_stride=16)
    rx = Receiver(cfg)
    params = rx.default_params(250_000.0)

    t = np.arange(FRAMES) / FS
    env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
    iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64)
    # [K*N, 2C] lane-packed planes: the zero-copy entry layout
    plane = np.concatenate([
        np.broadcast_to(iq.real.astype(np.float32)[:, None],
                        (FRAMES, CHANNELS)),
        np.broadcast_to(iq.imag.astype(np.float32)[:, None],
                        (FRAMES, CHANNELS))], axis=1)
    iq_dev = jnp.asarray(np.tile(plane, (BLOCKS, 1)))

    sync = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def measure(name, fn, state, pick):
        """fn(state, iq) -> (state, out); pick(out) -> a float32 array."""
        s = state
        s, out = fn(s, iq_dev)
        float(sync(pick(out)))          # warm compile + drain
        s, out = fn(s, iq_dev)
        float(sync(pick(out)))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, out = fn(s, iq_dev)
        float(sync(pick(out)))
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        msps = CHANNELS * FRAMES / (dt * 1e-3) / 1e6
        print(f"{name:>28s}: {dt:7.3f} ms/block  ({msps:7.0f} Msps)")
        return dt

    if which in ("front", "all"):
        def front_body(state, p, blk_pk):
            blk = jax.lax.complex(blk_pk[:, :CHANNELS].T,
                                  blk_pk[:, CHANNELS:].T)
            dcs, x = iir.dc_removal_chunked(state.dc, blk, alpha=0.9999)
            mix_state, x = mixer.mix(state.mixer, x, p.tune_hi, p.tune_lo)
            decim_state, x = decimator.apply(rx.plan, state.decim, x)
            return dc.replace(state, dc=dcs, mixer=mix_state,
                              decim=decim_state), {"xa": jnp.abs(x)}

        @functools.partial(jax.jit, donate_argnums=(0,))
        def front(state, iq_ri):
            return jax.lax.scan(lambda s, b: front_body(s, params, b),
                                state, iq_ri.reshape(BLOCKS, FRAMES, -1))

        st = jax.jit(lambda: rx.init_state())()
        measure("front XLA (dc+mix+cascade)", front, st, lambda o: o["xa"])

    if which in ("pallas", "all"):
        from pebblesdr_tpu.ops import pallas_kernels as pk

        h = decimator.compose_response(rx.plan)
        d = len(h) - 1
        d_rows = ((d + 7) // 8) * 8
        sub = min(4096, FRAMES)
        wt = jnp.asarray(np.ascontiguousarray(
            pk.build_composed_w(h, rx.plan.factor, sub, d_rows - d).T))
        f_hi = jnp.full((CHANNELS,), 0.1, jnp.float32)
        f_lo = jnp.zeros((CHANNELS,), jnp.float32)

        def pfront_body(carry, x_pk):
            dc_pk, phase, tail = carry
            y_pk, dc_pk, tail, phase, _ = pk.fused_front_packed(
                x_pk, dc_pk, phase, f_hi, f_lo, tail, wt,
                rx.plan.factor, d_rows, 0.9999, sub_block=sub)
            return (dc_pk, phase, tail), {"ya": jnp.abs(y_pk)}

        @jax.jit
        def pfront(carry, iq_ri):
            return jax.lax.scan(pfront_body, carry,
                                iq_ri.reshape(BLOCKS, FRAMES, -1))

        carry0 = (jnp.zeros((1, 2 * CHANNELS), jnp.float32),
                  jnp.zeros((CHANNELS,), jnp.float32),
                  jnp.zeros((d_rows, 2 * CHANNELS), jnp.float32))
        measure("front fused (dc+mix+decim)", pfront, carry0,
                lambda o: o["ya"])

    if which in ("chain", "all"):
        @functools.partial(jax.jit, static_argnames=("spectra",))
        def step(state, p, iq_ri, spectra=True):
            return rx._step_many_impl(state, p, iq_ri, spectra=spectra)

        for spectra in (False, True):
            st = jax.jit(lambda: rx.init_state())()
            fn = lambda s, iq: step(s, params, iq, spectra=spectra)
            measure(f"full chain spectra={spectra}", fn, st,
                    lambda o: o["audio"])


if __name__ == "__main__":
    main()
