"""Time-major fused downconvert kernel (the TPU-compiling variant)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.ops import decimator, mixer, pallas_kernels as pk


class TestFusedDownconvertTM:
    def test_matches_ops_pipeline_streaming(self):
        fs = 1_024_000
        plan = decimator.build_plan(fs, 20_000)
        c, n, blocks = 8, 8192, 3
        rng = np.random.default_rng(1)
        x = (rng.normal(size=(c, blocks * n))
             + 1j * rng.normal(size=(c, blocks * n))).astype(np.complex64)
        hi, lo = mixer.split_freq(123_456.0, fs)

        ms = mixer.mixer_init(c)
        ds = decimator.state_init(plan, c)
        refs = []
        for b in range(blocks):
            ms, y = mixer.mix(ms, jnp.asarray(x[:, b * n:(b + 1) * n]), hi, lo)
            ds, y = decimator.apply(plan, ds, y)
            refs.append(np.asarray(y))
        ref = np.concatenate(refs, axis=-1)

        taps_tuple = pk.plan_taps_tuple(plan)
        phase = jnp.zeros((c,), jnp.float32)
        fhi = jnp.full((c,), hi, jnp.float32)
        flo = jnp.full((c,), lo, jnp.float32)
        tails = tuple(jnp.zeros((c, 2, len(t) - 1), jnp.float32)
                      for t in taps_tuple)
        outs = []
        for b in range(blocks):
            blk = x[:, b * n:(b + 1) * n]
            x_ri = jnp.asarray(np.stack([blk.real, blk.imag], axis=1))
            y_ri, tails, phase = pk.fused_downconvert_tm(
                x_ri, phase, fhi, flo, tails, taps_tuple, sub_block=2048,
                interpret=True)
            outs.append(np.asarray(y_ri[:, 0] + 1j * y_ri[:, 1]))
        got = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(got, ref, atol=3e-4)
