"""Fused Pallas downconvert kernel vs the reference ops pipeline (interpret
mode on CPU; the same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.ops import decimator, mixer, pallas_kernels as pk


class TestFusedDownconvert:
    def _run_reference(self, plan, x, hi, lo, blocks):
        c = x.shape[0]
        ms = mixer.mixer_init(c)
        ds = decimator.state_init(plan, c)
        outs = []
        n = x.shape[-1] // blocks
        for b in range(blocks):
            ms, y = mixer.mix(ms, jnp.asarray(x[:, b * n:(b + 1) * n]), hi, lo)
            ds, y = decimator.apply(plan, ds, y)
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1)

    def test_matches_ops_pipeline(self):
        fs = 1_024_000
        plan = decimator.build_plan(fs, 20_000)
        c, n, blocks = 8, 8192, 3
        rng = np.random.default_rng(0)
        x = (rng.normal(size=(c, blocks * n))
             + 1j * rng.normal(size=(c, blocks * n))).astype(np.complex64)
        hi, lo = mixer.split_freq(123_456.0, fs)
        ref = self._run_reference(plan, x, hi, lo, blocks)

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
            y_ri, tails, phase = pk.fused_downconvert(
                x_ri, phase, fhi, flo, tails, taps_tuple, tile_c=8,
                interpret=True)
            outs.append(np.asarray(y_ri[:, 0] + 1j * y_ri[:, 1]))
        got = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_per_channel_tuning(self):
        fs = 512_000
        plan = decimator.build_plan(fs, 30_000)
        c, n = 8, 8192
        t = np.arange(n) / fs
        freqs = np.linspace(-200_000, 200_000, c)
        x = np.stack([np.exp(2j * np.pi * f * t) for f in freqs]).astype(np.complex64)
        splits = [mixer.split_freq(f, fs) for f in freqs]
        fhi = jnp.asarray(np.stack([s[0] for s in splits]))
        flo = jnp.asarray(np.stack([s[1] for s in splits]))
        taps_tuple = pk.plan_taps_tuple(plan)
        tails = tuple(jnp.zeros((c, 2, len(tt) - 1), jnp.float32)
                      for tt in taps_tuple)
        x_ri = jnp.asarray(np.stack([x.real, x.imag], axis=1))
        y_ri, _, _ = pk.fused_downconvert(
            x_ri, jnp.zeros((c,), jnp.float32), fhi, flo, tails, taps_tuple,
            tile_c=8, interpret=True)
        y = np.asarray(y_ri[:, 0] + 1j * y_ri[:, 1])
        # each channel tuned its own tone to DC: constant phasor, unit power
        tail_part = y[:, y.shape[-1] // 2:]
        for ch in range(c):
            assert np.std(np.angle(tail_part[ch] * np.conj(tail_part[ch][0]))) < 0.02
            assert np.mean(np.abs(tail_part[ch]) ** 2) == pytest.approx(1.0, rel=0.05)
