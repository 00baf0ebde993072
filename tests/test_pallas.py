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


class TestFusedFrontPlanes:
    """fused_front_planes (DC + NCO + composed-FIR matmul) vs the staged
    dc_removal_chunked -> mixer.mix -> decimator.apply pipeline."""

    def test_matches_staged_pipeline_streaming(self):
        from pebblesdr_tpu.ops import iir

        fs = 2_048_000
        plan = decimator.build_plan(fs, 30_000)
        f = plan.factor
        h = decimator.compose_response(plan)
        d = len(h) - 1
        d_rows = ((d + 7) // 8) * 8
        sub = 2048
        wt = jnp.asarray(np.ascontiguousarray(
            pk.build_composed_w(h, f, sub, d_rows - d).T))

        c, n, blocks = 8, 8192, 3
        rng = np.random.default_rng(1)
        xs = [(rng.normal(size=(c, n)) + 1j * rng.normal(size=(c, n))
               ).astype(np.complex64) for _ in range(blocks)]
        splits = [mixer.split_freq(250_000.0, fs)] * c
        hi = jnp.asarray(np.array([s[0] for s in splits]))
        lo = jnp.asarray(np.array([s[1] for s in splits]))

        dc = jnp.zeros((c,), jnp.complex64)
        ms = mixer.mixer_init(c)
        ds = decimator.state_init(plan, c)
        refs = []
        for b in xs:
            dc, y = iir.dc_removal_chunked(dc, jnp.asarray(b), alpha=0.9999)
            ms, y = mixer.mix(ms, y, hi, lo)
            ds, y = decimator.apply(plan, ds, y)
            refs.append(np.asarray(y))
        ref = np.concatenate(refs, -1)

        dc_ri = jnp.zeros((2, c), jnp.float32)
        phase = jnp.zeros((c,), jnp.float32)
        tail = jnp.zeros((2 * d_rows, c), jnp.float32)
        outs = []
        for b in xs:
            yr, yi, dc_ri, tail, phase, _, _ = pk.fused_front_planes(
                jnp.asarray(b.real.T.copy()), jnp.asarray(b.imag.T.copy()),
                dc_ri, phase, hi, lo, tail, wt, f, d_rows, 0.9999,
                sub_block=sub, interpret=True)
            outs.append(np.asarray(yr).T + 1j * np.asarray(yi).T)
        got = np.concatenate(outs, -1)

        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 3e-5

    def test_compose_response_equals_cascade(self):
        plan = decimator.build_plan(2_048_000, 30_000)
        h = decimator.compose_response(plan)
        # DC gain of the composed filter == product of unity stage gains
        assert abs(h.sum() - 1.0) < 1e-9
        # impulse through the staged pipeline == composed response, decimated
        c = 1
        n = 4096
        x = np.zeros((c, n), np.complex64)
        x[0, 0] = 1.0
        ds = decimator.state_init(plan, c)
        _, y = decimator.apply(plan, ds, jnp.asarray(x))
        y = np.asarray(y)[0]
        f = plan.factor
        d = len(h) - 1
        expect = np.zeros_like(y)
        # y[m] = H[f*m] for f*m <= d (impulse at 0, zero history)
        for m in range(len(y)):
            if f * m <= d:
                expect[m] = h[f * m]
        assert np.abs(y - expect).max() < 1e-6
