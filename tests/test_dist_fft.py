"""TP-sharded four-step FFT (SURVEY §2.6 TP row) vs single-device jnp.fft."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pebblesdr_tpu.parallel import dist_fft
from pebblesdr_tpu.parallel import mesh as mesh_mod

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _mesh():
    return mesh_mod.make_mesh(channel=1, time=8)


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


class TestFourStepFft:
    @pytest.mark.parametrize("n1,n2", [(64, 128), (128, 64), (8, 1024)])
    def test_matches_dense_fft(self, n1, n2):
        m = _mesh()
        x = _rand(n1 * n2)
        x2d = jax.device_put(jnp.asarray(x.reshape(n1, n2)),
                             NamedSharding(m, P("time", None)))
        xk = dist_fft.fft_sharded(x2d, m)
        assert xk.shape == (n2, n1)
        got = np.asarray(xk).reshape(-1)
        ref = np.fft.fft(x)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)

    def test_output_stays_sharded_along_frequency(self):
        m = _mesh()
        x2d = jax.device_put(jnp.asarray(_rand(64 * 128).reshape(64, 128)),
                             NamedSharding(m, P("time", None)))
        xk = jax.jit(lambda a: dist_fft.fft_sharded(a, m))(x2d)
        # each device holds a contiguous frequency span (no full gather)
        assert len(xk.sharding.device_set) == 8
        shard_rows = {s.index[0].start for s in xk.addressable_shards}
        assert shard_rows == {i * 16 for i in range(8)}

    def test_indivisible_raises(self):
        m = _mesh()
        x2d = jnp.zeros((12, 128), jnp.complex64)
        with pytest.raises(ValueError, match="not divisible"):
            dist_fft.fft_sharded(x2d, m)


class TestShardedPowerSpectrum:
    def test_tone_lands_in_right_bin(self):
        m = _mesh()
        n1, n2 = 64, 256
        n = n1 * n2
        k0 = 3000
        t = np.arange(n)
        x = np.exp(2j * np.pi * k0 * t / n).astype(np.complex64)
        x2d = jax.device_put(jnp.asarray(x.reshape(n1, n2)),
                             NamedSharding(m, P("time", None)))
        p = np.asarray(dist_fft.power_spectrum_sharded(x2d, m))
        assert p.shape == (n,)
        assert np.argmax(p) == k0
        assert p[k0] == pytest.approx(1.0, rel=1e-3)
        sidelobes = np.delete(p, k0)
        assert np.max(sidelobes) < 1e-6

    def test_windowed_matches_dense(self):
        from pebblesdr_tpu.core import windows

        m = _mesh()
        n1, n2 = 64, 128
        n = n1 * n2
        x = _rand(n, seed=5)
        w = windows.window(windows.WindowType.HANNING, n)
        x2d = jax.device_put(jnp.asarray(x.reshape(n1, n2)),
                             NamedSharding(m, P("time", None)))
        p = np.asarray(dist_fft.power_spectrum_sharded(x2d, m, window=w))
        ref = np.abs(np.fft.fft(x * w)) ** 2 / n**2
        np.testing.assert_allclose(p, ref, atol=1e-7)
