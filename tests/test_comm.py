"""comm collective wrappers + multihost plumbing on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pebblesdr_tpu.parallel import comm, mesh as mesh_mod, multihost

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _shard_map(f, m, in_specs, out_specs):
    return jax.jit(jax.shard_map(f, mesh=m, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))


class TestComm:
    def setup_method(self):
        self.mesh = mesh_mod.make_mesh(channel=1, time=8)
        self.x = jnp.arange(8.0).reshape(8, 1)  # shard i holds value i

    def test_ring_shift_right(self):
        f = _shard_map(lambda x: comm.ring_shift_right(x, "time"), self.mesh,
                       (P("time", None),), P("time", None))
        out = np.asarray(f(self.x)).ravel()
        np.testing.assert_array_equal(out, [0, 0, 1, 2, 3, 4, 5, 6])

    def test_ring_rotate(self):
        f = _shard_map(lambda x: comm.ring_rotate(x, "time", 1), self.mesh,
                       (P("time", None),), P("time", None))
        out = np.asarray(f(self.x)).ravel()
        np.testing.assert_array_equal(out, [7, 0, 1, 2, 3, 4, 5, 6])

    def test_all_sum_and_gather(self):
        f = _shard_map(lambda x: (comm.all_sum(x, "time"),
                                  comm.gather_axis(x, "time", 0)),
                       self.mesh, (P("time", None),),
                       (P(), P(None, None)))
        s, g = f(self.x)
        assert float(np.asarray(s).ravel()[0]) == 28.0
        np.testing.assert_array_equal(np.asarray(g).ravel(), np.arange(8.0))

    def test_broadcast_from(self):
        f = _shard_map(lambda x: comm.broadcast_from(x, "time", 3), self.mesh,
                       (P("time", None),), P("time", None))
        out = np.asarray(f(self.x)).ravel()
        np.testing.assert_array_equal(out, [3.0] * 8)

    def test_reduce_scatter(self):
        # each shard holds [8, 4] of ones; sum across shards then scatter rows
        x = jnp.ones((64, 4))
        f = _shard_map(lambda x: comm.reduce_scatter_sum(x, "time", 0),
                       self.mesh, (P("time", None),), P("time", None))
        out = np.asarray(f(x))
        assert out.shape == (8, 4)
        np.testing.assert_array_equal(out, np.full((8, 4), 8.0))


class TestMultihost:
    def test_global_mesh_single_process(self):
        m = multihost.global_mesh()
        assert m.devices.size == 8

    def test_distribute_host_blocks(self):
        m = multihost.global_mesh(channel=4, time=2)
        local = np.random.default_rng(0).normal(size=(4, 2, 256)).astype(np.float32)
        arr = multihost.distribute_host_blocks(m, local)
        assert arr.shape == (4, 2, 256)  # single process: global == local
        np.testing.assert_allclose(np.asarray(arr), local)

    def test_scaling_report(self):
        m = multihost.global_mesh(channel=8, time=1)

        @jax.jit
        def step(state, params, iq):
            return state + 1, jnp.abs(iq[:, 0] + 1j * iq[:, 1]).sum()

        iq = jnp.ones((8, 2, 1024))
        rep = multihost.scaling_report(step, jnp.zeros(()), None, iq, steps=3)
        assert rep["devices"] == 8 and rep["hosts"] == 1
        assert rep["samples_per_s"] > 0
