"""Mode-expert parallelism (EP, SURVEY §2.6): static routing of channels to
per-mode expert chains must (a) group correctly, (b) match the single-mode
Receiver bit-for-bit, (c) run with experts placed on disjoint device groups."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.demod.modes import DemodMode
from pebblesdr_tpu.parallel import expert

FS = 512_000
N = 8192


def _capture():
    """One wideband block: AM station at +100 kHz, NFM station at -50 kHz."""
    rng = np.random.default_rng(7)
    t = np.arange(N) / FS
    am = (1 + 0.6 * np.cos(2 * np.pi * 1000.0 * t)) / 2 * np.exp(
        2j * np.pi * 100_000.0 * t)
    dev = 3000.0
    ph = 2 * np.pi * np.cumsum(dev * np.sin(2 * np.pi * 700.0 * t)) / FS
    fm = 0.5 * np.exp(1j * (2 * np.pi * -50_000.0 * t + ph))
    noise = 0.001 * (rng.normal(size=N) + 1j * rng.normal(size=N))
    return (am + fm + noise).astype(np.complex64)


class TestRouting:
    def test_groups_preserve_order(self):
        a = [expert.ChannelAssignment(DemodMode.AM, 1.0),
             expert.ChannelAssignment(DemodMode.FMN, 2.0),
             expert.ChannelAssignment(DemodMode.AM, 3.0),
             expert.ChannelAssignment(DemodMode.FMN, 4.0),
             expert.ChannelAssignment(DemodMode.AM, 5.0)]
        groups = expert.route_channels(a)
        assert [g.mode for g in groups] == [DemodMode.AM, DemodMode.FMN]
        assert groups[0].channel_ids == (0, 2, 4)
        assert groups[1].channel_ids == (1, 3)
        np.testing.assert_allclose(groups[0].tunes, [1.0, 3.0, 5.0])

    def test_partition_devices_proportional(self):
        groups = expert.route_channels(
            [expert.ChannelAssignment(DemodMode.AM, 0.0)] * 6
            + [expert.ChannelAssignment(DemodMode.FMN, 0.0)] * 2)
        parts = expert.partition_devices(list(range(8)), groups)
        assert [len(p) for p in parts] == [6, 2]
        assert sorted(sum(parts, [])) == list(range(8))

    def test_partition_devices_min_one(self):
        groups = expert.route_channels(
            [expert.ChannelAssignment(DemodMode.AM, 0.0)] * 15
            + [expert.ChannelAssignment(DemodMode.FMN, 0.0)])
        parts = expert.partition_devices(list(range(4)), groups)
        assert all(len(p) >= 1 for p in parts)
        assert sum(len(p) for p in parts) == 4

    def test_partition_devices_skewed_overshoot(self):
        """channels [10, 1, 1] on 4 devices: the max(1,...) lift overshoots
        the device count and must be reconciled (advisor round-1) — every
        expert still gets >= 1 device and no device is double-assigned."""
        groups = expert.route_channels(
            [expert.ChannelAssignment(DemodMode.AM, 0.0)] * 10
            + [expert.ChannelAssignment(DemodMode.FMN, 0.0)]
            + [expert.ChannelAssignment(DemodMode.USB, 0.0)])
        parts = expert.partition_devices(list(range(4)), groups)
        assert [len(p) for p in parts] == [2, 1, 1]
        assert sorted(sum(parts, [])) == list(range(4))

    def test_partition_devices_many_skewed(self):
        for n_dev in (3, 4, 5, 6, 7, 8):
            for sizes in ((10, 1, 1), (1, 1, 1), (5, 4, 3), (100, 1, 2)):
                a = []
                modes = [DemodMode.AM, DemodMode.FMN, DemodMode.USB]
                for m, s in zip(modes, sizes):
                    a += [expert.ChannelAssignment(m, 0.0)] * s
                groups = expert.route_channels(a)
                parts = expert.partition_devices(list(range(n_dev)), groups)
                assert all(len(p) >= 1 for p in parts), (n_dev, sizes)
                assert sum(len(p) for p in parts) <= n_dev
                flat = sum(parts, [])
                assert len(set(flat)) == len(flat)


class TestMixedModeStep:
    def test_matches_single_mode_receivers(self):
        cap = _capture()
        assignments = [
            expert.ChannelAssignment(DemodMode.AM, 100_000.0),
            expert.ChannelAssignment(DemodMode.FMN, -50_000.0),
            expert.ChannelAssignment(DemodMode.AM, 101_000.0),
        ]
        ch = expert.ModeExpertChannelizer(FS, N, assignments)
        assert ch.n_experts == 2
        states = ch.init_states()
        iq = jnp.asarray(np.broadcast_to(cap, (3, N)).copy())

        # two blocks: carried state must thread exactly per expert
        outs1 = outs2 = None
        for _ in range(2):
            states, outs = ch.step(states, iq)
            outs1, outs2 = outs2, outs

        # standalone single-mode receivers, same tunes, same input rows
        rx_am = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                        channels=2, mode=DemodMode.AM))
        p_am = rx_am.default_params(np.array([100_000.0, 101_000.0]))
        st = rx_am.init_state()
        iq_am = jnp.asarray(np.broadcast_to(cap, (2, N)).copy())
        for _ in range(2):
            st, ref_am = rx_am.step(st, p_am, iq_am, spectra=False)

        rx_fm = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                        channels=1, mode=DemodMode.FMN))
        p_fm = rx_fm.default_params(np.array([-50_000.0]))
        st = rx_fm.init_state()
        for _ in range(2):
            st, ref_fm = rx_fm.step(st, p_fm, iq[1:2], spectra=False)

        np.testing.assert_allclose(np.asarray(outs2[0]["audio"]),
                                   np.asarray(ref_am["audio"]),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(outs2[1]["audio"]),
                                   np.asarray(ref_fm["audio"]),
                                   rtol=0, atol=1e-5)

    def test_audio_by_channel_mapping(self):
        cap = _capture()
        assignments = [
            expert.ChannelAssignment(DemodMode.AM, 100_000.0),
            expert.ChannelAssignment(DemodMode.FMN, -50_000.0),
            expert.ChannelAssignment(DemodMode.AM, 100_000.0),
        ]
        ch = expert.ModeExpertChannelizer(FS, N, assignments)
        states = ch.init_states()
        iq = jnp.asarray(cap[None, :])  # shared single capture row
        _, outs = ch.step(states, iq)
        audio = ch.audio_by_channel(outs)
        assert set(audio) == {0, 1, 2}
        # channels 0 and 2 are the same expert, same tune -> identical audio
        np.testing.assert_array_equal(audio[0], audio[2])
        assert not np.allclose(audio[0], audio[1])

    def test_retune_no_recompile(self):
        cap = _capture()
        assignments = [expert.ChannelAssignment(DemodMode.AM, 100_000.0),
                       expert.ChannelAssignment(DemodMode.AM, 90_000.0)]
        ch = expert.ModeExpertChannelizer(FS, N, assignments)
        states = ch.init_states()
        iq = jnp.asarray(np.broadcast_to(cap, (2, N)).copy())
        states, outs = ch.step(states, iq)
        before = int(ch.receivers[0]._step._cache_size())
        ch.retune(1, 100_000.0)
        states, outs = ch.step(states, iq)
        assert int(ch.receivers[0]._step._cache_size()) == before
        # after retuning ch1 onto the AM station both channels decode it
        a = np.asarray(outs[0]["audio"])
        assert np.std(a[1]) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestExpertDevicePlacement:
    def test_experts_on_disjoint_device_groups(self):
        cap = _capture()
        assignments = ([expert.ChannelAssignment(DemodMode.AM, 100_000.0)] * 4
                       + [expert.ChannelAssignment(DemodMode.FMN, -50_000.0)] * 4)
        devs = jax.devices()
        ch = expert.ModeExpertChannelizer(FS, N, assignments, devices=devs)
        assert [len(d) for d in ch.device_groups] == [4, 4]
        assert set(ch.device_groups[0]).isdisjoint(ch.device_groups[1])
        states = ch.init_states()
        iq = jnp.asarray(np.broadcast_to(cap, (8, N)).copy())
        for _ in range(2):
            states, outs = ch.step(states, iq)
        for out in outs:
            a = np.asarray(out["audio"])
            assert np.all(np.isfinite(a))
        # placement: expert 0's audio lives on its own device group
        d0 = outs[0]["audio"].devices()
        d1 = outs[1]["audio"].devices()
        assert d0.isdisjoint(d1)
