"""Sharded whole-chain step: one wideband capture -> many demodulated channels
across a (channel x time) device mesh.

This is BASELINE.json config #4/#5: channels shard as a pure map (DP analog);
the wideband front end (NCO mix + decimator cascade) runs time-sharded under
jax.shard_map with explicit ppermute halo exchange (SP/CP analog, see
parallel.time_shard); the decimated narrowband tail of the chain
(FastFIR -> AGC -> demod -> resample) runs channel-sharded with XLA placing
any remaining collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverState
from pebblesdr_tpu.demod.modes import is_wfm
from pebblesdr_tpu.ops.mixer import MixerState
from pebblesdr_tpu.parallel import time_shard


def init_state(rx: Receiver) -> ReceiverState:
    """Receiver state for the sharded step: like rx.init_state() but the
    decimator carry is the COMPOSED-front form — the last D post-mix samples
    [C, D] complex64 (D = composed group delay) instead of per-stage tails.
    The composed history is the more fundamental state (the per-stage tails
    are derivable from it, not vice versa) and is what the one-halo sharded
    front end threads."""
    import dataclasses as _dc

    from pebblesdr_tpu.ops import decimator as _dm

    d = len(_dm.compose_response(rx.plan)) - 1
    base = rx.init_state()
    return _dc.replace(base, decim=jnp.zeros((rx.cfg.channels, d),
                                             jnp.complex64))


def build_sharded_step(rx: Receiver, mesh):
    """Returns a jitted step(state, params, iq) for iq [C, N] sharded
    (channel, time) over the mesh; state from channelizer.init_state(rx).

    The wideband front end (NCO mix + ENTIRE decimator cascade) runs
    time-sharded as the noble-identity composed FIR — the sharded twin of the
    single-chip fused front end: ONE ppermute halo of D post-mix samples and
    one banded matmul per shard, instead of a halo exchange per cascade
    stage.  The decimated tail (narrowband FastFIR/AGC/demod or the WFM
    composite path) runs channel-sharded; XLA places the reshard gather."""
    if rx.use_pallas:
        raise ValueError(
            "build_sharded_step drives the staged/composed XLA front end; "
            "construct the Receiver with use_pallas=False (the sharded "
            "front end runs its own time-shard halo-exchange path, not the "
            "single-chip fused kernel)")
    from pebblesdr_tpu.ops import decimator as decim_mod

    plan = rx.plan
    csh = NamedSharding(mesh, P("channel", None))
    h = decim_mod.compose_response(plan)
    d = len(h) - 1
    n_time = mesh.shape["time"]
    n_local = rx.cfg.frames_per_buffer // n_time
    if n_local % plan.factor:
        raise ValueError(f"per-shard chunk {n_local} not divisible by the "
                         f"decimation factor {plan.factor}")

    front = jax.shard_map(
        functools.partial(_front_end, h, plan.factor),
        mesh=mesh,
        in_specs=(P("channel"), P("channel", None),
                  P("channel", "time"), P("channel"), P("channel")),
        out_specs=(P("channel"), P("channel", None),
                   P("channel", "time")),
        check_vma=False,
    )

    @jax.jit
    def step(state: ReceiverState, params, iq):
        phase2, new_carry, x = front(state.mixer.phase, state.decim, iq,
                                       params.tune_hi, params.tune_lo)
        # reshard the (much smaller) decimated stream to channel-only; XLA
        # inserts the gather over the 'time' axis here
        x = lax.with_sharding_constraint(x, csh)
        taps_out = {}
        if is_wfm(rx.cfg.mode):
            out = {}
            (audio, demod_state, resamp_state, agc_state, anf_state,
             ff_state, rds_state) = rx._wfm_path(state, x, taps_out, out)
        else:
            audio, demod_state, resamp_state, agc_state, anf_state, ff_state = (
                rx._narrowband_path(state, params, x, taps_out))
            rds_state = state.rds
        new_state = ReceiverState(
            mixer=MixerState(phase=phase2), decim=new_carry,
            fastfir=ff_state, dc=state.dc, nb=state.nb, anf=anf_state,
            agc=agc_state, demod=demod_state, resamp=resamp_state,
            spec_full=state.spec_full, spec_zoom=state.spec_zoom,
            rds=rds_state, squelch=state.squelch)
        return new_state, audio

    return step


def _front_end(h_np, factor, phase0, carry, xl, hi, lo):
    phase2, new_carry, y = time_shard.sharded_composed_front(
        xl, phase0, hi, lo, carry, h_np, factor, "time")
    return phase2, new_carry, y
