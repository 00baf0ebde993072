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
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverState
from pebblesdr_tpu.demod.modes import is_wfm
from pebblesdr_tpu.ops.mixer import MixerState
from pebblesdr_tpu.parallel import time_shard


def build_sharded_step(rx: Receiver, mesh):
    """Returns a jitted step(state, params, iq) for iq [C, N] sharded
    (channel, time) over the mesh.  The wideband front end (mix + cascade)
    runs time-sharded with explicit ppermute halos for every mode; the
    decimated tail (narrowband FastFIR/AGC/demod or the WFM composite
    discriminator/pilot/stereo path) runs channel-sharded."""
    if rx.use_pallas:
        raise ValueError(
            "build_sharded_step needs the staged decimator state (per-stage "
            "tails); construct the Receiver with use_pallas=False — the "
            "sharded front end runs its own time-shard halo-exchange path, "
            "not the single-chip fused kernel")
    plan = rx.plan
    csh = NamedSharding(mesh, P("channel", None))
    n_stages = len(plan.stages)

    front = jax.shard_map(
        functools.partial(_front_end, plan),
        mesh=mesh,
        in_specs=(P("channel"), tuple(P("channel", None) for _ in range(n_stages)),
                  P("channel", "time"), P("channel"), P("channel")),
        out_specs=(P("channel"), tuple(P("channel", None) for _ in range(n_stages)),
                   P("channel", "time")),
        check_vma=False,
    )

    @jax.jit
    def step(state: ReceiverState, params, iq):
        phase2, new_carries, x = front(state.mixer.phase, state.decim, iq,
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
            mixer=MixerState(phase=phase2), decim=new_carries,
            fastfir=ff_state, dc=state.dc, nb=state.nb, anf=anf_state,
            agc=agc_state, demod=demod_state, resamp=resamp_state,
            spec_full=state.spec_full, spec_zoom=state.spec_zoom,
            rds=rds_state, squelch=state.squelch)
        return new_state, audio

    return step


def _front_end(plan, phase0, carries, xl, hi, lo):
    phase2, y = time_shard.sharded_mix(phase0, xl, hi, lo, "time")
    new_carries, y = time_shard.sharded_decimator_apply(plan, carries, y, "time")
    return phase2, new_carries, y
