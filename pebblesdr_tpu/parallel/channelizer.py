"""Sharded whole-chain step: one wideband capture -> many demodulated channels
across a (channel x time) device mesh.

This is BASELINE.json config #4/#5: channels shard as a pure map (DP analog);
the wideband front end (DC blocker + NCO mix + decimator cascade) runs
time-sharded under jax.shard_map with explicit ppermute halo exchange (SP/CP
analog, see parallel.time_shard); the decimated narrowband tail of the chain
(FastFIR -> AGC -> demod -> resample) runs channel-sharded with XLA placing
any remaining collectives.

Two front ends, both streaming-exact vs the single-chip Receiver:

  * **fused** (default on TPU): pallas_kernels.fused_front_packed runs PER
    SHARD inside shard_map — the same single kernel (DC + factorized NCO +
    composed-FIR MXU dot) that gives the single-chip path its 0.066 ms/block
    front — with ONE ppermute halo of the D-sample post-mix tail and a
    closed-form DC-seed exchange (time_shard.sharded_dc_chunks), so each
    chip runs at full demonstrated front-end speed;
  * **staged** (CPU / fallback): time_shard.sharded_dc_removal +
    sharded_composed_front (noble-identity composed FIR as a banded matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverState
from pebblesdr_tpu.demod.modes import is_wfm
from pebblesdr_tpu.ops.mixer import MixerState
from pebblesdr_tpu.parallel import time_shard

DC_ALPHA = 0.9999  # matches the Receiver front end (demod_am.cpp:44 alpha)


def init_state(rx: Receiver) -> ReceiverState:
    """Receiver state for the sharded step: like rx.init_state() but the
    decimator carry is the COMPOSED-front form — the last D post-mix samples
    [C, D] complex64 (D = composed group delay) instead of per-stage tails —
    and the DC estimate is the plain [C] complex form (the single-chip fused
    front keeps both lane-packed; the sharded layouts shard cleanly over the
    'channel' axis instead).  The composed history is the more fundamental
    state (the per-stage tails are derivable from it, not vice versa) and is
    what the one-halo sharded front end threads."""
    import dataclasses as _dc

    from pebblesdr_tpu.ops import decimator as _dm

    d = len(_dm.compose_response(rx.plan)) - 1
    base = rx.init_state()
    c = rx.cfg.channels
    return _dc.replace(base,
                       decim=jnp.zeros((c, d), jnp.complex64),
                       dc=jnp.zeros((c,), jnp.complex64))


def build_sharded_step(rx: Receiver, mesh, fused: bool | None = None):
    """Returns a jitted step(state, params, iq) for iq [C, N] sharded
    (channel, time) over the mesh; state from channelizer.init_state(rx).

    fused=None picks the fused Pallas front end exactly when the single-chip
    Receiver would (rx.use_pallas); pass fused=True on a CPU mesh to force
    the kernel in interpret mode (how tests/test_parallel.py validates it),
    or fused=False to run the staged/composed XLA front on any backend.

    Either way the wideband front end (DC blocker + NCO mix + ENTIRE
    decimator cascade) runs time-sharded with ONE ppermute halo of D
    post-mix samples per block; the decimated tail (narrowband FastFIR/AGC/
    demod or the WFM composite path) runs channel-sharded; XLA places the
    reshard gather."""
    if fused is None:
        fused = rx.use_pallas
    if fused:
        front = _build_fused_front(rx, mesh)
    else:
        front = _build_staged_front(rx, mesh)
    csh = NamedSharding(mesh, P("channel", None))

    def tail_fn(state: ReceiverState, params, x):
        taps_out = {}
        if is_wfm(rx.cfg.mode):
            out = {}
            (audio, demod_state, resamp_state, agc_state, anf_state,
             ff_state, rds_state) = rx._wfm_path(state, x, taps_out, out)
        else:
            audio, demod_state, resamp_state, agc_state, anf_state, ff_state = (
                rx._narrowband_path(state, params, x, taps_out))
            rds_state = state.rds
        return (audio, demod_state, resamp_state, agc_state, anf_state,
                ff_state, rds_state)

    # The tail is a pure per-channel map, but left to GSPMD it is NOT
    # partitioned that way: XLA's partitioner has no sharded FFT, so the
    # FastFIR overlap-save FFT/IFFT gets ALL-GATHERED to every device and
    # computed redundantly (measured: 6 all-gathers, ~1 MB/block on an
    # 8-way channel mesh — the whole input volume).  Running the tail
    # under shard_map pins every per-channel op to its local shard and
    # makes the channel axis communication-free by construction.
    c_total = rx.cfg.channels

    def _spec_of(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == c_total):
            return P("channel", *([None] * (leaf.ndim - 1)))
        # WFM rails / stacked planes carry 2C or kC leading dims
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] > 0
                and leaf.shape[0] % c_total == 0
                and leaf.shape[0] // c_total <= 8):
            return P("channel", *([None] * (leaf.ndim - 1)))
        return P(*([None] * getattr(leaf, "ndim", 0)))

    def sharded_tail(state, params, x):
        in_specs = jax.tree.map(_spec_of, (state, params, x))
        out_shape = jax.eval_shape(tail_fn, state, params, x)
        out_specs = jax.tree.map(_spec_of, out_shape)
        return jax.shard_map(tail_fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
            state, params, x)

    @jax.jit
    def step(state: ReceiverState, params, iq):
        new_dc, phase2, new_carry, x = front(
            state.dc, state.mixer.phase, state.decim, iq,
            params.tune_hi, params.tune_lo)
        # reshard the (much smaller) decimated stream to channel-only; XLA
        # inserts the gather over the 'time' axis here
        x = lax.with_sharding_constraint(x, csh)
        (audio, demod_state, resamp_state, agc_state, anf_state,
         ff_state, rds_state) = sharded_tail(state, params, x)
        new_state = ReceiverState(
            mixer=MixerState(phase=phase2), decim=new_carry,
            fastfir=ff_state, dc=new_dc, nb=state.nb, anf=anf_state,
            agc=agc_state, demod=demod_state, resamp=resamp_state,
            spec_full=state.spec_full, spec_zoom=state.spec_zoom,
            rds=rds_state, squelch=state.squelch, iqbal=state.iqbal)
        return new_state, audio

    return step


# --------------------------------------------------------------------- staged

def _build_staged_front(rx: Receiver, mesh):
    from pebblesdr_tpu.ops import decimator as decim_mod

    plan = rx.plan
    h = decim_mod.compose_response(plan)
    n_time = mesh.shape["time"]
    n_local = rx.cfg.frames_per_buffer // n_time
    if n_local % plan.factor:
        raise ValueError(f"per-shard chunk {n_local} not divisible by the "
                         f"decimation factor {plan.factor}")

    return jax.shard_map(
        functools.partial(_staged_front_body, h, plan.factor),
        mesh=mesh,
        in_specs=(P("channel"), P("channel"), P("channel", None),
                  P("channel", "time"), P("channel"), P("channel")),
        out_specs=(P("channel"), P("channel"), P("channel", None),
                   P("channel", "time")),
        check_vma=False,
    )


def _staged_front_body(h_np, factor, dc0, phase0, carry, xl, hi, lo):
    new_dc, z = time_shard.sharded_dc_removal(xl, dc0, DC_ALPHA, "time")
    phase2, new_carry, y = time_shard.sharded_composed_front(
        z, phase0, hi, lo, carry, h_np, factor, "time")
    return new_dc, phase2, new_carry, y


# ---------------------------------------------------------------------- fused

def _build_fused_front(rx: Receiver, mesh):
    """The fused Pallas front end per (channel x time) shard.

    Halo protocol (all exchanges happen BEFORE the kernel runs, so the
    kernels themselves are embarrassingly parallel):
      1. DC seed: every shard computes its local per-chunk means and joins
         the cross-shard EWMA closed-form (one all_gather of [C_l] affines —
         time_shard.sharded_dc_chunks);
      2. post-mix tail: each shard DC-removes + mixes its own LAST D rows
         with XLA ops (D ~ a few hundred rows, negligible) and ppermutes
         them right (time_shard.left_halo); shard 0 consumes the carried
         global tail;
      3. each shard runs fused_front_packed on its [N_l, 2C_l] local plane
         with the seeded DC and received tail — identical kernel, identical
         per-chip cost, to the single-chip front.
    """
    from pebblesdr_tpu.ops import decimator as decim_mod
    from pebblesdr_tpu.ops import mixer as mixer_mod
    from pebblesdr_tpu.ops import pallas_kernels as pk

    plan = rx.plan
    factor = plan.factor
    h = np.asarray(decim_mod.compose_response(plan), np.float32)
    d = len(h) - 1
    d_rows = ((d + 7) // 8) * 8
    n_time = mesh.shape["time"]
    n_local = rx.cfg.frames_per_buffer // n_time
    sub = min(2048, n_local)
    if n_local % sub or sub % 512 or n_local % factor:
        raise ValueError(
            f"per-shard chunk {n_local} must divide into {sub}-row "
            f"sub-blocks of whole 512-sample DC chunks and the decimation "
            f"factor {factor}")
    wt = jnp.asarray(np.ascontiguousarray(
        pk.build_composed_w(h, factor, sub, d_rows - d).T))
    interpret = jax.devices()[0].platform == "cpu"

    def body(dc0, phase0, carry, xl, hi, lo):
        # xl: [C_l, N_l] complex64; carry: [C_l, D]; dc0/phase0/hi/lo: [C_l]
        i = lax.axis_index("time")
        c_l, nl = xl.shape
        hi_ = jnp.broadcast_to(jnp.asarray(hi, jnp.float32), phase0.shape)
        lo_ = jnp.broadcast_to(jnp.asarray(lo, jnp.float32), phase0.shape)

        # (1) DC seed exchange
        m_start, m_all, new_dc = time_shard.sharded_dc_chunks(
            xl, dc0, DC_ALPHA, "time", chunk=pk.DC_CHUNK)

        # (2) post-mix tail of THIS shard's last D rows -> right neighbor
        chunk_idx = np.arange(nl - d, nl) // pk.DC_CHUNK
        dc_tail = m_all[:, jnp.asarray(chunk_idx)]             # [C_l, D]
        k0 = (i * nl).astype(jnp.float32)
        shard_phase = jnp.mod(phase0 + jnp.mod(k0 * hi_, 1.0)
                              + jnp.mod(k0 * lo_, 1.0), 1.0)
        kt = jnp.float32(nl - d)
        tail_phase = jnp.mod(shard_phase + jnp.mod(kt * hi_, 1.0)
                             + kt * lo_, 1.0)
        osc = mixer_mod.oscillator(tail_phase, d, hi_, lo_)
        z_tail = (xl[:, nl - d:] - dc_tail) * osc              # [C_l, D]
        halo = time_shard.left_halo(z_tail, d, "time")
        lead = jnp.where(i == 0, carry, halo)

        # (3) the fused kernel on the local plane
        x_pk = jnp.concatenate([xl.real.T, xl.imag.T], axis=-1)
        tail_pk = jnp.concatenate([lead.real.T, lead.imag.T], axis=-1)
        tail_pk = jnp.pad(tail_pk, ((d_rows - d, 0), (0, 0)))
        dc_pk = jnp.concatenate([m_start.real, m_start.imag])[None, :]
        y_pk, _, _, _, _ = pk.fused_front_packed(
            x_pk, dc_pk, shard_phase, hi_, lo_, tail_pk, wt,
            factor, d_rows, DC_ALPHA, sub_block=sub, interpret=interpret)
        y = pk.unpack_to_complex(y_pk)                         # [C_l, N_l/F]

        new_carry = time_shard._last_shard_tail(z_tail, d, "time")
        ntot = jnp.float32(n_time * nl)
        phase2 = jnp.mod(phase0 + jnp.mod(ntot * hi_, 1.0) + ntot * lo_, 1.0)
        return new_dc, phase2, new_carry, y

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("channel"), P("channel"), P("channel", None),
                  P("channel", "time"), P("channel"), P("channel")),
        out_specs=(P("channel"), P("channel"), P("channel", None),
                   P("channel", "time")),
        check_vma=False,
    )
