"""Pallas TPU kernels: fused downconvert (NCO mix + halfband cascade).

The CDownConvert analog (pebblelib/downconvert.cpp:257-325 fuses oscillator +
decimation per-sample for CPU speed): here ONE Pallas kernel keeps the entire
wideband front end in VMEM — read the [C, 2, N] float32 IQ block from HBM
once, generate the per-channel phase ramp, complex-multiply, run every
decimate-by-2 polyphase stage on-chip, and write only the 2^k-times-smaller
baseband block (plus the per-stage carry tails) back to HBM.  The op is
bandwidth-bound, so eliminating the per-stage HBM round-trips puts it at the
speed-of-light input-read bound.

Grid: channel tiles (TILE_C channels per program); everything inside a tile
is plain jnp on VMEM refs (VPU work, static shapes).  Falls back to the
ops.mixer + ops.decimator XLA path when unavailable (use_pallas=False or
non-TPU backends — the kernel also runs under interpret=True for CPU tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TWO_PI = 2.0 * math.pi


def _cascade_kernel(taps_list, n, tile_c,
                    x_ref, phase_ref, fhi_ref, flo_ref, *refs):
    """refs: [tail_in_0..k-1, y_ref, tail_out_0..k-1]."""
    k = len(taps_list)
    tail_in = refs[:k]
    y_ref = refs[k]
    tail_out = refs[k + 1:]

    xr = x_ref[:, 0, :]
    xi = x_ref[:, 1, :]

    # ---- NCO mix: exact split-precision phase ramp (ops.mixer semantics) ----
    i = jax.lax.broadcasted_iota(jnp.float32, (tile_c, n), 1)
    fhi = fhi_ref[:, 0][:, None]
    flo = flo_ref[:, 0][:, None]
    ramp = jnp.mod(i * fhi, 1.0) + i * flo
    ph = jnp.mod(phase_ref[:, 0][:, None] + ramp, 1.0)
    ang = TWO_PI * ph
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    # (xr + j*xi) * exp(-j*ang)
    yr = xr * c + xi * s
    yi = xi * c - xr * s

    # ---- halfband cascade, polyphase shifted adds, all in VMEM -------------
    for st in range(k):
        taps = taps_list[st]
        t = len(taps)
        tr = tail_in[st][:, 0, :]
        ti = tail_in[st][:, 1, :]
        er = jnp.concatenate([tr, yr], axis=-1)  # [TC, L + T - 1]
        ei = jnp.concatenate([ti, yi], axis=-1)
        ln = yr.shape[-1]
        m = ln // 2
        # new tails = last T-1 columns of the extended input
        tail_out[st][:, 0, :] = er[:, -(t - 1):]
        tail_out[st][:, 1, :] = ei[:, -(t - 1):]
        # even/odd split
        l2 = er.shape[-1]
        if l2 % 2:
            er = jnp.concatenate([er, jnp.zeros((tile_c, 1), jnp.float32)], -1)
            ei = jnp.concatenate([ei, jnp.zeros((tile_c, 1), jnp.float32)], -1)
            l2 += 1
        er2 = er.reshape(tile_c, l2 // 2, 2)
        ei2 = ei.reshape(tile_c, l2 // 2, 2)
        ee_r, eo_r = er2[:, :, 0], er2[:, :, 1]
        ee_i, eo_i = ei2[:, :, 0], ei2[:, :, 1]
        acc_r = None
        acc_i = None
        for j in range(t):
            h = float(taps[j])
            if h == 0.0:
                continue
            idx = t - 1 - j
            off = idx // 2
            if (idx & 1) == 0:
                term_r = h * jax.lax.slice_in_dim(ee_r, off, off + m, axis=1)
                term_i = h * jax.lax.slice_in_dim(ee_i, off, off + m, axis=1)
            else:
                term_r = h * jax.lax.slice_in_dim(eo_r, off, off + m, axis=1)
                term_i = h * jax.lax.slice_in_dim(eo_i, off, off + m, axis=1)
            acc_r = term_r if acc_r is None else acc_r + term_r
            acc_i = term_i if acc_i is None else acc_i + term_i
        yr, yi = acc_r, acc_i

    y_ref[:, 0, :] = yr
    y_ref[:, 1, :] = yi


@functools.partial(jax.jit, static_argnames=("taps_tuple", "tile_c", "interpret"))
def fused_downconvert(x_ri: jax.Array, phase0: jax.Array, f_hi: jax.Array,
                      f_lo: jax.Array, tails_ri: tuple,
                      taps_tuple: tuple, tile_c: int = 8,
                      interpret: bool = False):
    """x_ri: [C, 2, N] f32; phase0/f_hi/f_lo: [C]; tails_ri: per-stage
    [C, 2, T_s-1] f32.  taps_tuple: tuple of tap tuples (static).

    Returns (y_ri [C, 2, N/2^k], new_tails_ri tuple, new_phase [C]).
    """
    c, _, n = x_ri.shape
    k = len(taps_tuple)
    m_out = n >> k
    assert c % tile_c == 0, (c, tile_c)
    grid = (c // tile_c,)

    def row_map(i):
        return (i, 0, 0)

    in_specs = [
        pl.BlockSpec((tile_c, 2, n), row_map),
        pl.BlockSpec((tile_c, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile_c, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile_c, 1), lambda i: (i, 0)),
    ]
    for taps in taps_tuple:
        in_specs.append(pl.BlockSpec((tile_c, 2, len(taps) - 1), row_map))

    out_shapes = [jax.ShapeDtypeStruct((c, 2, m_out), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_c, 2, m_out), row_map)]
    for taps in taps_tuple:
        out_shapes.append(jax.ShapeDtypeStruct((c, 2, len(taps) - 1), jnp.float32))
        out_specs.append(pl.BlockSpec((tile_c, 2, len(taps) - 1), row_map))

    kernel = functools.partial(_cascade_kernel, taps_tuple, n, tile_c)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_ri, phase0[:, None], f_hi[:, None], f_lo[:, None], *tails_ri)
    y_ri = outs[0]
    new_tails = tuple(outs[1:])
    # phase advance (host formula, same as ops.mixer.mix)
    nf = jnp.float32(n)
    new_phase = jnp.mod(phase0 + jnp.mod(nf * f_hi, 1.0) + nf * f_lo, 1.0)
    return y_ri, new_tails, new_phase


def plan_taps_tuple(plan) -> tuple:
    """ops.decimator.DecimatorPlan -> static taps tuple for the kernel."""
    return tuple(tuple(float(v) for v in st.taps) for st in plan.stages)
