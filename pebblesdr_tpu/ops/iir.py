"""IIR filters: first-order sections and biquads as parallel associative scans.

Capability parity with CIir (pebblelib/iir.{h,cpp}: LP/HP/BP/BR biquads, direct
form 2, real & complex process) plus the first-order IIRs scattered through the
reference (AM DC removal alpha=0.9999 demod_am.cpp, WFM de-emphasis, EWMA
averagers).

TPU-first design: a linear recurrence y[n] = a*y[n-1] + b[n] is associative —
elements (a, b) compose as (a2*a1, a2*b1 + b2) — so instead of a per-sample
loop we run jax.lax.associative_scan (O(log N) depth, fully vectorized).
Biquads lift to the same form with 2x2 state matrices.  State crossing block
boundaries is the filter's final internal state, re-injected as the scan seed.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- first order

def first_order_apply(y_prev: jax.Array, x: jax.Array, a, b):
    """y[n] = a*y[n-1] + b*x[n], fully parallel.

    Fast path (static `a` with N*(1-a) small): closed form
        y[n] = a^n * (y_prev*a + cumsum(b*x[k] * a^{-k}))  — one cumsum.
    The a^{-k} weights grow by e^{N(1-a)}; used only when that factor < e^10.
    Otherwise: associative scan (O(log N) steps).

    y_prev: [C] previous output; x: [C, N] real or complex.
    Returns (y_last [C], y [C, N]).
    """
    n = x.shape[-1]
    if isinstance(a, (int, float)) and 0.0 < a < 1.0 and n * (1.0 - a) < 10.0:
        k = jnp.arange(n, dtype=jnp.float32)
        a_pow = jnp.exp(k * float(np.log(a))).astype(x.real.dtype)   # a^k
        a_inv = jnp.exp(-k * float(np.log(a))).astype(x.real.dtype)  # a^-k
        seed = (a * y_prev)[:, None].astype(x.dtype)
        terms = b * x * a_inv[None, :]
        y = a_pow[None, :] * (seed + jnp.cumsum(terms, axis=-1))
        return y[:, -1], y

    a = jnp.asarray(a, x.real.dtype)
    bx = b * x
    bx = bx.at[:, 0].add(a * y_prev)
    a_seq = jnp.broadcast_to(a, x.shape).astype(x.dtype)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, y = jax.lax.associative_scan(combine, (a_seq, bx), axis=-1)
    return y[:, -1], y


def dc_removal_apply(y_prev: jax.Array, x: jax.Array, alpha=0.9999):
    """One-pole DC blocker: y[n] = x[n] - m[n], m[n] = alpha*m[n-1]+(1-alpha)*x[n]
    (Demod_AM DC removal capability, demod_am.cpp:36-64).  y_prev carries m."""
    m_last, m = first_order_apply(y_prev, x, alpha, 1.0 - alpha)
    return m_last, x - m


def dc_removal_chunked(y_prev: jax.Array, x: jax.Array, alpha=0.9999,
                      chunk: int = 512):
    """DC blocker for FULL-RATE streams: the DC estimate is piecewise-constant
    per `chunk` samples (per-chunk means, EWMA across chunks with the
    equivalent per-chunk coefficient alpha^chunk).  The estimate tracks a
    quantity that by definition moves on >> chunk timescales, so this is
    equivalent to the per-sample blocker while touching the big array only
    twice (mean + subtract) instead of running a length-N recurrence."""
    c, n = x.shape
    if n % chunk:
        return dc_removal_apply(y_prev, x, alpha)
    means = jnp.mean(x.reshape(c, n // chunk, chunk), axis=-1)
    a_c = float(alpha) ** chunk
    m_last, m = first_order_apply(y_prev, means, a_c, 1.0 - a_c)
    y = x - jnp.repeat(m, chunk, axis=-1)
    return m_last, y


# ------------------------------------------------------------- biquads

@dataclasses.dataclass(frozen=True)
class BiquadCoef:
    b0: float
    b1: float
    b2: float
    a1: float
    a2: float


def design_biquad(kind: str, f0_hz: float, sample_rate: float, q: float) -> BiquadCoef:
    """RBJ-cookbook biquad design: kinds 'lowpass'|'highpass'|'bandpass'|'notch'
    (CIir capability: LP/HP/BP/BR, iir.h:21-42)."""
    w0 = 2.0 * math.pi * f0_hz / sample_rate
    alpha = math.sin(w0) / (2.0 * q)
    cw = math.cos(w0)
    if kind == "lowpass":
        b0, b1, b2 = (1 - cw) / 2, 1 - cw, (1 - cw) / 2
    elif kind == "highpass":
        b0, b1, b2 = (1 + cw) / 2, -(1 + cw), (1 + cw) / 2
    elif kind == "bandpass":
        b0, b1, b2 = alpha, 0.0, -alpha
    elif kind == "notch":
        b0, b1, b2 = 1.0, -2 * cw, 1.0
    else:
        raise ValueError(kind)
    a0 = 1 + alpha
    return BiquadCoef(b0 / a0, b1 / a0, b2 / a0, (-2 * cw) / a0, (1 - alpha) / a0)


def biquad_state_init(channels: int, dtype=jnp.float32) -> jax.Array:
    """DF2 state [C, 2]: (w[n-1], w[n-2])."""
    return jnp.zeros((channels, 2), dtype)


def biquad_apply(state: jax.Array, x: jax.Array, coef: BiquadCoef):
    """Direct-form-2 biquad over [C, N] via 2x2 associative matrix scan.

    w[n] = x[n] - a1 w[n-1] - a2 w[n-2];  y[n] = b0 w[n] + b1 w[n-1] + b2 w[n-2].
    Complex inputs filter re/im independently (linear filter).
    """
    if jnp.iscomplexobj(x):
        s_r, y_r = biquad_apply(state.real, x.real, coef)
        s_i, y_i = biquad_apply(state.imag, x.imag, coef)
        return jax.lax.complex(s_r, s_i), jax.lax.complex(y_r, y_i)

    c, n = x.shape
    dt = x.dtype
    m = jnp.asarray([[-coef.a1, -coef.a2], [1.0, 0.0]], dt)           # [2,2]
    ms = jnp.broadcast_to(m, (c, n, 2, 2))
    bvec = jnp.stack([x, jnp.zeros_like(x)], axis=-1)                  # [C,N,2]
    # fold carried state into first element: b0' = M @ v_prev + [x0, 0]
    bvec = bvec.at[:, 0, :].add(jnp.einsum("ij,cj->ci", m, state))

    def combine(l, r):
        ml, bl = l
        mr, br = r
        return jnp.einsum("...ij,...jk->...ik", mr, ml), jnp.einsum(
            "...ij,...j->...i", mr, bl) + br

    _, v = jax.lax.associative_scan(combine, (ms, bvec), axis=1)       # [C,N,2]
    w = v[..., 0]
    w1 = jnp.concatenate([state[:, :1], w[:, :-1]], axis=-1)
    w2 = jnp.concatenate([state[:, 1:2], w1[:, :-1]], axis=-1)
    y = coef.b0 * w + coef.b1 * w1 + coef.b2 * w2
    return v[:, -1, :], y


def deemphasis_alpha(tau_us: float, sample_rate: float) -> float:
    """De-emphasis one-pole coefficient for 75us (US) / 50us (EU) FM audio."""
    return math.exp(-1.0 / (tau_us * 1e-6 * sample_rate))
