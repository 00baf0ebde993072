"""AM envelope demodulator.

Capability parity with Demod_AM (application/demod/demod_am.cpp:36-64):
magnitude detection, one-pole DC removal (alpha=0.9999), post low-pass FIR at
the filter bandwidth.  Fully vectorized — magnitude and FIR are elementwise /
conv; the DC blocker is an associative scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.core.block import pytree_dataclass, static_field
from pebblesdr_tpu.ops import fir, iir


@pytree_dataclass
class AMConfig:
    sample_rate: float = static_field()
    bandwidth: float = static_field()
    taps: np.ndarray = static_field()  # post-detect LP FIR (host-designed)

    @staticmethod
    def make(sample_rate: float, bandwidth: float = 12000.0) -> "AMConfig":
        taps = fir.design_lowpass_kaiser(bandwidth / 2.0, sample_rate, atten_db=50.0)
        return AMConfig(sample_rate=sample_rate, bandwidth=bandwidth, taps=taps)


@pytree_dataclass
class AMState:
    dc: jax.Array        # [C] DC-blocker mean
    lp_tail: jax.Array   # [C, taps-1] FIR tail


def am_init(cfg: AMConfig, channels: int) -> AMState:
    return AMState(
        dc=jnp.zeros((channels,), jnp.float32),
        lp_tail=fir.fir_tail_init(channels, len(cfg.taps), jnp.float32),
    )


def am_demod(cfg: AMConfig, state: AMState, x: jax.Array):
    """x: [C, N] complex64 (post-bandpass) -> (state', audio [C, N] float32)."""
    mag = jnp.abs(x)
    # chunked DC blocker: the alpha=0.9999 estimate has a ~160 ms time
    # constant, so a 256-sample (4 ms at 64 ksps) piecewise-constant estimate
    # is equivalent while costing two passes instead of a length-N recurrence
    dc, audio = iir.dc_removal_chunked(state.dc, mag, alpha=0.9999, chunk=256)
    audio, tail = fir.fir_apply_real_signal(audio, None, state.lp_tail,
                                            taps_np=cfg.taps)
    return AMState(dc=dc, lp_tail=tail), audio
