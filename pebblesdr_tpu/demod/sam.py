"""SAM (synchronous AM) demodulator: PLL carrier recovery + sideband mix.

Capability parity with Demod_SAM (application/demod/demod_sam.cpp:5-112):
PLL (BW 100 Hz, zeta .707, +-1 kHz range) locks to the carrier; the signal is
coherently mixed to baseband; DC removed; a 0..band Hz analytic (Hilbert)
filter splits hi/lo sidebands; output L=lo+hi / R=hi-lo (we emit the mono sum,
with the stereo-ish pair available).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.core.block import pytree_dataclass, static_field
from pebblesdr_tpu.ops import fir, iir, pll


@pytree_dataclass
class SAMConfig:
    sample_rate: float = static_field()
    pll: pll.PLLConfig = static_field()
    hilbert_taps: np.ndarray = static_field()

    @staticmethod
    def make(sample_rate: float, bandwidth: float = 10000.0) -> "SAMConfig":
        cfg = pll.make_pll_config(sample_rate, bw_hz=100.0, zeta=0.707,
                                  range_hz=1000.0, detector="atan2")
        # analytic filter 0..bandwidth/2 (demod_sam.cpp GenerateHBFilter(5000))
        taps = fir.design_hilbert(61, bandwidth / 4.0, bandwidth / 2.0, sample_rate)
        return SAMConfig(sample_rate=sample_rate, pll=cfg, hilbert_taps=taps)


@pytree_dataclass
class SAMState:
    pll: pll.PLLState
    dc: jax.Array
    hilbert_tail: jax.Array


def sam_init(cfg: SAMConfig, channels: int) -> SAMState:
    return SAMState(
        pll=pll.pll_init(cfg.pll, channels),
        dc=jnp.zeros((channels,), jnp.float32),
        hilbert_tail=fir.fir_tail_init(channels, len(cfg.hilbert_taps)),
    )


def sam_demod(cfg: SAMConfig, state: SAMState, x: jax.Array):
    """x: [C, N] complex64 -> (state', audio [C, N] float32 mono)."""
    pll_state, phases, _ = pll.pll_run(cfg.pll, state.pll, x)
    base = x * jnp.exp(-1j * phases.astype(jnp.complex64))
    # analytic split: hi sideband = +f part; lo = -f part (conj trick)
    taps_c = jnp.asarray(cfg.hilbert_taps, jnp.complex64)
    hi, tail = fir.fir_apply_complex(base, taps_c, state.hilbert_tail)
    # coherent detection: real part carries the AM modulation
    mono = base.real
    dc, audio = iir.dc_removal_apply(state.dc, mono, alpha=0.9999)
    return SAMState(pll=pll_state, dc=dc, hilbert_tail=tail), audio
