"""Second-order phase-locked loops as lax.scan kernels.

One generic PLL engine serves every PLL in the reference:
  * SAM carrier recovery (demod_sam.cpp:5-112: BW 100 Hz, zeta .707, +-1 kHz)
  * NFM NCO-PLL discriminator (demod_nfm.cpp:225-257)
  * WFM 19 kHz stereo pilot PLL (demod_wfm.cpp:154-196,370+)
  * RDS 57 kHz subcarrier PLL (demod_wfm.cpp:301-317)

The loop is inherently sequential (phase error feeds back into the next
sample's NCO) so it runs as a lax.scan with per-channel scalar state — the
only truly serial op in the chain; everything around it is vectorized.  Loop
gains follow the standard 2nd-order design: alpha = 2*zeta*wn, beta = wn^2,
wn = 2*pi*BW/fs (same derivation the reference uses).

The phase detector is pluggable: 'atan2' (full four-quadrant, SAM/NFM) or
'cross' (Im(x * e^{-j\\phi}) small-angle product, pilot/RDS).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pebblesdr_tpu.core.block import pytree_dataclass, static_field

TWO_PI = 2.0 * math.pi


@pytree_dataclass
class PLLConfig:
    alpha: float = static_field()
    beta: float = static_field()
    freq_center: float = static_field()  # radians/sample NCO center
    freq_lo: float = static_field()      # radians/sample clamp
    freq_hi: float = static_field()
    detector: str = static_field(default="atan2")


def make_pll_config(sample_rate: float, bw_hz: float, zeta: float = 0.707,
                    center_hz: float = 0.0, range_hz: float = 1000.0,
                    detector: str = "atan2") -> PLLConfig:
    wn = TWO_PI * bw_hz / sample_rate
    norm = TWO_PI / sample_rate
    return PLLConfig(
        alpha=2.0 * zeta * wn,
        beta=wn * wn,
        freq_center=center_hz * norm,
        freq_lo=(center_hz - range_hz) * norm,
        freq_hi=(center_hz + range_hz) * norm,
        detector=detector,
    )


@pytree_dataclass
class PLLState:
    phase: jax.Array  # [C] radians
    fdev: jax.Array   # [C] radians/sample DEVIATION from freq_center — keeping
    #                   the integrator near zero preserves float32 precision
    #                   (beta*err increments are ~1e-9; adding them to an
    #                   absolute 0.2 rad/sample frequency underflows in f32)
    amp: jax.Array    # [C] EWMA of |input| (detector gain normalization)


def pll_init(cfg: PLLConfig, channels: int) -> PLLState:
    return PLLState(
        phase=jnp.zeros((channels,), jnp.float32),
        fdev=jnp.zeros((channels,), jnp.float32),
        amp=jnp.full((channels,), 1.0, jnp.float32),
    )


def pll_run(cfg: PLLConfig, state: PLLState, x: jax.Array):
    """Track the carrier in x [C, N] complex64.

    Returns (state', phases [C, N], freqs [C, N]) — per-sample NCO phase (the
    phase *used* to mix each sample) and the instantaneous loop frequency
    (absolute, radians/sample).  Callers build whatever they need from the
    phase (carrier removal, stereo demux sin(2*phase), FM audio from freq
    deviation, ...).
    """
    dev_lo = cfg.freq_lo - cfg.freq_center
    dev_hi = cfg.freq_hi - cfg.freq_center

    def step(carry, xt):  # xt: [C]
        phase, fdev, amp = carry
        amp2 = amp + 1e-3 * (jnp.abs(xt) - amp)
        if cfg.detector == "pilot":
            # real-signal PD: for x ~= A*sin(theta), x*cos(phi) low-passes to
            # (A/2)*sin(theta-phi); the 2w ripple is filtered by the narrow
            # loop (the CuteSDR pilot-PLL approach, demod_wfm.cpp:390+).
            # Locks with x ~= A*sin(phase).  Normalized by the tracked
            # amplitude so the loop bandwidth is independent of pilot level
            # (mean|A sin| = 2A/pi -> A/2 = (pi/4)*mean|x|).
            a_half = jnp.maximum((jnp.pi / 4.0) * amp2, 1e-6)
            err = xt.real * jnp.cos(phase) / a_half
        else:
            osc = jnp.exp(-1j * phase.astype(jnp.complex64))
            z = xt * osc
            if cfg.detector == "atan2":
                err = jnp.arctan2(z.imag, z.real)
            elif cfg.detector == "costas":
                # BPSK Costas loop (RDS subcarrier): Re*Im cancels the +-1
                # data modulation; normalized by the tracked power so loop
                # bandwidth is signal-level independent
                err = z.real * z.imag / jnp.maximum(amp2 * amp2, 1e-12)
            else:  # 'cross': small-angle product detector (complex carriers)
                err = z.imag * jnp.sign(z.real)
        fdev2 = jnp.clip(fdev + cfg.beta * err, dev_lo, dev_hi)
        phase2 = phase + (cfg.freq_center + fdev2) + cfg.alpha * err
        phase2 = jnp.mod(phase2 + jnp.pi, TWO_PI) - jnp.pi
        return (phase2, fdev2, amp2), (phase, fdev2)

    (ph, fr, am), (phases, fdevs) = jax.lax.scan(
        step, (state.phase, state.fdev, state.amp), jnp.moveaxis(x, 1, 0))
    return (PLLState(phase=ph, fdev=fr, amp=am),
            jnp.moveaxis(phases, 0, 1),
            jnp.moveaxis(fdevs, 0, 1) + cfg.freq_center)
