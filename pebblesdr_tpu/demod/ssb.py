"""SSB/CW/DSB demodulation: sideband-filtered product detection.

Capability parity with Demod's simple USB/LSB path (application/demod.cpp:
143-166): after the FastFIR bandpass has already selected the sideband, SSB
audio is simply I+Q (USB) or I-Q (LSB); CW is SSB with a narrow filter and
tone offset (handled by the bandpass design, demod.cpp:124-138); DSB is 2*I.
Stateless and fully elementwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def usb_demod(x: jax.Array) -> jax.Array:
    return (x.real + x.imag).astype(jnp.float32)


def lsb_demod(x: jax.Array) -> jax.Array:
    return (x.real - x.imag).astype(jnp.float32)


def dsb_demod(x: jax.Array) -> jax.Array:
    return (2.0 * x.real).astype(jnp.float32)
