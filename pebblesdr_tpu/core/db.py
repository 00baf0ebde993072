"""dB / power / amplitude conversions and S-unit mapping.

Capability parity with the reference's static conversion helpers
(pebblelib/db.h:9-143): power<->dB, amplitude<->dB, S-units for the S-meter,
with clamping to a minimum dB floor.  Implemented for both host (numpy) use and
traced (jnp) use — all functions accept either array namespace transparently.
"""

from __future__ import annotations

import jax.numpy as jnp

# Floor used when converting zero/negative powers (reference clamps to -120 dB
# range for display; we use an explicit epsilon to stay jit-safe).
MIN_DB = -200.0
_EPS = 1e-20


def power_to_db(power):
    """10*log10(power), clamped to MIN_DB."""
    return jnp.maximum(10.0 * jnp.log10(jnp.maximum(power, _EPS)), MIN_DB)


def db_to_power(db):
    return jnp.power(10.0, db / 10.0)


def amplitude_to_db(amplitude):
    """20*log10(|amplitude|), clamped to MIN_DB."""
    return jnp.maximum(20.0 * jnp.log10(jnp.maximum(jnp.abs(amplitude), _EPS)), MIN_DB)


def db_to_amplitude(db):
    return jnp.power(10.0, db / 20.0)


# S-meter: S9 = -73 dBm, 6 dB per S-unit below, dB-over-S9 above
# (capability of DB::dBToSUnit, pebblelib/db.h).
S9_DBM = -73.0
DB_PER_S_UNIT = 6.0


def db_to_s_units(db):
    """Map dB(m) to S-units (S0..S9; values >9 mean dB over S9 / 6)."""
    return 9.0 + (db - S9_DBM) / DB_PER_S_UNIT


def clip_db(db, lo=MIN_DB, hi=0.0):
    return jnp.clip(db, lo, hi)
