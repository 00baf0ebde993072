"""Block/state conventions for the whole framework.

Unit of work: one time-block of complex IQ, shape ``[channels, n]`` complex64.
Every DSP stage is a pure function ``(state, x) -> (state', y)`` where ``state``
is a registered-pytree dataclass holding exactly the information that crosses
block boundaries (filter tails, oscillator phase, PLL/AGC/EWMA state, fractional
resampler offsets).  This replaces the reference's per-object mutable members +
QMutex (e.g. decimator.h:282, agc.h:135) with checkpointable, shardable state.

``pytree_dataclass`` registers a frozen dataclass as a JAX pytree; fields marked
``static_field()`` become aux_data (hashable, trigger recompilation on change).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any) -> dataclasses.Field:
    """Mark a dataclass field as static (pytree aux data, not a leaf)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["pebblesdr_static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls=None, **kwargs):
    """Decorator: frozen dataclass registered as a JAX pytree node."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("pebblesdr_static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **changes):
    """dataclasses.replace that works on our frozen pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
