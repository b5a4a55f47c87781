"""Checkpoint/resume: dump and restore the full FluidState.

The reference has no checkpointing (SURVEY.md section 5.4 calls it out as a gap the
rebuild should close). With fixed-capacity SoA arrays this is a single npz of the
state pytree plus the scalar clock; capacity may change on load (re-padding).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models.state import FluidState


def save_state(path: str, state: FluidState):
    arrays = {f.name: np.asarray(getattr(state, f.name)) for f in dataclasses.fields(state)}
    # compact alive rows to the front host-side: the runtime state order is
    # arbitrary (the tile backend keeps its sorted layout with padding holes),
    # but load_state's capacity-shrink truncates by index
    alive = arrays["alive"]
    order = np.argsort(np.where(alive, np.arange(len(alive)), len(alive) + np.arange(len(alive))), kind="stable")
    for k, a in arrays.items():
        if a.ndim >= 1 and a.shape[0] == len(alive):
            arrays[k] = a[order]
    np.savez_compressed(path, **arrays)


def load_state(path: str, capacity: int = None) -> FluidState:
    data = np.load(path)
    cur_cap = data["position"].shape[0]
    capacity = capacity or cur_cap

    def fit(a):
        if a.ndim == 0 or a.shape[0] != cur_cap:
            return jnp.asarray(a)
        if capacity == cur_cap:
            return jnp.asarray(a)
        out = np.zeros((capacity,) + a.shape[1:], a.dtype)
        n = min(capacity, cur_cap)
        out[:n] = a[:n]
        return jnp.asarray(out)

    kw = {k: fit(data[k]) for k in data.files}
    st = FluidState(**kw)
    assert int(st.n) <= capacity, "capacity too small for checkpointed particle count"
    return st
