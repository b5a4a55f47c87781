"""Multi-chip execution: particle-sharded step over a jax.sharding.Mesh.

The reference has no distributed execution (rayon threads only, SURVEY.md section 2);
the TPU-native equivalent is data parallelism over the particle axis: every
fixed-capacity (C, ...) state array is sharded over a 1-D device mesh ('p'), the jitted
step is compiled under GSPMD, and XLA inserts the collectives (all-gathers for the
neighbor-structure gathers, reduce-scatters for segment sums, all-reduces for the CFL
min and solver statistics) over ICI.

This follows the canonical recipe: pick a mesh, annotate shardings, let the compiler
place collectives. It is the COMPATIBILITY fallback, not the scaling path: the
neighbor-structure gathers make GSPMD all-gather the particle arrays, so per-step
communication grows with total N (effectively replicated compute with sharded
storage). The production multi-chip path is spatial slab sharding with explicit
ppermute halo exchange (`parallel/tile_sharding.py`, `SlabSimulation`), used
whenever the config runs on the tile engine; this module covers the remaining
configs (e.g. `constrain_neighborhood_count`) so every feature has a multi-chip
story, at fallback performance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.simulation import make_step_fn
from ..models.state import FluidState

PARTICLE_AXIS = "p"


def make_mesh(n_devices: int = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        # this image's sitecustomize force-registers the axon TPU plugin even under
        # JAX_PLATFORMS=cpu; the virtual multi-device mesh lives on the CPU backend,
        # which coexists — fall back to it explicitly
        devices = jax.devices("cpu")
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (PARTICLE_AXIS,))


def state_sharding(state: FluidState, mesh: Mesh):
    """NamedShardings: particle arrays split over 'p', scalars replicated."""
    C = state.capacity

    def spec(a):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == C:
            return NamedSharding(mesh, P(PARTICLE_AXIS, *([None] * (a.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, state)


def shard_state(state: FluidState, mesh: Mesh) -> FluidState:
    shardings = state_sharding(state, mesh)
    return jax.tree.map(jax.device_put, state, shardings)


def make_sharded_step_fn(params, ncfg, boundary_handler, mesh: Mesh, split_patterns=None):
    """Jit the full step with sharded inputs/outputs over the mesh."""
    base = make_step_fn(params, ncfg, boundary_handler, split_patterns)

    def step(state):
        return base(state)

    # sharding flows in from the input placement; jit under the mesh context
    return jax.jit(step)


def run_sharded_step(sim_state: FluidState, params, ncfg, boundary_handler, mesh: Mesh,
                     split_patterns=None):
    """Shard the state, run one step under the mesh, return (state, diag)."""
    state = shard_state(sim_state, mesh)
    step = make_sharded_step_fn(params, ncfg, boundary_handler, mesh, split_patterns)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        out = step(state)
    return jax.block_until_ready(out)
