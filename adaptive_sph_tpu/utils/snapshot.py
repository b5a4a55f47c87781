"""Host-side snapshot extraction: FluidState -> numpy dict of alive particles."""

from __future__ import annotations

import numpy as np

from ..models.state import FluidState
from ..ops import kernels
from ..utils.params import ParticleSizes, SimulationParams


def take_snapshot(state: FluidState, params: SimulationParams = None) -> dict:
    alive = np.asarray(state.alive)
    out = {}
    for name in (
        "position", "velocity", "pressure_accel", "mass", "density", "pressure", "aii",
        "ppe_source_term", "density_error", "h", "level", "has_level", "stash",
        "constant_field", "neighbor_count", "size_class",
        "flag_is_fluid_surface", "flag_neighborhood_reduced", "flag_insufficient_neighs",
    ):
        out[name] = np.asarray(getattr(state, name))[alive]
    out["time"] = float(state.time)
    out["n"] = int(alive.sum())
    if params is not None:
        out["min_dist_to_neighbor"] = min_dist_to_neighbor(out, params)
    return out


def min_dist_to_neighbor(snapshot: dict, params: SimulationParams) -> np.ndarray:
    """Nearest-neighbor distance / smoothing length, chained with 2.0 (colors.rs:458-473)."""
    from scipy.spatial import cKDTree

    pos = snapshot["position"]
    if len(pos) < 2:
        return np.full(len(pos), 2.0)
    tree = cKDTree(pos)
    d, _ = tree.query(pos, k=2)
    nearest = d[:, 1]
    if params.particle_sizes == ParticleSizes.Uniform:
        h = np.full(len(pos), params.h)
    else:
        h = snapshot["h"]
    return np.minimum(nearest / np.maximum(h, 1e-12), 2.0)
