"""High-level runner: wires params + scene + boundary + step function together.

This is the rebuild's equivalent of fluid_main (main_loop.rs:209-361): owns the state,
invokes the jitted step, surfaces diagnostics (the reference's per-step console output
and panic guards become structured checks here).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import numpy as np

from .models import scene as scene_mod
from .models.simulation import make_step_fn
from .models.state import FluidState
from .ops import kernels
from .ops.neighbors import NeighborConfig
from .utils import params as params_mod
from .utils.params import ParticleSizes, SimulationParams
from .utils.stats import Counters


class SimulationFailed(RuntimeError):
    pass


@dataclasses.dataclass
class Simulation:
    params: SimulationParams
    scene: scene_mod.SceneConfig
    state: FluidState
    step_fn: object
    boundary_handler: object
    ncfg: NeighborConfig
    counters: Counters
    check_invariants: bool = True

    @property
    def time(self) -> float:
        return float(self.state.time)

    @property
    def num_fluid_particles(self) -> int:
        return int(self.state.n)

    def step(self):
        """One simulation step; raises SimulationFailed on the reference's panic conditions."""
        t0 = time.perf_counter()
        new_state, diag = self.step_fn(self.state)
        new_state = jax.block_until_ready(new_state)
        elapsed = time.perf_counter() - t0

        if self.check_invariants:
            neg_aii = int(diag["negative_aii"])
            if neg_aii > 0:
                raise SimulationFailed(f"AII should not be negative! ({neg_aii} particles)")
            ro, co, lo = (int(x) for x in diag["neighbor_overflow"])
            if ro > 0 or co > 0 or lo > 0:
                raise SimulationFailed(
                    f"neighbor structure overflow: rows over by {ro}, cell={co}, level={lo} "
                    f"(raise NeighborConfig.row_width / max_per_cell / levels)"
                )
            if not np.isfinite(float(diag["dt"])):
                raise SimulationFailed("non-finite dt")
            if "aii_deviation" in diag:
                dev = float(diag["aii_deviation"])
                if not dev < 0.01:  # f32 tolerance (simulation.rs:1369-1374)
                    raise SimulationFailed(f"a_ii check failed: max deviation {dev}")
            if "mass_conservation_error" in diag:
                err = float(diag["mass_conservation_error"])
                if not err < 0.005:  # simulation.rs:2791-2792
                    raise SimulationFailed(f"mass not conserved after adaptivity: {err}")

        self.state = new_state
        self.counters.add_time("simulation-step", elapsed)
        self.counters.add_value("particle-count", float(new_state.n))
        self.counters.add_value("dt", float(diag["dt"]))
        if "div_iterations" in diag and int(diag["div_iterations"]) > 0:
            self.counters.add_value("div-iterations", float(diag["div_iterations"]))
        if "density_iterations" in diag and int(diag["density_iterations"]) > 0:
            self.counters.add_value("density-iterations", float(diag["density_iterations"]))
        return diag

    def run_until(self, t_end: float, max_steps: int = 10**9):
        steps = 0
        while self.time < t_end and steps < max_steps:
            self.step()
            steps += 1
        return steps


def neighbor_config_for(
    params: SimulationParams,
    capacity: int,
    row_width: Optional[int] = None,
    max_per_cell: Optional[int] = None,
    mass_range: Optional[tuple] = None,
) -> NeighborConfig:
    if params.particle_sizes == ParticleSizes.Uniform:
        levels = 1
    elif mass_range is not None and not (params.splitting or params.merging or params.sharing):
        # adaptivity off: masses are constant, so the exact level count follows from
        # the initial size ratio (h ~ sqrt(mass) in 2D)
        ratio = float(np.sqrt(mass_range[1] / max(mass_range[0], 1e-30)))
        levels = max(1, int(np.ceil(np.log2(max(ratio, 1.0)))) + 1)
    else:
        levels = params_mod.num_levels_for(params)
    if row_width is None:
        # optimal count ~14.4; extended level-estimation search needs
        # (level_estimation_range / (ETA * 2))^2 more; adaptive interfaces add headroom
        base = kernels.optimal_neighbor_number(2)
        ext = max(1.0, (params.level_estimation_range / (kernels.ETA * 2.0)) ** 2)
        row_width = int(np.ceil(base * ext * 2.0 / 16.0) * 16)
        if params.particle_sizes == ParticleSizes.Adaptive:
            row_width = max(row_width, 96)
    if max_per_cell is None:
        max_per_cell = 48
    return NeighborConfig(
        capacity=capacity, row_width=row_width, levels=levels, max_per_cell=max_per_cell
    )


def create_simulation(
    params: SimulationParams,
    scene: scene_mod.SceneConfig,
    capacity: Optional[int] = None,
    row_width: Optional[int] = None,
    split_patterns=None,
    counters_enabled: bool = True,
) -> Simulation:
    """init_simulation_params + init_fluid_sim + step compilation."""
    params = params_mod.init_h_for_uniform(
        params, scene.blocks[0].spacing, scene.blocks[0].volume_fill_ratio
    )
    state = scene_mod.init_fluid_state(scene, params, capacity)
    masses = np.asarray(state.mass)[np.asarray(state.alive)]
    mass_range = (float(masses.min()), float(masses.max())) if masses.size else None
    ncfg = neighbor_config_for(params, state.capacity, row_width, mass_range=mass_range)
    boundary_handler = scene_mod.make_boundary_handler(scene, params)

    if split_patterns is None and params.particle_sizes == ParticleSizes.Adaptive and (
        params.splitting
    ):
        from .utils.split_patterns import load_default_patterns

        split_patterns = load_default_patterns()

    step_fn = make_step_fn(params, ncfg, boundary_handler, split_patterns)
    return Simulation(
        params=params,
        scene=scene,
        state=state,
        step_fn=step_fn,
        boundary_handler=boundary_handler,
        ncfg=ncfg,
        counters=Counters(enabled=counters_enabled),
    )
