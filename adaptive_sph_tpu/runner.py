"""High-level runner: wires params + scene + boundary + step function together.

This is the rebuild's equivalent of fluid_main (main_loop.rs:209-361): owns the state,
invokes the jitted step, surfaces diagnostics (the reference's per-step console output
and panic guards become structured checks here).
"""

from __future__ import annotations

import dataclasses
import os
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
    tile_cfg: object = None
    grid_cfg: object = None
    backend: str = "auto"
    split_patterns: object = None
    clique_disabled: bool = False  # set after a halo/cross overflow fallback

    @property
    def time(self) -> float:
        return float(self.state.time)

    @property
    def num_fluid_particles(self) -> int:
        return int(self.state.n)

    def step(self, _retries: int = 2):
        """One simulation step; raises SimulationFailed on the reference's panic conditions.

        Tile-backend structure overflows (row padding / weight-cache blocks) are
        recoverable: the state has not advanced yet, so the runner grows the
        capacity (recompiling the step) and retries — the reference's analogue
        is its unbounded Vec::extend."""
        t0 = time.perf_counter()
        new_state, diag = self.step_fn(self.state)
        new_state = jax.block_until_ready(new_state)
        elapsed = time.perf_counter() - t0

        # ONE device->host transfer for all diagnostics (each separate np.asarray
        # is a full roundtrip — ~5 ms each through the axon tunnel)
        diag = jax.device_get(diag)

        if self.check_invariants:
            ro, co, lo = (int(x) for x in diag["neighbor_overflow"])
            wo = int(diag.get("wcache_overflow", 0))
            if int(diag.get("clique_overflow", 0)) > 0 and _retries > 0:
                # halo ring / cross-block budget exceeded: pairs were dropped,
                # so the computed step is invalid — recompile on the legacy
                # layout and re-run it (state has not advanced)
                self._disable_clique()
                return self.step(_retries=_retries - 1)
            if (ro > 0 or co > 0 or wo > 0) and lo == 0 and (
                self.backend == "tiles" and _retries > 0
            ):
                self.grow_capacity()
                return self.step(_retries=_retries - 1)
            neg_aii = int(diag["negative_aii"])
            if neg_aii > 0:
                raise SimulationFailed(f"AII should not be negative! ({neg_aii} particles)")
            if ro > 0 or co > 0 or lo > 0:
                raise SimulationFailed(
                    f"neighbor structure overflow: rows over by {ro}, cell={co}, level={lo} "
                    f"(raise NeighborConfig.row_width / max_per_cell / levels)"
                )
            if not np.isfinite(float(diag["dt"])):
                raise SimulationFailed("non-finite dt")
            if wo > 0:
                raise SimulationFailed(
                    f"weight-cache overflow: {wo} blocks "
                    "dropped (raise TileConfig.b_max)"
                )
            if "neighborhood_check_mismatch" in diag:
                mm = int(diag["neighborhood_check_mismatch"])
                if mm > 0:  # simulation.rs:1810-1863 asserts
                    raise SimulationFailed(
                        f"check_neighborhood: {mm} pair-count mismatches vs brute force"
                    )
            if "aii_deviation" in diag:
                dev = float(diag["aii_deviation"])
                if not dev < 0.01:  # f32 tolerance (simulation.rs:1369-1374)
                    raise SimulationFailed(f"a_ii check failed: max deviation {dev}")
            if "mass_conservation_error" in diag:
                err = float(diag["mass_conservation_error"])
                if not err < 0.005:  # simulation.rs:2791-2792
                    raise SimulationFailed(f"mass not conserved after adaptivity: {err}")

        self.state = new_state
        # capacity growth re-pads self.state, so it must run AFTER the state swap
        if self.check_invariants and "split_missing_pattern" in diag:
            self._check_split_diag(
                int(diag["split_missing_pattern"]), int(diag["split_deferred"])
            )
        self.counters.add_time("simulation-step", elapsed)
        self.counters.add_value("particle-count", float(new_state.n))
        self.counters.add_value("dt", float(diag["dt"]))
        if "div_iterations" in diag and int(diag["div_iterations"]) > 0:
            self.counters.add_value("div-iterations", float(diag["div_iterations"]))
        if "density_iterations" in diag and int(diag["density_iterations"]) > 0:
            self.counters.add_value("density-iterations", float(diag["density_iterations"]))
        return diag

    def _disable_clique(self):
        """Fallback after a halo/cross-budget overflow: recompile the step on
        the legacy packed layout (patch=0) and keep it off for this run."""
        self.clique_disabled = True
        self.step_fn, self.ncfg, self.tile_cfg, self.grid_cfg = _compile_step(
            self.params, self.scene, self.state, self.backend,
            self.boundary_handler, self.split_patterns, no_patch=True,
        )
        self._chunked = {}
        self.counters.add_value("clique-fallback", 1.0)

    def grow_capacity(self, factor: int = 2):
        """Double the fixed particle capacity and recompile the step.

        The reference extends its arrays freely on split (splitting.rs:56-58);
        with fixed-capacity SoA state this re-padding is the ONLY recompile event
        (SURVEY.md section 7). Deferred splits run on the next odd step.
        """
        import jax.numpy as jnp

        old = self.state
        new_cap = ((old.capacity * factor + 1023) // 1024) * 1024
        self.state = pad_state_to(old, new_cap)
        self.step_fn, self.ncfg, self.tile_cfg, self.grid_cfg = _compile_step(
            self.params, self.scene, self.state, self.backend,
            self.boundary_handler, self.split_patterns,
            no_patch=self.clique_disabled,
        )
        self._chunked = {}
        self.counters.add_value("capacity-growth", float(new_cap))

    def update_params(self, params):
        """Swap SimulationParams on a RUNNING simulation and recompile the step
        — the TPU analogue of the reference's egui live tuning (the sim thread
        re-reads the shared params every frame, main_loop.rs:280-281). Solver,
        adaptivity, viscosity, tolerance, debug-check fields all apply; the
        scene and the boundary-handler TYPE stay fixed (the reference restarts
        for those too). One recompile per change (cached thereafter).

        Applies the same init-time normalization as create_simulation (uniform
        h from block-0 spacing — YAML files carry h: 0.0), and only commits
        self.params once the recompile succeeded, so a failed live edit leaves
        the simulation fully on the old configuration."""
        params = params_mod.init_h_for_uniform(
            params, self.scene.blocks[0].spacing,
            self.scene.blocks[0].volume_fill_ratio,
        )
        step_fn, ncfg, tile_cfg, grid_cfg = _compile_step(
            params, self.scene, self.state, self.backend,
            self.boundary_handler, self.split_patterns,
            no_patch=self.clique_disabled,
        )
        self.params = params
        self.step_fn, self.ncfg, self.tile_cfg, self.grid_cfg = (
            step_fn, ncfg, tile_cfg, grid_cfg)
        self._chunked = {}

    def _check_split_diag(self, missing, deferred):
        if self.params.fail_on_missing_split_pattern and missing > 0:
            # splitting.rs:32-40 panic
            raise SimulationFailed(
                f"Missing split pattern for {missing} particles "
                "(fail_on_missing_split_pattern)"
            )
        if deferred > 0:
            self.grow_capacity()

    def run_until(self, t_end: float, max_steps: int = 10**9):
        steps = 0
        while self.time < t_end and steps < max_steps:
            self.step()
            steps += 1
        return steps

    def step_chunk(self, n: int, _retries: int = 2):
        """Run n steps in ONE device dispatch via lax.scan; returns stacked diags.

        Invariant checks run once per chunk over the stacked diagnostics.
        Tile-backend structure overflows (row padding / weight-cache blocks) are
        recoverable like in step(): the ENTERING state is kept until the chunk
        validates, so an overflow anywhere inside the scan discards the chunk,
        grows the capacity, and re-runs the same n steps at the new capacity.
        """
        from .models.simulation import make_chunked_step_fn

        key = ("chunk", n)
        if not hasattr(self, "_chunked"):
            self._chunked = {}
        if key not in self._chunked:
            self._chunked[key] = make_chunked_step_fn(self.step_fn, n)
        entering = self.state
        t0 = time.perf_counter()
        new_state, diags = self._chunked[key](self.state)
        new_state = jax.block_until_ready(new_state)
        elapsed = time.perf_counter() - t0

        # ONE device->host transfer for the stacked diagnostics (see step())
        diags = jax.device_get(diags)

        if self.check_invariants:
            ro, co, lo = (int(np.max(np.asarray(x))) for x in diags["neighbor_overflow"])
            wo = int(np.max(np.asarray(diags.get("wcache_overflow", 0))))
            if int(np.max(np.asarray(diags.get("clique_overflow", 0)))) > 0 \
                    and _retries > 0:
                self.state = entering  # dropped halo/cross pairs; discard chunk
                self._disable_clique()
                return self.step_chunk(n, _retries=_retries - 1)
            if (ro > 0 or co > 0 or wo > 0) and lo == 0 and (
                self.backend == "tiles" and _retries > 0
            ):
                self.state = entering  # the chunk ran past the overflow; discard it
                self.grow_capacity()
                return self.step_chunk(n, _retries=_retries - 1)
            if int(np.max(np.asarray(diags["negative_aii"]))) > 0:
                raise SimulationFailed("AII should not be negative!")
            ro, co, lo = (int(np.max(np.asarray(x))) for x in diags["neighbor_overflow"])
            if ro > 0 or co > 0 or lo > 0:
                raise SimulationFailed(
                    f"neighbor structure overflow: rows={ro} cell={co} level={lo}"
                )
            if "mass_conservation_error" in diags:
                if float(np.max(np.asarray(diags["mass_conservation_error"]))) >= 0.005:
                    raise SimulationFailed("mass not conserved after adaptivity")
            if "wcache_overflow" in diags:
                if int(np.max(np.asarray(diags["wcache_overflow"]))) > 0:
                    raise SimulationFailed("weight-cache overflow (raise TileConfig.b_max)")
            if "neighborhood_check_mismatch" in diags:
                mm = int(np.max(np.asarray(diags["neighborhood_check_mismatch"])))
                if mm > 0:
                    raise SimulationFailed(
                        f"check_neighborhood: {mm} pair-count mismatches vs brute force"
                    )
            if "aii_deviation" in diags:
                dev = float(np.max(np.asarray(diags["aii_deviation"])))
                if not dev < 0.01:  # f32 tolerance (simulation.rs:1369-1374)
                    raise SimulationFailed(f"a_ii check failed: max deviation {dev}")


        self.state = new_state
        if self.check_invariants and "split_missing_pattern" in diags:
            self._check_split_diag(
                int(np.max(np.asarray(diags["split_missing_pattern"]))),
                int(np.max(np.asarray(diags["split_deferred"]))),
            )
        self.counters.add_time("simulation-step", elapsed)  # whole chunk
        for v in np.asarray(diags["dt"]):
            self.counters.add_value("dt", float(v))
        self.counters.add_value("particle-count", float(new_state.n))
        return diags


def pad_state_to(state: FluidState, new_cap: int) -> FluidState:
    """Re-pad every per-particle array of `state` to `new_cap` rows (host-side)."""
    import jax.numpy as jnp

    def pad(a):
        if not hasattr(a, "ndim") or a.ndim == 0:
            return a
        out = np.zeros((new_cap,) + a.shape[1:], np.asarray(a).dtype)
        out[: a.shape[0]] = np.asarray(a)
        return jnp.asarray(out)

    return jax.tree.map(pad, state)


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


def _initial_max_occupancy(state, params, gcfg, host=None) -> int:
    """Host-side max particles-per-cell of the initial state at the chosen ladder."""
    from .models.grid_step import max_scale
    from .models.state import h_from_mass_np

    if host is None:
        host = dict(zip(("mass", "position", "alive"),
                        jax.device_get((state.mass, state.position, state.alive))))
    pos = host["position"][host["alive"]]
    if params.particle_sizes == ParticleSizes.Uniform:
        h = np.full(len(pos), params.h, np.float32)
    else:
        h = h_from_mass_np(host["mass"][host["alive"]], params.rest_density, 2)
    sr = h * max_scale(params)
    level = np.clip(
        np.ceil(np.log2(np.maximum(sr / gcfg.cell0, 1.0)) - 1e-6).astype(int), 0, gcfg.levels - 1
    )
    occ = 0
    for l in np.unique(level):
        sel = level == l
        cell = gcfg.cell(int(l))
        cx = np.floor((pos[sel, 0] - gcfg.origin[0]) / cell).astype(np.int64)
        cy = np.floor((pos[sel, 1] - gcfg.origin[1]) / cell).astype(np.int64)
        _, counts = np.unique(cx + (cy << 24), return_counts=True)
        occ = max(occ, int(counts.max()))
    return occ


def _tile_patch(state, params, gcfg, capacity: int, tq: int, host=None):
    """Pick the clique patch side (cells) for the patch-major layout.

    Returns (P, need): P = 0 when no patch side fits the per-patch/per-ring
    128-slot budgets with headroom; need = padded slots the layout wants
    (callers compare against / pre-grow the capacity). Ring membership matches
    ops/tiles.build_halo: edge cell toward the neighbor AND within
    0.5*mscale*(h_j + h_max_level) of the neighbor patch's rectangle.
    Resampling configs stay on the legacy layout for now (levels shift every
    step; ASPH_CLIQUE=force overrides), as do Winchenbach2020 /
    resident-solver configs (tile_step gates them out).
    """
    from .models.grid_step import max_scale
    from .models.state import h_from_mass_np
    from .utils.params import OperatorDiscretization

    # Default OFF: the first clique-path hardware measurement (2026-08-20,
    # /tmp/bench_clique.log) read 132 ms/step vs 2.0 ms streamed — until the
    # regression is diagnosed and beaten, the proven streamed path stays the
    # production default. Opt in with ASPH_CLIQUE=1/force.
    mode = os.environ.get("ASPH_CLIQUE", "0")
    if mode == "0" or tq != 128 or capacity % 128 != 0:
        return 0, 0
    if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
        return 0, 0
    if params.resident_solver or os.environ.get("ASPH_RESIDENT_SOLVER") == "1":
        return 0, 0
    if os.environ.get("ASPH_NO_WCACHE") == "1":
        return 0, 0
    adaptive_resample = params.particle_sizes == ParticleSizes.Adaptive and (
        params.splitting or params.merging or params.sharing)
    if adaptive_resample and mode != "force":
        return 0, 0

    if host is None:
        host = dict(zip(("mass", "position", "alive"),
                        jax.device_get((state.mass, state.position, state.alive))))
    pos = host["position"][host["alive"]]
    if len(pos) == 0:
        return 0, 0
    if params.particle_sizes == ParticleSizes.Uniform:
        h = np.full(len(pos), params.h, np.float32)
    else:
        h = h_from_mass_np(host["mass"][host["alive"]], params.rest_density, 2)
    sr = h * max_scale(params)
    level = np.clip(
        np.ceil(np.log2(np.maximum(sr / gcfg.cell0, 1.0)) - 1e-6).astype(int),
        0, gcfg.levels - 1)
    DIRS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
            (1, 1))
    HEADROOM = 1.3  # compression margin over the initial occupancies
    for P in (8, 6, 5, 4, 3, 2):
        ok = True
        n_patches = 0
        for l in np.unique(level):
            sel = level == l
            cell = gcfg.cell(int(l))
            fx = (pos[sel, 0] - gcfg.origin[0]) / cell
            fy = (pos[sel, 1] - gcfg.origin[1]) / cell
            cx = np.floor(fx).astype(np.int64)
            cy = np.floor(fy).astype(np.int64)
            px, py = cx // P, cy // P
            key = px + (py << 24)
            pk, counts = np.unique(key, return_counts=True)
            n_patches += len(pk)
            if counts.max() * HEADROOM > 128:
                ok = False
                break
            # ring occupancy per dest patch (build_halo membership semantics)
            hl = h[sel]
            rad_c = 0.5 * max_scale(params) * (hl + hl.max()) / cell
            occupied = set(int(k) for k in pk)
            acc = {}
            for dy, dx in DIRS:
                m = np.ones(len(hl), bool)
                if dx < 0:
                    m &= cx % P == 0
                elif dx > 0:
                    m &= cx % P == P - 1
                if dy < 0:
                    m &= cy % P == 0
                elif dy > 0:
                    m &= cy % P == P - 1
                gapx = np.zeros(len(hl)) if dx == 0 else (
                    (px + 1) * P - fx if dx > 0 else fx - px * P)
                gapy = np.zeros(len(hl)) if dy == 0 else (
                    (py + 1) * P - fy if dy > 0 else fy - py * P)
                m &= gapx * gapx + gapy * gapy < rad_c * rad_c
                dk = (px + dx) + ((py + dy) << 24)
                for k, c in zip(*np.unique(dk[m], return_counts=True)):
                    if int(k) in occupied:
                        acc[int(k)] = acc.get(int(k), 0) + int(c)
            if acc and max(acc.values()) * HEADROOM > 128:
                ok = False
                break
        if ok:
            return P, int(np.ceil(n_patches * 128 * 1.1 / 1024) * 1024)
    return 0, 0


def _tile_tq(state, params, gcfg, host=None) -> int:
    """Pick the query-tile width. The packed layout (ops/tiles.py) wastes no
    capacity on padding, so the widest tile always fits; larger tiles amortize
    per-tile kernel overhead (tq=128 measured 4.32 -> 4.02 ms/step on the
    stress bench, v5e 2026-08-18). ASPH_TQ overrides for experiments."""
    force = os.environ.get("ASPH_TQ")  # experiment knob: wider/narrower tiles
    if force:
        return int(force)
    for tq in (128, 64, 32, 16):
        if state.capacity % tq == 0 and state.capacity >= 2 * tq:
            return tq
    return 16


def grid_config_for(
    params: SimulationParams, scene: scene_mod.SceneConfig, state, capacity: int,
    mpc: Optional[int] = None, host=None,
):
    """Static grid geometry from the scene box and the expected h range."""
    from .models.grid_step import max_scale
    from .models.state import h_from_mass_np
    from .ops.grid import make_grid_config

    if host is None:
        host = dict(zip(("mass", "position", "alive"),
                        jax.device_get((state.mass, state.position, state.alive))))
    if params.particle_sizes == ParticleSizes.Uniform:
        h_min = h_max = params.h
    else:
        masses = host["mass"][host["alive"]]
        h_lo = float(h_from_mass_np(float(masses.min()), params.rest_density, 2))
        h_hi = float(h_from_mass_np(float(masses.max()), params.rest_density, 2))
        if params.splitting or params.merging or params.sharing:
            # resampling keeps masses within the classification band around the sizing
            # targets (adaptivity/mod.rs:24-27); widen by the band plus safety
            h_fine = kernels.ETA * params.particle_radius_fine
            h_base = kernels.ETA * params.particle_radius_base
            h_lo = min(h_lo, float(h_fine) * 0.6)
            h_hi = max(h_hi, float(h_base) * 1.6)
        h_min, h_max = h_lo, h_hi

    w2, hh2 = scene.boundary_width / 2.0, scene.boundary_height / 2.0
    gcfg = make_grid_config(
        (-w2, -hh2), (w2, hh2), max_scale(params), h_min, h_max, capacity, mpc=32
    )
    if mpc is None:
        # size slots to the scene: initial max occupancy x compression headroom
        occ = _initial_max_occupancy(state, params, gcfg, host=host)
        floor = 32 if (params.splitting or params.merging or params.sharing) else 16
        mpc = max(floor, int(np.ceil(occ * 2.5 / 8.0) * 8))
    import dataclasses as _dc

    gcfg = _dc.replace(gcfg, mpc=mpc)

    if params.particle_sizes != ParticleSizes.Uniform and not (
        params.splitting or params.merging or params.sharing
    ):
        # masses never change: only the levels of the initial h values can be
        # populated — restrict the pair blocks (e.g. the 50:1 stress test uses
        # exactly two levels instead of all seven)
        masses = host["mass"][host["alive"]]
        hs = np.unique(np.asarray(
            h_from_mass_np(masses, params.rest_density, 2), np.float32
        ))
        scale = max_scale(params)
        lv = np.clip(
            np.ceil(np.log2(np.maximum(hs * scale / gcfg.cell0, 1.0)) - 1e-6).astype(int),
            0,
            gcfg.levels - 1,
        )
        import dataclasses as _dc

        gcfg = _dc.replace(gcfg, populated=tuple(sorted(set(int(x) for x in lv))))
    return gcfg


def create_simulation(
    params: SimulationParams,
    scene: scene_mod.SceneConfig,
    capacity: Optional[int] = None,
    row_width: Optional[int] = None,
    split_patterns=None,
    counters_enabled: bool = True,
    backend: str = "auto",
) -> Simulation:
    """init_simulation_params + init_fluid_sim + step compilation.

    backend: 'tiles' (sorted-tile Pallas engine, the production hot path), 'grid'
    (dense grid engine), 'lists' (neighbor-list reference implementation), or
    'auto' (tiles when the config supports it).
    """
    from .models.grid_step import supports_grid_backend
    from .models.tile_step import supports_tile_backend

    params = params_mod.init_h_for_uniform(
        params, scene.blocks[0].spacing, scene.blocks[0].volume_fill_ratio
    )
    state = scene_mod.init_fluid_state(scene, params, capacity)
    boundary_handler = scene_mod.make_boundary_handler(scene, params)
    # ONE device->host fetch for every host-side setup decision below (each
    # separate np.asarray is a full tunnel roundtrip, ~1 s)
    host = dict(zip(("mass", "position", "alive"),
                    jax.device_get((state.mass, state.position, state.alive))))

    if backend == "auto":
        backend = "tiles" if supports_tile_backend(params) else "lists"

    if backend == "tiles" and capacity is None:
        # patch-major layouts pad each occupied patch to 128 slots; when the
        # clique-viable layout ALMOST fits, pre-grow the capacity once here
        # instead of paying an overflow-retry recompile on the first step
        gcfg_pre = grid_config_for(params, scene, state, state.capacity,
                                   host=host)
        tq_pre = _tile_tq(state, params, gcfg_pre, host=host)
        p_pre, need = _tile_patch(state, params, gcfg_pre, state.capacity,
                                  tq_pre, host=host)
        if p_pre and state.capacity < need <= 3 * state.capacity:
            state = pad_state_to(state, need)
            for k in host:
                pad = np.zeros((need - len(host[k]),) + host[k].shape[1:],
                               host[k].dtype)
                host[k] = np.concatenate([host[k], pad])

    if split_patterns is None and params.particle_sizes == ParticleSizes.Adaptive and (
        params.splitting
    ):
        from .utils.split_patterns import load_default_patterns

        split_patterns = load_default_patterns()

    step_fn, ncfg, tile_cfg, grid_cfg = _compile_step(
        params, scene, state, backend, boundary_handler, split_patterns, row_width,
        host=host,
    )
    return Simulation(
        params=params,
        scene=scene,
        state=state,
        step_fn=step_fn,
        boundary_handler=boundary_handler,
        ncfg=ncfg,
        counters=Counters(enabled=counters_enabled),
        tile_cfg=tile_cfg,
        grid_cfg=grid_cfg,
        backend=backend,
        split_patterns=split_patterns,
    )


def _compile_step(params, scene, state, backend, boundary_handler, split_patterns,
                  row_width=None, host=None, no_patch=False):
    """Build the per-capacity static configs and the jitted step for `backend`."""
    if host is None:
        host = dict(zip(("mass", "position", "alive"),
                        jax.device_get((state.mass, state.position, state.alive))))
    masses = host["mass"][host["alive"]]
    mass_range = (float(masses.min()), float(masses.max())) if masses.size else None
    ncfg = neighbor_config_for(params, state.capacity, row_width, mass_range=mass_range)

    grid_cfg = None
    tile_cfg = None
    if backend == "grid":
        grid_cfg = grid_config_for(params, scene, state, state.capacity, host=host)
    elif backend == "tiles":
        from .models.grid_step import max_scale
        from .ops.tiles import TileConfig

        assert state.capacity % 64 == 0, "tile backend needs capacity % 64 == 0"
        gcfg = grid_config_for(params, scene, state, state.capacity, host=host)
        tq = _tile_tq(state, params, gcfg, host=host)
        if no_patch:
            patch = 0
        else:
            patch, need = _tile_patch(
                state, params, gcfg, state.capacity, tq, host=host)
            if need > state.capacity:
                patch = 0  # create_simulation pre-grows; mid-run keep legacy
        tile_cfg = TileConfig.from_grid(gcfg, max_scale(params), tq=tq,
                                        patch=patch)
        # the CSR cell_starts, the per-tile range descriptors, and the packed
        # weight-cache block meta are all prefetched SMEM operands; Mosaic caps
        # SMEM at 1 MiB — configs beyond it take the neighbor-list backend
        from .ops.tiles import WM_STRIDE

        _, total_cells = tile_cfg.cell_offsets
        nt = tile_cfg.capacity // tile_cfg.tq
        smem_bytes = (
            (total_cells + 1) * 4
            + nt * len(tile_cfg.populated) * WM_STRIDE * 4
            + tile_cfg.b_max * 4 + 16
        )
        if smem_bytes > 980_000:
            import warnings

            warnings.warn(
                f"tile backend: grid has {total_cells} cells (> SMEM budget); "
                "falling back to the neighbor-list backend"
            )
            tile_cfg = None
            backend = "lists"

    step_fn = make_step_fn(
        params, ncfg, boundary_handler, split_patterns, grid_cfg=grid_cfg,
        tile_cfg=tile_cfg,
    )
    return step_fn, ncfg, tile_cfg, grid_cfg
