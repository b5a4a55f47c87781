"""Per-step pipeline orchestration: one jit-compiled `step(state) -> (state, diag)`.

Reference parity: FluidSimulation::single_step_without_adaptivity (simulation.rs:1980-2730)
— the full stage order from SURVEY.md section 3.2:
  h update -> neighbor search (extended + level estimation + filter_down, or direct)
  -> h_next estimation -> neighborhood constraint -> boundary update -> CFL dt
  -> density -> constant field -> a_ii -> pressure solve + integrate
  -> optional post-advection level estimation -> level-field smoothing.

Adaptivity (share/merge/split) lives in models/adaptivity.py and is chained by
`make_step_fn` exactly as single_step does (simulation.rs:1973-1978).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops import neighbors as nbr
from ..ops.edge_cache import build_edge_cache, reduce_edges, with_density
from ..utils.params import (
    LevelEstimationMethod,
    ParticleSizes,
    SimulationParams,
    SupportLengthEstimation,
)
from . import boundary as bnd
from . import level as level_mod
from . import physics, solver
from .state import FluidState


def estimate_h_next_from_distribution(
    nb, cache, bt, mass, h, params: SimulationParams, clamping_factor: Optional[float]
):
    """V_est = (1 - min(lambda, 0.5)) / sum W_ij, blended 50/50 with old h
    (simulation.rs:1873-1930)."""
    w_sum = reduce_edges(nb, cache.w, cache.w)
    bv = bnd.lambda_sum(bt)
    if bv is None:
        bv = jnp.zeros_like(w_sum)  # reference todo!()s for the particle handler
    volume_estimate = (1.0 - jnp.minimum(bv, 0.5)) / jnp.maximum(w_sum, 1e-30)
    h_new = kernels.ETA * kernels.sphere_volume_to_radius(volume_estimate, dim=2)
    h_next = 0.5 * h_new + 0.5 * h
    if clamping_factor is not None:
        h_next = jnp.minimum(
            h_next,
            clamping_factor * kernels.smoothing_length_from_mass(mass, params.rest_density, 2),
        )
    return h_next


def estimate_h_next_from_distribution2(nb, cache, bt, mass, h, params: SimulationParams):
    """V_est = V_i / (sum V_j W_ij + lambda) (simulation.rs:1932-1971)."""
    v_w_sum = reduce_edges(
        nb,
        cache.mass_j / params.rest_density * cache.w,
        (mass / params.rest_density)[:, None] * cache.w,
    )
    bv = bnd.lambda_sum(bt)
    if bv is None:
        bv = jnp.zeros_like(v_w_sum)
    vi = mass / params.rest_density
    volume_estimate = vi / jnp.maximum(v_w_sum + bv, 1e-30)
    h_new = kernels.ETA * kernels.sphere_volume_to_radius(volume_estimate, dim=2)
    return 0.5 * h_new + 0.5 * h


def single_step_without_adaptivity(
    state: FluidState,
    params: SimulationParams,
    ncfg: nbr.NeighborConfig,
    boundary_handler,
):
    """One full simulation step (no adaptivity). Pure function of the state."""
    diag = {}
    adaptive = params.particle_sizes == ParticleSizes.Adaptive

    # 1. smoothing-length update (simulation.rs:1999-2016)
    if adaptive:
        if params.support_length_estimation == SupportLengthEstimation.FromMass:
            h = kernels.smoothing_length_from_mass(state.mass, params.rest_density, 2)
            h_next = state.h_next
        else:
            # distribution modes: apply last step's estimate (one step delayed)
            h = state.h_next
            h_next = state.h_next
    else:
        h = state.h
        h_next = state.h_next
    h_eff = physics.effective_h(h, params)

    alive = state.alive
    pos = state.position

    # 2+3. neighbor search (+ pre-advection level estimation at extended radius)
    level, has_level = state.level, state.has_level
    stash = state.stash
    flag_surface, flag_insufficient = state.flag_is_fluid_surface, state.flag_insufficient_neighs

    # dead-code-elimination of the level pipeline when nothing consumes it
    # (reference always computes it; see SimulationParams.level_estimation_active)
    do_levels = params.level_estimation_active()
    if (not params.level_estimation_after_advection) and do_levels:
        assert params.use_extended_range_for_level_estimation
        assert params.level_estimation_method != LevelEstimationMethod.CenterDiff, (
            "center-diff needs densities; unavailable pre-advection (simulation.rs:2021)"
        )
        ext_scale = jnp.float32(params.level_estimation_range / kernels.ETA)
        nb = nbr.build_neighborhood(pos, h_eff, alive, ext_scale, ncfg)
        ext_cache = build_edge_cache(nb, pos, h_eff, state.mass)
        bt_lvl = boundary_handler.update_after_advect(pos, h, params)
        # NOTE: the near-boundary interior test uses the RAW per-particle h array
        # (zero-filled under uniform sizes, so it never fires there — matching
        # simulation.rs:583-585 where particles.h2 is zero in uniform builds)
        level, has_level, flag_surface, flag_insufficient, stash = (
            level_mod.perform_level_estimation(
                nb, ext_cache, bt_lvl, pos, state.mass, h, alive, stash, params
            )
        )
        nb = nbr.filter_down(
            nb, pos, h_eff, alive,
            jnp.float32(kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH), ncfg.levels,
        )
    else:
        nb = nbr.build_neighborhood(
            pos, h_eff, alive, jnp.float32(kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH), ncfg
        )

    neighbor_count = nb.count
    diag["neighbor_overflow"] = (nb.row_overflow, nb.cell_overflow, nb.level_overflow)

    # per-step edge cache over the physics neighborhood (kernels/gradients/distances
    # computed once; every subsequent sweep reuses them)
    cache = build_edge_cache(nb, pos, h_eff, state.mass)

    # 8. boundary update_after_advect (simulation.rs:2179-2180) — hoisted above the
    # h_next estimation because the distribution estimators consume boundary lambda
    # terms; the reference evaluates b.lambda_sum(i) from the *previous* step's terms
    # at this point (simulation.rs:1892-1898), a one-step lag we avoid by updating first
    bt = boundary_handler.update_after_advect(pos, h, params)

    # 6. h_next estimation (simulation.rs:2090-2143)
    if adaptive and params.support_length_estimation != SupportLengthEstimation.FromMass:
        sle = params.support_length_estimation
        if sle == SupportLengthEstimation.FromDistribution:
            h_next = estimate_h_next_from_distribution(nb, cache, bt, state.mass, h_eff, params, None)
        elif sle == SupportLengthEstimation.FromDistributionClamped1:
            h_next = estimate_h_next_from_distribution(nb, cache, bt, state.mass, h_eff, params, 1.0)
        elif sle == SupportLengthEstimation.FromDistributionClamped2:
            h_next = estimate_h_next_from_distribution(nb, cache, bt, state.mass, h_eff, params, 2.0)
        elif sle == SupportLengthEstimation.FromDistribution2:
            h_next = estimate_h_next_from_distribution2(nb, cache, bt, state.mass, h_eff, params)

    # 7. neighborhood-count constraint ("Constrained Neighbor Lists",
    #    simulation.rs:2145-2177): shed excess neighbors by shrinking h now.
    flag_reduced = state.flag_neighborhood_reduced
    if adaptive and params.constrain_neighborhood_count:
        target_neighbors = int(kernels.optimal_neighbor_number(2)) + 5
        need = alive & (nb.count > target_neighbors)
        # fringe = 2|x_ij| - sr_j over the forward row (same-or-larger neighbors; the
        # reference sorts the full list — smaller cross-level neighbors have the
        # largest fringe and are shed first, so the forward row covers the cut point
        # except at extreme interfaces)
        xj = pos[nb.idx]
        dist = jnp.sqrt(jnp.sum((pos[:, None, :] - xj) ** 2, -1) + 1e-30)
        sr_j = h_eff[nb.idx] * kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
        fringe = jnp.where(nb.mask, 2.0 * dist - sr_j, -jnp.inf)
        fringe_sorted = -jnp.sort(-fringe, axis=1)  # descending
        k = jnp.clip(nb.count - target_neighbors, 0, fringe.shape[1] - 1)
        h_constrained = jnp.take_along_axis(fringe_sorted, k[:, None], axis=1)[:, 0]
        h_constrained = jnp.maximum(h_constrained, 0.0)
        # the reference overwrites h2_next wholesale (discarding any distribution
        # estimate) and swaps: h2 <- constrained-or-h2, h2_next <- old h2
        # (simulation.rs:2148-2173)
        h_next = h
        h = jnp.where(need, h_constrained, h)
        h_eff = physics.effective_h(h, params)
        flag_reduced = need
        # h changed -> kernel cache is stale; rebuild (constraint mode only)
        cache = build_edge_cache(nb, pos, h_eff, state.mass)

    # 9. CFL dt (simulation.rs:2182-2191)
    dt = physics.cfl_dt(state.velocity, h, alive, params)
    diag["dt"] = dt

    # 10. density (simulation.rs:2204)
    density = physics.compute_density(nb, cache, bt, pos, h_eff, params, state.mass)
    density = jnp.where(alive, density, 1.0)
    cache = with_density(cache, nb, density)
    bst = bnd.solver_terms(bt, pos, h, params)

    # 11. constant field diagnostic (simulation.rs:2235-2248)
    constant_field = physics.compute_constant_field(
        nb, cache, bt, pos, h_eff, params, state.mass, density
    )

    # 12. a_ii (simulation.rs:2250-2259)
    aii = physics.compute_aii(nb, cache, bt, bst, state.mass, density, params)
    aii = jnp.where(alive, aii, 0.0)
    diag["negative_aii"] = jnp.sum(alive & (aii < 0.0))

    if params.check_aii:
        from .debug_checks import check_aii_deviation

        diag["aii_deviation"] = check_aii_deviation(
            nb, bt, pos, state.mass, density, h_eff, aii, alive, params
        )

    if params.check_neighborhood:
        # O(C^2) brute-force verification (simulation.rs:2076-2088): the neighbor
        # structure's pair count must equal ground truth for every alive particle
        from ..ops.pairwise import sym_sum
        from .debug_checks import bruteforce_neighbor_count
        from .grid_step import physics_scale

        eng = sym_sum(
            nb, {"pos": pos, "h": h_eff},
            lambda vi, vj: jnp.ones_like(vi["h"]),
        ).astype(jnp.int32)
        ref_cnt = bruteforce_neighbor_count(
            pos, h_eff, alive, physics_scale(params)
        )
        diag["neighborhood_check_mismatch"] = jnp.sum(
            jnp.where(alive, jnp.abs(eng - ref_cnt), 0)
        )

    # 13. pressure solve + integrate (simulation.rs:2261-2671)
    st = state.replace(density=density, aii=aii, h=h)
    new_fields, sdiag = solver.solve_and_integrate(nb, cache, bst, st, h_eff, dt, params)
    diag.update(sdiag)

    pos2 = jnp.where(alive[:, None], new_fields["position"], pos)
    vel2 = jnp.where(alive[:, None], new_fields["velocity"], state.velocity)

    # 14. optional post-advection level estimation (simulation.rs:2678-2707)
    if params.level_estimation_after_advection and do_levels:
        if params.use_extended_range_for_level_estimation:
            ext_scale = jnp.float32(params.level_estimation_range / kernels.ETA)
            nb_lvl = nbr.build_neighborhood(pos2, h_eff, alive, ext_scale, ncfg)
        else:
            nb_lvl = nb
        lvl_cache = build_edge_cache(nb_lvl, pos2, h_eff, state.mass)
        bt2 = boundary_handler.update_after_advect(pos2, h, params)
        level, has_level, flag_surface, flag_insufficient, stash = (
            level_mod.perform_level_estimation(
                nb_lvl, lvl_cache, bt2, pos2, state.mass, h, alive, stash, params
            )
        )
        nb_smooth = nb_lvl
        smooth_cache = with_density(lvl_cache, nb_lvl, density)
    else:
        nb_smooth = nb
        # the reference smooths with ADVANCED positions over the stale pre-advection
        # lists (simulation.rs:2709-2722 reads particles.position after integration)
        smooth_cache = with_density(
            build_edge_cache(nb, pos2, h_eff, state.mass), nb, density
        )

    # 15. level-field smoothing (simulation.rs:2709-2722)
    level_old = state.level_old
    if do_levels:
        level, has_level = level_mod.smooth_level_field(
            nb_smooth, smooth_cache, state.mass, density, level, has_level, params
        )
        level_old = level

    new_state = state.replace(
        position=pos2,
        velocity=vel2,
        pressure=jnp.where(alive, new_fields["pressure"], 0.0),
        pressure_accel=jnp.where(alive[:, None], new_fields["pressure_accel"], 0.0),
        ppe_source_term=jnp.where(alive, new_fields["ppe_source_term"], 0.0),
        density_error=new_fields["density_error"],
        omega=new_fields["omega"],
        density=density,
        aii=aii,
        constant_field=constant_field,
        h=h,
        h_next=h_next,
        level=level,
        has_level=has_level,
        level_old=level_old,
        neighbor_count=neighbor_count,
        flag_is_fluid_surface=flag_surface,
        flag_insufficient_neighs=flag_insufficient,
        flag_neighborhood_reduced=flag_reduced,
        stash=stash,
        time=state.time + dt,
        step_number=state.step_number + 1,
    )
    return new_state, nb, dt, diag


def make_step_fn(params: SimulationParams, ncfg: nbr.NeighborConfig, boundary_handler,
                 split_patterns=None, grid_cfg=None, tile_cfg=None):
    """Build the jitted single_step (simulation.rs:1973-1978): physics + adaptivity.

    tile_cfg selects the sorted-tile backend (models/tile_step.py, the production
    hot path); grid_cfg the dense grid backend (models/grid_step.py); the
    neighbor-list backend remains the reference implementation (and serves configs
    the fast backends gate out: constrain_neighborhood_count, check_aii).
    Adaptivity still runs on the list structure, built only when resampling is on.
    """
    from . import adaptivity as adapt

    adaptive = params.particle_sizes == ParticleSizes.Adaptive
    resampling = adaptive and (params.sharing or params.merging or params.splitting)

    if tile_cfg is not None:
        from .tile_step import single_step_tiles

        @jax.jit
        def step(state: FluidState):
            state, dt, diag = single_step_tiles(state, params, tile_cfg, boundary_handler)
            if resampling:
                # tile-native partner matching: the adaptive step performs zero
                # per-edge gathers and never builds neighbor lists
                def partner_fn(st, cls, mode):
                    return adapt.find_partners_tiles(st, tile_cfg, cls, dt, params, mode)

                state, adiag = adapt.single_step_adaptivity(
                    state, None, dt, params, split_patterns, partner_fn=partner_fn
                )
                diag.update(adiag)
            return state, diag

        return step

    if grid_cfg is not None:
        from .grid_step import single_step_grid

        @jax.jit
        def step(state: FluidState):
            state, dt, diag = single_step_grid(state, params, grid_cfg, boundary_handler)
            if resampling:
                h_eff = physics.effective_h(state.h, params)
                nb = nbr.build_neighborhood(
                    state.position, h_eff, state.alive,
                    jnp.float32(kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH), ncfg,
                )
                state, adiag = adapt.single_step_adaptivity(
                    state, nb, dt, params, split_patterns
                )
                diag.update(adiag)
            return state, diag

        return step

    @jax.jit
    def step(state: FluidState):
        state, nb, dt, diag = single_step_without_adaptivity(
            state, params, ncfg, boundary_handler
        )
        if resampling:
            state, adiag = adapt.single_step_adaptivity(
                state, nb, dt, params, split_patterns
            )
            diag.update(adiag)
        return state, diag

    return step


def make_chunked_step_fn(step_fn, chunk: int):
    """Scan `chunk` steps inside one dispatch (amortizes host->TPU latency; nothing in
    the step needs the host — dt, convergence, and adaptivity are all on-device).
    Returns (state, stacked_diags)."""

    @jax.jit
    def run(state: FluidState):
        def body(s, _):
            s2, diag = step_fn(s)
            return s2, diag

        return jax.lax.scan(body, state, None, length=chunk)

    return run


def make_two_phase_step_fns(params: SimulationParams, boundary_handler,
                            split_patterns, tile_cfg):
    """Physics-only step + separate adaptivity step (tile backend).

    The reference's image/video exporter runs single_step_without_adaptivity,
    emits the interpolated frames for the step window, and only then resamples
    (animation/mod.rs:138-272) — so the census never changes inside an
    interpolation window. Returns (physics_fn, adaptivity_fn):
      physics_fn(state) -> (state, diag)      [diag carries "dt"]
      adaptivity_fn(state, dt) -> (state, adiag)
    """
    from . import adaptivity as adapt
    from .tile_step import single_step_tiles

    @jax.jit
    def physics_fn(state: FluidState):
        # emit_prev_pos: the exporter interpolates frame positions across the
        # step (animation/mod.rs:191-210); the step reorders the state (sorted
        # emission), so it also emits start-of-step positions in the NEW order
        state, dt, diag = single_step_tiles(state, params, tile_cfg, boundary_handler,
                                            emit_prev_pos=True)
        return state, diag

    @jax.jit
    def adaptivity_fn(state: FluidState, dt):
        def partner_fn(st, cls, mode):
            return adapt.find_partners_tiles(st, tile_cfg, cls, dt, params, mode)

        state, adiag = adapt.single_step_adaptivity(
            state, None, dt, params, split_patterns, partner_fn=partner_fn
        )
        return state, adiag

    return physics_fn, adaptivity_fn
