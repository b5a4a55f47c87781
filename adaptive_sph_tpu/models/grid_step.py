"""Grid-backend step orchestration: the gather-free fast path.

Same stage order and semantics as models/simulation.py (single_step_without_adaptivity,
simulation.rs:1980-2730), with every pair sweep running over the dense grid engine.
One binning per step (cells sized for the largest search radius) serves both the
extended level-estimation sweep and the 2h physics sweeps via distance masks — the
analogue of build-at-extended-range + filter_down (simulation.rs:2023-2058).

Fallbacks: constrain_neighborhood_count and check_aii use per-row selection/verification
that lives in the list backend; `supports_grid_backend` gates those configs out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops.grid import GridBins, GridConfig, build_bins, gather_result, scatter_field
from ..utils.params import (
    FillStashWith,
    HybridDfsphDensitySourceTerm,
    LevelEstimationMethod,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
    SupportLengthEstimation,
)
from . import boundary as bnd
from . import grid_physics as gp
from . import grid_pairs
from .solver import DENSITY_ERROR, DIVERGENCE_ERROR
from .state import FluidState

NEG_INF = jnp.float32(-3.0e38)


def supports_grid_backend(params: SimulationParams) -> bool:
    if params.constrain_neighborhood_count or params.check_aii:
        return False
    if params.level_estimation_active() and params.level_estimation_after_advection:
        return False  # see supports_tile_backend
    return True


def physics_scale(params) -> float:
    return kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH


def max_scale(params: SimulationParams) -> float:
    s = kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
    if params.level_estimation_active() and not params.level_estimation_after_advection:
        s = max(s, params.level_estimation_range / kernels.ETA)
    elif params.level_estimation_active() and params.use_extended_range_for_level_estimation:
        s = max(s, params.level_estimation_range / kernels.ETA)
    return s


def _range_ok(vi, vj, geom, params):
    """is_neighbor_in_level_estimation_range (simulation.rs:697-723), receiver side."""
    if params.support_length_estimation not in (
        SupportLengthEstimation.FromDistribution,
        SupportLengthEstimation.FromDistribution2,
    ):
        return True
    radius = kernels.sphere_volume_to_radius(vi["mass"] / params.rest_density, dim=2)
    return geom.r <= radius * params.maximum_range


def level_estimation_slots(cfg, bins, sf, ext_scale, dist_b_slots, params):
    """EmptyAngle/CenterDiff + wavefront propagation, slot space (simulation.rs:539-927)."""
    alive_slots = bins.slot_mask

    def count_edge(vi, vj, geom):
        return {"n": jnp.ones_like(geom.r)}

    count = grid_pairs.pair_apply(cfg, bins, sf, ext_scale, count_edge)["n"]

    if params.level_estimation_method == LevelEstimationMethod.EmptyAngle:

        def normal_edge(vi, vj, geom):
            gw = kernels.kernel_grad(geom.diff, geom.h_ij, dim=2)
            return {"nrm": -(vi["mass"] / params.rest_density)[..., None] * gw}

        normal = grid_pairs.pair_apply(cfg, bins, sf, ext_scale, normal_edge)["nrm"]
        norm2 = jnp.sum(normal * normal, -1)
        unit = normal / jnp.sqrt(jnp.maximum(norm2, 1e-30))[:, None]

        import math

        threshold = math.cos(50.0 * math.pi / 180.0)
        f2 = dict(sf)
        f2["un"] = unit

        def cone_edge(vi, vj, geom):
            xji = -geom.diff / (geom.r + 1e-6)[..., None]
            d = jnp.sum(xji * vi["un"], -1)
            hit = (d > threshold) & _range_ok(vi, vj, geom, params)
            return {"hit": hit.astype(jnp.float32)}

        cone = (
            grid_pairs.pair_apply(cfg, bins, f2, ext_scale, cone_edge, reduce="max", fill=0.0)[
                "hit"
            ]
            > 0.5
        )

        insufficient = count < (2 * 2 - 1)
        symmetric = norm2 < 1e-5
        near_boundary = jnp.zeros_like(symmetric)
        if (not params.boundary_is_fluid_surface) and dist_b_slots is not None:
            near_boundary = dist_b_slots < sf["h_raw"] * 1.5
        is_interior = jnp.where(
            insufficient, False, jnp.where(symmetric, True, jnp.where(near_boundary, True, cone))
        )
        is_surface = (~is_interior) & alive_slots
        level = jnp.zeros_like(sf["h"])
        has = is_surface
        flag_insufficient = insufficient & alive_slots
    else:  # CenterDiff

        def cd_edge(vi, vj, geom):
            vol_j = vj["mass"] / params.rest_density
            r_j = kernels.sphere_volume_to_radius(vol_j, dim=2)
            w = kernels.kernel_w(geom.r, geom.h_ij, dim=2) * vol_j
            return {
                "w_sum": w,
                "cx": w * vj["pos"][..., 0],
                "cy": w * vj["pos"][..., 1],
                "ar": w * r_j,
            }

        s = grid_pairs.pair_apply(cfg, bins, sf, ext_scale, cd_edge)
        w_sum = jnp.maximum(s["w_sum"], 1e-30)
        avg_radius = s["ar"] / w_sum
        surface_level = -0.85 * avg_radius
        center = jnp.stack([s["cx"], s["cy"]], -1) / w_sum[:, None]
        phi_initial = jnp.linalg.norm(sf["pos"] - center, axis=-1) - avg_radius
        phi = jnp.where(count < 5, surface_level, phi_initial)
        is_surface = (phi >= surface_level) & alive_slots
        level = jnp.where(is_surface, phi, 0.0)
        has = is_surface
        flag_insufficient = jnp.zeros_like(is_surface)

    # wavefront propagation (simulation.rs:729-801)
    def one_sweep(lvl, hasv):
        f = dict(sf)
        f["lvl"] = lvl
        f["has"] = hasv.astype(jnp.float32)

        def prop_edge(vi, vj, geom):
            ok = (vj["has"] > 0.5) & _range_ok(vi, vj, geom, params)
            return {"est": jnp.where(ok, vj["lvl"] - geom.r, NEG_INF)}

        est = grid_pairs.pair_apply(cfg, bins, f, ext_scale, prop_edge, reduce="max", fill=NEG_INF)[
            "est"
        ]
        newly = (~hasv) & (est > NEG_INF * 0.5) & alive_slots
        return jnp.where(newly, est, lvl), hasv | newly, jnp.any(newly)

    max_depth = jnp.float32(-params.maximum_surface_distance)
    stash = None
    if params.fill_stash_with == FillStashWith.SurfaceDistanceFirstIteration:
        stash = jnp.where(has, level, max_depth)  # simulation.rs:909-916
    level, has, changed = one_sweep(level, has)
    if params.fill_stash_with == FillStashWith.SurfaceDistanceMiddle:
        stash = jnp.where(has, level, max_depth)  # simulation.rs:792 (num_iter == 1)

    def cond(c):
        return c[2]

    def body(c):
        return one_sweep(c[0], c[1])

    level, has, _ = jax.lax.while_loop(cond, body, (level, has, changed))
    return level, has, is_surface, flag_insufficient, count, stash


def smooth_level_slots(cfg, bins, sf, scale, level, has, params):
    """Volume-weighted smoothing (simulation.rs:803-857) at the physics radius.

    Pair membership follows the *pre-advection* positions (the reference's stale
    filtered lists) while kernels evaluate at the advected positions; callers provide
    sf['pos'] = advected and sf['pos_old'] = binning positions."""
    max_depth = -params.maximum_surface_distance
    f = dict(sf)
    f["dist"] = jnp.where(has, jnp.maximum(level, max_depth), max_depth)

    def edge(vi, vj, geom):
        vw = vj["mass"] / jnp.maximum(vj["rho"], 1e-30) * kernels.kernel_w(geom.r, geom.h_ij, 2)
        return {"lvl": vj["dist"] * vw, "w": vw}

    mask_key = "pos_old" if "pos_old" in f else "pos"
    s = grid_pairs.pair_apply(cfg, bins, f, scale, edge, mask_pos_key=mask_key)
    return s["lvl"] / jnp.maximum(s["w"], 1e-30)


def h_next_distribution_slots(cfg, bins, sf, scale, bv_slots, params, mode):
    """FromDistribution estimators (simulation.rs:1873-1971) in slot space."""

    def w_edge(vi, vj, geom):
        return {"w": kernels.kernel_w(geom.r, geom.h_ij, 2)}

    def vw_edge(vi, vj, geom):
        return {"w": vj["mass"] / params.rest_density * kernels.kernel_w(geom.r, geom.h_ij, 2)}

    if mode == SupportLengthEstimation.FromDistribution2:
        v_w_sum = grid_pairs.pair_apply(cfg, bins, sf, scale, vw_edge)["w"]
        vi = sf["mass"] / params.rest_density
        volume_estimate = vi / jnp.maximum(v_w_sum + bv_slots, 1e-30)
    else:
        w_sum = grid_pairs.pair_apply(cfg, bins, sf, scale, w_edge)["w"]
        volume_estimate = (1.0 - jnp.minimum(bv_slots, 0.5)) / jnp.maximum(w_sum, 1e-30)
    h_new = kernels.ETA * kernels.sphere_volume_to_radius(volume_estimate, dim=2)
    h_next = 0.5 * h_new + 0.5 * sf["h"]
    if mode == SupportLengthEstimation.FromDistributionClamped1:
        h_next = jnp.minimum(
            h_next, kernels.smoothing_length_from_mass(sf["mass"], params.rest_density, 2)
        )
    elif mode == SupportLengthEstimation.FromDistributionClamped2:
        h_next = jnp.minimum(
            h_next, 2.0 * kernels.smoothing_length_from_mass(sf["mass"], params.rest_density, 2)
        )
    return h_next


def single_step_grid(state: FluidState, params: SimulationParams, gcfg: GridConfig,
                     boundary_handler):
    """One full step on the grid backend. Returns (new_state, dt, diag)."""
    diag = {}
    adaptive = params.particle_sizes == ParticleSizes.Adaptive

    # 1. smoothing-length update (simulation.rs:1999-2016)
    if adaptive:
        if params.support_length_estimation == SupportLengthEstimation.FromMass:
            h = kernels.smoothing_length_from_mass(state.mass, params.rest_density, 2)
            h_next = state.h_next
        else:
            h = state.h_next
            h_next = state.h_next
    else:
        h = state.h
        h_next = state.h_next
    h_eff = h if adaptive else jnp.full_like(h, jnp.float32(params.h))

    alive = state.alive
    pos = state.position

    # 2. binning at the largest search radius (one binning serves all sweeps)
    mscale = jnp.float32(max_scale(params))
    bins = build_bins(pos, h_eff * mscale, alive, gcfg)
    diag["neighbor_overflow"] = (bins.overflow, jnp.int32(0), bins.level_overflow)

    # slot-space static fields
    sf = {
        "pos": scatter_field(bins, gcfg, pos),
        "h": scatter_field(bins, gcfg, h_eff),
        "h_raw": scatter_field(bins, gcfg, h),
        "mass": scatter_field(bins, gcfg, state.mass),
    }
    alive_slots = bins.slot_mask
    pscale = jnp.float32(physics_scale(params))
    ext_scale = jnp.float32(params.level_estimation_range / kernels.ETA)

    # boundary terms (flat; C-sized) -> slot space
    bt = boundary_handler.update_after_advect(pos, h, params)
    bst = bnd.solver_terms(bt, pos, h, params)
    G_slots = scatter_field(bins, gcfg, bst.G)
    bdens = bnd.density_boundary_term(bt, pos, h, params)
    bdens_slots = scatter_field(bins, gcfg, bdens)
    dist_b = bnd.distance_to_boundary(bt)
    dist_b_slots = scatter_field(bins, gcfg, dist_b) if dist_b is not None else None
    lam = bnd.lambda_sum(bt)
    lam_slots = scatter_field(bins, gcfg, lam) if lam is not None else jnp.zeros_like(sf["h"])

    # 3. level estimation (pre-advection; simulation.rs:2018-2058)
    level_slots = scatter_field(bins, gcfg, state.level)
    has_slots = scatter_field(bins, gcfg, state.has_level)
    flag_surface = state.flag_is_fluid_surface
    flag_insufficient = state.flag_insufficient_neighs
    stash = state.stash
    do_levels = params.level_estimation_active()
    if do_levels and not params.level_estimation_after_advection:
        assert params.level_estimation_method != LevelEstimationMethod.CenterDiff
        level_slots, has_slots, surf_slots, insuf_slots, count_slots, stash_slots = (
            level_estimation_slots(gcfg, bins, sf, ext_scale, dist_b_slots, params)
        )
        flag_surface = gather_result(bins, gcfg, surf_slots, False) & alive
        flag_insufficient = gather_result(bins, gcfg, insuf_slots, False) & alive
        if stash_slots is not None:
            stash = jnp.where(
                alive, gather_result(bins, gcfg, stash_slots,
                                     -params.maximum_surface_distance), state.stash
            )

    # neighbor count at the physics radius (diagnostic; simulation.rs:2072-2074)
    if params.force_diagnostic_fields:
        def count_edge(vi, vj, geom):
            return {"n": jnp.ones_like(geom.r)}

        ncount_slots = grid_pairs.pair_apply(gcfg, bins, sf, pscale, count_edge)["n"]
        neighbor_count = gather_result(bins, gcfg, ncount_slots, 0.0).astype(jnp.int32)
    else:
        neighbor_count = state.neighbor_count

    # 6. h_next estimation (simulation.rs:2090-2143)
    if adaptive and params.support_length_estimation != SupportLengthEstimation.FromMass:
        hn_slots = h_next_distribution_slots(
            gcfg, bins, sf, pscale, lam_slots, params, params.support_length_estimation
        )
        h_next = gather_result(bins, gcfg, hn_slots, 0.0)
        h_next = jnp.where(alive & (bins.slot_of >= 0), h_next, state.h_next)

    # 9. CFL dt (simulation.rs:2182-2191)
    sr = h_eff * kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
    v2 = jnp.sum(state.velocity * state.velocity, -1)
    val = jnp.where(alive, sr * sr / (v2 + 0.01), jnp.inf)
    dt = jnp.minimum(jnp.float32(params.max_dt), params.cfl_factor * jnp.sqrt(jnp.min(val)))
    diag["dt"] = dt

    # 10. density (simulation.rs:2204)
    rho_slots = gp.density_slots(gcfg, bins, sf, pscale) + bdens_slots
    rho_slots = jnp.where(alive_slots, rho_slots, 1.0)
    sf["rho"] = rho_slots
    density = jnp.where(alive, gather_result(bins, gcfg, rho_slots, 1.0), 1.0)

    # 11. constant field diagnostic (simulation.rs:2235-2248); viz-only, gated
    if params.force_diagnostic_fields:
        cf_slots = gp.constant_field_slots(gcfg, bins, sf, pscale) + bdens_slots / params.rest_density
        constant_field = gather_result(bins, gcfg, cf_slots, 0.0)
    else:
        constant_field = state.constant_field

    # 12+first-nonpressure: one fused sweep computes the a_ii sums AND the viscosity
    # for the pipeline-start non-pressure kick (simulation.rs:2250-2259 + :929-1005);
    # the HybridDFSPH accel-after-div-solve config keeps the separate sweep.
    vel_slots = scatter_field(bins, gcfg, state.velocity)
    zero_q = jnp.zeros(2, jnp.float32)
    method = params.pressure_solver_method
    warm = bool(params.warm_start_pressure)
    pdiv_slots = None
    first_np_at_start = (
        method != PressureSolverMethod.HybridDFSPH
        or params.hybrid_dfsph_non_pressure_accel_before_divergence_free
    )

    def finish_nonpressure(visc):
        accel = visc + jnp.asarray(params.gravity_vector(2), jnp.float32)[None, :]
        if params.pull_fluid_to is not None:
            target = jnp.asarray(params.pull_fluid_to[:2], jnp.float32)
            d = target[None, :] - sf["pos"]
            accel = accel + d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9
            ) * 13.0
        return accel

    if first_np_at_start:
        aii_sums, visc0 = gp.fused_prep_sweep(gcfg, bins, sf, pscale, vel_slots, params)
        aii_slots = gp.assemble_aii(aii_sums, sf, G_slots, bt.kind, params)
        first_np_vel = vel_slots + dt * finish_nonpressure(visc0)
    else:
        aii_slots = gp.aii_slots(gcfg, bins, sf, pscale, G_slots, bt.kind, params)
        first_np_vel = None
    aii_slots = jnp.where(alive_slots, aii_slots, 0.0)
    aii = jnp.where(alive, gather_result(bins, gcfg, aii_slots, 0.0), 0.0)
    diag["negative_aii"] = jnp.sum(alive & (aii < 0.0) & (bins.slot_of >= 0))

    # 13. pressure solve + integrate (simulation.rs:2261-2671), slot space
    def nonpressure(v):
        if first_np_vel is not None and v is vel_slots:
            return first_np_vel  # the fused sweep already produced this
        return v + dt * gp.non_pressure_accel_slots(gcfg, bins, sf, pscale, v, params)

    omega_slots = scatter_field(bins, gcfg, state.omega)
    pos_slots = sf["pos"]

    def div_of_vel(v):
        return gp.divergence_slots(gcfg, bins, sf, pscale, v, zero_q, G_slots, bt.kind, params)

    def src_full(v):
        div_v = div_of_vel(v)
        from ..utils.params import OperatorDiscretization

        if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
            next_rho = jnp.full_like(rho_slots, params.rest_density)
        else:
            next_rho = rho_slots
        return -(params.rest_density - rho_slots) / (next_rho * dt * dt) - div_v / dt

    def src_only_density():
        from ..utils.params import OperatorDiscretization

        if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
            next_rho = jnp.full_like(rho_slots, params.rest_density)
        else:
            next_rho = rho_slots
        return -(params.rest_density - rho_slots) / (next_rho * dt * dt)

    if method in (PressureSolverMethod.IISPH, PressureSolverMethod.IISPH2):
        if method == PressureSolverMethod.IISPH2:
            size_class_slots = scatter_field(bins, gcfg, state.size_class)
            omega_slots = gp.omega_iisph2_slots(gcfg, bins, sf, pscale, size_class_slots, params)
        vel_slots = nonpressure(vel_slots)
        if method == PressureSolverMethod.IISPH2:
            src = -(params.rest_density - rho_slots) / (params.rest_density * dt * dt) - (
                div_of_vel(vel_slots) / (dt * omega_slots)
            )
        else:
            src = src_full(vel_slots)
        if warm:
            p_prev = scatter_field(bins, gcfg, state.pressure)
            p0 = p_prev * jnp.sqrt(omega_slots) if method == PressureSolverMethod.IISPH2 else p_prev
        else:
            p0 = None
        res = gp.jacobi_iterations_slots(
            gcfg, bins, sf, pscale, aii_slots, src, G_slots, bt.kind, alive_slots,
            params.iisph_max_avg_density_error, DENSITY_ERROR, params, dt, p0=p0,
        )
        pressure_slots = res.pressure
        accel_slots = res.pressure_accel
        if method == PressureSolverMethod.IISPH2:
            pressure_slots = pressure_slots / jnp.sqrt(omega_slots)
            accel_slots = gp.pressure_accel_slots(
                gcfg, bins, sf, pscale, pressure_slots, G_slots, bt.kind, params
            )
        vel_slots = vel_slots + dt * accel_slots
        pos_slots = pos_slots + dt * vel_slots
        diag["density_iterations"] = res.iterations
        diag["density_avg_error"] = res.avg_error
        diag["density_max_error"] = res.max_error
        diag["solver_stats"] = (res.normal_count, res.singular_count, res.negative_count)
        src_slots, derr_slots = src, res.density_error

    elif method == PressureSolverMethod.OnlyDivergence:
        vel_slots = nonpressure(vel_slots)
        src = -div_of_vel(vel_slots) / dt
        res = gp.jacobi_iterations_slots(
            gcfg, bins, sf, pscale, aii_slots, src, G_slots, bt.kind, alive_slots,
            params.hybrid_dfsph_max_avg_divergence_error, DIVERGENCE_ERROR, params, dt,
            p0=scatter_field(bins, gcfg, state.pressure) if warm else None,
        )
        vel_slots = vel_slots + dt * res.pressure_accel
        pos_slots = pos_slots + dt * vel_slots
        pressure_slots, accel_slots = res.pressure, res.pressure_accel
        diag["div_iterations"] = res.iterations
        diag["div_avg_error"] = res.avg_error
        diag["solver_stats"] = (res.normal_count, res.singular_count, res.negative_count)
        src_slots, derr_slots = src, res.density_error

    else:  # HybridDFSPH
        if params.hybrid_dfsph_non_pressure_accel_before_divergence_free:
            vel_slots = nonpressure(vel_slots)
        src = -div_of_vel(vel_slots) / dt
        res_div = gp.jacobi_iterations_slots(
            gcfg, bins, sf, pscale, aii_slots, src, G_slots, bt.kind, alive_slots,
            params.hybrid_dfsph_max_avg_divergence_error, DIVERGENCE_ERROR, params, dt,
            p0=scatter_field(bins, gcfg, state.pressure_div) if warm else None,
        )
        vel_slots = vel_slots + dt * res_div.pressure_accel
        diag["div_iterations"] = res_div.iterations
        diag["div_avg_error"] = res_div.avg_error
        if not params.hybrid_dfsph_non_pressure_accel_before_divergence_free:
            vel_slots = nonpressure(vel_slots)
        if params.hybrid_dfsph_density_source_term == HybridDfsphDensitySourceTerm.DensityAndDivergence:
            src2 = src_full(vel_slots)
        else:
            src2 = src_only_density()
        res_den = gp.jacobi_iterations_slots(
            gcfg, bins, sf, pscale, aii_slots, src2, G_slots, bt.kind, alive_slots,
            params.hybrid_dfsph_max_avg_density_error, DENSITY_ERROR, params, dt,
            p0=scatter_field(bins, gcfg, state.pressure) if warm else None,
        )
        diag["density_iterations"] = res_den.iterations
        diag["density_avg_error"] = res_den.avg_error
        diag["density_max_error"] = res_den.max_error
        diag["solver_stats"] = (res_den.normal_count, res_den.singular_count, res_den.negative_count)
        accel_slots = res_den.pressure_accel
        pos_slots = pos_slots + dt * vel_slots + dt * dt * accel_slots
        vel_slots = vel_slots + dt * accel_slots * jnp.minimum(
            dt * params.hybrid_dfsph_factor, 1.0
        )
        pressure_slots = res_den.pressure
        src_slots, derr_slots = src2, res_den.density_error
        pdiv_slots = res_div.pressure if warm else None

    # 15. level-field smoothing (simulation.rs:2709-2722): advected positions over the
    # stale pre-advection binning (the reference reads particles.position after
    # integration while keeping the old neighbor lists)
    level, has_level, level_old = state.level, state.has_level, state.level_old
    if do_levels:
        sf_smooth = dict(sf)
        sf_smooth["pos_old"] = sf["pos"]
        sf_smooth["pos"] = pos_slots
        sm_slots = smooth_level_slots(gcfg, bins, sf_smooth, pscale, level_slots, has_slots, params)
        level = gather_result(bins, gcfg, sm_slots, -params.maximum_surface_distance)
        level = jnp.where(alive, level, 0.0)
        has_level = alive & (bins.slot_of >= 0)
        level_old = level
    elif do_levels is False and not adaptive:
        pass

    # gather integrated state back to flat
    pos2 = jnp.where(alive[:, None], gather_result(bins, gcfg, pos_slots, 0.0), pos)
    vel2 = jnp.where(alive[:, None], gather_result(bins, gcfg, vel_slots, 0.0), state.velocity)
    ok = (bins.slot_of >= 0)[:, None]
    pos2 = jnp.where(ok, pos2, pos)
    vel2 = jnp.where(ok, vel2, state.velocity)

    pressure_div = state.pressure_div
    if pdiv_slots is not None:
        pressure_div = jnp.where(alive, gather_result(bins, gcfg, pdiv_slots, 0.0), 0.0)
    new_state = state.replace(
        position=pos2,
        velocity=vel2,
        pressure=gather_result(bins, gcfg, pressure_slots, 0.0),
        pressure_div=pressure_div,
        pressure_accel=gather_result(bins, gcfg, accel_slots, 0.0),
        ppe_source_term=gather_result(bins, gcfg, src_slots, 0.0),
        density_error=gather_result(bins, gcfg, derr_slots, 0.0),
        omega=jnp.where(alive, gather_result(bins, gcfg, omega_slots, 1.0), 1.0),
        density=density,
        aii=aii,
        constant_field=constant_field,
        stash=stash,
        h=h,
        h_next=h_next,
        level=level,
        has_level=has_level,
        level_old=level_old,
        neighbor_count=neighbor_count,
        flag_is_fluid_surface=flag_surface,
        flag_insufficient_neighs=flag_insufficient,
        time=state.time + dt,
        step_number=state.step_number + 1,
    )
    return new_state, dt, diag
