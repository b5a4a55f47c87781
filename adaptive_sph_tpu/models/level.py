"""Surface detection + level (surface-distance) estimation.

Reference parity: simulation.rs:539-927 —
  EmptyAngle detector (:539-625, port of openMaelstrom surfaceDetection.cu),
  CenterDiff detector (:630-695, Horvath 2013 eq 10/11),
  iterative level propagation to a fixpoint (:729-801),
  volume-weighted field smoothing (:803-857, Winchenbach sec 5.1).

The propagation loop is a BFS wavefront: each sweep, still-Interior particles adopt
max_j(level_j - |x_ij|) over already-assigned neighbors; runs as a lax.while_loop with
an on-device change flag (the reference's AtomicBool, simulation.rs:742-743).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops.neighbors import Neighborhood
from ..ops.pairwise import sym_max, sym_sum
from ..utils.params import (
    FillStashWith,
    LevelEstimationMethod,
    SimulationParams,
    SupportLengthEstimation,
)
from . import boundary as bnd

NEG_INF = jnp.float32(-3.0e38)


def _range_check_needed(params: SimulationParams) -> bool:
    """is_neighbor_in_level_estimation_range applies only to FromDistribution modes
    (simulation.rs:697-723)."""
    return params.support_length_estimation in (
        SupportLengthEstimation.FromDistribution,
        SupportLengthEstimation.FromDistribution2,
    )


def _in_range(vi, vj, params: SimulationParams):
    """|x_ji|^2 <= (particle_radius_i * maximum_range)^2; radius from mass (simulation.rs:705-718)."""
    if not _range_check_needed(params):
        return True
    xji = vj["pos"] - vi["pos"]
    r = kernels.sphere_volume_to_radius(vi["mass"] / params.rest_density, dim=2)
    lim = r * params.maximum_range
    return jnp.sum(xji * xji, -1) <= lim * lim


def detect_surface_empty_angle(
    nb: Neighborhood, bt, position, mass, h, alive, params: SimulationParams
):
    """EmptyAngle detector (simulation.rs:539-625).

    Returns (level, has_level, flag_is_fluid_surface, flag_insufficient_neighs);
    has_level=True means FluidSurface(level=0), False means FluidInterior.
    """
    vals = {"pos": position, "mass": mass, "h": h}

    def normal_edge(vi, vj):
        dg = kernels.kernel_grad(vi["pos"] - vj["pos"], 0.5 * (vi["h"] + vj["h"]), dim=2)
        # note: the reference uses mass[i] (the receiver), not mass[j] (simulation.rs:565)
        return -(vi["mass"] / params.rest_density)[..., None] * dg

    normal = sym_sum(nb, vals, normal_edge)

    threshold = jnp.float32(jnp.cos(50.0 * jnp.pi / 180.0))
    norm2 = jnp.sum(normal * normal, -1)
    unit_normal = normal / jnp.sqrt(jnp.maximum(norm2, 1e-30))[:, None]

    def cone_edge(vi, vj):
        xji = vj["pos"] - vi["pos"]
        xji = xji / (jnp.sqrt(jnp.sum(xji * xji, -1)) + 1e-6)[..., None]
        d = jnp.sum(xji * vi["un"], -1)
        hit = d > threshold
        if _range_check_needed(params):
            hit = hit & _in_range(vi, vj, params)
        return jnp.where(hit, 1.0, 0.0)

    cone_hit = (
        sym_max(nb, {**vals, "un": unit_normal}, cone_edge, fill=jnp.float32(0.0)) > 0.5
    )

    insufficient = nb.count < (2 * 2 - 1)  # D*2-1 with D=2
    symmetric = norm2 < 1e-5

    near_boundary = jnp.zeros_like(symmetric)
    dist_b = bnd.distance_to_boundary(bt)
    if (not params.boundary_is_fluid_surface) and dist_b is not None:
        # raw per-particle h (zero in uniform builds -> condition never fires, as in the
        # reference where the h vec is zero-filled under uniform sizes)
        near_boundary = dist_b < h * 1.5

    is_interior = jnp.where(
        insufficient,
        False,
        jnp.where(symmetric, True, jnp.where(near_boundary, True, cone_hit)),
    )

    is_surface = ~is_interior
    level = jnp.zeros_like(mass)  # surface_level = 0.0 (simulation.rs:619)
    has_level = is_surface & alive
    return level, has_level, is_surface & alive, insufficient & alive


def detect_surface_center_diff(nb: Neighborhood, position, mass, h, alive, params):
    """CenterDiff detector (simulation.rs:630-695)."""

    def edge(vi, vj):
        vol_j = vj["mass"] / params.rest_density
        r_j = kernels.sphere_volume_to_radius(vol_j, dim=2)
        diff = vi["pos"] - vj["pos"]
        r = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-30)
        w = kernels.kernel_w(r, 0.5 * (vi["h"] + vj["h"]), dim=2) * vol_j
        return {
            "w_sum": w,
            "avg_center": w[..., None] * vj["pos"],
            "avg_radius": w * r_j,
        }

    sums = sym_sum(nb, {"pos": position, "mass": mass, "h": h}, edge)
    w_sum = jnp.maximum(sums["w_sum"], 1e-30)
    avg_radius = sums["avg_radius"] / w_sum
    surface_level = -0.85 * avg_radius
    avg_center = sums["avg_center"] / w_sum[:, None]
    phi_initial = jnp.linalg.norm(position - avg_center, axis=-1) - avg_radius
    phi = jnp.where(nb.count < 5, surface_level, phi_initial)

    is_surface = phi >= surface_level
    level = jnp.where(is_surface, phi, 0.0)
    has_level = is_surface & alive
    return level, has_level, is_surface & alive


def propagate_levels(
    nb: Neighborhood, position, mass, h, alive, level, has_level, stash, params: SimulationParams
):
    """Iterative wavefront propagation to a fixpoint (simulation.rs:729-801).

    Particles that receive an estimate keep it (they become FluidSurface and are
    copied verbatim in later sweeps). Optionally snapshots the field into `stash`
    after the first sweep (FillStashWith::SurfaceDistanceMiddle).
    """
    vals = {"pos": position, "mass": mass}

    def one_sweep(level, has_level):
        def edge(vi, vj):
            xij = jnp.sqrt(jnp.sum((vj["pos"] - vi["pos"]) ** 2, -1) + 1e-30)
            est = vj["lvl"] - xij
            ok = vj["has"]
            if _range_check_needed(params):
                ok = ok & _in_range(vi, vj, params)
            return jnp.where(ok, est, NEG_INF)

        est = sym_max(nb, {**vals, "lvl": level, "has": has_level.astype(bool)}, edge, fill=NEG_INF)
        newly = (~has_level) & (est > NEG_INF * 0.5) & alive
        return jnp.where(newly, est, level), has_level | newly, jnp.any(newly)

    # first sweep outside the loop so the stash snapshot point matches the reference
    level, has_level, changed = one_sweep(level, has_level)
    if params.fill_stash_with == FillStashWith.SurfaceDistanceMiddle:
        stash = jnp.where(has_level, level, -params.maximum_surface_distance)

    def cond(carry):
        _, _, changed = carry
        return changed

    def body(carry):
        lvl, has, _ = carry
        return one_sweep(lvl, has)

    level, has_level, _ = jax.lax.while_loop(cond, body, (level, has_level, changed))
    return level, has_level, stash


def smooth_level_field(
    nb: Neighborhood, position, mass, density, h, level, has_level, params: SimulationParams
):
    """Volume-weighted SPH smoothing of the clamped level field (simulation.rs:803-857)."""

    def edge(vi, vj):
        diff = vi["pos"] - vj["pos"]
        r = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-30)
        w = kernels.kernel_w(r, 0.5 * (vi["h"] + vj["h"]), dim=2)
        dist = jnp.where(
            vj["has"],
            jnp.maximum(vj["lvl"], -params.maximum_surface_distance),
            -params.maximum_surface_distance,
        )
        vw = vj["mass"] / vj["rho"] * w
        return {"level": dist * vw, "weight": vw}

    sums = sym_sum(
        nb,
        {
            "pos": position,
            "mass": mass,
            "rho": density,
            "h": h,
            "lvl": level,
            "has": has_level.astype(bool),
        },
        edge,
    )
    weight = jnp.maximum(sums["weight"], 1e-30)
    new_level = sums["level"] / weight
    return new_level, jnp.ones_like(has_level, dtype=bool)


def perform_level_estimation(
    nb: Neighborhood, bt, position, mass, density, h, alive, stash, params: SimulationParams
):
    """Detect + propagate (simulation.rs:862-927). Returns
    (level, has_level, flag_surface, flag_insufficient, stash)."""
    if params.level_estimation_method == LevelEstimationMethod.NoneMethod:
        C = position.shape[0]
        z = jnp.zeros(C, jnp.float32)
        f = jnp.zeros(C, bool)
        return z, f, f, f, stash

    if params.level_estimation_method == LevelEstimationMethod.EmptyAngle:
        level, has_level, flag_surface, flag_insufficient = detect_surface_empty_angle(
            nb, bt, position, mass, h, alive, params
        )
    else:
        level, has_level, flag_surface = detect_surface_center_diff(
            nb, position, mass, h, alive, params
        )
        flag_insufficient = jnp.zeros_like(flag_surface)

    if params.fill_stash_with == FillStashWith.SurfaceDistanceFirstIteration:
        stash = jnp.where(has_level, level, -params.maximum_surface_distance)

    level, has_level, stash = propagate_levels(
        nb, position, mass, h, alive, level, has_level, stash, params
    )
    return level, has_level, flag_surface, flag_insufficient, stash
