"""Surface detection + level (surface-distance) estimation.

Reference parity: simulation.rs:539-927 —
  EmptyAngle detector (:539-625, port of openMaelstrom surfaceDetection.cu),
  CenterDiff detector (:630-695, Horvath 2013 eq 10/11),
  iterative level propagation to a fixpoint (:729-801),
  volume-weighted field smoothing (:803-857, Winchenbach sec 5.1).

The propagation loop is a BFS wavefront (Bellman-Ford over the particle graph with
edge weights |x_ij|): each sweep, still-Interior particles adopt
max_j(level_j - |x_ij|) over already-assigned neighbors; it runs as a lax.while_loop
with an on-device change flag (the reference's AtomicBool, simulation.rs:742-743).
All static per-edge quantities (distances, kernels, gradients, range masks) come from
a per-step EdgeCache so a sweep is just one (C, K) gather + max-reduce + segment-max.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops.edge_cache import EdgeCache, reduce_edges
from ..ops.neighbors import Neighborhood
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


def _range_masks(nb: Neighborhood, cache: EdgeCache, mass, params: SimulationParams):
    """Receiver-side |x_ij| <= r_receiver * maximum_range masks for both edge
    directions (simulation.rs:705-718). True everywhere when the check is off."""
    if not _range_check_needed(params):
        t = jnp.ones_like(cache.r, dtype=bool)
        return t, t
    radius = kernels.sphere_volume_to_radius(mass / params.rest_density, dim=2)
    lim_i = radius[:, None] * params.maximum_range  # receiver = row particle
    lim_j = radius[nb.idx] * params.maximum_range  # receiver = column particle
    return cache.r <= lim_i, cache.r <= lim_j


def _seg_max(nb: Neighborhood, edge_vals, fill):
    """Segment-max of reversed (cross) edge values into their targets."""
    C, K = nb.idx.shape
    flat = jnp.where(nb.cross.reshape(-1), edge_vals.reshape(-1), fill)
    permuted = flat[nb.bwd_perm]
    seg = jax.ops.segment_max(permuted, nb.bwd_seg, num_segments=C + 1, indices_are_sorted=True)
    return jnp.maximum(seg[:C], fill)


def detect_surface_empty_angle(
    nb: Neighborhood, cache: EdgeCache, bt, mass, h, alive, params: SimulationParams
):
    """EmptyAngle detector (simulation.rs:539-625)."""
    # normal_i = -sum_j (m_i / rho0) grad W_ij — note: the reference uses mass[i]
    # (the receiver), not mass[j] (simulation.rs:565)
    normal = reduce_edges(
        nb,
        fwd=-(mass / params.rest_density)[:, None, None] * cache.grad,
        # reversed edge: receiver is the column particle j -> its own mass m_j and
        # grad W(x_j - x_i) = -grad
        bwd=(cache.mass_j / params.rest_density)[..., None] * cache.grad,
    )

    threshold = jnp.float32(jnp.cos(50.0 * jnp.pi / 180.0))
    norm2 = jnp.sum(normal * normal, -1)
    unit_normal = normal / jnp.sqrt(jnp.maximum(norm2, 1e-30))[:, None]

    # cone test: any neighbor with normalized x_ji . n_i > cos(50deg) (range-checked)
    rng_i, rng_j = _range_masks(nb, cache, mass, params)
    xji_unit = -cache.diff / (cache.r + 1e-6)[..., None]
    dot_fwd = jnp.sum(xji_unit * unit_normal[:, None, :], -1)
    hit_fwd = nb.mask & rng_i & (dot_fwd > threshold)
    # reversed edge: x_ij_unit . n_j
    dot_bwd = jnp.sum((cache.diff / (cache.r + 1e-6)[..., None]) * unit_normal[nb.idx], -1)
    hit_bwd = rng_j & (dot_bwd > threshold)
    cone_hit = jnp.any(hit_fwd, axis=1) | (
        _seg_max(nb, hit_bwd.astype(jnp.float32), jnp.float32(0.0)) > 0.5
    )

    insufficient = nb.count < (2 * 2 - 1)  # D*2-1 with D=2
    symmetric = norm2 < 1e-5

    near_boundary = jnp.zeros_like(symmetric)
    dist_b = bnd.distance_to_boundary(bt)
    if (not params.boundary_is_fluid_surface) and dist_b is not None:
        # raw per-particle h (zero in uniform builds -> condition never fires, matching
        # the reference where the h vec is zero-filled under uniform sizes)
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


def detect_surface_center_diff(nb: Neighborhood, cache: EdgeCache, position, mass, alive, params):
    """CenterDiff detector (simulation.rs:630-695)."""
    vol_j = cache.mass_j / params.rest_density
    r_j = kernels.sphere_volume_to_radius(vol_j, dim=2)
    wv_f = cache.w * vol_j
    vol_i = (mass / params.rest_density)[:, None]
    r_i = kernels.sphere_volume_to_radius(vol_i, dim=2)
    wv_b = cache.w * vol_i

    pos_j = position[nb.idx]
    sums = reduce_edges(
        nb,
        fwd={
            "w_sum": wv_f,
            "avg_center": wv_f[..., None] * pos_j,
            "avg_radius": wv_f * r_j,
        },
        bwd={
            "w_sum": wv_b,
            "avg_center": wv_b[..., None] * jnp.broadcast_to(position[:, None, :], pos_j.shape),
            "avg_radius": wv_b * r_i,
        },
    )
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
    nb: Neighborhood, cache: EdgeCache, mass, alive, level, has_level, stash,
    params: SimulationParams,
):
    """Iterative wavefront propagation to a fixpoint (simulation.rs:729-801).

    Assigned particles keep their value (copied verbatim in later sweeps). Optionally
    snapshots the field into `stash` after the first sweep
    (FillStashWith::SurfaceDistanceMiddle).
    """
    rng_i, rng_j = _range_masks(nb, cache, mass, params)
    fwd_ok = nb.mask & rng_i
    idx = nb.idx

    def one_sweep(level, has_level):
        lvl_j = level[idx]
        has_j = has_level[idx]
        est_f = jnp.where(fwd_ok & has_j, lvl_j - cache.r, NEG_INF)
        est = jnp.max(est_f, axis=1)
        # reversed edges: j receives level_i - r when i is assigned (range per receiver j)
        est_b = jnp.where(rng_j & has_level[:, None], level[:, None] - cache.r, NEG_INF)
        est = jnp.maximum(est, _seg_max(nb, jnp.broadcast_to(est_b, cache.r.shape), NEG_INF))

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
    nb: Neighborhood, cache: EdgeCache, mass, density, level, has_level,
    params: SimulationParams,
):
    """Volume-weighted SPH smoothing of the clamped level field (simulation.rs:803-857).

    Runs on the *filtered* neighborhood with this step's densities (cache has rho_j).
    """
    max_depth = -params.maximum_surface_distance
    dist_j = jnp.where(has_level[nb.idx], jnp.maximum(level[nb.idx], max_depth), max_depth)
    dist_i = jnp.where(has_level, jnp.maximum(level, max_depth), max_depth)[:, None]
    vw_f = cache.mass_j / cache.rho_j * cache.w
    vw_b = (mass / density)[:, None] * cache.w

    sums = reduce_edges(
        nb,
        fwd={"level": dist_j * vw_f, "weight": vw_f},
        bwd={"level": dist_i * vw_b, "weight": vw_b},
    )
    weight = jnp.maximum(sums["weight"], 1e-30)
    new_level = sums["level"] / weight
    return new_level, jnp.ones_like(has_level, dtype=bool)


def perform_level_estimation(
    nb: Neighborhood, cache: EdgeCache, bt, position, mass, h, alive, stash,
    params: SimulationParams,
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
            nb, cache, bt, mass, h, alive, params
        )
    else:
        level, has_level, flag_surface = detect_surface_center_diff(
            nb, cache, position, mass, alive, params
        )
        flag_insufficient = jnp.zeros_like(flag_surface)

    if params.fill_stash_with == FillStashWith.SurfaceDistanceFirstIteration:
        stash = jnp.where(has_level, level, -params.maximum_surface_distance)

    level, has_level, stash = propagate_levels(
        nb, cache, mass, alive, level, has_level, stash, params
    )
    return level, has_level, flag_surface, flag_insufficient, stash
