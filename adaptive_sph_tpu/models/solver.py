"""Relaxed-Jacobi PPE solver and the four pressure-solver integrators.

Reference parity (simulation.rs):
  iisph_single_pressure_iteration :1207-1322   (one sweep: accel + divergence + update)
  iisph_pressure_iterations       :1378-1516   (loop with >=2-iteration rule + tolerances)
  integrator dispatch             :2261-2671   (IISPH, IISPH2, OnlyDivergence, HybridDFSPH)

The iteration loop is a lax.while_loop with the convergence reduction on-device; the
reference's per-iteration console lines become returned diagnostics. Its aii<0 panic
(simulation.rs:1390-1403) becomes a `negative_aii` count in the diagnostics that the
host-side runner raises on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops.neighbors import Neighborhood
from ..utils.params import (
    HybridDfsphDensitySourceTerm,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
)
from . import physics

DENSITY_ERROR = 0
DIVERGENCE_ERROR = 1

SINGULAR_AII_EPS = 1e-3  # `aii.abs() < 10e-4` (simulation.rs:1247)


class SolveResult(NamedTuple):
    pressure: jnp.ndarray
    pressure_accel: jnp.ndarray
    density_error: jnp.ndarray
    iterations: jnp.ndarray  # () int32 — reference's returned num_pressure_iters
    avg_error: jnp.ndarray  # () f32 — last sweep, per-normal-particle average
    max_error: jnp.ndarray  # () f32
    normal_count: jnp.ndarray
    singular_count: jnp.ndarray
    negative_count: jnp.ndarray


def iisph_pressure_iterations(
    nb: Neighborhood,
    cache,
    bst,
    mass,
    density,
    aii,
    ppe_source_term,
    alive,
    max_avg_error: float,
    residual_type: int,
    clamp_negative_pressures: bool,
    params: SimulationParams,
    dt,
    p0=None,
) -> SolveResult:
    """Jacobi sweeps until `avg_err < tol` with the >=2-iterations rule (simulation.rs:1405-1480).

    p0: optional warm-start pressure (params.warm_start_pressure extension); the
    reference cold-starts at zero (simulation.rs:1143/1169/1190).

    Runs over the per-step EdgeCache + factored boundary terms: each sweep is one
    (C, K) gather of pressure, one of the acceleration field, fused arithmetic, and
    two sorted segment-sums."""
    C = mass.shape[0]
    zero_q = jnp.zeros(2, jnp.float32)

    singular = jnp.abs(aii) < SINGULAR_AII_EPS
    aii_safe = jnp.where(singular, 1.0, aii)
    w = jnp.float32(params.jacobi_omega)
    beta = float(params.jacobi_momentum)  # heavy-ball acceleration (0 = reference)

    def one_sweep(pressure, p_prev, beta_on=None):
        accel = physics.pressure_accel(nb, cache, bst, pressure, mass, density, params)
        a_p = physics.divergence(nb, cache, bst, accel, zero_q, mass, density, params)
        s = ppe_source_term

        p_next = pressure + w * (s - a_p) / aii_safe
        if beta > 0.0:
            # momentum gated off when the previous sweep already met tolerance
            # (see tile_physics.tile_jacobi): avoids re-raising a converged
            # residual at the warm-start >=2-iteration floor
            b = jnp.float32(beta) * beta_on.astype(jnp.float32)
            p_next = p_next + b * (pressure - p_prev)
        p_next = jnp.where(singular, 0.0, p_next)

        if residual_type == DENSITY_ERROR:
            predicted_error = density * dt * dt * (s - a_p)
        else:
            predicted_error = dt * (s - a_p)

        clamped = (p_next <= 0.0) & bool(clamp_negative_pressures)
        p_next = jnp.where(clamped, 0.0, p_next)

        is_normal = alive & (~singular) & (~clamped)
        normal_count = jnp.sum(is_normal)
        avg = jnp.sum(jnp.where(is_normal, predicted_error, 0.0)) / jnp.maximum(
            normal_count, 1
        ).astype(jnp.float32)
        avg = jnp.where(normal_count > 0, avg, jnp.nan)
        max_err = jnp.max(jnp.where(is_normal, jnp.abs(predicted_error), 0.0))
        stats = dict(
            normal=normal_count,
            singular=jnp.sum(alive & singular),
            negative=jnp.sum(alive & (~singular) & clamped),
            avg=avg,
            max=max_err,
        )
        per_particle_error = jnp.where(residual_type == DENSITY_ERROR, predicted_error, 0.0)
        return p_next, accel, stats, per_particle_error

    def converged(stats):
        if residual_type == DENSITY_ERROR:
            ok = jnp.abs(stats["avg"] / params.rest_density) < max_avg_error
        else:
            ok = jnp.abs(stats["avg"]) < max_avg_error / dt
        return (stats["normal"] == 0) | ok

    def cond(carry):
        return ~carry["done"]

    def body(carry):
        p, iters = carry["pressure"], carry["iters"]
        p_next, _, stats, perr = one_sweep(p, carry.get("p_prev", p),
                                           ~carry.get("prev_conv", jnp.bool_(False)))
        brk = (converged(stats) & (iters > 1)) | (iters == params.max_iters)
        out = dict(
            pressure=p_next,
            iters=jnp.where(brk, iters, iters + 1),
            done=brk,
            avg=stats["avg"],
            max=stats["max"],
            normal=stats["normal"],
            singular=stats["singular"],
            negative=stats["negative"],
            density_error=perr,
        )
        if beta > 0.0:
            out["p_prev"] = p
            out["prev_conv"] = converged(stats)
        return out

    if p0 is None:
        p_init = jnp.zeros(C, jnp.float32)
    else:
        p_init = jnp.where(alive & (~singular), jnp.maximum(p0, 0.0), 0.0)
    init = dict(
        pressure=p_init,
        iters=jnp.int32(0),
        done=jnp.bool_(False),
        avg=jnp.float32(0.0),
        max=jnp.float32(0.0),
        normal=jnp.int32(0),
        singular=jnp.int32(0),
        negative=jnp.int32(0),
        density_error=jnp.zeros(C, jnp.float32),
    )
    if beta > 0.0:
        init["p_prev"] = p_init
        init["prev_conv"] = jnp.bool_(False)
    out = jax.lax.while_loop(cond, body, init)

    # final pressure-accel recompute with the converged pressure (simulation.rs:1499-1509)
    final_accel = physics.pressure_accel(nb, cache, bst, out["pressure"], mass, density, params)
    return SolveResult(
        pressure=out["pressure"],
        pressure_accel=final_accel,
        density_error=out["density_error"],
        iterations=out["iters"],
        avg_error=out["avg"],
        max_error=out["max"],
        normal_count=out["normal"],
        singular_count=out["singular"],
        negative_count=out["negative"],
    )


def compute_omega_iisph2(nb: Neighborhood, cache, mass, density, h, size_class, params):
    """Per-particle Omega = 1 + H_i/(3 rho_i) sum_j m_j dW/dH (simulation.rs:2262-2311).

    `Large` particles use the self-term approximation with d=0 (simulation.rs:2278-2288).
    Clamped to [0.125, 2.5].
    """
    from ..ops.edge_cache import reduce_edges
    from .state import SIZE_LARGE

    srbs = kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH

    H_ij = cache.h_ij * srbs
    dwdh = kernels.kernel_dw_dH(cache.r, H_ij, dim=2)
    sum_term = reduce_edges(nb, cache.mass_j * dwdh, mass[:, None] * dwdh)

    H_i = h * srbs
    omega_neigh = 1.0 + H_i / (3.0 * density) * sum_term
    # Large particles: single self term at d=0 with H_ii = H_i
    self_term = mass * kernels.kernel_dw_dH(jnp.zeros_like(h), H_i, dim=2)
    omega_large = 1.0 + H_i / (3.0 * density) * self_term

    omega = jnp.where(size_class == SIZE_LARGE, omega_large, omega_neigh)
    return jnp.clip(omega, 0.125, 2.5)


def solve_and_integrate(nb, cache, bst, state, h, dt, params: SimulationParams):
    """Pressure-solver dispatch + position/velocity integration (simulation.rs:2261-2671).

    `state` is a FluidState with this step's density/aii already computed; `cache` the
    per-step EdgeCache (with rho_j), `bst` the factored boundary solver terms.
    Returns (new_state_fields dict, diagnostics dict).
    """
    pos, vel = state.position, state.velocity
    mass, rho, alive = state.mass, state.density, state.alive
    warm = bool(params.warm_start_pressure)
    diag = {}

    def nonpressure(vel_in):
        acc = physics.non_pressure_accel(nb, cache, pos, vel_in, rho, mass, params)
        return vel_in + dt * acc

    method = params.pressure_solver_method

    if method in (PressureSolverMethod.IISPH, PressureSolverMethod.IISPH2):
        if method == PressureSolverMethod.IISPH2:
            omega = compute_omega_iisph2(nb, cache, mass, rho, h, state.size_class, params)
        else:
            omega = state.omega
        vel = nonpressure(vel)
        if method == PressureSolverMethod.IISPH2:
            src = physics.source_term_full_with_omega(
                nb, cache, bst, vel, mass, rho, omega, params, dt
            )
        else:
            src = physics.source_term_full(nb, cache, bst, vel, mass, rho, params, dt)
        if warm:
            p0 = state.pressure * jnp.sqrt(omega) if method == PressureSolverMethod.IISPH2 else state.pressure
        else:
            p0 = None
        res = iisph_pressure_iterations(
            nb, cache, bst, mass, rho, state.aii, src, alive,
            params.iisph_max_avg_density_error, DENSITY_ERROR, True, params, dt, p0=p0,
        )
        pressure = res.pressure
        accel = res.pressure_accel
        if method == PressureSolverMethod.IISPH2:
            pressure = pressure / jnp.sqrt(omega)  # simulation.rs:2358-2360
            accel = physics.pressure_accel(nb, cache, bst, pressure, mass, rho, params)
        vel = vel + dt * accel
        pos = pos + dt * vel
        diag["density_iterations"] = res.iterations
        diag["density_avg_error"] = res.avg_error
        diag["density_max_error"] = res.max_error
        new = dict(
            position=pos, velocity=vel, pressure=pressure, pressure_accel=accel,
            ppe_source_term=src, density_error=res.density_error, omega=omega,
        )
        diag["solver_stats"] = (res.normal_count, res.singular_count, res.negative_count)
        return new, diag

    if method == PressureSolverMethod.OnlyDivergence:
        vel = nonpressure(vel)
        src = physics.source_term_divergence(nb, cache, bst, vel, mass, rho, params, dt)
        res = iisph_pressure_iterations(
            nb, cache, bst, mass, rho, state.aii, src, alive,
            params.hybrid_dfsph_max_avg_divergence_error, DIVERGENCE_ERROR, True, params, dt,
            p0=state.pressure if warm else None,
        )
        vel = vel + dt * res.pressure_accel
        pos = pos + dt * vel
        diag["div_iterations"] = res.iterations
        diag["div_avg_error"] = res.avg_error
        new = dict(
            position=pos, velocity=vel, pressure=res.pressure,
            pressure_accel=res.pressure_accel, ppe_source_term=src,
            density_error=res.density_error, omega=state.omega,
        )
        diag["solver_stats"] = (res.normal_count, res.singular_count, res.negative_count)
        return new, diag

    assert method == PressureSolverMethod.HybridDFSPH
    if params.hybrid_dfsph_non_pressure_accel_before_divergence_free:
        vel = nonpressure(vel)

    # divergence-free solve -> velocity update only (simulation.rs:2517-2560)
    src = physics.source_term_divergence(nb, cache, bst, vel, mass, rho, params, dt)
    res_div = iisph_pressure_iterations(
        nb, cache, bst, mass, rho, state.aii, src, alive,
        params.hybrid_dfsph_max_avg_divergence_error, DIVERGENCE_ERROR, True, params, dt,
        p0=state.pressure_div if warm else None,
    )
    vel = vel + dt * res_div.pressure_accel
    diag["div_iterations"] = res_div.iterations
    diag["div_avg_error"] = res_div.avg_error

    if not params.hybrid_dfsph_non_pressure_accel_before_divergence_free:
        vel = nonpressure(vel)

    # density solve (simulation.rs:2578-2620)
    if params.hybrid_dfsph_density_source_term == HybridDfsphDensitySourceTerm.DensityAndDivergence:
        src2 = physics.source_term_full(nb, cache, bst, vel, mass, rho, params, dt)
    else:
        src2 = physics.source_term_only_density(rho, params, dt)
    res_den = iisph_pressure_iterations(
        nb, cache, bst, mass, rho, state.aii, src2, alive,
        params.hybrid_dfsph_max_avg_density_error, DENSITY_ERROR, True, params, dt,
        p0=state.pressure if warm else None,
    )
    diag["density_iterations"] = res_den.iterations
    diag["density_avg_error"] = res_den.avg_error
    diag["density_max_error"] = res_den.max_error

    # position-level correction + blended velocity correction (simulation.rs:2622-2669)
    accel = res_den.pressure_accel
    pos = pos + dt * vel + dt * dt * accel
    vel = vel + dt * accel * jnp.minimum(dt * params.hybrid_dfsph_factor, 1.0)

    new = dict(
        position=pos, velocity=vel, pressure=res_den.pressure, pressure_accel=accel,
        ppe_source_term=src2, density_error=res_den.density_error, omega=state.omega,
    )
    if warm:
        new["pressure_div"] = res_div.pressure
    diag["solver_stats"] = (res_den.normal_count, res_den.singular_count, res_den.negative_count)
    return new, diag
