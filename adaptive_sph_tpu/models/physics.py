"""SPH physics sweeps: density, viscosity, operators, a_ii, source terms.

Reference parity (simulation.rs):
  density                :1007-1049   non-pressure accel    :929-1005
  divergence operator    :1552-1592   pressure accel        :1750-1808
  a_ii closed forms      : boundary_handler/*.rs            source terms :1633-1748

Every sweep runs over the per-step EdgeCache (ops/edge_cache.py): kernel values,
gradients, distances and gathered masses/densities are computed once per neighborhood;
the Jacobi loop's two sweeps per iteration reduce to one (C, K) gather of the changing
field plus fused arithmetic and a sorted segment-sum. Boundary contributions collapse
to precomputed per-particle vectors (models/boundary.py solver terms).

The operator discretization switch (ConsistentSimpleGradient /
ConsistentSymmetricGradient / Winchenbach2020, simulation_parameters.rs:110-122) is
resolved at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import kernels
from ..ops.edge_cache import EdgeCache, reduce_edges
from ..ops.neighbors import Neighborhood
from ..utils.params import (
    OperatorDiscretization,
    ParticleSizes,
    SimulationParams,
    ViscosityType,
)
from . import boundary as bnd


def effective_h(h, params: SimulationParams):
    """Uniform mode uses the global params.h everywhere (sph_kernels.rs:265-278)."""
    if params.particle_sizes == ParticleSizes.Uniform:
        return jnp.full_like(h, jnp.float32(params.h))
    return h


def compute_density(nb: Neighborhood, cache: EdgeCache, bt, position, h,
                    params: SimulationParams, mass):
    """rho_i = sum_j m_j W_ij + boundary term (simulation.rs:1007-1028)."""
    fwd = cache.mass_j * cache.w
    bwd = mass[:, None] * cache.w
    rho = reduce_edges(nb, fwd, bwd)
    return rho + bnd.density_boundary_term(bt, position, h, params)


def compute_constant_field(nb, cache: EdgeCache, bt, position, h, params, mass, density):
    """<1>_i = sum_j (m_j/rho_j) W_ij + boundary/rho0 (simulation.rs:2235-2248)."""
    fwd = cache.mass_j / cache.rho_j * cache.w
    bwd = (mass / density)[:, None] * cache.w
    cf = reduce_edges(nb, fwd, bwd)
    return cf + bnd.density_boundary_term(bt, position, h, params) / params.rest_density


def non_pressure_accel(nb, cache: EdgeCache, position, velocity, density, mass,
                       params: SimulationParams):
    """Viscosity + gravity + interactive pull (simulation.rs:929-1005)."""
    D = position.shape[1]
    speed_of_sound = 88.0  # WCSPH below eq. 9

    if params.viscosity_type == ViscosityType.XSPH:
        visc = jnp.zeros_like(position)  # todo!() in the reference (simulation.rs:2673-2676)
    else:
        v_j = velocity[nb.idx]
        v_ab = velocity[:, None, :] - v_j  # v_i - v_j, same for both edge directions
        dot = jnp.sum(cache.diff * v_ab, -1)  # x_ij . v_ij (symmetric under swap)
        r2 = cache.r * cache.r
        attract = dot < 0.0
        rho_i = density[:, None]
        if params.viscosity_type == ViscosityType.WCSPH:
            viscous_term = (
                2.0 * params.viscosity * cache.h_ij * speed_of_sound / (rho_i + cache.rho_j)
            )
            pi_ab = -viscous_term * dot / (r2 + 0.001 * cache.h_ij * cache.h_ij)
            fwd = (-cache.mass_j * pi_ab)[..., None] * cache.grad
            # reversed edge: x_ba = -diff, v_ba = -v_ab, grad_ba = -grad -> pi same,
            # contribution to j uses m_i and -grad
            bwd = (mass[:, None] * pi_ab)[..., None] * cache.grad
        else:  # ApproxLaplace (SPH Tutorial Eq. 102)
            rho_ij = (rho_i + cache.rho_j) * 0.5
            coeff = 2.0 * (D + 2) * dot / (r2 + 0.01 * cache.h_ij * cache.h_ij) / rho_ij
            fwd = (params.viscosity * cache.mass_j * coeff)[..., None] * cache.grad
            bwd = (-params.viscosity * mass[:, None] * coeff)[..., None] * cache.grad
        fwd = jnp.where(attract[..., None], fwd, 0.0)
        bwd = jnp.where(attract[..., None], bwd, 0.0)
        visc = reduce_edges(nb, fwd, bwd)

    accel = visc + jnp.asarray(params.gravity_vector(D), jnp.float32)[None, :]
    if params.pull_fluid_to is not None:
        target = jnp.asarray(params.pull_fluid_to[:D], jnp.float32)
        d = target[None, :] - position
        accel = accel + d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9) * 13.0
    return accel


def divergence(nb, cache: EdgeCache, bst, quantity, quantity_b, mass, density,
               params: SimulationParams):
    """div(A)_i per simulation.rs:1552-1592 (+ precomputed boundary term).

    bst: BoundarySolverTerms (models/boundary.py) or None.
    """
    q_j = quantity[nb.idx]  # (C, K, D)
    dq_dot = jnp.sum((q_j - quantity[:, None, :]) * cache.grad, -1)  # (C, K)

    if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
        fwd = cache.mass_j / cache.rho_j * dq_dot
        bwd = (mass / density)[:, None] * dq_dot  # (q_i-q_j).(-grad) = dq_dot
        s = reduce_edges(nb, fwd, bwd)
    else:
        fwd = cache.mass_j * dq_dot
        bwd = mass[:, None] * dq_dot
        s = reduce_edges(nb, fwd, bwd) / density

    if bst is not None:
        s = s + bnd.boundary_divergence_fast(bst, quantity, quantity_b, density, params)
    return s


def pressure_accel(nb, cache: EdgeCache, bst, pressure, mass, density,
                   params: SimulationParams):
    """a_p = -sum_j m_j (p_i/rho_i^2 + p_j/rho_j^2) grad W_ij + boundary
    (simulation.rs:1750-1808)."""
    term = pressure / (density * density)  # (C,)
    term_pair = term[:, None] + pressure[nb.idx] / (cache.rho_j * cache.rho_j)
    fwd = (-cache.mass_j * term_pair)[..., None] * cache.grad
    bwd = (mass[:, None] * term_pair)[..., None] * cache.grad  # -m_i * term * (-grad)
    acc = reduce_edges(nb, fwd, bwd)
    if bst is not None:
        acc = acc + bnd.boundary_pressure_accel_fast(bst, pressure, density, params)
    return acc


def compute_aii(nb, cache: EdgeCache, bt, bst, mass, density, params: SimulationParams):
    """Closed-form diagonal a_ii, dispatching on boundary handler + discretization.

    ParticleBased: particle_boundary_handler.rs:188-232
    Winchenbach SDF: boundary_winchenbach2020.rs:225-306
    NoBoundary: fluid-only terms of the ConsistentSimpleGradient form (the reference
    leaves this unimplemented!(); documented extension).
    """
    rho_i = density
    rho_i_sq = rho_i * rho_i
    rho_i_cu = rho_i_sq * rho_i
    rho_b = params.rest_density
    od = params.operator_discretization
    grad2 = jnp.sum(cache.grad * cache.grad, -1)

    sums = reduce_edges(
        nb,
        fwd={
            "mj_wij": cache.mass_j[..., None] * cache.grad,
            "mj_wij_sq": cache.mass_j * grad2,
            "mj_by_rhoj_wij": (cache.mass_j / cache.rho_j)[..., None] * cache.grad,
            "mj_by_rhoj_wij_sq": cache.mass_j / cache.rho_j * grad2,
        },
        bwd={
            "mj_wij": -mass[:, None, None] * cache.grad,
            "mj_wij_sq": mass[:, None] * grad2,
            "mj_by_rhoj_wij": -(mass / density)[:, None, None] * cache.grad,
            "mj_by_rhoj_wij_sq": (mass / density)[:, None] * grad2,
        },
    )
    mj_wij = sums["mj_wij"]
    mj_wij_sq = sums["mj_wij_sq"]
    mi = mass

    if bt.kind == "particles":
        # boundary sums precomputed once per step in bst
        p_ib_coeff = 0.0 if od == OperatorDiscretization.ConsistentSimpleGradient else 1.0
        mb_wib = bst.G
        mb_p = bst.G * (p_ib_coeff / (rho_b * rho_b))
        lhs = mj_wij / rho_i_sq[:, None] + mb_wib / rho_i_sq[:, None] + mb_p
        rhs = mj_wij + mb_wib
        return jnp.sum(lhs * rhs, -1) / rho_i + mi * mj_wij_sq / rho_i_cu

    if bt.kind == "sdf":
        G = bst.G  # sum of grad_lambda over shapes (C, D)
        if od == OperatorDiscretization.Winchenbach2020:
            sum_boundary = G * (rho_b / rho_i_sq)[:, None]  # p_ib_coeff = 0
            lhs = mj_wij / rho_i_sq[:, None] + sum_boundary
            rhs = sums["mj_by_rhoj_wij"] + G
            return jnp.sum(lhs * rhs, -1) + mi * sums["mj_by_rhoj_wij_sq"] / rho_i_sq
        else:
            p_ib_coeff = 1.0 if od == OperatorDiscretization.ConsistentSymmetricGradient else 0.0
            rhob_glambda = G * rho_b
            sum_boundary = G * (rho_b * (1.0 / rho_i_sq + p_ib_coeff / (rho_b * rho_b)))[:, None]
            lhs = mj_wij / rho_i_sq[:, None] + sum_boundary
            rhs = mj_wij / rho_i[:, None] + rhob_glambda / rho_i[:, None]
            return jnp.sum(lhs * rhs, -1) + mi * mj_wij_sq / rho_i_cu

    lhs = mj_wij / rho_i_sq[:, None]
    return jnp.sum(lhs * mj_wij, -1) / rho_i + mi * mj_wij_sq / rho_i_cu


# ---------------------------------------------------------------------------
# PPE source terms (simulation.rs:1633-1748)


def source_term_divergence(nb, cache, bst, velocity, mass, density, params, dt):
    """-div(v)/dt (simulation.rs:1633-1659)."""
    div_v = divergence(nb, cache, bst, velocity, jnp.zeros(2, jnp.float32), mass, density, params)
    return -div_v / dt


def source_term_only_density(density, params: SimulationParams, dt):
    """-(rho0 - rho)/(rho~ dt^2) (simulation.rs:1661-1676)."""
    if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
        next_rho = jnp.full_like(density, params.rest_density)
    else:
        next_rho = density
    return -(params.rest_density - density) / (next_rho * dt * dt)


def source_term_full(nb, cache, bst, velocity, mass, density, params, dt):
    """Full density+divergence source (simulation.rs:1712-1748)."""
    div_v = divergence(nb, cache, bst, velocity, jnp.zeros(2, jnp.float32), mass, density, params)
    if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
        next_rho = jnp.full_like(density, params.rest_density)
    else:
        next_rho = density
    return -(params.rest_density - density) / (next_rho * dt * dt) - div_v / dt


def source_term_full_with_omega(nb, cache, bst, velocity, mass, density, omega, params, dt):
    """IISPH2 Omega-corrected source (simulation.rs:1678-1710)."""
    div_v = divergence(nb, cache, bst, velocity, jnp.zeros(2, jnp.float32), mass, density, params)
    next_rho = params.rest_density
    return -(params.rest_density - density) / (next_rho * dt * dt) - div_v / (dt * omega)


def cfl_dt(velocity, h, alive, params: SimulationParams):
    """dt = min(max_dt, cfl * min_i sqrt(sr_i^2 / (|v|^2 + 0.01))) (simulation.rs:2182-2191)."""
    sr = effective_h(h, params) * kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
    v2 = jnp.sum(velocity * velocity, -1)
    val = sr * sr / (v2 + 0.01)
    val = jnp.where(alive, val, jnp.inf)
    cfl = params.cfl_factor * jnp.sqrt(jnp.min(val))
    return jnp.minimum(jnp.float32(params.max_dt), cfl)
