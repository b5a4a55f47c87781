"""SPH physics sweeps: density, viscosity, operators, a_ii, source terms.

Reference parity (simulation.rs):
  density                :1007-1049   non-pressure accel    :929-1005
  divergence operator    :1552-1592   pressure accel        :1750-1808
  a_ii closed forms      : boundary_handler/*.rs            source terms :1633-1748

Every sweep is a `sym_sum` over the forward neighbor structure (ops/pairwise.py) plus
the boundary handler's closed-form contribution (models/boundary.py). The operator
discretization switch (ConsistentSimpleGradient / ConsistentSymmetricGradient /
Winchenbach2020, simulation_parameters.rs:110-122) is resolved at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import kernels
from ..ops.neighbors import Neighborhood
from ..ops.pairwise import sym_sum
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


def _pair_h(vi, vj):
    return 0.5 * (vi["h"] + vj["h"])


def compute_density(nb: Neighborhood, bt, position, mass, h, params: SimulationParams):
    """rho_i = sum_j m_j W_ij + boundary term (simulation.rs:1007-1028)."""

    def edge(vi, vj):
        diff = vi["pos"] - vj["pos"]
        r = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-30)
        return vj["mass"] * kernels.kernel_w(r, _pair_h(vi, vj), dim=2)

    rho = sym_sum(nb, {"pos": position, "mass": mass, "h": h}, edge)
    rho = rho + bnd.density_boundary_term(bt, position, h, params)
    return rho


def compute_constant_field(nb: Neighborhood, bt, position, mass, density, h, params):
    """<1>_i = sum_j (m_j/rho_j) W_ij + boundary/rho0 (simulation.rs:2235-2248)."""

    def edge(vi, vj):
        diff = vi["pos"] - vj["pos"]
        r = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-30)
        return vj["mass"] / vj["rho"] * kernels.kernel_w(r, _pair_h(vi, vj), dim=2)

    cf = sym_sum(nb, {"pos": position, "mass": mass, "rho": density, "h": h}, edge)
    return cf + bnd.density_boundary_term(bt, position, h, params) / params.rest_density


def non_pressure_accel(
    nb: Neighborhood, position, velocity, density, mass, h, params: SimulationParams
):
    """Viscosity + gravity + interactive pull (simulation.rs:929-1005)."""
    D = position.shape[1]
    speed_of_sound = 88.0  # WCSPH below eq. 9

    if params.viscosity_type == ViscosityType.WCSPH:

        def edge(vi, vj):
            x_ab = vi["pos"] - vj["pos"]
            v_ab = vi["vel"] - vj["vel"]
            h_ij = _pair_h(vi, vj)
            dg = kernels.kernel_grad(x_ab, h_ij, dim=2)
            vd = jnp.sum(v_ab * x_ab, -1)
            r2 = jnp.sum(x_ab * x_ab, -1)
            viscous_term = 2.0 * params.viscosity * h_ij * speed_of_sound / (vi["rho"] + vj["rho"])
            pi_ab = -viscous_term * vd / (r2 + 0.001 * h_ij * h_ij)
            contrib = (-vj["mass"] * pi_ab)[..., None] * dg
            return jnp.where((vd < 0.0)[..., None], contrib, 0.0)

        visc = sym_sum(
            nb, {"pos": position, "vel": velocity, "rho": density, "mass": mass, "h": h}, edge
        )
    elif params.viscosity_type == ViscosityType.ApproxLaplace:

        def edge(vi, vj):
            x_ab = vi["pos"] - vj["pos"]
            v_ab = vi["vel"] - vj["vel"]
            dot = jnp.sum(x_ab * v_ab, -1)
            h_ij = _pair_h(vi, vj)
            dg = kernels.kernel_grad(x_ab, h_ij, dim=2)
            rho_ij = (vi["rho"] + vj["rho"]) * 0.5
            r2 = jnp.sum(x_ab * x_ab, -1)
            # SPH Tutorial Eq. 102
            coeff = 2.0 * (D + 2) * (vj["mass"] / rho_ij) * dot / (r2 + 0.01 * h_ij * h_ij)
            contrib = (params.viscosity * coeff)[..., None] * dg
            return jnp.where((dot < 0.0)[..., None], contrib, 0.0)

        visc = sym_sum(
            nb, {"pos": position, "vel": velocity, "rho": density, "mass": mass, "h": h}, edge
        )
    else:  # XSPH: todo!() in the reference too (simulation.rs:990-993, 2673-2676)
        visc = jnp.zeros_like(position)

    accel = visc + jnp.asarray(params.gravity_vector(D), jnp.float32)[None, :]
    if params.pull_fluid_to is not None:
        target = jnp.asarray(params.pull_fluid_to[:D], jnp.float32)
        d = target[None, :] - position
        accel = accel + d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9) * 13.0
    return accel


def divergence(
    nb: Neighborhood,
    bt,
    quantity,  # (C, D) per-particle field A_i
    quantity_b,  # (D,) boundary value
    position,
    mass,
    density,
    h,
    params: SimulationParams,
):
    """div(A)_i per simulation.rs:1552-1592 (+ boundary term)."""

    def edge(vi, vj):
        dg = kernels.kernel_grad(vi["pos"] - vj["pos"], _pair_h(vi, vj), dim=2)
        dq = jnp.sum((vj["q"] - vi["q"]) * dg, -1)
        if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
            return vj["mass"] / vj["rho"] * dq
        return vj["mass"] * dq  # divided by rho_i afterwards

    s = sym_sum(
        nb, {"pos": position, "q": quantity, "mass": mass, "rho": density, "h": h}, edge
    )
    if params.operator_discretization != OperatorDiscretization.Winchenbach2020:
        s = s / density
    s = s + bnd.boundary_divergence(bt, quantity, quantity_b, position, h, density, params)
    return s


def pressure_accel(
    nb: Neighborhood, bt, position, mass, pressure, density, h, params: SimulationParams
):
    """a_p = -sum_j m_j (p_i/rho_i^2 + p_j/rho_j^2) grad W_ij + boundary (simulation.rs:1750-1808)."""

    def edge(vi, vj):
        dg = kernels.kernel_grad(vi["pos"] - vj["pos"], _pair_h(vi, vj), dim=2)
        term = vi["p"] / (vi["rho"] * vi["rho"]) + vj["p"] / (vj["rho"] * vj["rho"])
        return (-vj["mass"] * term)[..., None] * dg

    acc = sym_sum(
        nb, {"pos": position, "p": pressure, "mass": mass, "rho": density, "h": h}, edge
    )
    acc = acc + bnd.boundary_pressure_accel(bt, position, h, pressure, density, params)
    return acc


def compute_aii(nb: Neighborhood, bt, position, mass, density, h, params: SimulationParams):
    """Closed-form diagonal a_ii, dispatching on boundary handler + discretization.

    ParticleBased: particle_boundary_handler.rs:188-232
    Winchenbach SDF: boundary_winchenbach2020.rs:225-306
    NoBoundary: fluid-only terms of the ConsistentSimpleGradient form (the reference
    leaves this unimplemented!(); extension documented in SURVEY parity notes).
    """
    C, D = position.shape
    rho_i = density
    rho_i_sq = rho_i * rho_i
    rho_i_cu = rho_i_sq * rho_i
    rho_b = params.rest_density
    od = params.operator_discretization

    def edge(vi, vj):
        gw = kernels.kernel_grad(vi["pos"] - vj["pos"], _pair_h(vi, vj), dim=2)
        return {
            "mj_wij": vj["mass"][..., None] * gw,
            "mj_wij_sq": vj["mass"] * jnp.sum(gw * gw, -1),
            "mj_by_rhoj_wij": (vj["mass"] / vj["rho"])[..., None] * gw,
            "mj_by_rhoj_wij_sq": vj["mass"] / vj["rho"] * jnp.sum(gw * gw, -1),
        }

    sums = sym_sum(nb, {"pos": position, "mass": mass, "rho": density, "h": h}, edge)
    mj_wij = sums["mj_wij"]
    mj_wij_sq = sums["mj_wij_sq"]
    mi = mass

    if bt.kind == "particles":
        hfb = bnd._smoothing_h_fb(h, params)
        diff = position[:, None, :] - bt.bpos[bt.bidx]
        gw_ib = kernels.kernel_grad(diff, hfb[:, None], dim=D)
        gw_ib = jnp.where(bt.bmask[..., None], gw_ib, 0.0)
        psi = jnp.where(bt.bmask, bt.bpsi[bt.bidx], 0.0)
        p_ib_coeff = 0.0 if od == OperatorDiscretization.ConsistentSimpleGradient else 1.0
        mb_wib = jnp.sum(psi[..., None] * gw_ib, axis=1)
        mb_p = jnp.sum((psi * (p_ib_coeff / (rho_b * rho_b)))[..., None] * gw_ib, axis=1)
        lhs = mj_wij / rho_i_sq[:, None] + mb_wib / rho_i_sq[:, None] + mb_p
        rhs = mj_wij + mb_wib
        return jnp.sum(lhs * rhs, -1) / rho_i + mi * mj_wij_sq / rho_i_cu

    if bt.kind == "sdf":
        glam = jnp.where(bt.lam_mask[..., None], bt.grad_lam, 0.0)  # (C, S, D)
        if od == OperatorDiscretization.Winchenbach2020:
            sum_glambda = jnp.sum(glam, axis=1)
            sum_boundary = jnp.sum(glam, axis=1) * (rho_b / rho_i_sq)[:, None]  # p_ib_coeff = 0
            lhs = mj_wij / rho_i_sq[:, None] + sum_boundary
            rhs = sums["mj_by_rhoj_wij"] + sum_glambda
            return jnp.sum(lhs * rhs, -1) + mi * sums["mj_by_rhoj_wij_sq"] / rho_i_sq
        else:
            p_ib_coeff = 1.0 if od == OperatorDiscretization.ConsistentSymmetricGradient else 0.0
            rhob_glambda = jnp.sum(glam, axis=1) * rho_b
            sum_boundary = jnp.sum(glam, axis=1) * (
                rho_b * (1.0 / rho_i_sq + p_ib_coeff / (rho_b * rho_b))
            )[:, None]
            lhs = mj_wij / rho_i_sq[:, None] + sum_boundary
            rhs = mj_wij / rho_i[:, None] + rhob_glambda / rho_i[:, None]
            return jnp.sum(lhs * rhs, -1) + mi * mj_wij_sq / rho_i_cu

    # NoBoundary
    lhs = mj_wij / rho_i_sq[:, None]
    return jnp.sum(lhs * mj_wij, -1) / rho_i + mi * mj_wij_sq / rho_i_cu


# ---------------------------------------------------------------------------
# PPE source terms (simulation.rs:1633-1748)


def source_term_divergence(nb, bt, position, velocity, mass, density, h, params, dt):
    """-div(v)/dt (simulation.rs:1633-1659)."""
    div_v = divergence(nb, bt, velocity, jnp.zeros(2, jnp.float32), position, mass, density, h, params)
    return -div_v / dt


def source_term_only_density(density, params: SimulationParams, dt):
    """-(rho0 - rho)/(rho~ dt^2) (simulation.rs:1661-1676)."""
    if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
        next_rho = jnp.full_like(density, params.rest_density)
    else:
        next_rho = density
    return -(params.rest_density - density) / (next_rho * dt * dt)


def source_term_full(nb, bt, position, velocity, mass, density, h, params, dt):
    """Full density+divergence source (simulation.rs:1712-1748)."""
    div_v = divergence(nb, bt, velocity, jnp.zeros(2, jnp.float32), position, mass, density, h, params)
    if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
        next_rho = jnp.full_like(density, params.rest_density)
    else:
        next_rho = density
    return -(params.rest_density - density) / (next_rho * dt * dt) - div_v / dt


def source_term_full_with_omega(nb, bt, position, velocity, mass, density, h, omega, params, dt):
    """IISPH2 Omega-corrected source (simulation.rs:1678-1710)."""
    div_v = divergence(nb, bt, velocity, jnp.zeros(2, jnp.float32), position, mass, density, h, params)
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
