"""Slot-space physics over the dense grid engine: the gather-free hot path.

Mirrors models/physics.py (same reference citations) but every pair sweep is a
`grid_pairs.pair_apply` over shifted grid windows and every per-particle quantity lives
in the padded slot layout. Boundary terms are computed flat once per step
(models/boundary.py) and scattered in; inside the Jacobi loop they reduce to the
factored per-slot vector G (boundary_*_fast equivalents evaluated on slots).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops.grid import GridBins, GridConfig, gather_result, scatter_field
from ..utils.params import (
    HybridDfsphDensitySourceTerm,
    OperatorDiscretization,
    PressureSolverMethod,
    SimulationParams,
    ViscosityType,
)
from . import grid_pairs
from .solver import DENSITY_ERROR, DIVERGENCE_ERROR, SINGULAR_AII_EPS, SolveResult


def _w(geom):
    return kernels.kernel_w(geom.r, geom.h_ij, dim=2)


def _grad(geom):
    return kernels.kernel_grad(geom.diff, geom.h_ij, dim=2)


def density_slots(cfg, bins, sf, scale):
    """rho = sum m_j W_ij (simulation.rs:1007-1028); boundary term added by caller."""

    def edge(vi, vj, geom):
        return {"rho": vj["mass"] * _w(geom)}

    return grid_pairs.pair_apply(cfg, bins, sf, scale, edge)["rho"]


def constant_field_slots(cfg, bins, sf, scale):
    def edge(vi, vj, geom):
        return {"cf": vj["mass"] / jnp.maximum(vj["rho"], 1e-30) * _w(geom)}

    return grid_pairs.pair_apply(cfg, bins, sf, scale, edge)["cf"]


def aii_sums_slots(cfg, bins, sf, scale, params: SimulationParams):
    """The four fluid sums of the closed-form a_ii (boundary_handler/*.rs)."""

    def edge(vi, vj, geom):
        gw = _grad(geom)
        g2 = jnp.sum(gw * gw, -1)
        rho_j = jnp.maximum(vj["rho"], 1e-30)
        return {
            "mj_wij": vj["mass"][..., None] * gw,
            "mj_wij_sq": vj["mass"] * g2,
            "mj_by_rhoj_wij": (vj["mass"] / rho_j)[..., None] * gw,
            "mj_by_rhoj_wij_sq": vj["mass"] / rho_j * g2,
        }

    return grid_pairs.pair_apply(cfg, bins, sf, scale, edge)


def fused_prep_sweep(cfg, bins, sf, scale, vel, params: SimulationParams):
    """One pair reduction computing the a_ii fluid sums AND the viscosity acceleration.

    Fusing the once-per-step sweeps halves the number of dense window passes outside
    the Jacobi loop (each pass streams the same candidate windows).
    Returns (aii_sums dict, viscosity_accel (slots, 2) WITHOUT gravity/pull).
    """
    D = 2
    speed_of_sound = 88.0
    fields = dict(sf)
    fields["vel"] = vel
    use_xsph = params.viscosity_type == ViscosityType.XSPH

    def edge(vi, vj, geom):
        gw = _grad(geom)
        g2 = jnp.sum(gw * gw, -1)
        rho_j = jnp.maximum(vj["rho"], 1e-30)
        out = {
            "mj_wij": vj["mass"][..., None] * gw,
            "mj_wij_sq": vj["mass"] * g2,
            "mj_by_rhoj_wij": (vj["mass"] / rho_j)[..., None] * gw,
            "mj_by_rhoj_wij_sq": vj["mass"] / rho_j * g2,
        }
        if not use_xsph:
            v_ab = vi["vel"] - vj["vel"]
            dot = jnp.sum(geom.diff * v_ab, -1)
            r2 = geom.r * geom.r
            attract = dot < 0.0
            if params.viscosity_type == ViscosityType.WCSPH:
                vt = 2.0 * params.viscosity * geom.h_ij * speed_of_sound / jnp.maximum(
                    vi["rho"] + vj["rho"], 1e-30
                )
                pi_ab = -vt * dot / (r2 + 0.001 * geom.h_ij * geom.h_ij)
                contrib = (-vj["mass"] * pi_ab)[..., None] * gw
            else:  # ApproxLaplace
                rho_ij = jnp.maximum((vi["rho"] + vj["rho"]) * 0.5, 1e-30)
                coeff = 2.0 * (D + 2) * dot / (r2 + 0.01 * geom.h_ij * geom.h_ij) / rho_ij
                contrib = (params.viscosity * vj["mass"] * coeff)[..., None] * gw
            out["visc"] = jnp.where(attract[..., None], contrib, 0.0)
        return out

    res = grid_pairs.pair_apply(cfg, bins, fields, scale, edge)
    visc = res.pop("visc", jnp.zeros_like(vel))
    return res, visc


def assemble_aii(sums, sf, bst_G_slots, bt_kind: str, params: SimulationParams):
    """a_ii from the fluid sums + factored boundary vector G (slots, 2)."""
    rho_i = jnp.maximum(sf["rho"], 1e-30)
    rho_i_sq = rho_i * rho_i
    rho_i_cu = rho_i_sq * rho_i
    rho_b = params.rest_density
    od = params.operator_discretization
    mi = sf["mass"]
    mj_wij = sums["mj_wij"]
    mj_wij_sq = sums["mj_wij_sq"]
    G = bst_G_slots

    if bt_kind == "particles":
        p_ib_coeff = 0.0 if od == OperatorDiscretization.ConsistentSimpleGradient else 1.0
        lhs = mj_wij / rho_i_sq[:, None] + G / rho_i_sq[:, None] + G * (p_ib_coeff / (rho_b**2))
        rhs = mj_wij + G
        return jnp.sum(lhs * rhs, -1) / rho_i + mi * mj_wij_sq / rho_i_cu

    if bt_kind == "sdf":
        if od == OperatorDiscretization.Winchenbach2020:
            sum_boundary = G * (rho_b / rho_i_sq)[:, None]
            lhs = mj_wij / rho_i_sq[:, None] + sum_boundary
            rhs = sums["mj_by_rhoj_wij"] + G
            return jnp.sum(lhs * rhs, -1) + mi * sums["mj_by_rhoj_wij_sq"] / rho_i_sq
        p_ib_coeff = 1.0 if od == OperatorDiscretization.ConsistentSymmetricGradient else 0.0
        sum_boundary = G * (rho_b * (1.0 / rho_i_sq + p_ib_coeff / (rho_b**2)))[:, None]
        lhs = mj_wij / rho_i_sq[:, None] + sum_boundary
        rhs = mj_wij / rho_i[:, None] + (G * rho_b) / rho_i[:, None]
        return jnp.sum(lhs * rhs, -1) + mi * mj_wij_sq / rho_i_cu

    lhs = mj_wij / rho_i_sq[:, None]
    return jnp.sum(lhs * mj_wij, -1) / rho_i + mi * mj_wij_sq / rho_i_cu


def assemble_aii_1d(s1x, s1y, s1sq, s2x, s2y, s2sq, sf, Gx, Gy, bt_kind: str,
                    params: SimulationParams):
    """assemble_aii on channel-split 1-D arrays (dense VPU lanes; the (C, 2)
    form pads 2 -> 128 lanes). s1* = sum m_j gradW_ij (+ |.|^2), s2* = the
    rho_j-weighted variants; Gx/Gy the factored boundary vector."""
    rho_i = jnp.maximum(sf["rho"], 1e-30)
    rho_i_sq = rho_i * rho_i
    rho_i_cu = rho_i_sq * rho_i
    rho_b = params.rest_density
    od = params.operator_discretization
    mi = sf["mass"]

    if bt_kind == "particles":
        p_ib_coeff = 0.0 if od == OperatorDiscretization.ConsistentSimpleGradient else 1.0
        lx = s1x / rho_i_sq + Gx / rho_i_sq + Gx * (p_ib_coeff / (rho_b**2))
        ly = s1y / rho_i_sq + Gy / rho_i_sq + Gy * (p_ib_coeff / (rho_b**2))
        return (lx * (s1x + Gx) + ly * (s1y + Gy)) / rho_i + mi * s1sq / rho_i_cu

    if bt_kind == "sdf":
        if od == OperatorDiscretization.Winchenbach2020:
            sb = rho_b / rho_i_sq
            lx = s1x / rho_i_sq + Gx * sb
            ly = s1y / rho_i_sq + Gy * sb
            return lx * (s2x + Gx) + ly * (s2y + Gy) + mi * s2sq / rho_i_sq
        p_ib_coeff = 1.0 if od == OperatorDiscretization.ConsistentSymmetricGradient else 0.0
        sb = rho_b * (1.0 / rho_i_sq + p_ib_coeff / (rho_b**2))
        lx = s1x / rho_i_sq + Gx * sb
        ly = s1y / rho_i_sq + Gy * sb
        rx = (s1x + Gx * rho_b) / rho_i
        ry = (s1y + Gy * rho_b) / rho_i
        return lx * rx + ly * ry + mi * s1sq / rho_i_cu

    return (s1x * s1x + s1y * s1y) / (rho_i_sq * rho_i) + mi * s1sq / rho_i_cu


def aii_slots(cfg, bins, sf, scale, bst_G_slots, bt_kind: str, params: SimulationParams):
    """Standalone a_ii (used when the fused prep sweep is not applicable)."""
    sums = aii_sums_slots(cfg, bins, sf, scale, params)
    return assemble_aii(sums, sf, bst_G_slots, bt_kind, params)


def boundary_accel_slots(G, pressure, rho, bt_kind: str, params: SimulationParams):
    if bt_kind == "none":
        return 0.0
    rho_b = params.rest_density
    od = params.operator_discretization
    if bt_kind == "sdf":
        mirror = 1.0 if od == OperatorDiscretization.ConsistentSymmetricGradient else 0.0
    else:
        mirror = 0.0 if od == OperatorDiscretization.ConsistentSimpleGradient else 1.0
    coeff = -(pressure / jnp.maximum(rho * rho, 1e-30) + mirror * pressure / (rho_b**2))
    if bt_kind == "sdf":
        coeff = coeff * rho_b
    return G * coeff[:, None]


def boundary_accel_slots_1d(Gx, Gy, pressure, rho, bt_kind: str,
                            params: SimulationParams):
    """boundary_accel_slots on channel-split 1-D arrays (dense VPU lanes; the
    (C, 2) form runs elementwise chains at 2/128 lane efficiency)."""
    if bt_kind == "none":
        return 0.0, 0.0
    rho_b = params.rest_density
    od = params.operator_discretization
    if bt_kind == "sdf":
        mirror = 1.0 if od == OperatorDiscretization.ConsistentSymmetricGradient else 0.0
    else:
        mirror = 0.0 if od == OperatorDiscretization.ConsistentSimpleGradient else 1.0
    coeff = -(pressure / jnp.maximum(rho * rho, 1e-30) + mirror * pressure / (rho_b**2))
    if bt_kind == "sdf":
        coeff = coeff * rho_b
    return Gx * coeff, Gy * coeff


def boundary_div_slots_1d(Gx, Gy, qx, qy, rho, bt_kind: str,
                          params: SimulationParams):
    """boundary_div_slots (with qb = 0) on channel-split 1-D arrays."""
    if bt_kind == "none":
        return 0.0
    dq_dot = -(qx * Gx + qy * Gy)
    if bt_kind == "sdf":
        if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
            return dq_dot
        return dq_dot * (params.rest_density / jnp.maximum(rho, 1e-30))
    return dq_dot / jnp.maximum(rho, 1e-30)


def boundary_div_slots(G, q, qb, rho, bt_kind: str, params: SimulationParams):
    if bt_kind == "none":
        return 0.0
    dq_dot = jnp.sum((qb[None, :] - q) * G, -1)
    if bt_kind == "sdf":
        if params.operator_discretization == OperatorDiscretization.Winchenbach2020:
            return dq_dot
        return dq_dot * (params.rest_density / jnp.maximum(rho, 1e-30))
    return dq_dot / jnp.maximum(rho, 1e-30)


def pressure_accel_slots(cfg, bins, sf, scale, p, G, bt_kind, params):
    """-sum m_j (p_i/rho_i^2 + p_j/rho_j^2) grad W (simulation.rs:1750-1808)."""
    fields = dict(sf)
    fields["p"] = p

    def edge(vi, vj, geom):
        term = vi["p"] / jnp.maximum(vi["rho"] ** 2, 1e-30) + vj["p"] / jnp.maximum(
            vj["rho"] ** 2, 1e-30
        )
        return {"acc": (-vj["mass"] * term)[..., None] * _grad(geom)}

    acc = grid_pairs.pair_apply(cfg, bins, fields, scale, edge)["acc"]
    return acc + boundary_accel_slots(G, p, sf["rho"], bt_kind, params)


def divergence_slots(cfg, bins, sf, scale, q, qb, G, bt_kind, params):
    """div(A) per simulation.rs:1552-1592 + factored boundary term."""
    w2020 = params.operator_discretization == OperatorDiscretization.Winchenbach2020
    fields = dict(sf)
    fields["q"] = q

    def edge(vi, vj, geom):
        dq_dot = jnp.sum((vj["q"] - vi["q"]) * _grad(geom), -1)
        if w2020:
            return {"div": vj["mass"] / jnp.maximum(vj["rho"], 1e-30) * dq_dot}
        return {"div": vj["mass"] * dq_dot}

    s = grid_pairs.pair_apply(cfg, bins, fields, scale, edge)["div"]
    if not w2020:
        s = s / jnp.maximum(sf["rho"], 1e-30)
    return s + boundary_div_slots(G, q, qb, sf["rho"], bt_kind, params)


def non_pressure_accel_slots(cfg, bins, sf, scale, vel, params: SimulationParams):
    """Viscosity + gravity + pull (simulation.rs:929-1005)."""
    D = 2
    speed_of_sound = 88.0
    fields = dict(sf)
    fields["vel"] = vel

    if params.viscosity_type == ViscosityType.XSPH:
        visc = jnp.zeros_like(vel)
    else:

        def edge(vi, vj, geom):
            v_ab = vi["vel"] - vj["vel"]
            dot = jnp.sum(geom.diff * v_ab, -1)
            r2 = geom.r * geom.r
            attract = dot < 0.0
            gw = _grad(geom)
            if params.viscosity_type == ViscosityType.WCSPH:
                vt = 2.0 * params.viscosity * geom.h_ij * speed_of_sound / jnp.maximum(
                    vi["rho"] + vj["rho"], 1e-30
                )
                pi_ab = -vt * dot / (r2 + 0.001 * geom.h_ij * geom.h_ij)
                contrib = (-vj["mass"] * pi_ab)[..., None] * gw
            else:  # ApproxLaplace
                rho_ij = jnp.maximum((vi["rho"] + vj["rho"]) * 0.5, 1e-30)
                coeff = 2.0 * (D + 2) * dot / (r2 + 0.01 * geom.h_ij * geom.h_ij) / rho_ij
                contrib = (params.viscosity * vj["mass"] * coeff)[..., None] * gw
            return {"visc": jnp.where(attract[..., None], contrib, 0.0)}

        visc = grid_pairs.pair_apply(cfg, bins, fields, scale, edge)["visc"]

    accel = visc + jnp.asarray(params.gravity_vector(D), jnp.float32)[None, :]
    if params.pull_fluid_to is not None:
        target = jnp.asarray(params.pull_fluid_to[:D], jnp.float32)
        d = target[None, :] - sf["pos"]
        accel = accel + d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9) * 13.0
    return accel


def omega_iisph2_slots(cfg, bins, sf, scale, size_class_slots, params):
    """IISPH2 Omega (simulation.rs:2262-2311)."""
    from .state import SIZE_LARGE

    srbs = kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH

    def edge(vi, vj, geom):
        H_ij = geom.h_ij * srbs
        return {"s": vj["mass"] * kernels.kernel_dw_dH(geom.r, H_ij, dim=2)}

    sum_term = grid_pairs.pair_apply(cfg, bins, sf, scale, edge)["s"]
    H_i = sf["h"] * srbs
    rho = jnp.maximum(sf["rho"], 1e-30)
    omega_neigh = 1.0 + H_i / (3.0 * rho) * sum_term
    self_term = sf["mass"] * kernels.kernel_dw_dH(jnp.zeros_like(H_i), H_i, dim=2)
    omega_large = 1.0 + H_i / (3.0 * rho) * self_term
    omega = jnp.where(size_class_slots == SIZE_LARGE, omega_large, omega_neigh)
    return jnp.clip(omega, 0.125, 2.5)


def jacobi_iterations_slots(
    cfg, bins, sf, scale, aii, src, G, bt_kind, alive_slots,
    max_avg_error, residual_type, params, dt, p0=None,
) -> SolveResult:
    """The relaxed-Jacobi loop (simulation.rs:1405-1480) entirely in slot space.

    p0: optional warm-start pressure in slot space (params.warm_start_pressure);
    the reference cold-starts at zero (simulation.rs:1143/1169/1190)."""
    total = sf["pos"].shape[0]
    zero_q = jnp.zeros(2, jnp.float32)
    singular = jnp.abs(aii) < SINGULAR_AII_EPS
    aii_safe = jnp.where(singular, 1.0, aii)
    w = jnp.float32(params.jacobi_omega)
    rho = sf["rho"]

    def one_sweep(p):
        accel = pressure_accel_slots(cfg, bins, sf, scale, p, G, bt_kind, params)
        a_p = divergence_slots(cfg, bins, sf, scale, accel, zero_q, G, bt_kind, params)
        p_next = p + w * (src - a_p) / aii_safe
        p_next = jnp.where(singular, 0.0, p_next)
        if residual_type == DENSITY_ERROR:
            predicted = rho * dt * dt * (src - a_p)
        else:
            predicted = dt * (src - a_p)
        clamped = p_next <= 0.0
        p_next = jnp.where(clamped, 0.0, p_next)
        is_normal = alive_slots & (~singular) & (~clamped)
        n_normal = jnp.sum(is_normal)
        avg = jnp.sum(jnp.where(is_normal, predicted, 0.0)) / jnp.maximum(n_normal, 1).astype(
            jnp.float32
        )
        avg = jnp.where(n_normal > 0, avg, jnp.nan)
        mx = jnp.max(jnp.where(is_normal, jnp.abs(predicted), 0.0))
        return p_next, predicted, dict(
            normal=n_normal,
            singular=jnp.sum(alive_slots & singular),
            negative=jnp.sum(alive_slots & (~singular) & clamped),
            avg=avg,
            max=mx,
        )

    def converged(st):
        if residual_type == DENSITY_ERROR:
            ok = jnp.abs(st["avg"] / params.rest_density) < max_avg_error
        else:
            ok = jnp.abs(st["avg"]) < max_avg_error / dt
        return (st["normal"] == 0) | ok

    def cond(c):
        return ~c["done"]

    def body(c):
        p_next, perr, st = one_sweep(c["pressure"])
        brk = (converged(st) & (c["iters"] > 1)) | (c["iters"] == params.max_iters)
        return dict(
            pressure=p_next,
            iters=jnp.where(brk, c["iters"], c["iters"] + 1),
            done=brk,
            avg=st["avg"], max=st["max"], normal=st["normal"],
            singular=st["singular"], negative=st["negative"],
            density_error=perr if residual_type == DENSITY_ERROR else c["density_error"],
        )

    if p0 is None:
        p_init = jnp.zeros(total, jnp.float32)
    else:
        p_init = jnp.where(alive_slots & (~singular), jnp.maximum(p0, 0.0), 0.0)
    init = dict(
        pressure=p_init,
        iters=jnp.int32(0), done=jnp.bool_(False),
        avg=jnp.float32(0.0), max=jnp.float32(0.0),
        normal=jnp.int32(0), singular=jnp.int32(0), negative=jnp.int32(0),
        density_error=jnp.zeros(total, jnp.float32),
    )
    out = jax.lax.while_loop(cond, body, init)
    final_accel = pressure_accel_slots(cfg, bins, sf, scale, out["pressure"], G, bt_kind, params)
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
