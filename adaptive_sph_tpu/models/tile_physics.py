"""Physics sweeps on the sorted-tile engine (ops/tiles.py + ops/pallas_sweeps.py).

Same reference citations and math as models/grid_physics.py (which remains the
dense-grid backend); every pair reduction here is a SweepOp executed by the Pallas
harness over the sorted layout. All per-particle arrays live in SORTED order (C,);
elementwise assembly helpers are shared with grid_physics (they are layout-free).

Sweep inventory (reference):
  density            simulation.rs:1007-1028
  constant field     simulation.rs:2235-2248
  a_ii sums          boundary_handler/*.rs closed forms (via grid_physics.assemble_aii)
  viscosity          simulation.rs:929-1005 (WCSPH eq 10/11, ApproxLaplace eq 102)
  pressure accel     simulation.rs:1750-1808
  divergence         simulation.rs:1552-1592
  IISPH2 Omega       simulation.rs:2262-2311
  surface detection  simulation.rs:539-695
  level wavefront    simulation.rs:729-801
  level smoothing    simulation.rs:803-857 (stale pair set, advected kernel positions)
  h estimation       simulation.rs:1873-1971
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops.pallas_sweeps import NEG_BIG, SweepOp, run_sweep
from ..ops.tiles import TileBins, TileConfig
from ..utils.params import (
    OperatorDiscretization,
    SimulationParams,
    SupportLengthEstimation,
    ViscosityType,
)
from .solver import DENSITY_ERROR, SINGULAR_AII_EPS, SolveResult

D = 2
SPEED_OF_SOUND = 88.0


# ---------------------------------------------------------------------------
# SweepOp factories (static params closed over at trace time)

DENSITY_OP = SweepOp(
    name="density", n_out=1, emit=lambda q, c, ctx: [c["mass"] * ctx.w]
)

COUNT_OP = SweepOp(
    name="count", n_out=1, emit=lambda q, c, ctx: [jnp.ones_like(ctx.r2)]
)


def constant_field_op():
    return SweepOp(
        name="constant_field",
        n_out=1,
        dyn_names=("rho",),
        emit=lambda q, c, ctx: [
            c["mass"] / jnp.maximum(c["rho"], 1e-30) * ctx.w
        ],
    )


def _viscosity_pair(q, c, ctx, params: SimulationParams):
    """Per-pair viscosity acceleration (simulation.rs:941-989); (vx, vy) pair terms."""
    dvx = q["velx"] - c["velx"]
    dvy = q["vely"] - c["vely"]
    dot = ctx.dx * dvx + ctx.dy * dvy
    attract = dot < 0.0
    if params.viscosity_type == ViscosityType.WCSPH:
        vt = (
            2.0 * params.viscosity * ctx.h_ij * SPEED_OF_SOUND
            / jnp.maximum(q["rho"] + c["rho"], 1e-30)
        )
        pi_ab = -vt * dot / (ctx.r2 + 0.001 * ctx.h_ij * ctx.h_ij)
        coef = -c["mass"] * pi_ab
    else:  # ApproxLaplace
        rho_ij = jnp.maximum((q["rho"] + c["rho"]) * 0.5, 1e-30)
        coef = (
            params.viscosity * c["mass"]
            * (2.0 * (D + 2) * dot / (ctx.r2 + 0.01 * ctx.h_ij * ctx.h_ij) / rho_ij)
        )
    coef = jnp.where(attract, coef, 0.0)
    return coef * ctx.gx, coef * ctx.gy


def prep_op(params: SimulationParams):
    """Fused once-per-step sweep: the four a_ii fluid sums + viscosity accel."""
    use_visc = params.viscosity_type != ViscosityType.XSPH

    def emit(q, c, ctx):
        gx, gy = ctx.gx, ctx.gy
        g2 = gx * gx + gy * gy
        m = c["mass"]
        mbr = m / jnp.maximum(c["rho"], 1e-30)
        outs = [m * gx, m * gy, m * g2, mbr * gx, mbr * gy, mbr * g2]
        if use_visc:
            vx, vy = _viscosity_pair(q, c, ctx, params)
            outs += [vx, vy]
        else:
            outs += [jnp.zeros_like(g2), jnp.zeros_like(g2)]
        return outs

    return SweepOp(name="prep", n_out=8, dyn_names=("rho", "velx", "vely"), emit=emit)


def aii_sums_op():
    def emit(q, c, ctx):
        gx, gy = ctx.gx, ctx.gy
        g2 = gx * gx + gy * gy
        m = c["mass"]
        mbr = m / jnp.maximum(c["rho"], 1e-30)
        return [m * gx, m * gy, m * g2, mbr * gx, mbr * gy, mbr * g2]

    return SweepOp(name="aii_sums", n_out=6, dyn_names=("rho",), emit=emit)


def visc_op(params: SimulationParams):
    def emit(q, c, ctx):
        vx, vy = _viscosity_pair(q, c, ctx, params)
        return [vx, vy]

    return SweepOp(name="visc", n_out=2, dyn_names=("rho", "velx", "vely"), emit=emit)


def accel_op():
    """-sum m_j (p_i/rho_i^2 + p_j/rho_j^2) grad W (simulation.rs:1750-1808)."""

    def emit(q, c, ctx):
        term = q["p"] / jnp.maximum(q["rho"] * q["rho"], 1e-30) + c["p"] / jnp.maximum(
            c["rho"] * c["rho"], 1e-30
        )
        coef = -c["mass"] * term
        return [coef * ctx.gx, coef * ctx.gy]

    return SweepOp(name="accel", n_out=2, dyn_names=("rho", "p"), emit=emit)


def div_op(w2020: bool):
    """div(A) fluid sum (simulation.rs:1552-1592); caller divides by rho_i if needed."""

    def emit(q, c, ctx):
        dq_dot = (c["qx"] - q["qx"]) * ctx.gx + (c["qy"] - q["qy"]) * ctx.gy
        if w2020:
            return [c["mass"] / jnp.maximum(c["rho"], 1e-30) * dq_dot]
        return [c["mass"] * dq_dot]

    return SweepOp(name="div", n_out=1, dyn_names=("rho", "qx", "qy"), emit=emit)


def check_aii_op(w2020: bool):
    """Brute-force a_ii fluid divergence for check_aii (simulation.rs:1324-1375).

    Per pair: the unit-pressure field p = delta_i gives neighbor j the accel
    (m_i / rho_i^2) grad W_ij; the probe divergence at i sums
    w_j * (acc_j - acc_i) . grad W_ij with acc_i = q[ax, ay] (the self accel
    including boundary, computed elementwise by the caller). The self pair
    contributes zero because grad W(0) = 0 — matching the reference's explicit
    i == j branch."""

    def emit(q, c, ctx):
        coef = q["mass"] / jnp.maximum(q["rho"] * q["rho"], 1e-30)
        dax = coef * ctx.gx - q["ax"]
        day = coef * ctx.gy - q["ay"]
        d = dax * ctx.gx + day * ctx.gy
        m = c["mass"] / jnp.maximum(c["rho"], 1e-30) if w2020 else c["mass"]
        return [m * d]

    return SweepOp(name="check_aii", n_out=1, dyn_names=("rho", "ax", "ay"), emit=emit)


def omega_op():
    """IISPH2 Omega neighbor sum (simulation.rs:2262-2311)."""
    srbs = kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH

    def emit(q, c, ctx):
        H_ij = ctx.h_ij * srbs
        return [c["mass"] * kernels.kernel_dw_dH(ctx.r, H_ij, dim=2)]

    return SweepOp(name="omega", n_out=1, emit=emit)


def normal_op(params: SimulationParams):
    """EmptyAngle SPH normal: -(m_i/rho0) grad W (simulation.rs:553-560)."""

    def emit(q, c, ctx):
        coef = -(q["mass"] / params.rest_density)
        return [coef * ctx.gx, coef * ctx.gy]

    return SweepOp(name="normal", n_out=2, emit=emit)


def _range_ok(q, c, ctx, params: SimulationParams):
    """is_neighbor_in_level_estimation_range (simulation.rs:697-723), receiver side."""
    if params.support_length_estimation not in (
        SupportLengthEstimation.FromDistribution,
        SupportLengthEstimation.FromDistribution2,
    ):
        return None
    radius = kernels.sphere_volume_to_radius(q["mass"] / params.rest_density, dim=2)
    return ctx.r <= radius * params.maximum_range


def cone_op(params: SimulationParams):
    """EmptyAngle 50-degree cone scan -> max hit (simulation.rs:566-607)."""
    threshold = math.cos(50.0 * math.pi / 180.0)

    def emit(q, c, ctx):
        # direction i -> j is -diff/r
        d = (-ctx.dx * q["unx"] - ctx.dy * q["uny"]) / (ctx.r + 1e-6)
        hit = d > threshold
        rok = _range_ok(q, c, ctx, params)
        if rok is not None:
            hit = hit & rok
        return [hit.astype(jnp.float32)]

    return SweepOp(name="cone", n_out=1, dyn_names=("unx", "uny"), emit=emit,
                   reduce="max", fill=0.0)


def fringe_count_op():
    """#{j : 2|x_ij| - sr_j > t_i} per query — the counting primitive of the
    EXACT neighborhood-count constraint (simulation.rs:2145-2177): the k-th
    largest fringe is found by bisection on t instead of a per-particle sort.
    Unlike the list backend's forward-row approximation, the tile sweep sees
    BOTH edge directions, so the selection is exact at any size interface."""
    srbs = kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH

    def emit(q, c, ctx):
        f = 2.0 * ctx.r - c["h"] * srbs
        return [(f > q["t"]).astype(jnp.float32)]

    return SweepOp(name="fringe_count", n_out=1, dyn_names=("t",), emit=emit)


def centerdiff_op(params: SimulationParams):
    """CenterDiff surface-detection sums (simulation.rs:630-695, Horvath 2013):
    [sum V_j W, sum V_j W x_j, sum V_j W y_j, sum V_j W r_j]."""

    def emit(q, c, ctx):
        vol_j = c["mass"] / params.rest_density
        r_j = kernels.sphere_volume_to_radius(vol_j, dim=2)
        wv = ctx.w * vol_j
        return [wv, wv * c["x"], wv * c["y"], wv * r_j]

    return SweepOp(name="centerdiff", n_out=4, emit=emit)


def wavefront_op(params: SimulationParams):
    """Level propagation sweep: max_j has_j ? (lvl_j - r) : -inf (simulation.rs:729-801)."""

    def emit(q, c, ctx):
        ok = c["has"] > 0.5
        rok = _range_ok(q, c, ctx, params)
        if rok is not None:
            ok = ok & rok
        return [jnp.where(ok, c["lvl"] - ctx.r, NEG_BIG)]

    return SweepOp(name="wavefront", n_out=1, dyn_names=("lvl", "has"), emit=emit,
                   reduce="max", fill=NEG_BIG)


def smooth_op():
    """Volume-weighted level smoothing over the STALE pair set with kernels at the
    ADVECTED positions (simulation.rs:2052-2058 + :2709-2722): the pair mask uses the
    statics (binning) positions; W is evaluated at the xnew/ynew channels."""

    def emit(q, c, ctx):
        dxn = q["xnew"] - c["xnew"]
        dyn = q["ynew"] - c["ynew"]
        rn = jnp.sqrt(jnp.maximum(dxn * dxn + dyn * dyn, 1e-30))
        w = kernels.kernel_w(rn, ctx.h_ij, dim=2)
        vw = c["mass"] / jnp.maximum(c["rho"], 1e-30) * w
        return [vw * c["dist"], vw]

    return SweepOp(name="smooth", n_out=2, dyn_names=("rho", "dist", "xnew", "ynew"),
                   emit=emit)


def h_w_sum_op():
    return SweepOp(name="h_w_sum", n_out=1, emit=lambda q, c, ctx: [ctx.w])


def h_vw_sum_op(params: SimulationParams):
    return SweepOp(
        name="h_vw_sum", n_out=1,
        emit=lambda q, c, ctx: [c["mass"] / params.rest_density * ctx.w],
    )


# ---------------------------------------------------------------------------
# Jacobi pressure loop (relaxed Jacobi, simulation.rs:1405-1480) in sorted space.


def tile_jacobi(accel_fn, div_fn, aii, src, alive, max_avg_error, residual_type,
                params: SimulationParams, dt, rho, p0=None,
                psum=lambda x: x, pmax=lambda x: x) -> SolveResult:
    """accel_fn(p) -> (ax (C,), ay (C,)); div_fn(ax, ay) -> (C,); both include
    boundary terms. Channel-split 1-D arrays keep every elementwise chain on
    dense VPU lanes (see models/tile_step.py). The returned
    SolveResult.pressure_accel is likewise an (ax, ay) tuple.

    p0: optional warm-start pressure (params.warm_start_pressure); the reference
    cold-starts at zero (simulation.rs:1143/1169/1190).
    psum/pmax: slab-sharding collectives so every device sees the same
    convergence statistics (the while_loop trip count must agree everywhere);
    `alive` is then the OWNED mask so no particle is double-counted."""
    total = aii.shape[0]
    singular = jnp.abs(aii) < SINGULAR_AII_EPS
    aii_safe = jnp.where(singular, 1.0, aii)
    w = jnp.float32(params.jacobi_omega)
    beta = float(params.jacobi_momentum)  # heavy-ball acceleration (0 = reference)

    # loop-invariant statistics hoisted out of the sweep: the singular count
    # never changes, and negative = (alive & ~singular) - normal, so the loop
    # body carries only the TWO reductions its exit test needs (normal, avg);
    # max-error is recomputed after the loop from the carried error vector
    # (density solves) or never observed (divergence solves report avg only,
    # matching the reference's div diagnostics).
    nonsing_mask = alive & (~singular)
    n_sing = psum(jnp.sum(alive & singular))
    n_nonsing = psum(jnp.sum(nonsing_mask))

    def one_sweep(p, p_prev, beta_on=None):
        a_p = div_fn(*accel_fn(p))
        p_next = p + w * (src - a_p) / aii_safe
        if beta > 0.0:
            # projected heavy-ball: momentum applied pre-projection; the exit
            # test below still measures the reference's predicted error of the
            # entering pressure, so the convergence CONTRACT is unchanged.
            # beta_on gates it OFF on sweeps whose PREDECESSOR already met
            # tolerance (warm starts at the >=2-iteration floor otherwise
            # oscillate: the kick re-raises a converged residual, measured
            # 2.00 -> 4.69 avg div iters on the warm stress bench window)
            b = jnp.float32(beta) * beta_on.astype(jnp.float32)
            p_next = p_next + b * (p - p_prev)
        p_next = jnp.where(singular, 0.0, p_next)
        if residual_type == DENSITY_ERROR:
            predicted = rho * dt * dt * (src - a_p)
        else:
            predicted = dt * (src - a_p)
        clamped = p_next <= 0.0
        p_next = jnp.where(clamped, 0.0, p_next)
        is_normal = nonsing_mask & (~clamped)
        n_normal = psum(jnp.sum(is_normal))
        avg = psum(jnp.sum(jnp.where(is_normal, predicted, 0.0))) / jnp.maximum(
            n_normal, 1
        ).astype(jnp.float32)
        avg = jnp.where(n_normal > 0, avg, jnp.nan)
        return p_next, predicted, dict(
            normal=n_normal,
            singular=n_sing,
            negative=n_nonsing - n_normal,
            avg=avg,
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
        p_next, perr, st = one_sweep(c["pressure"], c.get("p_prev", c["pressure"]),
                                     ~c.get("prev_conv", jnp.bool_(False)))
        brk = (converged(st) & (c["iters"] > 1)) | (c["iters"] == params.max_iters)
        out = dict(
            pressure=p_next,
            iters=jnp.where(brk, c["iters"], c["iters"] + 1),
            done=brk,
            avg=st["avg"], normal=st["normal"],
            density_error=perr if residual_type == DENSITY_ERROR else c["density_error"],
        )
        if beta > 0.0:
            out["p_prev"] = c["pressure"]
            out["prev_conv"] = converged(st)
        return out

    if p0 is None:
        p_init = jnp.zeros(total, jnp.float32)
    else:
        p_init = jnp.where(nonsing_mask, jnp.maximum(p0, 0.0), 0.0)
    init = dict(
        pressure=p_init,
        iters=jnp.int32(0), done=jnp.bool_(False),
        avg=jnp.float32(0.0), normal=jnp.int32(0),
        density_error=jnp.zeros(total, jnp.float32),
    )
    if beta > 0.0:
        init["p_prev"] = p_init
        init["prev_conv"] = jnp.bool_(False)
    out = jax.lax.while_loop(cond, body, init)
    # max error recomputed from the carried error vector: the final sweep's
    # normal set is alive & ~singular & (p > 0) (p == 0 iff that sweep clamped).
    # Divergence solves never observe max_error (diag reports avg only, like
    # the reference's div diagnostics) — it returns 0 there.
    if residual_type == DENSITY_ERROR:
        is_normal_f = nonsing_mask & (out["pressure"] > 0.0)
        mx = pmax(jnp.max(jnp.where(is_normal_f,
                                    jnp.abs(out["density_error"]), 0.0)))
    else:
        mx = jnp.float32(0.0)
    # pressure_accel stays CHANNEL-SPLIT (ax, ay) so the caller's integration
    # chains run on dense 1-D lanes too (stacking here would relayout to the
    # 2/128-lane (C, 2) tiling this path exists to avoid)
    final_accel = accel_fn(out["pressure"])
    return SolveResult(
        pressure=out["pressure"],
        pressure_accel=final_accel,
        density_error=out["density_error"],
        iterations=out["iters"],
        avg_error=out["avg"],
        max_error=mx,
        normal_count=out["normal"],
        singular_count=n_sing,
        negative_count=n_nonsing - out["normal"],
    )


def _resident_table_cols(aii, alive, params: SimulationParams, rho, rho_inv,
                         s1x, s1y, s2x, s2y, Gx, Gy, bt_kind: str):
    """First 15 constants-table lanes shared by the resident solver kernels
    (ops/pallas_jacobi.py lane layout), plus (singular, mp, w2020)."""
    singular = jnp.abs(aii) < SINGULAR_AII_EPS
    aii_safe = jnp.where(singular, 1.0, aii)
    waii = jnp.float32(params.jacobi_omega) / aii_safe
    nsing = jnp.where(singular, 0.0, 1.0)
    alive_f = jnp.where(alive, 1.0, 0.0)
    rho_b = params.rest_density
    od = params.operator_discretization
    w2020 = od == OperatorDiscretization.Winchenbach2020

    # boundary premultiplications (grid_physics.boundary_*_slots_1d folded into
    # per-particle lanes + one static scalar `mp`)
    z = jnp.zeros_like(aii)
    if bt_kind == "none":
        gxp = gyp = bdx = bdy = z
        mp = 0.0
    elif bt_kind == "sdf":
        mirror = 1.0 if od == OperatorDiscretization.ConsistentSymmetricGradient else 0.0
        mp = mirror / (rho_b * rho_b)
        gxp, gyp = Gx * rho_b, Gy * rho_b
        bscale = (jnp.ones_like(aii) if w2020 else rho_b * rho_inv)
        bdx, bdy = Gx * bscale, Gy * bscale
    else:
        mirror = 0.0 if od == OperatorDiscretization.ConsistentSimpleGradient else 1.0
        mp = mirror / (rho_b * rho_b)
        gxp, gyp = Gx, Gy
        bdx, bdy = Gx * rho_inv, Gy * rho_inv

    cols = [waii, nsing, rho_inv, gxp, gyp, s1x, s1y, bdx, bdy, alive_f, rho,
            s2x if s2x is not None else z, s2y if s2y is not None else z]
    return cols, singular, mp, w2020


def _p_init(p0, alive, singular, like):
    if p0 is None:
        return jnp.zeros_like(like)
    return jnp.where(alive & (~singular), jnp.maximum(p0, 0.0), 0.0)


def tile_jacobi_resident(wcache, wmeta_blocks, wcnt, tq: int, b_max: int,
                         aii, src, alive, max_avg_error, residual_type,
                         params: SimulationParams, dt, rho, rho_inv,
                         s1x, s1y, s2x, s2y, Gx, Gy, bt_kind: str,
                         p0=None, vel=None, omega_inv=None):
    """tile_jacobi semantics in ONE Pallas call (ops/pallas_jacobi.py).

    The weight cache is held VMEM-resident across every Jacobi sweep instead of
    re-streamed from HBM per matvec, and the inter-sweep elementwise glue
    (self/boundary terms, p update, convergence statistics,
    simulation.rs:1207-1322/1378-1516) runs inside the kernel. Single-chip only
    (no ppermute ghost refresh is possible mid-kernel).

    vel=(vx, vy): compute the source term in-kernel as
    src - div(vel) * omega_inv / dt (covers the IISPH/IISPH2/OnlyDivergence
    source forms; `src` is then the velocity-independent part) and return
    (SolveResult, full_src). Without vel, `src` is the complete source and the
    return is just the SolveResult."""
    from ..ops.pallas_jacobi import (
        S_AVG, S_ITERS, S_MAX, S_NEG, S_NORMAL, T_LANES, T_LANES_H,
        M_AX, M_AY, M_P, M_PERR, M_SRC, jacobi_solve,
    )

    cols13, singular, mp, w2020 = _resident_table_cols(
        aii, alive, params, rho, rho_inv, s1x, s1y, s2x, s2y, Gx, Gy, bt_kind)
    p_init = _p_init(p0, alive, singular, aii)
    z = jnp.zeros_like(aii)
    # T lanes: src, waii..alive (cols13[:10]), p0, rho, s2x, s2y
    cols = [src] + cols13[:10] + [p_init] + cols13[10:13]
    if vel is not None:
        omgi = jnp.ones_like(aii) if omega_inv is None else omega_inv
        cols += [z, vel[0], vel[1], omgi]  # p0div (unused), vx, vy, 1/Omega
        cols += [z] * (T_LANES_H - len(cols))
    else:
        cols += [z] * (T_LANES - len(cols))
    table = jnp.stack(cols, axis=1)
    scal = jnp.stack([dt.astype(jnp.float32), jnp.float32(max_avg_error),
                      jnp.float32(params.rest_density), jnp.float32(0.0)])

    m, stats = jacobi_solve(
        wcache, wmeta_blocks, wcnt, table, scal, tq, b_max=b_max,
        w2020=w2020, density_type=residual_type == DENSITY_ERROR,
        max_iters=int(params.max_iters), mp=mp,
        write_perr=residual_type == DENSITY_ERROR,
        src_from_div=vel is not None,
    )
    res = SolveResult(
        pressure=m[:, M_P],
        pressure_accel=(m[:, M_AX], m[:, M_AY]),
        density_error=m[:, M_PERR],
        iterations=stats[S_ITERS].astype(jnp.int32),
        avg_error=stats[S_AVG],
        max_error=stats[S_MAX],
        normal_count=stats[S_NORMAL].astype(jnp.int32),
        singular_count=jnp.sum(alive & singular).astype(jnp.int32),
        negative_count=stats[S_NEG].astype(jnp.int32),
    )
    if vel is not None:
        return res, m[:, M_SRC]
    return res


def tile_hybrid_resident(wcache, wmeta_blocks, wcnt, tq: int, b_max: int,
                         aii, alive, params: SimulationParams, dt, rho,
                         rho_inv, s1x, s1y, s2x, s2y, Gx, Gy, bt_kind: str,
                         vx, vy, den_with_div: bool,
                         p0_div=None, p0_den=None):
    """The whole HybridDFSPH solver section in ONE kernel
    (ops/pallas_jacobi.py hybrid_solve; simulation.rs:2502-2670 minus
    integration). Returns (res_div, res_den, v2x, v2y, src2): res_* are
    SolveResults (res_div carries no accel/density_error), v2 the
    post-divergence-solve velocities, src2 the density source term."""
    from ..ops.pallas_jacobi import (
        S_AVG, S_ITERS, S_MAX, S_NEG, S_NORMAL, T_LANES_H,
        M_AX, M_AY, M_P, M_PDIV, M_PERR, M_SRC, M_VX, M_VY, hybrid_solve,
    )

    cols13, singular, mp, w2020 = _resident_table_cols(
        aii, alive, params, rho, rho_inv, s1x, s1y, s2x, s2y, Gx, Gy, bt_kind)
    # density source, density part: -(rho0 - rho) / (rho_tilde dt^2)
    next_rho = (jnp.full_like(rho, params.rest_density) if w2020 else rho)
    src0 = -(params.rest_density - rho) / (next_rho * dt * dt)
    z = jnp.zeros_like(aii)
    cols = ([src0] + cols13[:10]  # src, waii..alive (order matches T lanes)
            + [_p_init(p0_den, alive, singular, aii), cols13[10],
               cols13[11], cols13[12],
               _p_init(p0_div, alive, singular, aii), vx, vy])
    cols += [z] * (T_LANES_H - len(cols))
    table = jnp.stack(cols, axis=1)
    scal = jnp.stack([
        dt.astype(jnp.float32),
        jnp.float32(params.hybrid_dfsph_max_avg_divergence_error),
        jnp.float32(params.hybrid_dfsph_max_avg_density_error),
        jnp.float32(params.rest_density),
    ])

    m, stats = hybrid_solve(
        wcache, wmeta_blocks, wcnt, table, scal, tq, b_max=b_max,
        w2020=w2020, max_iters=int(params.max_iters), mp=mp,
        den_with_div=den_with_div,
    )
    nsing_count = jnp.sum(alive & singular).astype(jnp.int32)

    def res(off, pressure, accel, perr):
        return SolveResult(
            pressure=pressure, pressure_accel=accel, density_error=perr,
            iterations=stats[off + S_ITERS].astype(jnp.int32),
            avg_error=stats[off + S_AVG],
            max_error=stats[off + S_MAX],
            normal_count=stats[off + S_NORMAL].astype(jnp.int32),
            singular_count=nsing_count,
            negative_count=stats[off + S_NEG].astype(jnp.int32),
        )

    zc = jnp.zeros_like(aii)
    res_div = res(8, m[:, M_PDIV], (zc, zc), zc)
    res_den = res(0, m[:, M_P], (m[:, M_AX], m[:, M_AY]), m[:, M_PERR])
    return res_div, res_den, m[:, M_VX], m[:, M_VY], m[:, M_SRC]
