"""Tile-backend step orchestration: the round-2 production hot path.

Same stage order and semantics as models/grid_step.py / models/simulation.py
(single_step_without_adaptivity, simulation.rs:1980-2730), with every pair sweep
running on the sorted-tile engine (ops/tiles.py + ops/pallas_sweeps.py). One sort
per step (cells sized for the largest search radius) serves the extended
level-estimation sweep and the 2h physics sweeps via per-sweep radius masks — the
analogue of build-at-extended-range + filter_down (simulation.rs:2023-2058).

All per-particle intermediates live in SORTED order; results are unsorted once at
the end of the step. Reference citations live next to each stage in grid_step.py
and models/tile_physics.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import kernels
from ..ops.pallas_sweeps import NEG_BIG, run_sweep
from ..ops.tiles import TileBins, TileConfig, build_tiles, sort_fields, sort_one, unsort, window_meta
from ..utils.params import (
    FillStashWith,
    HybridDfsphDensitySourceTerm,
    LevelEstimationMethod,
    OperatorDiscretization,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
    SupportLengthEstimation,
)
from . import boundary as bnd
from . import grid_physics as gp
from . import tile_physics as tp
from .grid_step import max_scale, physics_scale
from .solver import DENSITY_ERROR, DIVERGENCE_ERROR, SINGULAR_AII_EPS
from .state import FluidState


def supports_tile_backend(params: SimulationParams) -> bool:
    """check_aii, the exact neighborhood-count constraint, and post-advection/
    CenterDiff levels all run ON the tile engine; the only config still served
    by the list backend is the rare stale-pair-set post-advection combination."""
    if (params.level_estimation_active()
            and params.level_estimation_after_advection
            and not params.use_extended_range_for_level_estimation):
        # post-advection estimation over the STALE pre-advection pair set
        # (simulation.rs:2678: no rebuild when extended range is off)
        return False
    return True


def _stack(*cols):
    return jnp.stack([c.astype(jnp.float32) for c in cols], axis=1)


def single_step_tiles(state: FluidState, params: SimulationParams, tcfg: TileConfig,
                      boundary_handler, halo=None, emit_prev_pos=False):
    """One full step on the sorted-tile backend. Returns (new_state, dt, diag).

    halo: optional HaloHooks (parallel/tile_sharding.py) for slab-sharded
    multi-chip execution: per-device slab origin, ghost-row refresh inside the
    solver, ownership mask for reductions/outputs, and psum/pmin collectives.

    The particle ORDER of the returned state is this step's sorted tile layout
    rather than the input order. The SoA + alive-mask state design makes order
    free (SURVEY.md section 7), so the per-step unsort row-gather is skipped
    entirely and the next step's sort starts from a nearly-sorted layout.

    emit_prev_pos: adds diag["pos_prev"] = start-of-step positions in the
    RETURNED order, so interpolation across the step stays possible for the
    video exporter (animation/mod.rs:191-210) despite the reordering.
    """
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

    # 2. sort into the tile layout at the largest search radius
    origin = halo.origin if halo is not None else None
    psum = halo.psum if halo is not None else (lambda x: x)
    pmin = halo.pmin if halo is not None else (lambda x: x)
    pmax = halo.pmax if halo is not None else (lambda x: x)
    bins = build_tiles(pos, h_eff * jnp.float32(tcfg.mscale), h_eff, alive, tcfg,
                       origin=origin)
    diag["neighbor_overflow"] = (psum(bins.overflow), jnp.int32(0),
                                 psum(bins.level_overflow))

    # ONE batched row-gather sorts every field (each separate gather costs ~0.17 ms
    # on v5e). This is the ONLY row-gather of the step: outputs stay in sorted
    # order and carry-through fields ride extra columns here.
    warm = bool(params.warm_start_pressure)
    sort_cols = []
    col_ix = {}

    def add_col(name, arr):
        w = 1 if arr.ndim == 1 else arr.shape[1]
        a = sum(1 if c.ndim == 1 else c.shape[1] for c in sort_cols)
        col_ix[name] = (a, a + w)
        sort_cols.append(arr.astype(jnp.float32) if arr.dtype != jnp.float32 else arr)

    # column ORDER matters: [pos, h_eff, mass] is the statics table the walk
    # kernels consume, and keeping "vel" directly after lets the mega builder
    # take its merged candidate table as ONE contiguous slice allsorted[:, 0:6]
    # (XLA folds concat-of-adjacent-slices) instead of restacking relayouted
    # 1-D columns
    add_col("pos", pos)
    add_col("h_eff", h_eff)
    add_col("mass", state.mass)
    add_col("vel", state.velocity)
    add_col("h_raw", h)
    add_col("omega", state.omega)
    add_col("level", state.level)
    add_col("has_level", state.has_level.astype(jnp.float32))
    add_col("size_class", state.size_class.astype(jnp.float32))
    if warm:
        add_col("pressure", state.pressure)
        add_col("pressure_div", state.pressure_div)
    add_col("h_next", h_next)
    if halo is not None:
        add_col("owned", halo.owned.astype(jnp.float32))
    allsorted = sort_fields(bins, sort_cols)

    def col(name):
        a, b = col_ix[name]
        return allsorted[:, a] if b - a == 1 else allsorted[:, a:b]

    def colk(name, k):
        return allsorted[:, col_ix[name][0] + k]
    st = allsorted[:, 0:4]
    wm = window_meta(tcfg, bins, st, origin=origin)
    alive_s = st[:, 2] > 0.0
    if halo is not None:
        owned_s = col("owned") > 0.5
        refresh = halo.make_refresher(bins)
    else:
        owned_s = alive_s
        refresh = lambda v: v
    # per-particle fields as CHANNEL-SPLIT 1-D arrays: (C,) f32 tiles DENSE
    # (T(1024)) while interleaved (C, 2) tiles (8, 128) with 2/128 lanes used —
    # the profiler showed every elementwise chain on (C, 2) costing 40-90 us
    pos_s = st[:, 0:2]
    px_s, py_s = st[:, 0], st[:, 1]
    h_s = st[:, 2]
    mass_s = st[:, 3]
    h_raw_s = col("h_raw")
    vx_s, vy_s = colk("vel", 0), colk("vel", 1)

    pscale = float(physics_scale(params))
    ext_scale = float(params.level_estimation_range / kernels.ETA)

    def sweep(op, dyn, scale):
        return run_sweep(tcfg, bins, st, dyn, op, scale, wmeta=wm)

    # boundary terms on the sorted positions (elementwise per particle)
    h_safe = jnp.maximum(h_raw_s, 1e-6)
    bt = boundary_handler.update_after_advect(pos_s, h_safe, params)
    bst = bnd.solver_terms(bt, pos_s, h_safe, params)
    Gx_s = jnp.where(alive_s, bst.G[:, 0], 0.0)
    Gy_s = jnp.where(alive_s, bst.G[:, 1], 0.0)
    bdens_s = jnp.where(alive_s, bnd.density_boundary_term(bt, pos_s, h_safe, params), 0.0)
    dist_b = bnd.distance_to_boundary(bt)
    lam = bnd.lambda_sum(bt)
    lam_s = jnp.where(alive_s, lam, 0.0) if lam is not None else jnp.zeros_like(h_s)

    # 3. level estimation (pre-advection; simulation.rs:2018-2058)
    level_s = col("level")
    has_s = col("has_level") > 0.5
    surf_s = insuf_s = stash_s = None
    do_levels = params.level_estimation_active()
    if do_levels and not params.level_estimation_after_advection:
        assert params.level_estimation_method != LevelEstimationMethod.CenterDiff
        level_s, has_s, surf_s, insuf_s, stash_s = _level_estimation(
            tcfg, bins, st, wm, sweep, ext_scale, dist_b, h_raw_s, alive_s, params,
            refresh=refresh, psum=psum,
        )

    # neighbor count at the physics radius (diagnostic; simulation.rs:2072-2074)
    ncount_s = None
    if params.force_diagnostic_fields:
        ncount_s = sweep(tp.COUNT_OP, None, pscale)[:, 0]

    # opt-in O(C^2) neighborhood verification (simulation.rs:2076-2088): the
    # engine's pair count must equal the brute-force count for every owned particle
    if params.check_neighborhood:
        from .debug_checks import bruteforce_neighbor_count

        eng = sweep(tp.COUNT_OP, None, pscale)[:, 0].astype(jnp.int32)
        ref_cnt = bruteforce_neighbor_count(pos_s, h_s, alive_s, pscale)
        diag["neighborhood_check_mismatch"] = psum(
            jnp.sum(jnp.where(owned_s, jnp.abs(eng - ref_cnt), 0))
        )

    # 6. h_next estimation (simulation.rs:2090-2143); unsorted in the final batch
    hn_s = None
    if adaptive and params.support_length_estimation != SupportLengthEstimation.FromMass:
        hn_s = _h_next_distribution(sweep, st, lam_s, params, pscale)

    # 7. EXACT neighborhood-count constraint (simulation.rs:2145-2177): the
    # k-th largest fringe 2|x_ij| - sr_j over ALL neighbors, selected by
    # bisection on a counting sweep (the reference sorts per particle). The
    # constrained h only SHRINKS, so the existing windows remain valid
    # candidate supersets; subsequent sweeps read the updated statics table.
    flag_reduced_s = None
    if adaptive and params.constrain_neighborhood_count:
        srbs = kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
        target_n = jnp.float32(int(kernels.optimal_neighbor_number(2)) + 5)
        count_n = sweep(tp.COUNT_OP, None, pscale)[:, 0]
        need = alive_s & (count_n > target_n)
        m_pos = jnp.clip(count_n - target_n, 0.0, None)  # 0-indexed desc rank
        h_max_all = pmax(jnp.max(jnp.where(alive_s, h_s, 0.0)))
        lo0 = jnp.full_like(h_s, -(h_max_all * srbs))
        hi0 = jnp.full_like(h_s, 2.0 * jnp.float32(pscale) * h_max_all)

        def bisect(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            cnt_gt = sweep(tp.fringe_count_op(), mid[:, None], pscale)[:, 0]
            gt = cnt_gt > m_pos
            return jnp.where(gt, mid, lo), jnp.where(gt, hi, mid)

        _, hi_f = jax.lax.fori_loop(0, 30, bisect, (lo0, hi0))
        h_constrained = jnp.maximum(hi_f, 0.0)
        # swap semantics (simulation.rs:2173): h_next <- old h2 (any
        # distribution estimate is discarded), h2 <- constrained-or-old
        hn_s = h_raw_s
        h_raw_s = jnp.where(need, h_constrained, h_raw_s)
        h_s = h_raw_s  # adaptive: h_eff == h
        st = jnp.concatenate(
            [pos_s, h_raw_s[:, None], mass_s[:, None]], axis=1
        )
        flag_reduced_s = need
        # boundary terms follow the constraint in the reference (rs:2179)
        h_safe = jnp.maximum(h_raw_s, 1e-6)
        bt = boundary_handler.update_after_advect(pos_s, h_safe, params)
        bst = bnd.solver_terms(bt, pos_s, h_safe, params)
        Gx_s = jnp.where(alive_s, bst.G[:, 0], 0.0)
        Gy_s = jnp.where(alive_s, bst.G[:, 1], 0.0)
        bdens_s = jnp.where(
            alive_s, bnd.density_boundary_term(bt, pos_s, h_safe, params), 0.0
        )
        dist_b = bnd.distance_to_boundary(bt)

    # 9. CFL dt (simulation.rs:2182-2191); global min across slabs
    if flag_reduced_s is not None:
        # the constraint changed h in sorted space — reduce there
        sr_s = h_raw_s * kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
        v2s = vx_s * vx_s + vy_s * vy_s
        val = jnp.where(alive_s & owned_s, sr_s * sr_s / (v2s + 0.01), jnp.inf)
    else:
        sr = h_eff * kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
        v2 = jnp.sum(state.velocity * state.velocity, -1)
        owned_flat = alive if halo is None else (alive & halo.owned)
        val = jnp.where(owned_flat, sr * sr / (v2 + 0.01), jnp.inf)
    dt = jnp.minimum(jnp.float32(params.max_dt),
                     params.cfl_factor * jnp.sqrt(pmin(jnp.min(val))))
    diag["dt"] = dt

    # 12 + first non-pressure kick: fused prep sweep (a_ii sums + viscosity)
    method = params.pressure_solver_method
    first_np_at_start = (
        method != PressureSolverMethod.HybridDFSPH
        or params.hybrid_dfsph_non_pressure_accel_before_divergence_free
    )

    def finish_nonpressure(viscx, viscy):
        g = params.gravity_vector(2)
        ax = viscx + jnp.float32(g[0])
        ay = viscy + jnp.float32(g[1])
        if params.pull_fluid_to is not None:
            dx = jnp.float32(params.pull_fluid_to[0]) - px_s
            dy = jnp.float32(params.pull_fluid_to[1]) - py_s
            inv = 13.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy), 1e-9)
            ax = ax + dx * inv
            ay = ay + dy * inv
        return ax, ay

    # The weight-cache entries w_ij = m_j grad W_ij are exactly the integrand of
    # the a_ii fluid sums, so when the cache is on, ONE fused kernel walk
    # (ops/pallas_matvec.py build_weight_cache_prep) produces the weight blocks,
    # the four a_ii sums, AND the first-kick viscosity in a single pass.
    # In MEGA mode (non-Winchenbach2020 discretizations) that walk additionally
    # computes the DENSITY fluid sum (simulation.rs:1007-1028) and defers the
    # viscosity's 1/(rho_i + rho_j) factor to a once-per-step block stream
    # (visc_matvec), so the step has exactly ONE pair walk.
    import os as _os

    use_wcache = _os.environ.get("ASPH_NO_WCACHE", "0") != "1"
    wcache = wmeta_blocks = wcnt = None
    from ..utils.params import ViscosityType as _VT

    if first_np_at_start and params.viscosity_type == _VT.WCSPH:
        vm = "wcsph"
    elif first_np_at_start and params.viscosity_type == _VT.ApproxLaplace:
        vm = "laplace"
    else:
        vm = "none"
    # the rho_j-weighted s2 sums only feed the Winchenbach2020
    # discretization (assemble_aii_1d / div_fn) and the resident kernel's
    # table — skip their three per-window reduces otherwise
    need_s2 = (
        params.operator_discretization == OperatorDiscretization.Winchenbach2020
        or params.resident_solver
        or _os.environ.get("ASPH_RESIDENT_SOLVER", "0") == "1"
    )
    # clique mode (ops/cliques.py): same-level pairs as dense batched einsums
    # on the patch-major layout; cross-level pairs stay on the streamed
    # builder over cross_only window ranges. Runner enables via tcfg.patch.
    clique = tcfg.patch > 0
    if clique:
        assert halo is None and use_wcache and not need_s2, \
            "runner must not enable patch mode for slab/w2020/resident configs"
    mega = use_wcache and not need_s2 and not clique
    wdtype = jnp.bfloat16 if params.weight_cache_bf16 else jnp.float32
    rho_s = cf_s = None
    # v7 scalar-g blocks (mega path only; the resident solver and the
    # legacy-format tests consume [wx|wy]): half the streamed bytes, double
    # window height; matvecs reconstruct wx/wy from the statics in-kernel.
    # OPT-IN (ASPH_SCALAR_BLOCKS=1): standalone the scalar matvec beats the
    # legacy one (0.025 vs 0.032 ms/stream, -33% bytes) but IN-CONTEXT the
    # extra statics/sq operands cost more than the bytes save (bench A/B
    # 3.26 vs 2.63 ms/step, 2026-08-19) — see PERFORMANCE.md dead end #7.
    from ..ops.pallas_matvec import scalar_blocks_supported

    wc_scalar = (
        mega and scalar_blocks_supported(tcfg.tq)
        and _os.environ.get("ASPH_SCALAR_BLOCKS", "0") == "1"
    )
    if wc_scalar:
        from ..ops.tiles import to_chunks as _to_chunks

        wc_st = st  # sorted statics table (C, F)
        wc_sq = jnp.swapaxes(_to_chunks(st, tcfg.tq), 1, 2)  # (NT, F, TQ)
    else:
        wc_st = wc_sq = None
    clq = None
    if clique:
        from ..ops import cliques
        from ..ops.pallas_matvec import build_weight_cache_prep, visc_matvec
        from ..ops.tiles import build_halo, window_ranges

        visc_stream = vm != "none" and float(params.viscosity) != 0.0
        multi = len(tcfg.populated) > 1
        hs_map, halo_ovf = build_halo(tcfg, bins, st, origin=origin)
        cwx, cwy, s1x_cl, s1y_cl, s1sq_cl, den_cl = cliques.clique_build(
            tcfg, hs_map, st, pscale, wdtype)
        zeros_cl = jnp.zeros_like(den_cl)
        if multi:
            # cross-level remainder: streamed builder on cross_only ranges,
            # converted once per step into extra einsum entries
            nx_cap = int(_os.environ.get(
                "ASPH_NX_CAP", 64 if len(tcfg.populated) == 2 else 256))
            wm_cross, _ = window_ranges(tcfg, bins, st, origin=origin,
                                        cross_only=True)
            outs = build_weight_cache_prep(
                tcfg, bins, st, col("vel"), pscale, tcfg.b_max,
                vm if visc_stream else "none", params.viscosity,
                wmeta=wm_cross, wdtype=wdtype, want_s2=False,
                fuse_density=True, visc_stream=visc_stream, scalar=False)
            if visc_stream:
                wcache_x, vcache_x, meta_x, cnt_x, res_x = outs
            else:
                wcache_x, meta_x, cnt_x, res_x = outs
                vcache_x = None
            diag["wcache_overflow"] = psum(cnt_x[1])
            wxc, wyc, xsrc, xdst, xovf = cliques.cross_pack(
                wcache_x, meta_x, cnt_x, tcfg.tq, nx_cap)
            diag["clique_overflow"] = psum(xovf + halo_ovf)

            def xch(k):
                return res_x[:, k, :].reshape(-1)
        else:
            wxc = wyc = xsrc = xdst = vcache_x = meta_x = cnt_x = None
            diag["clique_overflow"] = psum(halo_ovf)

            def xch(k):
                return zeros_cl
        clq = cliques.CliqueOperator(wx=cwx, wy=cwy, halo_src=hs_map, wxc=wxc,
                                     wyc=wyc, src=xsrc, dst=xdst)
        # 10. density (simulation.rs:2204): clique sum + cross row 3 + boundary
        rho_s = den_cl + xch(3) + bdens_s
        rho_s = jnp.where(alive_s, rho_s, 1.0)
        s2x = s2y = s2sq = zeros_cl
        visc_x = visc_y = zeros_cl
        if visc_stream:
            visc_x, visc_y = cliques.clique_visc(
                tcfg, hs_map, st, vx_s, vy_s, rho_s, pscale, vm,
                params.viscosity)
            if multi:
                vxx, vyy = visc_matvec(vcache_x, meta_x, cnt_x, rho_s, tcfg.tq)
                visc_x = visc_x + vxx
                visc_y = visc_y + vyy
        _prep_cl = (s1x_cl + xch(0), s1y_cl + xch(1), s1sq_cl + xch(2))

        def pch(k):
            return _prep_cl[k]
    elif mega:
        from ..ops.pallas_matvec import build_weight_cache_prep, visc_matvec

        visc_stream = vm != "none" and float(params.viscosity) != 0.0
        outs = build_weight_cache_prep(
            tcfg, bins, st, col("vel"), pscale, tcfg.b_max,
            vm if visc_stream else "none", params.viscosity,
            wmeta=wm, wdtype=wdtype, want_s2=False,
            fuse_density=True, visc_stream=visc_stream, scalar=wc_scalar,
        )
        if visc_stream:
            wcache, vcache, wmeta_blocks, wcnt, res = outs
        else:
            wcache, wmeta_blocks, wcnt, res = outs
            vcache = None
        diag["wcache_overflow"] = psum(wcnt[1])

        def pch(k):
            return res[:, k, :].reshape(-1)

        # 10. density (simulation.rs:2204) straight from the walk's row 3;
        # ghost rows refreshed from their owners
        rho_s = pch(3) + bdens_s
        rho_s = refresh(jnp.where(alive_s, rho_s, 1.0)[:, None])[:, 0]
        s2x = s2y = s2sq = jnp.zeros_like(rho_s)  # row 3 is density here
        visc_x = visc_y = jnp.zeros_like(rho_s)
        if visc_stream:
            visc_x, visc_y = visc_matvec(vcache, wmeta_blocks, wcnt, rho_s,
                                         tcfg.tq, statics=wc_st, sq=wc_sq)
    else:
        # 10. density (simulation.rs:2204)
        rho_s = sweep(tp.DENSITY_OP, None, pscale)[:, 0] + bdens_s
        rho_s = refresh(jnp.where(alive_s, rho_s, 1.0)[:, None])[:, 0]
        if use_wcache:
            from ..ops.pallas_matvec import build_weight_cache_prep

            # legacy [wx|wy] blocks: this branch feeds the Winchenbach2020
            # discretization and/or the resident solver (ops/pallas_jacobi.py
            # consumes the 2-channel layout)
            wcache, wmeta_blocks, wcnt, res = build_weight_cache_prep(
                tcfg, bins, st, _stack(rho_s, vx_s, vy_s), pscale, tcfg.b_max,
                vm, params.viscosity, wmeta=wm, wdtype=wdtype, want_s2=need_s2,
                scalar=False,
            )
            diag["wcache_overflow"] = psum(wcnt[1])

            def pch(k):
                return res[:, k, :].reshape(-1)
        elif first_np_at_start:
            res = sweep(tp.prep_op(params), _stack(rho_s, vx_s, vy_s), pscale)

            def pch(k):
                return res[:, k]
        else:
            res = sweep(tp.aii_sums_op(), _stack(rho_s), pscale)

            def pch(k):
                return res[:, k] if k < res.shape[1] else jnp.zeros_like(rho_s)

        s2x, s2y, s2sq = pch(3), pch(4), pch(5)
        visc_x, visc_y = pch(6), pch(7)

    # 11. constant field diagnostic (simulation.rs:2235-2248); viz-only, gated
    if params.force_diagnostic_fields:
        cf_s = sweep(tp.constant_field_op(), _stack(rho_s), pscale)[:, 0] + (
            bdens_s / params.rest_density
        )

    sf_like = {"rho": rho_s, "mass": mass_s, "h": h_s}
    # a_ii sums as channel-split 1-D slices (s1 = sum m_j gradW_ij, s2 = the
    # rho_j-weighted variant, *sq their squared-norm sums)
    s1x, s1y, s1sq = pch(0), pch(1), pch(2)
    aii_s = gp.assemble_aii_1d(s1x, s1y, s1sq, s2x, s2y, s2sq, sf_like,
                               Gx_s, Gy_s, bt.kind, params)
    if first_np_at_start:
        ax0, ay0 = finish_nonpressure(visc_x, visc_y)
        first_np_vel = (vx_s + dt * ax0, vy_s + dt * ay0)
    else:
        first_np_vel = None
    aii_s = jnp.where(alive_s, aii_s, 0.0)
    diag["negative_aii"] = psum(jnp.sum(owned_s & (aii_s < 0.0)))

    w2020 = params.operator_discretization == OperatorDiscretization.Winchenbach2020
    if params.check_aii:
        # brute-force a_ii verification ON the production engine
        # (simulation.rs:1324-1375): one extra SweepOp instead of falling back
        # to the list backend. acc_self = accel of the unit self pressure.
        rr2 = jnp.maximum(rho_s * rho_s, 1e-30)
        bux, buy = gp.boundary_accel_slots_1d(
            Gx_s, Gy_s, jnp.ones_like(rho_s), rho_s, bt.kind, params
        )
        acsx = -s1x / rr2 + bux
        acsy = -s1y / rr2 + buy
        fluid_div = sweep(
            tp.check_aii_op(w2020), _stack(rho_s, acsx, acsy), pscale
        )[:, 0]
        if not w2020:
            fluid_div = fluid_div / jnp.maximum(rho_s, 1e-30)
        aii_real = fluid_div + gp.boundary_div_slots_1d(
            Gx_s, Gy_s, acsx, acsy, rho_s, bt.kind, params
        )
        diag["aii_deviation"] = pmax(
            jnp.max(jnp.where(owned_s & alive_s, jnp.abs(aii_real - aii_s), 0.0))
        )

    # 13. pressure solve + integrate (simulation.rs:2261-2671), sorted space.
    # The PPE operator's pair weights w_ij = m_j grad W_ij depend only on this
    # step's frozen geometry, so they are cached ONCE (ops/pallas_matvec.py) and
    # every Jacobi sweep becomes diag terms + two streamed matvecs; the diagonal
    # gradient sums S1/S2 come from the fused prep sweep above.
    # accel_fn/div_fn operate on CHANNEL-SPLIT 1-D arrays: accel_fn(p) returns
    # (ax, ay), div_fn takes (qx, qy). 1-D f32 arrays tile DENSE (T(1024));
    # interleaved (C, 2) intermediates tile (8, 128) with 2/128 lanes used, and
    # the profiler showed every elementwise chain on them costing 40-90 us.
    if clique:
        # Pallas-free Jacobi sweeps: batched einsums + one halo row-gather per
        # operand (+ the converted cross-level entries). Same math as the
        # streamed path (simulation.rs:1207-1322); non-w2020 only (asserted).
        rho_inv = 1.0 / jnp.maximum(rho_s, 1e-30)

        def accel_fn(p):
            u = p * rho_inv * rho_inv
            mvx, mvy = clq.matvec2(u)
            bx, by = gp.boundary_accel_slots_1d(Gx_s, Gy_s, p, rho_s, bt.kind,
                                                params)
            return -u * s1x - mvx + bx, -u * s1y - mvy + by

        def div_fn(qx, qy):
            s = clq.matvec_div(qx, qy)
            s = (s - (qx * s1x + qy * s1y)) * rho_inv
            return s + gp.boundary_div_slots_1d(Gx_s, Gy_s, qx, qy, rho_s,
                                                bt.kind, params)

    elif use_wcache:
        from ..ops.pallas_matvec import weight_matvec

        rho_inv = 1.0 / jnp.maximum(rho_s, 1e-30)

        def accel_fn(p):
            p = refresh(p)
            u = p * rho_inv * rho_inv
            mvx, mvy = weight_matvec(wcache, wmeta_blocks, wcnt, u[:, None],
                                     tcfg.tq, k_out=2, statics=wc_st, sq=wc_sq)
            bx, by = gp.boundary_accel_slots_1d(Gx_s, Gy_s, p, rho_s, bt.kind, params)
            return -u * s1x - mvx + bx, -u * s1y - mvy + by

        def div_fn(qx, qy):
            # ghost rows must be refreshed BEFORE the matvec (neighbors read
            # them); the i-indexed dot terms below only ever feed owned rows,
            # so they can use the pre-refresh values. One stacked ppermute on
            # the slab path; single-chip never interleaves (the matvec takes
            # channel-split (C,) operands — a (C, 2) stack is a relayout onto
            # 2/128-lane tiles that costs more than the weight stream itself).
            if halo is not None:
                t = refresh(jnp.stack([qx, qy], axis=1))
                tx, ty = t[:, 0], t[:, 1]
            else:
                tx, ty = qx, qy
            if w2020:
                s = weight_matvec(wcache, wmeta_blocks, wcnt,
                                  (tx * rho_inv, ty * rho_inv), tcfg.tq,
                                  k_out=1, statics=wc_st, sq=wc_sq)
                s = s - (qx * s2x + qy * s2y)
            else:
                s = weight_matvec(wcache, wmeta_blocks, wcnt, (tx, ty),
                                  tcfg.tq, k_out=1, statics=wc_st, sq=wc_sq)
                s = (s - (qx * s1x + qy * s1y)) * rho_inv
            return s + gp.boundary_div_slots_1d(Gx_s, Gy_s, qx, qy, rho_s,
                                                bt.kind, params)

    else:
        def accel_fn(p):
            p = refresh(p)
            a = sweep(tp.accel_op(), _stack(rho_s, p), pscale)
            bx, by = gp.boundary_accel_slots_1d(Gx_s, Gy_s, p, rho_s, bt.kind, params)
            return a[:, 0] + bx, a[:, 1] + by

        def div_fn(qx, qy):
            q = refresh(jnp.stack([qx, qy], axis=1))
            s = sweep(tp.div_op(w2020), _stack(rho_s, q[:, 0], q[:, 1]), pscale)[:, 0]
            if not w2020:
                s = s / jnp.maximum(rho_s, 1e-30)
            return s + gp.boundary_div_slots_1d(Gx_s, Gy_s, qx, qy, rho_s,
                                                bt.kind, params)

    p_prev_s = col("pressure") if warm else None
    pdiv_prev_s = col("pressure_div") if warm else None

    if use_wcache and not clique:
        from ..ops.pallas_jacobi import resident_supported

        resident = (
            halo is None
            and params.jacobi_momentum == 0.0  # not in the resident kernel
            and (params.resident_solver
                 or _os.environ.get("ASPH_RESIDENT_SOLVER", "0") == "1")
            and resident_supported(
                tcfg.capacity, tcfg.tq,
                jnp.bfloat16 if params.weight_cache_bf16 else jnp.float32)
        )
    else:
        resident = False

    def jacobi(src, tol, rtype, p0=None, vel=None, omega_inv=None):
        """vel=(vx, vy) is only passed on the resident path: the kernel then
        computes src - div(vel)*omega_inv/dt itself (no streamed source
        matvec) and returns (SolveResult, full_src)."""
        if resident:
            return tp.tile_jacobi_resident(
                wcache, wmeta_blocks, wcnt, tcfg.tq, tcfg.b_max,
                aii_s, src, owned_s, tol, rtype, params, dt, rho_s, rho_inv,
                s1x, s1y, s2x, s2y, Gx_s, Gy_s, bt.kind, p0=p0,
                vel=vel, omega_inv=omega_inv,
            )
        assert vel is None
        return tp.tile_jacobi(
            accel_fn, div_fn, aii_s, src, owned_s, tol, rtype, params, dt, rho_s,
            p0=p0, psum=psum, pmax=pmax,
        )

    def nonpressure(vx, vy):
        if first_np_vel is not None and vx is vx_s:
            return first_np_vel
        visc = sweep(tp.visc_op(params), _stack(rho_s, vx, vy), pscale)
        ax, ay = finish_nonpressure(visc[:, 0], visc[:, 1])
        return vx + dt * ax, vy + dt * ay

    def src_full(vx, vy):
        div_v = div_fn(vx, vy)
        next_rho = jnp.full_like(rho_s, params.rest_density) if w2020 else rho_s
        return -(params.rest_density - rho_s) / (next_rho * dt * dt) - div_v / dt

    def src_only_density():
        next_rho = jnp.full_like(rho_s, params.rest_density) if w2020 else rho_s
        return -(params.rest_density - rho_s) / (next_rho * dt * dt)

    omega_s = jnp.where(alive_s, col("omega"), 1.0)
    p2x, p2y = px_s, py_s
    v2x, v2y = vx_s, vy_s
    pdiv_s = None

    if method in (PressureSolverMethod.IISPH, PressureSolverMethod.IISPH2):
        if method == PressureSolverMethod.IISPH2:
            from .state import SIZE_LARGE

            sum_term = sweep(tp.omega_op(), None, pscale)[:, 0]
            srbs = kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
            H_i = h_s * srbs
            rr = jnp.maximum(rho_s, 1e-30)
            omega_neigh = 1.0 + H_i / (3.0 * rr) * sum_term
            self_term = mass_s * kernels.kernel_dw_dH(jnp.zeros_like(H_i), H_i, dim=2)
            omega_large = 1.0 + H_i / (3.0 * rr) * self_term
            size_class_s = col("size_class")
            omega_s = jnp.clip(
                jnp.where(size_class_s == float(SIZE_LARGE), omega_large, omega_neigh),
                0.125, 2.5,
            )
        v2x, v2y = nonpressure(vx_s, vy_s)
        if warm:
            p0 = p_prev_s * jnp.sqrt(omega_s) if method == PressureSolverMethod.IISPH2 else p_prev_s
        else:
            p0 = None
        if resident:
            # velocity-independent source part; the kernel computes
            # src - div(v2)*omega_inv/dt itself (no streamed source matvec)
            if method == PressureSolverMethod.IISPH2:
                src_t = -(params.rest_density - rho_s) / (
                    params.rest_density * dt * dt)
                omgi = 1.0 / omega_s
            else:
                src_t = src_only_density()
                omgi = None
            res, src = jacobi(src_t, params.iisph_max_avg_density_error,
                              DENSITY_ERROR, p0=p0, vel=(v2x, v2y),
                              omega_inv=omgi)
        else:
            if method == PressureSolverMethod.IISPH2:
                src = -(params.rest_density - rho_s) / (params.rest_density * dt * dt) - (
                    div_fn(v2x, v2y) / (dt * omega_s)
                )
            else:
                src = src_full(v2x, v2y)
            res = jacobi(src, params.iisph_max_avg_density_error, DENSITY_ERROR, p0=p0)
        pressure_s = res.pressure
        ax_sv, ay_sv = res.pressure_accel
        if method == PressureSolverMethod.IISPH2:
            pressure_s = pressure_s / jnp.sqrt(omega_s)
            ax_sv, ay_sv = accel_fn(pressure_s)
        v2x = v2x + dt * ax_sv
        v2y = v2y + dt * ay_sv
        p2x = p2x + dt * v2x
        p2y = p2y + dt * v2y
        diag["density_iterations"] = res.iterations
        diag["density_avg_error"] = res.avg_error
        diag["density_max_error"] = res.max_error
        diag["solver_stats"] = (res.normal_count, res.singular_count, res.negative_count)
        src_s, derr_s = src, res.density_error

    elif method == PressureSolverMethod.OnlyDivergence:
        v2x, v2y = nonpressure(vx_s, vy_s)
        if resident:
            res, src = jacobi(jnp.zeros_like(rho_s),
                              params.hybrid_dfsph_max_avg_divergence_error,
                              DIVERGENCE_ERROR, p0=p_prev_s if warm else None,
                              vel=(v2x, v2y))
        else:
            src = -div_fn(v2x, v2y) / dt
            res = jacobi(src, params.hybrid_dfsph_max_avg_divergence_error,
                         DIVERGENCE_ERROR, p0=p_prev_s if warm else None)
        ax_sv, ay_sv = res.pressure_accel
        v2x = v2x + dt * ax_sv
        v2y = v2y + dt * ay_sv
        p2x = p2x + dt * v2x
        p2y = p2y + dt * v2y
        pressure_s = res.pressure
        diag["div_iterations"] = res.iterations
        diag["div_avg_error"] = res.avg_error
        diag["solver_stats"] = (res.normal_count, res.singular_count, res.negative_count)
        src_s, derr_s = src, res.density_error

    else:  # HybridDFSPH
        hybrid_one_kernel = (
            resident
            and params.hybrid_dfsph_non_pressure_accel_before_divergence_free
        )
        if params.hybrid_dfsph_non_pressure_accel_before_divergence_free:
            v2x, v2y = nonpressure(vx_s, vy_s)
        if hybrid_one_kernel:
            # the whole solver section (src_div, div solve, v kick, src_den,
            # density solve) in ONE kernel with the weights loaded once
            res_div, res_den, v2x, v2y, src2 = tp.tile_hybrid_resident(
                wcache, wmeta_blocks, wcnt, tcfg.tq, tcfg.b_max,
                aii_s, owned_s, params, dt, rho_s, rho_inv,
                s1x, s1y, s2x, s2y, Gx_s, Gy_s, bt.kind, v2x, v2y,
                den_with_div=(params.hybrid_dfsph_density_source_term
                              == HybridDfsphDensitySourceTerm.DensityAndDivergence),
                p0_div=pdiv_prev_s if warm else None,
                p0_den=p_prev_s if warm else None,
            )
            diag["div_iterations"] = res_div.iterations
            diag["div_avg_error"] = res_div.avg_error
        else:
            src = -div_fn(v2x, v2y) / dt
            res_div = jacobi(src, params.hybrid_dfsph_max_avg_divergence_error,
                             DIVERGENCE_ERROR, p0=pdiv_prev_s if warm else None)
            adx, ady = res_div.pressure_accel
            v2x = v2x + dt * adx
            v2y = v2y + dt * ady
            diag["div_iterations"] = res_div.iterations
            diag["div_avg_error"] = res_div.avg_error
            if not params.hybrid_dfsph_non_pressure_accel_before_divergence_free:
                v2x, v2y = nonpressure(v2x, v2y)
            if params.hybrid_dfsph_density_source_term == HybridDfsphDensitySourceTerm.DensityAndDivergence:
                src2 = src_full(v2x, v2y)
            else:
                src2 = src_only_density()
            res_den = jacobi(src2, params.hybrid_dfsph_max_avg_density_error,
                             DENSITY_ERROR, p0=p_prev_s if warm else None)
        diag["density_iterations"] = res_den.iterations
        diag["density_avg_error"] = res_den.avg_error
        diag["density_max_error"] = res_den.max_error
        diag["solver_stats"] = (res_den.normal_count, res_den.singular_count, res_den.negative_count)
        # UNCLAMPED residual statistics over every alive non-singular particle
        # (the reference's avg counts only "normal" = unclamped-positive rows,
        # simulation.rs:1453-1469, which is vacuous while a hydrostatic scene
        # clamps every pressure to zero — these make the density contract
        # observable in that regime too; see scripts/scenario_gates.py)
        _ns = owned_s & alive_s & (jnp.abs(aii_s) >= SINGULAR_AII_EPS)
        _nn = jnp.maximum(psum(jnp.sum(_ns)), 1).astype(jnp.float32)
        diag["density_avg_error_all"] = psum(
            jnp.sum(jnp.where(_ns, res_den.density_error, 0.0))) / _nn
        diag["density_max_error_all"] = pmax(
            jnp.max(jnp.where(_ns, jnp.abs(res_den.density_error), 0.0)))
        ax_sv, ay_sv = res_den.pressure_accel
        p2x = p2x + dt * v2x + dt * dt * ax_sv
        p2y = p2y + dt * v2y + dt * dt * ay_sv
        blend = jnp.minimum(dt * params.hybrid_dfsph_factor, 1.0)
        v2x = v2x + dt * ax_sv * blend
        v2y = v2y + dt * ay_sv * blend
        pressure_s = res_den.pressure
        src_s, derr_s = src2, res_den.density_error
        pdiv_s = res_div.pressure if warm else None

    # 14. optional post-advection level estimation (simulation.rs:2678-2707):
    # rebuild the tile layout at the ADVECTED positions at the extended radius;
    # detection, propagation and the final smoothing all run over the rebuilt
    # pair set like the reference, then map back to the step layout.
    sm_s = None
    if do_levels and params.level_estimation_after_advection:
        assert params.use_extended_range_for_level_estimation, (
            "post-advection level estimation over the stale pair set stays on "
            "the list backend (supports_tile_backend)")
        assert halo is None, "slab-sharded step gates out post-advection levels"
        h_eff_s = st[:, 2]
        pos2_s = jnp.stack([p2x, p2y], axis=1)
        bins2 = build_tiles(pos2_s, h_eff_s * jnp.float32(tcfg.mscale), h_eff_s,
                            alive_s, tcfg, origin=origin)
        ro0, co0, lo0 = diag["neighbor_overflow"]
        diag["neighbor_overflow"] = (ro0 + bins2.overflow, co0,
                                     lo0 + bins2.level_overflow)
        cols2 = sort_fields(bins2, [pos2_s, h_eff_s, mass_s, h_raw_s, rho_s])
        st2 = cols2[:, 0:4]
        wm2 = window_meta(tcfg, bins2, st2, origin=origin)
        alive2 = st2[:, 2] > 0.0
        h_raw2 = cols2[:, 4]
        rho2 = cols2[:, 5]

        def sweep2(op, dyn, scale):
            return run_sweep(tcfg, bins2, st2, dyn, op, scale, wmeta=wm2)

        bt2 = boundary_handler.update_after_advect(
            st2[:, 0:2], jnp.maximum(h_raw2, 1e-6), params
        )
        dist_b2 = bnd.distance_to_boundary(bt2)
        level2, has2, surf2, insuf2, stash2 = _level_estimation(
            tcfg, bins2, st2, wm2, sweep2, ext_scale, dist_b2, h_raw2, alive2,
            params,
        )
        # 15. smoothing over the same rebuilt pair set (simulation.rs:2709-2722
        # reads the just-rebuilt lists when after_advection)
        max_depth = -params.maximum_surface_distance
        dist2 = jnp.where(has2, jnp.maximum(level2, max_depth), max_depth)
        sm2 = sweep2(
            tp.smooth_op(),
            _stack(rho2, dist2, st2[:, 0], st2[:, 1]),
            ext_scale,
        )
        sm2_s = sm2[:, 0] / jnp.maximum(sm2[:, 1], 1e-30)
        back_cols = [sm2_s, surf2.astype(jnp.float32), insuf2.astype(jnp.float32)]
        if stash2 is not None:
            back_cols.append(stash2)
        back = unsort(bins2, jnp.stack(back_cols, axis=1), None, 0.0)
        sm_s = back[:, 0]
        surf_s = back[:, 1] > 0.5
        insuf_s = back[:, 2] > 0.5
        if stash2 is not None:
            stash_s = back[:, 3]
        has_s = jnp.ones_like(alive_s)
    elif do_levels:
        # 15. level-field smoothing (simulation.rs:2709-2722): advected
        # positions over the stale pre-advection pair set
        max_depth = -params.maximum_surface_distance
        dist_s = jnp.where(has_s, jnp.maximum(level_s, max_depth), max_depth)
        dp = refresh(jnp.stack([dist_s, p2x, p2y], axis=1))
        sm = sweep(
            tp.smooth_op(),
            _stack(rho_s, dp[:, 0], dp[:, 1], dp[:, 2]),
            pscale,
        )
        sm_s = sm[:, 0] / jnp.maximum(sm[:, 1], 1e-30)

    # no unsort at all: the returned state IS the sorted layout. Occupied
    # rows (alive particles placed by the sort) form the new alive mask;
    # row padding and sort-overflow drops read zeros/fills. Gated-off
    # diagnostic fields (constant_field, stash, neighbor_count, flags) emit
    # their fill instead of carrying stale values — they are only ever
    # consumed by visualizations whose configs force them on.
    def msk(v, fill=0.0):
        if v.ndim == 1:
            return jnp.where(alive_s, v, fill)
        return jnp.where(alive_s[:, None], v, fill)

    zeros_s = jnp.zeros_like(rho_s)
    if do_levels:
        level_out = msk(sm_s)
        has_out = alive_s
        level_old_out = level_out
    else:
        level_out = msk(level_s)
        has_out = has_s & alive_s
        level_old_out = level_out
    if surf_s is not None:
        surf_out = surf_s & alive_s
        insuf_out = insuf_s & alive_s
    else:
        surf_out = jnp.zeros_like(alive_s)
        insuf_out = jnp.zeros_like(alive_s)
    new_state = state.replace(
        mass=msk(mass_s),
        position=jnp.stack([msk(p2x), msk(p2y)], axis=1),
        velocity=jnp.stack([msk(v2x), msk(v2y)], axis=1),
        pressure=msk(pressure_s),
        pressure_div=(msk(pdiv_s) if pdiv_s is not None
                      else (msk(pdiv_prev_s) if warm else zeros_s)),
        stash=msk(stash_s) if stash_s is not None else zeros_s,
        pressure_accel=jnp.stack([msk(ax_sv), msk(ay_sv)], axis=1),
        ppe_source_term=msk(src_s),
        density_error=msk(derr_s),
        omega=msk(omega_s, 1.0),
        density=msk(rho_s, 1.0),
        aii=msk(aii_s),
        constant_field=msk(cf_s) if cf_s is not None else zeros_s,
        h=msk(h_raw_s),
        h_next=msk(hn_s) if hn_s is not None else msk(col("h_next")),
        level=level_out,
        has_level=has_out,
        level_old=level_old_out,
        size_class=msk(col("size_class")).astype(jnp.int32),
        neighbor_count=(msk(ncount_s).astype(jnp.int32) if ncount_s is not None
                        else jnp.zeros_like(alive_s, jnp.int32)),
        flag_is_fluid_surface=surf_out,
        flag_insufficient_neighs=insuf_out,
        flag_neighborhood_reduced=(flag_reduced_s & alive_s
                                   if flag_reduced_s is not None
                                   else jnp.zeros_like(alive_s)),
        alive=alive_s,
        time=state.time + dt,
        step_number=state.step_number + 1,
    )
    if emit_prev_pos:
        diag["pos_prev"] = msk(pos_s)
    if halo is not None:
        diag["_owned_sorted"] = owned_s
    return new_state, dt, diag


def _level_estimation(tcfg, bins, st, wm, sweep, ext_scale, dist_b, h_raw_s, alive_s,
                      params: SimulationParams, refresh=lambda v: v,
                      psum=lambda x: x):
    """EmptyAngle + wavefront propagation in sorted space (simulation.rs:539-927).

    refresh/psum: slab-sharding hooks — ghost rows pull owner values before each
    wavefront sweep and the fixpoint test is a global reduction."""
    if params.level_estimation_method == LevelEstimationMethod.CenterDiff:
        # CenterDiff detector (simulation.rs:630-695): phi = |x - avg_center| -
        # avg_radius over volume-weighted neighbor sums
        cd = sweep(tp.centerdiff_op(params), None, ext_scale)
        count = sweep(tp.COUNT_OP, None, ext_scale)[:, 0]
        w_sum = jnp.maximum(cd[:, 0], 1e-30)
        avg_radius = cd[:, 3] / w_sum
        surface_level = -0.85 * avg_radius
        acx = cd[:, 1] / w_sum
        acy = cd[:, 2] / w_sum
        phi_init = jnp.sqrt(
            (st[:, 0] - acx) ** 2 + (st[:, 1] - acy) ** 2
        ) - avg_radius
        phi = jnp.where(count < 5, surface_level, phi_init)
        is_surface = (phi >= surface_level) & alive_s
        is_surface = refresh(is_surface.astype(jnp.float32)[:, None])[:, 0] > 0.5
        level = jnp.where(is_surface, phi, 0.0)
        level = refresh(level[:, None])[:, 0]
        has = is_surface
        flag_insufficient = jnp.zeros_like(is_surface)
    else:
        count = sweep(tp.COUNT_OP, None, ext_scale)[:, 0]
        nrm = sweep(tp.normal_op(params), None, ext_scale)
        nx, ny = nrm[:, 0], nrm[:, 1]
        norm2 = nx * nx + ny * ny
        inv = 1.0 / jnp.sqrt(jnp.maximum(norm2, 1e-30))
        cone = sweep(tp.cone_op(params), _stack(nx * inv, ny * inv), ext_scale)[:, 0] > 0.5

        insufficient = count < (2 * 2 - 1)
        symmetric = norm2 < 1e-5
        near_boundary = jnp.zeros_like(symmetric)
        if (not params.boundary_is_fluid_surface) and dist_b is not None:
            near_boundary = dist_b < h_raw_s * 1.5
        is_interior = jnp.where(
            insufficient, False, jnp.where(symmetric, True, jnp.where(near_boundary, True, cone))
        )
        is_surface = (~is_interior) & alive_s
        is_surface = refresh(is_surface.astype(jnp.float32)[:, None])[:, 0] > 0.5
        level = jnp.zeros_like(h_raw_s)
        has = is_surface
        flag_insufficient = insufficient & alive_s
    max_depth = jnp.float32(-params.maximum_surface_distance)
    stash = None
    if params.fill_stash_with == FillStashWith.SurfaceDistanceFirstIteration:
        stash = jnp.where(has, level, max_depth)

    def one_sweep(lvl, hasv):
        lh = refresh(jnp.stack([lvl, hasv.astype(jnp.float32)], axis=1))
        lvl, hasv = lh[:, 0], lh[:, 1] > 0.5
        est = sweep(
            tp.wavefront_op(params), _stack(lvl, hasv.astype(jnp.float32)), ext_scale
        )[:, 0]
        newly = (~hasv) & (est > NEG_BIG * 0.5) & alive_s
        return jnp.where(newly, est, lvl), hasv | newly, psum(jnp.sum(newly)) > 0

    level, has, changed = one_sweep(level, has)
    if params.fill_stash_with == FillStashWith.SurfaceDistanceMiddle:
        stash = jnp.where(has, level, max_depth)

    def cond(c):
        return c[2]

    def body(c):
        return one_sweep(c[0], c[1])

    level, has, _ = jax.lax.while_loop(cond, body, (level, has, changed))
    return level, has, is_surface, flag_insufficient, stash


def _h_next_distribution(sweep, st, lam_s, params: SimulationParams, pscale):
    """FromDistribution estimators (simulation.rs:1873-1971) in sorted space."""
    mode = params.support_length_estimation
    h_s = st[:, 2]
    mass_s = st[:, 3]
    if mode == SupportLengthEstimation.FromDistribution2:
        v_w_sum = sweep(tp.h_vw_sum_op(params), None, pscale)[:, 0]
        vi = mass_s / params.rest_density
        volume_estimate = vi / jnp.maximum(v_w_sum + lam_s, 1e-30)
    else:
        w_sum = sweep(tp.h_w_sum_op(), None, pscale)[:, 0]
        volume_estimate = (1.0 - jnp.minimum(lam_s, 0.5)) / jnp.maximum(w_sum, 1e-30)
    h_new = kernels.ETA * kernels.sphere_volume_to_radius(volume_estimate, dim=2)
    h_next = 0.5 * h_new + 0.5 * h_s
    if mode == SupportLengthEstimation.FromDistributionClamped1:
        h_next = jnp.minimum(
            h_next, kernels.smoothing_length_from_mass(mass_s, params.rest_density, 2)
        )
    elif mode == SupportLengthEstimation.FromDistributionClamped2:
        h_next = jnp.minimum(
            h_next, 2.0 * kernels.smoothing_length_from_mass(mass_s, params.rest_density, 2)
        )
    return h_next
