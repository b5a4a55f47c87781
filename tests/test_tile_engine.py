"""Sorted-tile engine tests: builder invariants, kernel parity vs brute force
(interpret mode), and backend differentials (tiles vs grid) on real scenes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sph_tpu.models import scene as scene_mod
from adaptive_sph_tpu.models import tile_physics as tp
from adaptive_sph_tpu.ops.grid import make_grid_config
from adaptive_sph_tpu.ops.pallas_sweeps import SweepOp, run_sweep, sweep_bruteforce
from adaptive_sph_tpu.ops.tiles import (
    TILE,
    TileConfig,
    build_tiles,
    sort_fields,
    unsort,
)
from adaptive_sph_tpu.runner import create_simulation
from adaptive_sph_tpu.utils.params import (
    InitBoundaryHandlerType,
    LevelEstimationMethod,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
)


def _two_level_cloud(C=2048, n_fine=700, n_coarse=5, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.zeros((C, 2), np.float32)
    # clustered fine particles (keeps row padding within capacity)
    nside = int(np.ceil(np.sqrt(n_fine)))
    ii = np.arange(n_fine)
    pos[:n_fine] = np.stack(
        [-0.9 + (ii % nside) * 0.012, -0.9 + (ii // nside) * 0.012], -1
    ) + rng.normal(0, 0.002, (n_fine, 2))
    pos[n_fine:n_fine + n_coarse] = rng.uniform(0.0, 0.9, (n_coarse, 2))
    h = np.zeros(C, np.float32)
    h[:n_fine] = 0.009
    h[n_fine:n_fine + n_coarse] = 0.35
    mass = np.zeros(C, np.float32)
    mass[:n_fine] = 6e-5
    mass[n_fine:n_fine + n_coarse] = 0.15
    alive = np.zeros(C, bool)
    alive[:n_fine + n_coarse] = True
    # scatter order so the sort is non-trivial
    perm = rng.permutation(C)
    return (jnp.asarray(pos[perm]), jnp.asarray(h[perm]), jnp.asarray(mass[perm]),
            jnp.asarray(alive[perm]))


def _cfg(C, tq=32):
    g = make_grid_config((-1, -1), (1, 1), 2.0, 0.009, 0.35, C)
    g = dataclasses.replace(g, populated=(0, g.levels - 1))
    return TileConfig.from_grid(g, 2.0, tq=tq)


def test_builder_invariants():
    pos, h, mass, alive = _two_level_cloud()
    cfg = _cfg(pos.shape[0])
    bins = build_tiles(pos, h * 2.0, h, alive, cfg)
    assert int(bins.overflow) == 0
    assert int(bins.level_overflow) == 0
    perm = np.asarray(bins.perm)
    pp = np.asarray(bins.pp)
    C = pos.shape[0]
    a = np.asarray(alive)
    # every alive particle placed; roundtrip holds
    assert (pp[a] < C).all()
    idx = np.where(a)[0]
    assert (perm[pp[idx]] == idx).all()
    # cell_starts monotone
    cs = np.asarray(bins.cell_starts)
    assert (np.diff(cs) >= 0).all()
    # packed layout: slots [0, n_alive) are exactly the alive particles
    st = np.asarray(sort_fields(bins, [pos, h, mass]))
    live = st[:, 2] > 0
    n_alive = int(np.sum(a))
    assert int(bins.n_padded) == n_alive
    assert live[:n_alive].all() and not live[n_alive:].any()
    # sorted order is level-major then row-major: h-scale classes are contiguous
    # (coarse cells sort after every fine cell in the flat cell index)
    coarse = st[:n_alive, 2] > 0.1
    assert (np.diff(coarse.astype(np.int8)) >= 0).all()


OPS = [
    ("density", tp.DENSITY_OP, 0),
    ("count", tp.COUNT_OP, 0),
    ("aii_sums", tp.aii_sums_op(), 1),
    ("accel", tp.accel_op(), 2),
    ("div", tp.div_op(False), 3),
    ("div2020", tp.div_op(True), 3),
    ("h_w_sum", tp.h_w_sum_op(), 0),
]


@pytest.mark.parametrize("name,op,dynkind", OPS)
def test_sweep_parity_vs_bruteforce(name, op, dynkind):
    pos, h, mass, alive = _two_level_cloud(C=1024, n_fine=350, n_coarse=4, seed=3)
    cfg = _cfg(1024)
    bins = build_tiles(pos, h * 2.0, h, alive, cfg)
    st = sort_fields(bins, [pos, h, mass])
    rng = np.random.default_rng(7)
    C = 1024
    rho = jnp.asarray(rng.uniform(0.8, 1.2, C).astype(np.float32))
    if dynkind == 0:
        dyn = None
    elif dynkind == 1:
        dyn = rho[:, None]
    elif dynkind == 2:
        p = jnp.asarray(rng.uniform(0, 10, C).astype(np.float32))
        dyn = jnp.stack([rho, p], 1)
    else:
        q = jnp.asarray(rng.normal(0, 1, (C, 2)).astype(np.float32))
        dyn = jnp.concatenate([rho[:, None], q], 1)
    got = run_sweep(cfg, bins, st, dyn, op, 2.0)
    want = sweep_bruteforce(cfg, st, dyn, op, 2.0)
    live = np.asarray(st[:, 2]) > 0
    g = np.asarray(got)[live]
    w = np.asarray(want)[live]
    # tolerance scales with the column magnitude: antisymmetric gradient sums
    # cancel to ~0 and only differ by f32 association order
    scale = np.max(np.abs(w), axis=0, keepdims=True) + 1e-6
    assert np.max(np.abs(g - w) / scale) < 1e-5, name


def test_max_reduce_parity():
    pos, h, mass, alive = _two_level_cloud(C=1024, n_fine=350, n_coarse=4, seed=5)
    cfg = _cfg(1024)
    bins = build_tiles(pos, h * 2.0, h, alive, cfg)
    st = sort_fields(bins, [pos, h, mass])
    params = SimulationParams()
    op = tp.wavefront_op(params)
    rng = np.random.default_rng(11)
    lvl = jnp.asarray(rng.uniform(-1, 0, 1024).astype(np.float32))
    has = jnp.asarray((rng.uniform(0, 1, 1024) > 0.5).astype(np.float32))
    dyn = jnp.stack([lvl, has], 1)
    got = run_sweep(cfg, bins, st, dyn, op, 2.0)
    want = sweep_bruteforce(cfg, st, dyn, op, 2.0)
    live = np.asarray(st[:, 2]) > 0
    np.testing.assert_allclose(np.asarray(got)[live], np.asarray(want)[live],
                               rtol=1e-5, atol=1e-5)


def _dam_scene(spacing2=None):
    blocks = [{"pos": [0.4, -0.5], "size": [0.55, 1.4], "spacing": 0.06,
               "volume_fill_ratio": 0.93, "velocity": [0, 0]}]
    if spacing2:
        blocks.append({"pos": [-0.95, -0.5], "size": [0.55, 1.4], "spacing": spacing2,
                       "volume_fill_ratio": 0.93, "velocity": [0, 0]})
    return scene_mod.scene_from_dict(
        {"boundary": {"type": "box", "width": 2, "height": 2}, "blocks": blocks}
    )


def _diff_backends(params, scene, steps, capacity=None):
    out = {}
    for backend in ("tiles", "grid"):
        sim = create_simulation(params, scene, capacity=capacity, backend=backend)
        for _ in range(steps):
            sim.step()
        out[backend] = sim.state
    a, b = out["tiles"], out["grid"]
    # the tile backend emits its state in sorted-layout order (an explicit
    # contract: SoA + alive mask make order arbitrary), so the comparison
    # matches particles by position — unambiguous at lattice spacing >> atol
    pa = np.asarray(a.position)[np.asarray(a.alive)]
    pb = np.asarray(b.position)[np.asarray(b.alive)]
    assert int(a.n) == int(b.n)
    assert len(pa) == len(pb)
    from scipy.spatial import cKDTree

    d, j = cKDTree(pb).query(pa, k=1)
    assert (np.sort(j) == np.arange(len(pb))).all(), "position match not a bijection"
    np.testing.assert_allclose(pa, pb[j], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a.density)[np.asarray(a.alive)],
        np.asarray(b.density)[np.asarray(b.alive)][j], rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(a.velocity)[np.asarray(a.alive)],
        np.asarray(b.velocity)[np.asarray(b.alive)][j], atol=2e-4,
    )


def test_backend_differential_uniform_hybrid():
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_backends(params, _dam_scene(), steps=5, capacity=1024)


def test_backend_differential_uniform_iisph():
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.IISPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_backends(params, _dam_scene(), steps=4, capacity=1024)


def test_backend_differential_cross_level():
    params = SimulationParams(
        merging=False, sharing=False, splitting=False, max_iters=60,
        hybrid_dfsph_max_avg_density_error=0.001,
        hybrid_dfsph_max_avg_divergence_error=0.0001,
        hybrid_dfsph_factor=1000000.0, cfl_factor=0.3, max_dt=0.003,
    )
    _diff_backends(params, _dam_scene(spacing2=0.05), steps=3)


@pytest.mark.slow
def test_backend_differential_levels_adaptive():
    # adaptive sizes with level estimation (EmptyAngle), no resampling
    params = SimulationParams(
        particle_sizes=ParticleSizes.Adaptive,
        level_estimation_method=LevelEstimationMethod.EmptyAngle,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_backends(params, _dam_scene(spacing2=0.08), steps=3)


def test_backend_differential_warm_start():
    # warm-start extension: tiles and grid must agree with each other when it is
    # on, and each solve must still satisfy the configured tolerance
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=60,
        warm_start_pressure=True,
    )
    _diff_backends(params, _dam_scene(), steps=5, capacity=1024)


@pytest.mark.slow
def test_warm_start_converges_with_fewer_iterations():
    # same scene, warm vs cold: tolerance respected both ways and the warm run
    # needs no more total iterations than the cold one after a few steps
    import jax
    base = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=120,
    )
    totals = {}
    for warm in (False, True):
        sim = create_simulation(
            base.replace(warm_start_pressure=warm), _dam_scene(), capacity=1024,
            backend="tiles",
        )
        tol = sim.params.hybrid_dfsph_max_avg_density_error * sim.params.rest_density
        iters = 0
        for _ in range(8):
            d = sim.step()
            iters += int(d["div_iterations"]) + int(d["density_iterations"])
            err = float(d["density_avg_error"])
            # NaN = zero normal (unclamped, non-singular) particles -> trivially
            # converged (reference averages over normal particles only)
            assert not err == err or abs(err) < tol
        totals[warm] = iters
    assert totals[True] <= totals[False]


def test_backend_differential_momentum():
    # heavy-ball Jacobi extension (params.jacobi_momentum): tiles and grid must
    # agree with each other when it is on, and each solve must still satisfy
    # the configured avg-error tolerance (the exit test is unchanged)
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=120,
        jacobi_momentum=0.7,
    )
    _diff_backends(params, _dam_scene(), steps=5, capacity=1024)


@pytest.mark.slow
def test_momentum_converges_within_tolerance_fewer_iterations():
    # momentum=0.7 vs the reference schedule on the same dam scene: every solve
    # exits within tolerance both ways (contract unchanged) and the accelerated
    # run needs no more total Jacobi iterations
    base = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=200,
    )
    totals = {}
    for beta in (0.0, 0.7):
        sim = create_simulation(
            base.replace(jacobi_momentum=beta), _dam_scene(), capacity=1024,
            backend="tiles",
        )
        tol = sim.params.hybrid_dfsph_max_avg_density_error * sim.params.rest_density
        tol_div = sim.params.hybrid_dfsph_max_avg_divergence_error
        iters = 0
        for _ in range(8):
            d = sim.step()
            iters += int(d["div_iterations"]) + int(d["density_iterations"])
            err = float(d["density_avg_error"])
            assert not err == err or abs(err) < tol
            derr = float(d["div_avg_error"]) * float(d["dt"])
            assert not derr == derr or abs(derr) < tol_div
        totals[beta] = iters
    assert totals[0.7] <= totals[0.0]


def _diff_vs_lists(params, scene, steps, capacity=None, check_levels=False):
    """Tile backend vs the neighbor-list reference backend, matched by position."""
    from scipy.spatial import cKDTree

    out = {}
    for backend in ("tiles", "lists"):
        sim = create_simulation(params, scene, capacity=capacity, backend=backend)
        assert (sim.tile_cfg is not None) == (backend == "tiles"), backend
        for _ in range(steps):
            sim.step()
        out[backend] = sim.state
    a, b = out["tiles"], out["lists"]
    aa, ba = np.asarray(a.alive), np.asarray(b.alive)
    pa = np.asarray(a.position)[aa]
    pb = np.asarray(b.position)[ba]
    assert len(pa) == len(pb)
    d, j = cKDTree(pb).query(pa, k=1)
    assert (np.sort(j) == np.arange(len(pb))).all()
    np.testing.assert_allclose(pa, pb[j], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a.density)[aa], np.asarray(b.density)[ba][j], rtol=2e-5
    )
    if check_levels:
        np.testing.assert_array_equal(
            np.asarray(a.flag_is_fluid_surface)[aa],
            np.asarray(b.flag_is_fluid_surface)[ba][j],
        )
        la = np.asarray(a.level)[aa]
        lb = np.asarray(b.level)[ba][j]
        np.testing.assert_allclose(la, lb, atol=5e-4)


def test_tile_check_aii_runs_on_tile_backend():
    # check_aii no longer gates out the tile engine: the brute-force a_ii
    # verification runs as one extra SweepOp and the deviation guard holds
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=60,
        check_aii=True,
    )
    sim = create_simulation(params, _dam_scene(), capacity=1024, backend="auto")
    assert sim.backend == "tiles" and sim.tile_cfg is not None
    for _ in range(3):
        d = sim.step()  # raises SimulationFailed if deviation >= 0.01
        assert float(d["aii_deviation"]) < 0.01


def test_tile_post_advection_empty_angle_matches_lists():
    # post-advection level estimation rebuilds the tile layout at the advected
    # positions (simulation.rs:2678-2707) instead of falling back to lists
    params = SimulationParams(
        particle_sizes=ParticleSizes.Adaptive,
        level_estimation_method=LevelEstimationMethod.EmptyAngle,
        level_estimation_after_advection=True,
        force_level_estimation=True,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_vs_lists(params, _dam_scene(spacing2=0.08), steps=3, check_levels=True)


def test_tile_post_advection_centerdiff_matches_lists():
    params = SimulationParams(
        particle_sizes=ParticleSizes.Adaptive,
        level_estimation_method=LevelEstimationMethod.CenterDiff,
        level_estimation_after_advection=True,
        force_level_estimation=True,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_vs_lists(params, _dam_scene(spacing2=0.08), steps=3, check_levels=True)


@pytest.mark.slow
def test_tile_neighborhood_constraint_exact_vs_bruteforce():
    """constrain_neighborhood_count on the tile engine: the bisection-selected
    k-th-largest fringe equals a brute-force all-neighbor sort (the reference's
    per-particle semantics, simulation.rs:2145-2177) — including at the 50:1
    interface where the list backend's forward-row approximation is inexact."""
    from scipy.spatial import cKDTree

    from adaptive_sph_tpu.ops import kernels
    from adaptive_sph_tpu.models.state import h_from_mass_np

    params = SimulationParams(
        particle_sizes=ParticleSizes.Adaptive,
        constrain_neighborhood_count=True,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    scene = _dam_scene(spacing2=0.03)  # 2:1 spacing -> mixed-level interface
    sim = create_simulation(params, scene, backend="auto")
    assert sim.backend == "tiles", "constraint must run on the tile engine now"

    st0 = sim.state
    alive = np.asarray(st0.alive)
    pos = np.asarray(st0.position)[alive]
    h0 = h_from_mass_np(np.asarray(st0.mass)[alive], params.rest_density, 2)
    srbs = float(kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH)

    # brute-force oracle on the initial state (the constraint runs before
    # advection, so entry positions/h are what it sees)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    hij = 0.5 * (h0[:, None] + h0[None, :])
    nbmask = d2 < (srbs * hij) ** 2
    target = int(kernels.optimal_neighbor_number(2)) + 5
    counts = nbmask.sum(1)
    want_h = h0.copy()
    want_need = counts > target
    r = np.sqrt(d2)
    for i in np.where(want_need)[0]:
        fr = np.sort(2.0 * r[i, nbmask[i]] - srbs * h0[nbmask[i]])[::-1]
        want_h[i] = max(fr[counts[i] - target], 0.0)

    d = sim.step()
    st1 = sim.state
    a1 = np.asarray(st1.alive)
    p1 = np.asarray(st1.position)[a1]
    # match emitted (sorted-order) particles back to entry order by where they
    # started: pos_prev... positions advect within the step, so match h via
    # the constrained-h-is-entry-h relation instead: re-run ONE step on a
    # zero-velocity, zero-gravity copy so positions stay put
    params2 = params.replace(gravity=0.0, max_dt=1e-6)
    sim2 = create_simulation(params2, scene, backend="tiles")
    sim2.step()
    st2 = sim2.state
    a2 = np.asarray(st2.alive)
    p2 = np.asarray(st2.position)[a2]
    dd, j = cKDTree(p2).query(pos, k=1)
    assert dd.max() < 1e-4
    got_h = np.asarray(st2.h)[a2][j]
    got_flag = np.asarray(st2.flag_neighborhood_reduced)[a2][j]
    np.testing.assert_array_equal(got_flag, want_need)
    np.testing.assert_allclose(got_h, want_h, rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_weight_cache_bf16_converges():
    # opt-in bf16 weight-block storage: every solve still reaches its avg-error
    # tolerance (against the rounded operator) and the trajectory stays close
    # to the f32 run over a few steps
    from scipy.spatial import cKDTree

    base = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=120,
    )
    out = {}
    for bf16 in (False, True):
        sim = create_simulation(
            base.replace(weight_cache_bf16=bf16), _dam_scene(), capacity=1024,
            backend="tiles",
        )
        tol = sim.params.hybrid_dfsph_max_avg_density_error * sim.params.rest_density
        for _ in range(4):
            d = sim.step()
            err = float(d["density_avg_error"])
            assert not err == err or abs(err) < tol
        out[bf16] = sim.state
    a, b = out[False], out[True]
    pa = np.asarray(a.position)[np.asarray(a.alive)]
    pb = np.asarray(b.position)[np.asarray(b.alive)]
    d, j = cKDTree(pb).query(pa, k=1)
    assert (np.sort(j) == np.arange(len(pb))).all()
    np.testing.assert_allclose(pa, pb[j], atol=2e-3)


def test_backend_differential_uniform_iisph2():
    # covers the sorted-column reads IISPH2 uses (omega, size_class)
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.IISPH2,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_backends(params, _dam_scene(), steps=4, capacity=1024)


@pytest.mark.parametrize("C,tq", [
    (256, 16), (256, 64), (256, 128),
    (512, 16), (512, 64), (512, 128),
    (1024, 16), (1024, 64), (1024, 128),
])
def test_matvec_small_shapes_vs_dense(C, tq):
    """Builder + all three block-stream kernels at small (capacity, tq) shapes,
    including NT = capacity/tq < 8 (capacity 512 @ tq=128 -> NT=4 was an
    out-of-bounds 8-sublane store in round 4) — the capacity-growth path of the
    reference's Vec::extend (splitting.rs:56-58) starts exactly here."""
    from adaptive_sph_tpu.ops.pallas_matvec import (
        _gmag, _w_and_gmag, build_weight_cache_prep, scalar_blocks_supported,
        visc_matvec, weight_matvec,
    )
    from adaptive_sph_tpu.ops.tiles import to_chunks

    n_fine = {256: 80, 512: 160, 1024: 300}[C]
    pos, h, mass, alive = _two_level_cloud(C=C, n_fine=n_fine, n_coarse=3,
                                           seed=13 + C + tq)
    cfg = _cfg(C, tq=tq)
    bins = build_tiles(pos, h * 2.0, h, alive, cfg)
    assert int(bins.overflow) == 0
    st = sort_fields(bins, [pos, h, mass])
    rng = np.random.default_rng(17)
    vel = jnp.asarray(rng.normal(0, 0.4, (C, 2)).astype(np.float32))
    scale, visc = 2.0, 0.02

    # tq=128 rows exercise the v7 scalar-g block format (the production
    # default); smaller tq exercise the legacy [wx|wy] half-window format
    if scalar_blocks_supported(tq):
        kw = dict(statics=st, sq=jnp.swapaxes(to_chunks(st, tq), 1, 2))
    else:
        kw = {}
    outs = build_weight_cache_prep(
        cfg, bins, st, vel, scale, cfg.b_max, "laplace", visc,
        wdtype=jnp.float32, want_s2=False, fuse_density=True, visc_stream=True,
    )
    wcache, vcache, meta, cnt, prep = outs
    assert int(cnt[1]) == 0, "weight-cache overflow in a small-shape test"
    assert (wcache.shape[1] == 128) == scalar_blocks_supported(tq)

    # dense brute-force pair weights (query i rows, candidate j cols)
    x, y, hh, m = st[:, 0], st[:, 1], st[:, 2], st[:, 3]
    h_ij = jnp.maximum(0.5 * (hh[:, None] + hh[None, :]), 1e-6)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    r2 = dx * dx + dy * dy
    rad = scale * h_ij
    valid = (r2 < rad * rad) & (hh[None, :] > 0) & (hh[:, None] > 0)
    w_val, gmag = _w_and_gmag(r2, h_ij)
    del gmag
    g = jnp.where(valid, m[None, :] * _gmag(r2, h_ij), 0.0)
    wx, wy = g * dx, g * dy
    live = np.asarray(hh) > 0

    def check(got, want, name):
        got = np.asarray(got)[live]
        want = np.asarray(want)[live]
        s = np.max(np.abs(want)) + 1e-6
        assert np.max(np.abs(got - want)) / s < 1e-5, (name, C, tq)

    # fused density row (prep row 3) = sum_j m_j W_ij
    den = jnp.sum(jnp.where(valid, m[None, :] * w_val, 0.0), axis=1)
    check(prep[:, 3, :].reshape(C), den, "density")

    # accel mode: out = (sum_j wx u_j, sum_j wy u_j)
    u = jnp.asarray(rng.uniform(0, 10, C).astype(np.float32))
    mvx, mvy = weight_matvec(wcache, meta, cnt, u[:, None], tq, k_out=2, **kw)
    check(mvx, wx @ u, "accel_x")
    check(mvy, wy @ u, "accel_y")

    # div mode (channel-split operands): out = sum_j (wx tx_j + wy ty_j)
    tx = jnp.asarray(rng.normal(0, 1, C).astype(np.float32))
    ty = jnp.asarray(rng.normal(0, 1, C).astype(np.float32))
    s = weight_matvec(wcache, meta, cnt, (tx, ty), tq, k_out=1, **kw)
    check(s, wx @ tx + wy @ ty, "div")

    # visc stream: deferred 1/(rho_i+rho_j) ApproxLaplace pair sum
    rho = jnp.asarray(rng.uniform(0.8, 1.2, C).astype(np.float32))
    vx, vy = visc_matvec(vcache, meta, cnt, rho, tq, **kw)
    dvx = vel[:, 0][:, None] - vel[:, 0][None, :]
    dvy = vel[:, 1][:, None] - vel[:, 1][None, :]
    dot = dx * dvx + dy * dvy
    coef = (visc * 8.0 * dot / (r2 + 0.01 * h_ij * h_ij)
            / jnp.maximum((rho[:, None] + rho[None, :]) * 0.5, 1e-30))
    coef = jnp.where((dot < 0.0) & valid, coef, 0.0)
    check(vx, jnp.sum(coef * wx, axis=1), "visc_x")
    check(vy, jnp.sum(coef * wy, axis=1), "visc_y")
