"""Multi-chip sharded step: runs on the 8-device virtual CPU mesh (conftest).

Checks that the particle-sharded GSPMD step (parallel/sharding.py) executes and agrees
numerically with the single-device step.
"""

import os

import jax
import numpy as np
import pytest

from adaptive_sph_tpu.models import scene as scene_mod
from adaptive_sph_tpu.parallel.sharding import make_mesh, make_sharded_step_fn, shard_state
from adaptive_sph_tpu.runner import create_simulation
from adaptive_sph_tpu.utils.params import (
    InitBoundaryHandlerType,
    LevelEstimationMethod,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
)

SCENE = scene_mod.scene_from_dict(
    {
        "boundary": {"type": "box", "width": 1.0, "height": 1.0},
        "blocks": [
            {
                "pos": [-0.4, -0.4],
                "size": [0.5, 0.5],
                "spacing": 0.05,
                "volume_fill_ratio": 0.93,
                "velocity": [0, 0],
            }
        ],
    }
)

PARAMS = SimulationParams(
    particle_sizes=ParticleSizes.Uniform,
    pressure_solver_method=PressureSolverMethod.IISPH,
    init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
    level_estimation_method=LevelEstimationMethod.NoneMethod,
    merging=False,
    sharing=False,
    splitting=False,
    max_iters=50,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_sharded_step_matches_single_device():
    sim = create_simulation(PARAMS, SCENE, capacity=1024)
    single, _ = sim.step_fn(sim.state)

    mesh = make_mesh(8)
    sharded_in = shard_state(sim.state, mesh)
    step = make_sharded_step_fn(sim.params, sim.ncfg, sim.boundary_handler, mesh)
    sharded, _ = jax.block_until_ready(step(sharded_in))

    # the single-device tile step emits sorted-layout order while the GSPMD
    # list step keeps input order — match particles by position (unambiguous:
    # lattice spacing >> tolerance)
    from scipy.spatial import cKDTree

    pa = np.asarray(single.position)[np.asarray(single.alive)]
    pb = np.asarray(sharded.position)[np.asarray(sharded.alive)]
    assert len(pa) == len(pb)
    d, j = cKDTree(pb).query(pa, k=1)
    assert (np.sort(j) == np.arange(len(pb))).all()
    np.testing.assert_allclose(pa, pb[j], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(single.density)[np.asarray(single.alive)],
        np.asarray(sharded.density)[np.asarray(sharded.alive)][j],
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
@pytest.mark.parametrize("ndev", [2, 8])
def test_slab_sharded_tile_backend_matches_single_device(ndev):
    """Production (sorted-tile) backend over the slab-decomposed mesh: multi-step
    parity incl. migration/adoption across slab boundaries (parallel/tile_sharding)."""
    from jax.sharding import Mesh

    from adaptive_sph_tpu.parallel import tile_sharding as ts
    from adaptive_sph_tpu.runner import grid_config_for

    # slabs must be at least one interaction radius wide (enforced by
    # make_slab_config), so the 8-device case needs a wide fluid block
    scene = scene_mod.scene_from_dict(
        {
            "boundary": {"type": "box", "width": 2.0, "height": 2.0},
            "blocks": [
                {"pos": [-0.95, -0.5], "size": [1.2, 0.6], "spacing": 0.03,
                 "volume_fill_ratio": 0.93, "velocity": [0, 0]},
            ],
        }
    )
    params = PARAMS.replace(
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        warm_start_pressure=True,
    )
    sim = create_simulation(params, scene, capacity=2048, backend="tiles")
    gcfg = grid_config_for(sim.params, scene, sim.state, sim.state.capacity)
    steps = 6
    for _ in range(steps):
        sim.step()
    ref = ts.gather_alive(sim.state)

    sim2 = create_simulation(params, scene, capacity=2048, backend="tiles")
    scfg = ts.make_slab_config(sim2.params, gcfg, sim2.state, ndev, tq=16)
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("p",))
    sst = ts.shard_spatially(sim2.state, scfg, mesh)
    step = ts.make_slab_step_fn(sim2.params, scfg, sim2.boundary_handler, mesh)
    for _ in range(steps):
        sst, diag = step(sst)
    sst = jax.block_until_ready(sst)
    assert int(diag["shard_overflow"]) == 0
    got = ts.gather_alive(sst)
    assert got["position"].shape == ref["position"].shape
    np.testing.assert_allclose(got["position"], ref["position"], atol=5e-5)
    np.testing.assert_allclose(got["velocity"], ref["velocity"], atol=5e-4)
    np.testing.assert_allclose(got["density"], ref["density"], rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_slab_simulation_reshard_preserves_trajectory():
    """SlabSimulation dynamic rebalancing: resharding mid-run (new quantile
    edges + capacities + recompiled step) is semantically a no-op — the
    multi-step trajectory matches the single-device run exactly."""
    from jax.sharding import Mesh

    from adaptive_sph_tpu.parallel import tile_sharding as ts
    from adaptive_sph_tpu.runner import grid_config_for

    scene = scene_mod.scene_from_dict(
        {
            "boundary": {"type": "box", "width": 2.0, "height": 2.0},
            "blocks": [
                {"pos": [-0.95, -0.5], "size": [1.2, 0.6], "spacing": 0.03,
                 "volume_fill_ratio": 0.93, "velocity": [0, 0]},
            ],
        }
    )
    params = PARAMS.replace(
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        warm_start_pressure=True,
    )
    sim = create_simulation(params, scene, capacity=2048, backend="tiles")
    gcfg = grid_config_for(sim.params, scene, sim.state, sim.state.capacity)
    steps = 6
    for _ in range(steps):
        sim.step()
    ref = ts.gather_alive(sim.state)

    sim2 = create_simulation(params, scene, capacity=2048, backend="tiles")
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("p",))
    ssim = ts.SlabSimulation(sim2.params, gcfg, sim2.boundary_handler, sim2.state,
                             mesh, tq=16)
    for k in range(steps):
        if k == 3:
            ssim.reshard()  # forced mid-run rebalance
        ssim.step()
    assert ssim.n_reshards >= 1
    got = ts.gather_alive(ssim.sst)
    assert got["position"].shape == ref["position"].shape
    np.testing.assert_allclose(got["position"], ref["position"], atol=5e-5)
    np.testing.assert_allclose(got["density"], ref["density"], rtol=1e-4)


@pytest.mark.skipif(os.environ.get("ASPH_LONG_E2E") != "1",
                    reason="set ASPH_LONG_E2E=1 (long)")
def test_slab_dam_break_long_horizon_with_rebalancing():
    """VERDICT r2 item 6 done-criterion: a dam-break slab run to t >= 1.0 s on
    the 8-device mesh without overflow failure (resharding as needed)."""
    from jax.sharding import Mesh

    from adaptive_sph_tpu.parallel import tile_sharding as ts
    from adaptive_sph_tpu.runner import grid_config_for

    # single-spacing dam column (the reference default-scene mixes 0.03/0.06
    # spacings for its ADAPTIVE config; under Uniform sizes the coarse block
    # would be under-resolved at the fine h and blow up on any backend)
    scene = scene_mod.scene_from_dict(
        {
            "boundary": {"type": "box", "width": 2, "height": 2},
            "blocks": [
                {"pos": [0.4, -0.5], "size": [0.55, 1.4], "spacing": 0.03,
                 "volume_fill_ratio": 0.93, "velocity": [0, 0]},
            ],
        }
    )
    params = PARAMS.replace(
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        warm_start_pressure=True, max_dt=0.006,
    )
    sim = create_simulation(params, scene, backend="tiles")
    gcfg = grid_config_for(sim.params, scene, sim.state, sim.state.capacity)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("p",))
    mass0 = float(np.sum(np.asarray(sim.state.mass)[np.asarray(sim.state.alive)]))
    ssim = ts.SlabSimulation(sim.params, gcfg, sim.boundary_handler, sim.state,
                             mesh, tq=16)
    steps = ssim.run_until(1.0, max_steps=900)
    assert ssim.time >= 1.0, f"only reached t={ssim.time} in {steps} steps"
    alive = np.asarray(ssim.sst.alive)
    mass1 = float(np.sum(np.asarray(ssim.sst.mass)[alive]))
    assert abs(mass1 - mass0) / mass0 < 1e-4


_ADAPT_SCENE = scene_mod.scene_from_dict(
    {
        "boundary": {"type": "box", "width": 2.0, "height": 2.0},
        "blocks": [
            {"pos": [-0.95, -0.5], "size": [1.2, 0.6], "spacing": 0.03,
             "volume_fill_ratio": 0.93, "velocity": [0, 0]},
        ],
    }
)

_ADAPT_PARAMS = SimulationParams(
    particle_sizes=ParticleSizes.Adaptive,
    pressure_solver_method=PressureSolverMethod.HybridDFSPH,
    init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
    level_estimation_method=LevelEstimationMethod.EmptyAngle,
    merging=True, sharing=True, splitting=True,
    particle_radius_base=0.03, particle_radius_fine=0.008,
    maximum_surface_distance=0.25,
    warm_start_pressure=True, max_iters=50,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
@pytest.mark.slow
def test_slab_sharded_level_estimation_matches_single_device():
    """EmptyAngle surface detection + wavefront + smoothing over the slab mesh
    (ghost refreshes + psum'd fixpoint) is EXACTLY the single-device field."""
    from jax.sharding import Mesh

    from adaptive_sph_tpu.parallel import tile_sharding as ts
    from adaptive_sph_tpu.runner import grid_config_for

    params = _ADAPT_PARAMS.replace(
        merging=False, sharing=False, splitting=False, force_level_estimation=True
    )
    sim = create_simulation(params, _ADAPT_SCENE, capacity=2048, backend="tiles")
    gcfg = grid_config_for(sim.params, _ADAPT_SCENE, sim.state, sim.state.capacity)
    for _ in range(4):
        sim.step()

    def sorted_levels(state):
        al = np.asarray(state.alive)
        pos = np.asarray(state.position)[al]
        lvl = np.asarray(state.level)[al]
        o = np.lexsort((pos[:, 1], pos[:, 0]))
        return pos[o], lvl[o]

    ref_pos, ref_lvl = sorted_levels(sim.state)

    sim2 = create_simulation(params, _ADAPT_SCENE, capacity=2048, backend="tiles")
    scfg = ts.make_slab_config(sim2.params, gcfg, sim2.state, 2, tq=16)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("p",))
    sst = ts.shard_spatially(sim2.state, scfg, mesh)
    step = ts.make_slab_step_fn(sim2.params, scfg, sim2.boundary_handler, mesh)
    for _ in range(4):
        sst, _ = step(sst)
    got_pos, got_lvl = sorted_levels(jax.block_until_ready(sst))
    np.testing.assert_allclose(got_pos, ref_pos, atol=1e-6)
    np.testing.assert_allclose(got_lvl, ref_lvl, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_slab_sharded_adaptive_resampling(ndev):
    """Adaptivity (share/merge/split) on the slab-sharded production path.

    Matching is slab-local (cross-boundary pairs match inward) and partner
    priority is order-dependent even between two single-device runs, so after
    splitting leaves children at knife-edge mrel thresholds the class
    trajectories diverge chaotically. The run is therefore validated by its
    INVARIANTS against the single-device tile run, as SURVEY.md section 7
    prescribes: exact global mass conservation, particle census in a band,
    the TooLarge class driven to ~zero, and a non-degenerate class mix.
    """
    from jax.sharding import Mesh

    from adaptive_sph_tpu.models.adaptivity import classify
    from adaptive_sph_tpu.parallel import tile_sharding as ts
    from adaptive_sph_tpu.runner import grid_config_for

    params = _ADAPT_PARAMS
    steps = 6

    def hist(state):
        cls = np.asarray(classify(state, params))[np.asarray(state.alive)]
        return np.bincount(cls, minlength=5) / max(len(cls), 1)

    # capacity 4096 keeps the single run un-throttled (max_splits scales with
    # capacity) so both runs resample freely
    sim = create_simulation(params, _ADAPT_SCENE, capacity=4096, backend="tiles")
    gcfg = grid_config_for(sim.params, _ADAPT_SCENE, sim.state, sim.state.capacity)
    mass0 = float(np.sum(np.asarray(sim.state.mass)[np.asarray(sim.state.alive)]))
    for _ in range(steps):
        sim.step()
    n_single = int(np.sum(np.asarray(sim.state.alive)))
    hist_single = hist(sim.state)

    sim2 = create_simulation(params, _ADAPT_SCENE, capacity=4096, backend="tiles")
    scfg = ts.make_slab_config(sim2.params, gcfg, sim2.state, ndev, tq=16)
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("p",))
    sst = ts.shard_spatially(sim2.state, scfg, mesh)
    step = ts.make_slab_step_fn(sim2.params, scfg, sim2.boundary_handler, mesh,
                                split_patterns=sim2.split_patterns)
    events = 0
    for _ in range(steps):
        sst, diag = step(sst)
        assert int(diag["shard_overflow"]) == 0
        assert float(diag["mass_conservation_error"]) < 1e-5
        events += int(diag.get("merge_or_split_count", 0)) + int(diag.get("shares", 0))
    sst = jax.block_until_ready(sst)
    assert events > 0, "no resampling events — test is vacuous"

    alive = np.asarray(sst.alive)
    mass1 = float(np.sum(np.asarray(sst.mass)[alive]))
    assert abs(mass1 - mass0) / mass0 < 1e-5
    n_slab = int(alive.sum())
    assert abs(n_slab - n_single) / n_single < 0.15
    h_slab, h_single = hist(sst), hist_single
    assert h_slab[4] < 0.02 and h_single[4] < 0.02  # TooLarge split away
    assert np.abs(h_slab - h_single).sum() < 0.8  # same qualitative mix
    assert h_slab[2] > 0.2  # a solid optimal-class core exists
