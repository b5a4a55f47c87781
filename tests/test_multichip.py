"""Multi-chip sharded step: runs on the 8-device virtual CPU mesh (conftest).

Checks that the particle-sharded GSPMD step (parallel/sharding.py) executes and agrees
numerically with the single-device step.
"""

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

    alive = np.asarray(single.alive)
    np.testing.assert_allclose(
        np.asarray(single.position)[alive], np.asarray(sharded.position)[alive],
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(single.density)[alive], np.asarray(sharded.density)[alive],
        rtol=1e-4, atol=1e-6,
    )
