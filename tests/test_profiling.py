"""profile_stages: reference per-stage sections emitted into the .stat dump.

The reference instruments simulation-step / neighborhood / div-solver /
density-solver / level-estimation / adaptivity sections (simulation.rs:1993-2069,
write_statistics 3279-3359). On TPU these are post-run knockout/piecewise
differentials (utils/profiling.py) — this test checks the plumbing on a tiny
scene: sections exist, are finite, and land in the .stat text.
"""

import os

import numpy as np
import pytest

from adaptive_sph_tpu.models import scene as scene_mod
from adaptive_sph_tpu.runner import create_simulation
from adaptive_sph_tpu.utils import stats as stats_mod
from adaptive_sph_tpu.utils.params import (
    InitBoundaryHandlerType,
    LevelEstimationMethod,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
)
from adaptive_sph_tpu.utils.profiling import profile_sections

SCENE = scene_mod.scene_from_dict(
    {
        "boundary": {"type": "box", "width": 1.0, "height": 1.0},
        "blocks": [
            {
                "pos": [-0.4, -0.4],
                "size": [0.45, 0.45],
                "spacing": 0.06,
                "volume_fill_ratio": 0.93,
                "velocity": [0, 0],
            }
        ],
    }
)


def _params(**kw):
    base = dict(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        level_estimation_method=LevelEstimationMethod.NoneMethod,
        merging=False,
        sharing=False,
        splitting=False,
        max_iters=60,
        profile_stages=True,
    )
    base.update(kw)
    return SimulationParams(**base)


def test_profile_sections_list_backend_plumbing():
    """Fast path: non-tile backends report simulation-step only, and it lands
    in the Counters/.stat text (the knockout variants are tile-engine-only)."""
    sim = create_simulation(_params(), SCENE, backend="lists")
    sim.step()
    sections = profile_sections(sim, iters=2)
    assert set(sections) == {"simulation-step(profiled)"}
    v = sections["simulation-step(profiled)"]
    assert np.isfinite(v) and v >= 0.0
    assert "simulation-step(profiled)" in stats_mod.write_statistics(sim.counters)


@pytest.mark.skipif(os.environ.get("ASPH_LONG_E2E") != "1",
                    reason="set ASPH_LONG_E2E=1 (~8 min of step-variant compiles)")
def test_profile_sections_uniform_hybrid():
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        level_estimation_method=LevelEstimationMethod.NoneMethod,
        merging=False,
        sharing=False,
        splitting=False,
        max_iters=60,
        profile_stages=True,
    )
    sim = create_simulation(params, SCENE, backend="tiles")
    for _ in range(3):
        sim.step()

    sections = profile_sections(sim, iters=3)
    assert "simulation-step(profiled)" in sections
    # tiles backend: structure-build piecewise + both Hybrid solves
    assert "neighborhood" in sections
    assert "div-solver" in sections and "density-solver" in sections
    assert "level-estimation" not in sections  # levels off in this config
    assert "adaptivity" not in sections  # resampling off
    for name, v in sections.items():
        assert np.isfinite(v) and v >= 0.0, (name, v)

    text = stats_mod.write_statistics(sim.counters)
    for name in ("neighborhood", "div-solver", "density-solver"):
        assert name in text
