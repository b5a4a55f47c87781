"""End-to-end adaptive resampling: split/merge/share in the full step pipeline.

Mirrors the resampling-gravity-free scenario family (media/resampling-gravity-free.yaml):
gravity-free block, AnalyticUnderestimate boundary, HybridDFSPH factor 0, sizing from
the surface-distance field. Gates: mass conservation within the reference's 0.005
assert (simulation.rs:2791-2792), resampling actually changes the census, finite state,
no neighbor-structure overflow.
"""

import numpy as np
import pytest

from adaptive_sph_tpu.models import scene as scene_mod
from adaptive_sph_tpu.runner import create_simulation
from adaptive_sph_tpu.utils.params import (
    InitBoundaryHandlerType,
    LevelEstimationMethod,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
    SizingFunction,
)
from adaptive_sph_tpu.utils.split_patterns import to_padded_table


def tiny_patterns(maxc=16):
    pats = []
    for n in range(2, maxc + 1):
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pos = 0.55 * np.stack([np.cos(ang), np.sin(ang)], -1)
        pats.append({"mass_s": [np.pi / n] * n, "pos_s": pos.tolist(), "h_s": [1.0] * n})
    return to_padded_table(pats)


SCENE = scene_mod.scene_from_dict(
    {
        "boundary": {"type": "box", "width": 1.0, "height": 1.0},
        "blocks": [
            {
                "pos": [-0.24, -0.24],
                "size": [0.5, 0.5],
                "spacing": 0.06,
                "volume_fill_ratio": 0.93,
                "velocity": [0, 0],
            }
        ],
    }
)

PARAMS = SimulationParams(
    particle_sizes=ParticleSizes.Adaptive,
    pressure_solver_method=PressureSolverMethod.HybridDFSPH,
    init_boundary_handler=InitBoundaryHandlerType.AnalyticUnderestimate,
    level_estimation_method=LevelEstimationMethod.EmptyAngle,
    gravity=0.0,
    hybrid_dfsph_factor=0.0,
    sizing_function=SizingFunction.Radius,
    particle_radius_fine=0.012,
    particle_radius_base=0.04,
    maximum_surface_distance=0.2,
    max_dt=0.002,
    max_iters=100,
    merging=True,
    sharing=True,
    splitting=True,
)


pytestmark = pytest.mark.slow  # one ~108s shared sim fixture feeds every test here

@pytest.fixture(scope="module")
def sim_run():
    sim = create_simulation(PARAMS, SCENE, capacity=2048, split_patterns=tiny_patterns())
    n0 = sim.num_fluid_particles
    m0 = float(np.asarray(sim.state.mass)[np.asarray(sim.state.alive)].sum())
    diags = [sim.step() for _ in range(6)]
    return sim, n0, m0, diags


def test_mass_conserved(sim_run):
    sim, n0, m0, diags = sim_run
    m1 = float(np.asarray(sim.state.mass)[np.asarray(sim.state.alive)].sum())
    assert abs(m0 - m1) < 0.005  # reference assert tolerance
    for d in diags:
        assert float(d["mass_conservation_error"]) < 0.005


def test_resampling_changes_census(sim_run):
    sim, n0, m0, diags = sim_run
    # surface particles are TooLarge vs the fine target -> splits must fire
    assert sim.num_fluid_particles != n0


def test_state_finite_and_inside(sim_run):
    sim, n0, m0, diags = sim_run
    alive = np.asarray(sim.state.alive)
    pos = np.asarray(sim.state.position)[alive]
    vel = np.asarray(sim.state.velocity)[alive]
    h = np.asarray(sim.state.h)[alive]
    assert np.all(np.isfinite(pos)) and np.all(np.isfinite(vel))
    assert np.all(np.abs(pos) < 0.6)
    assert np.all(h > 0)
    assert int(sim.state.n) == alive.sum()


def test_no_overflow(sim_run):
    sim, n0, m0, diags = sim_run
    for d in diags:
        ro, co, lo = (int(x) for x in d["neighbor_overflow"])
        assert ro == 0 and co == 0 and lo == 0


def test_class_distribution_sane(sim_run):
    """After a few resampling steps most particles should sit near their target size."""
    from adaptive_sph_tpu.models import adaptivity as ad
    from adaptive_sph_tpu.models.state import SIZE_OPTIMAL, SIZE_TOO_LARGE

    sim, n0, m0, diags = sim_run
    cls = np.asarray(ad.classify(sim.state, sim.params))
    alive = np.asarray(sim.state.alive)
    frac_too_large = (cls[alive] == SIZE_TOO_LARGE).mean()
    assert frac_too_large < 0.5  # splitting is actually reducing oversize particles
