"""End-to-end uniform dam break: the M1 slice.

Scene/config mirror default-scene.yaml + default-config.yaml with uniform sizes;
gates: the sim runs, densities stay physical, the IISPH solver hits its
iisph_max_avg_density_error = 0.2% tolerance (BASELINE.md quality target), mass is
constant, particles stay inside the box.
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
)

SCENE = scene_mod.scene_from_dict(
    {
        "boundary": {"type": "box", "width": 1.0, "height": 1.0},
        "blocks": [
            {
                "pos": [-0.45, -0.45],
                "size": [0.5, 0.7],
                "spacing": 0.05,
                "volume_fill_ratio": 0.93,
                "velocity": [0, 0],
            }
        ],
    }
)


def make_params(**kw):
    base = dict(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.IISPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        level_estimation_method=LevelEstimationMethod.NoneMethod,
        merging=False,
        sharing=False,
        splitting=False,
        max_iters=200,
        iisph_max_avg_density_error=0.002,
    )
    base.update(kw)
    return SimulationParams(**base)


def run_steps(params, n_steps, scene=SCENE):
    sim = create_simulation(params, scene, capacity=1024)
    diags = []
    for _ in range(n_steps):
        diags.append(sim.step())
    return sim, diags


@pytest.mark.slow
def test_iisph_dam_break_runs_and_converges():
    sim, diags = run_steps(make_params(), 12)
    alive = np.asarray(sim.state.alive)

    # density near rest density for interior particles, no explosion
    rho = np.asarray(sim.state.density)[alive]
    assert np.all(np.isfinite(rho))
    assert rho.max() < 1.3 and rho.min() > 0.3

    # IISPH tolerance met on the last step (avg density error <= 0.2% of rho0);
    # NaN avg = zero normal particles = trivially converged (simulation.rs:1453-1460)
    last = diags[-1]
    avg = float(last["density_avg_error"])
    assert (avg != avg and int(last["solver_stats"][0]) == 0) or abs(avg) <= 0.002 + 1e-6
    assert int(last["density_iterations"]) >= 2

    # particles inside the box
    pos = np.asarray(sim.state.position)[alive]
    assert np.all(np.abs(pos) < 0.56)

    # velocities finite
    vel = np.asarray(sim.state.velocity)[alive]
    assert np.all(np.isfinite(vel))

    # mass conserved exactly (no adaptivity)
    m = np.asarray(sim.state.mass)[alive]
    n = int(sim.state.n)
    assert abs(m.sum() - 0.05 * 0.05 * 0.93 * n) < 1e-5


@pytest.mark.slow
def test_hybrid_dfsph_dam_break():
    params = make_params(
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        hybrid_dfsph_factor=0.0,
        hybrid_dfsph_max_avg_density_error=0.01,
        hybrid_dfsph_max_avg_divergence_error=0.001,
    )
    sim, diags = run_steps(params, 10)
    last = diags[-1]
    avg = float(last["density_avg_error"])
    assert (avg != avg and int(last["solver_stats"][0]) == 0) or abs(avg) <= 0.01 + 1e-6
    assert int(last["div_iterations"]) >= 2
    rho = np.asarray(sim.state.density)[np.asarray(sim.state.alive)]
    assert rho.max() < 1.3


@pytest.mark.slow
def test_only_divergence_runs():
    params = make_params(pressure_solver_method=PressureSolverMethod.OnlyDivergence)
    sim, diags = run_steps(params, 8)
    assert abs(float(diags[-1]["div_avg_error"])) < np.inf
    pos = np.asarray(sim.state.position)[np.asarray(sim.state.alive)]
    assert np.all(np.isfinite(pos))


@pytest.mark.slow
def test_level_estimation_uniform_surface_detection():
    params = make_params(
        level_estimation_method=LevelEstimationMethod.EmptyAngle,
        force_level_estimation=True,
    )
    sim, _ = run_steps(params, 3)
    alive = np.asarray(sim.state.alive)
    # after smoothing every particle carries a level; some must be near the surface
    lv = np.asarray(sim.state.level)[alive]
    assert np.all(np.isfinite(lv))
    assert lv.min() < -0.01  # interior particles report depth
    assert np.asarray(sim.state.has_level)[alive].all()


def test_iisph2_runs():
    """IISPH2 (Omega-corrected) integrator path (simulation.rs:2262-2387)."""
    params = make_params(pressure_solver_method=PressureSolverMethod.IISPH2)
    sim, diags = run_steps(params, 6)
    alive = np.asarray(sim.state.alive)
    omega = np.asarray(sim.state.omega)[alive]
    assert np.all(omega >= 0.125 - 1e-6) and np.all(omega <= 2.5 + 1e-6)
    rho = np.asarray(sim.state.density)[alive]
    assert np.all(np.isfinite(rho)) and rho.max() < 1.4
    assert int(diags[-1]["density_iterations"]) >= 2


def test_wcsph_viscosity_runs():
    params = make_params(viscosity_type="WCSPH", viscosity=0.01)
    sim, _ = run_steps(params, 5)
    vel = np.asarray(sim.state.velocity)[np.asarray(sim.state.alive)]
    assert np.all(np.isfinite(vel))


def test_particle_boundary_handler():
    """Akinci boundary particles (particle_boundary_handler.rs) on the lists backend."""
    from adaptive_sph_tpu.runner import create_simulation as cs

    params = make_params(init_boundary_handler=InitBoundaryHandlerType.Particles)
    sim = cs(params, SCENE, capacity=1024, backend="lists")
    for _ in range(5):
        sim.step()
    alive = np.asarray(sim.state.alive)
    pos = np.asarray(sim.state.position)[alive]
    assert np.all(np.abs(pos) < 0.6)  # boundary particles keep fluid inside
    rho = np.asarray(sim.state.density)[alive]
    assert np.all(np.isfinite(rho)) and rho.max() < 1.4


def test_live_params_update():
    """update_params swaps SimulationParams on a running sim (the reference's
    egui live-tuning analogue, main_loop.rs:280-281): the recompiled step must
    run from the current state and the new values must take effect."""
    import dataclasses

    import numpy as np

    sim, _ = run_steps(make_params(), 2)
    t_before = sim.time
    # live-tune: zero gravity and loosen the tolerance
    sim.update_params(dataclasses.replace(
        sim.params, gravity=0.0, iisph_max_avg_density_error=0.01))
    d = sim.step()
    assert sim.time > t_before
    assert float(sim.params.gravity_vector(2)[1]) == 0.0
    assert np.isfinite(float(d["dt"]))
