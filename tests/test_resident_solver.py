"""Resident whole-solve Jacobi kernel (ops/pallas_jacobi.py) vs the streamed
per-matvec path — same tile backend, same sorted layout, so states compare
row-for-row. Math is identical; only f32 association order differs."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # opt-in feature; heaviest file in the suite

from adaptive_sph_tpu.models import scene as scene_mod
from adaptive_sph_tpu.runner import create_simulation
from adaptive_sph_tpu.utils.params import (
    InitBoundaryHandlerType,
    OperatorDiscretization,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
)


def _dam_scene(spacing2=None):
    blocks = [{"pos": [0.4, -0.5], "size": [0.55, 1.4], "spacing": 0.06,
               "volume_fill_ratio": 0.93, "velocity": [0, 0]}]
    if spacing2:
        blocks.append({"pos": [-0.95, -0.5], "size": [0.55, 1.4],
                       "spacing": spacing2,
                       "volume_fill_ratio": 0.93, "velocity": [0, 0]})
    return scene_mod.scene_from_dict(
        {"boundary": {"type": "box", "width": 2, "height": 2}, "blocks": blocks}
    )


def _diff_resident(params, scene, steps, capacity=1024):
    import dataclasses

    out = {}
    for resident in (False, True):
        p = dataclasses.replace(params, resident_solver=resident)
        sim = create_simulation(p, scene, capacity=capacity, backend="tiles")
        for _ in range(steps):
            sim.step()
        out[resident] = sim.state
    a, b = out[True], out[False]
    alive = np.asarray(b.alive)
    np.testing.assert_array_equal(np.asarray(a.alive), alive)
    np.testing.assert_allclose(
        np.asarray(a.position)[alive], np.asarray(b.position)[alive], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.velocity)[alive], np.asarray(b.velocity)[alive], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.density)[alive], np.asarray(b.density)[alive], rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.pressure)[alive], np.asarray(b.pressure)[alive],
        rtol=5e-3, atol=1e-2,
    )


def test_resident_hybrid_sdf():
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_resident(params, _dam_scene(), steps=4)


def test_resident_iisph_particle_boundary():
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.IISPH,
        init_boundary_handler=InitBoundaryHandlerType.Particles,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_resident(params, _dam_scene(), steps=3, capacity=2048)


def test_resident_w2020_cross_level():
    params = SimulationParams(
        operator_discretization=OperatorDiscretization.Winchenbach2020,
        merging=False, sharing=False, splitting=False, max_iters=60,
        hybrid_dfsph_max_avg_density_error=0.001,
        hybrid_dfsph_max_avg_divergence_error=0.0001,
        hybrid_dfsph_factor=1000000.0, cfl_factor=0.3, max_dt=0.003,
    )
    _diff_resident(params, _dam_scene(spacing2=0.05), steps=3, capacity=2048)


def test_resident_streamed_tail(monkeypatch):
    # force a tiny resident region so most weight blocks take the streamed
    # tail path (blocks >= r_blocks ring-DMA'd per sweep)
    monkeypatch.setenv("ASPH_RESIDENT_BLOCKS", "16")
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_resident(params, _dam_scene(), steps=3)


def test_resident_warm_start():
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        merging=False, sharing=False, splitting=False, max_iters=60,
        warm_start_pressure=True,
    )
    _diff_resident(params, _dam_scene(), steps=4)


def test_resident_iisph2_omega():
    # in-kernel source with the per-particle 1/Omega factor (IISPH2,
    # simulation.rs:2346) — covers the T_OMGI lane of src_from_div
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.IISPH2,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_resident(params, _dam_scene(), steps=3)


def test_resident_only_divergence():
    # covers the per-solve jacobi_solve kernel at DIVERGENCE residual type
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.OnlyDivergence,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_resident(params, _dam_scene(), steps=3)


def test_resident_hybrid_accel_after_div():
    # non_pressure_accel_before_divergence_free=False needs the viscosity
    # sweep between the solves, so the one-kernel hybrid path must fall back
    # to two per-solve resident kernels
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        hybrid_dfsph_non_pressure_accel_before_divergence_free=False,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_resident(params, _dam_scene(), steps=3)


def test_resident_supported_gate():
    # very large capacities must refuse the resident kernels (their fixed VMEM
    # tables would exceed the budget and fail Mosaic compile on-chip)
    import jax.numpy as jnp

    from adaptive_sph_tpu.ops.pallas_jacobi import resident_supported

    assert resident_supported(24576, 64, jnp.float32)
    assert resident_supported(49152, 64, jnp.float32)
    assert not resident_supported(98304, 64, jnp.float32)


def test_resident_hybrid_only_density_source():
    # den_with_div=False branch of the one-kernel hybrid (OnlyDensity source)
    from adaptive_sph_tpu.utils.params import HybridDfsphDensitySourceTerm

    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        hybrid_dfsph_density_source_term=HybridDfsphDensitySourceTerm.OnlyDensity,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    _diff_resident(params, _dam_scene(), steps=3)


def test_resident_bf16_weights_converges():
    # bf16 blocks perturb the operator (~0.4% relative) so this is not a
    # tight differential: assert the resident+bf16 run converges to the same
    # tolerance contract and lands near the f32 run
    import dataclasses

    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    states = {}
    for bf16 in (False, True):
        p = dataclasses.replace(params, resident_solver=True,
                                weight_cache_bf16=bf16)
        sim = create_simulation(p, _dam_scene(), capacity=1024,
                                backend="tiles")
        for _ in range(3):
            sim.step()
        states[bf16] = sim.state
    a, b = states[True], states[False]
    alive = np.asarray(b.alive)
    np.testing.assert_allclose(
        np.asarray(a.position)[alive], np.asarray(b.position)[alive], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.density)[alive], np.asarray(b.density)[alive], rtol=5e-3
    )
