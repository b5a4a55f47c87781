"""Dense grid engine: differential tests against brute force and the list backend."""

import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sph_tpu.models import grid_pairs
from adaptive_sph_tpu.models import scene as scene_mod
from adaptive_sph_tpu.ops import grid as grid_mod
from adaptive_sph_tpu.runner import create_simulation
from adaptive_sph_tpu.utils.params import (
    InitBoundaryHandlerType,
    LevelEstimationMethod,
    ParticleSizes,
    PressureSolverMethod,
    SimulationParams,
)


def make_case(seed, n, C, h_range, extent=1.1):
    rng = np.random.default_rng(seed)
    pos = np.zeros((C, 2), dtype=np.float32)
    pos[:n] = rng.uniform(-extent / 2, extent / 2, size=(n, 2))
    h = np.full((C,), h_range[0], dtype=np.float32)
    h[:n] = np.exp(rng.uniform(np.log(h_range[0]), np.log(h_range[1]), size=n)).astype(np.float32)
    alive = np.zeros((C,), dtype=bool)
    alive[:n] = True
    return jnp.asarray(pos), jnp.asarray(h), jnp.asarray(alive)


@pytest.mark.parametrize(
    "seed,n,h_range,scale",
    [
        (0, 200, (0.05, 0.05), 2.0),
        (1, 300, (0.03, 0.12), 2.0),
        (2, 150, (0.05, 0.6), 2.0),  # 12:1, large cross-level span
        (3, 200, (0.04, 0.2), 2.894736),
    ],
)
def test_pair_apply_matches_bruteforce(seed, n, h_range, scale):
    C = 512
    pos, h, alive = make_case(seed, n, C, h_range)
    rng = np.random.default_rng(seed + 100)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, size=C).astype(np.float32))

    cfg = grid_mod.make_grid_config(
        (-0.7, -0.7), (0.7, 0.7), scale, h_range[0], h_range[1], C, mpc=40
    )
    bins = grid_mod.build_bins(pos, h * scale, alive, cfg)
    assert int(bins.overflow) == 0
    assert int(bins.level_overflow) == 0

    sf = {
        "pos": grid_mod.scatter_field(bins, cfg, pos),
        "h": grid_mod.scatter_field(bins, cfg, h),
        "mass": grid_mod.scatter_field(bins, cfg, mass),
    }

    def edge(vi, vj, geom):
        return {
            "s": vj["mass"] * jnp.exp(-geom.r * geom.r),
            "v": (vj["mass"] * geom.r)[..., None] * geom.diff,
        }

    out = grid_pairs.pair_apply(cfg, bins, sf, jnp.float32(scale), edge)
    got_s = np.asarray(grid_mod.gather_result(bins, cfg, out["s"]))
    got_v = np.asarray(grid_mod.gather_result(bins, cfg, out["v"]))

    # dense ground truth
    posn, hn, massn, aliven = map(np.asarray, (pos, h, mass, alive))
    diff = posn[:, None, :] - posn[None, :, :]
    r = np.sqrt((diff**2).sum(-1) + 1e-30)
    s_ij = scale * 0.5 * (hn[:, None] + hn[None, :])
    adj = (r < s_ij) & aliven[:, None] & aliven[None, :]
    want_s = (massn[None, :] * np.exp(-(r**2)) * adj).sum(1)
    want_v = ((massn[None, :] * r * adj)[..., None] * diff).sum(1)

    np.testing.assert_allclose(got_s[aliven], want_s[aliven], rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(got_v[aliven], want_v[aliven], rtol=3e-4, atol=1e-5)


@pytest.mark.slow
def test_pair_apply_max_matches_bruteforce():
    C = 512
    pos, h, alive = make_case(7, 250, C, (0.02, 0.5))
    cfg = grid_mod.make_grid_config((-0.7, -0.7), (0.7, 0.7), 2.0, 0.02, 0.5, C, mpc=40)
    bins = grid_mod.build_bins(pos, h * 2.0, alive, cfg)
    sf = {
        "pos": grid_mod.scatter_field(bins, cfg, pos),
        "h": grid_mod.scatter_field(bins, cfg, h),
    }

    def edge(vi, vj, geom):
        return {"m": vj["h"] - geom.r}

    out = grid_pairs.pair_apply(cfg, bins, sf, jnp.float32(2.0), edge, reduce="max", fill=-np.inf)
    got = np.asarray(grid_mod.gather_result(bins, cfg, out["m"], fill=-np.inf))

    posn, hn, aliven = map(np.asarray, (pos, h, alive))
    diff = posn[:, None, :] - posn[None, :, :]
    r = np.sqrt((diff**2).sum(-1) + 1e-30)
    s_ij = 2.0 * 0.5 * (hn[:, None] + hn[None, :])
    adj = (r < s_ij) & aliven[:, None] & aliven[None, :]
    want = np.where(adj, hn[None, :] - r, -np.inf).max(1)
    np.testing.assert_allclose(got[aliven], want[aliven], rtol=1e-4, atol=1e-5)


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


@pytest.mark.parametrize("method", ["IISPH", "HybridDFSPH"])
def test_grid_step_matches_list_backend(method):
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod(method),
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        level_estimation_method=LevelEstimationMethod.NoneMethod,
        merging=False,
        sharing=False,
        splitting=False,
        max_iters=60,
    )
    sim_l = create_simulation(params, SCENE, capacity=1024, backend="lists")
    sim_g = create_simulation(params, SCENE, capacity=1024, backend="grid")

    for k in range(3):
        dl = sim_l.step()
        dg = sim_g.step()
        assert int(dl.get("density_iterations", -1)) == int(dg.get("density_iterations", -1)), k

    alive = np.asarray(sim_l.state.alive)
    np.testing.assert_allclose(
        np.asarray(sim_g.state.position)[alive],
        np.asarray(sim_l.state.position)[alive],
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sim_g.state.density)[alive],
        np.asarray(sim_l.state.density)[alive],
        rtol=2e-4, atol=1e-5,
    )


def test_grid_step_level_estimation_matches():
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.IISPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        level_estimation_method=LevelEstimationMethod.EmptyAngle,
        force_level_estimation=True,
        merging=False,
        sharing=False,
        splitting=False,
        max_iters=60,
    )
    sim_l = create_simulation(params, SCENE, capacity=1024, backend="lists")
    sim_g = create_simulation(params, SCENE, capacity=1024, backend="grid")
    for _ in range(2):
        sim_l.step()
        sim_g.step()
    alive = np.asarray(sim_l.state.alive)
    np.testing.assert_allclose(
        np.asarray(sim_g.state.level)[alive],
        np.asarray(sim_l.state.level)[alive],
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(sim_g.state.flag_is_fluid_surface)[alive],
        np.asarray(sim_l.state.flag_is_fluid_surface)[alive],
    )
