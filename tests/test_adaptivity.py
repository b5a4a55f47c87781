"""Adaptivity mechanics: classification, split, merge, share, compaction.

Validation is statistical as SURVEY.md section 7 prescribes (exact mass conservation,
class histograms, protocol invariants) rather than bitwise vs the sequential greedy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sph_tpu.models import adaptivity as ad
from adaptive_sph_tpu.models import state as st
from adaptive_sph_tpu.ops import kernels
from adaptive_sph_tpu.ops import neighbors as nbr
from adaptive_sph_tpu.utils.params import ParticleSizes, SimulationParams, SizingFunction


def circle_patterns(max_children=8):
    """Synthetic split patterns: children on a ring (mechanics tests only)."""
    pats = []
    for n in range(2, max_children + 1):
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pos = 0.5 * np.stack([np.cos(ang), np.sin(ang)], -1)
        pats.append({"mass_s": [np.pi / n] * n, "pos_s": pos.tolist(), "h_s": [1.0] * n})
    from adaptive_sph_tpu.utils.split_patterns import to_padded_table

    return to_padded_table(pats)


def make_params(**kw):
    base = dict(
        particle_sizes=ParticleSizes.Adaptive,
        sizing_function=SizingFunction.Radius,
        particle_radius_fine=0.02,
        particle_radius_base=0.1,
        maximum_surface_distance=1.0,
    )
    base.update(kw)
    return SimulationParams(**base)


def grid_state(nx, ny, spacing, mass, C=256, level=-1.0):
    xs = np.arange(nx) * spacing
    ys = np.arange(ny) * spacing
    gx, gy = np.meshgrid(xs, ys)
    pos = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    n = pos.shape[0]
    s = st.init_state(
        pos, np.zeros_like(pos), np.full(n, mass, np.float32), C, uniform_sizes=False
    )
    lv = np.full(C, level, np.float32)
    has = np.zeros(C, bool)
    has[:n] = True
    return s.replace(level=jnp.asarray(lv), has_level=jnp.asarray(has))


def neighborhood_for(s, params):
    cfg = nbr.NeighborConfig(capacity=s.capacity, row_width=96, levels=4, max_per_cell=64)
    return nbr.build_neighborhood(s.position, s.h, s.alive, jnp.float32(2.0), cfg)


def test_classify_thresholds():
    params = make_params()
    # target mass at level -1 with max_surf 1, Radius sizing: r interpolates fine->base
    from adaptive_sph_tpu.utils.params import optimal_mass_from_level

    target = float(optimal_mass_from_level(jnp.float32(-0.5), params))
    s = grid_state(1, 1, 0.1, target, C=256, level=-0.5)
    for factor, want in [
        (0.4, st.SIZE_TOO_SMALL),
        (0.7, st.SIZE_SMALL),
        (1.0, st.SIZE_OPTIMAL),
        (1.5, st.SIZE_LARGE),
        (2.5, st.SIZE_TOO_LARGE),
    ]:
        s2 = s.replace(mass=s.mass.at[0].set(target * factor))
        cls = ad.classify(s2, params)
        assert int(cls[0]) == want, (factor, int(cls[0]), want)


def test_split_conserves_mass_and_places_children():
    params = make_params()
    from adaptive_sph_tpu.utils.params import optimal_mass_from_level

    target = float(optimal_mass_from_level(jnp.float32(-1.0), params))
    # one particle with 4x the target mass -> 4 children
    s = grid_state(1, 1, 0.1, target * 4.0, C=256, level=-1.0)
    total0 = float(jnp.sum(jnp.where(s.alive, s.mass, 0.0)))

    s2, diag = ad.split(s, params, circle_patterns(), max_splits=16)
    total1 = float(jnp.sum(jnp.where(s2.alive, s2.mass, 0.0)))
    assert abs(total0 - total1) < 1e-6
    assert int(diag["splits"]) == 1
    assert int(s2.n) == 4
    alive = np.asarray(s2.alive)
    assert alive.sum() == 4
    m = np.asarray(s2.mass)[alive]
    np.testing.assert_allclose(m, target, rtol=1e-5)
    # children have h from mass
    h = np.asarray(s2.h)[alive]
    want_h = float(kernels.smoothing_length_from_mass(target, 1.0, 2))
    np.testing.assert_allclose(h, want_h, rtol=1e-5)


def test_merge_conserves_mass_and_deletes_donor():
    params = make_params()
    from adaptive_sph_tpu.utils.params import optimal_mass_from_level

    target = float(optimal_mass_from_level(jnp.float32(-1.0), params))
    # 3x3 grid of Small particles (0.7x target) with one TooSmall (0.3x) in the middle
    s = grid_state(3, 3, 0.05, target * 0.7, C=256, level=-1.0)
    s = s.replace(
        mass=s.mass.at[4].set(target * 0.3),
        h=jnp.asarray(kernels.smoothing_length_from_mass(s.mass, 1.0, 2)),
    )
    nb = neighborhood_for(s, params)
    total0 = float(jnp.sum(jnp.where(s.alive, s.mass, 0.0)))

    cls = ad.classify(s, params)
    assert int(cls[4]) == st.SIZE_TOO_SMALL

    partner, cnt, active = ad._find_partners(s, nb, cls, jnp.float32(0.001), params, "merge")
    assert bool(active[4])
    assert int(cnt[4]) > 0

    s2 = ad._apply_transfer(s, partner, cnt, jnp.float32(0.001), params, "merge")
    total1 = float(jnp.sum(jnp.where(s2.alive, s2.mass, 0.0)))
    assert abs(total0 - total1) < 1e-6
    assert not bool(s2.alive[4])  # donor deleted

    s3 = ad.compact(s2)
    assert int(s3.n) == 8
    assert np.asarray(s3.alive)[:8].all() and not np.asarray(s3.alive)[8:].any()


def test_share_conserves_mass_and_keeps_donor():
    params = make_params(max_mass_transfer_sharing=400000.0)
    from adaptive_sph_tpu.utils.params import optimal_mass_from_level

    target = float(optimal_mass_from_level(jnp.float32(-1.0), params))
    s = grid_state(3, 3, 0.05, target * 0.7, C=256, level=-1.0)
    s = s.replace(
        mass=s.mass.at[4].set(target * 1.5),  # Large donor
        h=jnp.asarray(kernels.smoothing_length_from_mass(s.mass, 1.0, 2)),
    )
    nb = neighborhood_for(s, params)
    total0 = float(jnp.sum(jnp.where(s.alive, s.mass, 0.0)))

    cls = ad.classify(s, params)
    assert int(cls[4]) == st.SIZE_LARGE

    partner, cnt, active = ad._find_partners(s, nb, cls, jnp.float32(0.01), params, "share")
    assert bool(active[4]) and int(cnt[4]) > 0

    s2 = ad._apply_transfer(s, partner, cnt, jnp.float32(0.01), params, "share")
    total1 = float(jnp.sum(jnp.where(s2.alive, s2.mass, 0.0)))
    assert abs(total0 - total1) < 1e-6
    assert bool(s2.alive[4])  # donor survives a share
    # donor shed mass toward its target
    assert float(s2.mass[4]) < target * 1.5
    assert float(s2.mass[4]) >= target * 0.999


def test_receivers_pick_single_donor():
    """Protocol invariant (particle_merging.rs:230-268): every receiver has exactly one
    donor and that donor is active; donors are never receivers."""
    params = make_params()
    from adaptive_sph_tpu.utils.params import optimal_mass_from_level

    target = float(optimal_mass_from_level(jnp.float32(-1.0), params))
    rng = np.random.default_rng(0)
    n = 60
    pos = rng.uniform(0, 0.3, (n, 2)).astype(np.float32)
    mass = (target * rng.uniform(0.3, 1.0, n)).astype(np.float32)
    s = st.init_state(pos, np.zeros_like(pos), mass, 128, uniform_sizes=False)
    s = s.replace(
        level=jnp.full((128,), -1.0), has_level=jnp.asarray(np.arange(128) < n)
    )
    nb = neighborhood_for(s, params)
    cls = ad.classify(s, params)
    partner, cnt, active = ad._find_partners(s, nb, cls, jnp.float32(0.001), params, "merge")

    partner = np.asarray(partner)
    active = np.asarray(active)
    C = 128
    for j in range(n):
        if partner[j] < C:
            assert active[partner[j]]
            assert not active[j]
    # counts match assignments
    cnt = np.asarray(cnt)
    for d in range(n):
        assert cnt[d] == (partner[:n] == d).sum()


def test_capacity_growth_preserves_state_and_recompiles():
    """Capacity doubling is the only recompile event (SURVEY section 7): growing
    must preserve all particles and keep the sim stepping (splitting.rs:56-58
    analogue for fixed-capacity arrays)."""
    from adaptive_sph_tpu.models import scene as scene_mod
    from adaptive_sph_tpu.runner import create_simulation
    from adaptive_sph_tpu.utils.params import (
        InitBoundaryHandlerType, PressureSolverMethod,
    )

    scene = scene_mod.scene_from_dict(
        {
            "boundary": {"type": "box", "width": 2, "height": 2},
            "blocks": [
                {"pos": [0.4, -0.5], "size": [0.55, 1.4], "spacing": 0.06,
                 "volume_fill_ratio": 0.93, "velocity": [0, 0]},
            ],
        }
    )
    params = SimulationParams(
        particle_sizes=ParticleSizes.Uniform,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=40,
    )
    sim = create_simulation(params, scene, capacity=512, backend="tiles")
    sim.step()
    n0 = sim.num_fluid_particles
    pos0 = np.asarray(sim.state.position)[np.asarray(sim.state.alive)]
    cap0 = sim.state.capacity

    sim.grow_capacity()
    assert sim.state.capacity >= 2 * cap0 - 1024 and sim.state.capacity > cap0
    assert sim.num_fluid_particles == n0
    pos1 = np.asarray(sim.state.position)[np.asarray(sim.state.alive)]
    np.testing.assert_array_equal(pos0, pos1)

    sim.step()  # recompiled step runs at the new capacity
    assert sim.num_fluid_particles == n0


def test_fail_on_missing_split_pattern_raises():
    from adaptive_sph_tpu.runner import Simulation, SimulationFailed

    sim = Simulation.__new__(Simulation)
    sim.params = make_params(fail_on_missing_split_pattern=True)
    try:
        sim._check_split_diag(missing=3, deferred=0)
        assert False, "expected SimulationFailed"
    except SimulationFailed as e:
        assert "Missing split pattern" in str(e)


def test_split_pattern_generation_and_svg(tmp_path):
    """generate-split-patterns smoke (splitting.rs:463-548 + the 550-640 SVG
    debug export): regenerate the smallest patterns and render one SVG."""
    from adaptive_sph_tpu.ops import kernels
    from adaptive_sph_tpu.utils.split_patterns import (
        export_pattern_svg, precalculate_split_pattern)

    for n in (2, 3):
        p = precalculate_split_pattern(n)
        assert len(p["pos_s"]) == n and len(p["mass_s"]) == n
        # mass conservation: children sum to the parent optimal mass
        parent = float(kernels.radius_to_sphere_volume(1.0, 2))
        assert abs(sum(p["mass_s"]) - parent) < 1e-6 * parent
        # children sit inside the parent's kernel support
        r = np.linalg.norm(np.asarray(p["pos_s"], np.float64), axis=1)
        h = float(kernels.smoothing_length_from_mass(parent, 1.0, 2))
        assert float(r.max()) < 2.0 * h
    path = tmp_path / "split-3.svg"
    export_pattern_svg(p, str(path))
    text = path.read_text()
    assert text.startswith("<svg") and text.count("<circle") == 3 + 2


@pytest.mark.slow
def test_split_pattern_full_regeneration():
    """The full n=2..8 regeneration the CLI's generate-split-patterns runs,
    bounded (simulation.rs:2985-2993)."""
    from adaptive_sph_tpu.utils.split_patterns import generate_split_patterns

    pats = generate_split_patterns(8)
    assert [len(p["pos_s"]) for p in pats] == list(range(2, 9))
