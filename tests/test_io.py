"""Config parsing, checkpoint round-trip, rendering, VTK, stats."""

import os

import numpy as np

from adaptive_sph_tpu.utils import checkpoint, params as params_mod
from adaptive_sph_tpu.models import scene as scene_mod


def test_load_reference_format_config(tmp_path):
    p = params_mod.load_params("configs/default-config.yaml")
    assert p.rest_density == 1
    assert p.pressure_solver_method.value == "HybridDFSPH"
    assert p.viscosity_type.value == "ApproxLaplace"
    assert p.max_iters == 1000
    assert p.boundary_penalty_term.value == "Quadratic1"


def test_overwrite_config_merge(tmp_path):
    over = tmp_path / "over.yaml"
    over.write_text("gravity: -5.0\nmax_iters: 7\n")
    p = params_mod.load_params("configs/default-config.yaml", overwrite_path=str(over))
    assert p.gravity == -5.0
    assert p.max_iters == 7


def test_update_attributes_merge():
    p = params_mod.load_params(
        "configs/default-config.yaml",
        update_attributes={"pressure_solver_method": "IISPH", "cfl_factor": 0.3},
    )
    assert p.pressure_solver_method.value == "IISPH"
    assert p.cfl_factor == 0.3


def test_scene_load():
    s = scene_mod.load_scene("configs/default-scene.yaml")
    assert s.boundary_width == 2 and len(s.blocks) == 2
    pos, mass, vel = scene_mod.add_fluid_block(s.blocks[0])
    assert pos.shape[0] == mass.shape[0] == vel.shape[0] > 500
    np.testing.assert_allclose(mass[0], 0.03 * 0.03 * 0.93, rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from adaptive_sph_tpu.models.state import init_state

    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, (50, 2)).astype(np.float32)
    st = init_state(pos, np.zeros_like(pos), np.ones(50, np.float32), 128, uniform_sizes=False)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(path, st)
    st2 = checkpoint.load_state(path)
    np.testing.assert_array_equal(np.asarray(st.position), np.asarray(st2.position))
    assert int(st2.n) == 50
    # re-padding to a larger capacity
    st3 = checkpoint.load_state(path, capacity=256)
    assert st3.capacity == 256
    np.testing.assert_array_equal(np.asarray(st3.position)[:128], np.asarray(st.position))


def test_render_smoke(tmp_path):
    from adaptive_sph_tpu.models.boundary import WinchenbachBoundary
    from adaptive_sph_tpu.ops.sdf import boundary_box_planes
    from adaptive_sph_tpu.utils.render import render2d, save_png

    rng = np.random.default_rng(1)
    n = 200
    pos = rng.uniform(-0.9, 0.9, (n, 2)).astype(np.float32)
    mass = np.full(n, 0.001, np.float32)
    colors = rng.uniform(0, 1, (n, 3))
    bh = WinchenbachBoundary(sdfs=tuple(boundary_box_planes((-1, -1), (1, 1))))
    img = render2d(pos, mass, 1.0, colors, bh, img_width=400, img_height=400,
                   title="test #p particles",
                   legend={"color_map": __import__("adaptive_sph_tpu.utils.colors",
                                                   fromlist=["color_map_viridis"]).color_map_viridis(0, 4),
                           "text_right": True, "only_min_max": True})
    assert img.shape == (400, 400, 3)
    # boundary lines + particles drawn -> not all white
    assert (img < 250).any()
    save_png(img, str(tmp_path / "t.png"))
    assert os.path.getsize(tmp_path / "t.png") > 1000


def test_vtk_writer(tmp_path):
    from adaptive_sph_tpu.utils.vtk import VtkExporter

    snap = {
        "position": np.zeros((5, 2), np.float32),
        "density": np.ones(5, np.float32),
        "pressure": np.zeros(5, np.float32),
        "mass": np.ones(5, np.float32),
        "velocity": np.zeros((5, 2), np.float32),
        "neighbor_count": np.ones(5, np.int32),
    }
    ex = VtkExporter(str(tmp_path / "vtk"), "sim")
    ex.add_snapshot(0.0, snap, np.asarray([[0, 0, 1, 1]], np.float32))
    ex.add_snapshot(0.1, snap)
    assert os.path.exists(tmp_path / "vtk" / "sim.vtk.series")
    txt = (tmp_path / "vtk" / "sim-000000.vtk").read_text()
    assert "POINTS 7 float" in txt and "SCALARS density" in txt


def test_stats_format():
    from adaptive_sph_tpu.utils.stats import Counters, write_statistics

    c = Counters()
    c.add_time("simulation-step", 0.01)
    c.add_value("particle-count", 100)
    c.add_value("div-iterations", 3)
    c.add_value("density-iterations", 5)
    s = write_statistics(c)
    assert "simulation-step: avg:" in s
    assert "particle-count: min:100" in s
    assert "\\si{\\second}" in s
