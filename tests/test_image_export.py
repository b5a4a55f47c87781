"""Image/video export driver E2E (animation/mod.rs semantics) on a tiny scene."""

import os

import numpy as np
import yaml


def test_image_export_png_and_stats(tmp_path):
    scene = {
        "boundary": {"type": "box", "width": 1.0, "height": 1.0},
        "blocks": [
            {
                "pos": [-0.4, -0.4],
                "size": [0.4, 0.4],
                "spacing": 0.06,
                "volume_fill_ratio": 0.93,
                "velocity": [0, 0],
            }
        ],
    }
    config = {
        "rest_density": 1,
        "cfl_factor": 0.4,
        "max_dt": 0.004,
        "h": 0.0,
        "viscosity_type": "ApproxLaplace",
        "viscosity": 0.003,
        "jacobi_omega": 0.5,
        "gravity": -9.81,
        "level_estimation_method": "None",
        "init_boundary_handler": "AnalyticOverestimate",
        "support_length_estimation": "FromMass",
        "merging": False,
        "sharing": False,
        "splitting": False,
        "pressure_solver_method": "IISPH",
        "iisph_max_avg_density_error": 0.002,
        "max_iters": 60,
        "particle_sizes": "Uniform",
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(config))
    export = [
        {
            "time": 0.02,
            "config_path": "config.yaml",
            "scene": scene,
            "visualization_params": {"visualized_attribute": "Velocity"},
            "title": "smoke #p",
            "png_file": "out.png",
            "image_width": 320,
            "image_height": 320,
            "output_stats": True,
        }
    ]
    (tmp_path / "export.yaml").write_text(yaml.safe_dump(export))

    from adaptive_sph_tpu.utils.animation import export_simulation_images

    export_simulation_images([str(tmp_path / "export.yaml")])

    assert os.path.getsize(tmp_path / "out.png") > 2000
    stats = (tmp_path / "out.png.stat").read_text()
    assert "simulation-time" in stats and "density-iterations" in stats
