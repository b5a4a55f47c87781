"""Offline image/video export driver (the `image` subcommand).

Reference parity: platform/desktop/animation/mod.rs —
  ImageExportConfig schema (:28-57) parsed from the same YAML files,
  config layering via update_attributes (:89-99),
  run-to-target-time loop with adaptivity deferred so frame positions can be
  interpolated between steps (:138-272),
  linear position interpolation for fixed-fps video frames (:191-210),
  video assembly (ffmpeg there; imageio here — no ffmpeg binary in the image),
  `.stat` statistics dump (:275-285).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import yaml

from ..models import scene as scene_mod
from ..runner import create_simulation
from . import render as render_mod
from . import stats as stats_mod
from .colors import (
    VisualizationParams,
    VisualizedAttribute,
    colors_for_particles,
    get_color_map,
    get_color_map_for_pressure,
)
from .params import load_params
from .snapshot import take_snapshot


def export_simulation_images(config_paths: list[str]):
    for config_path in config_paths:
        config_path = os.path.abspath(config_path)
        base_dir = os.path.dirname(config_path)
        with open(config_path) as f:
            export_configs = yaml.safe_load(f)
        for cfg in export_configs:
            _export_one(cfg, base_dir)


def _export_one(cfg: dict, base_dir: str):
    params = load_params(
        os.path.join(base_dir, cfg["config_path"]),
        update_attributes=cfg.get("update_attributes") or {},
    )

    if cfg.get("scene") is not None:
        scene = scene_mod.scene_from_dict(cfg["scene"])
    elif cfg.get("scene_file"):
        scene = scene_mod.load_scene(os.path.join(base_dir, cfg["scene_file"]))
    else:
        raise ValueError("expected either 'scene' or 'scene_file'")

    viz_dict = dict(cfg.get("visualization_params") or {})
    # several reference media configs (e.g. media/constant-field.yaml) carry a
    # stale top-level `visualized_attribute` key predating the reference's
    # nested VisualizationParams schema; accept it for drop-in compatibility
    if "visualized_attribute" in cfg and "visualized_attribute" not in viz_dict:
        viz_dict["visualized_attribute"] = cfg["visualized_attribute"]
    viz = VisualizationParams.from_dict(viz_dict)
    if viz.visualized_attribute == VisualizedAttribute.Distance or viz.show_flag_is_fluid_surface:
        params = params.replace(force_level_estimation=True)
    if viz.visualized_attribute in (
        VisualizedAttribute.ConstantField, VisualizedAttribute.NeighborCount
    ):
        params = params.replace(force_diagnostic_fields=True)
    sim = create_simulation(params, scene)

    target_time = float(cfg["time"])
    video = None
    if cfg.get("video_start_time") is not None:
        video = dict(
            start=float(cfg["video_start_time"]),
            end=target_time,
            fps=float(cfg.get("video_fps") or 60.0),
            speed=float(cfg.get("video_speed") or 1.0),
        )
    time_for_next_export = video["start"] if video else target_time

    img_w = int(cfg.get("image_width") or 2000)
    img_h = int(cfg.get("image_height") or 2000)
    zoom_out = float(cfg.get("zoom_out") or 1.04)
    frames = []

    # the reference defers resampling around the export window
    # (animation/mod.rs:138-272): physics step -> interpolated frames ->
    # adaptivity, so the census never changes inside an interpolation window.
    # The tile backend steps in two phases to reproduce that exactly; the
    # fallback backends keep the fused step with census-gated interpolation.
    # The tile backend also reorders particles every step (sorted emission), so
    # video interpolation always runs through the two-phase step there, blending
    # diag["pos_prev"] (start-of-step positions in the step's output order).
    resampling = sim.params.splitting or sim.params.merging or sim.params.sharing
    two_phase = None
    if sim.tile_cfg is not None and (resampling or video is not None):
        from ..models.simulation import make_two_phase_step_fns

        two_phase = make_two_phase_step_fns(
            sim.params, sim.boundary_handler, sim.split_patterns, sim.tile_cfg
        )

    done = False
    while not done:
        time_before = sim.time
        n_before = int(sim.state.n)
        pos_before = np.asarray(sim.state.position)
        if two_phase is not None:
            physics_fn, adaptivity_fn = two_phase
            new_state, diag = physics_fn(sim.state)
            diag = jax.device_get(diag)
            sim.state = new_state
            identity_stable = True
            # the physics step reordered the particles; its pos_prev carries the
            # start-of-step positions in the NEW order for interpolation
            pos_before = np.asarray(diag["pos_prev"])
        else:
            diag = sim.step()  # fused; interpolation uses pre-step positions
            # adaptivity may renumber particles (merge compaction / split
            # extension); interpolation is only identity-safe when the census
            # is unchanged within the step window
            identity_stable = int(sim.state.n) == n_before and not any(
                int(diag.get(k, 0))
                for k in ("merge_or_split_count", "merges", "splits", "shares")
            )

        if cfg.get("panic_on_end") and sim.time > target_time:
            raise RuntimeError(">>>>>>>>>>>> REACHED END BEFORE EXPORT <<<<<<<<<<<<")

        while time_for_next_export <= sim.time:
            snap = take_snapshot(sim.state, sim.params)

            legend = None
            max_pressure = None
            if viz.visualized_attribute == VisualizedAttribute.Pressure:
                max_pressure = float(snap["pressure"].max()) * 0.9
            if not cfg.get("no_legend"):
                if viz.visualized_attribute == VisualizedAttribute.Pressure:
                    cm = get_color_map_for_pressure(float(snap["pressure"].max()))
                else:
                    cm = get_color_map(viz.visualized_attribute, sim.params)
                if cm is not None:
                    legend = dict(
                        color_map=cm,
                        text_right=bool(cfg.get("legend_text_right")),
                        only_min_max=bool(cfg.get("legend_only_min_max")),
                    )

            positions = snap["position"]
            if video is not None and sim.time > time_before and identity_stable:
                # linear interpolation between steps (animation/mod.rs:191-210);
                # valid while the particle count is unchanged within the step window
                alive_now = np.asarray(sim.state.alive)
                pos_now_full = np.asarray(sim.state.position)
                interp = (time_for_next_export - time_before) / (sim.time - time_before)
                interp = float(np.clip(interp, 0.0, 1.0))
                full = interp * pos_now_full + (1.0 - interp) * pos_before
                positions = full[alive_now]

            colors = colors_for_particles(snap, sim.params, viz, max_pressure)
            img = render_mod.render2d(
                positions, snap["mass"], sim.params.rest_density, colors,
                sim.boundary_handler, img_w, img_h, legend,
                cfg.get("title"), zoom_out,
            )

            if video is not None:
                frames.append(img)
                time_for_next_export += 1.0 / video["fps"] * video["speed"]
                if sim.time > video["end"]:
                    _write_video(frames, os.path.join(base_dir, cfg["png_file"]), video["fps"])
                    done = True
                    break
            else:
                render_mod.save_png(img, os.path.join(base_dir, cfg["png_file"]))
                done = True
                break

        if two_phase is not None and not done:
            # resample only after the export window (animation/mod.rs:272)
            new_state, adiag = two_phase[1](sim.state, diag["dt"])
            adiag = jax.device_get(adiag)
            if float(adiag.get("mass_conservation_error", 0.0)) >= 0.005:
                raise RuntimeError("mass not conserved after adaptivity")
            sim.state = new_state
            if "split_missing_pattern" in adiag:
                sim._check_split_diag(
                    int(adiag["split_missing_pattern"]), int(adiag["split_deferred"])
                )

    if cfg.get("output_stats"):
        if sim.params.profile_stages:
            from .profiling import profile_sections

            profile_sections(sim)
        out = os.path.join(base_dir, cfg["png_file"] + ".stat")
        with open(out, "w") as f:
            f.write(stats_mod.write_statistics(sim.counters))


def _write_video(frames: list, path: str, fps: float):
    import imageio.v2 as imageio

    try:
        imageio.mimwrite(path, frames, fps=int(round(fps)), codec="libx264", quality=8)
    except Exception:
        # fallback: write frames as numbered PNGs next to the target
        base, _ = os.path.splitext(path)
        os.makedirs(base + "-frames", exist_ok=True)
        for i, fr in enumerate(frames):
            render_mod.save_png(fr, os.path.join(base + "-frames", f"file-{i:06d}.png"))
