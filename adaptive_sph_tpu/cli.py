"""Command-line interface mirroring the reference's clap CLI (main_loop.rs:24-207).

Subcommands:
  run <config> <scene> [--max-seconds S] [--overwrite-config-file F] [-p]
      [--statistics-path F] [--vtk-dir DIR] [--snapshot-png F]
  image <export-configs...>
  generate-split-patterns [out.yaml] [--max-children N]

The interactive SDL/egui viewer is replaced by offline artifacts (PNG/VTK/stats);
render semantics are ported in utils/render.py + utils/colors.py.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(prog="adaptive-sph-tpu", description="TPU-native adaptive SPH")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="Run simulation with given config")
    p_run.add_argument("simulation_config")
    p_run.add_argument("scene_config")
    p_run.add_argument("--max-seconds", "-s", type=float, default=None)
    p_run.add_argument("--overwrite-config-file", "-c", default=None)
    p_run.add_argument("--statistics-enabled", "-p", action="store_true")
    p_run.add_argument("--statistics-path", "-w", default=None)
    p_run.add_argument("--max-steps", type=int, default=10**9)
    p_run.add_argument("--vtk-dir", default=None, help="export VTK snapshots to this dir")
    p_run.add_argument("--vtk-every", type=int, default=1)
    p_run.add_argument("--snapshot-png", default=None, help="render the final state to PNG")
    p_run.add_argument("--web-dir", default=None, help="export a browser viewer (HTML + frames)")
    p_run.add_argument("--web-every", type=int, default=2)
    p_run.add_argument("--checkpoint", default=None, help="save final state to this .npz")
    p_run.add_argument("--resume", default=None, help="resume from a .npz checkpoint")
    p_run.add_argument(
        "--watch-config", default=None,
        help="live tuning: poll this overwrite-config YAML every step and apply "
        "changes to the running simulation (the reference's egui properties "
        "window analogue; one recompile per edit)")

    p_img = sub.add_parser("image", help="Offline image/video export")
    p_img.add_argument("export_configs", nargs="+")

    p_gen = sub.add_parser("generate-split-patterns", help="Precompute split patterns")
    p_gen.add_argument("output_yaml", nargs="?", default="./split-patterns.yaml")
    p_gen.add_argument("--max-children", type=int, default=60)
    p_gen.add_argument("--svg-dir", default=None,
                       help="also write one debug SVG per pattern "
                            "(splitting.rs:550-640 counterpart)")

    args = parser.parse_args(argv)

    if args.cmd == "run":
        return cmd_run(args)
    if args.cmd == "image":
        from .utils.animation import export_simulation_images

        # reference accepts comma-separated lists too (main_loop.rs:190-196)
        paths = [p for arg in args.export_configs for p in arg.split(",")]
        export_simulation_images(paths)
        return 0
    if args.cmd == "generate-split-patterns":
        from .utils.split_patterns import generate_split_patterns, save_patterns

        patterns = generate_split_patterns(args.max_children)
        save_patterns(patterns, args.output_yaml)
        print(f"Wrote {len(patterns)} patterns to {args.output_yaml}")
        if args.svg_dir:
            import os as _os

            from .utils.split_patterns import export_pattern_svg

            _os.makedirs(args.svg_dir, exist_ok=True)
            for p in patterns:
                n = len(p["pos_s"])
                export_pattern_svg(p, _os.path.join(args.svg_dir, f"split-{n}.svg"))
            print(f"Wrote {len(patterns)} SVGs to {args.svg_dir}")
        return 0
    return 1


def cmd_run(args):
    from .models import scene as scene_mod
    from .runner import SimulationFailed, create_simulation
    from .utils import stats as stats_mod
    from .utils.params import load_params

    params = load_params(args.simulation_config, overwrite_path=args.overwrite_config_file)
    scene = scene_mod.load_scene(args.scene_config)
    sim = create_simulation(params, scene, counters_enabled=True)
    print(f"INIT {sim.num_fluid_particles} FLUID PARTICLES")

    if args.resume:
        from .utils.checkpoint import load_state

        sim.state = load_state(args.resume, capacity=sim.state.capacity)
        print(f"resumed from {args.resume} at t={sim.time:.4f}s n={sim.num_fluid_particles}")

    vtk = None
    if args.vtk_dir:
        from .utils.vtk import VtkExporter

        vtk = VtkExporter(args.vtk_dir, "adaptive-sph-tpu")

    web = None
    if args.web_dir:
        from .utils.render import boundary_segments
        from .utils.web_export import WebExporter

        web = WebExporter(args.web_dir, scene_width=2.0)
        web.set_boundary_segments(boundary_segments(sim.boundary_handler))

    watch_mtime = None
    if args.watch_config:
        import os as _os

        watch_mtime = _os.path.getmtime(args.watch_config) if _os.path.exists(
            args.watch_config) else 0.0

    step = 0
    try:
        while step < args.max_steps:
            if args.watch_config:
                import os as _os

                m = (_os.path.getmtime(args.watch_config)
                     if _os.path.exists(args.watch_config) else 0.0)
                if m != watch_mtime:
                    watch_mtime = m
                    try:
                        import yaml as _yaml

                        with open(args.watch_config) as f:
                            edits = _yaml.safe_load(f) or {}
                        # full layer stack: base + --overwrite-config-file,
                        # THEN the live edits on top
                        sim.update_params(load_params(
                            args.simulation_config,
                            overwrite_path=args.overwrite_config_file,
                            update_attributes=edits))
                        print(f"live params reloaded from {args.watch_config}")
                    except Exception as e:  # a mid-edit/bad YAML keeps old params
                        print(f"live params reload failed (keeping old): {e}",
                              file=sys.stderr)
            diag = sim.step()
            step += 1
            line = (
                f"step {step:05d} t={sim.time:.4f}s dt={float(diag['dt'])*1000:.3f}ms "
                f"n={sim.num_fluid_particles}"
            )
            if "div_iterations" in diag:
                line += f" div-iters={int(diag['div_iterations'])}"
            if "density_iterations" in diag:
                line += f" density-iters={int(diag['density_iterations'])}"
            print(line)
            if vtk is not None and step % args.vtk_every == 0:
                from .utils.render import boundary_segments
                from .utils.snapshot import take_snapshot

                vtk.add_snapshot(
                    sim.time, take_snapshot(sim.state), boundary_segments(sim.boundary_handler)
                )
            if web is not None and step % args.web_every == 0:
                from .ops.kernels import sphere_volume_to_radius
                from .utils.colors import VisualizationParams, colors_for_particles
                from .utils.snapshot import take_snapshot

                snap = take_snapshot(sim.state, sim.params)
                colors = colors_for_particles(snap, sim.params, VisualizationParams())
                import numpy as _np

                radii = _np.asarray(
                    sphere_volume_to_radius(snap["mass"] / sim.params.rest_density, 2)
                )
                web.add_frame(
                    sim.time, snap["position"], radii, (colors * 255).astype("uint8")
                )
            if args.max_seconds is not None and sim.time >= args.max_seconds:
                break
    except SimulationFailed as e:
        print(f"SIMULATION FAILED: {e}", file=sys.stderr)
        return 2
    finally:
        if web is not None:
            web.finalize()
            print(f"web viewer written to {args.web_dir}/index.html")
        if args.checkpoint:
            from .utils.checkpoint import save_state

            save_state(args.checkpoint, sim.state)
        if args.statistics_enabled:
            if sim.params.profile_stages:
                from .utils.profiling import profile_sections

                profile_sections(sim)
            s = stats_mod.write_statistics(sim.counters)
            print(s, end="")
            if args.statistics_path:
                with open(args.statistics_path, "w") as f:
                    f.write(s)
        if args.snapshot_png:
            from .utils.colors import VisualizationParams, colors_for_particles
            from .utils.render import render2d, save_png
            from .utils.snapshot import take_snapshot

            snap = take_snapshot(sim.state, sim.params)
            viz = VisualizationParams()
            colors = colors_for_particles(snap, sim.params, viz)
            img = render2d(
                snap["position"], snap["mass"], sim.params.rest_density, colors,
                sim.boundary_handler,
            )
            save_png(img, args.snapshot_png)
    return 0


if __name__ == "__main__":
    sys.exit(main())
