"""Smoke-run every media export config at tiny sizes.

Each reference media/*.yaml counterpart in configs/media/ is loaded through the
real image-export pipeline (utils/animation.py) with its target time clipped and
the image resolution shrunk, so schema regressions and backend/config
incompatibilities surface without hours of simulation.

Usage: python scripts/smoke_media.py [--time 0.02] [--only name ...]
Writes images to /tmp/asph_media_smoke; prints one OK/FAIL line per entry.
"""

import argparse
import glob
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", type=float, default=0.02)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--media-dir", default="configs/media")
    args = ap.parse_args()

    from adaptive_sph_tpu.utils import animation

    out_dir = "/tmp/asph_media_smoke"
    os.makedirs(out_dir, exist_ok=True)
    failures = []
    # scene-only yamls (no export entries) are referenced by other configs
    scene_only = {"motivation-scene.yaml", "motivation-scene2.yaml",
                  "ratio-stress-test-scene.yaml", "resampling-gravity-free-scene.yaml",
                  "scene-nearly-rest.yaml", "scene-ratio2to1.yaml",
                  "winchenbach-instable-scene.yaml"}

    for path in sorted(glob.glob(os.path.join(args.media_dir, "*.yaml"))):
        name = os.path.basename(path)
        if name in scene_only:
            continue
        if args.only and not any(o in name for o in args.only):
            continue
        base_dir = os.path.dirname(os.path.abspath(path))
        with open(path) as f:
            cfgs = yaml.safe_load(f)
        if not isinstance(cfgs, list):
            print(f"SKIP {name}: not an export list")
            continue
        for i, cfg in enumerate(cfgs):
            cfg = dict(cfg)
            if float(cfg["time"]) > args.time:
                cfg.pop("panic_on_end", None)  # clipping ends before the export window
            cfg["time"] = min(float(cfg["time"]), args.time)
            if cfg.get("video_start_time") is not None:
                cfg["video_start_time"] = 0.0
                cfg["video_fps"] = 30.0
            cfg["image_width"] = 160
            cfg["image_height"] = 160
            png = os.path.basename(str(cfg.get("png_file", f"{name}-{i}.png")))
            cfg["png_file"] = os.path.join(out_dir, png)
            try:
                animation._export_one(cfg, base_dir)
                print(f"OK   {name}[{i}] -> {png}", flush=True)
            except Exception as e:
                failures.append((name, i, repr(e)))
                print(f"FAIL {name}[{i}]: {e!r}", flush=True)
                if os.environ.get("ASPH_SMOKE_TRACE"):
                    traceback.print_exc()

    print(f"\n{len(failures)} failures")
    for f in failures:
        print("  ", f)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
