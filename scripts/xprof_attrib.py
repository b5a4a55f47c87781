"""Device-op attribution of the bench step from a jax.profiler trace.

Traces a 48-step single-dispatch chunk of the bench sim, parses the perfetto
trace.json.gz the profiler writes, and aggregates device-lane op durations by
name/category — the truthful replacement for scan-differential micro-probes,
whose <100 us bodies drown in axon-tunnel dispatch variance (two consecutive
runs of the same 5-call chain measured 728 and 32 us/call).

Usage: python scripts/xprof_attrib.py [steps]   (+ the usual ASPH_BENCH_* env)
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name):
    n = name.lower()
    if "custom-call" in n or any(k in n for k in (
            "build_prep", "matvec", "visc", "sweep", "jacobi", "pallas")):
        return "pallas/custom-call"
    if n.startswith("fusion") or ".fusion" in n or "loop_" in n:
        return "fusion"
    if "copy" in n or "bitcast" in n or "transpose" in n:
        return "copy/format"
    if "dynamic-update" in n or "dynamic_update" in n:
        return "dus"
    if "scatter" in n or "gather" in n:
        return "scatter/gather"
    if "sort" in n:
        return "sort"
    if "slice" in n or "pad" in n:
        return "slice/pad"
    if "reduce" in n or "all-reduce" in n:
        return "reduce"
    if "convert" in n or "select" in n or "broadcast" in n:
        return "elementwise"
    return "other"


def main():
    import jax

    from bench import build_sim

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    sim = build_sim(replicas=1)
    sim.step()
    sim.step_chunk(steps)  # compile outside the trace

    logdir = "/tmp/asph_xprof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        sim.step_chunk(steps)

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace written under {logdir}"
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)

    # device lanes: pick the process/threads with TensorFlow Op-like names on
    # a TPU device track (axon shows up as 'TPU' / '/device:TPU:0')
    pid_names = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "Device" in n}
    by_op = defaultdict(float)
    total = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("prog", "Infeed", "Outfeed")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_op[name] += dur
        total += dur

    n = sim.num_fluid_particles
    print(f"device pids: { {p: pid_names[p] for p in dev_pids} }")
    print(f"total device op time: {total:.2f} ms over {steps} steps "
          f"= {total/steps:.3f} ms/step (n={n})\n")
    cats = defaultdict(float)
    for name, ms in by_op.items():
        cats[categorize(name)] += ms
    print("per category (ms/step):")
    for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {c:20s} {ms/steps:7.3f}")
    print("\ntop 30 ops (ms/step):")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms/steps:7.4f}  {name[:110]}")


if __name__ == "__main__":
    main()
