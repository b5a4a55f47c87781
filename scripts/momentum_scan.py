"""Scan jacobi_momentum on the stress scene under COLD-start semantics.

For each beta: run the same 384 steps (after a shared 64-step settle) and
report wall ms/step, average+max Jacobi iteration counts, capped solves, and
the worst avg-error observed — the convergence contract must hold at every
beta (a violation is a solve that exits below the cap above tolerance; the
gate logic of scripts/scenario_gates.py).

Usage: python scripts/momentum_scan.py [beta ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/asph_jax_cache")
os.environ["ASPH_BENCH_COLD"] = "1"

import numpy as np


def run(beta, steps=384, settle=64):
    import bench

    sim = bench.build_sim(replicas=1, momentum=beta)
    sim.step_chunk(settle)
    sim.step_chunk(1)  # ensure chunk compiled before timing
    t0 = time.perf_counter()
    done = 0
    stats = {"den": [], "div": [], "dt": [], "den_err": [], "div_errdt": []}
    capped = 0
    cap = int(sim.params.max_iters)
    while done < steps:
        d = sim.step_chunk(min(128, steps - done))
        nd = len(np.atleast_1d(np.asarray(d["dt"])))
        done += nd
        for k, key in (("den", "density_iterations"), ("div", "div_iterations")):
            v = np.atleast_1d(np.asarray(d[key]))
            stats[k].extend(v.tolist())
            capped += int((v >= cap).sum())
        dt = np.atleast_1d(np.asarray(d["dt"], np.float64))
        stats["dt"].extend(dt.tolist())
        de = np.abs(np.atleast_1d(np.asarray(d["density_avg_error"], np.float64)))
        stats["den_err"].extend(de[~np.isnan(de)].tolist())
        dv = np.abs(np.atleast_1d(np.asarray(d["div_avg_error"], np.float64)))
        m = ~np.isnan(dv)
        stats["div_errdt"].extend((dv[m] * dt[m]).tolist())
    wall = time.perf_counter() - t0
    print(
        f"beta={beta:.2f}: {wall/done*1000:6.2f} ms/step  "
        f"den_iters avg {np.mean(stats['den']):6.2f} max {max(stats['den']):4d}  "
        f"div_iters avg {np.mean(stats['div']):6.2f} max {max(stats['div']):4d}  "
        f"capped={capped}  "
        f"max|den_err| {max(stats['den_err'], default=float('nan')):.2e} "
        f"(tol {sim.params.hybrid_dfsph_max_avg_density_error:.0e})  "
        f"max|div_err*dt| {max(stats['div_errdt'], default=float('nan')):.2e} "
        f"(tol {sim.params.hybrid_dfsph_max_avg_divergence_error:.0e})",
        flush=True,
    )


def main():
    betas = [float(b) for b in sys.argv[1:]] or [0.0, 0.5, 0.7, 0.85]
    for b in betas:
        run(b)


if __name__ == "__main__":
    main()
