"""In-context knockout timing: where does the full tile step's time go?

Piecewise differential timings (scripts/tile_timing.py) sum to ~2.6 ms but the
full step measures ~4.4 ms. This script times FULL-STEP variants with the
pressure solver monkeypatched (fixed iteration counts / skipped entirely), so
every number is the real in-context cost including XLA's actual fusion choices:

  full            the production step (dynamic while_loop solves)
  fixed-k2        both solves run exactly 2 Jacobi iterations via lax.scan
  fixed-k4        ... 4 iterations (marginal per-iteration cost = (k4-k2)/4)
  no-solve        solves return p=p0 immediately (one final accel stream each)
  no-solve-accel  solves return zeros without the final accel stream

Usage: python scripts/step_knockout.py
"""

import sys

sys.path.insert(0, ".")

from adaptive_sph_tpu.utils.profiling import (  # noqa: E402
    _fixed_jacobi as make_fixed_jacobi,
    scan_time_step as scan_time,
)


def main():
    from bench import build_sim
    from adaptive_sph_tpu.models import tile_physics as tp
    from adaptive_sph_tpu.models.simulation import make_step_fn

    sim = build_sim(replicas=1)
    sim.step_chunk(24)  # evolved state: realistic pressures/velocities
    st = sim.state
    print(f"n={int(st.n)} C={sim.tile_cfg.capacity} tq={sim.tile_cfg.tq}")

    t_full = scan_time(sim.step_fn, st)
    print(f"full step (while_loop solves): {t_full*1000:7.3f} ms")

    real = tp.tile_jacobi
    try:
        for label, k, fa in (("fixed-k2", 2, True), ("fixed-k4", 4, True),
                             ("no-solve", 0, True), ("no-solve-accel", 0, False)):
            tp.tile_jacobi = make_fixed_jacobi(k, fa)
            fn = make_step_fn(sim.params, sim.ncfg, sim.boundary_handler,
                              grid_cfg=None, tile_cfg=sim.tile_cfg)
            t = scan_time(fn, st)
            print(f"{label:<30s} {t*1000:7.3f} ms")
    finally:
        tp.tile_jacobi = real


if __name__ == "__main__":
    main()
