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
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def scan_time(fn, st, iters=20):
    """Differential cost of one fn(st) inside a scanned dispatch (see
    tile_timing.py: tunnel dispatch latency cancels between 1x and 3x scans)."""

    def make(length):
        @jax.jit
        def run(s0):
            def body(carry, _):
                s = carry
                out = fn(s)[0]
                return out, None

            final, _ = jax.lax.scan(body, s0, None, length=length)
            return final

        return run

    short, long = make(iters), make(3 * iters)
    jax.block_until_ready(short(st))
    jax.block_until_ready(long(st))
    t0 = time.perf_counter()
    jax.block_until_ready(short(st))
    t1 = time.perf_counter()
    jax.block_until_ready(long(st))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters)


def make_fixed_jacobi(k: int, final_accel: bool):
    from adaptive_sph_tpu.models.solver import SolveResult
    from adaptive_sph_tpu.models import tile_physics as tp

    def fixed_jacobi(accel_fn, div_fn, aii, src, alive, max_avg_error,
                     residual_type, params, dt, rho, p0=None,
                     psum=lambda x: x, pmax=lambda x: x):
        total = aii.shape[0]
        singular = jnp.abs(aii) < 1e-10
        aii_safe = jnp.where(singular, 1.0, aii)
        w = jnp.float32(params.jacobi_omega)
        p = jnp.zeros(total, jnp.float32) if p0 is None else jnp.maximum(p0, 0.0)

        def body(p, _):
            a_p = div_fn(accel_fn(p))
            p_next = jnp.maximum(p + w * (src - a_p) / aii_safe, 0.0)
            return jnp.where(singular, 0.0, p_next), None

        if k > 0:
            p, _ = jax.lax.scan(body, p, None, length=k)
        fa = accel_fn(p) if final_accel else jnp.zeros((total, 2), jnp.float32)
        z = jnp.zeros(total, jnp.float32)
        return SolveResult(
            pressure=p, pressure_accel=fa, density_error=z,
            iterations=jnp.int32(k), avg_error=jnp.float32(0.0),
            max_error=jnp.float32(0.0), normal_count=jnp.int32(0),
            singular_count=jnp.int32(0), negative_count=jnp.int32(0),
        )

    return fixed_jacobi


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
