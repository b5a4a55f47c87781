"""Stage-level timing on the current backend/device (reference stage names).

Mirrors the reference's PerformanceCounters sections for BASELINE.md comparability:
neighborhood (binning), level-estimation, div-solver, density-solver, adaptivity.
Each stage is jitted separately with a forced sync, so numbers include per-dispatch
overhead — the fused full step (bench.py) is the real production path.

Usage: python scripts/stage_timing.py [scene] ; scene in {stress, dam}
"""

import sys
import time

import jax
import jax.numpy as jnp


def sync_time(fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    # force a real completion barrier through a host transfer
    jax.tree.map(lambda a: None, jax.device_get(jax.tree.map(lambda x: x[..., :1] if hasattr(x, 'ndim') and x.ndim else x, out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    jax.tree.map(lambda a: None, jax.device_get(jax.tree.map(lambda x: x[..., :1] if hasattr(x, 'ndim') and x.ndim else x, out)))
    return (time.perf_counter() - t0) / iters, out


def main():
    from bench import build_sim
    from adaptive_sph_tpu.ops.grid import build_bins, scatter_field
    from adaptive_sph_tpu.runner import grid_config_for
    from adaptive_sph_tpu.models import grid_physics as gp
    from adaptive_sph_tpu.models import boundary as bnd
    from adaptive_sph_tpu.models.grid_step import max_scale, physics_scale

    sim = build_sim(replicas=1)
    st, params = sim.state, sim.params
    gcfg = grid_config_for(params, sim.scene, st, st.capacity)
    print(f"grid: L={gcfg.levels} populated={gcfg.populated} dims0={gcfg.dims(0)} "
          f"mpc={gcfg.mpc} slots={gcfg.level_offsets[1]}")

    from adaptive_sph_tpu.ops import kernels
    h = jnp.asarray(kernels.smoothing_length_from_mass(st.mass, params.rest_density, 2))

    t, bins = sync_time(
        jax.jit(lambda p, hh, a: build_bins(p, hh * max_scale(params), a, gcfg)),
        st.position, h, st.alive,
    )
    print(f"neighborhood (binning): {t*1000:.2f} ms")

    sf = {
        "pos": scatter_field(bins, gcfg, st.position),
        "h": scatter_field(bins, gcfg, h),
        "mass": scatter_field(bins, gcfg, st.mass),
    }
    pscale = jnp.float32(physics_scale(params))

    t, rho = sync_time(jax.jit(lambda f: gp.density_slots(gcfg, bins, f, pscale)), sf)
    print(f"density sweep: {t*1000:.2f} ms")
    sf["rho"] = jnp.maximum(rho, 0.1)

    bh = sim.boundary_handler
    bt = jax.jit(lambda p: bh.update_after_advect(p, h, params))(st.position)
    bst = bnd.solver_terms(bt, st.position, h, params)
    G = scatter_field(bins, gcfg, bst.G)

    t, _ = sync_time(
        jax.jit(lambda f: gp.aii_slots(gcfg, bins, f, pscale, G, bt.kind, params)), sf
    )
    print(f"a_ii sweep: {t*1000:.2f} ms")

    p0 = jnp.zeros_like(sf["h"])

    def sweep(f, p):
        acc = gp.pressure_accel_slots(gcfg, bins, f, pscale, p, G, bt.kind, params)
        return gp.divergence_slots(
            gcfg, bins, f, pscale, acc, jnp.zeros(2, jnp.float32), G, bt.kind, params
        )

    t, _ = sync_time(jax.jit(sweep), sf, p0)
    print(f"one Jacobi sweep (accel+divergence): {t*1000:.2f} ms")


if __name__ == "__main__":
    main()
