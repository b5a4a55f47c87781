"""Production per-stage profiling: the reference's section names into `.stat`.

The reference wraps each pipeline stage in PerformanceCounters sections
(simulation.rs:1993-2069): simulation-step, neighborhood, level-estimation,
div-solver, density-solver, adaptivity. On TPU the whole step is ONE fused XLA
program, so in-step wall timers cannot exist; when `params.profile_stages` is
set the runner instead measures each section post-run against the CURRENT
(evolved) state:

  simulation-step   differential scanned cost of the production step
  neighborhood      piecewise: build_tiles + sort_fields + window_meta
                    (the sorted-tile structure build, ops/tiles.py)
  adaptivity        knockout: step  -  step(merge/share/split off)
  level-estimation  knockout: step(adaptivity off, levels forced)
                              -  step(adaptivity off, levels off)
  div-solver /      marginal Jacobi-iteration cost from fixed-k knockouts
  density-solver    (k=2 vs k=4)  x  the measured average iteration count,
                    + the final pressure-accel recompute (k=0 accel-on vs off)

All timings use the two-length scan differential so per-dispatch tunnel
latency cancels (PERFORMANCE.md "measurement methodology"). Knockout variants
recompile the step (a few x ~20-40 s on the tunnel) — that is why this is
opt-in. Sections are attributed, not nested: neighborhood/level/solver/
adaptivity do not sum exactly to simulation-step (XLA fuses across stages);
the residual is solver glue + integration, which the reference folds into
simulation-step as well.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


ITERS = 50


def scan_time(fn, *args, iters=ITERS, feedback=None):
    """Differential cost of one fn(*args) inside a scanned dispatch.

    Times scans of length `iters` and `3*iters` and returns
    (t_long - t_short) / (2*iters): per-dispatch tunnel latency cancels.
    feedback: optional (out -> scalar f32) used to perturb args[0] each
    iteration (x * (1 + 0*s)) so the body can't be hoisted by XLA.
    """

    def dep_scalar(out):
        leaf = jax.tree.leaves(out)[0]
        return jnp.sum(leaf).astype(jnp.float32) * 0.0

    fb = feedback or dep_scalar

    def make(length):
        @jax.jit
        def run(*a):
            def body(carry, _):
                s = carry
                a0p = jax.tree.map(
                    lambda x: x * (1.0 + s) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    a[0],
                )
                out = fn(a0p, *a[1:])
                return fb(out), None

            final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
            return final

        return run

    short, long = make(iters), make(3 * iters)
    jax.block_until_ready(short(*args))
    jax.block_until_ready(long(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(short(*args))
    t1 = time.perf_counter()
    jax.block_until_ready(long(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters)


def scan_time_step(step_fn, st, iters=20):
    """Differential cost of one state->state step inside a scanned dispatch."""

    def make(length):
        @jax.jit
        def run(s0):
            def body(carry, _):
                return step_fn(carry)[0], None

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


def _fixed_jacobi(k: int, final_accel: bool):
    """A tile_jacobi stand-in running exactly k sweeps (no convergence test).

    Used to measure the marginal in-context cost of one Jacobi iteration:
    (t[k=4] - t[k=2]) / 2 per solve, including XLA's real fusion choices.
    """
    from ..models.solver import SolveResult

    def fixed(accel_fn, div_fn, aii, src, alive, max_avg_error, residual_type,
              params, dt, rho, p0=None, psum=lambda x: x, pmax=lambda x: x):
        total = aii.shape[0]
        singular = jnp.abs(aii) < 1e-10
        aii_safe = jnp.where(singular, 1.0, aii)
        w = jnp.float32(params.jacobi_omega)
        p = jnp.zeros(total, jnp.float32) if p0 is None else jnp.maximum(p0, 0.0)

        def body(p, _):
            a_p = div_fn(*accel_fn(p))
            p_next = jnp.maximum(p + w * (src - a_p) / aii_safe, 0.0)
            return jnp.where(singular, 0.0, p_next), None

        if k > 0:
            p, _ = jax.lax.scan(body, p, None, length=k)
        z = jnp.zeros(total, jnp.float32)
        fa = accel_fn(p) if final_accel else (z, z)
        return SolveResult(
            pressure=p, pressure_accel=fa, density_error=z,
            iterations=jnp.int32(k), avg_error=jnp.float32(0.0),
            max_error=jnp.float32(0.0), normal_count=jnp.int32(0),
            singular_count=jnp.int32(0), negative_count=jnp.int32(0),
        )

    return fixed


@contextlib.contextmanager
def _patched_jacobi(k: int, final_accel: bool):
    from ..models import tile_physics as tp

    real = tp.tile_jacobi
    tp.tile_jacobi = _fixed_jacobi(k, final_accel)
    try:
        yield
    finally:
        tp.tile_jacobi = real


def _variant_step(sim, params):
    from ..models.simulation import make_step_fn

    return make_step_fn(params, sim.ncfg, sim.boundary_handler,
                        sim.split_patterns, grid_cfg=sim.grid_cfg,
                        tile_cfg=sim.tile_cfg)


def _neighborhood_cost(sim, st, iters):
    """Piecewise differential of the sorted-tile structure build."""
    from ..models.state import h_from_mass_np  # noqa: F401  (documented twin)
    from ..ops import kernels
    from ..ops.tiles import build_tiles, sort_fields, window_meta

    params, tcfg = sim.params, sim.tile_cfg
    h = jnp.asarray(kernels.smoothing_length_from_mass(
        st.mass, params.rest_density, 2))

    def build(p):
        return build_tiles(p, h * jnp.float32(tcfg.mscale), h, st.alive, tcfg)

    t_build = scan_time(
        build, st.position, iters=iters,
        feedback=lambda b: jnp.sum(b.perm).astype(jnp.float32) * 0.0,
    )
    bins = jax.jit(build)(st.position)
    # the production step sorts ~11 f32 columns (tile_step.py field stack)
    cols = [st.position, h, st.mass, h, st.velocity, st.level,
            st.has_level.astype(jnp.float32), st.size_class.astype(jnp.float32)]
    flat = jnp.concatenate(
        [c[:, None] if c.ndim == 1 else c for c in cols], axis=1
    ).astype(jnp.float32)
    t_sort = scan_time(lambda f: sort_fields(bins, [f]), flat, iters=iters)
    statics = jax.jit(lambda f: sort_fields(bins, [f]))(flat)[:, 0:4]
    t_meta = scan_time(lambda s: window_meta(tcfg, bins, s), statics, iters=iters)
    return t_build + t_sort + t_meta


def profile_sections(sim, iters=16):
    """Measure the reference's per-stage sections on `sim`'s CURRENT state and
    record them into sim.counters (so write_statistics emits them).

    Returns {section-name: avg seconds}. Requires the sorted-tile backend (the
    production path); other backends get only simulation-step.
    """
    st = sim.state
    params = sim.params
    out = {}

    t_full = scan_time_step(sim.step_fn, st, iters=iters)
    out["simulation-step(profiled)"] = t_full

    if sim.backend != "tiles" or sim.tile_cfg is None:
        _record(sim, out)
        return out

    out["neighborhood"] = _neighborhood_cost(sim, st, iters)

    adaptive = params.splitting or params.merging or params.sharing
    base_params = params
    if adaptive:
        # keep level estimation in the no-adaptivity variant so the knockout
        # isolates merge/share/split (the reference's "adaptivity" section)
        noad = params.replace(splitting=False, merging=False, sharing=False,
                              force_level_estimation=params.level_estimation_active())
        t_noad = scan_time_step(_variant_step(sim, noad), st, iters=iters)
        out["adaptivity"] = max(t_full - t_noad, 0.0)
        base_params = noad

    if params.level_estimation_active():
        from .params import LevelEstimationMethod

        nolvl = base_params.replace(
            level_estimation_method=LevelEstimationMethod.NoneMethod,
            force_level_estimation=False,
            splitting=False, merging=False, sharing=False,
        )
        t_base = (t_full if not adaptive
                  else scan_time_step(_variant_step(sim, base_params), st, iters=iters))
        t_nolvl = scan_time_step(_variant_step(sim, nolvl), st, iters=iters)
        out["level-estimation"] = max(t_base - t_nolvl, 0.0)

    # marginal Jacobi-iteration cost via fixed-k knockouts on the base step
    from .params import PressureSolverMethod

    method = params.pressure_solver_method
    n_solves = 2 if method == PressureSolverMethod.HybridDFSPH else 1
    with _patched_jacobi(2, True):
        t_k2 = scan_time_step(_variant_step(sim, base_params), st, iters=iters)
    with _patched_jacobi(4, True):
        t_k4 = scan_time_step(_variant_step(sim, base_params), st, iters=iters)
    with _patched_jacobi(0, True):
        t_k0a = scan_time_step(_variant_step(sim, base_params), st, iters=iters)
    with _patched_jacobi(0, False):
        t_k0 = scan_time_step(_variant_step(sim, base_params), st, iters=iters)
    per_iter = max(t_k4 - t_k2, 0.0) / (2 * n_solves)
    accel_base = max(t_k0a - t_k0, 0.0) / n_solves

    # average iteration counts: prefer the run's counters, else one live step
    def avg_of(name):
        xs = sim.counters.values.get(name, [])
        return sum(xs) / len(xs) if xs else None

    div_iters = avg_of("div-iterations")
    den_iters = avg_of("density-iterations")
    if div_iters is None and den_iters is None:
        diag = jax.device_get(sim.step_fn(st)[1])
        div_iters = float(diag.get("div_iterations", 0))
        den_iters = float(diag.get("density_iterations", 0))

    if method in (PressureSolverMethod.HybridDFSPH, PressureSolverMethod.OnlyDivergence):
        out["div-solver"] = per_iter * (div_iters or 0.0) + accel_base
    if method != PressureSolverMethod.OnlyDivergence:
        out["density-solver"] = per_iter * (den_iters or 0.0) + accel_base

    _record(sim, out)
    return out


def _record(sim, sections):
    for name, seconds in sections.items():
        sim.counters.add_time(name, seconds)
