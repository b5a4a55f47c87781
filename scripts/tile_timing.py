"""Per-piece timing of the tile-backend step on the current device.

Each piece is repeated inside one jitted lax.scan dispatch with a data
dependency between iterations (stops XLA hoisting the loop-invariant body),
and the cost is taken as the DIFFERENTIAL between a long and a short scan:
one dispatch through the axon tunnel costs ~30 ms of host latency, which
divided by a fixed iteration count masquerades as a ~0.6 ms/iter floor (the
round-2 profile suffered exactly this).
Usage: python scripts/tile_timing.py [replicas] [--fast]
(--fast skips the resident/hybrid solver sections and the cold-start variant)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from adaptive_sph_tpu.utils.profiling import scan_time  # noqa: E402


def main():
    sys.path.insert(0, ".")
    from bench import build_sim
    from adaptive_sph_tpu.models import boundary as bnd
    from adaptive_sph_tpu.models import tile_physics as tp
    from adaptive_sph_tpu.models.grid_step import physics_scale
    from adaptive_sph_tpu.ops import kernels
    from adaptive_sph_tpu.ops.pallas_matvec import build_weight_cache, weight_matvec
    from adaptive_sph_tpu.ops.pallas_sweeps import run_sweep
    from adaptive_sph_tpu.ops.tiles import build_tiles, sort_fields, unsort, window_meta

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1
    fast = "--fast" in sys.argv
    sim = build_sim(replicas=replicas)
    st, params, tcfg = sim.state, sim.params, sim.tile_cfg
    print(f"tcfg: C={tcfg.capacity} tq={tcfg.tq} levels={tcfg.populated} "
          f"b_max={tcfg.b_max} n={int(st.n)}")

    h = jnp.asarray(kernels.smoothing_length_from_mass(st.mass, params.rest_density, 2))
    pscale = float(physics_scale(params))

    t = scan_time(
        lambda p: build_tiles(p, h * jnp.float32(tcfg.mscale), h, st.alive, tcfg),
        st.position,
        feedback=lambda b: jnp.sum(b.perm).astype(jnp.float32) * 0.0,
    )
    print(f"build_tiles (sort+csr):   {t*1000:7.3f} ms")

    bins = jax.jit(lambda p: build_tiles(p, h * jnp.float32(tcfg.mscale), h, st.alive, tcfg))(st.position)
    fields = [st.position, h, st.mass, h, st.velocity, st.omega,
              st.level, st.has_level.astype(jnp.float32),
              st.size_class.astype(jnp.float32)]
    flat_fields = jnp.concatenate(
        [f[:, None] if f.ndim == 1 else f for f in fields], axis=1
    ).astype(jnp.float32)

    t = scan_time(lambda ff: sort_fields(bins, [ff]), flat_fields)
    print(f"sort_fields (row gather): {t*1000:7.3f} ms")

    allsorted = jax.jit(lambda ff: sort_fields(bins, [ff]))(flat_fields)
    stt = allsorted[:, 0:4]

    t = scan_time(lambda s: window_meta(tcfg, bins, s), stt)
    print(f"window_meta:              {t*1000:7.3f} ms")
    wm = jax.jit(lambda s: window_meta(tcfg, bins, s))(stt)

    def bterms(s):
        pos_s = s[:, 0:2]
        h_safe = jnp.maximum(s[:, 2], 1e-6)
        bt = sim.boundary_handler.update_after_advect(pos_s, h_safe, params)
        bst = bnd.solver_terms(bt, pos_s, h_safe, params)
        return bst.G, bnd.density_boundary_term(bt, pos_s, h_safe, params)

    t = scan_time(bterms, stt)
    print(f"boundary terms:           {t*1000:7.3f} ms")

    def mk(op, dyn_cols):
        def f(s):
            dyn = None
            if dyn_cols:
                dyn = jnp.stack([s[:, c] for c in dyn_cols], axis=1)
            return run_sweep(tcfg, bins, s[:, 0:4], dyn, op, pscale, wmeta=wm)
        return f

    t = scan_time(mk(tp.DENSITY_OP, None), allsorted)
    print(f"density sweep:            {t*1000:7.3f} ms")

    t = scan_time(mk(tp.prep_op(params), [2, 5, 6]), allsorted)
    print(f"prep sweep (aii+visc):    {t*1000:7.3f} ms")

    t = scan_time(mk(tp.visc_op(params), [2, 5, 6]), allsorted)
    print(f"visc sweep:               {t*1000:7.3f} ms")

    t = scan_time(
        lambda s: build_weight_cache(tcfg, bins, s, pscale, tcfg.b_max, wmeta=wm), stt
    )
    wc, wmb, wcnt = jax.jit(
        lambda s: build_weight_cache(tcfg, bins, s, pscale, tcfg.b_max, wmeta=wm)
    )(stt)
    print(f"build_weight_cache:       {t*1000:7.3f} ms  (blocks={int(wcnt[0])}, "
          f"dropped={int(wcnt[1])}, b_max={tcfg.b_max})")

    p = jnp.ones((tcfg.capacity,), jnp.float32)
    t = scan_time(
        lambda v, w, m, c: weight_matvec(w, m, c, v[:, None], tcfg.tq, k_out=2)[0],
        p, wc, wmb, wcnt,
    )
    print(f"matvec accel (k_out=2):   {t*1000:7.3f} ms")

    q = jnp.ones((tcfg.capacity,), jnp.float32)
    t = scan_time(
        # channel-split operands like the production div_fn (no (C, 2) stack)
        lambda v, w, m, c: weight_matvec(w, m, c, (v, v), tcfg.tq, k_out=1),
        q, wc, wmb, wcnt,
    )
    print(f"matvec div (k_out=1):     {t*1000:7.3f} ms")
    t = scan_time(
        # the old interleaved form, for comparison (stack + (C, 2) operand)
        lambda v, w, m, c: weight_matvec(w, m, c, jnp.stack([v, v], axis=1),
                                         tcfg.tq, k_out=1),
        q, wc, wmb, wcnt,
    )
    print(f"matvec div (interleaved): {t*1000:7.3f} ms")

    t = scan_time(lambda s: unsort(bins, s, None, 0.0), allsorted)
    print(f"unsort (row gather):      {t*1000:7.3f} ms")

    # whole-solve comparison: streamed per-matvec path vs the resident kernel
    # (ops/pallas_jacobi.py). Fixed synthetic source/aii so the trip counts are
    # identical between scan iterations; the data dependency threads p0.
    rho1 = jnp.full((tcfg.capacity,), params.rest_density, jnp.float32)
    rinv1 = 1.0 / rho1
    zc = jnp.zeros((tcfg.capacity,), jnp.float32)
    alive1 = stt[:, 2] > 0.0
    aii1 = jnp.where(alive1, -1.0, 0.0)
    src1 = jnp.where(alive1, -0.05, 0.0)
    dt1 = jnp.float32(1e-3)

    if fast:
        t = scan_time(
            lambda s: sim.step_fn(s)[0],
            st,
            feedback=lambda o: jnp.sum(o.position).astype(jnp.float32) * 0.0,
            iters=20,
        )
        print(f"FULL STEP (scanned):      {t*1000:7.3f} ms")
        return

    def resident_solve(p0, w, m, c):
        # src1 + 0*p0: threads the scan carry through a KERNEL input — without
        # it the whole Pallas call is loop-invariant and XLA hoists it out of
        # the timing scan (measures as ~0)
        res = tp.tile_jacobi_resident(
            w, m, c, tcfg.tq, tcfg.b_max, aii1, src1 + 0.0 * p0, alive1,
            0.0005, tp.DENSITY_ERROR, params, dt1, rho1, rinv1,
            zc, zc, None, None, zc, zc, "none",
        )
        return p0 + 0.0 * res.pressure

    t = scan_time(resident_solve, zc, wc, wmb, wcnt, iters=8)
    it_r = int(jax.device_get(jax.jit(
        lambda w, m, c: tp.tile_jacobi_resident(
            w, m, c, tcfg.tq, tcfg.b_max, aii1, src1, alive1,
            0.0005, tp.DENSITY_ERROR, params, dt1, rho1, rinv1,
            zc, zc, None, None, zc, zc, "none").iterations
    )(wc, wmb, wcnt)))
    print(f"resident solve:           {t*1000:7.3f} ms  (iters={it_r})")

    def streamed_solve(p0, w, m, c):
        src_dep = src1 + 0.0 * p0  # same hoisting guard as resident_solve

        def accel_fn(p):
            u = p * rinv1 * rinv1
            mvx, mvy = weight_matvec(w, m, c, u[:, None], tcfg.tq, k_out=2)
            return -u * zc - mvx, -u * zc - mvy

        def div_fn(qx, qy):
            s = weight_matvec(w, m, c, (qx, qy), tcfg.tq, k_out=1)
            return (s - (qx * zc + qy * zc)) * rinv1

        res = tp.tile_jacobi(accel_fn, div_fn, aii1, src_dep, alive1, 0.0005,
                             tp.DENSITY_ERROR, params, dt1, rho1)
        return p0 + 0.0 * res.pressure

    t = scan_time(streamed_solve, zc, wc, wmb, wcnt, iters=8)
    print(f"streamed solve:           {t*1000:7.3f} ms")

    def hybrid_resident(p0, w, m, c):
        res_div, res_den, v2x, v2y, src2 = tp.tile_hybrid_resident(
            w, m, c, tcfg.tq, tcfg.b_max, aii1, alive1, params, dt1, rho1,
            rinv1, zc, zc, None, None, zc, zc, "none", p0, p0,
            den_with_div=True,
        )
        return p0 + 0.0 * res_den.pressure

    t = scan_time(hybrid_resident, zc, wc, wmb, wcnt, iters=8)
    print(f"hybrid solver section:    {t*1000:7.3f} ms  (both solves + src)")

    t = scan_time(
        lambda s: sim.step_fn(s)[0],
        st,
        feedback=lambda o: jnp.sum(o.position).astype(jnp.float32) * 0.0,
        iters=20,
    )
    print(f"FULL STEP (scanned):      {t*1000:7.3f} ms")

    # cold-start variant: the warm/cold iteration-count difference gives the
    # IN-CONTEXT cost of one Jacobi iteration (accel+div streams + glue).
    # Must run on an EVOLVED state — the initial state has zero pressure, so
    # warm and cold are identical there.
    import dataclasses as _dc

    sim.step_chunk(24)
    st = sim.state
    simc = build_sim(replicas=1)
    simc.params = _dc.replace(simc.params, warm_start_pressure=False)
    from adaptive_sph_tpu.models.simulation import make_step_fn
    step_c = make_step_fn(simc.params, simc.ncfg, simc.boundary_handler,
                          grid_cfg=None, tile_cfg=simc.tile_cfg)
    t = scan_time(
        lambda s: sim.step_fn(s)[0],
        st,
        feedback=lambda o: jnp.sum(o.position).astype(jnp.float32) * 0.0,
        iters=20,
    )
    print(f"FULL STEP (evolved st):   {t*1000:7.3f} ms")
    dw = jax.device_get(sim.step_fn(st)[1])
    dc = jax.device_get(step_c(st)[1])
    iters_w = int(dw.get("div_iterations", 0)) + int(dw.get("density_iterations", 0))
    iters_c = int(dc.get("div_iterations", 0)) + int(dc.get("density_iterations", 0))
    tc = scan_time(
        lambda s: step_c(s)[0],
        st,
        feedback=lambda o: jnp.sum(o.position).astype(jnp.float32) * 0.0,
        iters=20,
    )
    print(f"FULL STEP cold-start:     {tc*1000:7.3f} ms  "
          f"(iters {iters_c} vs {iters_w} warm -> "
          f"{(tc-t)*1000/max(iters_c-iters_w,1):.3f} ms/Jacobi-iter in context)")


if __name__ == "__main__":
    main()
