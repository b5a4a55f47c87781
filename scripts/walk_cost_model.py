"""Fit the walk cost model: time = a*windows + b*slot_area for the fused
builder and the density sweep, by sweeping the query-tile width tq.

Windows barely change with tq (ranges span ~2x TILE at tq=128 so nwin ~ len/64
per row; halving tq halves range lengths but doubles rows), while walked slot
AREA (cand_slots * tq) changes a lot — so timing across tq separates the
per-window control cost (a) from the per-slot VPU cost (b). This decides
whether a lower-control-overhead kernel would let narrow tiles win their
~6x pair-validity advantage (see PERFORMANCE.md occupancy note).

Usage (on TPU): python scripts/walk_cost_model.py [16 32 64 128]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def window_stats(sim):
    import jax
    import jax.numpy as jnp

    from adaptive_sph_tpu.ops import kernels
    from adaptive_sph_tpu.ops.pallas_matvec import TILE, _levels_meta
    from adaptive_sph_tpu.ops.tiles import build_tiles, sort_fields, window_meta

    st, params, tcfg = sim.state, sim.params, sim.tile_cfg
    h = jnp.asarray(kernels.smoothing_length_from_mass(st.mass, params.rest_density, 2))
    bins = jax.jit(lambda p: build_tiles(p, h * jnp.float32(tcfg.mscale), h,
                                         st.alive, tcfg))(st.position)
    stt = jax.jit(lambda: sort_fields(bins, [st.position, h, st.mass, h]))()
    wm = np.asarray(jax.jit(lambda: window_meta(tcfg, bins, stt))())
    starts = np.asarray(bins.cell_starts)
    lmeta = _levels_meta(tcfg)
    NT = tcfg.capacity // tcfg.tq
    NL = len(tcfg.populated)
    nwins = 0
    slots = 0
    for t in range(NT):
        for li, lm in enumerate(lmeta):
            mb = (t * NL + li) * 4
            ylo, nrows, xlo, xhi = wm[mb], wm[mb + 1], wm[mb + 2], wm[mb + 3]
            for r in range(nrows):
                y = ylo + r
                base = lm["coff"] + y * lm["nx"]
                lo = starts[base + xlo]
                hi = starts[base + xhi + 1]
                if hi > lo:
                    a0 = (lo // 8) * 8
                    nw = -(-(hi - a0) // TILE)
                    nwins += int(nw)
                    slots += int(nw) * TILE
    return nwins, slots * tcfg.tq, (bins, stt, wm, tcfg)


def main():
    import os

    import jax
    import jax.numpy as jnp

    from bench import build_sim
    from adaptive_sph_tpu.models import tile_physics as tp
    from adaptive_sph_tpu.models.grid_step import physics_scale
    from adaptive_sph_tpu.ops.pallas_matvec import build_weight_cache_prep, weight_matvec
    from adaptive_sph_tpu.ops.pallas_sweeps import run_sweep
    from adaptive_sph_tpu.utils.profiling import scan_time

    tqs = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
    rows = []
    for tq in tqs:
        os.environ["ASPH_TQ"] = str(tq)
        sim = build_sim(replicas=1)
        params, tcfg = sim.params, sim.tile_cfg
        if tcfg.tq != tq:
            print(f"tq={tq}: capacity rejected (got {tcfg.tq}); skipping")
            continue
        nwin, area, (bins, stt, wm, _) = window_stats(sim)
        pscale = float(physics_scale(params))

        t_den = scan_time(
            lambda s: run_sweep(tcfg, bins, s, None, tp.DENSITY_OP, pscale, wmeta=wm),
            stt,
        )
        dyn = jnp.zeros((tcfg.capacity, 3), jnp.float32) + 1.0
        wdtype = jnp.bfloat16 if params.weight_cache_bf16 else jnp.float32

        def builder(s, d):
            return build_weight_cache_prep(
                tcfg, bins, s, d, pscale, tcfg.b_max, "wcsph",
                params.viscosity, wmeta=wm, wdtype=wdtype)[3]

        t_bld = scan_time(builder, stt, dyn)
        wc, wmb, wcnt, _ = jax.jit(builder2 := (lambda s, d: build_weight_cache_prep(
            tcfg, bins, s, d, pscale, tcfg.b_max, "wcsph", params.viscosity,
            wmeta=wm, wdtype=wdtype)))(stt, dyn)
        p = jnp.ones((tcfg.capacity,), jnp.float32)
        t_acc = scan_time(
            lambda v, w, m, c: weight_matvec(w, m, c, v[:, None], tcfg.tq, k_out=2)[0],
            p, wc, wmb, wcnt)
        t_div = scan_time(
            lambda v, w, m, c: weight_matvec(w, m, c, (v, v), tcfg.tq, k_out=1),
            p, wc, wmb, wcnt)
        blocks = int(np.asarray(wcnt)[0])
        rows.append((tq, nwin, area, blocks, t_den, t_bld, t_acc, t_div,
                     tcfg.capacity))
        print(f"tq={tq:4d} windows={nwin:6d} slot_area={area/1e6:7.2f}M "
              f"blocks={blocks:5d} density={t_den*1e3:7.3f}ms "
              f"builder={t_bld*1e3:7.3f}ms accel={t_acc*1e3:7.3f}ms "
              f"div={t_div*1e3:7.3f}ms", flush=True)

    if len(rows) >= 3:
        # least-squares fit t = c*tiles + a*windows + b*area for each walk
        # (tiles = C/tq: the kernels' query-tile loop runs for every tile,
        # occupied or not; streams loop blocks only)
        C = rows[0][8]
        A = np.array([[C // r[0], r[1], r[2]] for r in rows], np.float64)
        for k, name in ((4, "density"), (5, "builder"), (6, "accel"), (7, "div")):
            y = np.array([r[k] for r in rows], np.float64)
            coef, *_ = np.linalg.lstsq(A, y, rcond=None)
            print(f"{name:8s}: {coef[0]*1e9:8.1f} ns/tile + "
                  f"{coef[1]*1e9:8.1f} ns/window + {coef[2]*1e12:8.3f} ps/slot")


if __name__ == "__main__":
    main()
