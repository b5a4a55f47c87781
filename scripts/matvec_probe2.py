"""Probe the v7 scalar-g matvec candidates against the production kernel.

The round-4 blocks store [wx | wy] = m_j gradW as TWO lane channels; the v7
candidate stores ONE scalar g = m_j * gmag per pair and reconstructs
wx = g * (qx - cx), wy = g * (qy - cy) in-kernel from the statics table
(bit-identical in f32: same inputs, same f32 ops as the builder) — halving
the streamed bytes per block. Taller windows (WH=128/256) amortize the
per-block fixed cost (meta read, slice addressing, stores) that dominates
once DMA is bf16.

Uses the REAL bench-scene window walk for meta/block counts (fixed-cost vs
DMA tradeoffs are distribution-dependent); block contents are random (timing
only). Variants:

  base       : production _matvec_kernel (64-cand, [wx|wy]) accel mode
  basediv    : production div mode
  s64/s128/s256   : scalar-g accel at WH 64/128/256
  d64/d128/d256   : scalar-g div
  o64 ...    : scalar accel with cnt=0 (fixed overhead incl. operand copies)
  dma64 ...  : DMA-only stream of the scalar blocks

Usage: python scripts/matvec_probe2.py [variants...] (default: all, bf16)
       ASPH_PROBE_F32=1 for f32 blocks.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptive_sph_tpu.ops.tiles import WM_STRIDE  # noqa: E402

META_SHIFT = 18
NBUF = 4


def scan_time(fn, x, *extra, iters=30):
    def make(length):
        @jax.jit
        def run(x, *extra):
            def body(c, _):
                out = fn(c, *extra)
                return jnp.abs(out) * (1.0 - 1e-7) + 1e-30, None

            f, _ = jax.lax.scan(body, x, None, length=length)
            return f

        return run

    short, long = make(iters), make(3 * iters)
    jax.block_until_ready(short(x, *extra))
    jax.block_until_ready(long(x, *extra))
    t0 = time.perf_counter()
    jax.block_until_ready(short(x, *extra))
    t1 = time.perf_counter()
    jax.block_until_ready(long(x, *extra))
    return ((time.perf_counter() - t1) - (t1 - t0)) / (2 * iters)


def _scalar_kernel(cnt_ref, meta_ref, w_hbm, sc_ref, sq_ref, t_ref, *rest,
                   tq: int, wh: int, grp: int, mode: str):
    """Scalar-g blocks (wh cand sublanes x tq query lanes); dx/dy in-kernel.

    mode='accel': t = u (wh,1); out = (sum g*dx*u, sum g*dy*u)
    mode='div'  : t, t2 = tx, ty; out = sum (g*dx)*tx + (g*dy)*ty
    """
    if mode == "div":
        t2_ref, out_ref, scratch, sem = rest
    else:
        (out_ref, scratch, sem), t2_ref = rest, None
    B = cnt_ref[0]
    NG = (B + grp - 1) // grp
    out_ref[:] = jnp.zeros_like(out_ref)

    def get_dma(buf, g):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(g * grp, grp)], scratch.at[buf], sem.at[buf]
        )

    for k in range(NBUF - 1):
        @pl.when(k < NG)
        def _(k=k):
            get_dma(k, k).start()

    acc0 = jnp.zeros((8, tq), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, tq), 0)

    def body(grp_i, carry):
        accA, accB, cur_g8 = carry
        buf = jnp.mod(grp_i, NBUF)

        @pl.when(grp_i + NBUF - 1 < NG)
        def _():
            get_dma(jnp.mod(grp_i + NBUF - 1, NBUF), grp_i + NBUF - 1).start()

        get_dma(buf, grp_i).wait()
        for g in range(grp):
            e = grp_i * grp + g
            e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
            valid = e < B
            me = meta_ref[e_safe]
            qt_e = me >> META_SHIFT
            an_e = me & ((1 << META_SHIFT) - 1)
            g8 = qt_e >> 3
            switch = g8 != cur_g8
            accA = jnp.where(switch, 0.0, accA)
            accB = jnp.where(switch, 0.0, accB)
            cur_g8 = g8
            rowmask = (row == (qt_e & 7)) & valid

            w = scratch[buf, g]  # (wh, tq) scalar g
            if w.dtype != jnp.float32:
                w = w.astype(jnp.float32)
            cs = sc_ref[pl.ds(an_e, wh), :]  # (wh, F) statics
            qs = sq_ref[qt_e]  # (F, tq)
            wx = w * (qs[0:1, :] - cs[:, 0:1])
            wy = w * (qs[1:2, :] - cs[:, 1:2])
            if mode == "accel":
                tv = t_ref[pl.ds(an_e, wh), :]  # (wh, 1)
                ax = jnp.sum(wx * tv, axis=0, keepdims=True)
                ay = jnp.sum(wy * tv, axis=0, keepdims=True)
                accA = accA + jnp.where(rowmask, ax, 0.0)
                accB = accB + jnp.where(rowmask, ay, 0.0)
            else:
                tvx = t_ref[pl.ds(an_e, wh), :]
                tvy = t2_ref[pl.ds(an_e, wh), :]
                c0 = jnp.sum(wx * tvx + wy * tvy, axis=0, keepdims=True)
                accA = accA + jnp.where(rowmask, c0, 0.0)
            base = g8 * 8
            out_ref[0, pl.ds(base, 8), :] = accA
            if mode == "accel":
                out_ref[1, pl.ds(base, 8), :] = accB

        return accA, accB, cur_g8

    @pl.when(B > 0)
    def _():
        jax.lax.fori_loop(
            0, NG, body, (acc0, acc0, (meta_ref[0] >> META_SHIFT) >> 3),
            unroll=False)


def scalar_matvec(w, meta, cnt, sc, sq, t, tq, wh, mode, grp=8):
    C = sc.shape[0]
    NT = C // tq
    NTP = max(8, -(-NT // 8) * 8)
    k_out = 2 if mode == "accel" else 1
    kern = functools.partial(_scalar_kernel, tq=tq, wh=wh, grp=grp, mode=mode)
    t_ops = [t] if mode == "accel" else list(t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(t_ops)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, grp, wh, tq), w.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_out, NTP, tq), jnp.float32),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(cnt, meta, w, sc, sq, *t_ops)
    if k_out == 1:
        return out[0].reshape(NTP * tq)[:C]
    return out[0].reshape(NTP * tq)[:C], out[1].reshape(NTP * tq)[:C]


def derive_meta(wm, starts, emitted64, NT, NL, C, wh):
    """Re-walk the window ranges at window height wh; keep windows containing
    any emitted 64-window (exact nonemptiness: union over members)."""
    metas = []
    for t in range(NT):
        for li in range(NL):
            mb = (t * NL + li) * WM_STRIDE
            for r in range(wm[mb]):
                lo = starts[wm[mb + 1 + 2 * r]]
                hi = starts[wm[mb + 2 + 2 * r]]
                if hi <= lo:
                    continue
                a0 = (lo // 8) * 8
                nw = -(-(hi - a0) // wh)
                for k in range(nw):
                    a = min(a0 + k * wh, C - wh)
                    # both walks subdivide the same range from a0, so the
                    # emitted 64-anchors inside this WH window are a0+64j
                    hit = any((t, min(a0 + 64 * j, C - 64)) in emitted64
                              for j in range(k * wh // 64,
                                             (k + 1) * wh // 64))
                    if hit:
                        metas.append((t << META_SHIFT) + a)
    return np.array(metas, np.int32)


def main():
    from adaptive_sph_tpu.models import scene as scene_mod
    from adaptive_sph_tpu import runner
    from adaptive_sph_tpu.models.grid_step import max_scale, physics_scale
    from adaptive_sph_tpu.ops import kernels
    from adaptive_sph_tpu.ops.pallas_matvec import (GRP, build_weight_cache,
                                                    weight_matvec)
    from adaptive_sph_tpu.ops.tiles import (TileConfig, build_tiles,
                                            sort_fields, window_ranges)
    import adaptive_sph_tpu.utils.params as pm
    from adaptive_sph_tpu.utils.params import SimulationParams

    f32 = os.environ.get("ASPH_PROBE_F32", "0") == "1"
    wdt = jnp.float32 if f32 else jnp.bfloat16

    blocks = [
        {"pos": [0.4, -0.5], "size": [0.55, 1.4], "spacing": 0.4,
         "volume_fill_ratio": 0.93, "velocity": [0, 0]},
        {"pos": [-0.95, -0.5], "size": [0.55, 1.4], "spacing": 0.008,
         "volume_fill_ratio": 0.93, "velocity": [0, 0]},
    ]
    scene = scene_mod.scene_from_dict(
        {"boundary": {"type": "box", "width": 2, "height": 2}, "blocks": blocks}
    )
    params = SimulationParams(merging=False, sharing=False, splitting=False)
    params = pm.init_h_for_uniform(
        params, scene.blocks[0].spacing, scene.blocks[0].volume_fill_ratio
    )
    state = scene_mod.init_fluid_state(scene, params, None)
    host = dict(zip(("mass", "position", "alive"),
                    jax.device_get((state.mass, state.position, state.alive))))
    gcfg = runner.grid_config_for(params, scene, state, state.capacity, host=host)
    tq = runner._tile_tq(state, params, gcfg, host=host)
    tcfg = TileConfig.from_grid(gcfg, max_scale(params), tq=tq)
    C, TQ, NT = tcfg.capacity, tcfg.tq, tcfg.capacity // tq
    NL = len(tcfg.populated)
    print(f"C={C} tq={TQ} NT={NT} b_max={tcfg.b_max} wdtype={wdt.__name__}")

    h = jnp.asarray(kernels.smoothing_length_from_mass(
        state.mass, params.rest_density, 2))
    pscale = float(physics_scale(params))
    bins = jax.jit(lambda p: build_tiles(
        p, h * jnp.float32(tcfg.mscale), h, state.alive, tcfg))(state.position)
    stt = jax.jit(lambda: sort_fields(bins, [state.position, h, state.mass]))()
    wm_j, _ = jax.jit(lambda: window_ranges(tcfg, bins, stt))()
    w64, meta64, cnt64 = jax.jit(lambda: build_weight_cache(
        tcfg, bins, stt, pscale, tcfg.b_max, wmeta=wm_j))()
    nb64 = int(cnt64[0])
    meta_np = np.asarray(meta64)[:nb64]
    emitted64 = {(int(m) >> META_SHIFT, int(m) & ((1 << META_SHIFT) - 1))
                 for m in meta_np}
    wm = np.asarray(wm_j)
    starts = np.asarray(bins.cell_starts)

    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    sc = stt  # (C, F) statics
    sq = jnp.swapaxes(stt.reshape(NT, TQ, -1), 1, 2)  # (NT, F, TQ)

    names = sys.argv[1:] or ["base", "basediv", "s64", "s128", "s256",
                             "d64", "d128", "o64", "o128"]

    # ---- latency attribution: what makes a CHAINED call cost ~3x its
    # standalone time? ----
    if "lat" in names:
        wprod_l = jnp.asarray(
            rng.standard_normal((tcfg.b_max, 64, max(2 * TQ, 128))), wdt)
        cnt_l = jnp.asarray(cnt64)
        cnt_0 = jnp.asarray([0, 0], jnp.int32)
        meta_l = jnp.asarray(meta64)

        def relayout_f(x):  # (C,) -> (C,1) -> consume
            y = x[:, None] * (1.0 + 1e-9)
            return y[:, 0] * 0.5 + x * 0.5
        ms = scan_time(relayout_f, t1) * 1e3
        print(f"{'(C,) -> (C,1) relayout + back':36s} {ms:7.3f} ms")

        def c1_elem_f(x):  # elementwise chain ON (C,1)-shaped arrays
            y = x[:, None]
            for _ in range(3):
                y = y * (1.0 - 1e-8) + 1e-30
            return y[:, 0] * 0.5 + x * 0.5
        ms = scan_time(c1_elem_f, t1) * 1e3
        print(f"{'3-op elementwise on (C,1)':36s} {ms:7.3f} ms")

        def chain5_f(x, w, m, c):  # 5 dependent legacy accel calls
            u = x * (1.0 + 1e-9)
            for _ in range(5):
                ax, ay = weight_matvec(w, m, c, u[:, None], TQ, k_out=2)
                u = u * (1.0 - 1e-7) + ax * 1e-9 + ay * 1e-9
            return u
        ms = scan_time(chain5_f, t1, wprod_l, meta_l, cnt_l) * 1e3
        print(f"{'5x chained legacy accel':36s} {ms:7.3f} ms "
              f"({ms/5*1e3:5.0f} us/call)")
        ms = scan_time(chain5_f, t1, wprod_l, meta_l, cnt_0) * 1e3
        print(f"{'5x chained legacy accel cnt=0':36s} {ms:7.3f} ms "
              f"({ms/5*1e3:5.0f} us/call)")

        def chain5_realglue(x, w, m, c):
            # value kept (C,1); REAL-ish elementwise glue (6 ops) between
            # calls, all on (C,1), consuming the kernel outputs via [:, None]
            u = x[:, None] * (1.0 + 1e-9)
            for _ in range(5):
                ax, ay = weight_matvec(w, m, c, u, TQ, k_out=2)
                axc = ax[:, None]
                ayc = ay[:, None]
                u = (u * (1.0 - 1e-7) + axc * 1e-9 + ayc * 1e-9
                     + jnp.maximum(axc, 0.0) * 1e-12)
            return u[:, 0] * 0.5 + x * 0.5
        ms = scan_time(chain5_realglue, t1, wprod_l, meta_l, cnt_l) * 1e3
        print(f"{'5x chained, (C,1) glue + outs':36s} {ms:7.3f} ms "
              f"({ms/5*1e3:5.0f} us/call)")

        # scalar blocks under the value-kept-(C,1) pattern (+ statics/sq cost)
        mwh = derive_meta(wm, starts, emitted64, NT, NL, C, 128)
        nbs = len(mwh)
        bmaxs = max(GRP, -(-(nbs + 8) // GRP) * GRP)
        wsc_l = jnp.asarray(rng.standard_normal((bmaxs, 128, TQ)), wdt)
        metas_l = jnp.zeros((bmaxs,), jnp.int32).at[:nbs].set(jnp.asarray(mwh))
        cnts_l = jnp.asarray([nbs, 0], jnp.int32)
        sqv = jnp.swapaxes(stt.reshape(NT, TQ, -1), 1, 2)

        def chain5_scalar(x, w, m, c):
            u = x[:, None] * (1.0 + 1e-9)
            for _ in range(5):
                ax, ay = scalar_matvec(w, m, c, sc, sqv, u, TQ, 128, "accel")
                u = u * (1.0 - 1e-7 + jnp.sum(ax) * 1e-30)
            return u[:, 0] * 0.5 + x * 0.5
        ms = scan_time(chain5_scalar, t1, wsc_l, metas_l, cnts_l) * 1e3
        print(f"{'5x chained scalar, value (C,1)':36s} {ms:7.3f} ms "
              f"({ms/5*1e3:5.0f} us/call)")
        ms = scan_time(chain5_scalar, t1, wsc_l, metas_l, cnt_0) * 1e3
        print(f"{'5x chained scalar cnt=0':36s} {ms:7.3f} ms "
              f"({ms/5*1e3:5.0f} us/call)")

        def chain5_nore(x, w, m, c):  # 5 dependent calls, NO (C,1) relayout
            u = x[:, None] * (1.0 + 1e-9)  # one relayout up front
            for _ in range(5):
                ax, ay = weight_matvec(w, m, c, u, TQ, k_out=2)
                # dependency via a scalar reduce: no (C,)->(C,1) relayout
                u = u * (1.0 - 1e-7 + jnp.sum(ax) * 1e-30)
            return u[:, 0] * 0.5 + x * 0.5
        ms = scan_time(chain5_nore, t1, wprod_l, meta_l, cnt_l) * 1e3
        print(f"{'5x chained, value kept (C,1)':36s} {ms:7.3f} ms "
              f"({ms/5*1e3:5.0f} us/call)")
        return

    # ---- production-path A/B: the fused builder and a chained 2-iteration
    # solver loop (accel->div->accel->div), scalar vs legacy ----
    if "builder" in names or "chain" in names:
        from adaptive_sph_tpu.ops.pallas_matvec import (build_weight_cache_prep,
                                                        visc_matvec)

        vel0 = jnp.asarray(rng.normal(0, 0.5, (C, 2)).astype(np.float32))
        sqv = jnp.swapaxes(stt.reshape(NT, TQ, -1), 1, 2)

        for scalar in (False, True):
            tag = "scalar" if scalar else "legacy"
            def build(vel, scalar=scalar):
                return build_weight_cache_prep(
                    tcfg, bins, stt, vel, pscale, tcfg.b_max, "laplace", 0.01,
                    wmeta=wm_j, wdtype=wdt, want_s2=False, fuse_density=True,
                    visc_stream=True, scalar=scalar)
            if "builder" in names:
                def f(v):
                    w_, v_, m_, c_, prep = build(v)
                    return (v * 0.5 + prep[:, 3, :].reshape(C)[:, None]
                            * jnp.float32(1e-6))
                ms = scan_time(f, vel0) * 1e3
                print(f"{'builder mega ' + tag:36s} {ms:7.3f} ms")
            if "chain" in names:
                w_, v_, m_, c_ = (jax.device_get(o) for o in jax.jit(
                    lambda v: build(v)[:4])(vel0))
                w_, v_, m_, c_ = (jnp.asarray(o) for o in (w_, v_, m_, c_))
                kw = dict(statics=sc, sq=sqv) if scalar else {}
                def f(x, w_, v_, m_, c_, kw=kw):
                    rho = x[:, 0] * 0.1 + 1.0
                    vx, vy = visc_matvec(v_, m_, c_, rho, TQ, **kw)
                    u = (x[:, 0] + vx * 1e-6 + vy * 1e-6)
                    for _ in range(2):
                        ax, ay = weight_matvec(w_, m_, c_, u[:, None], TQ,
                                               k_out=2, **kw)
                        dv = weight_matvec(w_, m_, c_, (ax, ay), TQ,
                                           k_out=1, **kw)
                        u = u * (1.0 - 1e-7) + dv * 1e-9
                    return u[:, None] + x * 0.5
                ms = scan_time(f, vel0, w_, v_, m_, c_) * 1e3
                print(f"{'chain visc+2x(accel+div) ' + tag:36s} {ms:7.3f} ms")
        return

    # production baseline (2-channel [wx|wy] blocks)
    wprod = jnp.asarray(
        rng.standard_normal((tcfg.b_max, 64, max(2 * TQ, 128))), wdt)
    cnt = jnp.asarray(cnt64)
    meta_j = jnp.asarray(meta64)

    def run(name, fn, nb, mb):
        ms = scan_time(fn, t1) * 1e3
        print(f"{name:36s} {ms:7.3f} ms  ({ms*1e6/max(nb,1):6.0f} ns/block, "
              f"blocks={nb}, {mb:.1f} MB, {mb/ms:5.0f} GB/s)")

    if "base" in names:
        def f(x):
            u = x * (1.0 + 1e-9)
            ax, ay = weight_matvec(wprod, meta_j, cnt, u[:, None], TQ, k_out=2)
            return ax + ay * 0.5 + x * 0.5
        run("base accel (prod, 64x[wx|wy])", f, nb64,
            nb64 * 64 * max(2 * TQ, 128) * wdt.dtype.itemsize / 1e6)
    if "basediv" in names:
        def f(x):
            s = weight_matvec(wprod, meta_j, cnt, (x, x * 0.5), TQ, k_out=1)
            return s + x * 0.5
        run("base div  (prod, 64x[wx|wy])", f, nb64,
            nb64 * 64 * max(2 * TQ, 128) * wdt.dtype.itemsize / 1e6)

    for wh in (64, 128, 256):
        need = any(n in names for n in (f"s{wh}", f"d{wh}", f"o{wh}", f"dma{wh}"))
        if not need:
            continue
        if wh == 64:
            mwh = meta_np
        else:
            mwh = derive_meta(wm, starts, emitted64, NT, NL, C, wh)
        nb = len(mwh)
        bmaxw = max(GRP, -(-(nb + 8) // GRP) * GRP)
        wsc = jnp.asarray(rng.standard_normal((bmaxw, wh, TQ)), wdt)
        metaw = jnp.zeros((bmaxw,), jnp.int32).at[:nb].set(jnp.asarray(mwh))
        cntw = jnp.asarray([nb, 0], jnp.int32)
        mb = nb * wh * TQ * wdt.dtype.itemsize / 1e6
        if f"s{wh}" in names:
            def f(x, wsc=wsc, metaw=metaw, cntw=cntw, wh=wh):
                u = x * (1.0 + 1e-9)
                ax, ay = scalar_matvec(wsc, metaw, cntw, sc, sq, u[:, None],
                                       TQ, wh, "accel")
                return ax + ay * 0.5 + x * 0.5
            run(f"scalar accel WH={wh}", f, nb, mb)
        if f"d{wh}" in names:
            def f(x, wsc=wsc, metaw=metaw, cntw=cntw, wh=wh):
                s = scalar_matvec(wsc, metaw, cntw, sc, sq,
                                  (x[:, None], (x * 0.5)[:, None]),
                                  TQ, wh, "div")
                return s + x * 0.5
            run(f"scalar div   WH={wh}", f, nb, mb)
        if f"o{wh}" in names:
            cnt0 = jnp.asarray([0, 0], jnp.int32)
            def f(x, wsc=wsc, metaw=metaw, cnt0=cnt0, wh=wh):
                u = x * (1.0 + 1e-9)
                ax, ay = scalar_matvec(wsc, metaw, cnt0, sc, sq, u[:, None],
                                       TQ, wh, "accel")
                return ax + ay * 0.5 + x * 0.5
            run(f"scalar accel WH={wh} cnt=0 (fixed)", f, nb, 0.0)


if __name__ == "__main__":
    main()
