"""Isolate the per-block cost of the weight-streaming matvec kernel.

The production matvec (ops/pallas_matvec.py) measures ~600-740 ns/block
standalone while the DMA floor is ~40 ns/block — this probe runs stripped
variants of the kernel on the bench scene's real weight cache to attribute the
gap: pure DMA, no dynamic value-slice, no MXU dot, no progressive store, wider
DMA groups. Usage: python scripts/matvec_probe.py [variants...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

TILE = 64
META_SHIFT = 18


def scan_time(fn, x, *extra, iters=50):
    """Differential per-iteration cost (cancels the ~30 ms tunnel dispatch
    latency that a fixed-length scan turns into a fake ~0.6 ms/iter floor).
    fn(x, *extra) -> array like x; extra are jit args (NOT closure-captured:
    captured arrays are serialized into the axon remote_compile request)."""

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


def make_kernel(tq, lw, grp, nbuf, *, do_slice=True, do_dot=True, do_store=True,
                do_switch=True, k_in=1, k_out=2, vpu=False):
    def kern(cnt_ref, meta_ref, w_hbm, t_ref, out_ref, scratch, sem):
        B = cnt_ref[0]
        NG = (B + grp - 1) // grp
        out_ref[:] = jnp.zeros_like(out_ref)

        def get_dma(buf, g):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(g * grp, grp)], scratch.at[buf], sem.at[buf]
            )

        for k in range(nbuf - 1):
            @pl.when(k < NG)
            def _(k=k):
                get_dma(k, k).start()

        acc0 = jnp.zeros((8, tq), jnp.float32)

        def body(g, carry):
            acc, cur_qt = carry
            buf = jnp.mod(g, nbuf)

            @pl.when(g + nbuf - 1 < NG)
            def _():
                get_dma(jnp.mod(g + nbuf - 1, nbuf), g + nbuf - 1).start()

            get_dma(buf, g).wait()
            for j in range(grp):
                e = g * grp + j
                e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
                valid = e < B
                me = meta_ref[e_safe]
                qt_e = me >> META_SHIFT
                an_e = me & ((1 << META_SHIFT) - 1)
                if do_switch:
                    acc = jnp.where(qt_e != cur_qt, 0.0, acc)
                    cur_qt = qt_e
                w = scratch[buf, j]
                if do_slice:
                    tv = t_ref[pl.ds(an_e, TILE), :]
                else:
                    tv = t_ref[pl.ds(8 * (j % 8), TILE), :]
                row = jax.lax.broadcasted_iota(jnp.int32, (8, tq), 0)
                half = lw // 2
                if vpu:
                    # no MXU: broadcast t into lanes, elementwise multiply, one
                    # sublane tree-reduce per block
                    if k_in == 1:
                        prod = w * tv[:, 0:1]
                        c0 = jnp.sum(prod[:, 0:tq], axis=0, keepdims=True)
                        c1 = jnp.sum(prod[:, half:half + tq], axis=0, keepdims=True)
                        contrib = jnp.where(row == 0, c0, jnp.where(row == 1, c1, 0.0))
                    else:
                        prod = w[:, 0:tq] * tv[:, 0:1] + w[:, half:half + tq] * tv[:, 1:2]
                        c0 = jnp.sum(prod, axis=0, keepdims=True)
                        contrib = jnp.where(row == 0, c0, 0.0)
                elif do_dot:
                    res = jax.lax.dot_general(
                        tv, w, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    if k_out == 2:
                        ax = res[0:1, 0:tq]
                        ay = res[0:1, half:half + tq]
                        contrib = jnp.where(row == 0, ax, jnp.where(row == 1, ay, 0.0))
                    else:
                        c0 = res[0:1, 0:tq] + res[1:2, half:half + tq]
                        contrib = jnp.where(row == 0, c0, 0.0)
                else:
                    contrib = jnp.where(row == 0, w[0:1, 0:tq], 0.0)
                acc = acc + jnp.where(valid, contrib, 0.0)
                if do_store:
                    out_ref[cur_qt] = acc
            if not do_store:
                out_ref[0] = acc
            return acc, cur_qt

        @pl.when(B > 0)
        def _():
            jax.lax.fori_loop(0, NG, body, (acc0, meta_ref[0] >> META_SHIFT),
                              unroll=False)

    return kern


def dma_variant(name, weights, cnt, t, grp=8, nbuf=4, collapse2d=False):
    """Pure-DMA stream of the used blocks: isolates the achievable stream rate
    for a given group size / pipeline depth / block dtype / shape."""
    b_max = weights.shape[0]
    rest = weights.shape[1:]
    if collapse2d:
        weights = weights.reshape(b_max * rest[0], rest[1])

    def kern(cnt_ref, w_hbm, t_ref, out_ref, scratch, sem):
        B = cnt_ref[0]
        NG = (B + grp - 1) // grp
        out_ref[:] = jnp.zeros_like(out_ref)

        def get_dma(buf, g):
            if collapse2d:
                src = w_hbm.at[pl.ds(g * grp * rest[0], grp * rest[0])]
            else:
                src = w_hbm.at[pl.ds(g * grp, grp)]
            return pltpu.make_async_copy(src, scratch.at[buf], sem.at[buf])

        for k in range(nbuf - 1):
            @pl.when(k < NG)
            def _(k=k):
                get_dma(k, k).start()

        def body(g, carry):
            buf = jnp.mod(g, nbuf)

            @pl.when(g + nbuf - 1 < NG)
            def _():
                get_dma(jnp.mod(g + nbuf - 1, nbuf), g + nbuf - 1).start()

            get_dma(buf, g).wait()
            return carry

        jax.lax.fori_loop(0, NG, body, 0, unroll=False)

    if collapse2d:
        sshape = (nbuf, grp * rest[0], rest[1])
    else:
        sshape = (nbuf, grp) + rest
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(sshape, weights.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )

    def call(tv, weights, cnt):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=jax.default_backend() != "tpu",
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024, has_side_effects=True,
            ),
        )(cnt, weights, tv)

    ms = scan_time(
        lambda tv, *a: call(tv, *a)[0:1, 0:1] * 1e-20 + tv, t, weights, cnt
    ) * 1e3
    nb = int(cnt[0])
    mb = nb * int(np.prod(rest)) * weights.dtype.itemsize / 1e6 if not collapse2d \
        else nb * rest[0] * rest[1] * weights.dtype.itemsize / 1e6
    print(f"{name:34s} {ms:7.3f} ms  ({ms*1e6/nb:6.0f} ns/block, "
          f"{mb/ms:6.0f} GB/s)")
    return ms


def run_variant(name, weights, meta, cnt, t, tq, grp=8, nbuf=4, k_in=1, k_out=2,
                **kw):
    b_max, _, lw = weights.shape
    C = t.shape[0]
    NT = C // tq
    kern = make_kernel(tq, lw, grp, nbuf, k_in=k_in, k_out=k_out, **kw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, grp, TILE, lw), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )

    def call(tv, weights, meta, cnt):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NT, 8, tq), jnp.float32),
            interpret=jax.default_backend() != "tpu",
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(cnt, meta, weights, tv)[:, 0, :].reshape(C, 1) * 1e-20

    ms = scan_time(lambda tv, *a: call(tv, *a) + tv * 0.5, t, weights, meta, cnt) * 1e3
    nb = int(cnt[0])
    print(f"{name:34s} {ms:7.3f} ms  ({ms*1e6/nb:6.0f} ns/block, blocks={nb})")
    return ms


def main():
    import numpy as np

    from adaptive_sph_tpu.models import scene as scene_mod
    from adaptive_sph_tpu import runner
    from adaptive_sph_tpu.models.grid_step import max_scale, physics_scale
    from adaptive_sph_tpu.ops import kernels
    from adaptive_sph_tpu.ops.pallas_matvec import build_weight_cache
    from adaptive_sph_tpu.ops.tiles import TileConfig, build_tiles, sort_fields, window_meta
    import adaptive_sph_tpu.utils.params as pm
    from adaptive_sph_tpu.utils.params import SimulationParams

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
    print(f"C={tcfg.capacity} tq={tcfg.tq} b_max={tcfg.b_max}")

    h = jnp.asarray(kernels.smoothing_length_from_mass(state.mass, params.rest_density, 2))
    pscale = float(physics_scale(params))
    bins = jax.jit(lambda p: build_tiles(
        p, h * jnp.float32(tcfg.mscale), h, state.alive, tcfg))(state.position)
    stt = jax.jit(lambda: sort_fields(bins, [state.position, h, state.mass]))()
    wm = jax.jit(lambda: window_meta(tcfg, bins, stt))()
    w, meta, cnt = jax.jit(lambda: build_weight_cache(
        tcfg, bins, stt, pscale, tcfg.b_max, wmeta=wm))()
    w, meta, cnt = jax.device_get((w, meta, cnt))
    w, meta, cnt = jnp.asarray(w), jnp.asarray(meta), jnp.asarray(cnt)
    t = jnp.ones((tcfg.capacity, 1), jnp.float32)

    names = sys.argv[1:] or ["base", "dma", "noslice", "nodot", "nostore",
                             "noswitch", "grp16", "grp16nbuf8"]
    if "xlasum" in names:
        names.remove("xlasum")
        nb = int(cnt[0])
        wa = w[: (nb // 8) * 8]
        ms = scan_time(lambda x: x * (jnp.sum(x) * 0.0 + (1.0 - 1e-9)), wa) * 1e3
        mb = wa.size * 4 / 1e6
        print(f"{'XLA reduce of the used blocks':34s} {ms:7.3f} ms  "
              f"({mb/ms:6.0f} GB/s over {mb:.0f} MB)")
    dma_specs = {
        "dmaiso": ("dma isolated (grp8 nbuf4)", dict()),
        "dmagrp32": ("dma grp=32", dict(grp=32)),
        "dmagrp1": ("dma grp=1 nbuf=8", dict(grp=1, nbuf=8)),
        "dmanbuf8": ("dma nbuf=8", dict(nbuf=8)),
        "dma2d": ("dma 2d-collapsed slices", dict(collapse2d=True)),
        "dmabf16": ("dma bf16 blocks", dict(dtype="bf16")),
    }
    for key, (label, kw) in dma_specs.items():
        if key in names:
            names.remove(key)
            ww = w.astype(jnp.bfloat16) if kw.pop("dtype", None) == "bf16" else w
            dma_variant(label, ww, cnt, t, **kw)
    t2 = jnp.ones((tcfg.capacity, 2), jnp.float32)
    for nm in names:
        if nm == "divbase":
            run_variant("div mode (k_in=2 k_out=1)", w, meta, cnt, t2, tcfg.tq,
                        k_in=2, k_out=1)
        elif nm == "divvpu":
            run_variant("div mode VPU (no MXU)", w, meta, cnt, t2, tcfg.tq,
                        k_in=2, k_out=1, vpu=True)
        elif nm == "accvpu":
            run_variant("accel mode VPU (no MXU)", w, meta, cnt, t, tcfg.tq,
                        vpu=True)
        elif nm == "base":
            run_variant("base (prod-equivalent)", w, meta, cnt, t, tcfg.tq)
        elif nm == "dma":
            run_variant("dma-only (no slice/dot/store)", w, meta, cnt, t, tcfg.tq,
                        do_slice=False, do_dot=False, do_store=False, do_switch=False)
        elif nm == "noslice":
            run_variant("static value slice", w, meta, cnt, t, tcfg.tq, do_slice=False)
        elif nm == "nodot":
            run_variant("no MXU dot", w, meta, cnt, t, tcfg.tq, do_dot=False)
        elif nm == "nostore":
            run_variant("no progressive store", w, meta, cnt, t, tcfg.tq,
                        do_store=False)
        elif nm == "noswitch":
            run_variant("no tile-switch logic", w, meta, cnt, t, tcfg.tq,
                        do_switch=False)
        elif nm == "grp16":
            run_variant("GRP=16", w, meta, cnt, t, tcfg.tq, grp=16)
        elif nm == "grp16nbuf8":
            run_variant("GRP=16 NBUF=8", w, meta, cnt, t, tcfg.tq, grp=16, nbuf=8)


if __name__ == "__main__":
    main()
