"""Weight-cached PPE operator: build once per solve, stream per Jacobi iteration.

Within one pressure solve the geometry is frozen, so the pair weights
w_ij = m_j * grad W_ij (the only pair-dependent quantity in both Jacobi sweeps,
simulation.rs:1207-1322) are computed ONCE by a builder kernel that walks the same
tile/row/chunk structure as ops/pallas_sweeps.py and writes one (TQ, 128) block
[wx | wy] per non-empty chunk visit to HBM, plus (qt, ck) metadata. Each Jacobi
iteration then runs two lean matvec kernels that stream the weight blocks back
(double-buffered DMA) with no masks, no geometry, and no transcendentals:

  accel_i = -(p_i/rho_i^2) * S1_i - sum_j w_ij u_j + boundary(p_i),  u_j = p_j/rho_j^2
  div_i   = scale_i * (sum_j w_ij . t_j - a_i . S_i) + boundary(a_i)
            t_j = a_j (Consistent*) or a_j/rho_j (Winchenbach2020)

with S1/S2 the per-particle gradient sums already produced by the fused prep sweep
(models/tile_physics.py). Exactness: identical pair set and weights as the direct
sweeps; only f32 association order differs (differentially tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiles import TILE, TileBins, TileConfig, to_cand, to_chunks, window_meta
from .pallas_sweeps import PairCtx, _levels_meta


def _build_kernel(starts_ref, wmeta_ref, sq_ref, sc_ref, w_hbm, qt_ref, ck_ref,
                  cnt_ref, scratch, sem, *, cfg: TileConfig, scale: float, b_max: int):
    lmeta = _levels_meta(cfg)
    TQ = cfg.tq
    NL = len(cfg.populated)

    def tile_body(t, carry):
        slot, attempted = carry
        qs = sq_ref[t]  # (TQ, F)
        qx = qs[:, 0:1]
        qy = qs[:, 1:2]
        qh = qs[:, 2:3]
        qvalid = qh > 0.0

        def chunk_work(ck, lo, hi, carry):
            slot, attempted = carry
            cs = sc_ref[ck]  # (F, TILE)
            cx = cs[0:1, :]
            cy = cs[1:2, :]
            ch = cs[2:3, :]
            cm = cs[3:4, :]
            col = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1) + ck * TILE
            h_ij = jnp.maximum(0.5 * (qh + ch), 1e-6)
            dx = qx - cx
            dy = qy - cy
            r2 = dx * dx + dy * dy
            rad = jnp.float32(scale) * h_ij
            valid = (
                (col >= lo) & (col < hi) & (r2 < rad * rad) & (ch > 0.0) & qvalid
            )
            ctx = PairCtx(dx, dy, r2, h_ij)
            g = jnp.where(valid, cm * ctx.gmag, 0.0)
            wx = g * dx
            wy = g * dy
            nonempty = jnp.any(valid)
            emit = nonempty & (slot < b_max)

            @pl.when(emit)
            def _():
                buf = jnp.mod(slot, 2)

                @pl.when(slot >= 2)
                def _():
                    pltpu.make_async_copy(
                        scratch.at[jnp.mod(slot, 2)], w_hbm.at[jnp.maximum(slot - 2, 0)],
                        sem.at[buf],
                    ).wait()

                scratch[buf, :, 0:TILE] = wx
                scratch[buf, :, TILE:2 * TILE] = wy
                pltpu.make_async_copy(
                    scratch.at[buf], w_hbm.at[slot], sem.at[buf]
                ).start()
                qt_ref[slot] = t
                ck_ref[slot] = ck

            return (slot + emit.astype(jnp.int32),
                    attempted + nonempty.astype(jnp.int32))

        def level_block(li, lm, carry):
            mbase = (t * NL + li) * 4
            ylo = wmeta_ref[mbase]
            nrows = wmeta_ref[mbase + 1]
            xlo = wmeta_ref[mbase + 2]
            xhi = wmeta_ref[mbase + 3]

            def row_body(r, carry):
                y = ylo + r
                base = lm["coff"] + y * lm["nx"]
                lo = starts_ref[base + xlo]
                hi = starts_ref[base + xhi + 1]
                ck0 = lo // TILE
                nck = jnp.where(hi > lo, (hi - ck0 * TILE + TILE - 1) // TILE, 0)

                def ck_body(k, carry):
                    return chunk_work(ck0 + k, lo, hi, carry)

                return jax.lax.fori_loop(0, nck, ck_body, carry, unroll=False)

            return jax.lax.fori_loop(0, nrows, row_body, carry, unroll=False)

        for li, lm in enumerate(lmeta):
            carry = level_block(li, lm, carry)
        return carry

    NT = cfg.capacity // TQ
    slot, attempted = jax.lax.fori_loop(
        0, NT, tile_body, (jnp.int32(0), jnp.int32(0)), unroll=False
    )

    # drain outstanding DMAs
    @pl.when(slot >= 1)
    def _():
        pltpu.make_async_copy(
            scratch.at[jnp.mod(slot - 1, 2)], w_hbm.at[slot - 1], sem.at[jnp.mod(slot - 1, 2)]
        ).wait()

    @pl.when(slot >= 2)
    def _():
        pltpu.make_async_copy(
            scratch.at[jnp.mod(slot - 2, 2)], w_hbm.at[slot - 2], sem.at[jnp.mod(slot - 2, 2)]
        ).wait()

    cnt_ref[0] = slot
    cnt_ref[1] = attempted - slot  # dropped blocks (b_max overflow)


def build_weight_cache(cfg: TileConfig, bins: TileBins, statics_sorted, scale: float,
                       b_max: int, wmeta=None, interpret=None):
    """Returns (weights (b_max, TQ, 128) f32 HBM, (qt, ck) meta, cnt (2,): [blocks, dropped])."""
    assert b_max % GRP == 0, "b_max must be a multiple of the matvec DMA group"
    TQ = cfg.tq
    sq = to_chunks(statics_sorted, TQ)
    sc = to_cand(statics_sorted)
    if wmeta is None:
        wmeta = window_meta(cfg, bins, statics_sorted)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = functools.partial(_build_kernel, cfg=cfg, scale=float(scale), b_max=b_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),  # weights stay in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TQ, 2 * TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    w, qt, ck, cnt = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_max, TQ, 2 * TILE), jnp.float32),
            jax.ShapeDtypeStruct((b_max,), jnp.int32),
            jax.ShapeDtypeStruct((b_max,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bins.cell_starts, wmeta, sq, sc)
    return w, (qt, ck), cnt


NBUF = 4   # DMA pipeline depth (group-sized copies)
GRP = 8    # weight blocks per DMA / per loop iteration (statically unrolled)


def _matvec_kernel(cnt_ref, qt_ref, ck_ref, w_hbm, t_ref, out_ref, scratch, sem,
                   *, tq: int, k_in: int, k_out: int):
    """Stream weight blocks in groups of GRP; out[qt] += dot over candidates.

    k_in=1, k_out=2: accel mode — out = (sum wx*u, sum wy*u)
    k_in=2, k_out=1: div mode   — out = sum (wx*tx + wy*ty)
    """
    B = cnt_ref[0]
    NG = (B + GRP - 1) // GRP
    out_ref[:] = jnp.zeros_like(out_ref)

    def get_dma(buf, grp):
        # whole (GRP, TQ, 128) group in one copy; trailing groups read padding
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(grp * GRP, GRP)], scratch.at[buf], sem.at[buf]
        )

    for k in range(NBUF - 1):
        @pl.when(k < NG)
        def _(k=k):
            get_dma(k, k).start()

    # register accumulation: blocks are tile-major (builder order). Every sub-block
    # stores the running partial sum for its tile UNCONDITIONALLY — later stores of
    # the same tile overwrite earlier partials, so the final store per tile carries
    # the full sum. Branch-free bodies keep the unrolled group ILP-schedulable.
    acc0 = jnp.zeros((tq, k_out), jnp.float32)

    def body(grp, carry):
        acc, cur_qt = carry
        buf = jnp.mod(grp, NBUF)

        @pl.when(grp + NBUF - 1 < NG)
        def _():
            get_dma(jnp.mod(grp + NBUF - 1, NBUF), grp + NBUF - 1).start()

        get_dma(buf, grp).wait()
        for g in range(GRP):
            e = grp * GRP + g
            e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
            valid = e < B
            qt_e = qt_ref[e_safe]
            ck_e = ck_ref[e_safe]
            switch = qt_e != cur_qt

            acc = jnp.where(switch, 0.0, acc)
            cur_qt = qt_e

            w = scratch[buf, g]  # (TQ, 128) = [wx | wy]
            tv = t_ref[ck_e]  # (k_in, TILE)
            wx = w[:, 0:TILE]
            wy = w[:, TILE:2 * TILE]
            if k_out == 2:
                u = tv[0:1, :]
                ax = jnp.sum(wx * u, axis=1, keepdims=True)
                ay = jnp.sum(wy * u, axis=1, keepdims=True)
                contrib = jnp.concatenate([ax, ay], axis=1)  # (TQ, 2)
            else:
                contrib = jnp.sum(
                    wx * tv[0:1, :] + wy * tv[1:2, :], axis=1, keepdims=True
                )
            acc = acc + jnp.where(valid, contrib, 0.0)
            out_ref[cur_qt] = acc

        return acc, cur_qt

    @pl.when(B > 0)
    def _():
        jax.lax.fori_loop(0, NG, body, (acc0, qt_ref[0]), unroll=False)


def weight_matvec(weights, meta, cnt, t_sorted, tq: int, k_out: int, interpret=None):
    """meta = (qt, ck) arrays from build_weight_cache."""
    C = t_sorted.shape[0]
    if t_sorted.ndim == 1:
        t_sorted = t_sorted[:, None]
    k_in = t_sorted.shape[1]
    tc = to_cand(t_sorted)  # (NC, k_in, TILE)
    NT = C // tq
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = functools.partial(_matvec_kernel, tq=tq, k_in=k_in, k_out=k_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # weights in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, GRP, tq, 2 * TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, tq, k_out), jnp.float32),
        interpret=bool(interpret),
    )(cnt, meta[0], meta[1], weights, tc)
    return out.reshape(C, k_out)
