"""Pallas TPU harness for pair sweeps over the sorted-tile layout (ops/tiles.py).

One pallas_call = one full pair sweep over all particles. The whole sorted field
table lives in VMEM (C=24k x 8ch = ~1.5 MB); the kernel loops tiles (64 queries) and,
per tile, discovers its candidate ranges directly from the SMEM-resident cell_starts
CSR — 3+ contiguous cell-row ranges per populated level — and streams them in
64-wide chunks. All pair math is 2D (64 query sublanes x 64 candidate lanes); no HBM
pair intermediates exist, which is what made the round-1 engines ~50 ms/sweep
(PERFORMANCE.md).

The physics op (SweepOp) supplies the per-pair math; the harness supplies geometry
(dx, dy, r2, h_ij), the exact pair mask (range bounds + radius + aliveness), the
level/row/chunk loops, and sum/max accumulation.

Numerical semantics identical to ops/pairwise.py / models/grid_pairs.py:
pair iff |x_ij| < radius_scale * (h_i + h_j)/2, self included
(reference neighborhood_search.rs:138-185).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels
from .tiles import (TILE, WM_STRIDE, TileBins, TileConfig, to_cand, to_chunks,
                    window_meta, default_interpret)

OUT_PAD = 8
NEG_BIG = -3.0e38


class PairCtx:
    """Per-chunk pair geometry with lazily cached kernel helpers.

    All arrays are (TQ, TILE): query index on sublanes, candidate on lanes.
    """

    def __init__(self, dx, dy, r2, h_ij):
        self.dx = dx
        self.dy = dy
        self.r2 = r2
        self.h_ij = h_ij
        self._r = None
        self._w = None
        self._gmag = None

    @property
    def r(self):
        if self._r is None:
            self._r = jnp.sqrt(jnp.maximum(self.r2, 1e-30))
        return self._r

    @property
    def w(self):
        """W(r, h_ij), 2D cubic spline (sph_kernels.rs:49-56)."""
        if self._w is None:
            self._w = kernels.kernel_w(self.r, self.h_ij, dim=2)
        return self._w

    @property
    def gmag(self):
        """grad W = gmag * (dx, dy); zero inside q<=1e-5 (sph_kernels.rs:61-71)."""
        if self._gmag is None:
            q = self.r / (2.0 * self.h_ij)
            mag = (
                kernels.kernel_norm_factor(self.h_ij, 2)
                * kernels.cubic_kernel_unnormalized_deriv(q)
                / (2.0 * self.h_ij)
            )
            self._gmag = jnp.where(q > 1.0e-5, mag / self.r, 0.0)
        return self._gmag

    @property
    def gx(self):
        return self.gmag * self.dx

    @property
    def gy(self):
        return self.gmag * self.dy


@dataclasses.dataclass(frozen=True)
class SweepOp:
    """A pair sweep: emit() returns n_out (TILE, TILE) per-pair contributions.

    emit(q, c, ctx) with q: dict name -> (TILE, 1), c: dict name -> (1, TILE).
    Channels: statics x/y/h/mass always present; dyn_names mapped in declared order.
    reduce: 'sum' | 'max'. mask_fn: optional extra pair mask (q, c, ctx) -> bool.
    pos_keys: channel names used for the PAIR MASK distance; defaults to statics
    x/y — pass dyn names to mask on a different position set (stale-pair smoothing,
    simulation.rs:2052-2058 + :2709-2722).
    """

    name: str
    n_out: int
    emit: Callable
    dyn_names: tuple = ()
    reduce: str = "sum"
    fill: float = 0.0
    mask_fn: Optional[Callable] = None
    mask_pos: Optional[tuple] = None  # (qx_name, qy_name) in dyn for mask distance


def _levels_meta(cfg: TileConfig):
    meta = []
    coffs, _ = cfg.cell_offsets
    for l in cfg.populated:
        ny, nx = cfg.dims(l)
        meta.append(dict(level=l, cell=cfg.cell(l), ny=ny, nx=nx, coff=coffs[l]))
    return meta


def _sweep_kernel(starts_ref, wmeta_ref, sq_ref, sc_ref, dq_ref, dc_ref,
                  out_ref, *, cfg: TileConfig, op: SweepOp, scale: float):
    NC = cfg.capacity // TILE
    is_sum = op.reduce == "sum"
    init_val = 0.0 if is_sum else op.fill

    TQ = cfg.tq
    NL = len(cfg.populated)

    def tile_body(t, _):
        qs = sq_ref[t]  # (TQ, F)
        qx = qs[:, 0:1]
        qy = qs[:, 1:2]
        qh = qs[:, 2:3]
        qm = qs[:, 3:4]
        qd = dq_ref[t]  # (TQ, D)
        qch = {"x": qx, "y": qy, "h": qh, "mass": qm}
        for di, nm in enumerate(op.dyn_names):
            qch[nm] = qd[:, di:di + 1]

        qvalid = qh > 0.0

        if op.mask_pos is not None:
            mqx = qch[op.mask_pos[0]]
            mqy = qch[op.mask_pos[1]]
        else:
            mqx, mqy = qx, qy

        # accumulators stay (TQ, TILE): the cross-lane reduction happens ONCE per
        # tile after all chunks (a per-chunk reduce costs a ~6-shuffle tree per
        # output — the dominant per-window cost at n_out up to 8). Different
        # chunks share lane positions; summing them first is associative, and for
        # max-reduce the lane-wise max commutes the same way.
        # candidates are processed TWO 64-chunks per loop iteration: the per-pair
        # vector work is unchanged but the loop-control/scalar overhead (the
        # dominant sweep cost, see PERFORMANCE.md) halves
        W2 = 2 * TILE
        acc0 = tuple(
            jnp.full((TQ, W2), init_val, jnp.float32) for _ in range(op.n_out)
        )

        def chunk_work(ck, lo, hi, acc):
            ck1 = jnp.minimum(ck + 1, NC - 1)
            cs = jnp.concatenate([sc_ref[ck], sc_ref[ck1]], axis=1)  # (F, 2*TILE)
            cx = cs[0:1, :]
            cy = cs[1:2, :]
            ch = cs[2:3, :]
            cm = cs[3:4, :]
            cd = jnp.concatenate([dc_ref[ck], dc_ref[ck1]], axis=1)  # (D, 2*TILE)
            cch = {"x": cx, "y": cy, "h": ch, "mass": cm}
            for di, nm in enumerate(op.dyn_names):
                cch[nm] = cd[di:di + 1, :]

            # col uses the UNCLAMPED second-chunk base: when ck+1 exceeds the
            # table, those lanes read chunk NC-1 but their col >= n_padded >= hi
            # so the range mask kills them (no double counting)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1) + ck * TILE
            h_ij = jnp.maximum(0.5 * (qh + ch), 1e-6)
            if op.mask_pos is not None:
                mdx = mqx - cch[op.mask_pos[0]]
                mdy = mqy - cch[op.mask_pos[1]]
                mr2 = mdx * mdx + mdy * mdy
            dx = qx - cx
            dy = qy - cy
            r2 = dx * dx + dy * dy
            if op.mask_pos is None:
                mr2 = r2
            rad = jnp.float32(scale) * h_ij
            valid = (
                (col >= lo)
                & (col < hi)
                & (mr2 < rad * rad)
                & (ch > 0.0)
                & qvalid
            )
            ctx = PairCtx(dx, dy, r2, h_ij)
            ctx.valid = valid
            if op.mask_fn is not None:
                valid = valid & op.mask_fn(qch, cch, ctx)
                ctx.valid = valid
            outs = op.emit(qch, cch, ctx)
            new_acc = []
            for oi, e in enumerate(outs):
                if is_sum:
                    new_acc.append(acc[oi] + jnp.where(valid, e, 0.0))
                else:
                    new_acc.append(jnp.maximum(acc[oi], jnp.where(valid, e, op.fill)))
            return tuple(new_acc)

        def level_block(li, acc):
            mbase = (t * NL + li) * WM_STRIDE
            cnt = wmeta_ref[mbase]

            def range_body(r, acc):
                lo = starts_ref[wmeta_ref[mbase + 1 + 2 * r]]
                hi = starts_ref[wmeta_ref[mbase + 2 + 2 * r]]
                ck0 = lo // TILE
                nck = jnp.where(hi > lo, (hi - ck0 * TILE + TILE - 1) // TILE, 0)
                npair = (nck + 1) // 2

                def ck_body(k, acc):
                    return chunk_work(ck0 + 2 * k, lo, hi, acc)

                return jax.lax.fori_loop(0, npair, ck_body, acc, unroll=False)

            return jax.lax.fori_loop(0, cnt, range_body, acc, unroll=False)

        acc = acc0
        for li in range(NL):
            acc = level_block(li, acc)
        if is_sum:
            red = tuple(jnp.sum(a, axis=1, keepdims=True) for a in acc)
        else:
            red = tuple(jnp.max(a, axis=1, keepdims=True) for a in acc)
        pad = tuple(
            jnp.zeros((TQ, 1), jnp.float32) for _ in range(OUT_PAD - op.n_out)
        )
        out_ref[t] = jnp.concatenate(red + pad, axis=1)
        return 0

    NT = cfg.capacity // TQ
    jax.lax.fori_loop(0, NT, tile_body, 0, unroll=False)


def run_sweep(
    cfg: TileConfig,
    bins: TileBins,
    statics_sorted,  # (C, F>=4) f32, channels [x, y, h, mass, ...]
    dyn_sorted,  # (C, D) f32 or None
    op: SweepOp,
    scale: float,
    interpret: Optional[bool] = None,
    wmeta=None,
):
    """Run one pair sweep; returns (C, n_out) in SORTED order."""
    C = cfg.capacity
    NC = C // TILE
    F = statics_sorted.shape[1]
    if dyn_sorted is None or dyn_sorted.ndim == 1:
        dyn_sorted = (
            jnp.zeros((C, 1), jnp.float32) if dyn_sorted is None else dyn_sorted[:, None]
        )
    D = dyn_sorted.shape[1]
    assert D == max(len(op.dyn_names), 1) or len(op.dyn_names) == 0

    TQ = cfg.tq
    NT = C // TQ
    sq = to_chunks(statics_sorted, TQ)  # (NT, TQ, F)
    sc = to_cand(statics_sorted)  # (NC, F, TILE)
    dq = to_chunks(dyn_sorted, TQ)
    dc = to_cand(dyn_sorted)
    if wmeta is None:
        wmeta = window_meta(cfg, bins, statics_sorted)

    if interpret is None:
        interpret = default_interpret()

    kern = functools.partial(_sweep_kernel, cfg=cfg, op=op, scale=float(scale))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dc
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, TQ, OUT_PAD), jnp.float32),
        interpret=bool(interpret),
        # the whole sorted table lives in VMEM. Arrays whose minor dim is a
        # small channel count lane-pad to 128 (sq/dq/out cost ~512 B/particle
        # each), so large scenes need a bigger scope than the 16 MiB default
        # (v5e has 128 MiB physical VMEM). ~50k particles is the practical
        # ceiling of the table-resident design; see PERFORMANCE.md.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(112 * 1024 * 1024 if C > 16384 else None)
        ),
    )(bins.cell_starts, wmeta, sq, sc, dq, dc)
    return out.reshape(C, OUT_PAD)[:, : op.n_out]


def sweep_bruteforce(cfg, statics_sorted, dyn_sorted, op: SweepOp, scale):
    """O(C^2) XLA reference of run_sweep for differential tests (small C only)."""
    C = statics_sorted.shape[0]
    x = statics_sorted[:, 0]
    y = statics_sorted[:, 1]
    h = statics_sorted[:, 2]
    m = statics_sorted[:, 3]
    if dyn_sorted is None or dyn_sorted.ndim == 1:
        dyn_sorted = (
            jnp.zeros((C, 1), jnp.float32) if dyn_sorted is None else dyn_sorted[:, None]
        )
    qch = {"x": x[:, None], "y": y[:, None], "h": h[:, None], "mass": m[:, None]}
    cch = {"x": x[None, :], "y": y[None, :], "h": h[None, :], "mass": m[None, :]}
    for di, nm in enumerate(op.dyn_names):
        qch[nm] = dyn_sorted[:, di][:, None]
        cch[nm] = dyn_sorted[:, di][None, :]
    dx = qch["x"] - cch["x"]
    dy = qch["y"] - cch["y"]
    r2 = dx * dx + dy * dy
    h_ij = jnp.maximum(0.5 * (qch["h"] + cch["h"]), 1e-6)
    if op.mask_pos is not None:
        mdx = qch[op.mask_pos[0]] - cch[op.mask_pos[0]]
        mdy = qch[op.mask_pos[1]] - cch[op.mask_pos[1]]
        mr2 = mdx * mdx + mdy * mdy
    else:
        mr2 = r2
    rad = scale * h_ij
    valid = (mr2 < rad * rad) & (cch["h"] > 0) & (qch["h"] > 0)
    ctx = PairCtx(dx, dy, r2, h_ij)
    ctx.valid = valid
    if op.mask_fn is not None:
        valid = valid & op.mask_fn(qch, cch, ctx)
        ctx.valid = valid
    outs = op.emit(qch, cch, ctx)
    res = []
    for e in outs:
        if op.reduce == "sum":
            res.append(jnp.sum(jnp.where(valid, e, 0.0), axis=1))
        else:
            res.append(jnp.max(jnp.where(valid, e, op.fill), axis=1))
    return jnp.stack(res, axis=1)
