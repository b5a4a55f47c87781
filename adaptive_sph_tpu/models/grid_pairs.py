"""Pair reductions over the dense grid engine (ops/grid.py).

`pair_apply` evaluates, for every alive particle i,
    reduce_j edge_fn(v_i, v_j, geom_ij)
over all SPH neighbors j (|x_ij| < radius_scale * h_ij, self included), without any
per-edge gather/scatter: candidates come from 3x3 shifted slices of per-level grid
tensors, cross-level windows from power-of-two up/downsampling. Equivalent to the
neighbor-list sweeps in ops/pairwise.py (differentially tested in
tests/test_grid_engine.py).

Block structure: for each populated level pair (q, c) with q <= c, the q-side sums are
computed directly (each query slot reduces over the 9*MPC_c window); the c-side sums of
cross-level pairs are recovered by reducing the same pair tensor over the query axes
(reshape-sum to the coarse resolution + nine reverse shifts) — no scatter.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.grid import (
    OFFSETS,
    GridBins,
    GridConfig,
    downsample_max2d,
    downsample_sum2d,
    level_view,
    shift2d,
    upsample2d,
)


def _expand_q(a):
    """(ny, nx, MQ, ...) -> (ny, nx, MQ, 1, ...)"""
    return a[:, :, :, None]


def _expand_c(a):
    """(ny, nx, W, ...) -> (ny, nx, 1, W, ...)"""
    return a[:, :, None, :]


def _candidate_views(cfg: GridConfig, slot_array, c: int, factor: int, fill):
    """(ny_q, nx_q, 9*MPC, ...) stacked candidate windows of level c at q resolution."""
    base = level_view(cfg, slot_array, c)
    views = []
    for dy, dx in OFFSETS:
        v = shift2d(base, dy, dx, fill)
        views.append(upsample2d(v, factor))
    return jnp.concatenate(views, axis=2)


class Geom:
    """Per-pair geometry handed to edge functions (broadcast shapes (..., MQ, W))."""

    __slots__ = ("diff", "r", "h_ij", "valid")

    def __init__(self, diff, r, h_ij, valid):
        self.diff = diff
        self.r = r
        self.h_ij = h_ij
        self.valid = valid

    def reversed(self):
        return Geom(-self.diff, self.r, self.h_ij, self.valid)


def pair_apply(
    cfg: GridConfig,
    bins: GridBins,
    slot_fields: dict,
    radius_scale,
    edge_fn: Callable,
    reduce: str = "sum",
    fill=0.0,
    mask_pos_key: str = "pos",
):
    """Run edge_fn over every interacting pair; returns dict of slot-layout results.

    slot_fields: dict of (total_slots, ...) arrays; must contain 'pos' (slots, 2) and
    'h' (slots,). edge_fn(vi, vj, geom) -> dict of per-pair arrays (..., MQ, W[, F])
    contributing to vi's particle; it is evaluated once per direction per block.
    reduce: 'sum' or 'max' (max uses `fill` for non-edges).
    mask_pos_key: which position field decides pair membership (|x| < scale*h_ij).
    The reference's level smoothing keeps the pre-advection pair set while evaluating
    kernels at advected positions (simulation.rs:2052-2058 + :2709-2722) — pass the
    stale positions under a separate key and name it here.
    """
    _, total = cfg.level_offsets
    pos = slot_fields["pos"]
    h = slot_fields["h"]
    mask_flat = bins.slot_mask

    out = None

    levels = sorted(set(cfg.populated))

    for q in levels:
        nyq, nxq = cfg.dims(q)
        qv = {k: level_view(cfg, v, q) for k, v in slot_fields.items()}
        qmask = level_view(cfg, mask_flat, q)
        q_acc = None

        for c in levels:
            if c < q:
                continue
            factor = 1 << (c - q)
            cand = {k: _candidate_views(cfg, v, c, factor, 0) for k, v in slot_fields.items()}
            cmask = _candidate_views(cfg, mask_flat, c, factor, False)

            diff = _expand_q(qv["pos"]) - _expand_c(cand["pos"])  # (ny,nx,MQ,W,2)
            r = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-30)
            # clamp keeps kernel math finite on empty-empty slot pairs so the
            # multiply-mask reduction cannot see NaNs (real particles have h >> this)
            h_ij = jnp.maximum(0.5 * (_expand_q(qv["h"]) + _expand_c(cand["h"])), 1e-6)
            if mask_pos_key == "pos":
                r_mask = r
            else:
                dmask = _expand_q(qv[mask_pos_key]) - _expand_c(cand[mask_pos_key])
                r_mask = jnp.sqrt(jnp.sum(dmask * dmask, -1) + 1e-30)
            valid = (
                _expand_q(qmask)
                & _expand_c(cmask)
                & (r_mask < radius_scale * h_ij)
            )
            geom = Geom(diff, r, h_ij, valid)

            vi = {k: _expand_q(v) for k, v in qv.items()}
            vj = {k: _expand_c(v) for k, v in cand.items()}

            fwd = edge_fn(vi, vj, geom)

            def red_q(e):
                v = valid.reshape(valid.shape + (1,) * (e.ndim - 4))
                if reduce == "sum":
                    return jnp.sum(jnp.where(v, e, 0), axis=3)
                return jnp.max(jnp.where(v, e, fill), axis=3)

            contrib_q = jax.tree.map(red_q, fwd)
            q_acc = contrib_q if q_acc is None else jax.tree.map(
                (jnp.add if reduce == "sum" else jnp.maximum), q_acc, contrib_q
            )

            if c > q:
                # reversed direction: contributions to the coarse candidates
                bwd = edge_fn(vj, vi, geom.reversed())
                nyc, nxc = cfg.dims(c)
                MC = cfg.mpc

                def red_c(e):
                    v = valid.reshape(valid.shape + (1,) * (e.ndim - 4))
                    masked = jnp.where(v, e, 0 if reduce == "sum" else fill)
                    e2 = jnp.broadcast_to(
                        masked, valid.shape + e.shape[4:]
                    )
                    if reduce == "sum":
                        t = jnp.sum(e2, axis=2)  # over MQ -> (nyq,nxq,W,...)
                    else:
                        t = jnp.max(e2, axis=2)
                    t = t.reshape((nyq, nxq, 9, MC) + e2.shape[4:])
                    if reduce == "sum":
                        t = downsample_sum2d(t, factor)
                    else:
                        t = downsample_max2d(t, factor)
                    # undo the nine shifts: candidate at offset (dy,dx) from the query
                    # cell receives from query cells at offset (-dy,-dx)
                    acc = None
                    for o, (dy, dx) in enumerate(OFFSETS):
                        piece = shift2d(t[:, :, o], -dy, -dx, 0 if reduce == "sum" else fill)
                        acc = piece if acc is None else (
                            acc + piece if reduce == "sum" else jnp.maximum(acc, piece)
                        )
                    return acc  # (nyc, nxc, MC, ...)

                contrib_c = jax.tree.map(red_c, bwd)
                out = _accumulate_level(out, cfg, contrib_c, c, total, reduce, fill)

        out = _accumulate_level(out, cfg, q_acc, q, total, reduce, fill)

    return out


def _accumulate_level(out, cfg: GridConfig, contrib, l: int, total, reduce, fill):
    """Add a (ny_l, nx_l, MPC, ...) contribution into the flat slot accumulator."""
    offs, _ = cfg.level_offsets
    ny, nx = cfg.dims(l)
    n = ny * nx * cfg.mpc

    def one(o, cblock):
        flat = cblock.reshape((n,) + cblock.shape[3:])
        if o is None:
            base = jnp.zeros((total,) + flat.shape[1:], flat.dtype)
            if reduce == "max":
                base = jnp.full((total,) + flat.shape[1:], fill, flat.dtype)
            o = base
        seg = jax.lax.dynamic_slice_in_dim(o, offs[l], n, axis=0)
        seg = seg + flat if reduce == "sum" else jnp.maximum(seg, flat)
        return jax.lax.dynamic_update_slice_in_dim(o, seg, offs[l], axis=0)

    if out is None:
        return jax.tree.map(lambda c: one(None, c), contrib)
    return jax.tree.map(one, out, contrib)
