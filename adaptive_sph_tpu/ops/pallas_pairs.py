"""Pallas TPU kernel for the per-block pair contraction of the grid engine.

The grid engine's hot op is, per level pair: for every query slot (cell c, slot m),
reduce an edge function over the 9*MPC candidate window. In pure jnp, XLA materializes
the (cells, MQ, W) broadcast intermediates through HBM with padded layouts; this kernel
tiles cells into VMEM and keeps the pair tensor in registers, so HBM traffic is just
the slot-sized inputs and outputs.

Layout: channels are packed into the trailing axis — qf (NC, MQ, F), cf (NC, W, F) —
and each program processes a tile of T cells. The same edge functions used by
models/grid_pairs.py run unchanged inside the kernel (vi/vj dicts rebuilt from channel
slices); reversed-direction outputs (for cross-level blocks) are reduced over MQ
in-kernel and finished host-side with the downsample + nine reverse shifts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid import GridConfig


class KGeom:
    __slots__ = ("diff", "r", "h_ij", "valid")

    def __init__(self, diff, r, h_ij, valid):
        self.diff = diff
        self.r = r
        self.h_ij = h_ij
        self.valid = valid

    def reversed(self):
        # diff flips; (T, MQ, W) shapes are direction-agnostic otherwise
        return KGeom(-self.diff, self.r, self.h_ij, self.valid)


def pack_channels(fields: dict, names: list) -> tuple:
    """fields {name: (slots,) | (slots, 2)} -> ((slots, F) packed, channel map)."""
    cols = []
    cmap = {}
    for n in names:
        a = fields[n]
        if a.ndim == 1:
            cmap[n] = (len(cols), 1)
            cols.append(a[:, None].astype(jnp.float32))
        else:
            cmap[n] = (len(cols), a.shape[1])
            cols.append(a.astype(jnp.float32))
    return jnp.concatenate(cols, axis=1), cmap


def _unpack(tile, cmap, expand):
    """tile (T, S, F) -> dict of (T, S, 1[,2]) views expanded for broadcasting."""
    out = {}
    for n, (i, w) in cmap.items():
        v = tile[..., i : i + w]
        if w == 1:
            v = v[..., 0]
        if expand == "q":  # (T, MQ) -> (T, MQ, 1[,2])
            v = v[:, :, None] if v.ndim == 2 else v[:, :, None, :]
        else:  # (T, W) -> (T, 1, W[,2])
            v = v[:, None, :] if v.ndim == 2 else v[:, None, :, :]
        out[n] = v
    return out


def pair_block_contract(
    qf,  # (NC, MQ, F)
    cf,  # (NC, W, F)
    qmask,  # (NC, MQ) bool
    cmask,  # (NC, W) bool
    radius_scale,  # scalar f32
    edge_fn,  # (vi, vj, geom) -> dict of (T, MQ, W[,2]) arrays
    out_spec: dict,  # {name: trailing dims ()|(2,)}
    cmap: dict,
    reduce: str = "sum",
    fill: float = 0.0,
    want_bwd: bool = False,
    mask_pos_key: str = "pos",
    tile: int = 16,
    interpret: bool = False,
):
    """Run the contraction; returns (out_q {name: (NC, MQ, ...)}, out_c or None)."""
    NC, MQ, F = qf.shape
    W = cf.shape[1]
    names = sorted(out_spec)
    o_widths = [1 if out_spec[n] == () else out_spec[n][0] for n in names]
    O = sum(o_widths)

    # pad NC to a multiple of tile
    pad = (-NC) % tile
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        cf = jnp.pad(cf, ((0, pad), (0, 0), (0, 0)))
        qmask = jnp.pad(qmask, ((0, pad), (0, 0)))
        cmask = jnp.pad(cmask, ((0, pad), (0, 0)))
    NCP = NC + pad
    grid = (NCP // tile,)

    rs = jnp.asarray([[radius_scale]], jnp.float32)

    def kernel(rs_ref, qf_ref, cf_ref, qm_ref, cm_ref, oq_ref, oc_ref):
        q = qf_ref[:]
        c = cf_ref[:]
        qm = qm_ref[:] > 0.5
        cm = cm_ref[:] > 0.5
        vi = _unpack(q, cmap, "q")
        vj = _unpack(c, cmap, "c")
        scale = rs_ref[0, 0]

        diff = vi["pos"] - vj["pos"]  # (T, MQ, W, 2)
        r = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-30)
        h_ij = 0.5 * (vi["h"] + vj["h"])
        if mask_pos_key == "pos":
            r_mask = r
        else:
            dm = vi[mask_pos_key] - vj[mask_pos_key]
            r_mask = jnp.sqrt(jnp.sum(dm * dm, -1) + 1e-30)
        valid = qm[:, :, None] & cm[:, None, :] & (r_mask < scale * h_ij)
        geom = KGeom(diff, r, h_ij, valid)

        fwd = edge_fn(vi, vj, geom)

        col = 0
        for n, w in zip(names, o_widths):
            e = fwd[n]
            v = valid if e.ndim == 3 else valid[..., None]
            if reduce == "sum":
                red = jnp.sum(jnp.where(v, e, 0.0), axis=2)
            else:
                red = jnp.max(jnp.where(v, e, fill), axis=2)
            if red.ndim == 2:
                red = red[..., None]
            oq_ref[:, :, col : col + w] = red
            col += w

        if want_bwd:
            bwd = edge_fn(vj, vi, geom.reversed())
            col = 0
            for n, w in zip(names, o_widths):
                e = bwd[n]
                e = jnp.broadcast_to(e, valid.shape + e.shape[3:])
                v = valid if e.ndim == 3 else valid[..., None]
                if reduce == "sum":
                    red = jnp.sum(jnp.where(v, e, 0.0), axis=1)  # over MQ
                else:
                    red = jnp.max(jnp.where(v, e, fill), axis=1)
                if red.ndim == 2:
                    red = red[..., None]
                oc_ref[:, :, col : col + w] = red
                col += w

    out_shapes = (
        jax.ShapeDtypeStruct((NCP, MQ, O), jnp.float32),
        jax.ShapeDtypeStruct((NCP, W, O), jnp.float32),
    )
    oq, oc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, MQ, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, W, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, MQ), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, MQ, O), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, W, O), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(rs, qf, cf, qmask.astype(jnp.float32), cmask.astype(jnp.float32))

    def unpack_out(o, S):
        res = {}
        col = 0
        for n, w in zip(names, o_widths):
            v = o[:NC, :, col : col + w]
            res[n] = v[..., 0] if out_spec[n] == () else v
            col += w
        return res

    out_q = unpack_out(oq, MQ)
    out_c = unpack_out(oc, W) if want_bwd else None
    return out_q, out_c
