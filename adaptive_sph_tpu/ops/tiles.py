"""Sorted-tile engine layout: cell-row-sorted particles + VMEM-resident pair sweeps.

Round-2 production structure replacing the dense slot grid (ops/grid.py) on the hot
path. Measured motivation (scripts/prim_bench.py, v5e): arbitrary gathers run ~200x
below HBM bandwidth and XLA materializes dense-window intermediates in HBM, so the
round-1 engine spent ~50 ms per pair sweep. Here:

  - alive particles are sorted by (level, cell-row, cell) with ONE multi-operand
    lax.sort (no gathers); each (level,row) segment is padded to a multiple of
    TILE=64 so a 64-slot tile never straddles a cell row or level;
  - a particle's neighbor candidates at level lc are 3+ *contiguous* ranges of the
    sorted array (one per candidate cell row), found via a cell_starts CSR built
    with one scatter + one reverse scan; `window_ranges` pre-flattens each tile's
    rows into a short list of CSR cell-index pairs (pure XLA arithmetic);
  - pair sweeps run as a single-grid-step Pallas kernel (ops/pallas_sweeps.py) with
    the whole sorted field table resident in VMEM (~1.6 MB at C=24k), looping tiles
    x ranges x 64-wide chunks in-register — no HBM pair intermediates at all.

Interaction semantics are identical to ops/neighbors.py / ops/grid.py:
pair (i, j) interacts iff |x_ij| < radius_scale * (h_i + h_j) / 2
(reference neighborhood_search.rs:138-185 including the symmetrization).

Level ladder and geometry reuse GridConfig (static shapes; jit cache key).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .grid import GridConfig

TILE = 64  # tile/chunk width: queries per tile == candidates per chunk read


def default_interpret() -> bool:
    """Pallas interpret-mode default: interpret off on TPU, on elsewhere.
    ASPH_FORCE_MOSAIC=1 forces real Mosaic lowering regardless of backend —
    used by scripts/aot_check.py to AOT-compile the TPU path on a CPU host
    via a compile-only topology (no hardware needed)."""
    import os
    if os.environ.get("ASPH_FORCE_MOSAIC", "0") == "1":
        return False
    import jax
    return jax.default_backend() != "tpu"


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Static geometry for the sorted-tile engine (jit cache key)."""

    origin: tuple
    cell0: float
    levels: int
    nx0: int
    ny0: int
    capacity: int
    populated: tuple
    mscale: float  # the largest radius_scale any sweep uses (binning bound)
    tq: int = 32  # query-tile width = cell-row padding granularity (16/32/64)
    b_max: int = 0  # weight-cache block capacity (0 = derive)
    # per-level (ny, nx): the tile engine computes each level's cells
    # geometrically, so dims need no power-of-two alignment — ceil dims keep
    # deep adaptive ladders inside the SMEM CSR budget (empty = nx0 >> l)
    dims_list: tuple = ()

    @classmethod
    def from_grid(cls, g: GridConfig, mscale: float, tq: int = 32,
                  b_max: int = 0) -> "TileConfig":
        if b_max <= 0:
            # ~(3 rows x 2 chunks) per tile per populated level, x2 margin, /64-group
            nt = g.capacity // tq
            b_max = max(4096, nt * 12 * len(set(g.populated)))
            # cap the weight-cache HBM footprint (block = 64 x lane_width(tq) f32)
            # and its SMEM meta (b_max int32s share the 1 MiB SMEM with the CSR);
            # overflow is detected at runtime and triggers capacity growth/retry
            block_bytes = 64 * max(2 * tq, 128) * 4
            b_max = min(b_max, max(8192, (2 << 30) // block_bytes), 49152)
        b_max = ((b_max + 63) // 64) * 64
        if g.nx_raw and g.ny_raw:
            dims_list = tuple(
                (max(1, -(-g.ny_raw // (1 << l))), max(1, -(-g.nx_raw // (1 << l))))
                for l in range(g.levels)
            )
            nx0, ny0 = g.nx_raw, g.ny_raw
        else:
            dims_list = ()
            nx0, ny0 = g.nx0, g.ny0
        return cls(
            origin=g.origin, cell0=g.cell0, levels=g.levels, nx0=nx0, ny0=ny0,
            capacity=g.capacity, populated=tuple(sorted(set(g.populated))),
            mscale=float(mscale), tq=int(tq), b_max=int(b_max),
            dims_list=dims_list,
        )

    def dims(self, l: int):
        if self.dims_list:
            return self.dims_list[l]
        return self.ny0 >> l, self.nx0 >> l

    def cell(self, l: int) -> float:
        return self.cell0 * (2.0**l)

    @property
    def num_tiles(self) -> int:
        return self.capacity // self.tq

    @property
    def cell_offsets(self):
        """Flat offsets of each populated level's cell block (cells, not slots)."""
        offs, acc = {}, 0
        for l in self.populated:
            offs[l] = acc
            ny, nx = self.dims(l)
            acc += ny * nx
        return offs, acc

    @property
    def row_offsets(self):
        """Flat offsets of each populated level's row block."""
        offs, acc = {}, 0
        for l in self.populated:
            offs[l] = acc
            acc += self.dims(l)[0]
        return offs, acc

@struct.dataclass
class TileBins:
    """Per-step sorted layout.

    perm       : (C,) sorted-slot -> original particle index (C = none/padding)
    pp         : (C,) original particle -> sorted slot (C = dropped/dead)
    cell_starts: (total_cells+1,) CSR starts into the sorted array, all levels
    h_max_lvl  : (8,) max h per populated-level position (0 elsewhere)
    n_padded   : () int32 — slots in use (alive + row padding)
    overflow   : () int32 — alive particles that did not fit in capacity
    level_overflow : () int32 — alive particles above the top populated level
    """

    perm: jnp.ndarray
    pp: jnp.ndarray
    cell_starts: jnp.ndarray
    h_max_lvl: jnp.ndarray
    n_padded: jnp.ndarray
    overflow: jnp.ndarray
    level_overflow: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg",))
def build_tiles(position, sr, h, alive, cfg: TileConfig, origin=None) -> TileBins:
    """Sort alive particles into the row-padded tile layout.

    sr: search radius per particle (mscale * h_eff) — decides the level.
    h:  smoothing length (for per-level maxima used in window bounds).
    origin: optional traced (2,) override of cfg.origin (sharded slabs).
    """
    C = position.shape[0]
    P = list(cfg.populated)
    L = cfg.levels

    # level assignment (identical semantics to grid.build_bins)
    ratio = jnp.maximum(sr / cfg.cell0, 1.0)
    level = jnp.ceil(jnp.log2(ratio) - 1e-6).astype(jnp.int32)
    pop = jnp.asarray(P, jnp.int32)
    # searchsorted(pop, level, 'left') over a tiny static ladder, without gathers
    snap = jnp.sum(level[:, None] > pop[None, :], axis=1).astype(jnp.int32)
    level_overflow = jnp.sum(alive & (snap > len(P) - 1)).astype(jnp.int32)
    level = pop[jnp.clip(snap, 0, len(P) - 1)]
    level = jnp.where(alive, level, L)

    # cell coordinates at own level
    cell_size = cfg.cell0 * jnp.exp2(level.astype(jnp.float32))
    cell_size = jnp.where(level >= L, cfg.cell0, cell_size)
    ox = jnp.asarray(cfg.origin, jnp.float32) if origin is None else origin.astype(jnp.float32)
    nys = [cfg.dims(l)[0] for l in range(L)]
    nxs = [cfg.dims(l)[1] for l in range(L)]
    nx_of = jnp.asarray(nxs + [1], jnp.int32)[jnp.minimum(level, L)]
    ny_of = jnp.asarray(nys + [1], jnp.int32)[jnp.minimum(level, L)]
    cx = jnp.clip(jnp.floor((position[:, 0] - ox[0]) / cell_size).astype(jnp.int32), 0, nx_of - 1)
    cy = jnp.clip(jnp.floor((position[:, 1] - ox[1]) / cell_size).astype(jnp.int32), 0, ny_of - 1)

    coffs, total_cells = cfg.cell_offsets
    roffs, total_rows = cfg.row_offsets
    coff_of = jnp.zeros(L + 1, jnp.int32)
    roff_of = jnp.zeros(L + 1, jnp.int32)
    for l in P:
        coff_of = coff_of.at[l].set(coffs[l])
        roff_of = roff_of.at[l].set(roffs[l])
    lv = jnp.minimum(level, L)
    g = jnp.where(alive, coff_of[lv] + cy * nx_of + cx, jnp.int32(total_cells))
    grow = jnp.where(alive, roff_of[lv] + cy, jnp.int32(total_rows))

    # one sort carries everything (no gathers). When cell ids fit, pack
    # (cell, iota) into ONE int32 key — a single-operand sort is measurably
    # cheaper than the 3-operand variant; rows are recovered arithmetically
    # from the sorted cell ids via the static ladder.
    iota = jnp.arange(C, dtype=jnp.int32)
    if (total_cells + 1) * C < 2**31:
        key = g * jnp.int32(C) + iota
        (ks,) = jax.lax.sort((key,), num_keys=1)
        src = ks % jnp.int32(C)
        gs = ks // jnp.int32(C)
        # row of cell id: per populated level, row = roff + (g - coff) // nx
        grow_s = jnp.full_like(gs, jnp.int32(total_rows))
        for l in P:
            ny, nx = cfg.dims(l)
            lo = coffs[l]
            hi = lo + ny * nx
            in_l = (gs >= lo) & (gs < hi)
            grow_s = jnp.where(in_l, roffs[l] + (gs - lo) // jnp.int32(nx), grow_s)
    else:
        gs, grow_s, src = jax.lax.sort((g, grow, iota), num_keys=1)

    # rank within row + row-padding placement (first/last occurrence via scans;
    # jnp.searchsorted(x, x) lowers to a gather loop on TPU — measured ~4 ms each)
    prev_row = jnp.concatenate([grow_s[:1] - 1, grow_s[:-1]])
    next_row = jnp.concatenate([grow_s[1:], grow_s[-1:] + 1])
    is_first = grow_s != prev_row
    is_last = grow_s != next_row
    first = jax.lax.associative_scan(jnp.maximum, jnp.where(is_first, iota, 0))
    last = jnp.flip(
        jax.lax.associative_scan(
            jnp.minimum, jnp.flip(jnp.where(is_last, iota + 1, C))
        )
    )
    rank = iota - first
    size = last - first
    # padding added by the previous row, accumulated
    TQ = cfg.tq
    prev_size = jnp.concatenate([size[:1] * 0, size[:-1]])
    pad_prev = (TQ - prev_size % TQ) % TQ
    pad_before = jnp.cumsum(jnp.where(is_first & (iota > 0), pad_prev, 0)).astype(jnp.int32)
    pp_s = first + pad_before + rank  # padded slot of sorted particle i

    alive_s = grow_s < total_rows
    n_alive = jnp.sum(alive_s).astype(jnp.int32)
    fits = alive_s & (pp_s < C)
    overflow = jnp.sum(alive_s & ~fits).astype(jnp.int32)
    n_padded = jnp.max(jnp.where(fits, pp_s + 1, 0)).astype(jnp.int32)

    # perm: padded slot -> original index
    perm = jnp.full((C,), C, jnp.int32)
    perm = perm.at[jnp.where(fits, pp_s, C)].set(src, mode="drop")
    # pp: original index -> padded slot
    pp = jnp.full((C,), C, jnp.int32)
    pp = pp.at[jnp.where(fits, src, C)].set(pp_s, mode="drop")

    # CSR cell starts: scatter first-of-cell positions, fill empties from the right
    is_first_cell = gs != jnp.concatenate([gs[:1] - 1, gs[:-1]])
    starts = jnp.full((total_cells + 1,), jnp.int32(2**30), jnp.int32)
    tgt = jnp.where(fits & is_first_cell & (gs < total_cells), gs, total_cells + 1)
    starts = starts.at[tgt].set(pp_s, mode="drop")
    starts = starts.at[total_cells].min(n_padded)
    # reverse cummin fills empty cells with the next occupied cell's start
    starts = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(starts)))

    # per-level h maxima (for window radius bounds); position p of level P[p]
    hm = jnp.zeros((8,), jnp.float32)
    for p, l in enumerate(P):
        hm = hm.at[p].set(jnp.max(jnp.where(alive & (level == l), h, 0.0)))

    return TileBins(
        perm=perm,
        pp=pp,
        cell_starts=starts,
        h_max_lvl=hm,
        n_padded=n_padded,
        overflow=overflow,
        level_overflow=level_overflow,
    )


def sort_fields(bins: TileBins, fields, fill=0.0):
    """Stack flat (C,)/(C,k) fields -> sorted (C, F) table with ONE row gather.

    fields: list of (C,) or (C,k) arrays. Padding/dead slots get `fill`.
    """
    cols = []
    for f in fields:
        if f.ndim == 1:
            cols.append(f[:, None])
        else:
            cols.append(f)
    flat = jnp.concatenate([c.astype(jnp.float32) for c in cols], axis=1)
    safe = jnp.minimum(bins.perm, flat.shape[0] - 1)
    out = flat[safe]
    ok = (bins.perm < flat.shape[0])[:, None]
    return jnp.where(ok, out, fill)


def sort_one(bins: TileBins, field, fill=0.0):
    """Sort a single (C,) or (C,k) field (row gather)."""
    out = sort_fields(bins, [field], fill)
    return out[:, 0] if field.ndim == 1 else out


def unsort(bins: TileBins, sorted_vals, orig_template, fill=0.0):
    """Sorted (C, ...) results -> original particle order; dropped -> fill."""
    safe = jnp.minimum(bins.pp, sorted_vals.shape[0] - 1)
    vals = sorted_vals[safe]
    ok = bins.pp < sorted_vals.shape[0]
    ok = ok.reshape(ok.shape + (1,) * (vals.ndim - 1))
    return jnp.where(ok, vals, fill)


def to_chunks(sorted_arr, width: int = TILE):
    """(C, k) or (C,) sorted array -> (C//width, width, k) query-layout view (free)."""
    if sorted_arr.ndim == 1:
        sorted_arr = sorted_arr[:, None]
    C, k = sorted_arr.shape
    return sorted_arr.reshape(C // width, width, k)


def to_cand(sorted_arr):
    """(C, k) or (C,) sorted array -> (C//TILE, k, TILE) candidate layout (transpose)."""
    return jnp.swapaxes(to_chunks(sorted_arr, TILE), 1, 2)


RL = 12  # candidate-range descriptors per (tile, populated level)
WM_STRIDE = 1 + 2 * RL  # per-(tile, level) wm entry: [count, a0, b0, a1, b1, ...]


def window_ranges(cfg: TileConfig, bins: TileBins, statics_sorted, origin=None):
    """Per-tile flat candidate-range descriptors (kernel scalar prefetch).

    Returns (wm, collapsed):
      wm: int32 (NT * NL * WM_STRIDE,). Per (tile t, populated-level position
          p), wm[(t*NL+p)*WM_STRIDE:] = [count, a0, b0, a1, b1, ...]: `count`
          CELL-INDEX pairs (a, b); the walk kernels read the contiguous slot
          range as [starts[a], starts[b]) — one flat range loop, no per-row
          geometry or level metadata in the kernel at all.
      collapsed: int32 scalar — (tile, level) entries whose candidate row count
          exceeded RL and were collapsed into ONE spanning pair
          (first row's window start .. last row's window end). The span walks
          the full rows in between (masked, correct); this matches what the
          round-3 row-nest kernels effectively walked for coarse-query x
          fine-candidate tiles, so it is a diagnostic, not a regression.

    Each candidate row y in [ylo, yhi] of level l contributes the pair
    (coff + y*nx + xlo, coff + y*nx + xhi + 1) — the same CSR window the
    round-3 kernels computed in their row loops, now emitted as pure XLA
    arithmetic (no gathers, sorts, or scatters: a Morton/segment-merge variant
    of this structure measured 2.9 ms/step in XLA-side gathers+segment
    reductions+scatters on v5e and was rejected; see PERFORMANCE.md round 4).

    origin: optional traced (2,) override of cfg.origin (sharded slabs).
    """
    TQ = cfg.tq
    NT = cfg.capacity // TQ
    NL = len(cfg.populated)
    x = statics_sorted[:, 0].reshape(NT, TQ)
    y = statics_sorted[:, 1].reshape(NT, TQ)
    h = statics_sorted[:, 2].reshape(NT, TQ)
    valid = h > 0.0
    big = jnp.float32(1e30)
    xmin = jnp.min(jnp.where(valid, x, big), axis=1)
    xmax = jnp.max(jnp.where(valid, x, -big), axis=1)
    ymin = jnp.min(jnp.where(valid, y, big), axis=1)
    ymax = jnp.max(jnp.where(valid, y, -big), axis=1)
    hmax_t = jnp.max(jnp.where(valid, h, 0.0), axis=1)
    alive_t = hmax_t > 0.0

    if origin is None:
        ox, oy = cfg.origin
    else:
        ox, oy = origin[0], origin[1]
    _, total_cells = cfg.cell_offsets
    kk = jnp.arange(RL, dtype=jnp.int32)
    collapsed = jnp.int32(0)
    metas = []
    for p, l in enumerate(cfg.populated):
        ny, nx = cfg.dims(l)
        coff = jnp.int32(cfg.cell_offsets[0][l])
        cellsz = jnp.float32(cfg.cell(l))
        rad = 0.5 * jnp.float32(cfg.mscale) * (hmax_t + bins.h_max_lvl[p])
        ylo = jnp.clip(jnp.floor((ymin - oy - rad) / cellsz).astype(jnp.int32), 0, ny - 1)
        yhi = jnp.clip(jnp.floor((ymax - oy + rad) / cellsz).astype(jnp.int32), 0, ny - 1)
        xlo = jnp.clip(jnp.floor((xmin - ox - rad) / cellsz).astype(jnp.int32), 0, nx - 1)
        xhi = jnp.clip(jnp.floor((xmax - ox + rad) / cellsz).astype(jnp.int32), 0, nx - 1)
        nrows = jnp.where(alive_t, yhi - ylo + 1, 0)
        collapse = nrows > RL
        collapsed = collapsed + jnp.sum(collapse.astype(jnp.int32))
        cnt = jnp.where(collapse, 1, nrows)
        yk = ylo[:, None] + kk[None, :]  # (NT, RL)
        a = coff + yk * nx + xlo[:, None]
        b = coff + yk * nx + xhi[:, None] + 1
        first = kk[None, :] == 0
        a = jnp.where(collapse[:, None] & first, coff + ylo[:, None] * nx + xlo[:, None], a)
        b = jnp.where(collapse[:, None] & first, coff + yhi[:, None] * nx + xhi[:, None] + 1, b)
        live = kk[None, :] < cnt[:, None]
        a = jnp.where(live, a, total_cells)
        b = jnp.where(live, b, total_cells)
        ent = jnp.concatenate(
            [cnt[:, None], jnp.stack([a, b], axis=2).reshape(NT, 2 * RL)], axis=1)
        metas.append(ent)  # (NT, WM_STRIDE)
    wm = jnp.stack(metas, axis=1).reshape(-1).astype(jnp.int32)
    return wm, collapsed


def window_meta(cfg: TileConfig, bins: TileBins, statics_sorted, origin=None):
    """Back-compat wrapper: window_ranges without the collapsed diagnostic."""
    return window_ranges(cfg, bins, statics_sorted, origin=origin)[0]
