"""Dense cell-grid engine: per-level grid tensors + shifted-window pair reductions.

Why this exists: on TPU, arbitrary-index gathers/scatters run orders of magnitude below
memory bandwidth (measured ~17 ms for a (24k, 96) gather on v5e — ~200x off), so the
classic neighbor-list formulation (ops/neighbors.py, kept as the reference backend) is
latency-bound. This engine removes *all* per-edge gathers from the hot path:

  - particles are binned into per-level grid tensors (ny_l, nx_l, MPC) of slots, built
    with ONE C-sized scatter per field per step;
  - a particle's neighbor candidates are the 3x3 surrounding cells of every level — on
    a grid tensor those are *static shifted slices* (pad + slice), pure contiguous data
    movement that XLA streams at full bandwidth;
  - cross-level windows use the power-of-two nesting of the level ladder: a fine cell's
    parent window at a coarser level is an upsample (jnp.repeat) of the shifted coarse
    grid, and the reverse reduction is a reshape-sum plus nine shifted adds — all dense.

Interaction semantics are identical to ops/neighbors.py: pair (i, j) interacts iff
|x_ij| < radius_scale * (h_i + h_j)/2 (neighborhood_search.rs:138-185 incl. the
symmetrization); the distance mask enforces it inside each window.

Level ladder is *static* (cell0 * 2^l with a scene-wide origin), so grid shapes are
compile-time constants; the alive count and occupancy stay dynamic via slot masks.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import kernels


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Static grid geometry (part of the jit cache key)."""

    origin: tuple  # (x, y) world coords of cell (0, 0) corner
    cell0: float  # finest cell size; must cover the largest search radius of level 0
    levels: int  # L; level l has cell size cell0 * 2^l
    nx0: int  # finest grid dims (divisible by 2^(L-1))
    ny0: int
    mpc: int = 48  # max particles per cell (any level)
    capacity: int = 0  # C (flat particle capacity)
    # levels that can actually hold particles (static scene knowledge); pair blocks are
    # instantiated only for these
    populated: tuple = ()
    # pre-rounding finest dims (the tile engine does not need the 2^(L-1)
    # divisibility that the dense grid's up/downsampling requires)
    nx_raw: int = 0
    ny_raw: int = 0

    def dims(self, l: int):
        return self.ny0 >> l, self.nx0 >> l

    def cell(self, l: int) -> float:
        return self.cell0 * (2.0**l)

    @property
    def slots_per_level(self):
        return [self.dims(l)[0] * self.dims(l)[1] * self.mpc for l in range(self.levels)]

    @property
    def level_offsets(self):
        offs, acc = [], 0
        for s in self.slots_per_level:
            offs.append(acc)
            acc += s
        return offs, acc


def make_grid_config(
    box_min,
    box_max,
    max_search_radius_factor: float,
    h_min: float,
    h_max: float,
    capacity: int,
    mpc: int = 32,
    adaptive_all_levels: bool = False,
) -> GridConfig:
    """Derive the static ladder from scene bounds and the expected h range.

    max_search_radius_factor: the largest radius_scale used (extended level-estimation
    search or 2.0); cell0 covers that radius for the smallest particles.
    """
    sr_min = max_search_radius_factor * h_min * 1.0001
    sr_max = max_search_radius_factor * h_max * 1.0001
    levels = max(1, int(math.ceil(math.log2(max(sr_max / sr_min, 1.0)))) + 1)
    cell0 = sr_min
    # a level whose cell already covers the whole domain serves every larger
    # particle; ladders deeper than that only force nx0's 2^(L-1) divisibility
    # rounding to explode the cell count (conservative h_max estimates with
    # particle_radius_base ~0.7 would otherwise demand nx0=512 for a 2x2 box).
    # Particles beyond the clamped top level trip the level_overflow check.
    domain = max(box_max[0] - box_min[0], box_max[1] - box_min[1])
    levels_cap = max(1, int(math.ceil(math.log2(max(domain / cell0, 1.0)))) + 1)
    levels = min(levels, levels_cap)

    # pad by one fine cell only: window borders are handled by the shifted-slice fill
    # (shift2d pads virtually), and coordinates clip into edge cells — a coarsest-cell
    # physical margin would inflate the fine grid by 2^L cells per side
    pad = cell0
    ox, oy = box_min[0] - pad, box_min[1] - pad
    ex = (box_max[0] + pad) - ox
    ey = (box_max[1] + pad) - oy
    align = 2 ** (levels - 1)

    def dim_raw(e):
        return int(math.ceil(e / cell0)) + 1

    def dim(e):
        n = dim_raw(e)
        return ((n + align - 1) // align) * align

    if adaptive_all_levels:
        populated = tuple(range(levels))
    else:
        populated = None  # caller fills from the initial mass distribution
    return GridConfig(
        nx_raw=dim_raw(ex), ny_raw=dim_raw(ey),
        origin=(float(ox), float(oy)),
        cell0=float(cell0),
        levels=levels,
        nx0=dim(ex),
        ny0=dim(ey),
        mpc=mpc,
        capacity=capacity,
        populated=populated if populated is not None else tuple(range(levels)),
    )


@struct.dataclass
class GridBins:
    """Per-step binning: who sits in which slot.

    slot_of[p]  : flat slot index of particle p (=-1 -> dropped/dead)
    level_of[p] : level of particle p (L for dead)
    slot_idx    : (total_slots,) particle index occupying each slot (C for empty)
    slot_mask   : (total_slots,) bool
    overflow    : () int32 — particles dropped because their cell was full
    level_overflow : () int32 — particles whose radius exceeds the top level
    """

    slot_of: jnp.ndarray
    level_of: jnp.ndarray
    slot_idx: jnp.ndarray
    slot_mask: jnp.ndarray
    overflow: jnp.ndarray
    level_overflow: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg",))
def build_bins(position, sr, alive, cfg: GridConfig) -> GridBins:
    """Assign (level, cell, rank) per particle; one sort + one scatter."""
    C = position.shape[0]
    L = cfg.levels

    ratio = jnp.maximum(sr / cfg.cell0, 1.0)
    level = jnp.ceil(jnp.log2(ratio) - 1e-6).astype(jnp.int32)
    # snap up to the nearest *populated* level (pair blocks only exist for those; a
    # larger cell still covers the particle's search radius, so this is always safe)
    pop = jnp.asarray(sorted(set(cfg.populated)), jnp.int32)
    snap = jnp.searchsorted(pop, level, side="left")
    level_overflow = jnp.sum(alive & (snap > len(cfg.populated) - 1)).astype(jnp.int32)
    level = pop[jnp.clip(snap, 0, len(cfg.populated) - 1)]
    level = jnp.where(alive, level, L)

    # cell coordinates at own level
    cell_size = cfg.cell0 * jnp.exp2(level.astype(jnp.float32))
    cell_size = jnp.where(level >= L, cfg.cell0, cell_size)
    ox = jnp.asarray(cfg.origin, jnp.float32)
    cx = jnp.floor((position[:, 0] - ox[0]) / cell_size).astype(jnp.int32)
    cy = jnp.floor((position[:, 1] - ox[1]) / cell_size).astype(jnp.int32)

    nys = [cfg.dims(l)[0] for l in range(L)]
    nxs = [cfg.dims(l)[1] for l in range(L)]
    nx_of = jnp.asarray(nxs + [1], jnp.int32)[jnp.minimum(level, L)]
    ny_of = jnp.asarray(nys + [1], jnp.int32)[jnp.minimum(level, L)]
    cx = jnp.clip(cx, 0, nx_of - 1)
    cy = jnp.clip(cy, 0, ny_of - 1)
    cell_id = cx + cy * nx_of

    offsets_list, total_slots = cfg.level_offsets
    offsets = jnp.asarray(offsets_list + [total_slots], jnp.int32)
    cell_base = offsets[jnp.minimum(level, L)] // cfg.mpc + cell_id  # global cell number
    cell_base = jnp.where(alive, cell_base, total_slots // cfg.mpc)

    # rank within cell via one sort over global cell numbers
    order = jnp.argsort(cell_base).astype(jnp.int32)
    sorted_cells = cell_base[order]
    first = jnp.searchsorted(sorted_cells, sorted_cells, side="left")
    rank_sorted = jnp.arange(C, dtype=jnp.int32) - first.astype(jnp.int32)
    rank = jnp.zeros(C, jnp.int32).at[order].set(rank_sorted)

    fits = alive & (rank < cfg.mpc)
    overflow = jnp.sum(alive & ~fits).astype(jnp.int32)
    slot_of = jnp.where(fits, cell_base * cfg.mpc + rank, -1)

    slot_idx = jnp.full((total_slots,), C, jnp.int32)
    slot_idx = slot_idx.at[jnp.where(fits, slot_of, total_slots)].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop"
    )
    slot_mask = slot_idx < C

    return GridBins(
        slot_of=slot_of,
        level_of=level,
        slot_idx=slot_idx,
        slot_mask=slot_mask,
        overflow=overflow,
        level_overflow=level_overflow,
    )


def scatter_field(bins: GridBins, cfg: GridConfig, field):
    """Flat (C, ...) -> slot layout (total_slots, ...) with one C-sized scatter."""
    _, total = cfg.level_offsets
    out = jnp.zeros((total,) + field.shape[1:], field.dtype)
    target = jnp.where(bins.slot_of >= 0, bins.slot_of, total)
    return out.at[target].set(field, mode="drop")


def gather_result(bins: GridBins, cfg: GridConfig, slot_values, fill=0.0):
    """Slot layout -> flat (C, ...) with one C-sized gather (dropped particles -> fill)."""
    safe = jnp.maximum(bins.slot_of, 0)
    vals = slot_values[safe]
    ok = bins.slot_of >= 0
    ok = ok.reshape(ok.shape + (1,) * (vals.ndim - 1))
    return jnp.where(ok, vals, fill)


def level_view(cfg: GridConfig, slot_array, l: int):
    """Static slice of the flat slot array -> (ny_l, nx_l, MPC, ...) view."""
    offs, _ = cfg.level_offsets
    ny, nx = cfg.dims(l)
    n = ny * nx * cfg.mpc
    a = slot_array[offs[l] : offs[l] + n]
    return a.reshape((ny, nx, cfg.mpc) + a.shape[1:])


def shift2d(a, dy: int, dx: int, fill):
    """Shifted view: out[y, x] = a[y + dy, x + dx] with `fill` outside — pad + slice."""
    ny, nx = a.shape[0], a.shape[1]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (a.ndim - 2)
    ap = jnp.pad(a, pad, constant_values=fill)
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(ap, 1 + dy, ny, axis=0), 1 + dx, nx, axis=1
    )


def upsample2d(a, factor: int):
    """Repeat each cell factor x factor (coarse -> fine resolution)."""
    if factor == 1:
        return a
    return jnp.repeat(jnp.repeat(a, factor, axis=0), factor, axis=1)


def downsample_sum2d(a, factor: int):
    """Sum fine cells into their parent (fine -> coarse resolution)."""
    if factor == 1:
        return a
    ny, nx = a.shape[0], a.shape[1]
    r = a.reshape((ny // factor, factor, nx // factor, factor) + a.shape[2:])
    return jnp.sum(r, axis=(1, 3))


def downsample_max2d(a, factor: int):
    if factor == 1:
        return a
    ny, nx = a.shape[0], a.shape[1]
    r = a.reshape((ny // factor, factor, nx // factor, factor) + a.shape[2:])
    return jnp.max(r, axis=(1, 3))


OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
