"""Sorted-tile engine layout: cell-row-sorted particles + VMEM-resident pair sweeps.

Round-2 production structure replacing the dense slot grid (ops/grid.py) on the hot
path. Measured motivation (scripts/prim_bench.py, v5e): arbitrary gathers run ~200x
below HBM bandwidth and XLA materializes dense-window intermediates in HBM, so the
round-1 engine spent ~50 ms per pair sweep. Here:

  - alive particles are sorted by (level, cell-row, cell) with ONE single-key
    lax.sort (no gathers) and packed with ZERO padding: sorted position == slot.
    (Rounds 2-3 padded every cell row to the query-tile width so tiles stayed
    row-pure; that left ~half the query lanes dead and inflated candidate
    ranges with padding slots — the round-4 census measured 1.84% pair
    validity and 47% fully-empty walked windows on the bench scene.)
  - a particle's neighbor candidates at level lc are a few *contiguous* ranges
    of the sorted array (one per candidate cell row), found via a cell_starts
    CSR built with one scatter + one reverse scan; `window_ranges` computes
    per-tile candidate ranges from 8-lane GROUP hulls (a query tile may now
    span several cell rows — each row's range is the hull of the groups whose
    support reaches it, a tight exact superset), flattened to a short list of
    CSR cell-index pairs (pure XLA arithmetic);
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
    # clique mode (ops/cliques.py): patch side in cells. 0 = legacy row-major
    # packed layout; >= 2 = PATCH-MAJOR cell numbering with the sorted array
    # padded to PATCH_SLOTS slots per occupied patch, plus a per-patch halo
    # slot map — each patch's full same-level candidate set becomes exactly
    # [own 128 slots | 128 halo slots], so the PPE operator runs as a dense
    # batched einsum with no window walk (see ops/cliques.py).
    patch: int = 0

    def patch_dims(self, l: int):
        """(npy, npx) patch-grid dims of level l (patch mode)."""
        ny, nx = self.dims(l)
        return -(-ny // self.patch), -(-nx // self.patch)

    @classmethod
    def from_grid(cls, g: GridConfig, mscale: float, tq: int = 32,
                  b_max: int = 0, patch: int = 0) -> "TileConfig":
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
            dims_list=dims_list, patch=int(patch),
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
        """Flat offsets of each populated level's cell block (cells, not slots).

        Patch mode pads each level's grid to whole patches (npx*npy*patch^2
        cell ids, phantom cells past nx/ny stay empty) so that a patch's cells
        are ONE aligned contiguous id block: patch_global = cell_id // patch^2."""
        offs, acc = {}, 0
        for l in self.populated:
            offs[l] = acc
            if self.patch:
                npy, npx = self.patch_dims(l)
                acc += npy * npx * self.patch * self.patch
            else:
                ny, nx = self.dims(l)
                acc += ny * nx
        return offs, acc

    @property
    def patch_offsets(self):
        """Patch-mode: flat offsets of each level's patch block + total patches."""
        offs, tot = self.cell_offsets
        P2 = self.patch * self.patch
        return {l: o // P2 for l, o in offs.items()}, tot // P2

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
    n_padded   : () int32 — slots in use (alive count in the packed layout;
                 PATCH_SLOTS * n_patches in patch mode)
    overflow   : () int32 — dropped alive particles. Always 0 in the packed
                 layout (alive <= capacity by construction); in patch mode
                 counts primary drops (patch fuller than PATCH_SLOTS, or
                 padded slots past capacity) — the runner recovers by growing
                 capacity / re-picking the patch side
    level_overflow : () int32 — alive particles above the top populated level

    Patch mode only (None otherwise):
    n_patches  : () int32 — occupied patches (the halo map itself is built by
                 build_halo from the sorted statics)
    """

    perm: jnp.ndarray
    pp: jnp.ndarray
    cell_starts: jnp.ndarray
    h_max_lvl: jnp.ndarray
    n_padded: jnp.ndarray
    overflow: jnp.ndarray
    level_overflow: jnp.ndarray
    n_patches: jnp.ndarray = None


PATCH_SLOTS = 128  # slots per occupied patch in the patch-major layout (and
                   # per-patch halo slot budget): one full lane vreg


@partial(jax.jit, static_argnames=("cfg",))
def build_tiles(position, sr, h, alive, cfg: TileConfig, origin=None) -> TileBins:
    """Sort alive particles into the packed (padding-free) tile layout.

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
    coff_of = jnp.zeros(L + 1, jnp.int32)
    for l in P:
        coff_of = coff_of.at[l].set(coffs[l])
    lv = jnp.minimum(level, L)
    if cfg.patch:
        # PATCH-MAJOR cell numbering: a patch's P x P cells form one aligned
        # contiguous id block (cell_offsets pads each level to whole patches)
        PS = cfg.patch
        npx_l = jnp.asarray(
            [cfg.patch_dims(l)[1] for l in range(L)] + [1], jnp.int32
        )[jnp.minimum(level, L)]
        pidx = (cy // PS) * npx_l + (cx // PS)
        lc = (cy % PS) * PS + (cx % PS)
        g = jnp.where(alive, coff_of[lv] + pidx * (PS * PS) + lc,
                      jnp.int32(total_cells))
    else:
        g = jnp.where(alive, coff_of[lv] + cy * nx_of + cx, jnp.int32(total_cells))

    # one sort carries everything (no gathers). When cell ids fit, pack
    # (cell, iota) into ONE int32 key — a single-operand sort is measurably
    # cheaper than the multi-operand variant. The sorted position IS the slot:
    # the layout is fully packed (per-group window hulls in window_ranges make
    # row-pure tiles unnecessary, so the old row padding — with its dead lanes,
    # padding slots inside candidate ranges, and row-overflow failure class —
    # is gone entirely).
    iota = jnp.arange(C, dtype=jnp.int32)
    if (total_cells + 1) * C < 2**31:
        key = g * jnp.int32(C) + iota
        (ks,) = jax.lax.sort((key,), num_keys=1)
        src = ks % jnp.int32(C)
        gs = ks // jnp.int32(C)
    else:
        gs, src = jax.lax.sort((g, iota), num_keys=1)

    alive_s = gs < total_cells

    # per-level h maxima (for window radius bounds); position p of level P[p]
    hm = jnp.zeros((8,), jnp.float32)
    for p, l in enumerate(P):
        hm = hm.at[p].set(jnp.max(jnp.where(alive & (level == l), h, 0.0)))

    if cfg.patch:
        return _pad_patches(cfg, gs, src, alive_s, iota, hm, level_overflow,
                            total_cells)

    n_alive = jnp.sum(alive_s).astype(jnp.int32)
    n_padded = n_alive
    overflow = jnp.int32(0)  # packed: alive <= capacity by construction

    # perm: slot -> original index (sorted order, no scatter needed)
    perm = jnp.where(alive_s, src, C)
    # pp: original index -> slot
    pp = jnp.full((C,), C, jnp.int32)
    pp = pp.at[jnp.where(alive_s, src, C)].set(iota, mode="drop")

    # CSR cell starts: scatter first-of-cell positions, fill empties from the right
    is_first_cell = gs != jnp.concatenate([gs[:1] - 1, gs[:-1]])
    starts = jnp.full((total_cells + 1,), jnp.int32(2**30), jnp.int32)
    tgt = jnp.where(alive_s & is_first_cell, gs, total_cells + 1)
    starts = starts.at[tgt].set(iota, mode="drop")
    starts = starts.at[total_cells].min(n_padded)
    # reverse cummin fills empty cells with the next occupied cell's start
    starts = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(starts)))

    return TileBins(
        perm=perm,
        pp=pp,
        cell_starts=starts,
        h_max_lvl=hm,
        n_padded=n_padded,
        overflow=overflow,
        level_overflow=level_overflow,
    )


# the 8 halo directions (dy, dx): a particle at the edge of its patch is a
# same-level halo candidate of the adjacent patch(es) — the 1-cell ring around
# a patch is an exact superset of its same-level out-of-patch pairs because a
# level-l pair's interaction radius 0.5*mscale*(h_i + h_j) <= cell(l) by the
# level assignment (sr = mscale*h <= cell(l))
_DIRS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def _pad_patches(cfg: TileConfig, gs, src, alive_s, iota, hm, level_overflow,
                 total_cells):
    """Patch-mode tail of build_tiles: pad the sorted array to PATCH_SLOTS
    slots per occupied patch (the halo map is built separately by build_halo,
    which needs the sorted positions). Pure XLA: segment ranks via one
    associative scan, destinations via one scatter."""
    C = gs.shape[0]
    P2 = cfg.patch * cfg.patch

    # ---- pad each occupied patch to PATCH_SLOTS slots
    pg = gs // P2  # patch-global id per sorted entry (garbage where dead)
    is_first = alive_s & (pg != jnp.concatenate([pg[:1] - 1, pg[:-1]]))
    o = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # occupied patch index
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, iota, -1))
    r = iota - seg_start
    n_patches = jnp.sum(is_first).astype(jnp.int32)
    d = o * PATCH_SLOTS + r
    ok = alive_s & (r < PATCH_SLOTS) & (d < C)
    overflow = jnp.sum(alive_s & ~ok).astype(jnp.int32)
    n_padded = jnp.minimum(n_patches * PATCH_SLOTS, C)

    drop = jnp.where(ok, d, C)
    perm = jnp.full((C,), C, jnp.int32).at[drop].set(src, mode="drop")
    pp = jnp.full((C,), C, jnp.int32).at[jnp.where(ok, src, C)].set(
        d, mode="drop")

    # CSR over padded slots: padding between patches implicitly extends the
    # previous patch's last occupied cell (walk kernels mask padding by h == 0)
    is_first_cell = gs != jnp.concatenate([gs[:1] - 1, gs[:-1]])
    starts = jnp.full((total_cells + 1,), jnp.int32(2**30), jnp.int32)
    tgt = jnp.where(ok & is_first_cell, gs, total_cells + 1)
    starts = starts.at[tgt].set(d, mode="drop")
    starts = starts.at[total_cells].min(n_padded)
    starts = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(starts)))

    return TileBins(
        perm=perm,
        pp=pp,
        cell_starts=starts,
        h_max_lvl=hm,
        n_padded=n_padded,
        overflow=overflow,
        level_overflow=level_overflow,
        n_patches=n_patches,
    )


@partial(jax.jit, static_argnames=("cfg",))
def build_halo(cfg: TileConfig, bins: TileBins, statics_sorted, origin=None):
    """Per-patch same-level halo slot map from the padded sorted statics.

    Returns (halo_src (C,) int32, halo_overflow () int32): for occupied patch
    o, halo_src[PATCH_SLOTS*o + r] is the sorted SLOT of its r-th same-level
    halo particle; C where absent. Membership: a particle j joins the halo of
    adjacent patch b iff j sits in an edge cell toward b AND is within
    rad_j = 0.5*mscale*(h_j + h_max_level) of b's rectangle — the rect test
    keeps the exact pair superset (dist(j, rect_b) <= |x_i - x_j| for i in b)
    while roughly halving the ring occupancy vs whole ring cells.

    All pure XLA on the fixed (C//PATCH_SLOTS, PATCH_SLOTS) row structure:
    per-row cumsum ranks + tiny (rows, 8) neighbor lookups; no sorts and no
    (C,)-sized gathers.
    """
    PS = cfg.patch
    C = statics_sorted.shape[0]
    NB = C // PATCH_SLOTS
    NL = len(cfg.populated)
    poffs, TOTP = cfg.patch_offsets
    if origin is None:
        ox, oy = cfg.origin
        ox = jnp.float32(ox)
        oy = jnp.float32(oy)
    else:
        ox, oy = origin[0].astype(jnp.float32), origin[1].astype(jnp.float32)

    x = statics_sorted[:, 0]
    y = statics_sorted[:, 1]
    h = statics_sorted[:, 2]
    real = h > 0.0
    iota = jnp.arange(C, dtype=jnp.int32)

    # level position from h (same ladder snap as build_tiles)
    ratio = jnp.maximum(h * jnp.float32(cfg.mscale) / cfg.cell0, 1.0)
    lvl = jnp.ceil(jnp.log2(ratio) - 1e-6).astype(jnp.int32)
    pop = jnp.asarray(cfg.populated, jnp.int32)
    lvl_pos = jnp.clip(jnp.sum(lvl[:, None] > pop[None, :], axis=1), 0, NL - 1)

    sel = lambda arr, t=jnp.int32: sum(  # noqa: E731  tiny static select
        jnp.where(lvl_pos == p, t(arr[p]), t(0)) for p in range(NL))
    cell_s = sel([cfg.cell(l) for l in cfg.populated], jnp.float32)
    npx_s = sel([cfg.patch_dims(l)[1] for l in cfg.populated])
    npy_s = sel([cfg.patch_dims(l)[0] for l in cfg.populated])
    poff_s = sel([poffs[l] for l in cfg.populated])
    hml = bins.h_max_lvl[lvl_pos]  # (C,) per-level h max (tiny gather)

    psz = cell_s * PS  # patch side in world units
    fx = (x - ox) / cell_s
    fy = (y - oy) / cell_s
    cx = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, npx_s * PS - 1)
    cy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, npy_s * PS - 1)
    px = cx // PS
    py = cy // PS
    pid = poff_s + py * npx_s + px
    rad = 0.5 * jnp.float32(cfg.mscale) * (h + hml)

    # per-row (occupied patch) metadata from slot 0 (always real)
    rows = jnp.arange(NB, dtype=jnp.int32)
    row0 = lambda a: a.reshape(NB, PATCH_SLOTS)[:, 0]  # noqa: E731
    row_occ = row0(real)
    pid_row = jnp.where(row_occ, row0(pid), TOTP)
    px_row, py_row = row0(px), row0(py)
    npx_row, npy_row = row0(npx_s), row0(npy_s)
    po = jnp.full((TOTP + 1,), NB, jnp.int32).at[pid_row].set(rows, mode="drop")

    halo_src = jnp.full((C,), C, jnp.int32)
    halo_overflow = jnp.int32(0)
    o_dest, cnt_d, member_d = [], [], []
    for dy, dx in _DIRS:
        m = real
        # prefilter: edge cell toward the neighbor...
        if dx < 0:
            m = m & (cx % PS == 0)
        elif dx > 0:
            m = m & (cx % PS == PS - 1)
        if dy < 0:
            m = m & (cy % PS == 0)
        elif dy > 0:
            m = m & (cy % PS == PS - 1)
        # ...AND within rad of the neighbor patch's rectangle (exact superset:
        # the axis gap to the dest rect lower-bounds any pair distance into it)
        gapx = jnp.float32(0.0) if dx == 0 else (
            ((px + 1) * PS).astype(jnp.float32) - fx if dx > 0
            else fx - (px * PS).astype(jnp.float32))
        gapy = jnp.float32(0.0) if dy == 0 else (
            ((py + 1) * PS).astype(jnp.float32) - fy if dy > 0
            else fy - (py * PS).astype(jnp.float32))
        gap2 = (gapx * gapx + gapy * gapy) * cell_s * cell_s
        m = m & (gap2 < rad * rad)
        vr = row_occ & (py_row + dy >= 0) & (py_row + dy < npy_row) \
            & (px_row + dx >= 0) & (px_row + dx < npx_row)
        od = jnp.where(vr, po[jnp.clip(pid_row + dy * npx_row + dx, 0, TOTP)],
                       NB)
        o_dest.append(od)
        cnt_d.append(jnp.sum(m.reshape(NB, PATCH_SLOTS).astype(jnp.int32),
                             axis=1))
        member_d.append(m)
    o_dest = jnp.stack(o_dest, axis=1)   # (NB, 8) dest row per direction
    cnt = jnp.stack(cnt_d, axis=1)       # (NB, 8) members leaving per dir

    # arriving[dest, d] = cnt[src_row(dest, d), d]: exactly one source row per
    # (dest, direction), so a plain scatter builds it
    arriving = jnp.zeros((NB + 1, 8), jnp.int32)
    dcol = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[None, :], (NB, 8))
    arriving = arriving.at[
        jnp.where(o_dest < NB, o_dest, NB), dcol
    ].set(jnp.where(o_dest < NB, cnt, 0))
    base = jnp.cumsum(arriving, axis=1) - arriving  # exclusive over directions
    base_at_src = base[jnp.where(o_dest < NB, o_dest, NB), dcol]  # (NB, 8)

    for di in range(8):
        mr = member_d[di].reshape(NB, PATCH_SLOTS).astype(jnp.int32)
        rank = (jnp.cumsum(mr, axis=1) - mr).reshape(C)
        off = jnp.repeat(base_at_src[:, di], PATCH_SLOTS) + rank
        odp = jnp.repeat(o_dest[:, di], PATCH_SLOTS)
        valid = member_d[di] & (odp < NB) & (off < PATCH_SLOTS)
        halo_overflow = halo_overflow + jnp.sum(
            member_d[di] & (odp < NB) & (off >= PATCH_SLOTS)).astype(jnp.int32)
        hs = odp * PATCH_SLOTS + off
        halo_src = halo_src.at[jnp.where(valid, hs, C)].set(iota, mode="drop")
    return halo_src, halo_overflow


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


RL = 16  # candidate-range descriptors per (tile, populated level)
WM_STRIDE = 1 + 2 * RL  # per-(tile, level) wm entry: [count, a0, b0, a1, b1, ...]
GW = 8  # hull-group width (lanes): tiles span multiple cell rows in the packed
        # layout; 8-lane groups keep each hull ~1 row so ranges stay tight


def window_ranges(cfg: TileConfig, bins: TileBins, statics_sorted, origin=None,
                  tq=None, cross_only=False):
    """Per-tile flat candidate-range descriptors (kernel scalar prefetch).

    Returns (wm, collapsed):
      wm: int32 (NT * NL * WM_STRIDE,). Per (tile t, populated-level position
          p), wm[(t*NL+p)*WM_STRIDE:] = [count, a0, b0, a1, b1, ...]: `count`
          CELL-INDEX pairs (a, b); the walk kernels read the contiguous slot
          range as [starts[a], starts[b)) — one flat range loop, no per-row
          geometry or level metadata in the kernel at all.
      collapsed: int32 scalar — (tile, level) entries whose candidate row count
          exceeded RL and were collapsed into ONE spanning pair
          (first row's window start .. last row's window end). The span walks
          the full rows in between (masked, correct), so it is a diagnostic,
          not a correctness event.

    In the packed layout a tile's queries may span several cell rows, so the
    tile is split into 8-lane GROUPS (consecutive slots — almost always within
    one cell row): each group gets a hull rect [cylo..cyhi] x [cxlo..cxhi] at
    every candidate level, and candidate row y's range is the x-hull of the
    groups whose rect reaches y — an exact superset of the pair set, disjoint
    across rows. Rows no group reaches emit an empty range (a == b). All pure
    XLA arithmetic: no gathers, sorts, or scatters (a Morton/segment-merge
    variant measured 2.9 ms/step in XLA-side gathers on v5e; rejected).

    origin: optional traced (2,) override of cfg.origin (sharded slabs).
    tq: query-group width override (default cfg.tq). The half-unit builder
    passes cfg.tq // 2: ranges per 64-query half are tighter than per full
    tile (the hull slop is ~group_span + 2*support, so halving the group
    width cuts the walked-but-invalid area by roughly a third).

    PATCH MODE (cfg.patch > 0): ranges are emitted at PATCH-ROW granularity —
    candidate patch row py's range spans whole patches [pxlo..pxhi], whose
    P*P cell blocks are contiguous ids — because in patch-major numbering a
    geometric cell row is not contiguous. Padding slots inside ranges are
    masked by the kernels' h > 0 gate. cross_only additionally zeroes each
    tile's OWN-level entry (tiles are level-pure patches): the clique operator
    (ops/cliques.py) owns the same-level pairs, the walk only the cross-level
    remainder.
    """
    TQ = int(tq) if tq else cfg.tq
    NT = cfg.capacity // TQ
    NL = len(cfg.populated)
    gw = min(GW, TQ)
    GK = TQ // gw  # hull groups per tile
    x = statics_sorted[:, 0].reshape(NT, GK, gw)
    y = statics_sorted[:, 1].reshape(NT, GK, gw)
    h = statics_sorted[:, 2].reshape(NT, GK, gw)
    valid = h > 0.0
    big = jnp.float32(1e30)
    xmin = jnp.min(jnp.where(valid, x, big), axis=2)  # (NT, GK)
    xmax = jnp.max(jnp.where(valid, x, -big), axis=2)
    ymin = jnp.min(jnp.where(valid, y, big), axis=2)
    ymax = jnp.max(jnp.where(valid, y, -big), axis=2)
    hmax_g = jnp.max(jnp.where(valid, h, 0.0), axis=2)
    alive_g = hmax_g > 0.0

    if origin is None:
        ox, oy = cfg.origin
    else:
        ox, oy = origin[0], origin[1]
    _, total_cells = cfg.cell_offsets
    kk = jnp.arange(RL, dtype=jnp.int32)
    ibig = jnp.int32(2**30)
    collapsed = jnp.int32(0)
    metas = []
    if cross_only:
        # per-tile own level POSITION (tiles are level-pure patches): same
        # ladder snap as build_tiles, from the tile's h maximum
        assert cfg.patch and TQ == cfg.tq
        hmax_t = jnp.max(hmax_g, axis=1)  # (NT,)
        ratio_t = jnp.maximum(hmax_t * jnp.float32(cfg.mscale) / cfg.cell0, 1.0)
        lvl_t = jnp.ceil(jnp.log2(ratio_t) - 1e-6).astype(jnp.int32)
        pop = jnp.asarray(cfg.populated, jnp.int32)
        own_pos = jnp.sum(lvl_t[:, None] > pop[None, :], axis=1)
        own_pos = jnp.clip(own_pos, 0, len(cfg.populated) - 1)
    for p, l in enumerate(cfg.populated):
        if cfg.patch:
            # patch-row granularity: "rows" are patch rows, "x units" patches,
            # each spanning P*P contiguous cell ids
            ny, nx = cfg.patch_dims(l)
            unit = cfg.patch * cfg.patch
            cellsz = jnp.float32(cfg.cell(l) * cfg.patch)
        else:
            ny, nx = cfg.dims(l)
            unit = 1
            cellsz = jnp.float32(cfg.cell(l))
        coff = jnp.int32(cfg.cell_offsets[0][l])
        rad = 0.5 * jnp.float32(cfg.mscale) * (hmax_g + bins.h_max_lvl[p])
        cylo = jnp.clip(jnp.floor((ymin - oy - rad) / cellsz).astype(jnp.int32), 0, ny - 1)
        cyhi = jnp.clip(jnp.floor((ymax - oy + rad) / cellsz).astype(jnp.int32), 0, ny - 1)
        cxlo = jnp.clip(jnp.floor((xmin - ox - rad) / cellsz).astype(jnp.int32), 0, nx - 1)
        cxhi = jnp.clip(jnp.floor((xmax - ox + rad) / cellsz).astype(jnp.int32), 0, nx - 1)
        ylo_t = jnp.min(jnp.where(alive_g, cylo, ibig), axis=1)  # (NT,)
        yhi_t = jnp.max(jnp.where(alive_g, cyhi, -1), axis=1)
        alive_t = jnp.any(alive_g, axis=1)
        if cross_only:
            alive_t = alive_t & (own_pos != p)
        nrows = jnp.where(alive_t, yhi_t - ylo_t + 1, 0)
        collapse = nrows > RL
        collapsed = collapsed + jnp.sum(collapse.astype(jnp.int32))
        cnt = jnp.where(collapse, 1, nrows)
        yk = ylo_t[:, None] + kk[None, :]  # (NT, RL)
        # groups whose rect reaches candidate row yk -> per-row x hull
        reach = (
            alive_g[:, None, :]
            & (cylo[:, None, :] <= yk[:, :, None])
            & (yk[:, :, None] <= cyhi[:, None, :])
        )  # (NT, RL, GK)
        xlo_k = jnp.min(jnp.where(reach, cxlo[:, None, :], ibig), axis=2)
        xhi_k = jnp.max(jnp.where(reach, cxhi[:, None, :], -1), axis=2)
        row_live = jnp.any(reach, axis=2)
        a = coff + (yk * nx + xlo_k) * unit
        b = coff + (yk * nx + xhi_k + 1) * unit
        a = jnp.where(row_live, a, total_cells)
        b = jnp.where(row_live, b, total_cells)
        # collapse: one spanning pair from the first row's window start to the
        # last row's window end (covers every per-row range in between)
        reach_lo = alive_g & (cylo <= ylo_t[:, None]) & (ylo_t[:, None] <= cyhi)
        reach_hi = alive_g & (cylo <= yhi_t[:, None]) & (yhi_t[:, None] <= cyhi)
        xlo_first = jnp.min(jnp.where(reach_lo, cxlo, ibig), axis=1)
        xhi_last = jnp.max(jnp.where(reach_hi, cxhi, -1), axis=1)
        a_span = coff + (ylo_t * nx + xlo_first) * unit
        b_span = coff + (yhi_t * nx + xhi_last + 1) * unit
        first = kk[None, :] == 0
        a = jnp.where(collapse[:, None] & first, a_span[:, None], a)
        b = jnp.where(collapse[:, None] & first, b_span[:, None], b)
        live = kk[None, :] < cnt[:, None]
        a = jnp.where(live, a, total_cells)
        b = jnp.where(live, b, total_cells)
        ent = jnp.concatenate(
            [cnt[:, None], jnp.stack([a, b], axis=2).reshape(NT, 2 * RL)], axis=1)
        metas.append(ent)  # (NT, WM_STRIDE)
    wm = jnp.stack(metas, axis=1).reshape(-1).astype(jnp.int32)
    return wm, collapsed


def window_meta(cfg: TileConfig, bins: TileBins, statics_sorted, origin=None,
                tq=None):
    """Back-compat wrapper: window_ranges without the collapsed diagnostic."""
    return window_ranges(cfg, bins, statics_sorted, origin=origin, tq=tq)[0]
