"""TPU-native neighbor search: multi-level sorted cell grids + fixed-K forward lists.

Replaces the reference's uniform grid (neighborhood_search.rs:243-321) and R*-tree
(neighborhood_search.rs:72-240) with the TPU-canonical scheme: particles are binned into
per-level cell grids (cell size doubling per level, level chosen so a particle's search
radius fits one cell), cell ids are sorted once per level, and each query gathers fixed
windows from the 3x3 surrounding cells.

Semantics reproduced exactly: a pair (i, j) interacts iff
    |x_ij| < radius_scale * h_ij,   h_ij = (h_i + h_j) / 2
(neighborhood_search.rs:138-147 + the sequential symmetrization pass :157-185).

Key structural difference from a naive port: the (C, K) matrix stores only *forward*
edges — for each i, the neighbors j with level(j) >= level(i) (same-level pairs appear
in both rows; strictly-larger neighbors appear only in the smaller particle's row).
This bounds K even at 50:1 size ratios (a huge particle can have tens of thousands of
smaller neighbors — reference MAX_NEIGHBOR_COUNT is 20000! — but only a handful of
*larger* ones). The large side of each cross-level pair is recovered by a scatter:
the builder precomputes a sorted edge permutation so every pair sweep can add the
reversed contributions with one fast sorted segment-sum (ops/pairwise.py).

Everything is static-shape: capacity C, row width K, levels L, and per-cell window MPC
are compile-time constants; overflow is *detected* (counts returned) rather than panicking
like the reference's MAX_NEIGHBOR_COUNT guard.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

INT_MAX = jnp.iinfo(jnp.int32).max


@dataclasses.dataclass(frozen=True)
class NeighborConfig:
    """Static neighbor-search configuration (part of the jit cache key)."""

    capacity: int  # C: fixed particle capacity
    row_width: int  # K: max forward neighbors per particle
    levels: int  # L: number of size levels (1 for uniform sizes)
    max_per_cell: int = 32  # MPC: max particles binned per cell per level


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Neighborhood:
    """Fixed-shape neighbor structure for one step.

    idx[i, k]   : forward neighbor index (level >= level(i)); self-index when masked out
    mask[i, k]  : slot validity
    cross[i, k] : edge whose reverse direction must be scattered to idx[i, k]
                  (strictly larger neighbor; same-level pairs live in both rows)
    bwd_perm    : permutation of flattened (C*K) edges sorting cross-edges by target
    bwd_seg     : target row of each permuted edge (C for dropped/non-cross slots)
    count       : true symmetric neighbor count per particle (incl. self)
    cell_overflow / row_overflow / level_overflow: diagnostics (int32 scalars)
    """

    idx: jnp.ndarray
    mask: jnp.ndarray
    cross: jnp.ndarray
    bwd_perm: jnp.ndarray
    bwd_seg: jnp.ndarray
    count: jnp.ndarray
    cell_overflow: jnp.ndarray
    row_overflow: jnp.ndarray
    level_overflow: jnp.ndarray

    def tree_flatten(self):
        fields = (
            self.idx,
            self.mask,
            self.cross,
            self.bwd_perm,
            self.bwd_seg,
            self.count,
            self.cell_overflow,
            self.row_overflow,
            self.level_overflow,
        )
        return fields, None

    @classmethod
    def tree_unflatten(cls, aux, fields):
        return cls(*fields)

    @property
    def capacity(self):
        return self.idx.shape[0]


def _compute_levels(sr, alive, num_levels):
    """Assign each particle the smallest level whose cell covers its search radius."""
    big = jnp.float32(3.4e38)
    sr_alive = jnp.where(alive, sr, big)
    c_min = jnp.min(sr_alive)
    # all-dead guard: fall back to 1.0 so downstream math stays finite
    c_min = jnp.where(c_min >= big, jnp.float32(1.0), c_min)
    ratio = jnp.maximum(sr / c_min, 1.0)
    level = jnp.ceil(jnp.log2(ratio) - 1e-6).astype(jnp.int32)
    level_overflow = jnp.any(alive & (level > num_levels - 1)).astype(jnp.int32)
    level = jnp.clip(level, 0, num_levels - 1)
    return level, c_min, level_overflow


def _finalize(idx, mask, level, row_overflow, cell_overflow, level_overflow):
    C, K = idx.shape
    nlevel = jnp.where(mask, level[idx], -1)
    cross = mask & (nlevel > level[:, None])

    flat_cross = cross.reshape(-1)
    flat_target = jnp.where(flat_cross, idx.reshape(-1), C)
    bwd_perm = jnp.argsort(flat_target)
    bwd_seg = flat_target[bwd_perm]

    count_fwd = jnp.sum(mask, axis=1).astype(jnp.int32)
    ones = jnp.where(bwd_seg < C, 1, 0)
    count_bwd = jax.ops.segment_sum(ones, bwd_seg, num_segments=C + 1, indices_are_sorted=True)[
        :C
    ].astype(jnp.int32)
    count = count_fwd + count_bwd

    return Neighborhood(
        idx=idx,
        mask=mask,
        cross=cross,
        bwd_perm=bwd_perm,
        bwd_seg=bwd_seg,
        count=count,
        cell_overflow=cell_overflow,
        row_overflow=row_overflow,
        level_overflow=level_overflow,
    )


@partial(jax.jit, static_argnames=("cfg",))
def build_neighborhood(position, h, alive, radius_scale, cfg: NeighborConfig) -> Neighborhood:
    """Build the forward neighbor structure.

    position: (C, D) f32; h: (C,) smoothing lengths; alive: (C,) bool;
    radius_scale: traced f32 — 2.0 for the physics radius (support = 2*h_ij), or
    level_estimation_range / ETA for the extended pre-advection search
    (simulation.rs:2024-2030).
    """
    C, D = position.shape
    assert C == cfg.capacity
    K, L, MPC = cfg.row_width, cfg.levels, cfg.max_per_cell

    sr = h * radius_scale
    level, c_min, level_overflow = _compute_levels(sr, alive, L)
    level = jnp.where(alive, level, L)  # dead particles outside every level

    inf = jnp.float32(3.4e38)
    pos_alive = jnp.where(alive[:, None], position, inf)
    dom_min = jnp.min(pos_alive, axis=0)
    dom_min = jnp.where(jnp.isfinite(dom_min) & (dom_min < 1e37), dom_min, 0.0)
    pos_alive_max = jnp.where(alive[:, None], position, -inf)
    dom_max = jnp.max(pos_alive_max, axis=0)
    dom_max = jnp.where(dom_max > -1e37, dom_max, 0.0)

    self_idx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None], (C, K))
    out_idx = self_idx
    out_mask = jnp.zeros((C, K), dtype=bool)
    row_overflow = jnp.int32(0)
    cell_overflow = jnp.int32(0)

    assert D == 2, "3D shares the same seams as the reference (Sdf3D/lambda3 todo)"

    # 3x3 window offsets vectorized as one axis (keeps the HLO small: one
    # searchsorted/gather block per level instead of nine)
    off = jnp.asarray(
        [(ox, oy) for oy in (-1, 0, 1) for ox in (-1, 0, 1)], dtype=jnp.int32
    )  # (9, 2)
    arange_mpc = jnp.arange(MPC, dtype=jnp.int32)

    for l in range(L):
        cell = c_min * jnp.float32(2.0**l)
        # shift by one cell so every alive coordinate is >= 1 and the 3x3 window
        # stays in [0, width) x [0, height) -> row-major ids are collision-free
        ci = jnp.floor((position - dom_min[None, :]) / cell).astype(jnp.int32) + 1
        width = jnp.floor((dom_max[0] - dom_min[0]) / cell).astype(jnp.int32) + 4

        present = alive & (level == l)
        cid = ci[:, 0] + ci[:, 1] * width
        sort_key = jnp.where(present, cid, INT_MAX)
        order = jnp.argsort(sort_key).astype(jnp.int32)
        sorted_ids = sort_key[order]

        query = alive & (level <= l)

        ncid = (ci[:, 0:1] + off[None, :, 0]) + (ci[:, 1:2] + off[None, :, 1]) * width  # (C, 9)
        start = jnp.searchsorted(sorted_ids, ncid.reshape(-1), side="left").astype(jnp.int32)
        start = start.reshape(C, 9)
        window = start[:, :, None] + arange_mpc[None, None, :]  # (C, 9, MPC)
        window_c = jnp.minimum(window, C - 1)
        cand_ids = sorted_ids[window_c]
        cand_idx = order[window_c]
        valid = (cand_ids == ncid[:, :, None]) & query[:, None, None] & (window < C)

        # cell overflow: an MPC+1-th member exists in some cell
        over_pos = jnp.minimum(start + MPC, C - 1)
        over = query[:, None] & (start + MPC < C) & (sorted_ids[over_pos] == ncid)
        cell_overflow = jnp.maximum(cell_overflow, jnp.any(over).astype(jnp.int32))

        cand_idx_l = cand_idx.reshape(C, 9 * MPC)
        valid = valid.reshape(C, 9 * MPC)

        # exact interaction test: |x_ij| < radius_scale * (h_i + h_j)/2
        xj = position[cand_idx_l]
        hj = h[cand_idx_l]
        diff = position[:, None, :] - xj
        r2 = jnp.sum(diff * diff, axis=-1)
        s_ij = radius_scale * 0.5 * (h[:, None] + hj)
        cand_valid_l = valid & (r2 < s_ij * s_ij)

        # merge this level's candidates into the running top-K rows (stable compaction)
        all_idx = jnp.concatenate([out_idx, cand_idx_l], axis=1)
        all_valid = jnp.concatenate([out_mask, cand_valid_l], axis=1)
        ncols = all_idx.shape[1]
        key = jnp.where(all_valid, 0, ncols) + jnp.arange(ncols, dtype=jnp.int32)[None, :]
        take = jnp.argsort(key, axis=1)[:, :K]
        out_idx = jnp.take_along_axis(all_idx, take, axis=1)
        out_mask = jnp.take_along_axis(all_valid, take, axis=1)

        nvalid = jnp.sum(all_valid, axis=1)
        row_overflow = jnp.maximum(row_overflow, jnp.max(nvalid - K).astype(jnp.int32))

    out_idx = jnp.where(out_mask, out_idx, self_idx)
    return _finalize(out_idx, out_mask, level, jnp.maximum(row_overflow, 0), cell_overflow, level_overflow)


@partial(jax.jit, static_argnames=("num_levels",))
def filter_down(nb: Neighborhood, position, h, alive, radius_scale, num_levels: int) -> Neighborhood:
    """Re-filter an existing neighborhood to a smaller radius without re-binning.

    Mirrors NeighborhoodCache::filter_down (neighborhood_search.rs:56-70): keep the
    slot layout, shrink the validity mask to |x_ij| < radius_scale * h_ij, and rebuild
    the backward scatter structures.
    """
    sr = h * radius_scale
    level, _, level_overflow = _compute_levels(sr, alive, num_levels)
    level = jnp.where(alive, level, num_levels)

    xj = position[nb.idx]
    diff = position[:, None, :] - xj
    r2 = jnp.sum(diff * diff, axis=-1)
    s_ij = radius_scale * 0.5 * (h[:, None] + h[nb.idx])
    mask = nb.mask & (r2 < s_ij * s_ij)
    idx = jnp.where(mask, nb.idx, jnp.arange(nb.capacity, dtype=jnp.int32)[:, None])
    return _finalize(idx, mask, level, nb.row_overflow, nb.cell_overflow, level_overflow)


def brute_force_counts(position, h, alive, radius_scale):
    """O(C^2) ground-truth symmetric neighbor counts (tests only).

    Mirrors check_correct_neighborhood (simulation.rs:1810-1863).
    """
    diff = position[:, None, :] - position[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    s_ij = radius_scale * 0.5 * (h[:, None] + h[None, :])
    inter = (r2 < s_ij * s_ij) & alive[:, None] & alive[None, :]
    return jnp.sum(inter, axis=1).astype(jnp.int32)
