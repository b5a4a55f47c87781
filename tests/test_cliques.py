"""Patch-clique layout + operator tests (ops/tiles.py patch mode, ops/cliques.py).

The patch-major layout must cover EXACTLY the same pair set as the legacy
packed layout: same-level pairs via [own patch | 1-cell-ring halo] cliques,
cross-level pairs via the window walk (cross_only ranges). Reference pair
semantics: |x_ij| < scale * (h_i + h_j) / 2 (neighborhood_search.rs:138-185).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptive_sph_tpu.ops.grid import make_grid_config
from adaptive_sph_tpu.ops.tiles import (
    PATCH_SLOTS, TileConfig, build_tiles, sort_fields, window_ranges,
)


def _scene(seed, n, C, two_levels=True):
    """Dense fluid-block-like scene: jittered grid at spacing ~1.05 h (the SPH
    rest spacing for h = 1.9 r), plus a few coarse particles when two_levels."""
    rng = np.random.default_rng(seed)
    hf = 0.02
    sp = 1.05 * hf
    side = int(np.ceil(np.sqrt(n)))
    gx, gy = np.meshgrid(np.arange(side), np.arange(side))
    pos = np.stack([gx.ravel(), gy.ravel()], axis=1)[:n] * sp - 0.85
    pos = pos + rng.uniform(-0.2 * sp, 0.2 * sp, size=pos.shape)
    pos = np.concatenate(
        [pos, rng.uniform(-0.9, 0.9, size=(C - n, 2))]).astype(np.float32)
    h = np.full(C, hf, np.float32)
    if two_levels:
        big = rng.random(n) < 0.03
        h[:n] = np.where(big, 0.11, hf)
    mass = (h * h * 1000.0 / 3.61).astype(np.float32)
    alive = np.zeros(C, bool)
    alive[:n] = True
    return pos, h, mass, alive


def _cfg(pos, h, alive, C, scale=2.0, patch=4):
    h_eff = np.where(alive, h, 0)
    gcfg = make_grid_config((-1.0, -1.0), (1.0, 1.0), scale,
                            float(h_eff[alive].min()), float(h_eff[alive].max()),
                            C, mpc=32)
    return TileConfig.from_grid(gcfg, scale, tq=PATCH_SLOTS, patch=patch)


def _brute_pairs(pos, h, alive, scale):
    dx = pos[:, None, 0] - pos[None, :, 0]
    dy = pos[:, None, 1] - pos[None, :, 1]
    r2 = dx * dx + dy * dy
    hij = 0.5 * (h[:, None] + h[None, :])
    ok = (r2 < (scale * hij) ** 2) & alive[:, None] & alive[None, :]
    return ok


@pytest.mark.parametrize("seed,n,C,two", [(0, 700, 4096, True),
                                          (1, 1000, 4096, False),
                                          (2, 1900, 8192, True)])
def test_patch_layout_pair_coverage(seed, n, C, two):
    scale = 2.0
    pos, h, mass, alive = _scene(seed, n, C, two)
    cfg = _cfg(pos, h, alive, C, scale)
    bins = jax.jit(lambda p, hh, a: build_tiles(
        p, hh * jnp.float32(cfg.mscale), hh, a, cfg), static_argnums=())(
        jnp.asarray(pos), jnp.asarray(np.where(alive, h, 0)), jnp.asarray(alive))
    assert int(bins.overflow) == 0, "patch fuller than PATCH_SLOTS"
    assert int(bins.halo_overflow) == 0, "halo ring fuller than PATCH_SLOTS"
    assert int(bins.level_overflow) == 0

    perm = np.asarray(bins.perm)
    pp = np.asarray(bins.pp)
    npatch = int(bins.n_patches)
    npad = int(bins.n_padded)
    assert npad == npatch * PATCH_SLOTS

    # perm/pp inverse on alive particles
    for i in np.flatnonzero(alive):
        assert perm[pp[i]] == i
    real = perm < C
    assert real.sum() == alive.sum()
    # real slots only inside the first n_patches patches
    assert not real[npad:].any()

    # CSR monotone and consistent with the padded layout
    starts = np.asarray(bins.cell_starts)
    assert (np.diff(starts) >= 0).all()

    # statics: padding slots read zeros (h == 0 masks them in every kernel)
    st = np.asarray(jax.jit(lambda: sort_fields(bins, [
        jnp.asarray(pos), jnp.asarray(np.where(alive, h, 0)), jnp.asarray(mass)
    ]))())
    assert (st[~real, 2] == 0).all()

    # level of each real slot (same ladder as build_tiles)
    sr = np.where(alive, h, 0) * cfg.mscale
    lev = np.ceil(np.log2(np.maximum(sr / cfg.cell0, 1.0)) - 1e-6).astype(int)
    pops = np.asarray(cfg.populated)
    lev = pops[np.minimum(np.searchsorted(pops, lev, "left"), len(pops) - 1)]

    halo = np.asarray(bins.halo_src)
    pairs = _brute_pairs(pos, np.where(alive, h, 0), alive, scale)

    # EXACT same-level coverage: for every interacting same-level pair (i, j),
    # j's slot must be in i's patch block or i's patch halo list
    slot = pp
    patch_of = slot // PATCH_SLOTS
    own = [set() for _ in range(C // PATCH_SLOTS + 1)]
    hal = [set() for _ in range(C // PATCH_SLOTS + 1)]
    for s in range(npad):
        if perm[s] < C:
            own[s // PATCH_SLOTS].add(s)
        if halo[s] < C:
            hal[s // PATCH_SLOTS].add(int(halo[s]))
    ii, jj = np.nonzero(pairs)
    missed = 0
    for i, j in zip(ii, jj):
        if lev[i] != lev[j]:
            continue
        b = patch_of[i]
        if slot[j] not in own[b] and slot[j] not in hal[b]:
            missed += 1
    assert missed == 0, f"{missed} same-level pairs not covered by cliques"

    # halo lists have no duplicates and never contain own-patch slots
    for b in range(npatch):
        lst = [halo[s] for s in range(b * PATCH_SLOTS, (b + 1) * PATCH_SLOTS)
               if halo[s] < C]
        assert len(lst) == len(set(lst))
        for s in lst:
            assert s // PATCH_SLOTS != b

    # cross-level pairs: covered by the cross_only window ranges
    wm, _ = jax.jit(lambda s: window_ranges(cfg, bins, s, cross_only=True))(
        jnp.asarray(st))
    wm = np.asarray(wm)
    from adaptive_sph_tpu.ops.tiles import WM_STRIDE
    NL = len(cfg.populated)
    NT = C // cfg.tq
    covered = np.zeros((NT, C), bool)
    for t in range(NT):
        for p in range(NL):
            mb = (t * NL + p) * WM_STRIDE
            for r in range(wm[mb]):
                lo = starts[wm[mb + 1 + 2 * r]]
                hi = starts[wm[mb + 2 + 2 * r]]
                covered[t, lo:hi] = True
    missed_x = 0
    for i, j in zip(ii, jj):
        if lev[i] == lev[j]:
            continue
        if not covered[slot[i] // cfg.tq, slot[j]]:
            missed_x += 1
    assert missed_x == 0, f"{missed_x} cross-level pairs not in cross ranges"
