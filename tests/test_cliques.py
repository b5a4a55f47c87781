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
    PATCH_SLOTS, TileConfig, build_halo, build_tiles, sort_fields,
    window_ranges,
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

    halo_j, halo_ovf = jax.jit(lambda s: build_halo(cfg, bins, s))(
        jnp.asarray(st))
    assert int(halo_ovf) == 0, "halo ring fuller than PATCH_SLOTS"

    # level of each real slot (same ladder as build_tiles)
    sr = np.where(alive, h, 0) * cfg.mscale
    lev = np.ceil(np.log2(np.maximum(sr / cfg.cell0, 1.0)) - 1e-6).astype(int)
    pops = np.asarray(cfg.populated)
    lev = pops[np.minimum(np.searchsorted(pops, lev, "left"), len(pops) - 1)]

    halo = np.asarray(halo_j)
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


def _sorted_setup(seed, n, C, two, scale=2.0, patch=4):
    pos, h, mass, alive = _scene(seed, n, C, two)
    cfg = _cfg(pos, h, alive, C, scale, patch)
    hj = jnp.asarray(np.where(alive, h, 0))
    bins = jax.jit(lambda p, hh, a: build_tiles(
        p, hh * jnp.float32(cfg.mscale), hh, a, cfg))(
        jnp.asarray(pos), hj, jnp.asarray(alive))
    assert int(bins.overflow) == 0
    st = jax.jit(lambda: sort_fields(bins, [
        jnp.asarray(pos), hj, jnp.asarray(mass)]))()
    halo_src, halo_ovf = jax.jit(lambda s: build_halo(cfg, bins, s))(st)
    assert int(halo_ovf) == 0
    return cfg, bins, st, halo_src


def test_clique_build_matches_bruteforce_sums():
    from adaptive_sph_tpu.ops import cliques
    from adaptive_sph_tpu.ops.pallas_sweeps import SweepOp, sweep_bruteforce

    scale = 2.0
    cfg, bins, st, halo_src = _sorted_setup(3, 900, 4096, two=False)
    wx, wy, s1x, s1y, s1sq, den = jax.jit(
        lambda: cliques.clique_build(cfg, halo_src, st, scale, jnp.float32))()

    def emit(q, c, ctx):
        gx, gy = ctx.gx, ctx.gy
        m = c["mass"]
        return [m * ctx.w, m * gx, m * gy,
                (m * gx) ** 2 / jnp.maximum(m, 1e-30)
                + (m * gy) ** 2 / jnp.maximum(m, 1e-30)]

    ref = np.asarray(sweep_bruteforce(
        cfg, st, None, SweepOp(name="ref", n_out=4, emit=emit), scale))
    np.testing.assert_allclose(np.asarray(den), ref[:, 0], rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1x), ref[:, 1], rtol=2e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s1y), ref[:, 2], rtol=2e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s1sq), ref[:, 3], rtol=2e-4, atol=1e-1)


def test_clique_matvec_matches_bruteforce_two_level():
    from adaptive_sph_tpu.ops import cliques
    from adaptive_sph_tpu.ops.pallas_matvec import build_weight_cache_prep
    from adaptive_sph_tpu.ops.pallas_sweeps import SweepOp, sweep_bruteforce

    scale = 2.0
    cfg, bins, st, halo_src = _sorted_setup(4, 900, 4096, two=True)
    C = cfg.capacity
    wx, wy, s1x, s1y, s1sq, den = jax.jit(
        lambda: cliques.clique_build(cfg, halo_src, st, scale, jnp.float32))()

    # cross-level blocks via the streamed builder on cross_only ranges
    wm_cross, _ = jax.jit(
        lambda s: window_ranges(cfg, bins, s, cross_only=True))(st)
    vel = jnp.zeros((C, 2), jnp.float32)
    wc, meta, cnt, prep = jax.jit(lambda: build_weight_cache_prep(
        cfg, bins, st, vel, scale, cfg.b_max, "none", 0.0, wmeta=wm_cross,
        wdtype=jnp.float32, want_s2=False, fuse_density=True, scalar=False))()
    assert int(cnt[1]) == 0
    wxc, wyc, src, dst, xovf = jax.jit(
        lambda: cliques.cross_pack(wc, meta, cnt, cfg.tq, 64))()
    assert int(xovf) == 0
    op = cliques.CliqueOperator(wx=wx, wy=wy, halo_src=halo_src, wxc=wxc,
                                wyc=wyc, src=src, dst=dst)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    tx = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    ty = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    mvx, mvy = jax.jit(op.matvec2)(u)
    s = jax.jit(op.matvec_div)(tx, ty)

    def emit_mv(q, c, ctx):
        m = c["mass"]
        return [m * ctx.gx * c["u"], m * ctx.gy * c["u"],
                m * (ctx.gx * c["tx"] + ctx.gy * c["ty"])]

    ref = np.asarray(sweep_bruteforce(
        cfg, st, jnp.stack([u, tx, ty], axis=1),
        SweepOp(name="mv", n_out=3, dyn_names=("u", "tx", "ty"), emit=emit_mv),
        scale))
    # full sums = clique (same-level) + cross blocks; prep row 0/1 check too
    np.testing.assert_allclose(np.asarray(mvx), ref[:, 0], rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(mvy), ref[:, 1], rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(s), ref[:, 2], rtol=2e-4, atol=2e-2)

    # prep sums: clique + cross builder rows must equal brute force
    def emit_p(q, c, ctx):
        m = c["mass"]
        return [m * ctx.gx, m * ctx.gy, m * ctx.w]

    refp = np.asarray(sweep_bruteforce(
        cfg, st, None, SweepOp(name="p", n_out=3, emit=emit_p), scale))
    NT = C // cfg.tq
    prep = np.asarray(prep)
    tot_x = np.asarray(s1x) + prep[:, 0, :].reshape(C)
    tot_y = np.asarray(s1y) + prep[:, 1, :].reshape(C)
    tot_d = np.asarray(den) + prep[:, 3, :].reshape(C)
    np.testing.assert_allclose(tot_x, refp[:, 0], rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(tot_y, refp[:, 1], rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(tot_d, refp[:, 2], rtol=2e-5, atol=1e-3)


def test_clique_visc_matches_bruteforce():
    from adaptive_sph_tpu.models import tile_physics as tp
    from adaptive_sph_tpu.ops import cliques
    from adaptive_sph_tpu.ops.pallas_sweeps import sweep_bruteforce
    from adaptive_sph_tpu.utils.params import SimulationParams, ViscosityType

    scale = 2.0
    cfg, bins, st, halo_src = _sorted_setup(5, 900, 4096, two=False)
    C = cfg.capacity
    rng = np.random.default_rng(1)
    vx = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    vy = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    rho = jnp.asarray((1000.0 + 30 * rng.standard_normal(C)).astype(np.float32))
    for vt, mode in ((ViscosityType.WCSPH, "wcsph"),
                     (ViscosityType.ApproxLaplace, "laplace")):
        params = SimulationParams(viscosity_type=vt, viscosity=0.02)
        ax, ay = jax.jit(lambda m=mode: cliques.clique_visc(
            cfg, halo_src, st, vx, vy, rho, scale, m, 0.02))()
        ref = np.asarray(sweep_bruteforce(
            cfg, st, jnp.stack([rho, vx, vy], axis=1), tp.visc_op(params),
            scale))
        np.testing.assert_allclose(np.asarray(ax), ref[:, 0], rtol=2e-4,
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(ay), ref[:, 1], rtol=2e-4,
                                   atol=2e-3)


def test_full_step_clique_vs_legacy_tiles(monkeypatch):
    """Full tile-backend steps with the clique operator vs the legacy walk:
    same physics to f32 association tolerance (stress-like two-level scene,
    adaptivity off — the bench configuration's structure)."""
    from scipy.spatial import cKDTree

    from adaptive_sph_tpu.models import scene as scene_mod
    from adaptive_sph_tpu.runner import create_simulation
    from adaptive_sph_tpu.utils.params import (
        InitBoundaryHandlerType, ParticleSizes, PressureSolverMethod,
        SimulationParams,
    )

    scene = scene_mod.scene_from_dict({
        "boundary": {"type": "box", "width": 2, "height": 2},
        "blocks": [
            {"pos": [0.2, -0.5], "size": [0.6, 1.0], "spacing": 0.03,
             "volume_fill_ratio": 0.93, "velocity": [0, 0]},
            {"pos": [-0.95, -0.5], "size": [0.6, 1.0], "spacing": 0.12,
             "volume_fill_ratio": 0.93, "velocity": [0, 0]},
        ],
    })
    params = SimulationParams(
        particle_sizes=ParticleSizes.Adaptive,
        pressure_solver_method=PressureSolverMethod.HybridDFSPH,
        init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
        merging=False, sharing=False, splitting=False, max_iters=60,
    )
    states = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("ASPH_CLIQUE", mode)
        sim = create_simulation(params, scene, capacity=4096, backend="tiles")
        if mode == "1":
            assert sim.tile_cfg.patch > 0, "clique mode must engage here"
        else:
            assert sim.tile_cfg.patch == 0
        for _ in range(3):
            d = sim.step()
            assert int(d.get("clique_overflow", 0)) == 0
        states[mode] = sim.state
    a, b = states["1"], states["0"]
    assert int(a.n) == int(b.n)
    pa = np.asarray(a.position)[np.asarray(a.alive)]
    pb = np.asarray(b.position)[np.asarray(b.alive)]
    d, j = cKDTree(pb).query(pa, k=1)
    assert (np.sort(j) == np.arange(len(pb))).all()
    np.testing.assert_allclose(pa, pb[j], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a.density)[np.asarray(a.alive)],
        np.asarray(b.density)[np.asarray(b.alive)][j], rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a.velocity)[np.asarray(a.alive)],
        np.asarray(b.velocity)[np.asarray(b.alive)][j], atol=2e-4)
