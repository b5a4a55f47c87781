"""Validate the sorted-tile engine: builder + density sweep vs brute force.

Run with JAX_PLATFORMS=cpu PYTHONPATH= for interpret-mode parity; run on the TPU
(default env) for timing at bench-scene scale.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_sph_tpu.ops import kernels
from adaptive_sph_tpu.ops.grid import make_grid_config
from adaptive_sph_tpu.ops.pallas_sweeps import SweepOp, run_sweep, sweep_bruteforce
from adaptive_sph_tpu.ops.tiles import TILE, TileConfig, build_tiles, sort_fields, unsort

DENSITY = SweepOp(
    name="density",
    n_out=1,
    emit=lambda q, c, ctx: [c["mass"] * ctx.w],
)


def make_scene(n_fine, n_coarse, C, seed=0, dense=False):
    rng = np.random.default_rng(seed)
    if dense:
        # grid-packed like the ratio stress test (spacing 0.008 / 0.4)
        nside = int(np.ceil(np.sqrt(n_fine)))
        ii = np.arange(n_fine)
        pos_f = np.stack([-0.95 + (ii % nside) * 0.008,
                          -0.95 + (ii // nside) * 0.008], -1).astype(np.float32)
        jj = np.arange(n_coarse)
        pos_c = np.stack([0.4 + (jj % 2) * 0.4, -0.5 + (jj // 2) * 0.4], -1).astype(np.float32)
    else:
        pos_f = rng.uniform(-0.95, -0.2, (n_fine, 2)).astype(np.float32)
        pos_c = rng.uniform(0.2, 0.95, (n_coarse, 2)).astype(np.float32)
    pos = np.zeros((C, 2), np.float32)
    pos[:n_fine] = pos_f
    pos[n_fine:n_fine + n_coarse] = pos_c
    h = np.zeros(C, np.float32)
    h[:n_fine] = 0.00827
    h[n_fine:n_fine + n_coarse] = 0.4135
    mass = np.zeros(C, np.float32)
    mass[:n_fine] = 5.95e-5
    mass[n_fine:n_fine + n_coarse] = 0.1488
    alive = np.zeros(C, bool)
    alive[:n_fine + n_coarse] = True
    return jnp.asarray(pos), jnp.asarray(h), jnp.asarray(mass), jnp.asarray(alive)


def main():
    C = 2048
    pos, h, mass, alive = make_scene(900, 6, C)
    g = make_grid_config((-1, -1), (1, 1), 2.0, 0.00827, 0.4135, C)
    import dataclasses
    g = dataclasses.replace(g, populated=(0, g.levels - 1))
    cfg = TileConfig.from_grid(g, 2.0)
    print(f"cfg: levels={cfg.levels} pop={cfg.populated} nx0={cfg.nx0} "
          f"cells={cfg.cell_offsets[1]} rows={cfg.row_offsets[1]}")

    bins = build_tiles(pos, h * 2.0, h, alive, cfg)
    print(f"n_padded={int(bins.n_padded)} overflow={int(bins.overflow)} "
          f"lvl_overflow={int(bins.level_overflow)} hmax={np.asarray(bins.h_max_lvl)[:2]}")

    st = sort_fields(bins, [pos, h, mass])  # (C, 4): x y h mass
    out = run_sweep(cfg, bins, st, None, DENSITY, 2.0)
    ref = sweep_bruteforce(cfg, st, None, DENSITY, 2.0)
    got = np.asarray(out[:, 0])
    want = np.asarray(ref[:, 0])
    mask = np.asarray(st[:, 2]) > 0
    err = np.max(np.abs(got[mask] - want[mask]) / (np.abs(want[mask]) + 1e-12))
    print(f"density parity (sweep vs brute): max rel err {err:.3e} on {mask.sum()} slots")

    # also against the original-order brute force to sanity check sort/unsort
    flat = unsort(bins, out[:, 0], None)
    hb = jnp.where(alive, h, 0)
    dxb = pos[:, None, :] - pos[None, :, :]
    r2b = jnp.sum(dxb * dxb, -1)
    hijb = jnp.maximum(0.5 * (hb[:, None] + hb[None, :]), 1e-6)
    vb = (r2b < (2.0 * hijb) ** 2) & alive[None, :] & alive[:, None]
    wb = kernels.kernel_w(jnp.sqrt(jnp.maximum(r2b, 1e-30)), hijb, 2)
    rhob = jnp.sum(jnp.where(vb, mass[None, :] * wb, 0.0), axis=1)
    err2 = np.max(
        np.abs(np.asarray(flat - rhob))[np.asarray(alive)]
        / (np.abs(np.asarray(rhob))[np.asarray(alive)] + 1e-12)
    )
    print(f"density parity (unsorted vs O(C^2) original order): {err2:.3e}")

    if jax.default_backend() == "tpu":
        # bench-scale timing
        C2 = 24576
        pos2, h2, mass2, alive2 = make_scene(11827, 8, C2, seed=1, dense=True)
        g2 = make_grid_config((-1, -1), (1, 1), 2.0, 0.00827, 0.4135, C2)
        g2 = dataclasses.replace(g2, populated=(0, g2.levels - 1))
        import os
        cfg2 = TileConfig.from_grid(g2, 2.0, tq=int(os.environ.get("TQ", "32")))
        bt = jax.jit(lambda p, hh, a: build_tiles(p, hh * 2.0, hh, a, cfg2))
        bins2 = jax.block_until_ready(bt(pos2, h2, alive2))
        st2 = sort_fields(bins2, [pos2, h2, mass2])

        from scripts.proto_build_prof import timeit

        def sweep_fn(s):
            o = run_sweep(cfg2, bins2, s, None, DENSITY, 2.0)
            return s + jnp.mean(o) * 1e-9

        def build_fn(p):
            b = build_tiles(p, h2 * 2.0, h2, alive2, cfg2)
            return p + (b.n_padded % 2).astype(jnp.float32) * 1e-9

        print(f"sweep at C=24576 (n=11835): {timeit(sweep_fn, st2, reps=64):.3f} ms")
        print(f"build at C=24576 (n=11835): {timeit(build_fn, pos2, reps=64):.3f} ms")


if __name__ == "__main__":
    main()
