"""Occupancy census of the weight-cache blocks: where do the streamed bytes go?

Recomputes, in numpy, the exact block set the fused builder emits (same window
walk as ops/pallas_matvec._build_prep_kernel) and reports, per populated
level-pair (query level x candidate level):

  blocks, valid pairs, validity %, query-lane span histogram, candidate-row
  (8-sublane granularity) usage

plus the projected stream bytes of candidate compaction schemes:

  full     — current (64 cand, 2*TQ lanes) blocks
  chalf    — trim candidate sublanes to used 8-rows (variable-height bricks)
  qhalf    — emit aligned 64-lane query half-blocks only where occupied
  qquart   — 32-lane quarter blocks
  both     — candidate trim x quarter blocks

`census()` is reusable (scripts/scenario_gates.py records its core fields per
gate entry as restructuring tripwires). Runs on CPU (no TPU needed):
python scripts/block_stats.py [replicas]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def census(position, h, mass, alive, tcfg, scale):
    """Numpy re-walk of the fused builder's window/block set.

    position/h/mass/alive: (C,)-shaped arrays (any order; the census sorts).
    Returns a dict with the core occupancy numbers plus detail tables the CLI
    pretty-prints. Pure host-side numpy after one build_tiles/sort/window pass.
    """
    import jax
    import jax.numpy as jnp

    from adaptive_sph_tpu.ops.tiles import (TILE, WM_STRIDE, build_tiles,
                                            sort_fields, window_ranges)
    from adaptive_sph_tpu.ops import kernels

    h = jnp.asarray(h)
    if not bool(jnp.any(h > 0)):
        h = jnp.asarray(
            kernels.smoothing_length_from_mass(mass, 1.0, 2))
    bins = jax.jit(lambda p: build_tiles(p, h * jnp.float32(tcfg.mscale), h,
                                         alive, tcfg))(position)
    stt = np.asarray(jax.jit(lambda: sort_fields(bins, [position, h, mass]))())
    wm_j, collapsed = jax.jit(lambda: window_ranges(tcfg, bins, stt))()
    wm = np.asarray(wm_j)
    starts = np.asarray(bins.cell_starts)
    TQ = tcfg.tq
    NT = tcfg.capacity // TQ
    NL = len(tcfg.populated)
    C = tcfg.capacity

    x, y, hh = stt[:, 0], stt[:, 1], stt[:, 2]
    # query level of each tile: recover from h via the level ladder like build_tiles
    qlev = np.full(NT, -1)
    for t in range(NT):
        hv = hh[t * TQ:(t + 1) * TQ]
        if (hv > 0).any():
            sr = float(hv[hv > 0].max()) * tcfg.mscale
            lev = int(np.ceil(np.log2(max(sr / tcfg.cell0, 1.0)) - 1e-6))
            qlev[t] = min(lev, max(tcfg.populated))

    from collections import defaultdict
    blocks = defaultdict(int)
    pairs = defaultdict(int)
    lane_spans = []   # per-block contiguous span of occupied query lanes
    qhalves = 0       # occupied aligned 64-lane halves (pairs both wx/wy)
    qquarts = 0       # occupied aligned 32-lane quarters
    crows = 0         # occupied 8-cand-sublane rows (full lane width)
    crows_q = 0       # occupied (8 cand x 32 lane) cells
    empty_blocks = 0
    empty_by_range = defaultdict(int)  # range position r -> empty windows
    win_by_range = defaultdict(int)
    occq_hist = defaultdict(int)  # occupied 32-lane quarters per nonempty window
    valid_hist = defaultdict(int)  # valid-pair count bucket per walked window

    for t in range(NT):
        if qlev[t] < 0:
            continue
        qx = x[t * TQ:(t + 1) * TQ]
        qy = y[t * TQ:(t + 1) * TQ]
        qh = hh[t * TQ:(t + 1) * TQ]
        qvalid = qh > 0
        for li in range(NL):
            mb = (t * NL + li) * WM_STRIDE
            for r in range(wm[mb]):
                lo = starts[wm[mb + 1 + 2 * r]]
                hi = starts[wm[mb + 2 + 2 * r]]
                if hi <= lo:
                    continue
                a0 = (lo // 8) * 8
                nw = -(-(hi - a0) // TILE)
                for k in range(nw):
                    a = min(a0 + k * TILE, C - TILE)
                    lo_k = max(a0 + k * TILE, lo)
                    hi_k = min(hi, a0 + (k + 1) * TILE)
                    cx = x[a:a + TILE, None]
                    cy = y[a:a + TILE, None]
                    ch = hh[a:a + TILE, None]
                    col = np.arange(a, a + TILE)[:, None]
                    h_ij = np.maximum(0.5 * (qh[None, :] + ch), 1e-6)
                    dx = qx[None, :] - cx
                    dy = qy[None, :] - cy
                    r2 = dx * dx + dy * dy
                    rad = scale * h_ij
                    valid = ((col >= lo_k) & (col < hi_k) & (r2 < rad * rad)
                             & (ch > 0) & qvalid[None, :])
                    np_pairs = int(valid.sum())
                    key = (qlev[t], tcfg.populated[li])
                    win_by_range[r] += 1
                    valid_hist[min(np_pairs, 1) if np_pairs < 2 else (
                        1 << int(np.log2(np_pairs)))] += 1
                    if np_pairs == 0:
                        empty_blocks += 1
                        empty_by_range[r] += 1
                        continue
                    blocks[key] += 1
                    pairs[key] += np_pairs
                    lane_occ = valid.any(axis=0)
                    lanes = np.nonzero(lane_occ)[0]
                    lane_spans.append(lanes[-1] - lanes[0] + 1)
                    half = TQ // 2
                    qhalves += int(lane_occ[:half].any()) + int(lane_occ[half:].any())
                    qq = lane_occ.reshape(max(TQ // 32, 1), -1).any(axis=1)
                    qquarts += int(qq.sum())
                    occq_hist[int(qq.sum())] += 1
                    row_occ = valid.any(axis=1).reshape(8, 8).any(axis=1)
                    crows += int(row_occ.sum())
                    cell_occ = valid.reshape(8, 8, max(TQ // 32, 1), -1).any(axis=(1, 3))
                    crows_q += int(cell_occ.sum())

    tot_blocks = sum(blocks.values())
    tot_pairs = sum(pairs.values())
    lw = max(2 * TQ, 128)
    return {
        "tq": TQ,
        "capacity": C,
        "blocks": tot_blocks,
        "empty_windows": empty_blocks,
        "pairs": tot_pairs,
        "pair_validity_pct": tot_pairs / max(tot_blocks, 1) / (64 * TQ) * 100,
        "collapsed_windows": int(collapsed),
        "stream_mb_bf16": tot_blocks * 64 * lw * 2 / 1e6,
        # detail tables for the CLI
        "_by_level": {k: (blocks[k], pairs[k]) for k in sorted(blocks)},
        "_lane_spans": np.array(lane_spans),
        "_qhalves": qhalves,
        "_qquarts": qquarts,
        "_crows": crows,
        "_crows_q": crows_q,
        "_win_by_range": dict(win_by_range),
        "_empty_by_range": dict(empty_by_range),
        "_occq_hist": dict(occq_hist),
        "_valid_hist": dict(valid_hist),
    }


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp

    from bench import build_sim
    from adaptive_sph_tpu.ops import kernels
    from adaptive_sph_tpu.models.grid_step import physics_scale

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sim = build_sim(replicas=replicas)
    st, params, tcfg = sim.state, sim.params, sim.tile_cfg
    scale = float(physics_scale(params))
    h = jnp.asarray(
        kernels.smoothing_length_from_mass(st.mass, params.rest_density, 2))
    c = census(st.position, h, st.mass, st.alive, tcfg, scale)

    TQ, C = c["tq"], c["capacity"]
    lw = max(2 * TQ, 128)
    print(f"n={sim.num_fluid_particles} C={C} TQ={TQ} NT={C // TQ} "
          f"levels={tcfg.populated}")
    print(f"blocks={c['blocks']} (+{c['empty_windows']} empty-skipped) "
          f"pairs={c['pairs']} "
          f"avg_pairs/block={c['pairs'] / max(c['blocks'], 1):.1f} "
          f"validity={c['pair_validity_pct']:.2f}% "
          f"collapsed={c['collapsed_windows']}")
    print("\nper (qlevel, clevel):")
    for key, (b, p) in c["_by_level"].items():
        print(f"  q{key[0]} x c{key[1]}: blocks={b:5d} pairs={p:7d} "
              f"validity={p / b / (64 * TQ) * 100:5.2f}%")
    ls = c["_lane_spans"]
    print(f"\nquery-lane span per block: p25={np.percentile(ls, 25):.0f} "
          f"median={np.median(ls):.0f} p75={np.percentile(ls, 75):.0f} "
          f"p95={np.percentile(ls, 95):.0f} max={ls.max()}")
    B2 = 2  # bf16
    full = c["blocks"] * 64 * lw * B2
    chalf = c["_crows"] * 8 * lw * B2
    qhalf = c["_qhalves"] * 64 * (lw // 2) * B2
    qquart = c["_qquarts"] * 64 * (lw // 4) * B2
    both = c["_crows_q"] * 8 * (lw // 4) * B2
    ideal = c["pairs"] * 2 * B2
    print(f"\nstream bytes/iteration (bf16):")
    print(f"  full (current)           : {full / 1e6:7.2f} MB")
    print(f"  cand-trim bricks (8-rows): {chalf / 1e6:7.2f} MB  ({c['_crows']} bricks)")
    print(f"  query 64-lane halves     : {qhalf / 1e6:7.2f} MB  ({c['_qhalves']} halves)")
    print(f"  query 32-lane quarters   : {qquart / 1e6:7.2f} MB  ({c['_qquarts']} quarters)")
    print(f"  both (8x32 cells)        : {both / 1e6:7.2f} MB  ({c['_crows_q']} cells)")
    print(f"  ideal (pairs only)       : {ideal / 1e6:7.2f} MB")
    print(f"\nwindows by range position (walked/empty): "
          + " ".join(f"r{r}:{c['_win_by_range'][r]}/{c['_empty_by_range'].get(r, 0)}"
                     for r in sorted(c["_win_by_range"])))
    print("occupied quarters per nonempty window: "
          + " ".join(f"{k}q:{v}" for k, v in sorted(c["_occq_hist"].items())))
    print("valid pairs per walked window (pow2 buckets): "
          + " ".join(f"{k}:{v}" for k, v in sorted(c["_valid_hist"].items())))


if __name__ == "__main__":
    main()
