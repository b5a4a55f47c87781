"""Slab-sharded tile backend: the production hot path over a multi-chip mesh.

The reference is single-process (rayon threads, SURVEY.md section 2); the TPU-native
scaling design is SPATIAL domain decomposition (SURVEY.md section 5.8): the domain is
split into vertical slabs along x over a 1-D device mesh, each device owns the
particles inside its slab, and the full sorted-tile step (models/tile_step.py) runs
per device inside one jax.shard_map program:

  - ONE full-payload halo exchange per step: each device packs the particles within
    `halo_w` of its slab boundaries (plus any that drifted out of the slab last
    step) into fixed-size strip buffers and `ppermute`s them to its neighbors over
    ICI. Received particles whose position lies inside the receiver's slab are
    ADOPTED (migration with a one-step handoff: the old owner keeps them exactly
    one more step as ghosts, so ownership is always unique); the rest become ghost
    candidates.
  - Ghost values that change inside the step (density, pressure, acceleration,
    advected positions) are REFRESHED from their owners with small per-field
    ppermutes — the Jacobi operator closures pull owner values before every
    application, so each solver iteration costs two strip exchanges.
  - Global reductions (CFL dt, solver convergence statistics, overflow counters)
    are psum/pmin/pmax collectives; every device sees identical while_loop
    convergence decisions, keeping the collectives inside the loop in lockstep.

Ownership invariant: a particle is owned by device d for a step iff its
START-of-step x lies in slab d. A particle that advects out of the slab stays in
the old owner's set for one step (it is inside the halo strip by CFL), is handed
to the neighbor in the next exchange, and dropped by the old owner at that step's
retention compaction.

Resampling (share/merge/split) runs slab-locally between the step and the
retention compaction — see make_slab_step_fn. Cross-boundary partner pairs
match inward instead (exactly conservative; validated statistically against
the single-device run like SURVEY.md section 7 prescribes).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.grid_step import max_scale
from ..models.state import FluidState
from ..models.tile_step import single_step_tiles
from ..ops import kernels
from ..ops.grid import GridConfig
from ..ops.tiles import TILE, TileConfig
from ..utils.params import ParticleSizes, SimulationParams

AXIS = "p"

# full-payload columns exchanged once per step (everything single_step_tiles reads)
_PAYLOAD = (
    "mass", "position", "velocity", "h", "h_next", "omega", "level",
    "has_level", "size_class", "pressure", "pressure_div",
)


@dataclasses.dataclass(frozen=True)
class SlabConfig:
    """Static geometry of the slab decomposition (jit cache key)."""

    ndev: int
    c_dev: int  # owned-particle capacity per device
    strip: int  # halo strip buffer size (particles per direction)
    halo_w: float  # halo width (>= max search radius + migration margin)
    edges: tuple  # (ndev+1,) slab boundaries along x
    oy: float  # global grid origin y
    tcfg: TileConfig  # per-device tile config (capacity == c_dev + 2*strip)

    @property
    def c_loc(self) -> int:
        return self.c_dev + 2 * self.strip


def make_slab_config(params: SimulationParams, gcfg: GridConfig, state: FluidState,
                     ndev: int, tq: int = 32, headroom: float = 2.0) -> SlabConfig:
    """Derive the slab decomposition from the current state.

    Slab edges are count-balancing quantiles of the x distribution; capacities
    carry `headroom`x margin (SlabSimulation grows it on overflow-triggered
    reshards — compressed states need more row padding than the snapshot shows).
    """
    alive = np.asarray(state.alive)
    xs = np.sort(np.asarray(state.position)[alive, 0])
    n = len(xs)
    # count-balanced interior edges; domain bounds from the global grid
    x0 = gcfg.origin[0]
    x1 = gcfg.origin[0] + gcfg.nx0 * gcfg.cell0

    if params.particle_sizes == ParticleSizes.Uniform:
        h_max = float(params.h)
    else:
        h_max = float(np.max(np.asarray(
            kernels.smoothing_length_from_mass(
                np.asarray(state.mass)[alive], params.rest_density, 2)
        )))
    mscale = float(max_scale(params))
    halo_w = mscale * h_max * 1.25

    if (x1 - x0) < ndev * halo_w * 1.02:
        raise ValueError(
            f"domain width {x1 - x0:.4f} < {ndev} x halo width {halo_w:.4f}: "
            f"one-hop halo exchange needs every slab at least one interaction "
            f"radius wide — use fewer devices for this scene "
            f"(max ~{max(1, int((x1 - x0) / (halo_w * 1.02)))})"
        )
    # count-balancing quantiles, clipped so every slab stays >= one halo width
    # (a concentrated block — e.g. a dam column — would otherwise produce
    # slivers); the count skew this introduces is absorbed by the 2x capacity
    # headroom and corrected over time by rebalance_on_overflow resharding
    qs = [float(xs[min(int(n * k / ndev), n - 1)]) for k in range(1, ndev)]
    edges_l = [x0]
    for d, q in enumerate(qs):
        hi_room = x1 - (ndev - 1 - d) * halo_w * 1.02
        edges_l.append(min(max(q, edges_l[-1] + halo_w * 1.02), hi_room))
    edges_l.append(x1)
    edges = tuple(edges_l)

    counts = []
    strips = []
    for d in range(ndev):
        lo, hi = edges[d], edges[d + 1]
        counts.append(int(np.sum((xs >= lo) & (xs < hi))))
        strips.append(int(np.sum((xs >= lo) & (xs < lo + halo_w))))
        strips.append(int(np.sum((xs < hi) & (xs >= hi - halo_w))))
    c_dev = max(64, ((int(max(counts) * headroom) + 16 * tq + 63) // 64) * 64)
    strip = max(64, ((int(max(strips) * headroom * 1.25) + 8 * tq + 63) // 64) * 64)
    c_loc = c_dev + 2 * strip

    # local grid: slab width + halo on both sides, dims divisible for the ladder
    div = 1 << (gcfg.levels - 1)
    slab_w = max(edges[d + 1] - edges[d] for d in range(ndev))
    nx_loc = int(np.ceil((slab_w + 2 * halo_w) / gcfg.cell0)) + 2
    nx_loc = ((nx_loc + div - 1) // div) * div
    gcfg_loc = dataclasses.replace(gcfg, nx0=nx_loc, capacity=c_loc,
                                   nx_raw=0, ny_raw=0)
    tcfg = TileConfig.from_grid(gcfg_loc, mscale, tq=tq)
    return SlabConfig(
        ndev=ndev, c_dev=c_dev, strip=strip, halo_w=float(halo_w), edges=edges,
        oy=float(gcfg.origin[1]), tcfg=tcfg,
    )


class HaloHooks:
    """Per-device hooks consumed by single_step_tiles (see its `halo` param)."""

    def __init__(self, scfg: SlabConfig, origin, owned, sendL_idx, sendR_idx,
                 perm_to_left, perm_to_right):
        self.scfg = scfg
        self.origin = origin  # (2,) traced
        self.owned = owned  # (C_loc,) bool, flat order
        self.sendL_idx = sendL_idx  # (S,) flat indices of my left strip (C_loc = none)
        self.sendR_idx = sendR_idx
        self._to_left = perm_to_left
        self._to_right = perm_to_right

    def psum(self, x):
        return jax.lax.psum(x, AXIS)

    def pmin(self, x):
        return jax.lax.pmin(x, AXIS)

    def pmax(self, x):
        return jax.lax.pmax(x, AXIS)

    def make_refresher(self, bins):
        """Sorted-space ghost refresh: gather my strips, ppermute, scatter into the
        ghost rows (flat rows [c_dev, c_dev+S) from left, [c_dev+S, c_dev+2S) from
        right owners)."""
        scfg = self.scfg
        C = scfg.c_loc
        S = scfg.strip
        sl = bins.pp[jnp.minimum(self.sendL_idx, C - 1)]
        sl = jnp.where(self.sendL_idx < C, sl, C)
        sr = bins.pp[jnp.minimum(self.sendR_idx, C - 1)]
        sr = jnp.where(self.sendR_idx < C, sr, C)
        ghostL = bins.pp[scfg.c_dev + jnp.arange(S)]
        ghostR = bins.pp[scfg.c_dev + S + jnp.arange(S)]
        to_left, to_right = self._to_left, self._to_right

        def refresh(vals):  # (C, k) sorted
            squeeze = vals.ndim == 1
            if squeeze:
                vals = vals[:, None]
            vl = jnp.where((sl < C)[:, None], vals[jnp.minimum(sl, C - 1)], 0.0)
            vr = jnp.where((sr < C)[:, None], vals[jnp.minimum(sr, C - 1)], 0.0)
            # my L strip -> left neighbor's ghostR rows; my R strip -> right's ghostL
            fromR = jax.lax.ppermute(vl, AXIS, to_left)   # arrives at dst = src-1
            fromL = jax.lax.ppermute(vr, AXIS, to_right)  # arrives at dst = src+1
            vals = vals.at[jnp.where(ghostL < C, ghostL, C)].set(fromL, mode="drop")
            vals = vals.at[jnp.where(ghostR < C, ghostR, C)].set(fromR, mode="drop")
            return vals[:, 0] if squeeze else vals

        return refresh


def _pack_strip(mask, payload, S):
    """Pack masked rows into a fixed (S, F) buffer; returns (buf, idx, overflow)."""
    C, F = payload.shape
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask & (pos < S), pos, S)
    buf = jnp.zeros((S + 1, F), payload.dtype).at[tgt].set(
        jnp.where(mask[:, None], payload, 0.0), mode="drop")[:S]
    idx = jnp.full((S + 1,), C, jnp.int32).at[tgt].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop")[:S]
    overflow = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - S, 0)
    return buf, idx, overflow


def _payload_matrix(state: FluidState):
    cols = []
    for name in _PAYLOAD:
        a = getattr(state, name)
        a = a.astype(jnp.float32) if a.ndim == 1 else a
        cols.append(a[:, None] if a.ndim == 1 else a)
    cols.append(state.alive.astype(jnp.float32)[:, None])
    return jnp.concatenate(cols, axis=1)


def _payload_fields(buf):
    out = {}
    c = 0
    for name in _PAYLOAD:
        k = 2 if name in ("position", "velocity") else 1
        v = buf[:, c:c + k]
        out[name] = v if k == 2 else v[:, 0]
        c += k
    out["alive"] = buf[:, c] > 0.5
    return out


def make_slab_step_fn(params: SimulationParams, scfg: SlabConfig, boundary_handler,
                      mesh: Mesh, split_patterns=None):
    """Jitted sharded step: FluidState with (ndev*c_dev, ...) arrays -> same.

    Resampling (share/merge/split) runs SLAB-LOCALLY between the physics step
    and the retention compaction: partner matching restricts donors AND
    receivers to owned particles (cross-boundary pairs match inward — the
    matching radius is under halo_w, and index-priority stays frame-local so
    every device's decisions are self-consistent), split children fill local
    free slots and join the owned set, and the mass-conservation check reduces
    over owned rows globally. Reference anchor: adaptivity runs as the same
    three passes as the single-process path (particle_merging.rs:16-122,270-328).
    """
    resampling = params.merging or params.sharing or params.splitting
    if resampling and params.splitting:
        assert split_patterns is not None, "splitting needs split_patterns"
    ndev = scfg.ndev
    S = scfg.strip
    edges = jnp.asarray(scfg.edges, jnp.float32)
    to_left = [(i, i - 1) for i in range(1, ndev)]
    to_right = [(i, i + 1) for i in range(ndev - 1)]
    halo_pad = scfg.halo_w + 2 * scfg.tcfg.cell0  # local grid origin margin

    def dev_step(local: FluidState):
        dev = jax.lax.axis_index(AXIS)
        x_lo = edges[dev]
        x_hi = edges[dev + 1]
        x = local.position[:, 0]
        al = local.alive

        payload = _payload_matrix(local)
        maskL = al & (x < x_lo + scfg.halo_w)
        maskR = al & (x >= x_hi - scfg.halo_w)
        bufL, idxL, ovL = _pack_strip(maskL, payload, S)
        bufR, idxR, ovR = _pack_strip(maskR, payload, S)
        recvR = jax.lax.ppermute(bufL, AXIS, to_left)
        recvL = jax.lax.ppermute(bufR, AXIS, to_right)
        fL = _payload_fields(recvL)
        fR = _payload_fields(recvR)

        def cat(name, localv):
            if name == "alive":
                return jnp.concatenate([localv, fL["alive"], fR["alive"]])
            if name in _PAYLOAD:
                out = jnp.concatenate([localv, fL[name], fR[name]])
                return out.astype(localv.dtype)
            pad = jnp.zeros((2 * S,) + localv.shape[1:], localv.dtype)
            return jnp.concatenate([localv, pad])

        w = FluidState(
            **{
                f.name: (
                    cat(f.name, getattr(local, f.name))
                    if getattr(local, f.name).ndim >= 1
                    else getattr(local, f.name)
                )
                for f in dataclasses.fields(FluidState)
            }
        )
        xw = w.position[:, 0]
        # edge devices own the half-open outside region so particles pushed past
        # the domain (boundary-penalty recoveries) are never silently dropped
        lo_ok = jnp.where(dev == 0, True, xw >= x_lo)
        hi_ok = jnp.where(dev == ndev - 1, True, xw < x_hi)
        owned = w.alive & lo_ok & hi_ok
        # RELAY: a particle kicked across MORE than one slab in a step (splash
        # impulses can outrun the CFL locality bound) arrives here as a ghost
        # whose x lies beyond my FAR edge. Its true owner never saw it and the
        # sender drops it, so I adopt it for one step and forward it at the
        # next exchange — exactly one keeper per particle by construction
        # (the sender is not its owner, and only one neighbor received it).
        row = jnp.arange(scfg.c_loc)
        ghost_from_left = (row >= scfg.c_dev) & (row < scfg.c_dev + S)
        ghost_from_right = row >= scfg.c_dev + S
        relay = w.alive & (
            (ghost_from_left & (xw >= x_hi)) | (ghost_from_right & (xw < x_lo))
        )
        owned = owned | relay
        # strip indices refer to the working set (local region occupies [0, c_dev))
        halo = HaloHooks(
            scfg, jnp.stack([x_lo - jnp.float32(halo_pad), jnp.float32(scfg.oy)]),
            owned, idxL, idxR, to_left, to_right,
        )
        new_w, dt, diag = single_step_tiles(w, params, scfg.tcfg, boundary_handler,
                                            halo=halo)
        # the step emits its state in SORTED order (models/tile_step.py
        # sorted emission); the ownership mask in that same order rides the diag
        keep_owned = diag.pop("_owned_sorted")
        if resampling:
            from ..models import adaptivity as adapt

            def partner_fn(st, cls, mode):
                return adapt.find_partners_tiles(
                    st, scfg.tcfg, cls, dt, params, mode,
                    origin=halo.origin, owned=keep_owned,
                )

            new_w, adiag = adapt.single_step_adaptivity(
                new_w, None, dt, params, split_patterns,
                partner_fn=partner_fn, owned=keep_owned, psum=halo.psum,
            )
            keep_owned = adiag.pop("_owned_after")
            diag.update(adiag)
        keep = keep_owned & new_w.alive
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        tgt = jnp.where(keep & (pos < scfg.c_dev), pos, scfg.c_dev)
        kept = jnp.sum(keep.astype(jnp.int32))
        ov_cap = jnp.maximum(kept - scfg.c_dev, 0)

        def compact(a):
            if a.ndim == 0:
                return a
            out = jnp.zeros((scfg.c_dev + 1,) + a.shape[1:], a.dtype)
            keep_b = keep.reshape(keep.shape + (1,) * (a.ndim - 1))
            src = jnp.where(keep_b, a, jnp.zeros((), a.dtype))
            return out.at[tgt].set(src, mode="drop")[: scfg.c_dev]

        new_local = jax.tree.map(compact, new_w)
        n_global = jax.lax.psum(jnp.sum(keep & new_w.alive), AXIS)
        new_local = new_local.replace(
            n=n_global.astype(jnp.int32), time=new_w.time,
            step_number=new_w.step_number,
        )
        diag["shard_overflow"] = jax.lax.psum(ovL + ovR + ov_cap, AXIS)
        diag["relay_count"] = jax.lax.psum(jnp.sum(relay), AXIS)
        # adaptivity can coarsen particles until their interaction radius
        # outgrows the halo strip — surfaced so SlabSimulation reshards
        h_keep = jnp.where(keep, new_w.h, 0.0)
        diag["halo_h_max"] = jax.lax.pmax(jnp.max(h_keep), AXIS)
        return new_local, diag

    from jax import shard_map

    def step(state: FluidState):
        in_specs = jax.tree.map(
            lambda a: P(AXIS) if a.ndim >= 1 else P(), state,
        )
        out_specs = (in_specs, P())
        f = shard_map(dev_step, mesh=mesh, in_specs=(in_specs,),
                      out_specs=out_specs, check_vma=False)
        return f(state)

    return jax.jit(step)


def shard_spatially(state: FluidState, scfg: SlabConfig, mesh: Mesh) -> FluidState:
    """Global state -> slab-blocked (ndev*c_dev,) arrays placed over the mesh."""
    ndev, c_dev = scfg.ndev, scfg.c_dev
    alive = np.asarray(state.alive)
    x = np.asarray(state.position)[:, 0]
    slab = np.clip(
        np.searchsorted(np.asarray(scfg.edges[1:-1]), x, side="right"), 0, ndev - 1
    )

    def blocked(a):
        a = np.asarray(a)
        if a.ndim == 0:
            return jnp.asarray(a)
        out = np.zeros((ndev * c_dev,) + a.shape[1:], a.dtype)
        for d in range(ndev):
            sel = alive & (slab == d)
            cnt = int(sel.sum())
            assert cnt <= c_dev, f"slab {d}: {cnt} > c_dev {c_dev}"
            out[d * c_dev: d * c_dev + cnt] = a[sel]
        return jnp.asarray(out)

    new = {f.name: blocked(getattr(state, f.name))
           for f in dataclasses.fields(FluidState)}
    # alive mask must reflect the blocked layout
    amask = np.zeros(ndev * c_dev, bool)
    for d in range(ndev):
        cnt = int((alive & (slab == d)).sum())
        amask[d * c_dev: d * c_dev + cnt] = True
    new["alive"] = jnp.asarray(amask)
    st = FluidState(**new)
    shardings = jax.tree.map(
        lambda a: NamedSharding(mesh, P(AXIS, *([None] * (a.ndim - 1))))
        if hasattr(a, "ndim") and a.ndim >= 1 else NamedSharding(mesh, P()),
        st,
    )
    return jax.tree.map(jax.device_put, st, shardings)


class SlabSimulation:
    """Host-side driver for the slab-sharded production step with DYNAMIC
    REBALANCING — the spatial analogue of the runner's grow_capacity retry.

    A step whose diagnostics report `shard_overflow` (strip/capacity spill) or
    a halo outgrown by adaptivity-coarsened particles is DISCARDED (the carried
    state never advanced), the slab edges are recomputed as count-balancing
    quantiles of the CURRENT particle distribution (make_slab_config), the
    state is resharded, the step recompiled, and the step retried. Static
    quantiles of the initial state would otherwise fail on any scene whose
    mass moves sideways (a dam break slumping into few slabs).
    """

    def __init__(self, params: SimulationParams, gcfg: GridConfig,
                 boundary_handler, state: FluidState, mesh: Mesh, tq: int = 16,
                 split_patterns=None):
        self.params = params
        self.gcfg = gcfg
        self.boundary_handler = boundary_handler
        self.mesh = mesh
        self.ndev = mesh.devices.size
        self.tq = tq
        self.split_patterns = split_patterns
        self.n_reshards = 0
        self.headroom = 2.0
        self.scfg = make_slab_config(params, gcfg, state, self.ndev, tq=tq)
        self.sst = shard_spatially(state, self.scfg, mesh)
        self._compile()

    def _compile(self):
        self.step_fn = make_slab_step_fn(
            self.params, self.scfg, self.boundary_handler, self.mesh,
            split_patterns=self.split_patterns,
        )

    @property
    def time(self) -> float:
        return float(self.sst.time)

    def reshard(self):
        """Recompute quantile edges/capacities from the current state and reshard."""
        self.scfg = make_slab_config(self.params, self.gcfg, self.sst, self.ndev,
                                     tq=self.tq, headroom=self.headroom)
        self.sst = shard_spatially(self.sst, self.scfg, self.mesh)
        self._compile()
        self.n_reshards += 1

    def step(self, _retries: int = 3):
        new_sst, diag = self.step_fn(self.sst)
        diag = jax.device_get(diag)
        mscale = float(max_scale(self.params))
        halo_ok = float(diag["halo_h_max"]) * mscale <= self.scfg.halo_w
        ro, co, lo = (int(x) for x in diag["neighbor_overflow"])
        wo = int(diag.get("wcache_overflow", 0))
        capacity_blown = int(diag["shard_overflow"]) > 0 or ro > 0 or co > 0 or wo > 0
        if capacity_blown or not halo_ok or lo > 0:
            # the carried state never advanced: with sorted emission a row/strip
            # overflow DROPS particles, so the failed step's output is discarded
            # and the decomposition is rebuilt with more headroom
            if _retries <= 0:
                raise RuntimeError(
                    f"slab step failed after reshards: shard_overflow="
                    f"{int(diag['shard_overflow'])} rows={ro} cells={co} "
                    f"levels={lo} wcache={wo} halo_ok={halo_ok}"
                )
            if capacity_blown:
                self.headroom = min(self.headroom * 1.5, 16.0)
            self.reshard()
            return self.step(_retries=_retries - 1)
        self.sst = jax.block_until_ready(new_sst)
        return diag

    def run_until(self, t_end: float, max_steps: int = 10**9) -> int:
        steps = 0
        while self.time < t_end and steps < max_steps:
            self.step()
            steps += 1
        return steps


def gather_alive(state: FluidState):
    """Host-side: dict of alive-particle arrays sorted by (x, y) for comparisons."""
    alive = np.asarray(state.alive)
    pos = np.asarray(state.position)[alive]
    order = np.lexsort((pos[:, 1], pos[:, 0]))
    out = {"position": pos[order]}
    for name in ("velocity", "density", "pressure", "mass"):
        out[name] = np.asarray(getattr(state, name))[alive][order]
    return out
