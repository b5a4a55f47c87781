"""Adaptivity: classification, sharing, merging, splitting — masked, fixed-capacity.

Reference parity:
  classify_particles            adaptivity/mod.rs:32-59
  find_merge_partner_sequential adaptivity/particle_merging.rs:16-122
  merge_particles               adaptivity/particle_merging.rs:270-371
  find/share partners + apply   adaptivity/particle_sharing.rs
  split_particles               adaptivity/splitting.rs:19-82
  single_step_adaptivity        simulation.rs:2732-2796

The one genuinely sequential algorithm of the reference — greedy partner matching with
index-order priority — is reproduced as a parallel deterministic matching (SURVEY.md
section 7): donors count eligible receivers, donors that are themselves an eligible
receiver of a lower-index donor stand down, every receiver adopts its minimum-index
active donor, and mass moves in one masked transfer whose conservation is exact by
construction (each receiver takes dropped/cnt; the donor loses dropped). Outcomes are
validated statistically (mass conservation, class histogram) rather than bitwise, as
the survey prescribes.

Particle deletion = alive-mask clear + stable compaction (argsort by liveness); the
particle count changes, shapes never do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernels
from ..ops.neighbors import Neighborhood
from ..ops.pairwise import sym_sum, sym_max
from ..utils.params import ParticleSizes, SimulationParams, optimal_mass_from_level
from .state import (
    SIZE_LARGE,
    SIZE_OPTIMAL,
    SIZE_SMALL,
    SIZE_TOO_LARGE,
    SIZE_TOO_SMALL,
    FluidState,
)

# adaptivity/mod.rs:24-27
FACTOR_TOO_SMALL = 0.5
FACTOR_SMALL = 1.0 / 1.1
FACTOR_LARGE = 1.1
FACTOR_TOO_LARGE = 2.0


def _level_or_max_depth(state: FluidState, params: SimulationParams):
    return jnp.where(state.has_level, state.level, -params.maximum_surface_distance)


def classify(state: FluidState, params: SimulationParams):
    """mrel = m / optimal -> 5 classes (adaptivity/mod.rs:32-48)."""
    target = optimal_mass_from_level(_level_or_max_depth(state, params), params, dim=2)
    mrel = state.mass / jnp.maximum(target, 1e-30)
    cls = jnp.where(
        mrel <= FACTOR_TOO_SMALL,
        SIZE_TOO_SMALL,
        jnp.where(
            mrel <= FACTOR_SMALL,
            SIZE_SMALL,
            jnp.where(mrel < FACTOR_LARGE, SIZE_OPTIMAL, jnp.where(mrel < FACTOR_TOO_LARGE, SIZE_LARGE, SIZE_TOO_LARGE)),
        ),
    )
    return jnp.where(state.alive, cls, SIZE_OPTIMAL).astype(jnp.int32)


def _dropped_mass_merging(level, mass, dt, params):
    """particle_merging.rs:373-385 — the distance-limited branch is disabled (if false)."""
    return mass


def _dropped_mass_sharing(level, mass, dt, params):
    """particle_sharing.rs:242-253."""
    target = optimal_mass_from_level(level, params, dim=2)
    return jnp.minimum(mass - target, target * params.max_mass_transfer_sharing * dt)


def _find_partners(state, nb: Neighborhood, cls, dt, params, mode: str):
    """Parallel deterministic partner matching. mode: 'merge' | 'share'.

    Returns (partner (C,) int32 with C = unmatched, cnt (C,) receivers per donor,
    is_active_donor (C,) bool).
    """
    C = state.capacity
    idx = jnp.arange(C, dtype=jnp.int32)
    level = _level_or_max_depth(state, params)
    target_mass = optimal_mass_from_level(level, params, dim=2)
    mass_base = params.mass_base(2)

    if mode == "merge":
        donor_class = cls == SIZE_TOO_SMALL
        max_dist_f = params.max_merge_distance
        dropped = _dropped_mass_merging(level, state.mass, dt, params)

        def receiver_ok(d, r):
            ok = jnp.where(
                (r["cls"] == SIZE_LARGE) | (r["cls"] == SIZE_TOO_LARGE),
                False,
                jnp.where(
                    r["cls"] == SIZE_OPTIMAL,
                    bool(params.allow_merge_with_optimal_particle),
                    True,
                ),
            )
            if params.allow_merge_on_size_difference:
                ok = ok | (r["mass"] > 5.0 * d["mass"])
            return ok

    else:
        donor_class = cls == SIZE_LARGE
        max_dist_f = params.max_share_distance
        dropped = _dropped_mass_sharing(level, state.mass, dt, params)

        def receiver_ok(d, r):
            return jnp.where(
                r["cls"] == SIZE_SMALL,
                True,
                jnp.where(
                    r["cls"] == SIZE_TOO_SMALL,
                    bool(params.allow_share_with_too_small_particle),
                    jnp.where(
                        r["cls"] == SIZE_OPTIMAL,
                        bool(params.allow_share_with_optimal_particle),
                        False,
                    ),
                ),
            )

    vals = {
        "pos": state.position,
        "mass": state.mass,
        "h": state.h,
        "cls": cls,
        "idx": idx,
        "alive": state.alive,
        "donor": donor_class & state.alive,
        "target": target_mass,
        "dropped": dropped,
    }

    def elig_base(d, r):
        """Eligibility of (d as donor -> r as receiver), without the mass check."""
        not_self = d["idx"] != r["idx"]
        xij = d["pos"] - r["pos"]
        h_ij = 0.5 * (d["h"] + r["h"])
        if params.particle_sizes == ParticleSizes.Uniform:
            h_ij = jnp.full_like(h_ij, params.h)
        max_dist = h_ij * max_dist_f
        near = jnp.sum(xij * xij, -1) <= max_dist * max_dist
        return d["donor"] & r["alive"] & not_self & near & receiver_ok(d, r)

    # pass 1: potential receiver count per donor (divisor estimate for the mass check)
    cnt0 = sym_sum(nb, vals, lambda vi, vj: elig_base(vi, vj).astype(jnp.float32))
    cnt0 = jnp.maximum(cnt0, 1.0)
    vals["cnt0"] = cnt0

    def elig_full(d, r):
        new_mass_r = r["mass"] + d["dropped"] / d["cnt0"]
        mass_ok = (new_mass_r < r["target"] * FACTOR_LARGE) & (new_mass_r <= mass_base)
        return elig_base(d, r) & mass_ok

    cnt1 = sym_sum(nb, vals, lambda vi, vj: elig_full(vi, vj).astype(jnp.float32))
    donor_candidate = vals["donor"] & (cnt1 > 0.5)
    vals["donor_cand"] = donor_candidate

    # donor stand-down: a donor that is an eligible receiver of a lower-index donor
    # candidate yields (index-order priority of the sequential greedy loop)
    def min_claimer_edge(vi, vj):
        ok = vj["donor_cand"] & elig_full(vj, vi)
        return jnp.where(ok, -vj["idx"].astype(jnp.float32), -jnp.inf)

    neg_min_claimer = sym_max(nb, vals, min_claimer_edge, fill=-jnp.inf)
    min_claimer = -neg_min_claimer  # +inf when no claimer
    deactivated = donor_candidate & (min_claimer < idx.astype(jnp.float32))
    active = donor_candidate & ~deactivated
    vals["active"] = active

    # receiver assignment: minimum-index active donor among eligible claimants;
    # active donors never become receivers (they hold MERGE_PARTNER_DELETE)
    def partner_edge(vi, vj):
        ok = vj["active"] & elig_full(vj, vi)
        return jnp.where(ok, -vj["idx"].astype(jnp.float32), -jnp.inf)

    neg_partner = sym_max(nb, vals, partner_edge, fill=-jnp.inf)
    partner_f = -neg_partner
    has_partner = jnp.isfinite(partner_f) & state.alive & ~active
    partner = jnp.where(has_partner, partner_f, C).astype(jnp.int32)

    # receivers per donor
    cnt = jnp.zeros(C + 1, jnp.int32).at[partner].add(1)[:C]
    return partner, cnt, active


def _apply_transfer(state: FluidState, partner, cnt, dt, params, mode: str):
    """Masked mass/velocity/position transfer (particle_merging.rs:270-328 /
    particle_sharing.rs:152-239). Exactly conservative."""
    C = state.capacity
    level = _level_or_max_depth(state, params)
    if mode == "merge":
        dropped = _dropped_mass_merging(level, state.mass, dt, params)
        min_partners = params.minimum_merge_partners
    else:
        dropped = _dropped_mass_sharing(level, state.mass, dt, params)
        min_partners = params.minimum_share_partners

    cnt_ok = cnt >= min_partners
    donor_gives = (cnt > 0) & cnt_ok

    p = jnp.minimum(partner, C - 1)
    is_receiver = (partner < C) & donor_gives[p]

    mass_n = jnp.where(is_receiver, dropped[p] / jnp.maximum(cnt[p], 1).astype(jnp.float32), 0.0)
    m_i = state.mass
    m_new = m_i + mass_n
    w_new = jnp.where(is_receiver, 1.0 / jnp.maximum(m_new, 1e-30), 0.0)

    vel = jnp.where(
        is_receiver[:, None],
        (m_i[:, None] * state.velocity + mass_n[:, None] * state.velocity[p]) * w_new[:, None],
        state.velocity,
    )
    pos = jnp.where(
        is_receiver[:, None],
        (m_i[:, None] * state.position + mass_n[:, None] * state.position[p]) * w_new[:, None],
        state.position,
    )
    mass = jnp.where(is_receiver, m_new, m_i)
    h_next = jnp.where(
        is_receiver,
        kernels.smoothing_length_from_mass(mass, params.rest_density, 2),
        state.h_next,
    )

    # donor side
    mass = jnp.where(donor_gives, mass - dropped, mass)
    if mode == "share":
        h_next = jnp.where(
            donor_gives,
            kernels.smoothing_length_from_mass(jnp.maximum(mass, 1e-30), params.rest_density, 2),
            h_next,
        )
        alive = state.alive
    else:
        dead = donor_gives & (mass < 1e-6)  # particle_merging.rs:356
        alive = state.alive & ~dead
        mass = jnp.where(dead, 0.0, mass)

    return state.replace(position=pos, velocity=vel, mass=mass, h_next=h_next, alive=alive)


def compact(state: FluidState) -> FluidState:
    """Stable move of alive particles to the front (swap-to-end + truncate analogue)."""
    C = state.capacity
    idx = jnp.arange(C, dtype=jnp.int32)
    key = jnp.where(state.alive, idx, C + idx)
    perm = jnp.argsort(key)

    def g(a):
        return a[perm] if a.ndim >= 1 and a.shape[0] == C else a

    n = jnp.sum(state.alive).astype(jnp.int32)
    return jax.tree.map(g, state).replace(n=n)


def split(state: FluidState, params: SimulationParams, patterns, max_splits: int,
          owned=None):
    """TooLarge -> n children placed by the precomputed pattern (splitting.rs:19-82).

    patterns: (P, MAXC, 2) jnp table, row k = positions for (k+2) children, plus
    (P,) valid child counts. Child 0 replaces the parent; the rest fill free slots.
    Splits beyond `max_splits` per step are deferred to the next odd step (the
    classification re-runs there); deferred count is returned for diagnostics.
    owned: optional mask restricting parents (slab-sharded path: each device
    splits only the particles it owns; ghost rows are never parents).
    """
    C = state.capacity
    pat_pos, pat_counts = patterns  # (P, MAXC, 2) device, (P,) host numpy
    P, MAXC, _ = pat_pos.shape
    max_children = int(np.max(np.asarray(pat_counts)))

    cls = classify(state, params)
    too_large = state.alive & (cls == SIZE_TOO_LARGE)
    if owned is not None:
        too_large = too_large & owned

    level = _level_or_max_depth(state, params)
    target = optimal_mass_from_level(level, params, dim=2)
    nch = jnp.round(state.mass / jnp.maximum(target, 1e-30)).astype(jnp.int32)
    nch = jnp.clip(nch, 2, max_children)
    missing_pattern = jnp.sum(
        too_large & (jnp.round(state.mass / jnp.maximum(target, 1e-30)) > max_children)
    )

    idx = jnp.arange(C, dtype=jnp.int32)
    order = jnp.argsort(jnp.where(too_large, idx, C + idx))
    parents = order[:max_splits]
    valid_parent = too_large[parents]
    deferred = jnp.sum(too_large) - jnp.sum(valid_parent)

    # children go into FREE slots (dead rows anywhere in the array) — the state
    # order is arbitrary (the tile backend keeps it in sorted-layout order with
    # padding holes), so "free" is mask-derived, never index-derived
    dead = ~state.alive
    n_free = jnp.sum(dead.astype(jnp.int32))
    free_rank = jnp.where(dead, jnp.cumsum(dead.astype(jnp.int32)) - 1, C)
    free_slot = (
        jnp.full((C + 1,), C, jnp.int32).at[free_rank].set(idx, mode="drop")[:C]
    )

    nch_p = jnp.where(valid_parent, nch[parents], 0)
    new_per_parent = jnp.maximum(nch_p - 1, 0)
    offsets = jnp.cumsum(new_per_parent) - new_per_parent
    fits = offsets + new_per_parent <= n_free
    ok_parent = valid_parent & fits
    deferred = deferred + jnp.sum(valid_parent & ~fits)
    nch_p = jnp.where(ok_parent, nch_p, 0)
    new_per_parent = jnp.maximum(nch_p - 1, 0)
    offsets = jnp.cumsum(new_per_parent) - new_per_parent
    total_new = jnp.sum(new_per_parent)

    # per-parent data
    pmass = state.mass[parents]
    child_mass = pmass / jnp.maximum(nch_p, 1).astype(jnp.float32)
    child_h = kernels.smoothing_length_from_mass(
        jnp.maximum(child_mass, 1e-30), params.rest_density, 2
    )
    # scale by physical radius at INIT_REST_DENSITY = 1 (splitting.rs:45)
    scale = kernels.sphere_volume_to_radius(pmass / 1.0, dim=2)
    prow = jnp.clip(nch_p - 2, 0, P - 1)
    ppos = state.position[parents]
    pvel = state.velocity[parents]
    plvl = state.level[parents]
    plvl_has = state.has_level[parents]
    plvl_old = state.level_old[parents]

    # parent (child 0) update
    pat0 = pat_pos[prow, 0]  # (S, 2)
    new_parent_pos = ppos + pat0 * scale[:, None]

    def upd(a, v, m):
        return a.at[parents].set(jnp.where(m if v.ndim == 1 else m[:, None], v, a[parents]))

    st = state
    st = st.replace(
        mass=upd(st.mass, child_mass, ok_parent),
        position=upd(st.position, new_parent_pos, ok_parent),
        h=upd(st.h, child_h, ok_parent),
        h_next=upd(st.h_next, child_h, ok_parent),
    )

    # children 1..: flat (max_splits, MAXC-1)
    S = parents.shape[0]
    cslots = MAXC - 1
    c_idx = jnp.arange(cslots, dtype=jnp.int32)[None, :]
    child_valid = ok_parent[:, None] & (c_idx + 1 < nch_p[:, None])
    rank = jnp.minimum(offsets[:, None] + c_idx, C - 1)
    dest = jnp.where(child_valid, free_slot[rank], C)
    dest_f = dest.reshape(-1)

    patc = pat_pos[prow][:, 1:, :]  # (S, MAXC-1, 2)
    cpos = (ppos[:, None, :] + patc * scale[:, None, None]).reshape(-1, 2)
    cmass = jnp.broadcast_to(child_mass[:, None], (S, cslots)).reshape(-1)
    ch = jnp.broadcast_to(child_h[:, None], (S, cslots)).reshape(-1)
    cvel = jnp.broadcast_to(pvel[:, None, :], (S, cslots, 2)).reshape(-1, 2)
    clvl = jnp.broadcast_to(plvl[:, None], (S, cslots)).reshape(-1)
    clvl_has = jnp.broadcast_to(plvl_has[:, None], (S, cslots)).reshape(-1)
    clvl_old = jnp.broadcast_to(plvl_old[:, None], (S, cslots)).reshape(-1)
    cval = child_valid.reshape(-1)

    def scat(a, v):
        return a.at[dest_f].set(v, mode="drop")

    st = st.replace(
        mass=scat(st.mass, cmass),
        position=scat(st.position, cpos),
        velocity=scat(st.velocity, cvel),
        h=scat(st.h, ch),
        h_next=scat(st.h_next, ch),
        level=scat(st.level, clvl),
        has_level=scat(st.has_level, clvl_has),
        level_old=scat(st.level_old, clvl_old),
        alive=scat(st.alive, cval),
        pressure=scat(st.pressure, jnp.zeros_like(cmass)),
        density=scat(st.density, jnp.ones_like(cmass)),
        n=state.n + total_new,
    )
    return st, {"splits": jnp.sum(ok_parent), "split_deferred": deferred,
                "split_missing_pattern": missing_pattern}


def single_step_adaptivity(state: FluidState, nb, dt,
                           params: SimulationParams, split_patterns,
                           partner_fn=None, owned=None, psum=lambda x: x):
    """share every step; merge on even steps, split on odd (simulation.rs:2732-2796).

    step_number was already advanced by single_step_without_adaptivity, matching the
    reference's ordering (time/step advance at simulation.rs:2724-2725).
    partner_fn(state, cls, mode) overrides the list-based matcher (the tile
    backend passes find_partners_tiles so no neighbor lists are ever built).
    owned/psum: slab-sharded hooks — resampling is slab-local (donors AND
    receivers must be owned; edge pairs match inward instead of across the
    boundary), counters and the mass-conservation check reduce globally.
    """
    diag = {}
    own = state.alive if owned is None else (state.alive & owned)
    alive_in = state.alive
    total_mass_1 = psum(jnp.sum(jnp.where(own, state.mass, 0.0)))

    if partner_fn is None:
        def partner_fn(st, cls, mode):
            return _find_partners(st, nb, cls, dt, params, mode)

    if params.sharing:
        cls = classify(state, params)
        partner, cnt, _active = partner_fn(state, cls, "share")
        state = _apply_transfer(state, partner, cnt, dt, params, "share")
        diag["shares"] = psum(jnp.sum(cnt > 0))

    def do_merge(st):
        cls = classify(st, params)
        partner, cnt, _ = partner_fn(st, cls, "merge")
        st2 = _apply_transfer(st, partner, cnt, dt, params, "merge")
        # no compaction: deleted donors become free slots in place (split fills
        # them mask-wise); the reference's swap-to-end + truncate
        # (particle_merging.rs:339-370) exists only because its Vecs are dense
        return (st2.replace(n=psum(jnp.sum(
                    st2.alive if owned is None else (st2.alive & owned)
                )).astype(jnp.int32)),
                psum(jnp.sum(cnt > 0)), jnp.int32(0), jnp.int32(0))

    def do_split(st):
        st2, sdiag = split(st, params, split_patterns,
                           max_splits=_max_splits(st.capacity), owned=owned)
        return (st2, psum(sdiag["splits"]),
                psum(sdiag["split_missing_pattern"]).astype(jnp.int32),
                psum(sdiag["split_deferred"]).astype(jnp.int32))

    def no_op(st):
        return st, jnp.int32(0), jnp.int32(0), jnp.int32(0)

    even = (state.step_number % 2) == 0
    if params.merging and params.splitting:
        state, count, missing, deferred = jax.lax.cond(even, do_merge, do_split, state)
        diag["merge_or_split_count"] = count
    elif params.merging:
        state, count, missing, deferred = jax.lax.cond(even, do_merge, no_op, state)
        diag["merges"] = count
    elif params.splitting:
        state, count, missing, deferred = jax.lax.cond(even, no_op, do_split, state)
        diag["splits"] = count
    if params.splitting:
        # splitting.rs:32-40 panics on a missing pattern iff the flag is set; the
        # runner raises on this counter (clamping to the largest pattern otherwise)
        diag["split_missing_pattern"] = missing
        diag["split_deferred"] = deferred

    if owned is None:
        own2 = state.alive
    else:
        # split children (newly alive rows) are owned by their creator; merged
        # donors left the owned set via the alive mask
        own2 = (own | (state.alive & ~alive_in)) & state.alive
        diag["_owned_after"] = own2
    total_mass_2 = psum(jnp.sum(jnp.where(own2, state.mass, 0.0)))
    diag["mass_conservation_error"] = jnp.abs(total_mass_1 - total_mass_2)
    return state, diag


def _max_splits(capacity: int) -> int:
    return max(64, capacity // 16)


def find_partners_tiles(state: FluidState, tcfg, cls, dt, params, mode: str,
                        origin=None, owned=None):
    """Partner matching on the sorted-tile engine (zero per-edge gathers).

    Same four pair reductions as _find_partners (cnt0, cnt1, donor stand-down,
    receiver assignment), each a SweepOp over a fresh tile build at the
    post-step positions — the adaptive step never touches ops/neighbors.py.
    Pair-set semantics identical to the list path: candidates within
    max_{merge,share}_distance * h_ij (strictly less-or-equal, matched via a
    mask_fn on top of a slightly widened harness radius).

    origin/owned: slab-sharded hooks — the build uses the device's local grid
    origin, and matching is restricted to owned donors AND owned receivers
    (cross-boundary pairs match inward; index priority stays frame-local).
    """
    import jax.numpy as jnp

    from ..ops.pallas_sweeps import NEG_BIG, SweepOp, run_sweep
    from ..ops.tiles import build_tiles, sort_fields, unsort, window_meta
    from . import physics

    C = state.capacity
    idx = jnp.arange(C, dtype=jnp.int32)
    level = _level_or_max_depth(state, params)
    target_mass = optimal_mass_from_level(level, params, dim=2)
    mass_base = params.mass_base(2)
    h_eff = physics.effective_h(state.h, params)

    if mode == "merge":
        donor_class = (cls == SIZE_TOO_SMALL) & state.alive
        max_dist_f = float(params.max_merge_distance)
        dropped = _dropped_mass_merging(level, state.mass, dt, params)
    else:
        donor_class = (cls == SIZE_LARGE) & state.alive
        max_dist_f = float(params.max_share_distance)
        dropped = _dropped_mass_sharing(level, state.mass, dt, params)
    if owned is not None:
        donor_class = donor_class & owned

    bins = build_tiles(state.position, h_eff * jnp.float32(tcfg.mscale), h_eff,
                       state.alive, tcfg, origin=origin)
    sort_cols = [state.position, h_eff, state.mass,
                 cls.astype(jnp.float32), target_mass, dropped,
                 idx.astype(jnp.float32), donor_class.astype(jnp.float32)]
    if owned is not None:
        sort_cols.append(owned.astype(jnp.float32))
    allsorted = sort_fields(bins, sort_cols)
    st = allsorted[:, 0:4]
    wm = window_meta(tcfg, bins, st, origin=origin)
    base_names = ("cls", "target", "dropped", "fidx", "donor") + (
        ("own",) if owned is not None else ()
    )
    dyn_base = allsorted[:, 4:4 + len(base_names)]

    def receiver_ok(d, r):
        """r eligible as receiver of donor d (class rules).

        Static flags gate at trace time; the masks are pure float comparisons
        (Mosaic cannot lower selects over python-bool leaves)."""
        rc = r["cls"]
        if mode == "merge":
            bad = (rc == float(SIZE_LARGE)) | (rc == float(SIZE_TOO_LARGE))
            if not params.allow_merge_with_optimal_particle:
                bad = bad | (rc == float(SIZE_OPTIMAL))
            ok = ~bad
            if params.allow_merge_on_size_difference:
                ok = ok | (r["mass"] > 5.0 * d["mass"])
            return ok
        ok = rc == float(SIZE_SMALL)
        if params.allow_share_with_too_small_particle:
            ok = ok | (rc == float(SIZE_TOO_SMALL))
        if params.allow_share_with_optimal_particle:
            ok = ok | (rc == float(SIZE_OPTIMAL))
        return ok

    def near_mask(q, c, ctx):
        # exact <= max_dist semantics (harness radius is strict <, so the sweep
        # runs at a widened scale and this mask restores the reference bound)
        md = jnp.float32(max_dist_f) * ctx.h_ij
        return ctx.r2 <= md * md

    # the reference only sees pairs inside its 2 h_ij neighbor lists, so a
    # max_*_distance beyond the support radius is clipped by construction
    scale = min(max_dist_f, float(kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH)) * (1.0 + 1e-6)
    mk = dict(mask_fn=near_mask)

    def elig_base_dr(d, r, ctx):
        """d = donor side, r = receiver side; ctx pair mask already applied."""
        not_self = d["fidx"] != r["fidx"]
        ok = (d["donor"] > 0.5) & not_self & receiver_ok(d, r)
        if owned is not None:
            ok = ok & (r["own"] > 0.5)
        return ok

    # pass 1: potential receiver count per donor (q = donor, c = receiver)
    op1 = SweepOp(
        name="adapt_cnt0", n_out=1, dyn_names=base_names,
        emit=lambda q, c, ctx: [elig_base_dr(q, c, ctx).astype(jnp.float32)], **mk,
    )
    cnt0_s = jnp.maximum(run_sweep(tcfg, bins, st, dyn_base, op1, scale, wmeta=wm)[:, 0], 1.0)

    dyn6 = jnp.concatenate([dyn_base, cnt0_s[:, None]], axis=1)

    def elig_full_dr(d, r, ctx):
        new_mass_r = r["mass"] + d["dropped"] / d["cnt0"]
        mass_ok = (new_mass_r < r["target"] * FACTOR_LARGE) & (new_mass_r <= mass_base)
        return elig_base_dr(d, r, ctx) & mass_ok

    op2 = SweepOp(
        name="adapt_cnt1", n_out=1,
        dyn_names=base_names + ("cnt0",),
        emit=lambda q, c, ctx: [elig_full_dr(q, c, ctx).astype(jnp.float32)], **mk,
    )
    cnt1_s = run_sweep(tcfg, bins, st, dyn6, op2, scale, wmeta=wm)[:, 0]
    donor_cand_s = (dyn6[:, 4] > 0.5) & (cnt1_s > 0.5)

    dyn7 = jnp.concatenate([dyn6, donor_cand_s.astype(jnp.float32)[:, None]], axis=1)

    # donor stand-down: q as receiver, c as donor candidate claiming q
    def claimer_edge(q, c, ctx):
        ok = (c["cand"] > 0.5) & elig_full_dr(c, q, ctx)
        return [jnp.where(ok, -c["fidx"], NEG_BIG)]

    op3 = SweepOp(
        name="adapt_claim", n_out=1,
        dyn_names=base_names + ("cnt0", "cand"),
        emit=claimer_edge, reduce="max", fill=NEG_BIG, **mk,
    )
    neg_min_claimer = run_sweep(tcfg, bins, st, dyn7, op3, scale, wmeta=wm)[:, 0]
    min_claimer_s = -neg_min_claimer
    fidx_s = dyn6[:, 3]
    deact = donor_cand_s & (min_claimer_s < fidx_s)
    active_s = donor_cand_s & ~deact

    dyn7b = jnp.concatenate([dyn6, active_s.astype(jnp.float32)[:, None]], axis=1)

    def partner_edge(q, c, ctx):
        ok = (c["cand"] > 0.5) & elig_full_dr(c, q, ctx)
        return [jnp.where(ok, -c["fidx"], NEG_BIG)]

    op4 = SweepOp(
        name="adapt_partner", n_out=1,
        dyn_names=base_names + ("cnt0", "cand"),
        emit=partner_edge, reduce="max", fill=NEG_BIG, **mk,
    )
    neg_partner = run_sweep(tcfg, bins, st, dyn7b, op4, scale, wmeta=wm)[:, 0]

    # fills differ per column: dropped/dead rows must read "no partner" (+BIG
    # after negation) and "not active"
    partner_f = -unsort(bins, neg_partner[:, None], None, NEG_BIG)[:, 0]
    active = (unsort(bins, active_s.astype(jnp.float32)[:, None], None, 0.0)[:, 0]
              > 0.5) & state.alive
    has_partner = (partner_f < -NEG_BIG * 0.5) & state.alive & ~active
    partner = jnp.where(has_partner, partner_f, C).astype(jnp.int32)
    cnt = jnp.zeros(C + 1, jnp.int32).at[partner].add(1)[:C]
    return partner, cnt, active
