"""Whole-solve Jacobi kernels: the relaxed-Jacobi PPE loop in ONE Pallas call.

The streamed design (ops/pallas_matvec.py) re-reads the weight cache from HBM
for every matvec — 11 streams/step at reference semantics — and pays an XLA
fusion/dispatch boundary between each matvec and its elementwise glue. Here the
ENTIRE pressure solve (simulation.rs:1378-1516: sweep, singular/negative
statistics, ≥2-iteration rule, tolerance test, final accel recompute) runs
inside one kernel:

- weight blocks are DMA'd HBM→VMEM ONCE per solve into a resident region of
  R blocks; blocks beyond R stream through the usual double-buffered ring
  (so any cnt ≤ b_max still works, degrading gracefully);
- all per-particle vectors live in VMEM for the whole solve: a read-only
  constants table T and the mutable/output table M, one lane per field —
  lane-packing shares the (C, 128) VMEM padding across all fields instead of
  paying ~C*512 B per separate (C, 1) operand;
- the accel walk reads flat sublane windows of M and emits per-query-tile lane
  accumulators (NT, 8, tq); a per-tile MXU dot-transpose against an 8x8
  identity ((8, tq) x (8, 8) -> (tq, 8)) moves them back to flat sublane
  layout for the elementwise stages — the only lane<->sublane conversion in
  the loop, two tiny dots per tile per iteration;
- convergence logic (avg/max error, normal/negative counts, ≥2 iters,
  max_iters cap) runs on scalars inside the loop; semantics replicate
  models/tile_physics.tile_jacobi exactly.

Two kernels share the machinery (`_solver_parts`):
  jacobi_solve — one pressure solve (any integrator's inner solve);
  hybrid_solve — the WHOLE HybridDFSPH solver section (simulation.rs:2502-2670
    minus integration): divergence source term, divergence solve, velocity
    update, density source term, density solve — weights loaded once per STEP,
    both streamed source-divergence matvecs absorbed.

Single-chip only (the slab-sharded path needs a ppermute ghost refresh between
sweeps, which a kernel cannot issue); gated by params.resident_solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_matvec import GRP, META_SHIFT, NBUF, _lane_width
from .tiles import TILE, default_interpret

# constants-table lanes (read-only during the solve).
# jacobi_solve uses (C, 16), or (C, 20) with src_from_div (velocities + 1/Omega
# in the extension lanes); hybrid_solve uses (C, 20) with the second warm start
# and the initial velocities. Lane-padding to 128 makes the widths free.
T_SRC, T_WAII, T_NSING, T_RINV = 0, 1, 2, 3
T_GXP, T_GYP, T_S1X, T_S1Y = 4, 5, 6, 7
T_BDX, T_BDY, T_ALIVE, T_P0 = 8, 9, 10, 11
T_RHO, T_S2X, T_S2Y = 12, 13, 14
T_LANES = 16
T_P0DIV, T_VX0, T_VY0, T_OMGI = 15, 16, 17, 18
T_LANES_H = 20

# mutable/output-table lanes ((C, 8) for jacobi_solve, (C, 16) for hybrid)
M_P, M_U, M_AX, M_AY, M_TX, M_TY, M_AP, M_PERR = 0, 1, 2, 3, 4, 5, 6, 7
M_LANES = 8
M_VX, M_VY, M_PDIV, M_SRC = 8, 9, 10, 11
M_LANES_H = 16

# stats vector indices (f32 SMEM out); hybrid uses [0..5)=density, [8..13)=div
S_ITERS, S_AVG, S_MAX, S_NORMAL, S_NEG = 0, 1, 2, 3, 4

_VMEM_BUDGET = 100 * 1024 * 1024  # resident region sized to fit under this


def _fixed_vmem(capacity: int, tq: int, wdtype):
    """Non-weight VMEM footprint of the solver kernels + one block's bytes."""
    wbytes = jnp.dtype(wdtype).itemsize
    block = TILE * _lane_width(tq) * wbytes
    nt = capacity // tq
    fixed = (
        2 * capacity * 128 * 4          # T + M tables, both lane-padded to 128
        + 2 * nt * 8 * tq * 4           # OUT_A / OUT_D
        + NBUF * GRP * block            # stream ring
        + (1 << 20)                     # slack (I8, control)
    )
    return fixed, block


def resident_supported(capacity: int, tq: int, wdtype) -> bool:
    """The fixed VMEM footprint (lane-padded T+M tables, walk accumulators,
    stream ring) must leave a usable resident region; very large single-chip
    capacities (~>50k at f32) exceed it and keep the streamed path (the slab
    sharding keeps per-device counts moderate anyway)."""
    fixed, block = _fixed_vmem(capacity, tq, wdtype)
    return fixed + 64 * block <= _VMEM_BUDGET


def resident_blocks(capacity: int, tq: int, b_max: int, wdtype) -> int:
    """Largest resident weight region that keeps total VMEM under budget."""
    import os

    force = os.environ.get("ASPH_RESIDENT_BLOCKS")  # test knob: force a tiny
    if force:                                       # region to hit the tail
        return max(GRP, (int(force) // GRP) * GRP)
    fixed, block = _fixed_vmem(capacity, tq, wdtype)
    r = max(GRP, (_VMEM_BUDGET - fixed) // block)
    return int(min((r // GRP) * GRP, ((b_max + GRP - 1) // GRP) * GRP))


def _solver_parts(cnt_ref, meta_ref, w_hbm, t_ref, m_ref, wres, sbuf,
                  out_a, out_d, i8_ref, sem, psem, *,
                  tq: int, r_blocks: int, b_max: int, w2020: bool, mp: float):
    """Shared machinery: prologue DMA, block walks, transpose/elementwise
    stages, and the Jacobi convergence loop. Returns a dict of callables
    closed over the refs; both kernels compose them."""
    C = m_ref.shape[0]
    NT = C // tq
    B = cnt_ref[0]
    half = _lane_width(tq) // 2
    NG_ALL = (B + GRP - 1) // GRP
    NG_RES = jnp.minimum((jnp.minimum(B, r_blocks) + GRP - 1) // GRP,
                         r_blocks // GRP)
    PQ = psem.shape[0]

    def prologue():
        """Load the resident weight region (one pipelined DMA wave)."""

        def pro_dma(grp):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(grp * GRP, GRP)], wres.at[pl.ds(grp * GRP, GRP)],
                psem.at[jnp.mod(grp, PQ)],
            )

        def pro_start(grp, _):
            @pl.when(grp >= PQ)
            def _():
                pro_dma(grp - PQ).wait()
            pro_dma(grp).start()
            return 0

        jax.lax.fori_loop(0, NG_RES, pro_start, 0, unroll=False)

        def pro_drain(k, _):
            grp = NG_RES - 1 - k
            @pl.when(grp >= 0)
            def _():
                pro_dma(grp).wait()
            return 0

        jax.lax.fori_loop(0, jnp.minimum(NG_RES, PQ), pro_drain, 0,
                          unroll=False)

    def block_math(w, valid, me, acc, cur_qt, in_lanes):
        """One weight block: in_lanes=(u,) accel mode, (tx, ty) div mode."""
        qt_e = me >> META_SHIFT
        an_e = me & ((1 << META_SHIFT) - 1)
        switch = qt_e != cur_qt
        acc = jnp.where(switch, 0.0, acc)
        if w.dtype != jnp.float32:
            w = w.astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, tq), 0)
        if len(in_lanes) == 1:  # accel: out rows 0/1 = (sum wx*u, sum wy*u)
            lu = in_lanes[0]
            tv = m_ref[pl.ds(an_e, TILE), lu:lu + 1]
            prod = w * tv
            ax = jnp.sum(prod[:, 0:tq], axis=0, keepdims=True)
            ay = jnp.sum(prod[:, half:half + tq], axis=0, keepdims=True)
            contrib = jnp.where(row == 0, ax, jnp.where(row == 1, ay, 0.0))
        else:  # div: out row 0 = sum (wx*tx + wy*ty)
            lx, ly = in_lanes
            tvx = m_ref[pl.ds(an_e, TILE), lx:lx + 1]
            tvy = m_ref[pl.ds(an_e, TILE), ly:ly + 1]
            prod = w[:, 0:tq] * tvx + w[:, half:half + tq] * tvy
            c0 = jnp.sum(prod, axis=0, keepdims=True)
            contrib = jnp.where(row == 0, c0, 0.0)
        return acc + jnp.where(valid, contrib, 0.0), qt_e

    def walk(out_ref, in_lanes):
        out_ref[:] = jnp.zeros_like(out_ref)

        def res_group(grp, carry):
            acc, cur_qt = carry
            for g in range(GRP):
                e = grp * GRP + g
                e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
                acc, cur_qt = block_math(
                    wres[jnp.minimum(e_safe, r_blocks - 1)], e < B,
                    meta_ref[e_safe], acc, cur_qt, in_lanes,
                )
                out_ref[cur_qt] = acc
            return acc, cur_qt

        carry0 = (jnp.zeros((8, tq), jnp.float32), meta_ref[0] >> META_SHIFT)

        @pl.when(B > 0)
        def _():
            carry = jax.lax.fori_loop(0, NG_RES, res_group, carry0,
                                      unroll=False)
            if b_max > r_blocks:  # streamed tail for blocks >= r_blocks
                GT0 = r_blocks // GRP

                def get_dma(buf, grp):
                    return pltpu.make_async_copy(
                        w_hbm.at[pl.ds(grp * GRP, GRP)], sbuf.at[buf],
                        sem.at[buf],
                    )

                for k in range(NBUF - 1):
                    @pl.when(GT0 + k < NG_ALL)
                    def _(k=k):
                        get_dma(k, GT0 + k).start()

                def tail_group(i, carry):
                    acc, cur_qt = carry
                    grp = GT0 + i
                    buf = jnp.mod(i, NBUF)

                    @pl.when(grp + NBUF - 1 < NG_ALL)
                    def _():
                        get_dma(jnp.mod(i + NBUF - 1, NBUF),
                                grp + NBUF - 1).start()

                    get_dma(buf, grp).wait()
                    for g in range(GRP):
                        e = grp * GRP + g
                        e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
                        acc, cur_qt = block_math(
                            sbuf[buf, g], e < B, meta_ref[e_safe], acc,
                            cur_qt, in_lanes,
                        )
                        out_ref[cur_qt] = acc
                    return acc, cur_qt

                jax.lax.fori_loop(0, jnp.maximum(NG_ALL - GT0, 0), tail_group,
                                  carry, unroll=False)

    def transpose(x):
        """(8, tq) lane accumulator -> (tq, 8) flat sublanes (MXU dot)."""
        return jax.lax.dot_general(
            x, i8_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def accel_finish(qt, _):
        """mv (lanes) -> flat; axf = -u*s1 - mv + G*coeff; w2020 tx = ax*rinv."""
        ta = transpose(out_a[qt])
        rows = pl.ds(qt * tq, tq)
        p = m_ref[rows, M_P:M_P + 1]
        u = m_ref[rows, M_U:M_U + 1]
        s1x = t_ref[rows, T_S1X:T_S1X + 1]
        s1y = t_ref[rows, T_S1Y:T_S1Y + 1]
        coeff = -(u + jnp.float32(mp) * p)
        ax = -u * s1x - ta[:, 0:1] + t_ref[rows, T_GXP:T_GXP + 1] * coeff
        ay = -u * s1y - ta[:, 1:2] + t_ref[rows, T_GYP:T_GYP + 1] * coeff
        m_ref[rows, M_AX:M_AX + 1] = ax
        m_ref[rows, M_AY:M_AY + 1] = ay
        return 0

    def accel_pass():
        walk(out_a, (M_U,))
        jax.lax.fori_loop(0, NT, accel_finish, 0, unroll=False)

    def div_terms(qt, lx, ly):
        """Finish a div walk for tile qt over value lanes (lx, ly):
        transpose + self terms + boundary. Returns (rows, ap (tq, 1))."""
        td = transpose(out_d[qt])
        rows = pl.ds(qt * tq, tq)
        ax = m_ref[rows, lx:lx + 1]
        ay = m_ref[rows, ly:ly + 1]
        rinv = t_ref[rows, T_RINV:T_RINV + 1]
        bdiv = -(ax * t_ref[rows, T_BDX:T_BDX + 1]
                 + ay * t_ref[rows, T_BDY:T_BDY + 1])
        if w2020:
            ap = (td[:, 0:1]
                  - (ax * t_ref[rows, T_S2X:T_S2X + 1]
                     + ay * t_ref[rows, T_S2Y:T_S2Y + 1]) + bdiv)
        else:
            ap = (td[:, 0:1]
                  - (ax * t_ref[rows, T_S1X:T_S1X + 1]
                     + ay * t_ref[rows, T_S1Y:T_S1Y + 1])) * rinv + bdiv
        return rows, ap

    def div_of(in_val_lanes, finish):
        """Divergence of the field in in_val_lanes (applying the w2020 t=a/rho
        transform), then finish(qt, rows, ap) per tile."""
        lx, ly = in_val_lanes
        if w2020:
            def prep(qt, _):
                rows = pl.ds(qt * tq, tq)
                rinv = t_ref[rows, T_RINV:T_RINV + 1]
                m_ref[rows, M_TX:M_TX + 1] = m_ref[rows, lx:lx + 1] * rinv
                m_ref[rows, M_TY:M_TY + 1] = m_ref[rows, ly:ly + 1] * rinv
                return 0

            if (lx, ly) != (M_TX, M_TY):
                jax.lax.fori_loop(0, NT, prep, 0, unroll=False)
            walk(out_d, (M_TX, M_TY))
        else:
            walk(out_d, (lx, ly))

        def fin(qt, carry):
            rows, ap = div_terms(qt, lx, ly)
            return finish(qt, rows, ap, carry)

        z = jnp.float32(0.0)
        return jax.lax.fori_loop(0, NT, fin, (z, z, z, z), unroll=False)

    def init_pressure(p0_lane):
        def init_tile(qt, _):
            rows = pl.ds(qt * tq, tq)
            p = t_ref[rows, p0_lane:p0_lane + 1]
            rinv = t_ref[rows, T_RINV:T_RINV + 1]
            m_ref[rows, M_P:M_P + 1] = p
            m_ref[rows, M_U:M_U + 1] = p * rinv * rinv
            return 0

        jax.lax.fori_loop(0, NT, init_tile, 0, unroll=False)

    def solve(src_lane, dt, tol, rho0, *, density_type: bool, max_iters: int,
              write_perr: bool):
        """The Jacobi loop (tile_physics.tile_jacobi semantics) + final accel.
        src is read from T lane src_lane (>= T_LANES means an M lane,
        offset-encoded as src_lane - 64)."""
        from_m = src_lane >= 64
        sl = src_lane - 64 if from_m else src_lane
        src_ref = m_ref if from_m else t_ref

        def p_update(qt, rows, ap, carry):
            n_norm, s_pred, mx, n_neg = carry
            m_ref[rows, M_AP:M_AP + 1] = ap
            src = src_ref[rows, sl:sl + 1]
            nsing = t_ref[rows, T_NSING:T_NSING + 1]
            alive = t_ref[rows, T_ALIVE:T_ALIVE + 1]
            rinv = t_ref[rows, T_RINV:T_RINV + 1]
            r = src - ap
            p1 = (m_ref[rows, M_P:M_P + 1]
                  + t_ref[rows, T_WAII:T_WAII + 1] * r) * nsing
            if density_type:
                pred = t_ref[rows, T_RHO:T_RHO + 1] * (dt * dt) * r
            else:
                pred = dt * r
            clamped = p1 <= 0.0
            p2 = jnp.where(clamped, 0.0, p1)
            normal = alive * nsing * jnp.where(clamped, 0.0, 1.0)
            m_ref[rows, M_P:M_P + 1] = p2
            m_ref[rows, M_U:M_U + 1] = p2 * rinv * rinv
            if write_perr:
                m_ref[rows, M_PERR:M_PERR + 1] = pred
            # mask with where (NOT multiplication): 0 * Inf/NaN on a
            # non-normal row would poison the statistics — tile_jacobi uses
            # jnp.where(is_normal, predicted, 0.0) for the same reason
            n_norm = n_norm + jnp.sum(normal)
            s_pred = s_pred + jnp.sum(jnp.where(normal > 0.0, pred, 0.0))
            mx = jnp.maximum(
                mx, jnp.max(jnp.where(normal > 0.0, jnp.abs(pred), 0.0)))
            n_neg = n_neg + jnp.sum(
                alive * nsing * jnp.where(clamped, 1.0, 0.0))
            return n_norm, s_pred, mx, n_neg

        def loop_body(c):
            accel_pass()
            n_norm, s_pred, mx, n_neg = div_of((M_AX, M_AY), p_update)
            avg = jnp.where(n_norm > 0.0, s_pred / jnp.maximum(n_norm, 1.0),
                            jnp.float32(jnp.nan))
            if density_type:
                ok = jnp.abs(avg / rho0) < tol
            else:
                ok = jnp.abs(avg) < tol / dt
            conv = (n_norm == 0.0) | ok
            brk = (conv & (c["iters"] > 1)) | (c["iters"] == max_iters)
            return dict(
                iters=jnp.where(brk, c["iters"], c["iters"] + 1),
                done=brk, avg=avg, max=mx, normal=n_norm, negative=n_neg,
            )

        out = jax.lax.while_loop(
            lambda c: ~c["done"],
            loop_body,
            dict(iters=jnp.int32(0), done=jnp.bool_(False),
                 avg=jnp.float32(0.0), max=jnp.float32(0.0),
                 normal=jnp.float32(0.0), negative=jnp.float32(0.0)),
        )

        accel_pass()  # final pressure accel from the converged p (rs:1499)
        return out

    def write_stats(stats_ref, out, off):
        stats_ref[off + S_ITERS] = out["iters"].astype(jnp.float32)
        stats_ref[off + S_AVG] = out["avg"]
        stats_ref[off + S_MAX] = out["max"]
        stats_ref[off + S_NORMAL] = out["normal"]
        stats_ref[off + S_NEG] = out["negative"]

    return dict(prologue=prologue, walk=walk, accel_pass=accel_pass,
                div_of=div_of, init_pressure=init_pressure, solve=solve,
                write_stats=write_stats, NT=NT)


def _jacobi_kernel(cnt_ref, meta_ref, scal_ref, w_hbm, t_ref, m_ref, stats_ref,
                   wres, sbuf, out_a, out_d, i8_ref, sem, psem, *,
                   tq: int, r_blocks: int, b_max: int, w2020: bool,
                   density_type: bool, max_iters: int, mp: float,
                   write_perr: bool, src_from_div: bool):
    i8_ref[:] = jnp.eye(8, dtype=jnp.float32)
    P = _solver_parts(cnt_ref, meta_ref, w_hbm, t_ref, m_ref, wres, sbuf,
                      out_a, out_d, i8_ref, sem, psem, tq=tq,
                      r_blocks=r_blocks, b_max=b_max, w2020=w2020, mp=mp)
    NT = P["NT"]
    dt, tol, rho0 = scal_ref[0], scal_ref[1], scal_ref[2]

    P["prologue"]()
    P["init_pressure"](T_P0)

    def init_rest(qt, _):
        rows = pl.ds(qt * tq, tq)
        m_ref[rows, M_PERR:M_PERR + 1] = jnp.zeros((tq, 1), jnp.float32)
        if src_from_div:
            m_ref[rows, M_VX:M_VX + 1] = t_ref[rows, T_VX0:T_VX0 + 1]
            m_ref[rows, M_VY:M_VY + 1] = t_ref[rows, T_VY0:T_VY0 + 1]
        return 0

    jax.lax.fori_loop(0, NT, init_rest, 0, unroll=False)

    if src_from_div:
        # src = T_SRC - div(v) * (1/Omega) / dt — covers IISPH
        # (simulation.rs:1712-1748), IISPH2 (/Omega, :2346) and OnlyDivergence
        # (T_SRC = 0, :1633-1659) without a separate streamed matvec
        def src_store(qt, rows, ap, carry):
            m_ref[rows, M_SRC:M_SRC + 1] = (
                t_ref[rows, T_SRC:T_SRC + 1]
                - ap * t_ref[rows, T_OMGI:T_OMGI + 1] / dt)
            return carry

        P["div_of"]((M_VX, M_VY), src_store)
        src_lane = 64 + M_SRC
    else:
        src_lane = T_SRC

    out = P["solve"](src_lane, dt, tol, rho0, density_type=density_type,
                     max_iters=max_iters, write_perr=write_perr)
    P["write_stats"](stats_ref, out, 0)
    for k in range(5, 8):
        stats_ref[k] = jnp.float32(0.0)


def jacobi_solve(weights, meta, cnt, table, scal, tq: int, *, b_max: int,
                 w2020: bool, density_type: bool, max_iters: int, mp: float,
                 write_perr: bool = True, src_from_div: bool = False,
                 interpret=None):
    """Run a whole pressure solve in one kernel.

    table: (C, 16) f32 constants (lane layout above), or (C, 20) with
    src_from_div (T_SRC holds the velocity-independent source part; the kernel
    computes src = T_SRC - div(v0)*T_OMGI/dt itself, absorbing the caller's
    streamed source matvec). scal: (4,) f32 [dt, tol, rest_density, 0].
    Returns (M (C, 16) f32, stats (8,) f32)."""
    C = table.shape[0]
    NT = C // tq
    if interpret is None:
        interpret = default_interpret()
    r_blocks = resident_blocks(C, tq, b_max, weights.dtype)
    kern = functools.partial(
        _jacobi_kernel, tq=tq, r_blocks=r_blocks, b_max=b_max, w2020=w2020,
        density_type=density_type, max_iters=int(max_iters), mp=float(mp),
        write_perr=write_perr, src_from_div=src_from_div,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # cnt, meta, scal
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # weights in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # constants table
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),  # M
            pl.BlockSpec(memory_space=pltpu.SMEM),  # stats
        ),
        scratch_shapes=[
            pltpu.VMEM((r_blocks, TILE, _lane_width(tq)), weights.dtype),
            pltpu.VMEM((NBUF, GRP, TILE, _lane_width(tq)), weights.dtype),
            pltpu.VMEM((NT, 8, tq), jnp.float32),
            pltpu.VMEM((NT, 8, tq), jnp.float32),
            pltpu.VMEM((8, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    m, stats = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((C, M_LANES_H), jnp.float32),
            jax.ShapeDtypeStruct((8,), jnp.float32),
        ),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(cnt, meta, scal, weights, table)
    return m, stats


def _hybrid_kernel(cnt_ref, meta_ref, scal_ref, w_hbm, t_ref, m_ref, stats_ref,
                   wres, sbuf, out_a, out_d, i8_ref, sem, psem, *,
                   tq: int, r_blocks: int, b_max: int, w2020: bool,
                   max_iters: int, mp: float, den_with_div: bool):
    """The whole HybridDFSPH solver section (simulation.rs:2502-2670 minus
    integration): src_div = -div(v)/dt; divergence solve; v += dt*a;
    src_den = src0 [- div(v)/dt]; density solve. scal = [dt, tol_div,
    tol_den, rho0]."""
    i8_ref[:] = jnp.eye(8, dtype=jnp.float32)
    P = _solver_parts(cnt_ref, meta_ref, w_hbm, t_ref, m_ref, wres, sbuf,
                      out_a, out_d, i8_ref, sem, psem, tq=tq,
                      r_blocks=r_blocks, b_max=b_max, w2020=w2020, mp=mp)
    NT = P["NT"]
    dt = scal_ref[0]
    tol_div = scal_ref[1]
    tol_den = scal_ref[2]
    rho0 = scal_ref[3]

    P["prologue"]()

    # init: velocities into M, divergence-solve warm start, clear perr
    def init_tile(qt, _):
        rows = pl.ds(qt * tq, tq)
        m_ref[rows, M_VX:M_VX + 1] = t_ref[rows, T_VX0:T_VX0 + 1]
        m_ref[rows, M_VY:M_VY + 1] = t_ref[rows, T_VY0:T_VY0 + 1]
        m_ref[rows, M_PERR:M_PERR + 1] = jnp.zeros((tq, 1), jnp.float32)
        return 0

    jax.lax.fori_loop(0, NT, init_tile, 0, unroll=False)
    P["init_pressure"](T_P0DIV)

    # divergence source: src = -div(v)/dt (simulation.rs:1633-1659 via the
    # same discretized divergence operator)
    def src_store(qt, rows, ap, carry):
        m_ref[rows, M_SRC:M_SRC + 1] = -ap / dt
        return carry

    P["div_of"]((M_VX, M_VY), src_store)

    out_div = P["solve"](64 + M_SRC, dt, tol_div, rho0, density_type=False,
                         max_iters=max_iters, write_perr=False)
    P["write_stats"](stats_ref, out_div, 8)

    # v += dt * a_div; stash the divergence pressure; re-init for density
    def v_update(qt, _):
        rows = pl.ds(qt * tq, tq)
        m_ref[rows, M_VX:M_VX + 1] = (m_ref[rows, M_VX:M_VX + 1]
                                      + dt * m_ref[rows, M_AX:M_AX + 1])
        m_ref[rows, M_VY:M_VY + 1] = (m_ref[rows, M_VY:M_VY + 1]
                                      + dt * m_ref[rows, M_AY:M_AY + 1])
        m_ref[rows, M_PDIV:M_PDIV + 1] = m_ref[rows, M_P:M_P + 1]
        return 0

    jax.lax.fori_loop(0, NT, v_update, 0, unroll=False)
    P["init_pressure"](T_P0)

    # density source (simulation.rs:1661-1748): the density part arrives
    # precomputed in T_SRC; DensityAndDivergence subtracts div(v)/dt
    if den_with_div:
        def src2_store(qt, rows, ap, carry):
            m_ref[rows, M_SRC:M_SRC + 1] = (
                t_ref[rows, T_SRC:T_SRC + 1] - ap / dt)
            return carry

        P["div_of"]((M_VX, M_VY), src2_store)
    else:
        def src2_copy(qt, _):
            rows = pl.ds(qt * tq, tq)
            m_ref[rows, M_SRC:M_SRC + 1] = t_ref[rows, T_SRC:T_SRC + 1]
            return 0

        jax.lax.fori_loop(0, NT, src2_copy, 0, unroll=False)

    out_den = P["solve"](64 + M_SRC, dt, tol_den, rho0, density_type=True,
                         max_iters=max_iters, write_perr=True)
    P["write_stats"](stats_ref, out_den, 0)
    for k in (5, 6, 7, 13, 14, 15):
        stats_ref[k] = jnp.float32(0.0)


def hybrid_solve(weights, meta, cnt, table, scal, tq: int, *, b_max: int,
                 w2020: bool, max_iters: int, mp: float, den_with_div: bool,
                 interpret=None):
    """Whole HybridDFSPH solver section in one kernel.

    table: (C, 20) f32 (lanes above; T_SRC carries the precomputed density
    source part, T_P0DIV/T_P0 the two warm starts, T_VX0/T_VY0 the
    post-first-kick velocities). scal: (4,) [dt, tol_div, tol_den, rho0].
    Returns (M (C, 16), stats (16,)): M carries the density pressure (M_P),
    its error (M_PERR), final accel (M_AX/M_AY), post-div-solve velocities
    (M_VX/M_VY), the divergence pressure (M_PDIV) and the density source
    (M_SRC); stats[0:5] density solve, stats[8:13] divergence solve."""
    C = table.shape[0]
    NT = C // tq
    if interpret is None:
        interpret = default_interpret()
    r_blocks = resident_blocks(C, tq, b_max, weights.dtype)
    kern = functools.partial(
        _hybrid_kernel, tq=tq, r_blocks=r_blocks, b_max=b_max, w2020=w2020,
        max_iters=int(max_iters), mp=float(mp), den_with_div=den_with_div,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((r_blocks, TILE, _lane_width(tq)), weights.dtype),
            pltpu.VMEM((NBUF, GRP, TILE, _lane_width(tq)), weights.dtype),
            pltpu.VMEM((NT, 8, tq), jnp.float32),
            pltpu.VMEM((NT, 8, tq), jnp.float32),
            pltpu.VMEM((8, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    m, stats = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((C, M_LANES_H), jnp.float32),
            jax.ShapeDtypeStruct((16,), jnp.float32),
        ),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(cnt, meta, scal, weights, table)
    return m, stats
