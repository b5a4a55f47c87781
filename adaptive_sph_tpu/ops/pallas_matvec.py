"""Weight-cached PPE operator: build once per step, stream per Jacobi iteration.

Within one pressure solve the geometry is frozen, so the pair weights
w_ij = m_j * grad W_ij (the only pair term in both Jacobi sweeps,
simulation.rs:1207-1322) are computed ONCE by a builder kernel and streamed back by
lean matvec kernels each iteration:

  accel_i = -(p_i/rho_i^2) * S1_i - sum_j w_ij u_j + boundary(p_i),  u_j = p_j/rho_j^2
  div_i   = scale_i * (sum_j w_ij . t_j - a_i . S_i) + boundary(a_i)
            t_j = a_j (Consistent*) or a_j/rho_j (Winchenbach2020)

with S1/S2 the per-particle gradient sums from the fused prep sweep
(models/tile_physics.py).

Block layout (v2): one block per (query tile x candidate row-window), ANCHORED at
the window start instead of 64-aligned chunks — fewer, denser blocks — and stored
TRANSPOSED as (64 candidate sublanes, 2*TQ query lanes) = [wx | wy]. The matvec
kernels then run transpose-free: value windows are dynamic sublane slices of the
flat (C, k) sorted table, reductions go over sublanes, outputs land in (NT, k, TQ).
Blocks are tile-major; outputs accumulate in registers with unconditional
progressive stores (branch-free bodies — conditional flushes serialized the
unrolled DMA group and cost 2.2x).

v7 SCALAR blocks (the round-5 default at tq=128): a block stores only the
scalar pair weight g = m_j * gmag as (2*TILE candidate sublanes, TQ query
lanes); the directional factors dx = qx - cx, dy = qy - cy are reconstructed
IN-KERNEL from the statics table (candidate side: dynamic sublane slice of the
per-step (C, F) sorted statics; query side: the (NT, F, TQ) channels-first
tile view) — both already materialized per step. This HALVES the streamed
bytes per block AND doubles the window height (128 vs 64 candidates), cutting
the per-block fixed cost share (probe 2026-08-19, bench scene, bf16: 0.032 ->
0.025 ms/stream, 29.1 -> 19.5 MB, 887 -> 595 blocks; WH=64 and WH=256 both
measured slower). In f32 the reconstruction is BIT-IDENTICAL to the stored
[wx|wy] form: g*(qx-cx) uses the same f32 inputs and ops as the builder did.
The legacy 2-channel format remains for tq < 128 (lane width must be >= 128)
and for the resident-solver path (ops/pallas_jacobi.py consumes it).

Exactness: identical pair set and weights as the direct sweeps; only f32
association order differs (differentially tested in tests/test_tile_engine.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels
from .tiles import (TILE, WM_STRIDE, TileBins, TileConfig, to_cand, to_chunks,
                    window_meta, default_interpret)

NBUF = 4   # DMA pipeline depth (group-sized copies)
GRP = 8    # weight blocks per DMA / per loop iteration (statically unrolled)
META_SHIFT = 18  # block meta packs (tile << META_SHIFT) | anchor into one int32
                 # (anchor < capacity <= 2^18; halves the SMEM meta footprint)


def _lane_width(tq: int) -> int:
    """Lane width of a weight block: [wx | wy] padded so Mosaic DMA slices stay
    128-lane aligned (tq < 64 would otherwise make the lane dim 2*tq < 128)."""
    return max(2 * tq, 128)


def _nt_pad(nt: int) -> int:
    """Matvec output tile rows, padded up to the 8-sublane store granularity.

    The matvec kernels flush their accumulators with unconditional 8-aligned
    dynamic stores `out_ref[k, pl.ds(g8*8, 8), :]` (the final store per 8-tile
    group wins); an output with NT not a multiple of 8 (small capacities, e.g.
    capacity 512 @ tq=128 -> NT=4, the capacity-growth path of
    splitting.rs:56-58's Vec::extend analogue) would make that store
    out-of-bounds, so the output is allocated at the padded row count and the
    wrappers slice the unpack."""
    return max(8, -(-nt // 8) * 8)


def _gmag(r2, h_ij):
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    q = r / (2.0 * h_ij)
    mag = (
        kernels.kernel_norm_factor(h_ij, 2)
        * kernels.cubic_kernel_unnormalized_deriv(q)
        / (2.0 * h_ij)
    )
    return jnp.where(q > 1.0e-5, mag / r, 0.0)


def _w_and_gmag(r2, h_ij):
    """Kernel value W and gradient magnitude factor, sharing norm/q terms."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    q = r / (2.0 * h_ij)
    norm = kernels.kernel_norm_factor(h_ij, 2)
    w = norm * kernels.cubic_kernel_unnormalized(q)
    mag = norm * kernels.cubic_kernel_unnormalized_deriv(q) / (2.0 * h_ij)
    return w, jnp.where(q > 1.0e-5, mag / r, 0.0)


def _build_kernel(starts_ref, wmeta_ref, sq_ref, sc_ref, w_hbm, meta_ref,
                  cnt_ref, scratch, sem, *, cfg: TileConfig, scale: float, b_max: int):
    TQ = cfg.tq
    NL = len(cfg.populated)
    C = cfg.capacity

    def tile_body(t, carry):
        qs = sq_ref[t]  # (F, TQ) channels-first queries
        qx = qs[0:1, :]
        qy = qs[1:2, :]
        qh = qs[2:3, :]
        qvalid = qh > 0.0

        def window_work(a, lo_k, hi_k, carry):
            """One anchored 64-wide candidate window; exact range [lo_k, hi_k)."""
            slot, attempted = carry
            cand = sc_ref[pl.ds(a, TILE), :]  # (64, F) candidate sublanes
            cx = cand[:, 0:1]
            cy = cand[:, 1:2]
            ch = cand[:, 2:3]
            cm = cand[:, 3:4]
            col = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0) + a
            h_ij = jnp.maximum(0.5 * (qh + ch), 1e-6)
            dx = qx - cx  # (64, TQ)
            dy = qy - cy
            r2 = dx * dx + dy * dy
            rad = jnp.float32(scale) * h_ij
            valid = (
                (col >= lo_k) & (col < hi_k) & (r2 < rad * rad) & (ch > 0.0) & qvalid
            )
            g = jnp.where(valid, cm * _gmag(r2, h_ij), 0.0)
            nonempty = jnp.any(valid)
            emit = nonempty & (slot < b_max)

            @pl.when(emit)
            def _():
                buf = jnp.mod(slot, 2)

                @pl.when(slot >= 2)
                def _():
                    pltpu.make_async_copy(
                        scratch.at[buf], w_hbm.at[jnp.maximum(slot - 2, 0)], sem.at[buf]
                    ).wait()

                half = _lane_width(TQ) // 2
                scratch[buf, :, 0:TQ] = (g * dx).astype(scratch.dtype)
                scratch[buf, :, half:half + TQ] = (g * dy).astype(scratch.dtype)
                pltpu.make_async_copy(
                    scratch.at[buf], w_hbm.at[slot], sem.at[buf]
                ).start()
                meta_ref[slot] = (t << META_SHIFT) + a

            return (slot + emit.astype(jnp.int32),
                    attempted + nonempty.astype(jnp.int32))

        def level_block(li, carry):
            mbase = (t * NL + li) * WM_STRIDE
            cnt = wmeta_ref[mbase]

            def range_body(r, carry):
                lo = starts_ref[wmeta_ref[mbase + 1 + 2 * r]]
                hi = starts_ref[wmeta_ref[mbase + 2 + 2 * r]]
                # anchors are aligned down to the 8-sublane granularity Mosaic
                # requires for dynamic sublane slices; [lo_k, hi_k) masks exactly
                a0 = (lo // 8) * 8
                nwin = jnp.where(hi > lo, (hi - a0 + TILE - 1) // TILE, 0)

                def win_body(k, carry):
                    a = jnp.minimum(a0 + k * TILE, C - TILE)
                    lo_k = jnp.maximum(a0 + k * TILE, lo)
                    hi_k = jnp.minimum(hi, a0 + (k + 1) * TILE)
                    return window_work(a, lo_k, hi_k, carry)

                return jax.lax.fori_loop(0, nwin, win_body, carry, unroll=False)

            return jax.lax.fori_loop(0, cnt, range_body, carry, unroll=False)

        for li in range(NL):
            carry = level_block(li, carry)
        return carry

    NT = cfg.capacity // TQ
    slot, attempted = jax.lax.fori_loop(
        0, NT, tile_body, (jnp.int32(0), jnp.int32(0)), unroll=False
    )

    @pl.when(slot >= 1)
    def _():
        pltpu.make_async_copy(
            scratch.at[jnp.mod(slot - 1, 2)], w_hbm.at[slot - 1],
            sem.at[jnp.mod(slot - 1, 2)],
        ).wait()

    @pl.when(slot >= 2)
    def _():
        pltpu.make_async_copy(
            scratch.at[jnp.mod(slot - 2, 2)], w_hbm.at[slot - 2],
            sem.at[jnp.mod(slot - 2, 2)],
        ).wait()

    cnt_ref[0] = slot
    cnt_ref[1] = attempted - slot  # dropped blocks (b_max overflow)


def build_weight_cache(cfg: TileConfig, bins: TileBins, statics_sorted, scale: float,
                       b_max: int, wmeta=None, interpret=None):
    assert cfg.capacity <= (1 << META_SHIFT) and cfg.capacity // cfg.tq < (1 << 13)
    """Returns (weights (b_max, 64, 2*TQ) f32 HBM, (qt, anchor) meta, cnt (2,))."""
    assert b_max % GRP == 0, "b_max must be a multiple of the matvec DMA group"
    TQ = cfg.tq
    sq = jnp.swapaxes(to_chunks(statics_sorted, TQ), 1, 2)  # (NT, F, TQ)
    sc = statics_sorted  # (C, F) flat candidate table
    if wmeta is None:
        wmeta = window_meta(cfg, bins, statics_sorted)
    if interpret is None:
        interpret = default_interpret()

    kern = functools.partial(_build_kernel, cfg=cfg, scale=float(scale), b_max=b_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # weights stay in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TILE, _lane_width(TQ)), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    w, meta, cnt = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_max, TILE, _lane_width(TQ)), jnp.float32),
            jax.ShapeDtypeStruct((b_max,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(100 * 1024 * 1024 if cfg.capacity > 16384 else None),
        ),
    )(bins.cell_starts, wmeta, sq, sc)
    return w, meta, cnt


def _matvec_kernel(cnt_ref, meta_ref, w_hbm, t_ref, *rest,
                   tq: int, k_in: int, k_out: int,
                   precision=jax.lax.Precision.HIGHEST):
    """Stream weight blocks in groups of GRP; out[qt] = sublane dots over candidates.

    k_in=1, k_out=2: accel mode — out = (sum wx*u, sum wy*u)
    k_in=2, k_out=1: div mode   — out = sum (wx*tx + wy*ty); tx/ty arrive as
      TWO separate (C, 1) operands so the caller never materializes an
      interleaved (C, 2) table (the jnp.stack relayout + its 128-lane padding
      cost more than the whole weight stream)
    """
    if k_in == 2:
        t2_ref, out_ref, scratch, sem = rest
    else:
        (out_ref, scratch, sem), t2_ref = rest, None
    B = cnt_ref[0]
    NG = (B + GRP - 1) // GRP
    out_ref[:] = jnp.zeros_like(out_ref)

    def get_dma(buf, grp):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(grp * GRP, GRP)], scratch.at[buf], sem.at[buf]
        )

    for k in range(NBUF - 1):
        @pl.when(k < NG)
        def _(k=k):
            get_dma(k, k).start()

    # register accumulation, tile-major blocks. The accumulator holds EIGHT
    # consecutive tiles (one per sublane row) per output channel, flushed with
    # an unconditional 8-aligned dynamic store every block (the final store
    # per 8-tile group wins). Output is CHANNEL-MAJOR (k_out, NT, tq): channel
    # k unpacks as out[k].reshape(C) with a FREE bitcast — the old (NT, 8, tq)
    # channel-on-sublane layout made out[:, k, :] a strided T(1,128) relayout
    # that profiled at ~114 us/step inside the solver loop.
    acc0 = jnp.zeros((8, tq), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, tq), 0)

    def body(grp, carry):
        accA, accB, cur_g8 = carry
        buf = jnp.mod(grp, NBUF)

        @pl.when(grp + NBUF - 1 < NG)
        def _():
            get_dma(jnp.mod(grp + NBUF - 1, NBUF), grp + NBUF - 1).start()

        get_dma(buf, grp).wait()
        for g in range(GRP):
            e = grp * GRP + g
            e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
            valid = e < B
            me = meta_ref[e_safe]
            qt_e = me >> META_SHIFT
            an_e = me & ((1 << META_SHIFT) - 1)
            g8 = qt_e >> 3
            switch = g8 != cur_g8
            accA = jnp.where(switch, 0.0, accA)
            accB = jnp.where(switch, 0.0, accB)
            cur_g8 = g8
            rowmask = (row == (qt_e & 7)) & valid

            half = _lane_width(tq) // 2
            w = scratch[buf, g]  # (64, LW) = [wx | pad | wy | pad], cands on sublanes
            if w.dtype != jnp.float32:  # bf16-stored blocks compute in f32
                w = w.astype(jnp.float32)
            if k_out == 2:  # k_in == 1: out = [sum wx*u | sum wy*u]
                # VPU broadcast-multiply + sublane tree-reduce beats the MXU
                # dot at this shape (measured 70 vs 134 ns/block — the dot's
                # issue cost exceeds the 64x128 elementwise work); the kernel
                # is then DMA-bound (scripts/matvec_probe.py)
                tv = t_ref[pl.ds(an_e, TILE), :]  # (64, 1)
                prod = w * tv
                ax = jnp.sum(prod[:, 0:tq], axis=0, keepdims=True)
                ay = jnp.sum(prod[:, half:half + tq], axis=0, keepdims=True)
                accA = accA + jnp.where(rowmask, ax, 0.0)
                accB = accB + jnp.where(rowmask, ay, 0.0)
            else:  # k_in == 2: sum wx*tx + wy*ty on the VPU from split operands
                tvx = t_ref[pl.ds(an_e, TILE), :]   # (64, 1)
                tvy = t2_ref[pl.ds(an_e, TILE), :]  # (64, 1)
                prod = w[:, 0:tq] * tvx + w[:, half:half + tq] * tvy
                c0 = jnp.sum(prod, axis=0, keepdims=True)
                accA = accA + jnp.where(rowmask, c0, 0.0)
            base = g8 * 8
            out_ref[0, pl.ds(base, 8), :] = accA
            if k_out == 2:
                out_ref[1, pl.ds(base, 8), :] = accB

        return accA, accB, cur_g8

    @pl.when(B > 0)
    def _():
        jax.lax.fori_loop(
            0, NG, body, (acc0, acc0, (meta_ref[0] >> META_SHIFT) >> 3),
            unroll=False)


def weight_matvec(weights, meta, cnt, t_sorted, tq: int, k_out: int,
                  interpret=None, statics=None, sq=None):
    """meta = packed (tile << META_SHIFT) | anchor from the builders.

    t_sorted: flat (C, k_in) values in SORTED order. Returns CHANNEL-MAJOR 1-D
    arrays: a (C,) array for k_out=1, a tuple (out_x (C,), out_y (C,)) for
    k_out=2. The kernel's (k_out, NT, TQ) output reshapes to (C,) per channel
    with a FREE bitcast (channel-major regions are contiguous; T(8,128) over
    the trailing dims is bit-identical to the flat T(1024) layout), and 1-D
    f32 arrays tile DENSE on the VPU — the old interleaved (C, 2) form tiled
    as (8, 128) with 2/128 lanes used, which made every downstream elementwise
    fusion run at <2% lane efficiency (profiled at 40-90 us per trivial chain).

    statics/sq: pass the per-step sorted statics table (C, F) and its
    channels-first tile view (NT, F, TQ) to consume SCALAR-g blocks (v7,
    weights shaped (b_max, WH, tq)); omit for legacy [wx|wy] blocks.
    """
    if statics is not None:
        return _scalar_weight_matvec(weights, meta, cnt, t_sorted, tq, k_out,
                                     statics, sq, interpret)
    if isinstance(t_sorted, tuple):
        # div mode, channel-split: two (C,) operands, no (C, 2) interleave
        tx, ty = t_sorted
        C = tx.shape[0]
        t_ops = [tx[:, None], ty[:, None]]
        k_in = 2
    else:
        C = t_sorted.shape[0]
        if t_sorted.ndim == 1:
            t_sorted = t_sorted[:, None]
        k_in = t_sorted.shape[1]
        if k_in == 2:
            t_ops = [t_sorted[:, 0:1], t_sorted[:, 1:2]]
        else:
            t_ops = [t_sorted]
    NT = C // tq
    NTP = _nt_pad(NT)  # 8-sublane store granularity (see _nt_pad)
    if interpret is None:
        interpret = default_interpret()

    kern = functools.partial(_matvec_kernel, tq=tq, k_in=k_in, k_out=k_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]  # weights in HBM
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(t_ops),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, GRP, TILE, _lane_width(tq)), weights.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_out, NTP, tq), jnp.float32),
        interpret=bool(interpret),
        # each flat value table lane-pads (C, 1) to (C, 128) in VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 * 1024 * 1024 if C > 16384 else None)
        ),
    )(cnt, meta, weights, *t_ops)
    if k_out == 1:
        return out[0].reshape(NTP * tq)[:C]
    return out[0].reshape(NTP * tq)[:C], out[1].reshape(NTP * tq)[:C]


def _scalar_weight_matvec(weights, meta, cnt, t_sorted, tq, k_out, statics,
                          sq, interpret=None):
    """Scalar-g block matvec (see weight_matvec); t as in the legacy form."""
    assert weights.shape[1] == WH and weights.shape[2] == tq, weights.shape
    if isinstance(t_sorted, tuple):
        tx, ty = t_sorted
        C = tx.shape[0]
        t_ops = [tx[:, None], ty[:, None]]
    else:
        C = t_sorted.shape[0]
        if t_sorted.ndim == 1:
            t_sorted = t_sorted[:, None]
        t_ops = [t_sorted]
    NT = C // tq
    NTP = _nt_pad(NT)
    if interpret is None:
        interpret = default_interpret()

    kern = functools.partial(_scalar_matvec_kernel, tq=tq, k_out=k_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]  # blocks in HBM
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(t_ops)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, GRP, WH, tq), weights.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k_out, NTP, tq), jnp.float32),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 * 1024 * 1024 if C > 16384 else None)
        ),
    )(cnt, meta, weights, statics, sq, *t_ops)
    if k_out == 1:
        return out[0].reshape(NTP * tq)[:C]
    return out[0].reshape(NTP * tq)[:C], out[1].reshape(NTP * tq)[:C]


def _scalar_visc_matvec(vweights, meta, cnt, rho_sorted, tq, statics, sq,
                        interpret=None):
    C = rho_sorted.shape[0]
    NT = C // tq
    NTP = _nt_pad(NT)
    if interpret is None:
        interpret = default_interpret()
    rf = rho_sorted[:, None]
    rl = rho_sorted.reshape(NT, tq)

    kern = functools.partial(_scalar_visc_kernel, tq=tq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, GRP, WH, tq), vweights.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, NTP, tq), jnp.float32),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 * 1024 * 1024 if C > 16384 else None)
        ),
    )(cnt, meta, vweights, statics, sq, rf, rl)
    return out[0].reshape(NTP * tq)[:C], out[1].reshape(NTP * tq)[:C]


WH = 2 * TILE  # scalar-block window height (candidate sublanes per block)


def scalar_blocks_supported(tq: int) -> bool:
    """Scalar-g blocks need the query-lane dim to be a full 128-lane vreg
    (blocks are (WH, tq)); production `_tile_tq` always picks 128."""
    return tq == 128


def _scalar_matvec_kernel(cnt_ref, meta_ref, w_hbm, sc_ref, sq_ref, t_ref,
                          *rest, tq: int, k_out: int):
    """Stream scalar-g blocks; reconstruct wx/wy from the statics in-kernel.

    k_out=2 (accel): t = u (C, 1);     out = (sum g*dx*u, sum g*dy*u)
    k_out=1 (div):   t, t2 = tx, ty;   out = sum (g*dx)*tx + (g*dy)*ty

    f32 bit-exactness with the legacy [wx|wy] blocks: wx = w * (qx - cx) uses
    the same f32 inputs (statics table / channels-first tile view) and the
    same ops the builder used to form its stored wx, so the products and the
    per-block partial sums match the legacy kernel's inputs exactly.
    """
    if k_out == 1:
        t2_ref, out_ref, scratch, sem = rest
    else:
        (out_ref, scratch, sem), t2_ref = rest, None
    B = cnt_ref[0]
    NG = (B + GRP - 1) // GRP
    out_ref[:] = jnp.zeros_like(out_ref)

    def get_dma(buf, g):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(g * GRP, GRP)], scratch.at[buf], sem.at[buf]
        )

    for k in range(NBUF - 1):
        @pl.when(k < NG)
        def _(k=k):
            get_dma(k, k).start()

    acc0 = jnp.zeros((8, tq), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, tq), 0)

    def body(grp_i, carry):
        accA, accB, cur_g8 = carry
        buf = jnp.mod(grp_i, NBUF)

        @pl.when(grp_i + NBUF - 1 < NG)
        def _():
            get_dma(jnp.mod(grp_i + NBUF - 1, NBUF), grp_i + NBUF - 1).start()

        get_dma(buf, grp_i).wait()
        for g in range(GRP):
            e = grp_i * GRP + g
            e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
            valid = e < B
            me = meta_ref[e_safe]
            qt_e = me >> META_SHIFT
            an_e = me & ((1 << META_SHIFT) - 1)
            g8 = qt_e >> 3
            switch = g8 != cur_g8
            accA = jnp.where(switch, 0.0, accA)
            accB = jnp.where(switch, 0.0, accB)
            cur_g8 = g8
            rowmask = (row == (qt_e & 7)) & valid

            w = scratch[buf, g]  # (WH, tq) scalar g, cands on sublanes
            if w.dtype != jnp.float32:
                w = w.astype(jnp.float32)
            cs = sc_ref[pl.ds(an_e, WH), :]  # (WH, F) candidate statics
            qs = sq_ref[qt_e]  # (F, tq) query statics, channels-first
            wx = w * (qs[0:1, :] - cs[:, 0:1])
            wy = w * (qs[1:2, :] - cs[:, 1:2])
            if k_out == 2:
                tv = t_ref[pl.ds(an_e, WH), :]  # (WH, 1)
                ax = jnp.sum(wx * tv, axis=0, keepdims=True)
                ay = jnp.sum(wy * tv, axis=0, keepdims=True)
                accA = accA + jnp.where(rowmask, ax, 0.0)
                accB = accB + jnp.where(rowmask, ay, 0.0)
            else:
                tvx = t_ref[pl.ds(an_e, WH), :]
                tvy = t2_ref[pl.ds(an_e, WH), :]
                c0 = jnp.sum(wx * tvx + wy * tvy, axis=0, keepdims=True)
                accA = accA + jnp.where(rowmask, c0, 0.0)
            base = g8 * 8
            out_ref[0, pl.ds(base, 8), :] = accA
            if k_out == 2:
                out_ref[1, pl.ds(base, 8), :] = accB

        return accA, accB, cur_g8

    @pl.when(B > 0)
    def _():
        jax.lax.fori_loop(
            0, NG, body, (acc0, acc0, (meta_ref[0] >> META_SHIFT) >> 3),
            unroll=False)


def _scalar_visc_kernel(cnt_ref, meta_ref, w_hbm, sc_ref, sq_ref, rf_ref,
                        rl_ref, out_ref, scratch, sem, *, tq: int):
    """Scalar visc blocks [B*g]; per pair apply dx/dy (statics) and the
    deferred 1/(rho_i + rho_j) (rho in flat + lane-major layouts)."""
    B = cnt_ref[0]
    NG = (B + GRP - 1) // GRP
    out_ref[:] = jnp.zeros_like(out_ref)

    def get_dma(buf, g):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(g * GRP, GRP)], scratch.at[buf], sem.at[buf]
        )

    for k in range(NBUF - 1):
        @pl.when(k < NG)
        def _(k=k):
            get_dma(k, k).start()

    acc0 = jnp.zeros((8, tq), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, tq), 0)

    def body(grp_i, carry):
        accA, accB, cur_g8 = carry
        buf = jnp.mod(grp_i, NBUF)

        @pl.when(grp_i + NBUF - 1 < NG)
        def _():
            get_dma(jnp.mod(grp_i + NBUF - 1, NBUF), grp_i + NBUF - 1).start()

        get_dma(buf, grp_i).wait()
        for g in range(GRP):
            e = grp_i * GRP + g
            e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
            valid = e < B
            me = meta_ref[e_safe]
            qt_e = me >> META_SHIFT
            an_e = me & ((1 << META_SHIFT) - 1)
            g8 = qt_e >> 3
            switch = g8 != cur_g8
            accA = jnp.where(switch, 0.0, accA)
            accB = jnp.where(switch, 0.0, accB)
            cur_g8 = g8
            rowmask = (row == (qt_e & 7)) & valid

            w = scratch[buf, g]  # (WH, tq) scalar B*g
            if w.dtype != jnp.float32:
                w = w.astype(jnp.float32)
            cs = sc_ref[pl.ds(an_e, WH), :]
            qs = sq_ref[qt_e]
            rj = rf_ref[pl.ds(an_e, WH), :]   # (WH, 1)
            ri = rl_ref[pl.ds(qt_e, 1), :]    # (1, tq)
            inv = 1.0 / jnp.maximum(rj + ri, 1e-30)
            sx = w * (qs[0:1, :] - cs[:, 0:1])
            sy = w * (qs[1:2, :] - cs[:, 1:2])
            ax = jnp.sum(sx * inv, axis=0, keepdims=True)
            ay = jnp.sum(sy * inv, axis=0, keepdims=True)
            accA = accA + jnp.where(rowmask, ax, 0.0)
            accB = accB + jnp.where(rowmask, ay, 0.0)
            base = g8 * 8
            out_ref[0, pl.ds(base, 8), :] = accA
            out_ref[1, pl.ds(base, 8), :] = accB

        return accA, accB, cur_g8

    @pl.when(B > 0)
    def _():
        jax.lax.fori_loop(
            0, NG, body, (acc0, acc0, (meta_ref[0] >> META_SHIFT) >> 3),
            unroll=False)


BGRP = 8  # builder emission group: blocks per DMA (must divide b_max)


def _visc_kernel(cnt_ref, meta_ref, w_hbm, rf_ref, rl_ref, out_ref, scratch, sem,
                 *, tq: int):
    """Stream the rho-free viscosity blocks [sx | sy]; per pair the deferred
    1/(rho_i + rho_j) factor is applied in-kernel: rho_j arrives as a dynamic
    sublane slice of the flat sorted table (rf_ref, (C, 1)) and rho_i as the
    query tile's lane-major row (rl_ref, (NT, TQ)). out = (sum sx/(ri+rj),
    sum sy/(ri+rj)) per query — the ApproxLaplace / WCSPH viscosity fluid sums
    (simulation.rs:941-989) with f32 a*(1/b) in place of a/b."""
    B = cnt_ref[0]
    NG = (B + GRP - 1) // GRP
    out_ref[:] = jnp.zeros_like(out_ref)
    half = _lane_width(tq) // 2

    def get_dma(buf, grp):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(grp * GRP, GRP)], scratch.at[buf], sem.at[buf]
        )

    for k in range(NBUF - 1):
        @pl.when(k < NG)
        def _(k=k):
            get_dma(k, k).start()

    # 8-tile block accumulators, channel-major (2, NT, tq) output — see
    # _matvec_kernel for the layout rationale (free-bitcast unpack)
    acc0 = jnp.zeros((8, tq), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, tq), 0)

    def body(grp, carry):
        accA, accB, cur_g8 = carry
        buf = jnp.mod(grp, NBUF)

        @pl.when(grp + NBUF - 1 < NG)
        def _():
            get_dma(jnp.mod(grp + NBUF - 1, NBUF), grp + NBUF - 1).start()

        get_dma(buf, grp).wait()
        for g in range(GRP):
            e = grp * GRP + g
            e_safe = jnp.minimum(e, jnp.maximum(B - 1, 0))
            valid = e < B
            me = meta_ref[e_safe]
            qt_e = me >> META_SHIFT
            an_e = me & ((1 << META_SHIFT) - 1)
            g8 = qt_e >> 3
            switch = g8 != cur_g8
            accA = jnp.where(switch, 0.0, accA)
            accB = jnp.where(switch, 0.0, accB)
            cur_g8 = g8
            rowmask = (row == (qt_e & 7)) & valid

            w = scratch[buf, g]  # (64, LW) = [sx | pad | sy | pad]
            if w.dtype != jnp.float32:
                w = w.astype(jnp.float32)
            rj = rf_ref[pl.ds(an_e, TILE), :]   # (64, 1)
            ri = rl_ref[pl.ds(qt_e, 1), :]      # (1, tq)
            inv = 1.0 / jnp.maximum(rj + ri, 1e-30)
            ax = jnp.sum(w[:, 0:tq] * inv, axis=0, keepdims=True)
            ay = jnp.sum(w[:, half:half + tq] * inv, axis=0, keepdims=True)
            accA = accA + jnp.where(rowmask, ax, 0.0)
            accB = accB + jnp.where(rowmask, ay, 0.0)
            base = g8 * 8
            out_ref[0, pl.ds(base, 8), :] = accA
            out_ref[1, pl.ds(base, 8), :] = accB

        return accA, accB, cur_g8

    @pl.when(B > 0)
    def _():
        jax.lax.fori_loop(
            0, NG, body, (acc0, acc0, (meta_ref[0] >> META_SHIFT) >> 3),
            unroll=False)


def visc_matvec(vweights, meta, cnt, rho_sorted, tq: int, interpret=None,
                statics=None, sq=None):
    """Viscosity acceleration from the builder's rho-free pair blocks.

    rho_sorted: flat (C,) densities in SORTED order. Returns channel-split
    (vx (C,), vy (C,)) viscosity accelerations (fluid part; no boundary term,
    like the reference's viscosity). statics/sq select the scalar-block form
    (see weight_matvec)."""
    if statics is not None:
        return _scalar_visc_matvec(vweights, meta, cnt, rho_sorted, tq,
                                   statics, sq, interpret)
    C = rho_sorted.shape[0]
    NT = C // tq
    NTP = _nt_pad(NT)  # 8-sublane store granularity (see _nt_pad)
    if interpret is None:
        interpret = default_interpret()
    rf = rho_sorted[:, None]
    rl = rho_sorted.reshape(NT, tq)

    kern = functools.partial(_visc_kernel, tq=tq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # visc blocks in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rho flat (C, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rho lane-major (NT, TQ)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, GRP, TILE, _lane_width(tq)), vweights.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, NTP, tq), jnp.float32),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 * 1024 * 1024 if C > 16384 else None)
        ),
    )(cnt, meta, vweights, rf, rl)
    return out[0].reshape(NTP * tq)[:C], out[1].reshape(NTP * tq)[:C]


def _build_prep_kernel(starts_ref, wmeta_ref, sq_ref, sc_ref, dq_ref,
                       *refs,
                       cfg: TileConfig, scale: float, b_max: int, visc_mode: str,
                       viscosity: float, want_s2: bool = True,
                       fuse_density: bool = False, visc_stream: bool = False,
                       fstat: int = 4, rest_eps: float = 1e-30,
                       scalar: bool = False):
    """Fused per-step pass: weight-cache build + the prep sums in ONE window walk.

    The weight block entries w = m_j * grad W_ij ARE the integrand of the a_ii
    fluid sums (S1 = sum w, S2 = sum w / rho_j, g2 = |w|^2 / m_j), so the prep
    sweep (models/tile_physics.py prep_op) comes nearly free: per window one
    masked term block is sublane-reduced into a per-tile accumulator.
    Outputs match prep_op's column order:
      [m gx, m gy, m g2, mbr gx, mbr gy, mbr g2, visc_x, visc_y].

    v5 walk structure (the per-window scalar overhead was ~50% of the round-4
    builder cost): candidates are processed TWO 64-windows (128 sublanes) per
    loop iteration, and emitted blocks are staged in a (2, BGRP, ...) group
    ring — ONE async copy per BGRP consecutive block slots instead of one per
    block, so DMA issue/wait overhead drops 8x and the stores stay
    branch-light. Trailing positions of a partial final group carry garbage
    but live at slot indices >= cnt, which no matvec ever reads.

    v6 "mega" mode (fuse_density / visc_stream): the fast path's ONLY pair
    walk. fuse_density adds the density fluid sum (row 3 = sum m_j W_ij,
    simulation.rs:1007-1028) so the separate density sweep disappears;
    visc_stream emits a SECOND block set [sx | sy] holding the rho-free
    viscosity pair factors (simulation.rs:941-989 with the 1/(rho_i + rho_j)
    factor deferred), consumed once per step by visc_matvec AFTER the density
    assembles — this breaks the density -> viscosity ordering that forced two
    separate walks. dyn layout: [velx, vely] (mega) vs [rho, velx, vely].

    The candidate table sc_ref is ONE flat (C, fstat + D) array holding the
    statics (x, y, h, mass) followed by the dyn columns: Mosaic lane-pads any
    (C, k<=128) VMEM operand to 128 lanes, so a merged table costs HALF the
    VMEM of separate statics/dyn tables (the round-4 ~50k-particle/chip
    ceiling was exactly this padding).
    """
    if visc_stream:
        w_hbm, v_hbm, meta_ref, cnt_ref, prep_ref, scratch, vscratch, sem = refs
    else:
        w_hbm, meta_ref, cnt_ref, prep_ref, scratch, sem = refs
        v_hbm = vscratch = None
    if fuse_density:
        assert not want_s2, "mega mode has no rho at build time"
    assert not visc_stream or visc_mode != "none"
    TQ = cfg.tq
    NL = len(cfg.populated)
    C = cfg.capacity
    D2 = 2
    W2 = 2 * TILE
    half = _lane_width(TQ) // 2

    def tile_body(t, carry):
        qs = sq_ref[t]  # (F, TQ) channels-first queries
        qx = qs[0:1, :]
        qy = qs[1:2, :]
        qh = qs[2:3, :]
        qvalid = qh > 0.0
        qd = dq_ref[t]  # mega: (2, TQ) velx/vely; classic: (3, TQ) rho/velx/vely
        if fuse_density:
            q_rho = None
            q_vx = qd[0:1, :]
            q_vy = qd[1:2, :]
        else:
            q_rho = qd[0:1, :]
            q_vx = qd[1:2, :]
            q_vy = qd[2:3, :]

        acc0 = jnp.zeros((8, TQ), jnp.float32)

        def emit_block(slot, a_h, wx_h=None, wy_h=None, sx_h=None, sy_h=None,
                       g_h=None, vs_h=None):
            """Stage one block in the group ring; flush on wrap.

            Legacy: a 64-cand [wx | wy] half-window (wx_h/wy_h, + sx_h/sy_h
            for the visc set). Scalar: one full (W2, TQ) scalar-g window
            (g_h, + vs_h = B*g for the visc set)."""
            buf = jnp.mod(slot // BGRP, 2)
            pos = jnp.mod(slot, BGRP)

            @pl.when((pos == 0) & (slot >= 2 * BGRP))
            def _():  # buffer reuse: drain the DMAs issued 2 groups ago
                src = jnp.maximum(slot - 2 * BGRP, 0)
                pltpu.make_async_copy(
                    scratch.at[buf], w_hbm.at[pl.ds(src, BGRP)], sem.at[buf, 0]
                ).wait()
                if visc_stream:
                    pltpu.make_async_copy(
                        vscratch.at[buf], v_hbm.at[pl.ds(src, BGRP)],
                        sem.at[buf, 1],
                    ).wait()

            if scalar:
                scratch[buf, pos] = g_h.astype(scratch.dtype)
                if visc_stream:
                    vscratch[buf, pos] = vs_h.astype(vscratch.dtype)
            else:
                scratch[buf, pos, :, 0:TQ] = wx_h.astype(scratch.dtype)
                scratch[buf, pos, :, half:half + TQ] = wy_h.astype(scratch.dtype)
                if visc_stream:
                    vscratch[buf, pos, :, 0:TQ] = sx_h.astype(vscratch.dtype)
                    vscratch[buf, pos, :, half:half + TQ] = sy_h.astype(
                        vscratch.dtype)
            meta_ref[slot] = (t << META_SHIFT) + a_h

            @pl.when(pos == BGRP - 1)
            def _():
                dst = slot - (BGRP - 1)
                pltpu.make_async_copy(
                    scratch.at[buf], w_hbm.at[pl.ds(dst, BGRP)], sem.at[buf, 0]
                ).start()
                if visc_stream:
                    pltpu.make_async_copy(
                        vscratch.at[buf], v_hbm.at[pl.ds(dst, BGRP)],
                        sem.at[buf, 1],
                    ).start()

        def window_work(a, lo0, hi1, carry):
            """One 128-cand double window masking columns [lo0, hi1)."""
            slot, attempted, acc = carry
            cand = sc_ref[pl.ds(a, W2), :]  # (128, fstat + D)
            cx = cand[:, 0:1]
            cy = cand[:, 1:2]
            ch = cand[:, 2:3]
            cm = cand[:, 3:4]
            if fuse_density:
                c_rho = None
                c_vx = cand[:, fstat:fstat + 1]
                c_vy = cand[:, fstat + 1:fstat + 2]
            else:
                c_rho = cand[:, fstat:fstat + 1]
                c_vx = cand[:, fstat + 1:fstat + 2]
                c_vy = cand[:, fstat + 2:fstat + 3]
            col = jax.lax.broadcasted_iota(jnp.int32, (W2, 1), 0) + a
            h_ij = jnp.maximum(0.5 * (qh + ch), 1e-6)
            dx = qx - cx  # (128, TQ)
            dy = qy - cy
            r2 = dx * dx + dy * dy
            rad = jnp.float32(scale) * h_ij
            valid = (
                (col >= lo0) & (col < hi1) & (r2 < rad * rad) & (ch > 0.0) & qvalid
            )
            if fuse_density:
                w_val, gmag = _w_and_gmag(r2, h_ij)
                den = jnp.where(valid, cm * w_val, 0.0)
                g = jnp.where(valid, cm * gmag, 0.0)
            else:
                den = None
                g = jnp.where(valid, cm * _gmag(r2, h_ij), 0.0)
            wx = g * dx
            wy = g * dy
            if visc_mode != "none":
                dvx = q_vx - c_vx
                dvy = q_vy - c_vy
                dot = dx * dvx + dy * dvy
                if visc_stream:
                    # rho-free viscosity pair factor B: downstream accel is
                    # sum_j (B * w)_ij / (rho_i + rho_j) (visc_matvec). The
                    # reference's /max((rho_i+rho_j)/2, eps) == 2/(rho_i+rho_j)
                    # bit-exactly (both scalings are exact powers of two).
                    if visc_mode == "wcsph":
                        B = (2.0 * jnp.float32(viscosity) * 88.0 * h_ij * dot
                             / (r2 + 0.001 * h_ij * h_ij))
                    else:  # ApproxLaplace
                        B = (2.0 * jnp.float32(viscosity)
                             * (2.0 * (D2 + 2)) * dot
                             / (r2 + 0.01 * h_ij * h_ij))
                    B = jnp.where(dot < 0.0, B, 0.0)
                    sx_t = B * wx
                    sy_t = B * wy
                else:
                    if visc_mode == "wcsph":
                        vt = (
                            2.0 * jnp.float32(viscosity) * h_ij * 88.0
                            / jnp.maximum(q_rho + c_rho, rest_eps)
                        )
                        pi_ab = -vt * dot / (r2 + 0.001 * h_ij * h_ij)
                        coef = -pi_ab  # times m_j, folded in via wx/wy below
                    else:  # ApproxLaplace
                        rho_ij = jnp.maximum((q_rho + c_rho) * 0.5, rest_eps)
                        coef = (
                            jnp.float32(viscosity)
                            * (2.0 * (D2 + 2) * dot
                               / (r2 + 0.01 * h_ij * h_ij) / rho_ij)
                        )
                    coef = jnp.where(dot < 0.0, coef, 0.0)
                    # visc pair term = coef * m_j * gmag * d = coef * w
                    vx_t = coef * wx
                    vy_t = coef * wy
            if scalar:
                # ONE (W2, TQ) scalar-g block per window (v7): the matvec
                # kernels reconstruct wx/wy from the statics in-kernel
                ne = jnp.any(valid)
                emit = ne & (slot < b_max)
                vs = (B * g) if visc_stream else None  # B already dot-masked

                @pl.when(emit)
                def _():
                    emit_block(slot, a, g_h=g, vs_h=vs)

                slot1 = slot + emit.astype(jnp.int32)
                emit1 = jnp.bool_(False)
                ne_total = ne.astype(jnp.int32)
            else:
                ne0 = jnp.any(valid[0:TILE])
                ne1 = jnp.any(valid[TILE:W2])
                emit0 = ne0 & (slot < b_max)
                slot1 = slot + emit0.astype(jnp.int32)
                emit1 = ne1 & (slot1 < b_max)
                ne_total = ne0.astype(jnp.int32) + ne1.astype(jnp.int32)

                if visc_stream:
                    sx0, sx1 = sx_t[0:TILE], sx_t[TILE:W2]
                    sy0, sy1 = sy_t[0:TILE], sy_t[TILE:W2]
                else:
                    sx0 = sx1 = sy0 = sy1 = None

                @pl.when(emit0)
                def _():
                    emit_block(slot, a, wx[0:TILE], wy[0:TILE], sx0, sy0)

                @pl.when(emit1)
                def _():
                    emit_block(slot1, a + TILE, wx[TILE:W2], wy[TILE:W2],
                               sx1, sy1)

            inv_m = 1.0 / jnp.maximum(cm, rest_eps)
            t2 = (wx * wx + wy * wy) * inv_m
            # channels on SUBLANES: acc (8, TQ), row k = channel k — the caller
            # then unpacks each channel as out[:, k, :].reshape(C) with ZERO
            # relayout (the old (1, 8*TQ) lane-major form cost a swapaxes
            # relayout of the whole prep table every step).
            # Channels whose consumer is trace-time absent are SKIPPED outright
            # (their acc rows stay zero): the s2 (rho_j-weighted) sums only
            # feed the Winchenbach2020 discretization's aii/divergence, and the
            # viscosity pair terms only exist for a viscous first kick.
            terms = [(0, wx), (1, wy), (2, t2)]
            if fuse_density:
                terms += [(3, den)]
            if want_s2:
                inv_rho = 1.0 / jnp.maximum(c_rho, rest_eps)
                terms += [(3, wx * inv_rho), (4, wy * inv_rho),
                          (5, t2 * inv_rho)]
            if visc_mode != "none" and not visc_stream:
                terms += [(6, vx_t), (7, vy_t)]
            row8 = jax.lax.broadcasted_iota(jnp.int32, (8, TQ), 0)
            contrib = jnp.zeros((8, TQ), jnp.float32)
            for k, term in terms:
                contrib = jnp.where(
                    row8 == k, jnp.sum(term, axis=0, keepdims=True), contrib)
            acc = acc + contrib

            return (slot1 + emit1.astype(jnp.int32), attempted + ne_total, acc)

        def level_block(li, carry):
            mbase = (t * NL + li) * WM_STRIDE
            cnt = wmeta_ref[mbase]

            def range_body(r, carry):
                lo = starts_ref[wmeta_ref[mbase + 1 + 2 * r]]
                hi = starts_ref[wmeta_ref[mbase + 2 + 2 * r]]
                a0 = (lo // 8) * 8
                npair = jnp.where(hi > lo, (hi - a0 + W2 - 1) // W2, 0)

                def win_body(k, carry):
                    base = a0 + k * W2
                    a = jnp.minimum(base, C - W2)
                    # per-half ranges [max(base,lo), min(hi,base+64)) and
                    # [max(base+64,lo), min(hi,base+128)) are adjacent or
                    # degenerate; their union is exactly [lo0, hi1)
                    lo0 = jnp.maximum(base, lo)
                    hi1 = jnp.minimum(hi, base + W2)
                    return window_work(a, lo0, hi1, carry)

                return jax.lax.fori_loop(0, npair, win_body, carry, unroll=False)

            return jax.lax.fori_loop(0, cnt, range_body, carry, unroll=False)

        slot, attempted, acc = carry[0], carry[1], acc0
        for li in range(NL):
            slot, attempted, acc = level_block(li, (slot, attempted, acc))
        prep_ref[t] = acc
        return slot, attempted

    NT = cfg.capacity // TQ
    slot, attempted = jax.lax.fori_loop(
        0, NT, tile_body, (jnp.int32(0), jnp.int32(0)), unroll=False
    )

    # flush the partial final group (trailing positions hold garbage from the
    # previous group in this buffer, but only at slot indices >= cnt)
    rem = jnp.mod(slot, BGRP)

    @pl.when((rem > 0) & (slot < b_max))
    def _():
        buf = jnp.mod(slot // BGRP, 2)
        pltpu.make_async_copy(
            scratch.at[buf], w_hbm.at[pl.ds(slot - rem, BGRP)], sem.at[buf, 0]
        ).start()
        if visc_stream:
            pltpu.make_async_copy(
                vscratch.at[buf], v_hbm.at[pl.ds(slot - rem, BGRP)],
                sem.at[buf, 1],
            ).start()

    # drain: every group DMA not yet waited on (the reuse waits covered all
    # groups except the last two started)
    ng = (jnp.minimum(slot, b_max) + BGRP - 1) // BGRP

    def drain(g):
        buf = jnp.mod(g, 2)
        pltpu.make_async_copy(
            scratch.at[buf], w_hbm.at[pl.ds(g * BGRP, BGRP)], sem.at[buf, 0]
        ).wait()
        if visc_stream:
            pltpu.make_async_copy(
                vscratch.at[buf], v_hbm.at[pl.ds(g * BGRP, BGRP)],
                sem.at[buf, 1],
            ).wait()

    @pl.when(ng >= 1)
    def _():
        drain(ng - 1)

    @pl.when(ng >= 2)
    def _():
        drain(ng - 2)

    cnt_ref[0] = slot
    cnt_ref[1] = attempted - slot


def build_weight_cache_prep(cfg: TileConfig, bins: TileBins, statics_sorted,
                            dyn_sorted, scale: float, b_max: int, visc_mode: str,
                            viscosity: float, wmeta=None, interpret=None,
                            wdtype=jnp.float32, want_s2=True,
                            fuse_density=False, visc_stream=False,
                            scalar=None):
    """Fused builder: returns (weights, (qt, anchor), cnt, prep (NT, 8, TQ))
    — plus the viscosity block set after `weights` when visc_stream is on.

    dyn_sorted: (C, 3) sorted [rho, velx, vely] — or (C, 2) [velx, vely] in
    mega mode (fuse_density), where rho does not exist yet. prep columns match
    tile_physics.prep_op; visc_mode in {"none", "wcsph", "laplace"}.
    wdtype: weight-block storage dtype (params.weight_cache_bf16 passes
    bfloat16 — halves the per-iteration HBM stream; the prep sums stay f32).
    want_s2=False skips the rho_j-weighted sum channels (rows 3-5 return 0) —
    they only feed the Winchenbach2020 discretization.
    fuse_density: prep row 3 = the density fluid sum (mega mode; excludes
    want_s2). visc_stream: viscosity leaves the walk as rho-free pair blocks
    (consumed by visc_matvec); prep rows 6-7 stay zero.
    scalar: emit v7 scalar-g blocks (WH, TQ) instead of [wx|wy] half-windows
    (None = auto: scalar iff tq supports it; the resident solver consumes the
    legacy format, so its callers pass scalar=False explicitly).
    """
    if scalar is None:
        scalar = scalar_blocks_supported(cfg.tq)
    assert b_max % GRP == 0 and b_max % BGRP == 0
    assert cfg.capacity <= (1 << META_SHIFT) and cfg.capacity // cfg.tq < (1 << 13)
    TQ = cfg.tq
    NT = cfg.capacity // TQ
    sq = jnp.swapaxes(to_chunks(statics_sorted, TQ), 1, 2)  # (NT, F, TQ)
    dq = jnp.swapaxes(to_chunks(dyn_sorted, TQ), 1, 2)  # (NT, 2|3, TQ)
    # ONE merged candidate table: (C, k) VMEM operands lane-pad to 128 either
    # way, so statics + dyn in one array halves the builder's VMEM footprint
    fstat = statics_sorted.shape[1]
    flat = jnp.concatenate([statics_sorted, dyn_sorted], axis=1)
    if wmeta is None:
        wmeta = window_meta(cfg, bins, statics_sorted)
    if interpret is None:
        interpret = default_interpret()

    kern = functools.partial(
        _build_prep_kernel, cfg=cfg, scale=float(scale), b_max=b_max,
        visc_mode=visc_mode, viscosity=float(viscosity), want_s2=bool(want_s2),
        fuse_density=bool(fuse_density), visc_stream=bool(visc_stream),
        fstat=fstat, scalar=bool(scalar),
    )
    bshape = (b_max, WH, TQ) if scalar else (b_max, TILE, _lane_width(TQ))
    block_sd = jax.ShapeDtypeStruct(bshape, wdtype)
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [block_sd]
    scratch_shapes = [pltpu.VMEM((2, BGRP) + bshape[1:], wdtype)]
    if visc_stream:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(block_sd)
        scratch_shapes.append(pltpu.VMEM((2, BGRP) + bshape[1:], wdtype))
    out_specs += [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # packed block meta
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cnt
        pl.BlockSpec(memory_space=pltpu.VMEM),  # prep
    ]
    out_shape += [
        jax.ShapeDtypeStruct((b_max,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.int32),
        jax.ShapeDtypeStruct((NT, 8, TQ), jnp.float32),
    ]
    scratch_shapes.append(pltpu.SemaphoreType.DMA((2, 2)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # merged flat cand table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dq
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(100 * 1024 * 1024 if cfg.capacity > 16384 else None),
        ),
    )(bins.cell_starts, wmeta, sq, flat, dq)
    # (NT, 8, TQ) channel-sublane prep: channel k unpacks as
    # prep[:, k, :].reshape(C) with zero relayout
    return outs
