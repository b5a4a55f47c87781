"""Dense patch-clique PPE operator: same-level pair sweeps as batched einsums.

The round-4 census measured the streamed weight blocks at 2.08% pair validity
(~29 MB/iteration on the bench scene) — the HBM floor of that stream alone
exceeds the step time the 50M updates/s target allows (PERFORMANCE.md, budget
section). This module replaces the window-walk structure for SAME-LEVEL pairs
with the patch-major layout of ops/tiles.py (TileConfig.patch > 0):

  - the sorted array is padded to PATCH_SLOTS slots per occupied patch, so a
    patch's full same-level candidate set is exactly [own 128 slots | 128
    gathered halo slots] (ring of one cell, exact superset by the level
    assignment bound sr = mscale * h <= cell(level));
  - the pair weights w_ij = m_j grad W_ij (simulation.rs:1207-1322) become two
    dense blocks Wx, Wy of shape (C // 128, 256, 128) built by ONE pure-XLA
    vectorized pair pass (no Pallas, no per-window control flow) that also
    produces the a_ii gradient sums and the density fluid sum;
  - each Jacobi sweep applies the operator as plain batched einsums
    (bsl,bs->bl) — MXU work on a weight set small enough to stay VMEM-resident
    across the solve — plus ONE row gather per operand to refresh halo values;
  - cross-LEVEL pairs (a few blocks on adaptive scenes) stay on the streamed
    builder (ops/pallas_matvec.py with cross_only window ranges) and are
    converted once per step into extra einsum entries: their candidate slots
    are contiguous runs [anchor, anchor+64) recoverable from the block meta,
    so the per-iteration application is einsum + tiny gather/scatter — the
    solver loop runs with NO Pallas calls at all.

Exactness: identical pair set and per-pair weights as the walk kernels
(differentially tested); only f32 association order differs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import kernels
from .tiles import PATCH_SLOTS, TileConfig

PS = PATCH_SLOTS


def halo_rows(halo_src, table):
    """Gather halo rows of a sorted (C, k) table: row s of the result is the
    table row of patch (s // 128)'s halo entry s % 128 (zeros where absent)."""
    C = table.shape[0]
    safe = jnp.minimum(halo_src, C - 1)
    out = table[safe]
    return jnp.where((halo_src < C)[:, None], out, 0.0)


def _cand(halo_src, cols):
    """Candidate tables from (C,) channels: list of (NB, 256) [own | halo]."""
    C = cols[0].shape[0]
    NB = C // PS
    tab = jnp.stack([c.astype(jnp.float32) for c in cols], axis=1)
    hal = halo_rows(halo_src, tab)
    outs = []
    for k in range(len(cols)):
        outs.append(jnp.concatenate(
            [tab[:, k].reshape(NB, PS), hal[:, k].reshape(NB, PS)], axis=1))
    return outs


@dataclasses.dataclass
class CliqueOperator:
    """Same-level blocks + optional cross-level einsum entries."""

    wx: jnp.ndarray          # (NB, 256, 128) wdtype
    wy: jnp.ndarray
    halo_src: jnp.ndarray    # (C,) from tiles.build_halo
    wxc: jnp.ndarray = None  # (NX, 64, 128) cross-level blocks
    wyc: jnp.ndarray = None
    src: jnp.ndarray = None  # (NX, 64) candidate slots of each cross block
    dst: jnp.ndarray = None  # (NX,) destination patch row
    cross_overflow: jnp.ndarray = None

    def _cand_vals(self, cols):
        return _cand(self.halo_src, cols)

    def _einsum(self, w, v):
        return jnp.einsum("bsl,bs->bl", w, v,
                          preferred_element_type=jnp.float32)

    def matvec2(self, u):
        """accel fluid sums: (sum_j wx_ij u_j, sum_j wy_ij u_j), u (C,)."""
        C = u.shape[0]
        NB = C // PS
        (uc,) = self._cand_vals([u])
        mvx = self._einsum(self.wx, uc)
        mvy = self._einsum(self.wy, uc)
        if self.wxc is not None:
            us = u[self.src.reshape(-1)].reshape(self.src.shape)
            cx = self._einsum(self.wxc, us)
            cy = self._einsum(self.wyc, us)
            mvx = mvx.at[self.dst].add(cx)
            mvy = mvy.at[self.dst].add(cy)
        return mvx.reshape(C), mvy.reshape(C)

    def matvec_div(self, tx, ty):
        """divergence fluid sum: sum_j (wx_ij tx_j + wy_ij ty_j)."""
        C = tx.shape[0]
        txc, tyc = self._cand_vals([tx, ty])
        s = self._einsum(self.wx, txc) + self._einsum(self.wy, tyc)
        if self.wxc is not None:
            t2 = jnp.stack([tx, ty], axis=1)
            ts = t2[self.src.reshape(-1)].reshape(self.src.shape + (2,))
            cs = (self._einsum(self.wxc, ts[..., 0])
                  + self._einsum(self.wyc, ts[..., 1]))
            s = s.at[self.dst].add(cs)
        return s.reshape(C)


def _pair_terms(cfg: TileConfig, halo_src, st, scale):
    """Shared geometry of one clique pair pass. Returns (q, c, geom) where
    query channels are (NB, 1, 128), candidate channels (NB, 256, 1)."""
    C = st.shape[0]
    NB = C // PS
    hal = halo_rows(halo_src, st[:, 0:4])  # ONE row gather of the statics

    def q_(col):
        return st[:, col].reshape(NB, 1, PS)

    def c_(col):
        return jnp.concatenate(
            [st[:, col].reshape(NB, PS), hal[:, col].reshape(NB, PS)], axis=1
        ).reshape(NB, 2 * PS, 1)

    qx, qy, qh = q_(0), q_(1), q_(2)
    cx, cy, chh, cm = c_(0), c_(1), c_(2), c_(3)
    h_ij = jnp.maximum(0.5 * (qh + chh), 1e-6)
    dx = qx - cx
    dy = qy - cy
    r2 = dx * dx + dy * dy
    rad = jnp.float32(scale) * h_ij
    valid = (r2 < rad * rad) & (chh > 0.0) & (qh > 0.0)
    return dict(dx=dx, dy=dy, r2=r2, h_ij=h_ij, valid=valid, cm=cm,
                chh=chh, NB=NB, C=C)


def _w_and_gmag(r2, h_ij):
    """W and grad-magnitude factor; identical math to pallas_matvec._w_and_gmag
    (sph_kernels.rs:49-71 via ops/kernels.py)."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    q = r / (2.0 * h_ij)
    norm = kernels.kernel_norm_factor(h_ij, 2)
    w = norm * kernels.cubic_kernel_unnormalized(q)
    mag = norm * kernels.cubic_kernel_unnormalized_deriv(q) / (2.0 * h_ij)
    return w, jnp.where(q > 1.0e-5, mag / r, 0.0)


def clique_build(cfg: TileConfig, halo_src, st, scale, wdtype):
    """ONE vectorized pair pass over all patches: same-level weight blocks +
    a_ii gradient sums + density fluid sum (the clique analogue of the fused
    mega builder, pallas_matvec.build_weight_cache_prep with fuse_density).

    Returns (wx, wy, s1x, s1y, s1sq, den): blocks (NB, 256, 128) in wdtype,
    per-particle sums (C,) f32 in sorted-slot order.
    """
    g = _pair_terms(cfg, halo_src, st, scale)
    w_val, gmag = _w_and_gmag(g["r2"], g["h_ij"])
    den_t = jnp.where(g["valid"], g["cm"] * w_val, 0.0)
    gg = jnp.where(g["valid"], g["cm"] * gmag, 0.0)
    wx = gg * g["dx"]
    wy = gg * g["dy"]
    inv_m = 1.0 / jnp.maximum(g["cm"], 1e-30)
    t2 = (wx * wx + wy * wy) * inv_m
    C = g["C"]
    s1x = jnp.sum(wx, axis=1).reshape(C)
    s1y = jnp.sum(wy, axis=1).reshape(C)
    s1sq = jnp.sum(t2, axis=1).reshape(C)
    den = jnp.sum(den_t, axis=1).reshape(C)
    return wx.astype(wdtype), wy.astype(wdtype), s1x, s1y, s1sq, den


def clique_visc(cfg: TileConfig, halo_src, st, vx, vy, rho, scale,
                visc_mode: str, viscosity: float):
    """Same-level viscosity pair sums (simulation.rs:929-1005): a second pure-
    XLA pair pass once rho exists (reference stage order: density, then the
    non-pressure kick). Returns (ax, ay) (C,) f32 sorted-slot sums."""
    g = _pair_terms(cfg, halo_src, st, scale)
    NB, C = g["NB"], g["C"]
    cvx, cvy, crho = _cand(halo_src, [vx, vy, rho])
    cvx = cvx.reshape(NB, 2 * PS, 1)
    cvy = cvy.reshape(NB, 2 * PS, 1)
    crho = crho.reshape(NB, 2 * PS, 1)
    qvx = vx.reshape(NB, 1, PS)
    qvy = vy.reshape(NB, 1, PS)
    qrho = rho.reshape(NB, 1, PS)
    dvx = qvx - cvx
    dvy = qvy - cvy
    dot = g["dx"] * dvx + g["dy"] * dvy
    h_ij, r2 = g["h_ij"], g["r2"]
    gg = jnp.where(g["valid"], g["cm"] * _w_and_gmag(r2, h_ij)[1], 0.0)
    if visc_mode == "wcsph":
        vt = (2.0 * jnp.float32(viscosity) * h_ij * 88.0
              / jnp.maximum(qrho + crho, 1e-30))
        coef = vt * dot / (r2 + 0.001 * h_ij * h_ij)  # -pi_ab
    else:  # ApproxLaplace
        rho_ij = jnp.maximum((qrho + crho) * 0.5, 1e-30)
        coef = (jnp.float32(viscosity)
                * (2.0 * (2 + 2) * dot / (r2 + 0.01 * h_ij * h_ij) / rho_ij))
    coef = jnp.where(dot < 0.0, coef, 0.0)
    ax = jnp.sum(coef * gg * g["dx"], axis=1).reshape(C)
    ay = jnp.sum(coef * gg * g["dy"], axis=1).reshape(C)
    return ax, ay


def cross_pack(wcache, meta, cnt, tq: int, nx_cap: int):
    """Convert the cross-level streamed blocks into einsum entries.

    wcache: (b_max, 64, lane_width) [wx | wy] blocks from the builder run with
    cross_only window ranges; meta packs (tile << 18) | anchor, so block b's
    candidate slots are exactly [anchor, anchor + 64) — contiguous sorted
    slots. Returns (wxc, wyc, src, dst, overflow) with NX = nx_cap static
    rows; blocks past cnt[0] are zeroed (the builder's out buffer is
    uninitialized there).
    """
    from .pallas_matvec import META_SHIFT, TILE, _lane_width

    half = _lane_width(tq) // 2
    nb = cnt[0]
    bvalid = jnp.arange(nx_cap, dtype=jnp.int32) < nb
    m = jnp.where(bvalid, meta[:nx_cap], 0)
    anchor = m & ((1 << META_SHIFT) - 1)
    dst = m >> META_SHIFT
    src = anchor[:, None] + jnp.arange(TILE, dtype=jnp.int32)[None, :]
    wxc = jnp.where(bvalid[:, None, None], wcache[:nx_cap, :, 0:tq], 0)
    wyc = jnp.where(bvalid[:, None, None],
                    wcache[:nx_cap, :, half:half + tq], 0)
    overflow = jnp.maximum(nb - nx_cap, 0)
    return wxc, wyc, src, jnp.clip(dst, 0, None), overflow
