"""Per-step edge cache: geometry/kernel quantities computed once per neighborhood.

The Jacobi pressure loop (simulation.rs:1207-1322) runs dozens of sweeps per step, and
each sweep in a naive formulation re-gathers positions/masses/smoothing lengths and
re-evaluates W / grad W for every edge. All of those are constant within a step — only
pressure and the acceleration field change. Caching them turns each sweep into one
(C, K) gather + fused multiply-adds + a sorted segment-sum, which is HBM-bandwidth
bound rather than gather bound.

Reversed edges (the scatter side of cross-level pairs) reuse the same cache:
grad W_ji = -grad W_ij, |x_ji| = |x_ij|, h_ij symmetric; row-side quantities swap roles.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from . import kernels
from .neighbors import Neighborhood


@struct.dataclass
class EdgeCache:
    diff: jnp.ndarray  # (C, K, D) x_i - x_j
    r: jnp.ndarray  # (C, K)
    h_ij: jnp.ndarray  # (C, K)
    w: jnp.ndarray  # (C, K) W_ij
    grad: jnp.ndarray  # (C, K, D) grad_i W_ij
    mass_j: jnp.ndarray  # (C, K)
    rho_j: Optional[jnp.ndarray] = None  # (C, K), set after densities exist


def build_edge_cache(nb: Neighborhood, position, h, mass) -> EdgeCache:
    xj = position[nb.idx]
    diff = position[:, None, :] - xj
    r = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-30)
    h_ij = 0.5 * (h[:, None] + h[nb.idx])
    w = kernels.kernel_w(r, h_ij, dim=2)
    grad = kernels.kernel_grad(diff, h_ij, dim=2)
    return EdgeCache(
        diff=diff, r=r, h_ij=h_ij, w=w, grad=grad, mass_j=mass[nb.idx]
    )


def with_density(cache: EdgeCache, nb: Neighborhood, density) -> EdgeCache:
    return cache.replace(rho_j=density[nb.idx])


def reduce_edges(nb: Neighborhood, fwd, bwd):
    """Masked row-sum of forward contributions + sorted-scatter of reversed ones.

    fwd / bwd: pytrees of (C, K, ...) per-edge contributions; fwd accrues to the row
    particle i, bwd (the same edge seen from j) accrues to the cross-edge target j.
    """
    C, K = nb.idx.shape

    def rowsum(e):
        m = nb.mask.reshape(nb.mask.shape + (1,) * (e.ndim - 2))
        return jnp.sum(jnp.where(m, e, 0), axis=1)

    total = jax.tree.map(rowsum, fwd)

    def scatter(e):
        e = jnp.broadcast_to(e, (C, K) + e.shape[2:])
        flat = e.reshape((C * K,) + e.shape[2:])
        cross = nb.cross.reshape((-1,) + (1,) * (flat.ndim - 1))
        flat = jnp.where(cross, flat, 0)
        permuted = flat[nb.bwd_perm]
        seg = jax.ops.segment_sum(
            permuted, nb.bwd_seg, num_segments=C + 1, indices_are_sorted=True
        )
        return seg[:C]

    scattered = jax.tree.map(scatter, bwd)
    return jax.tree.map(lambda t, s: t + s, total, scattered)
