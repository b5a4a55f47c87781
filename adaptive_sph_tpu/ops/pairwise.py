"""Symmetric pair sweeps over the forward neighbor structure.

Every `for j in neighs.iter(i)` loop of the reference (density simulation.rs:1007-1028,
viscosity :929-1005, divergence :1552-1592, pressure accel :1780-1808, surface detection
:539-695, h estimation :1873-1971, level smoothing :803-857) becomes one call here:
a gather over the (C, K) forward rows, a masked row-reduction, and — because forward rows
only store same-or-larger neighbors — a sorted segment-sum scatter that delivers the
reversed contribution of each cross-level edge to the larger particle.

The scatter uses the permutation precomputed by the neighbor builder, so XLA sees a
sorted segment reduction instead of a random scatter-add. Unused gathered fields are
dead-code-eliminated by XLA, so edge functions can take the full particle pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .neighbors import Neighborhood


def gather(values, nb: Neighborhood):
    """Gather a pytree of (C, ...) arrays to (C, K, ...) along forward rows."""
    return jax.tree.map(lambda a: a[nb.idx], values)


def _expand_i(values):
    return jax.tree.map(lambda a: a[:, None] if a.ndim == 1 else a[:, None, :], values)


def _bwd_scatter(nb: Neighborhood, edge_values):
    """Sum per-edge values into their cross-edge targets. edge_values: (C, K, ...)."""
    C, K = nb.idx.shape

    def one(e):
        flat = e.reshape((C * K,) + e.shape[2:])
        cross = nb.cross.reshape(-1)
        flat = jnp.where(cross.reshape((-1,) + (1,) * (flat.ndim - 1)), flat, 0)
        permuted = flat[nb.bwd_perm]
        seg = jax.ops.segment_sum(
            permuted, nb.bwd_seg, num_segments=C + 1, indices_are_sorted=True
        )
        return seg[:C]

    return jax.tree.map(one, edge_values)


def sym_sum(nb: Neighborhood, values, edge_fn):
    """Symmetric neighbor sum.

    values : pytree of (C, ...) per-particle arrays gathered for both edge endpoints.
    edge_fn(vi, vj) -> pytree of per-edge contributions (C, K, ...) to the *first*
    argument's particle. Must be finite on the masked self-edge (diff == 0).

    Returns the pytree of (C, ...) sums over the full symmetric neighborhood
    (self edge included, as in the reference's neighbor lists).
    """
    C, K = nb.idx.shape
    vj = gather(values, nb)
    vi = _expand_i(values)

    fwd = edge_fn(vi, vj)

    def reduce_fwd(e):
        m = nb.mask.reshape(nb.mask.shape + (1,) * (e.ndim - 2))
        return jnp.sum(jnp.where(m, e, 0), axis=1)

    total = jax.tree.map(reduce_fwd, fwd)

    # reversed contributions: edge (i -> j) contributes edge_fn(vj, vi) to j
    bwd = edge_fn(vj, vi)
    bwd = jax.tree.map(lambda e: jnp.broadcast_to(e, (C, K) + e.shape[2:]), bwd)
    scattered = _bwd_scatter(nb, bwd)
    return jax.tree.map(lambda t, s: t + s, total, scattered)


def sym_max(nb: Neighborhood, values, edge_fn, fill):
    """Symmetric neighbor max of a scalar edge quantity; masked slots take `fill`."""
    C, K = nb.idx.shape
    vj = gather(values, nb)
    vi = _expand_i(values)

    fwd = jnp.where(nb.mask, edge_fn(vi, vj), fill)
    total = jnp.max(fwd, axis=1)

    bwd = jnp.broadcast_to(edge_fn(vj, vi), (C, K))
    flat = jnp.where(nb.cross.reshape(-1), bwd.reshape(-1), fill)
    permuted = flat[nb.bwd_perm]
    seg = jax.ops.segment_max(permuted, nb.bwd_seg, num_segments=C + 1, indices_are_sorted=True)
    scattered = jnp.maximum(seg[:C], fill)
    return jnp.maximum(total, scattered)
