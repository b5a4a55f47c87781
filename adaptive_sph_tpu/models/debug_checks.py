"""Opt-in runtime verification: check_aii and check_neighborhood.

Reference parity:
  check_aii (simulation.rs:1324-1375): verify the closed-form diagonal a_ii against the
  matrix-free ground truth div(accel(p = unit at i)) at i, tolerance 1e-2 in f32.
  check_neighborhood (simulation.rs:1810-1863): O(C^2) brute-force neighbor sets.

The unit-pressure acceleration field for probe particle i is nonzero only on N(i) + i,
so the two-hop bruteforce reduces to one extra field pass (S_a = sum_b m_b grad W_ab)
plus per-edge terms — evaluated for every particle in parallel instead of the
reference's per-i loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import kernels
from ..ops.neighbors import Neighborhood
from ..ops.pairwise import sym_sum
from ..utils.params import OperatorDiscretization, SimulationParams
from . import boundary as bnd


def check_aii_deviation(nb: Neighborhood, bt, position, mass, density, h, aii,
                        alive, params: SimulationParams):
    """Max |a_ii_closed_form - a_ii_bruteforce| over alive particles.

    Ground truth: a_ii = div_i(a^(i)) where a^(i) is the pressure acceleration of the
    unit pressure field p = delta_i (calculate_aii_inefficiently, simulation.rs:1324-1345).

    Restriction mirroring the reference's usage: exact for the ConsistentSimpleGradient
    discretization with SDF or no boundary (where pressure mirroring vanishes for
    p_j = 0); other discretizations add mirrored-pressure cross terms which are
    reproduced below for the SDF handler.
    """
    # field S_a = sum_b m_b grad W_ab over the symmetric neighborhood
    def s_edge(vi, vj):
        gw = kernels.kernel_grad(vi["pos"] - vj["pos"], 0.5 * (vi["h"] + vj["h"]), dim=2)
        return vj["mass"][..., None] * gw

    S = sym_sum(nb, {"pos": position, "mass": mass, "h": h}, s_edge)

    rho_i = density
    od = params.operator_discretization

    # boundary acceleration of particle i under unit self pressure (p_i = 1)
    bacc_unit = bnd.boundary_pressure_accel(
        bt, position, h, jnp.ones_like(mass), density, params
    )
    # acc_i^(i) = -(1/rho_i^2) * S_i + boundary(p_i = 1)
    acc_self = -S / (rho_i * rho_i)[:, None] + bacc_unit

    # divergence of the acc field at i:
    #   sum_j w_j (acc_j^(i) - acc_i^(i)) . grad W_ij + boundary_div(acc_i^(i))
    # where for j != i:  acc_j^(i) = -(m_i / rho_i^2) grad W_ji  (= + m_i/rho_i^2 grad W_ij)
    # (for ConsistentSymmetricGradient the SDF mirror adds nothing since p_j = 0)
    def div_edge(vi, vj):
        gw = kernels.kernel_grad(vi["pos"] - vj["pos"], 0.5 * (vi["h"] + vj["h"]), dim=2)
        is_self = vi["idx"] == vj["idx"]
        acc_j = (vi["mass"] / (vi["rho"] * vi["rho"]))[..., None] * gw
        acc_j = jnp.where(is_self[..., None], vj["acc_self"], acc_j)
        d = jnp.sum((acc_j - vi["acc_self"]) * gw, -1)
        if od == OperatorDiscretization.Winchenbach2020:
            return vj["mass"] / vj["rho"] * d
        return vj["mass"] * d

    vals = {
        "pos": position,
        "mass": mass,
        "rho": density,
        "h": h,
        "acc_self": acc_self,
        "idx": jnp.arange(position.shape[0], dtype=jnp.int32),
    }
    fluid_div = sym_sum(nb, vals, div_edge)
    if od != OperatorDiscretization.Winchenbach2020:
        fluid_div = fluid_div / rho_i

    bdiv = bnd.boundary_divergence(
        bt, acc_self, jnp.zeros(2, jnp.float32), position, h, density, params
    )
    aii_real = fluid_div + bdiv
    dev = jnp.where(alive, jnp.abs(aii_real - aii), 0.0)
    return jnp.max(dev)


def bruteforce_neighbor_count(position, h_eff, alive, scale, chunk: int = 256):
    """O(C^2) ground-truth neighbor counts (check_neighborhood,
    simulation.rs:1810-1863 + neighborhood_search.rs:187-238), evaluated in
    row blocks so the dense pair mask never materializes at (C, C).

    Pair semantics identical to every engine: |x_ij| < scale * (h_i + h_j) / 2,
    self included."""
    import jax

    C = position.shape[0]
    pad = (-C) % chunk
    if pad:
        position = jnp.concatenate([position, jnp.zeros((pad, 2), position.dtype)])
        h_eff = jnp.concatenate([h_eff, jnp.zeros((pad,), h_eff.dtype)])
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])
    h = jnp.where(alive, h_eff, 0.0)

    def blk(i):
        p = jax.lax.dynamic_slice_in_dim(position, i * chunk, chunk)
        hh = jax.lax.dynamic_slice_in_dim(h, i * chunk, chunk)
        d = p[:, None, :] - position[None, :, :]
        r2 = jnp.sum(d * d, axis=-1)
        hij = 0.5 * (hh[:, None] + h[None, :])
        rad = jnp.float32(scale) * hij
        m = (r2 < rad * rad) & (h[None, :] > 0.0) & (hh[:, None] > 0.0)
        return jnp.sum(m, axis=1).astype(jnp.int32)

    counts = jax.lax.map(blk, jnp.arange((C + pad) // chunk))
    return counts.reshape(-1)[:C]
