"""Neighbor search vs O(C^2) ground truth — uniform, adaptive, and extreme ratios.

Mirrors the reference's check_correct_neighborhood / R*-tree invariants
(simulation.rs:1810-1863, neighborhood_search.rs:187-238): a pair interacts iff
|x_ij| < radius_scale * (h_i + h_j)/2, lists are symmetric, contain self, no dupes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_sph_tpu.ops import neighbors as nbr
from adaptive_sph_tpu.ops import pairwise


def make_case(seed, n, C, h_range, extent=2.0):
    rng = np.random.default_rng(seed)
    pos = np.zeros((C, 2), dtype=np.float32)
    pos[:n] = rng.uniform(-extent / 2, extent / 2, size=(n, 2))
    h = np.full((C,), h_range[0], dtype=np.float32)
    h[:n] = np.exp(rng.uniform(np.log(h_range[0]), np.log(h_range[1]), size=n)).astype(np.float32)
    alive = np.zeros((C,), dtype=bool)
    alive[:n] = True
    return jnp.asarray(pos), jnp.asarray(h), jnp.asarray(alive)


def reference_pairs(pos, h, alive, scale):
    pos, h, alive = map(np.asarray, (pos, h, alive))
    diff = pos[:, None, :] - pos[None, :, :]
    r2 = (diff**2).sum(-1)
    s = scale * 0.5 * (h[:, None] + h[None, :])
    return (r2 < s * s) & alive[:, None] & alive[None, :]


def symmetric_edge_matrix(nb):
    """Expand the forward structure into a dense symmetric adjacency (tests only)."""
    C, K = nb.idx.shape
    idx, mask, cross = map(np.asarray, (nb.idx, nb.mask, nb.cross))
    adj = np.zeros((C, C), dtype=bool)
    rows = np.repeat(np.arange(C), K)
    cols = idx.reshape(-1)
    m = mask.reshape(-1)
    adj[rows[m], cols[m]] = True
    cm = cross.reshape(-1)
    adj[cols[cm], rows[cm]] = True  # reversed cross edges
    return adj


@pytest.mark.parametrize(
    "seed,n,C,h_range,levels,scale",
    [
        (0, 200, 256, (0.05, 0.05), 1, 2.0),  # uniform
        (1, 300, 512, (0.03, 0.12), 4, 2.0),  # mild adaptivity
        (2, 250, 256, (0.02, 1.0), 8, 2.0),  # 50:1 ratio
        (3, 200, 256, (0.05, 0.05), 1, 2.894736),  # extended level-estimation radius
        (4, 300, 512, (0.03, 0.12), 4, 2.894736),
    ],
)
def test_neighborhood_matches_bruteforce(seed, n, C, h_range, levels, scale):
    pos, h, alive = make_case(seed, n, C, h_range)
    cfg = nbr.NeighborConfig(capacity=C, row_width=96, levels=levels, max_per_cell=64)
    nb = nbr.build_neighborhood(pos, h, alive, jnp.float32(scale), cfg)

    assert int(nb.row_overflow) == 0
    assert int(nb.cell_overflow) == 0
    assert int(nb.level_overflow) == 0

    adj = symmetric_edge_matrix(nb)
    ref = reference_pairs(pos, h, alive, scale)
    np.testing.assert_array_equal(adj, ref)

    # symmetric counts match ground truth (includes self)
    np.testing.assert_array_equal(np.asarray(nb.count)[np.asarray(alive)], ref.sum(1)[np.asarray(alive)])


def test_no_duplicate_forward_entries():
    pos, h, alive = make_case(5, 300, 512, (0.03, 0.3))
    cfg = nbr.NeighborConfig(capacity=512, row_width=96, levels=6, max_per_cell=64)
    nb = nbr.build_neighborhood(pos, h, alive, jnp.float32(2.0), cfg)
    idx, mask = np.asarray(nb.idx), np.asarray(nb.mask)
    for i in range(512):
        row = idx[i][mask[i]]
        assert len(row) == len(set(row.tolist()))
        if alive[i]:
            assert i in row  # self neighbor (neighborhood_search.rs:191-195)


def test_filter_down_matches_bruteforce():
    pos, h, alive = make_case(6, 300, 512, (0.03, 0.12))
    cfg = nbr.NeighborConfig(capacity=512, row_width=128, levels=4, max_per_cell=64)
    ext = jnp.float32(5.5 / 1.9)
    nb = nbr.build_neighborhood(pos, h, alive, ext, cfg)
    nb2 = nbr.filter_down(nb, pos, h, alive, jnp.float32(2.0), 4)
    adj = symmetric_edge_matrix(nb2)
    ref = reference_pairs(pos, h, alive, 2.0)
    np.testing.assert_array_equal(adj, ref)


def test_sym_sum_matches_dense():
    pos, h, alive = make_case(7, 250, 256, (0.02, 0.5))
    cfg = nbr.NeighborConfig(capacity=256, row_width=96, levels=8, max_per_cell=64)
    nb = nbr.build_neighborhood(pos, h, alive, jnp.float32(2.0), cfg)

    rng = np.random.default_rng(7)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, size=256).astype(np.float32))

    def edge(vi, vj):
        d = vi["pos"] - vj["pos"]
        return vj["mass"] * jnp.exp(-jnp.sum(d * d, -1))

    got = pairwise.sym_sum(nb, {"pos": pos, "mass": mass}, edge)

    ref_adj = reference_pairs(pos, h, alive, 2.0)
    posn, massn = np.asarray(pos), np.asarray(mass)
    d = posn[:, None, :] - posn[None, :, :]
    dense = (massn[None, :] * np.exp(-(d**2).sum(-1)) * ref_adj).sum(1)
    np.testing.assert_allclose(np.asarray(got)[np.asarray(alive)], dense[np.asarray(alive)], rtol=2e-4)


def test_sym_max_matches_dense():
    pos, h, alive = make_case(8, 250, 256, (0.02, 0.5))
    cfg = nbr.NeighborConfig(capacity=256, row_width=96, levels=8, max_per_cell=64)
    nb = nbr.build_neighborhood(pos, h, alive, jnp.float32(2.0), cfg)

    def edge(vi, vj):
        d = vi["pos"] - vj["pos"]
        return vj["h"] - jnp.sqrt(jnp.sum(d * d, -1) + 1e-12)

    got = pairwise.sym_max(nb, {"pos": pos, "h": h}, edge, fill=-np.inf)

    ref_adj = reference_pairs(pos, h, alive, 2.0)
    posn, hn = np.asarray(pos), np.asarray(h)
    d = np.sqrt(((posn[:, None, :] - posn[None, :, :]) ** 2).sum(-1) + 1e-12)
    vals = np.where(ref_adj, hn[None, :] - d, -np.inf)
    dense = vals.max(1)
    a = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(got)[a], dense[a], rtol=1e-4, atol=1e-6)
