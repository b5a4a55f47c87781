"""Pallas contraction kernel vs the jnp grid path (interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# The Pallas contraction path is experimental: Mosaic rejects the trailing-dim
# reshapes the generic edge functions produce (needs the scalarized-channel kernel
# planned for round 2). Runs in interpreter mode on CPU only.
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu" or not os.environ.get("ASPH_PALLAS_TEST"),
    reason="experimental pallas path: CPU interpret mode + ASPH_PALLAS_TEST=1 only",
)

from adaptive_sph_tpu.models import grid_pairs
from adaptive_sph_tpu.ops import grid as grid_mod


def _case(seed=3, n=200, C=512, h_range=(0.04, 0.2)):
    rng = np.random.default_rng(seed)
    pos = np.zeros((C, 2), dtype=np.float32)
    pos[:n] = rng.uniform(-0.5, 0.5, size=(n, 2))
    h = np.full((C,), h_range[0], dtype=np.float32)
    h[:n] = np.exp(rng.uniform(np.log(h_range[0]), np.log(h_range[1]), size=n)).astype(
        np.float32
    )
    alive = np.zeros((C,), dtype=bool)
    alive[:n] = True
    mass = rng.uniform(0.5, 2.0, size=C).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(h), jnp.asarray(alive), jnp.asarray(mass)


@pytest.mark.parametrize("reduce", ["sum", "max"])
def test_pallas_matches_jnp_path(reduce):
    pos, h, alive, mass = _case()
    C = pos.shape[0]
    cfg = grid_mod.make_grid_config((-0.7, -0.7), (0.7, 0.7), 2.0, 0.04, 0.2, C, mpc=16)
    bins = grid_mod.build_bins(pos, h * 2.0, alive, cfg)
    sf = {
        "pos": grid_mod.scatter_field(bins, cfg, pos),
        "h": grid_mod.scatter_field(bins, cfg, h),
        "mass": grid_mod.scatter_field(bins, cfg, mass),
    }

    def edge(vi, vj, geom):
        return {
            "s": vj["mass"] * jnp.exp(-geom.r),
            "v": (vj["mass"])[..., None] * geom.diff,
        }

    ref = grid_pairs.pair_apply(
        cfg, bins, sf, jnp.float32(2.0), edge, reduce=reduce, fill=-np.inf if reduce == "max" else 0.0
    )
    os.environ["ASPH_PALLAS"] = "1"
    try:
        got = grid_pairs.pair_apply(
            cfg, bins, sf, jnp.float32(2.0), edge, reduce=reduce,
            fill=-np.inf if reduce == "max" else 0.0,
        )
    finally:
        os.environ["ASPH_PALLAS"] = "0"

    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        mask = np.isfinite(a)
        np.testing.assert_allclose(b[mask], a[mask], rtol=2e-5, atol=1e-6)
