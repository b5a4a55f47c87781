"""Split-pattern generation, storage, and loading.

Reference parity: adaptivity/splitting.rs —
  generate_tetrahedral_point_set (:386-416)  hex-packed neighbor lattice
  find_optimal_mass              (:418-461)  halving search to rest density
  optimize_split_pattern         (:146-380)  gradient descent on the density-error
                                             objective tau ("Optimized Refinement for
                                             Spatially Adaptive SPH" Eq. 12), 40k iters,
                                             restarts on particle pairing / runaway
  SplitPattern(s) YAML           (:84-120, simulation.rs:2995-3004) — same schema.

The hand-derived Eq.-12 gradient of the reference is replaced by jax.grad of the same
objective E = sum_n m_n tau_n^2 + sum_s m_s tau_s^2 (they coincide analytically); the
optimization loop runs as chunked lax.fori steps on-device.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..ops import kernels

DEFAULT_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "..", "data", "split-patterns.yaml")


def generate_tetrahedral_point_set(distance: float, bound: float) -> np.ndarray:
    """Hex lattice covering [-bound, bound]^2 with one point at the origin (splitting.rs:386-416)."""
    pts = []
    hrow = np.sqrt(3.0) * 0.5
    rmin = int(np.ceil(-bound / hrow))
    rmax = int(np.floor(bound / hrow))
    for row in range(rmin, rmax + 1):
        y = hrow * row
        cshift = 0.0 if row % 2 == 0 else distance / 2.0
        cmin = int(np.ceil((-bound - cshift) / distance))
        cmax = int(np.floor((bound - cshift) / distance))
        for col in range(cmin, cmax + 1):
            pts.append((cshift + col * distance, y))
    return np.asarray(pts, dtype=np.float64)


def find_optimal_mass(initial_mass: float, rest_density: float, positions: np.ndarray) -> float:
    """Halving search for the lattice mass that yields rest density (splitting.rs:418-461)."""
    mass = initial_mass
    mass_update = initial_mass
    max_distance = np.max(np.linalg.norm(positions, axis=-1))
    for _ in range(40):
        # the reference reaches mass <= 0 transiently and recovers via NaN compare
        # semantics (splitting.rs:430-457); we guard explicitly instead
        if mass <= 0.0:
            density = 0.0
        else:
            h = float(kernels.smoothing_length_from_mass(mass, rest_density, 2))
            assert h < max_distance, "lattice too small for neighbor support"
            r = np.linalg.norm(positions, axis=-1)
            density = float(np.sum(mass * np.asarray(kernels.kernel_w(r, h, 2), np.float64)))
        if abs(density - rest_density) < 1e-6:
            return mass
        mass += -mass_update if density > rest_density else mass_update
        mass_update *= 0.5
    raise RuntimeError("find_optimal_mass: too many iterations")


def _objective(pos_s, mass_s, h_s, pos_n, mass_n, h_n, pos_o, mass_o, h_o, rho_o):
    """E = sum_n m_n tau_n^2 + sum_s m_s tau_s^2 (splitting.rs:222-258)."""

    def w(xa, xb, ha, hb):
        d = xa[:, None, :] - xb[None, :, :]
        r = jnp.sqrt(jnp.sum(d * d, -1) + 1e-30)
        return kernels.kernel_w(r, 0.5 * (ha[:, None] + hb[None, :]), 2)

    # tau_n: density change felt by each lattice neighbor
    w_no = kernels.kernel_w(jnp.linalg.norm(pos_n - pos_o, axis=-1), 0.5 * (h_n + h_o), 2)
    tau_n = -mass_o * w_no + jnp.sum(mass_s[None, :] * w(pos_n, pos_s, h_n, h_s), axis=1)

    # tau_s: density error at each child
    w_sk = w(pos_s, pos_s, h_s, h_s)
    w_sn = w(pos_s, pos_n, h_s, h_n)
    tau_s = (
        -rho_o
        + jnp.sum(mass_s[None, :] * w_sk, axis=1)
        + jnp.sum(mass_n[None, :] * w_sn, axis=1)
    )
    return jnp.sum(mass_n * tau_n**2) + jnp.sum(mass_s * tau_s**2), (tau_n, tau_s)


def make_pattern_optimizer(
    s_count: int,
    pos_n: np.ndarray,
    mass: float,
    h: float,
    rest_density: float,
    neighbors_distance: float,
    max_iters: int = 40000,
    check_every: int = 200,
):
    """Build a jitted attempt runner for one child count (compiled once, retried cheaply)."""
    child_mass = mass / s_count
    child_h = float(kernels.smoothing_length_from_mass(child_mass, 1.0, 2))
    mass_s = jnp.full((s_count,), child_mass, jnp.float32)
    h_s = jnp.full((s_count,), child_h, jnp.float32)
    mass_n = jnp.full((pos_n.shape[0],), mass, jnp.float32)
    h_n = jnp.full((pos_n.shape[0],), h, jnp.float32)
    pos_nj = jnp.asarray(pos_n, jnp.float32)
    pos_o = jnp.zeros(2, jnp.float32)

    # rho at the original particle (splitting.rs:209-218)
    r_on = jnp.linalg.norm(pos_nj, axis=-1)
    rho_o = mass * kernels.kernel_w(0.0, h, 2) + jnp.sum(
        mass_n * kernels.kernel_w(r_on, 0.5 * (h_n + h), 2)
    )

    grad_fn = jax.grad(
        lambda ps: _objective(ps, mass_s, h_s, pos_nj, mass_n, h_n, pos_o, mass, h, rho_o)[0]
    )

    min_req_dist = 0.1 * float(kernels.sphere_volume_to_radius(child_mass / rest_density, 2))
    RUNNING, VALID, PAIRING, RUNAWAY = 0, 1, 2, 3

    @partial(jax.jit, static_argnums=())
    def attempt(ps0):
        def cond(c):
            ps, it, status = c
            return (status == RUNNING) & (it < max_iters)

        def body(c):
            ps, it, status = c

            def step(_, p):
                return p - 0.01 * grad_fn(p)

            ps = jax.lax.fori_loop(0, check_every, step, ps)
            it = it + check_every

            d2 = jnp.sum((ps[:, None, :] - ps[None, :, :]) ** 2, -1)
            d2 = d2 + jnp.eye(ps.shape[0]) * 1e9
            paired = jnp.min(d2) < min_req_dist**2
            runaway = jnp.max(jnp.sum(ps * ps, -1)) > (neighbors_distance * 0.99) ** 2
            check = it > 1000
            status = jnp.where(
                check & paired, PAIRING, jnp.where(check & runaway, RUNAWAY, status)
            )
            return ps, it, status

        ps, it, status = jax.lax.while_loop(cond, body, (ps0, 0, RUNNING))
        return ps, jnp.where(status == RUNNING, VALID, status)

    def run(seed: int):
        # RandomInSphere init, radius 0.6 (splitting.rs:170-183, 525)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        angle = jax.random.uniform(k1, (s_count,), minval=0.0, maxval=2.0 * np.pi)
        dist = jnp.sqrt(jax.random.uniform(k2, (s_count,))) * 0.6
        pos_s = jnp.stack([jnp.cos(angle), jnp.sin(angle)], -1) * dist[:, None]
        ps, status = attempt(pos_s)
        name = {VALID: "valid", PAIRING: "pairing", RUNAWAY: "runaway"}[int(status)]
        return np.asarray(ps), name

    return run


def precalculate_split_pattern(num_children: int, rest_density: float = 1.0, max_retries: int = 300):
    """Full pipeline for one pattern (splitting.rs:463-548)."""
    bound = (
        2.0
        * kernels.SUPPORT_RADIUS_BY_SMOOTHING_LENGTH
        * float(kernels.smoothing_length_from_volume(kernels.radius_to_sphere_volume(1.0, 2), 2))
    )
    neighbors_distance = 1.0
    pos_n = generate_tetrahedral_point_set(neighbors_distance, bound)
    mass = find_optimal_mass(1.0, rest_density, pos_n)

    # rescale so the particle radius is 1 (splitting.rs:484-494)
    r = float(kernels.sphere_volume_to_radius(mass / rest_density, 2))
    pos_n = pos_n / r
    neighbors_distance /= r
    mass = float(kernels.radius_to_sphere_volume(1.0, 2)) * rest_density
    h = float(kernels.smoothing_length_from_mass(mass, rest_density, 2))

    # drop the origin point (it becomes the split particle)
    norms = np.linalg.norm(pos_n, axis=-1)
    origin = int(np.argmin(norms))
    assert norms[origin] < 1e-9
    pos_n = np.delete(pos_n, origin, axis=0)

    run = make_pattern_optimizer(num_children, pos_n, mass, h, rest_density, neighbors_distance)
    for retry in range(max_retries):
        pos_s, status = run(seed=num_children * 1000 + retry)
        if status == "valid":
            child_mass = mass / num_children
            child_h = float(kernels.smoothing_length_from_mass(child_mass, 1.0, 2))
            return {
                "mass_s": [child_mass] * num_children,
                "pos_s": [[float(x), float(y)] for x, y in pos_s],
                "h_s": [child_h] * num_children,
            }
    raise RuntimeError(f"no valid split pattern found num_children={num_children}")


def generate_split_patterns(max_num_children: int):
    """Patterns for n = 2..max (simulation.rs:2985-2993); list index k -> k+2 children."""
    return [precalculate_split_pattern(n) for n in range(2, max_num_children + 1)]


def save_patterns(patterns: list, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(patterns, f)


def load_patterns_yaml(path: str):
    with open(path) as f:
        raw = yaml.safe_load(f)
    for i, p in enumerate(raw):
        assert len(p["pos_s"]) == i + 2, "pattern list must start at 2 children"
    return raw


def to_padded_table(patterns: list):
    """(P, MAXC, 2) padded position table + (P,) child counts for the jitted splitter."""
    P = len(patterns)
    maxc = max(len(p["pos_s"]) for p in patterns)
    pos = np.zeros((P, maxc, 2), np.float32)
    counts = np.zeros((P,), np.int32)
    for k, p in enumerate(patterns):
        n = len(p["pos_s"])
        pos[k, :n] = np.asarray(p["pos_s"], np.float32)
        counts[k] = n
    # counts stay host-side numpy: the splitter derives its static child-count cap
    # from them at trace time
    return jnp.asarray(pos), counts


def load_default_patterns(path: str = None):
    path = path or os.environ.get("ASPH_SPLIT_PATTERNS", DEFAULT_PATTERN_PATH)
    return to_padded_table(load_patterns_yaml(path))


def export_pattern_svg(pattern: dict, path: str, size: int = 512):
    """Debug SVG of one split pattern (splitting.rs:550-640 counterpart):
    the parent particle (radius-1 outline, its kernel support dashed) and the
    filled child circles at their physical radii."""
    import math

    pos = pattern["pos_s"]
    n = len(pos)
    child_r = float(kernels.sphere_volume_to_radius(
        kernels.radius_to_sphere_volume(1.0, 2) / n, 2))
    h = float(kernels.smoothing_length_from_mass(
        float(kernels.radius_to_sphere_volume(1.0, 2)) / 1.0, 1.0, 2))
    support = 2.0 * h  # parent kernel support radius
    half = support * 1.1
    s = size / (2 * half)

    def cx(v):
        return (v + half) * s

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}" '
        f'viewBox="0 0 {size} {size}">',
        f'<rect width="{size}" height="{size}" fill="white"/>',
        f'<circle cx="{cx(0):.2f}" cy="{cx(0):.2f}" r="{support*s:.2f}" '
        'fill="none" stroke="#999" stroke-dasharray="6,4" stroke-width="1.5"/>',
        f'<circle cx="{cx(0):.2f}" cy="{cx(0):.2f}" r="{1.0*s:.2f}" '
        'fill="none" stroke="#333" stroke-width="2"/>',
    ]
    for k, (x, y) in enumerate(pos):
        hue = int(360 * k / max(n, 1))
        parts.append(
            f'<circle cx="{cx(float(x)):.2f}" cy="{cx(float(y)):.2f}" '
            f'r="{child_r*s:.2f}" fill="hsl({hue},70%,60%)" fill-opacity="0.75" '
            'stroke="#222" stroke-width="1"/>'
        )
    dist = [math.hypot(float(x), float(y)) for x, y in pos]
    parts.append(
        f'<text x="8" y="{size-10}" font-family="monospace" font-size="14">'
        f'n={n} r_child={child_r:.3f} max|x|={max(dist):.3f}</text>'
    )
    parts.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(parts))
