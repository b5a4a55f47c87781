"""FluidState: the fixed-capacity SoA particle store as one JAX pytree.

Replaces the reference's `decl_particle_vec!` ParticleVec (simulation.rs:240-334):
all 27 per-particle arrays become fixed-capacity (C,) / (C, D) device buffers plus an
alive mask and an alive count `n`, so split/merge/share change the particle count
without changing shapes (no XLA retraces — SURVEY.md section 7 hard part #1).

The reference's LevelEstimationState enum (FluidSurface(dist) | FluidInterior,
simulation.rs:197-211) is represented as `level` (f32) + `has_level` (bool).
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp
import numpy as np

from ..ops import kernels


@struct.dataclass
class FluidState:
    # core physical state
    mass: jnp.ndarray  # (C,)
    position: jnp.ndarray  # (C, D)
    velocity: jnp.ndarray  # (C, D)
    pressure_accel: jnp.ndarray  # (C, D)
    density: jnp.ndarray  # (C,)
    ppe_source_term: jnp.ndarray  # (C,)
    pressure: jnp.ndarray  # (C,)
    pressure_div: jnp.ndarray  # (C,) last divergence-solve pressure (warm starts)
    aii: jnp.ndarray  # (C,)
    density_error: jnp.ndarray  # (C,)
    omega: jnp.ndarray  # (C,)  IISPH2 Omega correction

    # per-particle smoothing lengths (reference h2 / h2_next)
    h: jnp.ndarray  # (C,)
    h_next: jnp.ndarray  # (C,)

    # level estimation (surface distance field)
    level: jnp.ndarray  # (C,) signed distance estimate, valid iff has_level
    has_level: jnp.ndarray  # (C,) bool: FluidSurface vs FluidInterior
    level_old: jnp.ndarray  # (C,)

    # adaptivity
    size_class: jnp.ndarray  # (C,) int32 ParticleSizeClass
    constant_field: jnp.ndarray  # (C,) <1>_i diagnostic
    stash: jnp.ndarray  # (C,) visualization stash

    # flags + counts
    flag_neighborhood_reduced: jnp.ndarray  # (C,) bool
    flag_is_fluid_surface: jnp.ndarray  # (C,) bool
    flag_insufficient_neighs: jnp.ndarray  # (C,) bool
    neighbor_count: jnp.ndarray  # (C,) int32

    # liveness
    alive: jnp.ndarray  # (C,) bool
    n: jnp.ndarray  # () int32 — number of alive particles (alive is the first n slots
    #                  after compaction; ops rely only on the mask)

    # simulation clock
    time: jnp.ndarray  # () f32
    step_number: jnp.ndarray  # () int32

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    @property
    def dim(self) -> int:
        return self.position.shape[1]


# ParticleSizeClass encoding (adaptivity/mod.rs:11-27)
SIZE_TOO_SMALL = 0
SIZE_SMALL = 1
SIZE_OPTIMAL = 2
SIZE_LARGE = 3
SIZE_TOO_LARGE = 4


def init_state(
    positions: np.ndarray,
    velocities: np.ndarray,
    masses: np.ndarray,
    capacity: int,
    uniform_sizes: bool,
    rest_density: float = 1.0,
) -> FluidState:
    """Build the initial state (FluidSimulation::new, simulation.rs:486-533).

    h is initialized from mass in adaptive mode (h2_next <- from mass, applied on the
    first step); zero in uniform mode (the global params.h is used instead).
    """
    n = positions.shape[0]
    dim = positions.shape[1]
    assert n <= capacity, f"{n} particles exceed capacity {capacity}"

    def pad(a, shape, dtype=np.float32, fill=0):
        out = np.full(shape, fill, dtype=dtype)
        out[:n] = a
        return jnp.asarray(out)

    if uniform_sizes:
        h_init = np.zeros(n, dtype=np.float32)
    else:
        h_init = np.asarray(
            h_from_mass_np(np.asarray(masses, np.float64), rest_density, dim),
            dtype=np.float32,
        )

    zeros_c = jnp.zeros((capacity,), jnp.float32)
    zeros_cd = jnp.zeros((capacity, dim), jnp.float32)
    false_c = jnp.zeros((capacity,), bool)

    alive = np.zeros(capacity, dtype=bool)
    alive[:n] = True

    return FluidState(
        mass=pad(masses, (capacity,)),
        position=pad(positions, (capacity, dim)),
        velocity=pad(velocities, (capacity, dim)),
        pressure_accel=zeros_cd,
        density=zeros_c,
        ppe_source_term=zeros_c,
        pressure=zeros_c,
        pressure_div=zeros_c,
        aii=zeros_c,
        density_error=zeros_c,
        omega=jnp.ones((capacity,), jnp.float32),
        h=pad(h_init, (capacity,)),
        h_next=pad(h_init, (capacity,)),
        level=zeros_c,
        has_level=false_c,
        level_old=zeros_c,
        size_class=jnp.full((capacity,), SIZE_OPTIMAL, jnp.int32),
        constant_field=zeros_c,
        stash=zeros_c,
        flag_neighborhood_reduced=false_c,
        flag_is_fluid_surface=false_c,
        flag_insufficient_neighs=false_c,
        neighbor_count=jnp.zeros((capacity,), jnp.int32),
        alive=jnp.asarray(alive),
        n=jnp.int32(n),
        time=jnp.float32(0.0),
        step_number=jnp.int32(0),
    )


def h_from_mass_np(mass, rest_density, dim: int = 2):
    """Host-side h = ETA * volume_to_radius(m/rho0) (simulation.rs:376-380) in
    pure numpy — device roundtrips cost ~1 s each through the axon tunnel."""
    v = np.asarray(mass) / rest_density
    if dim == 2:
        r = np.sqrt(v / np.pi)
    else:
        r = (v * (3.0 / (4.0 * np.pi))) ** (1.0 / 3.0)
    return kernels.ETA * r


def default_capacity(n: int, adaptive: bool, headroom: float = 1.125) -> int:
    """Round capacity up to a TPU-friendly multiple of 1024.

    The packed tile layout (ops/tiles.py) consumes no capacity on padding, so
    non-adaptive scenes only need slack for numerical safety; adaptive scenes
    keep 2x for resampling growth (capacity still grows on overflow)."""
    target = int(n * (headroom if not adaptive else max(headroom, 2.0)))
    return max(1024, ((target + 1023) // 1024) * 1024)
