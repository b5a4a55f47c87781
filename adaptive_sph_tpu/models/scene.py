"""Scene construction: YAML scene -> initial FluidState + boundary handler.

Reference parity: SceneConfig/SceneFluidBlock (simulation.rs:3052-3072), add_fluid_block
grid fill (:2915-2983), boundary handler selection (:3137-3213), init_fluid_sim (:3074).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import yaml

from ..ops import sdf as sdf_mod
from ..utils.params import InitBoundaryHandlerType, ParticleSizes, SimulationParams
from . import boundary as bnd
from .state import FluidState, default_capacity, init_state

INIT_REST_DENSITY = 1.0  # simulation.rs:344


@dataclasses.dataclass(frozen=True)
class SceneFluidBlock:
    pos: tuple
    size: tuple
    spacing: float
    volume_fill_ratio: float
    velocity: tuple


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    boundary_type: str
    boundary_width: float
    boundary_height: float
    blocks: tuple


def load_scene(path: str) -> SceneConfig:
    with open(path) as f:
        d = yaml.safe_load(f)
    return scene_from_dict(d)


def scene_from_dict(d: dict) -> SceneConfig:
    blocks = tuple(
        SceneFluidBlock(
            pos=tuple(float(x) for x in b["pos"]),
            size=tuple(float(x) for x in b["size"]),
            spacing=float(b["spacing"]),
            volume_fill_ratio=float(b["volume_fill_ratio"]),
            velocity=tuple(float(x) for x in b["velocity"]),
        )
        for b in d["blocks"]
    )
    return SceneConfig(
        boundary_type=str(d["boundary"]["type"]),
        boundary_width=float(d["boundary"]["width"]),
        boundary_height=float(d["boundary"]["height"]),
        blocks=blocks,
    )


def add_fluid_block(block: SceneFluidBlock):
    """Grid-fill one block (simulation.rs:2915-2983): mass = spacing^2 * fill * rho0."""
    particle_volume = block.spacing * block.spacing * block.volume_fill_ratio
    particle_mass = particle_volume * INIT_REST_DENSITY

    nx = int(np.floor(block.size[0] / block.spacing))
    ny = int(np.floor(block.size[1] / block.spacing))
    xs = np.arange(nx, dtype=np.float32) * block.spacing + block.pos[0]
    ys = np.arange(ny, dtype=np.float32) * block.spacing + block.pos[1]
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    positions = np.stack([gx.ravel(), gy.ravel()], axis=-1)
    masses = np.full(positions.shape[0], particle_mass, dtype=np.float32)
    velocities = np.tile(np.asarray(block.velocity, np.float32), (positions.shape[0], 1))
    return positions, masses, velocities


def make_boundary_handler(scene: SceneConfig, params: SimulationParams):
    """Boundary handler selection (simulation.rs:3137-3213). Scene center is (0,0)."""
    w2, h2 = scene.boundary_width / 2.0, scene.boundary_height / 2.0
    bmin, bmax = (-w2, -h2), (w2, h2)

    t = params.init_boundary_handler
    if t == InitBoundaryHandlerType.NoBoundary:
        return bnd.NoBoundaryHandler()
    if t == InitBoundaryHandlerType.AnalyticOverestimate:
        return bnd.WinchenbachBoundary(sdfs=tuple(sdf_mod.boundary_box_planes(bmin, bmax)))
    if t == InitBoundaryHandlerType.AnalyticUnderestimate:
        return bnd.WinchenbachBoundary(sdfs=(sdf_mod.boundary_box_polygon(bmin, bmax),))
    if t == InitBoundaryHandlerType.Particles:
        # uniformly sample the box edges at the smallest block spacing (simulation.rs:3138-3184)
        spacing = min(b.spacing for b in scene.blocks)
        nh = int(np.floor(scene.boundary_width / spacing))
        nv = int(np.floor(scene.boundary_height / spacing))
        bw, bh = nh * spacing, nv * spacing
        minx, miny = -bw / 2.0, -bh / 2.0
        maxx, maxy = bw / 2.0, bh / 2.0
        pts = []
        for edge in range(4):
            if edge == 0:
                start, d, n = (minx, miny), (spacing, 0.0), nh
            elif edge == 1:
                start, d, n = (maxx, miny), (0.0, spacing), nv
            elif edge == 2:
                start, d, n = (maxx, maxy), (-spacing, 0.0), nh
            else:
                start, d, n = (minx, maxy), (0.0, -spacing), nv
            for i in range(n):
                pts.append((start[0] + d[0] * i, start[1] + d[1] * i))
        return bnd.build_particle_boundary(np.asarray(pts, np.float32), params)
    raise ValueError(t)


def init_fluid_state(
    scene: SceneConfig, params: SimulationParams, capacity: Optional[int] = None
) -> FluidState:
    """Blocks -> particles -> padded FluidState (init_fluid_sim, simulation.rs:3074-3231)."""
    parts = [add_fluid_block(b) for b in scene.blocks]
    positions = np.concatenate([p[0] for p in parts], axis=0)
    masses = np.concatenate([p[1] for p in parts], axis=0)
    velocities = np.concatenate([p[2] for p in parts], axis=0)

    adaptive = params.particle_sizes == ParticleSizes.Adaptive
    if capacity is None:
        # the 2x resampling headroom only matters when the particle count can
        # actually grow — splitting is the only count-increasing operation
        # (splitting.rs:56-58; merge/share only remove or redistribute), so
        # adaptive-sized but non-splitting configs (e.g. the ratio-stress
        # bench) take the lean pad: every VMEM table, lane-padded solver
        # operand and sort is sized by capacity
        capacity = default_capacity(positions.shape[0],
                                    adaptive and params.splitting)

    return init_state(
        positions, velocities, masses, capacity,
        uniform_sizes=not adaptive, rest_density=INIT_REST_DENSITY,
    )
