"""Pallas TPU kernels for the Jacobi solver's two sweeps (pressure accel, divergence).

These are the hot ops: each pressure iteration runs both over every level-pair block
(models/grid_physics.py). The generic jnp path materializes (cells, MQ, W) broadcast
intermediates through HBM; these kernels tile cells into VMEM and keep all pair math
in registers, using only Mosaic-friendly 2D ops: the MQ axis is a static unrolled loop,
every per-pair tensor is (T, W), reductions are native lane reduces, and reversed-edge
accumulation happens in-register across the MQ unroll.

Math parity: calculate_particle_pressure_accel (simulation.rs:1750-1808) and
calculate_divergence_iisph (simulation.rs:1552-1592) with the cubic-spline gradient
(sph_kernels.rs:61-71); boundary terms stay factored outside (models/boundary.py).

Channel order (q and candidate sides share it):
  0:x 1:y 2:h 3:rho 4:mass 5:a  (a = pressure for the accel kernel)
  for the divergence kernel: 5:qx-field 6:qy-field (the vector field A)

VMEM layout: blocks are (F, tile, MQ|W) so the wide pair axis sits on lanes; a
channels-last layout pads F=7..8 up to 128 lanes and blows the 16 MB VMEM budget.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PI = math.pi


def _grad_terms(dx, dy, hij):
    """Cubic-spline gradient components (2D), NaN-safe, all (T, W) ops."""
    r2 = dx * dx + dy * dy
    r = jnp.sqrt(r2 + 1e-30)
    q = r / (2.0 * hij)
    v = 1.0 - q
    du = jnp.where(q < 0.5, 18.0 * q * q - 12.0 * q, jnp.where(q < 1.0, -6.0 * v * v, 0.0))
    norm = 10.0 / (7.0 * PI * hij * hij)
    mag = jnp.where(q > 1.0e-5, norm * du / (2.0 * hij) / r, 0.0)
    return mag * dx, mag * dy, r


def _make_kernel(MQ: int, W: int, F: int, mode: str, w2020: bool):
    """mode: 'accel' (out 2ch) or 'div' (out 1ch)."""
    OUT = 2 if mode == "accel" else 1

    def kernel(rs_ref, q_ref, c_ref, oq_ref, oc_ref):
        # q_ref: (F, T, MQ); c_ref: (F, T, W); oq_ref: (OUT, T, MQ); oc_ref: (OUT, T, W)
        scale = rs_ref[0, 0]
        cx = c_ref[0]
        cy = c_ref[1]
        ch = c_ref[2]
        crho = c_ref[3]
        cm = c_ref[4]
        cmask = c_ref[F - 1]
        if mode == "accel":
            cp = c_ref[5]
            c_term = cp / (crho * crho + 1e-30)
        else:
            cax = c_ref[5]
            cay = c_ref[6]

        acc_c0 = jnp.zeros_like(cx)
        acc_c1 = jnp.zeros_like(cx) if mode == "accel" else None

        for m in range(MQ):
            qx = q_ref[0, :, m : m + 1]
            qy = q_ref[1, :, m : m + 1]
            qh = q_ref[2, :, m : m + 1]
            qrho = q_ref[3, :, m : m + 1]
            qm = q_ref[4, :, m : m + 1]
            qmask = q_ref[F - 1, :, m : m + 1]

            dx = qx - cx
            dy = qy - cy
            hij = jnp.maximum(0.5 * (qh + ch), 1e-6)
            gx, gy, r = _grad_terms(dx, dy, hij)
            valid = qmask * cmask * (r < scale * hij).astype(jnp.float32)

            if mode == "accel":
                q_term = q_ref[5, :, m : m + 1] / (qrho * qrho + 1e-30)
                term = (q_term + c_term) * valid
                # fwd: a_i += -m_j * term * grad_i W
                oq_ref[0, :, m : m + 1] = jnp.sum(-cm * term * gx, axis=1, keepdims=True)
                oq_ref[1, :, m : m + 1] = jnp.sum(-cm * term * gy, axis=1, keepdims=True)
                # bwd: a_j += -m_i * term * grad_j W = +m_i * term * grad_i W
                acc_c0 = acc_c0 + qm * term * gx
                acc_c1 = acc_c1 + qm * term * gy
            else:
                qax = q_ref[5, :, m : m + 1]
                qay = q_ref[6, :, m : m + 1]
                dq_dot = (cax - qax) * gx + (cay - qay) * gy
                if w2020:
                    # fwd: sum m_j/rho_j dq.g ; bwd at j: m_i/rho_i dq.g (same dot)
                    oq_ref[0, :, m : m + 1] = jnp.sum(
                        cm / (crho + 1e-30) * dq_dot * valid, axis=1, keepdims=True
                    )
                    acc_c0 = acc_c0 + qm / (qrho + 1e-30) * dq_dot * valid
                else:
                    # raw sums; the host divides by the receiver's rho
                    oq_ref[0, :, m : m + 1] = jnp.sum(cm * dq_dot * valid, axis=1, keepdims=True)
                    acc_c0 = acc_c0 + qm * dq_dot * valid

        oc_ref[0] = acc_c0
        if mode == "accel":
            oc_ref[1] = acc_c1

    return kernel, OUT


@partial(
    jax.jit,
    static_argnames=("MQ", "W", "F", "mode", "w2020", "tile", "interpret"),
)
def solver_block(
    qf,  # (NC, MQ, F) channels with validity as last channel
    cf,  # (NC, W, F)
    radius_scale,
    MQ: int,
    W: int,
    F: int,
    mode: str,
    w2020: bool,
    tile: int = 32,
    interpret: bool = False,
):
    """qf (NC, MQ, F), cf (NC, W, F) -> (out_q (NC, MQ, OUT), out_c (NC, W, OUT))."""
    NC = qf.shape[0]
    pad = (-NC) % tile
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        cf = jnp.pad(cf, ((0, pad), (0, 0), (0, 0)))
    NCP = NC + pad
    # channels-first so the wide pair axis sits on VMEM lanes
    qf_t = jnp.transpose(qf, (2, 0, 1))  # (F, NCP, MQ)
    cf_t = jnp.transpose(cf, (2, 0, 1))  # (F, NCP, W)

    kernel, OUT = _make_kernel(MQ, W, F, mode, w2020)
    rs = jnp.asarray([[radius_scale]], jnp.float32)

    oq, oc = pl.pallas_call(
        kernel,
        grid=(NCP // tile,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F, tile, MQ), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, tile, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((OUT, tile, MQ), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT, tile, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((OUT, NCP, MQ), jnp.float32),
            jax.ShapeDtypeStruct((OUT, NCP, W), jnp.float32),
        ),
        interpret=interpret,
    )(rs, qf_t, cf_t)
    return (
        jnp.transpose(oq, (1, 2, 0))[:NC],
        jnp.transpose(oc, (1, 2, 0))[:NC],
    )
