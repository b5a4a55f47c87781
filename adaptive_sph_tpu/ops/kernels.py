"""SPH cubic-spline kernels and dimension utilities, vectorized for TPU.

Reference parity: /root/reference/src/simulation/sph_kernels.rs
  - cubic_kernel_unnormalized / _deriv       (sph_kernels.rs:23-43)
  - 2D norm 10/(7*pi*h^2), 3D norm 1/(pi*h^3), argument q = r / (2h)
    i.e. the *support radius* is 2x the smoothing length h (sph_kernels.rs:49-56, 198-199)
  - symmetrized pair smoothing length h_ij = (h_i + h_j)/2 (sph_kernels.rs:273-278)
  - ETA = 1.9, h = ETA * volume_to_radius(m / rho0) (simulation.rs:369-380)

Everything here is pure jnp, shape-polymorphic, and differentiable; the hot pair sweeps
that call into these are fused by XLA (and by Pallas kernels in ops/pallas_sweeps.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FT = jnp.float32

PI = float(np.pi)

# Support radius = SUPPORT_RADIUS_BY_SMOOTHING_LENGTH * smoothing length.
# (sph_kernels.rs:198-199 `support_radius_by_smoothing_length() = 2`)
SUPPORT_RADIUS_BY_SMOOTHING_LENGTH = 2.0

# "Achieved by 55 neighbors in 3D" (simulation.rs:369)
ETA = 1.9


def cubic_kernel_unnormalized(q):
    """Un-normalized cubic spline, piecewise on q = r / (2h).  sph_kernels.rs:23-32."""
    q = jnp.asarray(q)
    v = 1.0 - q
    inner = 6.0 * (q * q * q - q * q) + 1.0
    outer = 2.0 * v * v * v
    return jnp.where(q < 0.5, inner, jnp.where(q < 1.0, outer, 0.0))


def cubic_kernel_unnormalized_deriv(q):
    """d/dq of the un-normalized cubic spline.  sph_kernels.rs:34-43."""
    q = jnp.asarray(q)
    v = 1.0 - q
    inner = 18.0 * q * q - 12.0 * q
    outer = -6.0 * v * v
    return jnp.where(q < 0.5, inner, jnp.where(q < 1.0, outer, 0.0))


def kernel_norm_factor(h, dim: int):
    """Normalization so the kernel integrates to one over R^dim.  sph_kernels.rs:50,54."""
    if dim == 2:
        return 10.0 / (7.0 * PI * (h * h))
    elif dim == 3:
        return 1.0 / (PI * (h * h * h))
    raise ValueError(f"unsupported dimension {dim}")


def kernel_w(r, h, dim: int = 2):
    """W(r, h) with support radius 2h.  sph_kernels.rs:49-56 (cubic_kernel_2d/3d)."""
    return kernel_norm_factor(h, dim) * cubic_kernel_unnormalized(r / (2.0 * h))


def kernel_grad(diff, h, dim: int = 2):
    """dW/dx where W = W(|diff|, h); diff has trailing axis of size `dim`.

    Matches cubic_kernel_2d_deriv (sph_kernels.rs:61-71): returns 0 for q <= 1e-5.
    `h` broadcasts against diff[..., 0].
    """
    r2 = jnp.sum(diff * diff, axis=-1)
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    q = r / (2.0 * h)
    safe = q > 1.0e-5
    direction = diff / r[..., None]
    mag = kernel_norm_factor(h, dim) * cubic_kernel_unnormalized_deriv(q) / (2.0 * h)
    grad = mag[..., None] * direction
    return jnp.where(safe[..., None], grad, 0.0)


def kernel_dw_dH(d, H, dim: int = 2):
    """Derivative of W w.r.t. the *support radius* H (= 2h), at distance d.

    Used by the IISPH2 Omega correction (simulation.rs:2266-2276 `dwdh`):
      W(d, H) = cd / H^2 * u(d/H) with cd = 40/(7*pi)   [2D]
      dW/dH   = cd * (-D)/H^3 * u(q) + cd/H^2 * u'(q) * (-d/H^2)
    """
    assert dim == 2, "reference asserts D == 2 for the Omega correction"
    cd = 40.0 / (7.0 * PI)
    q = d / H
    w = cubic_kernel_unnormalized(q)
    wd = cubic_kernel_unnormalized_deriv(q)
    return cd * (-float(dim)) / (H * H * H) * w + cd / (H * H) * wd * (-d / (H * H))


def sphere_volume_to_radius(volume, dim: int = 2):
    """2D: area -> circle radius; 3D: volume -> sphere radius.  sph_kernels.rs:203-206,254-257."""
    if dim == 2:
        return jnp.sqrt(volume / PI)
    elif dim == 3:
        return (volume * (3.0 / (4.0 * PI))) ** (1.0 / 3.0)
    raise ValueError(f"unsupported dimension {dim}")


def radius_to_sphere_volume(r, dim: int = 2):
    """Inverse of sphere_volume_to_radius.  sph_kernels.rs:209-211,259-261."""
    if dim == 2:
        return PI * r * r
    elif dim == 3:
        return 4.0 * PI / 3.0 * r * r * r
    raise ValueError(f"unsupported dimension {dim}")


def smoothing_length_from_volume(volume, dim: int = 2):
    """h = ETA * volume_to_radius(V).  simulation.rs:371-374."""
    return ETA * sphere_volume_to_radius(volume, dim)


def smoothing_length_from_mass(mass, rest_density, dim: int = 2):
    """h = ETA * volume_to_radius(m / rho0).  simulation.rs:376-380."""
    return smoothing_length_from_volume(mass / rest_density, dim)


def optimal_neighbor_number(dim: int = 2):
    """(ETA * 2)^D, approx 14.44 in 2D.  simulation.rs:386-388."""
    return (ETA * SUPPORT_RADIUS_BY_SMOOTHING_LENGTH) ** dim


def pair_smoothing_length(h_i, h_j):
    """Symmetrized h_ij = (h_i + h_j) / 2 for adaptive sizes.  sph_kernels.rs:273-278."""
    return (h_i + h_j) * 0.5
