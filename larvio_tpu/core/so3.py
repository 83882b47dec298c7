"""SO(3) utilities: skew operator, exponential/log maps.

Counterpart of ref:math_utils.hpp skewSymmetric (SURVEY.md §2) plus the
exp/log maps needed by the initializer and evaluation code. Taylor fallbacks
near zero keep everything branch-free and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix: skew(v) @ u == cross(v, u). Batched over leading axes."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with second-order Taylor fallback near ||phi|| = 0."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = skew(phi)
    K2 = K @ K
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map (rotation vector); stable for small angles, |angle| < pi - eps."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = theta[..., None] < 1e-6
    scale = jnp.where(small, 0.5 + theta[..., None] ** 2 / 12.0, theta[..., None] / (2.0 * jnp.sin(theta[..., None])))
    return w * scale
