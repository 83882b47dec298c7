"""JPL-convention quaternion algebra.

Counterpart of ref:include/larvio/math_utils.hpp (quaternionToRotation,
rotationToQuaternion, quaternionMultiplication, smallAngleQuaternion —
SURVEY.md §2 "Math utils"). The math follows the public Trawny & Roumeliotis
tech report "Indirect Kalman Filter for 3D Attitude Estimation" (JPL
convention), which is also the convention of the reference estimator.

Conventions:
  * quaternion layout ``q = [x, y, z, w]`` (vector part first, JPL).
  * ``q`` represents the rotation **global -> local**; ``quat_to_rotation(q)``
    returns ``R`` with ``v_local = R @ v_global``.
  * ``quat_multiply(q1, q2)`` is the JPL product, satisfying
    ``R(q1 ⊗ q2) = R(q1) @ R(q2)``.

All functions are shape-polymorphic over leading batch axes and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from larvio_tpu.core.so3 import skew


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize, and keep the scalar part non-negative (canonical sign)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    sign = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q * sign


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """JPL quaternion product: R(q1 ⊗ q2) = R(q1) R(q2)."""
    x1, y1, z1, w1 = (q1[..., i] for i in range(4))
    x2, y2, z2, w2 = (q2[..., i] for i in range(4))
    # JPL product (Trawny eq. 6): note the sign of the cross term is opposite
    # to the Hamilton convention.
    x = w1 * x2 + x1 * w2 + z1 * y2 - y1 * z2
    y = w1 * y2 + y1 * w2 + x1 * z2 - z1 * x2
    z = w1 * z2 + z1 * w2 + y1 * x2 - x1 * y2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return quat_normalize(jnp.stack([x, y, z, w], axis=-1))


def quat_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """R(q) such that v_local = R @ v_global (Trawny eq. 78)."""
    vec = q[..., :3]
    w = q[..., 3:4]
    vvT = vec[..., :, None] * vec[..., None, :]
    eye = jnp.eye(3, dtype=q.dtype)
    w2 = (2.0 * w[..., None] ** 2 - 1.0)
    return w2 * eye - 2.0 * w[..., None] * skew(vec) + 2.0 * vvT


def rotation_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of quat_to_rotation (Shepperd's branchless-ified method).

    Computes all four candidate solutions and selects the best-conditioned one
    with ``argmax`` — no data-dependent branching, so it vectorizes on TPU.
    """
    Rd = R
    t = jnp.trace(Rd, axis1=-2, axis2=-1)
    r00, r01, r02 = Rd[..., 0, 0], Rd[..., 0, 1], Rd[..., 0, 2]
    r10, r11, r12 = Rd[..., 1, 0], Rd[..., 1, 1], Rd[..., 1, 2]
    r20, r21, r22 = Rd[..., 2, 0], Rd[..., 2, 1], Rd[..., 2, 2]

    # candidate 0: w largest
    w0 = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) / 2.0
    q0 = jnp.stack(
        [(r12 - r21) / (4 * w0), (r20 - r02) / (4 * w0), (r01 - r10) / (4 * w0), w0],
        axis=-1,
    )
    # candidate 1: x largest
    x1 = jnp.sqrt(jnp.maximum(1.0 + r00 - r11 - r22, 1e-12)) / 2.0
    q1 = jnp.stack(
        [x1, (r01 + r10) / (4 * x1), (r02 + r20) / (4 * x1), (r12 - r21) / (4 * x1)],
        axis=-1,
    )
    # candidate 2: y largest
    y2 = jnp.sqrt(jnp.maximum(1.0 - r00 + r11 - r22, 1e-12)) / 2.0
    q2 = jnp.stack(
        [(r01 + r10) / (4 * y2), y2, (r12 + r21) / (4 * y2), (r20 - r02) / (4 * y2)],
        axis=-1,
    )
    # candidate 3: z largest
    z3 = jnp.sqrt(jnp.maximum(1.0 - r00 - r11 + r22, 1e-12)) / 2.0
    q3 = jnp.stack(
        [(r02 + r20) / (4 * z3), (r12 + r21) / (4 * z3), z3, (r01 - r10) / (4 * z3)],
        axis=-1,
    )

    scores = jnp.stack([t, r00, r11, r22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    return quat_normalize(q[..., 0, :])


def small_angle_quat(dtheta: jnp.ndarray) -> jnp.ndarray:
    """First-order quaternion from a small rotation vector (error injection).

    Mirrors ref:math_utils.hpp smallAngleQuaternion: q ≈ [dθ/2, 1], with the
    exact unit-norm completion when |dθ/2| < 1 and renormalization otherwise.
    """
    dq = dtheta / 2.0
    nsq = jnp.sum(dq * dq, axis=-1, keepdims=True)
    small = nsq < 1.0
    w_small = jnp.sqrt(jnp.maximum(1.0 - nsq, 0.0))
    scale = 1.0 / jnp.sqrt(1.0 + nsq)
    vec = jnp.where(small, dq, dq * scale)
    w = jnp.where(small[..., 0], w_small[..., 0], scale[..., 0])
    return jnp.concatenate([vec, w[..., None]], axis=-1)


def _omega(w: jnp.ndarray) -> jnp.ndarray:
    """Ω(ω) matrix of JPL quaternion kinematics: q̇ = ½ Ω(ω) q."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, wz, -wy, wx], axis=-1),
            jnp.stack([-wz, z, wx, wy], axis=-1),
            jnp.stack([wy, -wx, z, wz], axis=-1),
            jnp.stack([-wx, -wy, -wz, z], axis=-1),
        ],
        axis=-2,
    )


def quat_integrate_rk4(q: jnp.ndarray, w0: jnp.ndarray, w1: jnp.ndarray, dt) -> jnp.ndarray:
    """RK4 integration of q̇ = ½Ω(ω)q with ω linearly interpolated w0→w1.

    Counterpart of the RK4 quaternion step inside ref:larvio.cpp
    predictNewState() (SURVEY.md §3.3).
    """
    wm = 0.5 * (w0 + w1)

    def deriv(qq, ww):
        return 0.5 * (_omega(ww) @ qq[..., None])[..., 0]

    k1 = deriv(q, w0)
    k2 = deriv(q + 0.5 * dt * k1, wm)
    k3 = deriv(q + 0.5 * dt * k2, wm)
    k4 = deriv(q + dt * k3, w1)
    qn = q + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return quat_normalize(qn)
