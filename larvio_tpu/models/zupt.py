"""Zero-velocity update (ZUPT).

Counterpart of the reference's closed-form ZUPT (ref:src/larvio.cpp inside
processFeatures; the core contribution of the CJA 2020 paper "Lightweight
hybrid visual-inertial odometry with closed-form zero velocity update",
SURVEY.md §2 "ZUPT").

Detection is image-based: when the mean normalized-plane displacement of
tracked features falls below ``zupt_max_feature_dis`` the platform is declared
stationary. The update constrains velocity to zero and the current pose to
the newest clone's pose (relative rotation/translation zero), which freezes
drift during standstill. Implemented as an always-traced masked update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.quaternion import quat_inverse, quat_multiply, quat_to_rotation
from larvio_tpu.core.so3 import so3_log
from larvio_tpu.models.state import (
    FilterState,
    IDX_P,
    IDX_THETA,
    IDX_V,
    clone_offset,
    state_dim,
)
from larvio_tpu.models.update import apply_update


def detect_stationary(
    cfg: VioConfig,
    mean_motion: jnp.ndarray,
    n_tracked: jnp.ndarray,
    fs: FilterState,
    imu,
) -> jnp.ndarray:
    """Stationarity test: image motion (ref behavior) AND IMU stillness.

    The image test alone cannot certify small velocities at depth (disparity
    = v dt / z), so the gyro rate and specific-force magnitude over the frame
    must also look static — this kills false positives during slow smooth
    ramps that would otherwise let the ZUPT clamp a genuinely moving state.
    """
    fcfg = cfg.filter
    image_still = (mean_motion < fcfg.zupt_max_feature_dis) & (n_tracked >= 5)
    w_mag = jnp.linalg.norm(imu.w - fs.bg[None, :], axis=-1)
    a_mag = jnp.abs(jnp.linalg.norm(imu.a - fs.ba[None, :], axis=-1) - cfg.gravity)
    big = jnp.asarray(0.0, w_mag.dtype)
    imu_still = (
        jnp.max(jnp.where(imu.valid, w_mag, big)) < fcfg.zupt_max_gyro
    ) & (jnp.max(jnp.where(imu.valid, a_mag, big)) < fcfg.zupt_max_acc_dev)
    return image_still & imu_still


def zupt_update(cfg: VioConfig, fs: FilterState, stationary: jnp.ndarray) -> FilterState:
    """9-row masked EKF update: v = 0, dpose(current, newest clone) = 0."""
    if not cfg.filter.enable_zupt:
        return fs
    C = cfg.filter.max_clones
    D = state_dim(cfg)
    dtype = fs.P.dtype
    fcfg = cfg.filter

    # zupt_update runs after this frame's augmentation, so the clone just
    # copied from the current state has residual identically zero with perfect
    # correlation (vacuous rows). Constrain against the newest clone from a
    # PREVIOUS frame instead (ADVICE r1).
    prior = fs.clones.valid & (fs.clones.frame < fs.frame)
    frame = jnp.where(prior, fs.clones.frame, -1)
    newest = jnp.argmax(frame)
    has_clone = jnp.any(prior)
    enable = stationary & has_clone

    q_c = fs.clones.q[newest]
    p_c = fs.clones.p[newest]

    # residuals: z = 0 for [v, log(R R_c^T), p - p_c]
    r_v = -fs.v
    dq = quat_multiply(fs.q, quat_inverse(q_c))
    r_q = -so3_log(quat_to_rotation(dq))
    r_p = p_c - fs.p

    H = jnp.zeros((9, D), dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    H = H.at[0:3, IDX_V : IDX_V + 3].set(eye3)
    # relative rotation phi = log(R R_c^T): with JPL left-perturbations
    # R_true = (I - [dtheta]x) R_hat, the first-order expansion gives
    # phi_true ≈ phi_hat - dtheta + dtheta_c  =>  H_theta = -I, H_theta_c = +I
    H = H.at[3:6, IDX_THETA : IDX_THETA + 3].set(-eye3)
    off = clone_offset(newest)
    Hq_c = jax.lax.dynamic_update_slice(jnp.zeros((3, D), dtype), eye3, (0, off))
    H = H.at[3:6, :].add(Hq_c)
    H = H.at[6:9, IDX_P : IDX_P + 3].set(eye3)
    Hp_c = jax.lax.dynamic_update_slice(jnp.zeros((3, D), dtype), -eye3, (0, off + 3))
    H = H.at[6:9, :].add(Hp_c)

    r = jnp.concatenate([r_v, r_q, r_p])
    noise = jnp.concatenate(
        [
            jnp.full(3, fcfg.zupt_noise_v**2, dtype),
            jnp.full(3, fcfg.zupt_noise_q**2, dtype),
            jnp.full(3, fcfg.zupt_noise_p**2, dtype),
        ]
    )
    # lax.cond, not masking: stationarity is rare in normal motion, and in the
    # scan (non-vmapped) execution path TPU conditionals really do skip the
    # ~100-op update chain. Under fleet vmap this lowers to select (both
    # branches) — identical to the old enable-masked form.
    def do(fs_):
        fs_new, _, _ = apply_update(cfg, fs_, H, r, noise, enable=enable)
        return fs_new

    return jax.lax.cond(enable, do, lambda fs_: fs_, fs)
