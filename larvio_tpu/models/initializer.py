"""Filter initialization.

Counterpart of ref:Initializer/{FlexibleInitializer,StaticInitializer}
(SURVEY.md §3.4). The static path runs fully on-device as a masked
accumulator inside the step: IMU samples accrue into running moments until
enough are buffered; if the accumulated accelerometer variance certifies
stationarity, the filter state is bootstrapped:

  * gravity direction from the mean specific force -> initial roll/pitch,
  * gyro bias from the mean angular rate,
  * v = 0, p = 0, initial covariance from config.

The dynamic (VINS-style SFM + visual-inertial alignment) path of the
reference (ref:Initializer/DynamicInitializer et al.) covers in-motion starts
and is tracked as future work in ROADMAP.md.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from larvio_tpu.config import VioConfig
from larvio_tpu.core.quaternion import rotation_to_quat
from larvio_tpu.core.so3 import skew
from larvio_tpu.models.propagation import ImuBatch
from larvio_tpu.models.state import FilterState, initial_covariance


@struct.dataclass
class InitAccumulator:
    """Running IMU moments + image-motion evidence for the static initializer."""

    sum_w: jnp.ndarray  # (3,)
    sum_a: jnp.ndarray  # (3,)
    sum_a2: jnp.ndarray  # () sum |a|^2
    count: jnp.ndarray  # () int32
    last_t: jnp.ndarray  # ()
    sum_motion: jnp.ndarray  # () sum of per-frame mean image motion
    n_frames: jnp.ndarray  # () int32 frames in this window

    @classmethod
    def zero(cls, dtype=jnp.float32):
        return cls(
            sum_w=jnp.zeros(3, dtype),
            sum_a=jnp.zeros(3, dtype),
            sum_a2=jnp.asarray(0.0, dtype),
            count=jnp.asarray(0, jnp.int32),
            last_t=jnp.asarray(0.0, dtype),
            sum_motion=jnp.asarray(0.0, dtype),
            n_frames=jnp.asarray(0, jnp.int32),
        )


def accumulate(
    acc: InitAccumulator, imu: ImuBatch, mean_motion: jnp.ndarray
) -> InitAccumulator:
    """Fold one frame's IMU samples + image-motion summary into the window.

    ``mean_motion`` is the front-end's per-frame mean normalized-plane track
    displacement (1.0 sentinel = "nothing tracked", which conservatively
    reads as motion).
    """
    m = imu.valid
    mf = m.astype(imu.a.dtype)
    return acc.replace(
        sum_w=acc.sum_w + jnp.sum(imu.w * mf[:, None], axis=0),
        sum_a=acc.sum_a + jnp.sum(imu.a * mf[:, None], axis=0),
        sum_a2=acc.sum_a2 + jnp.sum(jnp.sum(imu.a * imu.a, axis=-1) * mf),
        count=acc.count + jnp.sum(m).astype(jnp.int32),
        last_t=jnp.maximum(acc.last_t, jnp.max(jnp.where(m, imu.t, -jnp.inf))),
        sum_motion=acc.sum_motion + mean_motion.astype(acc.sum_motion.dtype),
        n_frames=acc.n_frames + 1,
    )


def gravity_aligned_quat(mean_a: jnp.ndarray) -> jnp.ndarray:
    """JPL world->IMU quaternion with R @ [0,0,1] = normalize(mean_a).

    Stationary accelerometers measure +g along 'up' in the body frame, so the
    initial attitude must rotate the world z-axis onto the measured specific
    force direction (yaw is left at zero — unobservable).
    """
    a_dir = mean_a / jnp.maximum(jnp.linalg.norm(mean_a), 1e-9)
    e_z = jnp.array([0.0, 0.0, 1.0], mean_a.dtype)
    v = jnp.cross(e_z, a_dir)
    s = jnp.linalg.norm(v)
    c = jnp.dot(e_z, a_dir)
    # Rodrigues from e_z to a_dir, guarded for the aligned case
    vx = skew(v)
    R = (
        jnp.eye(3, dtype=mean_a.dtype)
        + vx
        + (vx @ vx) * ((1.0 - c) / jnp.maximum(s * s, 1e-12))
    )
    R = jnp.where(s < 1e-6, jnp.eye(3, dtype=mean_a.dtype), R)
    return rotation_to_quat(R)


def try_static_init(cfg: VioConfig, fs: FilterState, acc: InitAccumulator):
    """Masked static initialization: returns (fs', acc', did_init).

    Stationarity needs BOTH accelerometer-variance AND image stillness over
    the window. The image gate is REQUIRED evidence, not a refinement:
    constant-velocity translation is IMU-indistinguishable from rest
    (a = R g, w = bias in both; the gyro doesn't discriminate either —
    measured window gyro variance is ~6e-5 in standstill AND in cruise), so
    the accelerometer gate alone false-fires during smooth motion — measured
    on the moving-start sim: a rolling 200-sample window dips to var
    0.02 << 0.25 mid-run, initializing the filter at v=0 while truly moving
    ~1 m/s, after which zero-baseline triangulation rejects every update
    (deadlock; diverges to |v|>20 m/s). Features sweeping the image are the
    discriminator the IMU cannot provide (ref:StaticInitializer runs only at
    sequence start for the same reason, SURVEY.md §3.4). The motion average
    is windowed, not per-frame, because a single frame's mean displacement
    under realistic pixel noise (~0.0035 normalized at sigma=0.002) sits
    between the ZUPT gate (0.002) and the slowest real motion of interest
    (~0.0065 at 1 m/s, 5-10 m scene) — the window mean separates them.
    """
    fcfg = cfg.filter
    n = jnp.maximum(acc.count.astype(fs.P.dtype), 1.0)
    mean_a = acc.sum_a / n
    mean_w = acc.sum_w / n
    var_a = acc.sum_a2 / n - jnp.sum(mean_a * mean_a)
    win_motion = acc.sum_motion / jnp.maximum(
        acc.n_frames.astype(fs.P.dtype), 1.0
    )
    image_still = win_motion < fcfg.static_init_max_feature_dis

    ready = (acc.count >= fcfg.static_init_samples) & ~fs.initialized
    stationary = (var_a < fcfg.static_init_accel_var) & image_still
    do_init = ready & stationary

    q0 = gravity_aligned_quat(mean_a)
    P0 = initial_covariance(cfg, fs.P.dtype)
    if cfg.filter.sqrt_form:
        P0 = jnp.sqrt(P0)  # diagonal prior -> its factor

    fs_new = fs.replace(
        q=jnp.where(do_init, q0, fs.q),
        q_null=jnp.where(do_init, q0, fs.q_null),
        bg=jnp.where(do_init, mean_w, fs.bg),
        v=jnp.where(do_init, 0.0, fs.v),
        v_null=jnp.where(do_init, 0.0, fs.v_null),
        p=jnp.where(do_init, 0.0, fs.p),
        p_null=jnp.where(do_init, 0.0, fs.p_null),
        P=jnp.where(do_init, P0, fs.P),
        time=jnp.where(do_init, acc.last_t, fs.time),
        initialized=fs.initialized | do_init,
    )
    # restart accumulation if the window wasn't stationary (rolling restart)
    restart = ready & ~stationary
    acc_new = InitAccumulator(
        sum_w=jnp.where(restart, 0.0, acc.sum_w),
        sum_a=jnp.where(restart, 0.0, acc.sum_a),
        sum_a2=jnp.where(restart, 0.0, acc.sum_a2),
        count=jnp.where(restart, 0, acc.count),
        last_t=acc.last_t,
        sum_motion=jnp.where(restart, 0.0, acc.sum_motion),
        n_frames=jnp.where(restart, 0, acc.n_frames),
    )
    return fs_new, acc_new, do_init
