"""Filter state pytrees and the fixed error-state layout.

TPU-native counterpart of ref:include/larvio/imu_state.h, cam_state.h and the
MapServer/feature bookkeeping inside ref:larvio.h (SURVEY.md §2 rows "IMU
state", "Camera clone state", "Feature record", "State vector layout").

The reference's dynamically-sized structures (std::map of clones, std::map of
features, dynamically resized covariance) become fixed-capacity slot arrays
with validity masks, so one XLA executable serves every frame of a sequence
(SURVEY.md §7 hard part #1):

  * ``max_clones`` camera-clone slots; a clone lives in one slot for its whole
    life; deletion clears the mask bit and zeroes the covariance rows/cols.
  * the observation table is **slot-aligned with the front-end feature
    table**: front-end feature slot *i* writes its per-frame measurement into
    observation row *i*, keyed to the clone slot of the frame — no
    id-matching search anywhere on device.

Error-state layout (columns of P):

  ``[ dtheta(3) dbg(3) dv(3) dba(3) dp(3) | dtheta_ci(3) dp_ci(3) | dtd(1) |
     clone_0(dtheta 3, dp 3) ... clone_{C-1} | slam_0(3) ... ]``
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from larvio_tpu.config import VioConfig
from larvio_tpu.core.quaternion import quat_identity

# --- error-state index constants -------------------------------------------
IDX_THETA = 0
IDX_BG = 3
IDX_V = 6
IDX_BA = 9
IDX_P = 12
IMU_DIM = 15
IDX_EXT_THETA = 15
IDX_EXT_P = 18
IDX_TD = 21
CLONE_BASE = 22
CLONE_DIM = 6
SLAM_DIM = 3


def state_dim(cfg: VioConfig) -> int:
    return CLONE_BASE + CLONE_DIM * cfg.filter.max_clones + SLAM_DIM * cfg.filter.max_slam_features


def clone_offset(slot) -> jnp.ndarray:
    """Column offset of clone slot's error block (traced-index safe)."""
    return CLONE_BASE + CLONE_DIM * slot


def slam_offset(cfg: VioConfig, slot) -> jnp.ndarray:
    return CLONE_BASE + CLONE_DIM * cfg.filter.max_clones + SLAM_DIM * slot


@struct.dataclass
class CloneStates:
    """Sliding window of camera-pose clones (ref:CAMState registry).

    Clones store the **IMU** pose at image time; the camera pose is derived
    through the (possibly estimated) extrinsic inside the measurement model,
    so online extrinsic calibration retroactively benefits all clones.
    """

    q: jnp.ndarray  # (C, 4) JPL world->IMU at clone time
    p: jnp.ndarray  # (C, 3) IMU position in world
    q_null: jnp.ndarray  # (C, 4) FEJ linearization points
    p_null: jnp.ndarray  # (C, 3)
    time: jnp.ndarray  # (C,) clone timestamps
    frame: jnp.ndarray  # (C,) int32 monotone frame counter (ordering key)
    valid: jnp.ndarray  # (C,) bool occupancy


@struct.dataclass
class SlamFeatures:
    """In-state long-lived SLAM features (hybrid MSCKF, SURVEY.md §3.3).

    Parameterization: anchored inverse depth [alpha, beta, rho] — the
    feature's normalized image coordinates + inverse depth in the anchor
    clone's camera (the reference's parameterization, SURVEY.md §2 "State
    vector layout"). ``models/slam.py`` holds the geometry and the anchor
    lifecycle (promotion anchors at the newest clone; pruning the anchor
    triggers an exact re-anchoring transform).
    """

    idp: jnp.ndarray  # (S, 3) [alpha, beta, rho] in the anchor camera
    idp_null: jnp.ndarray  # (S, 3) FEJ value
    anchor_slot: jnp.ndarray  # (S,) int32 clone slot anchoring the feature (-1 free)
    track_slot: jnp.ndarray  # (S,) int32 front-end slot currently feeding it (-1 free)
    track_id: jnp.ndarray  # (S,) int32 id of the owning track
    valid: jnp.ndarray  # (S,) bool
    age: jnp.ndarray  # (S,) int32 frames since promotion (slam_max_lifetime cap)


@struct.dataclass
class ObservationTable:
    """Per-feature observation history across clone slots (ref:MapServer).

    Row i <-> front-end feature slot i. Column j <-> clone slot j.
    """

    uv: jnp.ndarray  # (F, C, 2) undistorted normalized coords
    valid: jnp.ndarray  # (F, C) bool
    track_id: jnp.ndarray  # (F,) int32 id of the track owning the row (-1 empty)
    # note: per-observation image velocity is NOT stored — td enters through
    # the augmentation Jacobian (augmentation.py), so the measurement model
    # never reads it (a velocity term there would double-count td)


@struct.dataclass
class FilterState:
    """Full estimator state: one pytree = one checkpointable object."""

    # nominal IMU state (ref:IMUState)
    q: jnp.ndarray  # (4,) JPL world->IMU
    bg: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    p: jnp.ndarray  # (3,)
    # FEJ linearization points (ref: *_null members of IMUState)
    q_null: jnp.ndarray
    v_null: jnp.ndarray
    p_null: jnp.ndarray
    # camera-IMU extrinsic + time offset (online-calibrated states)
    q_ci: jnp.ndarray  # (4,) IMU->cam rotation
    t_ci: jnp.ndarray  # (3,) IMU origin in cam frame
    td: jnp.ndarray  # () time offset: state time = image time + td
    # clones / slam / observations
    clones: CloneStates
    slam: SlamFeatures
    obs: ObservationTable
    # covariance over the full padded error state
    P: jnp.ndarray  # (D, D)
    # bookkeeping
    time: jnp.ndarray  # () current state time
    frame: jnp.ndarray  # () int32 frame counter
    initialized: jnp.ndarray  # () bool
    stationary: jnp.ndarray  # () bool (ZUPT latch)
    reset_count: jnp.ndarray  # () int32 online-reset counter


def cov_diag(cfg: VioConfig, P: jnp.ndarray) -> jnp.ndarray:
    """Diagonal of the covariance — `fs.P` holds either P itself or, in
    square-root form, a factor S with P = S S^T (row square-sums)."""
    if cfg.filter.sqrt_form:
        return jnp.sum(P * P, axis=-1)
    return jnp.diagonal(P, axis1=-2, axis2=-1)


def init_filter_state(cfg: VioConfig, dtype=jnp.float32) -> FilterState:
    C = cfg.filter.max_clones
    S = max(cfg.filter.max_slam_features, 1)
    F = cfg.frontend.max_features
    D = state_dim(cfg)
    import numpy as np

    R_ci = np.array(cfg.camera.R_cam_imu, dtype=np.float64).reshape(3, 3)
    # project onto SO(3) in case the yaml matrix is not exactly orthonormal
    u, _, vt = np.linalg.svd(R_ci)
    R_ci = u @ np.diag([1.0, 1.0, np.linalg.det(u @ vt)]) @ vt
    from larvio_tpu.core.quaternion import rotation_to_quat

    q_ci = rotation_to_quat(jnp.asarray(R_ci, dtype=dtype))

    return FilterState(
        q=quat_identity(dtype),
        bg=jnp.zeros(3, dtype),
        v=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        p=jnp.zeros(3, dtype),
        q_null=quat_identity(dtype),
        v_null=jnp.zeros(3, dtype),
        p_null=jnp.zeros(3, dtype),
        q_ci=q_ci,
        t_ci=jnp.asarray(cfg.camera.t_cam_imu, dtype),
        td=jnp.asarray(cfg.filter.td_initial, dtype),
        clones=CloneStates(
            q=jnp.tile(quat_identity(dtype), (C, 1)),
            p=jnp.zeros((C, 3), dtype),
            q_null=jnp.tile(quat_identity(dtype), (C, 1)),
            p_null=jnp.zeros((C, 3), dtype),
            time=jnp.zeros(C, dtype),
            frame=jnp.full(C, -1, jnp.int32),
            valid=jnp.zeros(C, bool),
        ),
        slam=SlamFeatures(
            idp=jnp.zeros((S, 3), dtype).at[:, 2].set(1.0),
            idp_null=jnp.zeros((S, 3), dtype).at[:, 2].set(1.0),
            anchor_slot=jnp.full(S, -1, jnp.int32),
            track_slot=jnp.full(S, -1, jnp.int32),
            track_id=jnp.full(S, -1, jnp.int32),
            valid=jnp.zeros(S, bool),
            age=jnp.zeros(S, jnp.int32),
        ),
        obs=ObservationTable(
            uv=jnp.zeros((F, C, 2), dtype),
            valid=jnp.zeros((F, C), bool),
            track_id=jnp.full(F, -1, jnp.int32),
        ),
        P=jnp.zeros((D, D), dtype),
        time=jnp.asarray(0.0, dtype),
        frame=jnp.asarray(0, jnp.int32),
        initialized=jnp.asarray(False),
        stationary=jnp.asarray(False),
        reset_count=jnp.asarray(0, jnp.int32),
    )


def initial_covariance(cfg: VioConfig, dtype=jnp.float32, mode: str = "static") -> jnp.ndarray:
    """Diagonal prior covariance after initialization (ref: LarVio ctor values).

    Roll/pitch are observable from gravity (small sigma); yaw is unobservable
    (larger); biases and velocity get the reference-style loose priors. The
    ``dynamic`` mode reflects the rougher in-motion bootstrap (SfM tilt and
    scale errors of a few degrees / tens of percent).
    """
    D = state_dim(cfg)
    diag = jnp.zeros(D, dtype)
    if mode == "dynamic":
        diag = diag.at[IDX_THETA : IDX_THETA + 2].set(1.2e-1**2)  # roll/pitch
        diag = diag.at[IDX_THETA + 2].set(2.0e-1**2)  # yaw
        diag = diag.at[IDX_BG : IDX_BG + 3].set(2.0e-2**2)
        diag = diag.at[IDX_V : IDX_V + 3].set(5.0e-1**2)
        diag = diag.at[IDX_BA : IDX_BA + 3].set(1.5e-1**2)
    else:
        diag = diag.at[IDX_THETA : IDX_THETA + 2].set(3.0e-2**2)  # roll/pitch
        diag = diag.at[IDX_THETA + 2].set(1.0e-1**2)  # yaw
        diag = diag.at[IDX_BG : IDX_BG + 3].set(3.0e-2**2)
        diag = diag.at[IDX_V : IDX_V + 3].set(1.0e-1**2)
        diag = diag.at[IDX_BA : IDX_BA + 3].set(1.0e-1**2)
    diag = diag.at[IDX_P : IDX_P + 3].set(1.0e-6)
    if cfg.filter.estimate_extrinsic:
        diag = diag.at[IDX_EXT_THETA : IDX_EXT_THETA + 3].set(
            cfg.filter.prior_extrinsic_rot_std**2
        )
        diag = diag.at[IDX_EXT_P : IDX_EXT_P + 3].set(
            cfg.filter.prior_extrinsic_trans_std**2
        )
    if cfg.filter.estimate_td:
        diag = diag.at[IDX_TD].set(cfg.filter.prior_td_std**2)
    return jnp.diag(diag)
