"""Camera-pose cloning (state augmentation) and observation bookkeeping.

Counterpart of ref:src/larvio.cpp stateAugmentation() + addFeatureObservations()
(SURVEY.md §3.3). TPU design: a clone is written into the first free slot of
the fixed window (``argmin(valid)``); the covariance grows by *overwriting*
the slot's rows/columns — the previous occupant's rows were zeroed at pruning
so the padded covariance stays exactly equal to the reference's dynamically
resized one.

Clones store the IMU pose (not the camera pose): with online extrinsic
calibration the camera pose is a function of (clone, extrinsic) inside the
measurement model, so the augmentation Jacobian is a pure copy — J = [I at
theta; I at p] — and cloning reduces to a masked row/column gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.linalg import mm
from larvio_tpu.models.state import (
    CLONE_DIM,
    FilterState,
    IDX_P,
    IDX_TD,
    IDX_THETA,
    clone_offset,
)


def augment_state(
    cfg: VioConfig,
    fs: FilterState,
    do_augment: jnp.ndarray,
    w_body: jnp.ndarray,
) -> tuple[FilterState, jnp.ndarray]:
    """Clone the current IMU pose into a free slot (masked by ``do_augment``).

    The clone represents the pose at ``t_img + td_hat``, so its error carries
    a time-offset component: dtheta_c = dtheta + w dtd, dp_c = dp + v dtd
    (online temporal calibration — this J_td column is how td becomes
    observable; ``w_body`` is the bias-corrected body rate at clone time).

    Returns (new_state, slot_index). The caller guarantees a free slot exists
    (pruning runs when the window is full). When ``do_augment`` is False the
    state is returned unchanged and slot = -1.
    """
    C = cfg.filter.max_clones
    D = fs.P.shape[0]
    dtype = fs.P.dtype
    # first free slot: argmin over valid (False < True)
    slot = jnp.argmin(fs.clones.valid.astype(jnp.int32))

    clones = fs.clones
    sel = jax.nn.one_hot(slot, C, dtype=bool) & do_augment

    clones = clones.replace(
        q=jnp.where(sel[:, None], fs.q[None, :], clones.q),
        p=jnp.where(sel[:, None], fs.p[None, :], clones.p),
        q_null=jnp.where(sel[:, None], fs.q_null[None, :], clones.q_null),
        p_null=jnp.where(sel[:, None], fs.p_null[None, :], clones.p_null),
        time=jnp.where(sel, fs.time, clones.time),
        frame=jnp.where(sel, fs.frame, clones.frame),
        valid=clones.valid | sel,
    )

    # J (6, D): identity copies of [theta; p] plus the td column
    eye3 = jnp.eye(3, dtype=dtype)
    J = jnp.zeros((6, D), dtype)
    J = J.at[0:3, IDX_THETA : IDX_THETA + 3].set(eye3)
    J = J.at[3:6, IDX_P : IDX_P + 3].set(eye3)
    if cfg.filter.estimate_td:
        J = J.at[0:3, IDX_TD].set(w_body)
        J = J.at[3:6, IDX_TD].set(fs.v)

    off = clone_offset(slot)
    if cfg.filter.sqrt_form:
        # factor form: the clone error is a LINEAR map of the state error, so
        # augmentation is a pure row op on the factor — S[slot] <- J S. The
        # implied covariance picks up the J P rows/cols and J P J^T block
        # automatically (and stays PSD by construction).
        JS = mm(J, fs.P)  # (6, D) rows in the factor basis
        P = jax.lax.dynamic_update_slice(fs.P, JS, (off, 0))
    else:
        JP = mm(J, fs.P)  # (6, D)
        JPJt = mm(JP, J.T)  # (6, 6)
        P = fs.P
        P = jax.lax.dynamic_update_slice(P, JP, (off, 0))
        P = jax.lax.dynamic_update_slice(P, JP.T, (0, off))
        P = jax.lax.dynamic_update_slice(P, JPJt, (off, off))
    P = jnp.where(do_augment, P, fs.P)

    return fs.replace(clones=clones, P=P), jnp.where(do_augment, slot, -1)


def add_observations(
    cfg: VioConfig,
    fs: FilterState,
    slot: jnp.ndarray,
    feat_id: jnp.ndarray,  # (F,) int32, -1 invalid
    feat_uv: jnp.ndarray,  # (F, 2) undistorted normalized coords
    feat_valid: jnp.ndarray,  # (F,) bool
    slam_owned=None,  # (F,) rows owned by in-state slam features: no window
) -> FilterState:
    """Record this frame's measurements into the slot-aligned obs table.

    Front-end feature slot i owns obs row i. If the row's track id differs
    from the incoming id (slot recycled for a new track), the history is
    cleared first — the device-side equivalent of MapServer insert/erase.
    Rows owned by slam features do not accumulate a window (their
    measurements are consumed per-frame by the slam EKF update instead).
    """
    obs = fs.obs
    C = cfg.filter.max_clones
    write = feat_valid & (slot >= 0)
    if slam_owned is not None:
        write = write & ~slam_owned

    same_track = obs.track_id == feat_id
    keep_history = same_track & write | (~write & (obs.track_id >= 0))
    # clear rows whose track changed (new feature reusing the slot)
    valid = jnp.where(keep_history[:, None], obs.valid, False)

    col = jax.nn.one_hot(jnp.maximum(slot, 0), C, dtype=bool)[None, :]  # (1, C)
    write_cell = write[:, None] & col
    uv = jnp.where(write_cell[..., None], feat_uv[:, None, :], obs.uv)
    valid = valid | write_cell
    track_id = jnp.where(write, feat_id, jnp.where(keep_history, obs.track_id, -1))

    return fs.replace(obs=obs.replace(uv=uv, valid=valid, track_id=track_id))
