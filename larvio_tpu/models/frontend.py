"""IMU-aided feature-tracking front-end (the TPU-native ImageProcessor).

Counterpart of ref:src/image_processor.cpp (SURVEY.md §3.2), stage for stage:

  createImagePyramids      -> ops.image.build_pyramid
  integrateImuData         -> gyro-mean rotation prev->curr (here, from the
                              same padded ImuBatch the filter consumes)
  predictFeatureTracking   -> rotate feature rays by R_p->c, reproject
  calcOpticalFlowPyrLK     -> ops.lk.lk_track (inverse-compositional KLT)
  ORB descriptor check     -> ops.orb.descriptor_check vs birth descriptor
  twoPointRansac           -> ops.ransac.two_point_ransac
  addNewFeatures/prune     -> grid-slot replenishment with per-cell caps
  undistortPoints          -> core.camera.undistort_normalize
  -> MonoCameraMeasurement -> msckf.FrameFeatures (slot-aligned contract)

The feature table is a fixed-slot structure: a track keeps its slot for life
(the back-end's observation rows are slot-aligned), slots free on death and
refill from per-cell detection candidates the same frame.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from larvio_tpu.config import VioConfig
from larvio_tpu.core.camera import project, undistort_normalize
from larvio_tpu.core.quaternion import quat_to_rotation
from larvio_tpu.core.so3 import so3_exp
from larvio_tpu.models.msckf import FrameFeatures
from larvio_tpu.models.propagation import ImuBatch
from larvio_tpu.ops.detect import grid_topk, nms, shi_tomasi_response
from larvio_tpu.ops.image import build_pyramid, in_bounds
from larvio_tpu.ops.lk import lk_track, make_grad_pyramid
from larvio_tpu.ops.orb import describe, N_WORDS
from larvio_tpu.ops.ransac import two_point_ransac


@struct.dataclass
class TrackerState:
    """Persistent front-end state (the reference's prev-frame members)."""

    pos: jnp.ndarray  # (F, 2) px positions in the previous frame
    ids: jnp.ndarray  # (F,) int32, -1 = free slot
    age: jnp.ndarray  # (F,) frames tracked
    desc: jnp.ndarray  # (F, 8) uint32 descriptor at track birth
    uv_norm: jnp.ndarray  # (F, 2) undistorted normalized coords (prev frame)
    valid: jnp.ndarray  # (F,)
    next_id: jnp.ndarray  # () int32
    prev_pyr: tuple  # pyramid of the previous frame
    prev_time: jnp.ndarray  # ()
    has_prev: jnp.ndarray  # () bool


def init_tracker_state(cfg: VioConfig, dtype=jnp.float32) -> TrackerState:
    F = cfg.frontend.max_features
    H, W = cfg.camera.height, cfg.camera.width
    pyr = tuple(
        jnp.zeros((-(-H // (2**l)), -(-W // (2**l))), dtype)
        for l in range(cfg.frontend.pyramid_levels + 1)
    )
    return TrackerState(
        pos=jnp.zeros((F, 2), dtype),
        ids=jnp.full(F, -1, jnp.int32),
        age=jnp.zeros(F, jnp.int32),
        desc=jnp.zeros((F, N_WORDS), jnp.uint32),
        uv_norm=jnp.zeros((F, 2), dtype),
        valid=jnp.zeros(F, bool),
        next_id=jnp.asarray(0, jnp.int32),
        prev_pyr=pyr,
        prev_time=jnp.asarray(0.0, dtype),
        has_prev=jnp.asarray(False),
    )


def _gyro_cam_rotation(imu: ImuBatch, t0, t1, bg):
    """IMU-frame rotation prev->curr from mean gyro (ref:integrateImuData).

    C(t+dt) = exp(-skew(w) dt) C(t), so coordinates of a fixed point map with
    exp(-skew(w dt)) from the prev to the curr body frame.
    """
    in_win = imu.valid & (imu.t > t0) & (imu.t <= t1)
    cnt = jnp.maximum(jnp.sum(in_win), 1)
    w_mean = jnp.sum(jnp.where(in_win[:, None], imu.w, 0.0), axis=0) / cnt - bg
    dt = t1 - t0
    return so3_exp(-w_mean * dt)


def _predict_positions(cfg, pos_px, valid, R_cc):
    """Rotate previous feature rays by the gyro rotation, reproject to px."""
    uvn = undistort_normalize(pos_px, cfg.camera)
    rays = jnp.concatenate([uvn, jnp.ones((*uvn.shape[:-1], 1), uvn.dtype)], axis=-1)
    rot = jnp.einsum("ab,fb->fa", R_cc, rays)
    uvn_pred = rot[..., :2] / jnp.maximum(rot[..., 2:3], 1e-6)
    px = project(uvn_pred, cfg.camera)
    return jnp.where(valid[:, None], px, pos_px)


def track_frame(
    cfg: VioConfig,
    ts: TrackerState,
    image: jnp.ndarray,  # (H, W) grayscale float32 [0, 255]
    imu: ImuBatch,
    t_img: jnp.ndarray,
    bg: jnp.ndarray,  # current gyro-bias estimate from the filter
    debug: bool = False,  # also return per-gate survival masks (diag tools)
) -> Tuple[TrackerState, FrameFeatures]:
    fcfg = cfg.frontend
    F = fcfg.max_features
    dtype = image.dtype
    H, W = image.shape

    # jax.named_scope regions label the profiler trace per pipeline stage
    # (SURVEY.md §5 tracing plan; the reference prints per-stage wall-clock)
    with jax.named_scope("fe.pyramid"):
        pyr = tuple(build_pyramid(image, fcfg.pyramid_levels))
        grad_pyr = make_grad_pyramid(list(ts.prev_pyr))

    # ---- gyro-predicted LK tracking ----------------------------------------
    R_ii = _gyro_cam_rotation(imu, ts.prev_time, t_img, bg)
    import numpy as _np

    R_ci_np = _np.array(cfg.camera.R_cam_imu, dtype=_np.float64).reshape(3, 3)
    u_, _, vt_ = _np.linalg.svd(R_ci_np)
    R_ci = jnp.asarray(u_ @ _np.diag([1, 1, _np.linalg.det(u_ @ vt_)]) @ vt_, dtype)
    R_cc = R_ci @ R_ii @ R_ci.T  # prev cam -> curr cam

    can_track = ts.valid & ts.has_prev
    guess = _predict_positions(cfg, ts.pos, can_track, R_cc)
    from larvio_tpu.ops.lk_pallas import lk_track_pallas, pallas_available

    with jax.named_scope("fe.lk"):
        if fcfg.use_pallas_lk and pallas_available():
            lk = lk_track_pallas(
                ts.prev_pyr,
                pyr,
                tuple(g[0] for g in grad_pyr),
                tuple(g[1] for g in grad_pyr),
                ts.pos,
                guess,
                can_track,
                patch=fcfg.patch_size,
                iters=fcfg.max_iteration,
                precision=fcfg.track_precision,
            )
        else:
            lk = lk_track(
                list(ts.prev_pyr),
                list(pyr),
                grad_pyr,
                ts.pos,
                guess,
                can_track,
                patch=fcfg.patch_size,
                iters=fcfg.max_iteration,
                precision=fcfg.track_precision,
            )

    # ---- two-point RANSAC ---------------------------------------------------
    # (the ORB descriptor gate runs after replenishment on the final feature
    # table so descriptors are computed ONCE per frame; an ORB-rejected track
    # is invalidated this frame and its slot recycles next frame — a 1-frame
    # slot-reuse delay vs the reference, measurement content identical)
    tracked = lk.valid
    lk_survived = tracked  # debug: survived the LK stage
    uvn_curr = undistort_normalize(lk.pos, cfg.camera)
    key = jax.random.PRNGKey(0)
    key = jax.random.fold_in(key, (t_img * 1e4).astype(jnp.int32))
    fu = cfg.camera.intrinsics[0]
    with jax.named_scope("fe.ransac"):
        rr = two_point_ransac(
            ts.uv_norm,
            uvn_curr,
            R_cc,
            tracked,
            key,
            threshold=fcfg.ransac_threshold / fu,
            n_hyp=fcfg.ransac_hypotheses,
        )
    tracked = tracked & rr.inliers
    ransac_survived = tracked  # debug: survived LK + RANSAC

    # ---- grid replenishment --------------------------------------------------
    with jax.named_scope("fe.detect"):
        resp = nms(shi_tomasi_response(image), radius=fcfg.min_distance // 2)
        scores, cand_xy = grid_topk(
            resp, fcfg.grid_rows, fcfg.grid_cols, fcfg.grid_max_feature_num,
            border=max(fcfg.patch_size, 18),  # ORB needs a 17px margin
        )  # (cells, k), (cells, k, 2)
    n_cells = fcfg.grid_rows * fcfg.grid_cols

    # cell of each surviving track
    ch = -(-H // fcfg.grid_rows)
    cw = -(-W // fcfg.grid_cols)
    cell_of = (
        jnp.clip(lk.pos[:, 1].astype(jnp.int32) // ch, 0, fcfg.grid_rows - 1)
        * fcfg.grid_cols
        + jnp.clip(lk.pos[:, 0].astype(jnp.int32) // cw, 0, fcfg.grid_cols - 1)
    )
    occupancy = jnp.zeros(n_cells, jnp.int32).at[cell_of].add(tracked.astype(jnp.int32))

    # suppress candidates too close to surviving tracks (min_distance)
    d2 = jnp.sum(
        (cand_xy.reshape(-1, 1, 2) - lk.pos[None, :, :]) ** 2, axis=-1
    )  # (cells*k, F)
    near_track = jnp.any(
        (d2 < float(fcfg.min_distance) ** 2) & tracked[None, :], axis=1
    ).reshape(n_cells, -1)

    cand_ok = (scores > fcfg.fast_threshold) & ~near_track
    # per-cell quota (ref:addNewFeatures semantics): a cell is replenished
    # only when it has dropped below grid_min_feature_num survivors, and is
    # then topped up to grid_max_feature_num — well-populated cells are left
    # alone, which keeps detection churn away from stable tracks
    rank_in_cell = jnp.cumsum(cand_ok.astype(jnp.int32), axis=1) - 1
    need = occupancy < fcfg.grid_min_feature_num
    quota = jnp.where(
        need, jnp.maximum(fcfg.grid_max_feature_num - occupancy, 0), 0
    )
    cand_ok = cand_ok & (rank_in_cell < quota[:, None])

    cand_xy_flat = cand_xy.reshape(-1, 2)
    cand_ok_flat = cand_ok.reshape(-1)
    cand_score_flat = jnp.where(cand_ok_flat, scores.reshape(-1), -1.0)
    # pad the candidate pool to at least F so slot assignment below is
    # shape-safe for configs where cells*k < max_features
    n_cand = cand_xy_flat.shape[0]
    if n_cand < F:
        cand_xy_flat = jnp.pad(cand_xy_flat, ((0, F - n_cand), (0, 0)))
        cand_ok_flat = jnp.pad(cand_ok_flat, (0, F - n_cand))
        cand_score_flat = jnp.pad(cand_score_flat, (0, F - n_cand), constant_values=-1.0)

    # assign best candidates to free slots
    free = ~tracked
    n_free = jnp.sum(free)
    order_slots = jnp.argsort(~free)  # free slots first (stable)
    order_cands = jnp.argsort(-cand_score_flat)  # best candidates first
    # k-th free slot takes k-th best candidate (if both exist)
    take = jnp.arange(F) < jnp.minimum(n_free, jnp.sum(cand_ok_flat))
    slot_idx = order_slots[: F]
    cand_idx = order_cands[: F]
    new_pos = jnp.zeros((F, 2), dtype)
    new_pos = new_pos.at[slot_idx].set(
        jnp.where(take[:, None], cand_xy_flat[cand_idx], 0.0)
    )
    is_new = jnp.zeros(F, bool).at[slot_idx].set(take)

    pos = jnp.where(is_new[:, None], new_pos, lk.pos)
    new_ids = ts.next_id + jnp.cumsum(is_new.astype(jnp.int32)) - 1
    ids = jnp.where(is_new, new_ids, jnp.where(tracked, ts.ids, -1))
    next_id = ts.next_id + jnp.sum(is_new)
    age = jnp.where(is_new, 0, jnp.where(tracked, ts.age + 1, 0))
    valid = tracked | is_new

    # single descriptor pass over the final table: ORB gate for survivors
    # (Hamming vs the descriptor stored at track birth), birth descriptors
    # for the newly detected
    from larvio_tpu.ops.orb import hamming
    from larvio_tpu.ops.image import in_bounds as _inb

    with jax.named_scope("fe.orb"):
        desc_now = describe(image, pos, valid)
    margin_ok = _inb(pos, (H, W), margin=17.0)
    dist = hamming(desc_now, ts.desc)
    desc_ok = (dist <= fcfg.orb_distance_threshold) & margin_ok
    tracked = tracked & (desc_ok | is_new)
    valid = tracked | is_new
    ids = jnp.where(valid, ids, -1)
    desc = jnp.where(is_new[:, None], desc_now, ts.desc)

    # ---- measurement assembly -------------------------------------------------
    uvn = undistort_normalize(pos, cfg.camera)
    dt = jnp.maximum(t_img - ts.prev_time, 1e-6)
    vel = jnp.where(
        (tracked & ~is_new)[:, None], (uvn - ts.uv_norm) / dt, 0.0
    )
    motion = jnp.linalg.norm(uvn - ts.uv_norm, axis=-1)
    n_moved = jnp.sum(tracked & ~is_new)
    mean_motion = jnp.where(
        n_moved > 0,
        jnp.sum(jnp.where(tracked & ~is_new, motion, 0.0)) / jnp.maximum(n_moved, 1),
        jnp.asarray(1.0, dtype),
    )

    feats = FrameFeatures(
        ids=ids,
        uv=uvn,
        vel=vel,
        valid=valid,
        mean_motion=mean_motion,
        t=t_img,
    )
    ts_new = TrackerState(
        pos=pos,
        ids=ids,
        age=age,
        desc=desc,
        uv_norm=uvn,
        valid=valid,
        next_id=next_id,
        prev_pyr=pyr,
        prev_time=t_img,
        has_prev=jnp.asarray(True),
    )
    if debug:
        return ts_new, feats, {
            "can_track": can_track,
            "lk_survived": lk_survived,
            "ransac_survived": ransac_survived,
            "orb_survived": tracked,  # after the descriptor gate
            "is_new": is_new,
            "orb_dist": dist,  # Hamming distance vs the stored descriptor
        }
    return ts_new, feats
