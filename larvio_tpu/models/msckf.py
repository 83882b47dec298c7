"""The hybrid-MSCKF per-frame step: the TPU-native LarVio::processFeatures.

Counterpart of ref:src/larvio.cpp processFeatures() (SURVEY.md §3.3). One
call = one camera frame; everything inside is fixed-shape and mask-driven so
XLA compiles exactly one executable per sequence configuration, and the whole
function is scanned over frames / vmapped over fleet instances.

Stage order (mirrors the reference, with the dead-track update moved before
observation insertion so slot recycling can't clobber history):

  1. static-init accumulation (masked until initialized)
  2. IMU propagation to t_img + td                       [propagation.py]
  3. ZUPT detection (image-motion based)                 [zupt.py]
  4. dead-track selection -> triangulate -> MSCKF blocks [triangulation/update]
  5. clone-window pruning selection + prune blocks       [prune.py]
  6. one stacked, QR-compressed, chi2-gated EKF update
  7. ZUPT update when stationary                         [zupt.py]
  8. clear consumed rows / pruned slots; zero their P rows
  9. state augmentation + observation insertion (skipped while stationary)
 10. online-reset guard (covariance blow-up containment, SURVEY.md §5)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from larvio_tpu.config import VioConfig
from larvio_tpu.models import prune as prune_mod
from larvio_tpu.models import slam as slam_mod
from larvio_tpu.models.augmentation import add_observations, augment_state
from larvio_tpu.models.initializer import InitAccumulator, accumulate, try_static_init
from larvio_tpu.models.propagation import ImuBatch, propagate
from larvio_tpu.models.state import (
    IMU_DIM,
    FilterState,
    cov_diag,
    init_filter_state,
    initial_covariance,
    state_dim,
)
from larvio_tpu.models.triangulation import camera_window, triangulate_batch
from larvio_tpu.models.update import apply_update, feature_block
from larvio_tpu.models.zupt import detect_stationary, zupt_update


class FrameFeatures(NamedTuple):
    """Front-end -> back-end contract (ref:MonoCameraMeasurement, SURVEY.md §2).

    Slot-aligned with the front-end feature table; all shapes static.
    """

    ids: jnp.ndarray  # (F,) int32 track ids, -1 invalid
    uv: jnp.ndarray  # (F, 2) undistorted normalized coords
    vel: jnp.ndarray  # (F, 2) image-plane velocity (for online td)
    valid: jnp.ndarray  # (F,) bool
    mean_motion: jnp.ndarray  # () mean normalized-plane track displacement
    t: jnp.ndarray  # () image timestamp


@struct.dataclass
class VioState:
    filter: FilterState
    init_acc: InitAccumulator


class StepOutput(NamedTuple):
    q: jnp.ndarray  # (4,) world->IMU quaternion
    p: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    t: jnp.ndarray  # ()
    td: jnp.ndarray  # () online time-offset estimate
    bg: jnp.ndarray  # (3,) gyro bias estimate
    ba: jnp.ndarray  # (3,) accel bias estimate
    initialized: jnp.ndarray
    stationary: jnp.ndarray
    n_clones: jnp.ndarray
    n_tracks: jnp.ndarray
    n_updated: jnp.ndarray  # features accepted into the MSCKF update
    n_slam: jnp.ndarray  # in-state slam features
    p_std: jnp.ndarray  # (3,) position 1-sigma (consistency monitoring)
    v_std: jnp.ndarray  # (3,) velocity 1-sigma (observable — NEES calibration)
    q_std: jnp.ndarray  # (3,) attitude (theta) 1-sigma; [2] = yaw channel
    did_reset: jnp.ndarray


def init_vio_state(cfg: VioConfig, dtype=jnp.float32) -> VioState:
    return VioState(filter=init_filter_state(cfg, dtype), init_acc=InitAccumulator.zero(dtype))


def _bootstrap_mode(cfg: VioConfig, fs: FilterState):
    """True only while the filter is converging from a rough start: the clone
    window is still rebuilding (it is always full in steady state) AND velocity
    uncertainty is high."""
    window_building = jnp.sum(fs.clones.valid) < cfg.filter.max_clones - 2
    high_unc = jnp.max(cov_diag(cfg, fs.P)[6:9]) > cfg.filter.bootstrap_vel_var
    return window_building & high_unc


def _tri_err_bound(cfg: VioConfig, fs: FilterState):
    """Adaptive triangulation-residual acceptance bound.

    Tight in steady state; loose in bootstrap mode, where window inconsistency
    — not feature quality — dominates the residual and the chi2 gate is the
    right judge.
    """
    return jnp.where(
        _bootstrap_mode(cfg, fs),
        cfg.filter.bootstrap_tri_err_bound,
        cfg.filter.tri_max_reproj_err,
    )


def _trim_rows(cfg: VioConfig, tri, mask):
    """Per-observation outlier trim on a triangulated window batch (F, C):
    drop observations whose RAW reprojection residual exceeds tri_trim_k x
    the window's own robust scale. The block-level Huber in
    update.feature_block cannot do this — it weights the PROJECTED rows,
    after Householder elimination has smeared a gross outlier across the
    whole block (see the config.py tri_huber_k comment for the measured
    failure). Self-scaling keeps it inert during bootstrap."""
    k = cfg.filter.tri_trim_k
    if k <= 0:
        return mask
    rn = jnp.where(mask, tri.resid, 0.0)
    n = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(rn.dtype)
    scale = jnp.maximum(jnp.sum(rn, axis=1) / n, cfg.filter.tri_trim_floor)
    return mask & (tri.resid <= k * scale[:, None])


def _marginalization_blocks(cfg: VioConfig, fs: FilterState, feats: FrameFeatures,
                            slot_a, slot_b, do_prune):
    """Dead-track (ref:removeLostFeatures) + prune-observation blocks, built
    as ONE triangulation scan and ONE feature_block vmap over K + K2 features
    (three separate small batches cost ~3x the sequential-scan latency).

    Returns (H_stack, r_stack, n_accepted, dead_rows).
    """
    C = cfg.filter.max_clones
    K = cfg.filter.max_update_features
    K2 = cfg.filter.max_prune_features
    D = state_dim(cfg)
    obs = fs.obs

    # --- dead selection: row owned by a no-longer-tracked track --------------
    still_tracked = feats.valid & (feats.ids == obs.track_id)
    has_row = obs.track_id >= 0
    n_obs = jnp.sum(obs.valid, axis=1)
    dead = has_row & ~still_tracked
    score_d = jnp.where(dead, n_obs, -1)
    _, idx_d = jax.lax.top_k(score_d, K)
    sel_d = jnp.take(dead, idx_d)

    # --- prune selection: live features observed by the clones being removed -
    pruned_cols = jax.nn.one_hot(slot_a, C, dtype=bool) | jax.nn.one_hot(slot_b, C, dtype=bool)
    row_mask_all = obs.valid & pruned_cols[None, :]
    involved = jnp.sum(row_mask_all, axis=1)
    use_p = has_row & ~dead & do_prune & (involved >= 2) & (n_obs >= 2)
    score_p = jnp.where(use_p, n_obs, -1)
    _, idx_p = jax.lax.top_k(score_p, K2)
    sel_p = jnp.take(use_p, idx_p)

    # --- one combined triangulation batch (shared GN scan), split blocks ----
    idx = jnp.concatenate([idx_d, idx_p])
    sel = jnp.concatenate([sel_d, sel_p])
    uv_b = obs.uv[idx]
    tri_mask = obs.valid[idx] & sel[:, None]

    cams = camera_window(fs)
    tri = triangulate_batch(cfg, cams, fs.clones.frame, uv_b, tri_mask)
    tri_ok = tri.valid & (tri.mean_err < _tri_err_bound(cfg, fs))
    trim = _trim_rows(cfg, tri, tri_mask)

    # dead features: full projected blocks (all surviving rows, outlier rows
    # trimmed)
    row_d = trim[:K] & sel_d[:, None]
    blocks = jax.vmap(
        lambda p_w, uv, m, tv: feature_block(cfg, fs, p_w, uv, m, tv)
    )(tri.p_w[:K], uv_b[:K], row_d, tri_ok[:K] & sel_d)

    # prune features: exactly the two removed clones' rows -> one surviving
    # row each, built by the specialized 4-row fast path (update.py) instead
    # of the padded (2C, D) machinery
    from larvio_tpu.models.update import prune_feature_block

    slots = jnp.stack([slot_a, slot_b])
    uv_p = obs.uv[idx_p][:, slots]  # (K2, 2, 2)
    ok_p = row_mask_all[idx_p][:, slots] & sel_p[:, None] & trim[K:][:, slots]  # (K2, 2)
    H_p, r_p, acc_p = jax.vmap(
        lambda p_w, uv2, ok2, tv: prune_feature_block(cfg, fs, p_w, uv2, slots, ok2, tv)
    )(tri.p_w[K:], uv_p, ok_p, tri_ok[K:] & sel_p)

    H_stack = jnp.concatenate([blocks.H.reshape(K * 2 * C, D), H_p], axis=0)
    r_stack = jnp.concatenate([blocks.r.reshape(K * 2 * C), r_p])
    n_accepted = jnp.sum(blocks.accept) + jnp.sum(acc_p)
    return H_stack, r_stack, n_accepted, dead


def _consume_blocks(cfg: VioConfig, fs: FilterState, cand: jnp.ndarray,
                    wide=False):
    """MSCKF blocks consuming promotion candidates' observation windows.

    Selects candidate rows by window length — up to ``max_slam_features`` in
    steady state (the slot-budget selection pressure), widened to
    ``bootstrap_consume_k`` while ``wide`` (high velocity uncertainty:
    post-reset / rough-init re-convergence), where the consume channel is
    the main correction source and its width sets the re-convergence rate
    (extra consumed windows retire as plain MSCKF marginalization; only the
    top ones can be installed into free slots). Returns the
    nullspace-projected blocks plus the mask of rows actually consumed
    (these retire this frame and the same set is promoted).
    """
    from larvio_tpu.models.update import FeatureBlock

    C = cfg.filter.max_clones
    S = cfg.filter.max_slam_features
    D = state_dim(cfg)
    obs = fs.obs
    if S == 0:
        z = jnp.zeros((0, 2 * C, D), fs.P.dtype)
        empty = FeatureBlock(
            H=z, r=jnp.zeros((0, 2 * C), fs.P.dtype), accept=jnp.zeros((0,), bool),
            Rf=jnp.zeros((0, 3, 3), fs.P.dtype), H3=jnp.zeros((0, 3, D), fs.P.dtype),
            r3=jnp.zeros((0, 3), fs.P.dtype),
        )
        return empty, jnp.zeros_like(cand), None, None, None
    K = max(S, cfg.filter.bootstrap_consume_k)
    n_obs = jnp.sum(obs.valid, axis=1)
    score = jnp.where(cand, n_obs, -1)
    _, idx = jax.lax.top_k(score, K)
    sel = jnp.take(cand, idx)
    if K > S:
        # top_k is count-ordered, so rank < S keeps exactly the slot-budget
        # selection in steady state; bootstrap opens the full width
        sel = sel & ((jnp.arange(K) < S) | wide)

    uv_b = obs.uv[idx]
    mask_b = obs.valid[idx] & sel[:, None]

    cams = camera_window(fs)
    tri = triangulate_batch(cfg, cams, fs.clones.frame, uv_b, mask_b)
    tri_ok = tri.valid & (tri.mean_err < _tri_err_bound(cfg, fs))
    # outlier rows trimmed from the consumed block — critical here: the
    # promoted landmark's delayed init reads this block, and with a small
    # slot budget one outlier-biased landmark carries 1/S of the slam
    # information (measured: 3% gross mismatches, 6 slots -> ATE 0.166 vs
    # 0.067 at 12 slots before the trim)
    mask_t = _trim_rows(cfg, tri, mask_b)
    blocks = jax.vmap(
        lambda p_w, uv, m, tv: feature_block(cfg, fs, p_w, uv, m, tv)
    )(tri.p_w, uv_b, mask_t, tri_ok & sel)

    sel = sel & blocks.accept  # only promoted if the block actually updated
    consumed = jnp.zeros_like(cand).at[jnp.clip(idx, 0, cand.shape[0] - 1)].set(sel)
    return blocks, consumed, idx, tri, sel


def filter_step(cfg: VioConfig, vs: VioState, feats: FrameFeatures, imu: ImuBatch):
    """One frame. Returns (VioState, StepOutput)."""
    fs0 = vs.filter
    dtype = fs0.P.dtype
    C = cfg.filter.max_clones
    S = cfg.filter.max_slam_features

    # ---- 1. initialization path (masked) --------------------------------
    # the accumulator folds in image-motion evidence: static init requires
    # image stillness over the window (see try_static_init's docstring —
    # constant-velocity motion is IMU-indistinguishable from rest, and a v=0
    # init mid-motion deadlocks on zero-baseline triangulation).
    acc = accumulate(vs.init_acc, imu, feats.mean_motion)
    fs_init, acc, _ = try_static_init(cfg, fs0, acc)

    inited = fs_init.initialized

    # ---- 2. propagation ---------------------------------------------------
    with jax.named_scope("filt.propagate"):
        fs_prop = propagate(cfg, fs_init, imu, feats.t)
        # sqrt path: propagation returns a WIDE factor (D, D+15) — the
        # process-noise columns ride along until the frame's measurement
        # update re-compresses (see _apply_frame_transition). Zero-pad the
        # un-propagated branch to match (implied covariance unchanged).
        fs_init_m = fs_init
        if fs_prop.P.shape != fs_init.P.shape:
            fs_init_m = fs_init.replace(
                P=jnp.pad(
                    fs_init.P,
                    ((0, 0), (0, fs_prop.P.shape[1] - fs_init.P.shape[1])),
                )
            )
        fs = jax.tree.map(
            lambda a, b: jnp.where(inited, a, b), fs_prop, fs_init_m
        )

    # ---- 2b. vision-time gate ----------------------------------------------
    # Consume this frame's vision only if propagation REACHED the image time.
    # Under an IMU blackout fs.time freezes while the camera keeps moving, so
    # a clone stamped now would pair the frame's observations with a stale
    # pose and the slam rows would read the motion gap as landmark innovation
    # — a few such frames seed a slow divergence vision never unwinds. Drop
    # the frame's vision instead (see config.vision_time_tol): tracks retire
    # through the normal dead-track marginalization, whose stored windows
    # pair old observations with their own, correctly-timed clones.
    t_reached = fs.time >= feats.t + fs.td - cfg.filter.vision_time_tol
    vision_ok = t_reached | ~inited  # pre-init paths keep their own gating
    feats = feats._replace(valid=feats.valid & vision_ok)

    # ---- 3. ZUPT detection ------------------------------------------------
    n_tracked = jnp.sum(feats.valid)
    stationary = detect_stationary(cfg, feats.mean_motion, n_tracked, fs, imu) & inited

    # ---- 4. dead-track + prune blocks -> one update, THEN remove clones -----
    # (reference order: the marginalizing update must see the pruned clones'
    # covariance rows before remove_clones zeroes them)
    n_clones = jnp.sum(fs.clones.valid)
    do_prune = (n_clones >= C) & inited
    slot_a, slot_b = prune_mod.select_redundant(cfg, fs)
    D = state_dim(cfg)
    with jax.named_scope("filt.marginalize"):
        H_stack, r_stack, n_accepted, dead_rows = _marginalization_blocks(
            cfg, fs, feats, slot_a, slot_b, do_prune
        )
        # note: vision updates stay ON during detected standstill — chi2
        # gating makes them harmless when truly stationary, and they are the
        # correcting information when the detector false-positives at slow
        # speed
        do_update = inited & (n_accepted > 0)
        # measurement underweighting while velocity uncertainty is high (the
        # window-building condition of _bootstrap_mode is deliberately NOT
        # required: the window refills within ~1 s of a reset, BEFORE the
        # first big-residual updates fire — and underweighting a transient
        # variance spike in normal operation is harmless, unlike consumption)
        high_unc = jnp.max(cov_diag(cfg, fs.P)[6:9]) > cfg.filter.bootstrap_vel_var
        infl = cfg.noise.observation_noise**2 * cfg.filter.bootstrap_noise_inflation
        obs_var = jnp.where(
            high_unc,
            jnp.maximum(infl, cfg.filter.bootstrap_noise_floor**2),
            cfg.noise.observation_noise**2,
        )
        # refactor=(S == 0): with slam enabled, nothing between here and the
        # hybrid update's own psd_factor reads the factor's column structure
        # (rows-only consumers: reanchor, remove_clones, augmentation,
        # measurement blocks), so the re-triangularization is deferred to that
        # update. With S == 0 the hybrid-update block is statically skipped
        # and the next refactor point would be next frame's propagation —
        # refactor here keeps the column-structure invariant unconditional
        # (ADVICE r3 #2).
        fs, _, _ = apply_update(
            cfg, fs, H_stack, r_stack, obs_var, enable=do_update,
            refactor=(S == 0),
        )

    # retire dead rows, clear pruned clone slots
    obs = fs.obs
    obs = obs.replace(
        valid=obs.valid & ~dead_rows[:, None],
        track_id=jnp.where(dead_rows, -1, obs.track_id),
    )
    fs = fs.replace(obs=obs)
    with jax.named_scope("filt.prune"):
        # re-anchor slam features whose anchor clone is being pruned BEFORE
        # its covariance rows are zeroed (the transform consumes them)
        fs = slam_mod.reanchor_on_prune(cfg, fs, slot_a, slot_b, do_prune)
        fs = prune_mod.remove_clones(cfg, fs, slot_a, slot_b, do_prune)

    # ---- 5. augmentation + observation insertion ----------------------------
    # Cloning continues through standstill (the reference augments every
    # frame): ZUPT then constrains consecutive clones, keeping the velocity
    # variance bounded while vision updates are suspended. The redundancy
    # pruning heuristic recycles the resulting near-duplicate clones.
    owned = slam_mod.slam_owned_rows(cfg, fs)
    # vision-time gate: no clone for a frame whose image time propagation
    # never reached (see 2b) — its pose/time stamp would be stale.
    do_augment = inited & t_reached & (jnp.sum(fs.clones.valid) < C)
    # body rate at clone time: last valid IMU sample, bias-corrected
    last = jnp.argmax(jnp.where(imu.valid, imu.t, -jnp.inf))
    w_body = imu.w[last] - fs.bg
    with jax.named_scope("filt.augment"):
        fs, slot = augment_state(cfg, fs, do_augment, w_body)
        fs = add_observations(
            cfg, fs, slot, feats.ids, feats.uv, feats.valid, slam_owned=owned
        )

    # ---- 6. hybrid update: slam rows + promotion-consumption blocks ---------
    newest = jnp.argmax(jnp.where(fs.clones.valid, fs.clones.frame, -1))
    with jax.named_scope("filt.slam_meas"):
        slam_H, slam_r, slam_accept, slam_hard_fail = slam_mod.slam_measurement_blocks(
            cfg, fs, feats, newest
        )
    # promotion candidates: still-alive tracks with at least slam_promote_obs
    # window observations; their windows are consumed by MSCKF-style blocks
    # in this same update, then cleared. The count threshold is only a FLOOR:
    # the real quality gate is the slam slot budget — _consume_blocks ranks
    # candidates by observation count and the small max_slam_features cap
    # admits only the best-observed (longest-baseline) tracks, whose
    # FEJ-frozen triangulation error is smallest (see the max_slam_features
    # comment in config.py for the r4-r5 sweep history: explicit span /
    # window-completeness maturity gates were measured worse and deleted).
    # Bootstrap mode: while velocity uncertainty is high (right after a rough
    # dynamic init or an online reset), also consume the longest live tracks
    # every frame — the only correction channel before tracks die or the
    # window fills, and the difference between recovering and diverging.
    n_obs_now = jnp.sum(fs.obs.valid, axis=1)
    still_tracked = feats.valid & (feats.ids == fs.obs.track_id)
    bootstrap = _bootstrap_mode(cfg, fs)
    # consume-channel WIDTH keys on velocity uncertainty alone — NOT the
    # window-building condition (which clears ~1 s after a reset while the
    # wide channel is still the main correction source), and deliberately
    # not a long post-reset window either: consuming every >=12-obs track
    # for tens of seconds retires windows at 12 obs that would otherwise
    # keep growing baseline (a 15 s widened window measured NaN-accel
    # recovery 0.34 -> 1.64 in the r5 probes). high_unc holds for the first
    # ~2 s of re-convergence (where extra rows matter most) and is
    # rare/transient in steady state, where the extra consumed windows are
    # full-length (promote_thresh stays slam_promote_obs) — the same
    # marginalization they'd get at track death.
    wide_consume = jnp.max(cov_diag(cfg, fs.P)[6:9]) > cfg.filter.bootstrap_vel_var
    promote_thresh = jnp.where(
        bootstrap, cfg.filter.bootstrap_min_obs, cfg.filter.slam_promote_obs
    )
    promote_cand = (
        still_tracked
        & ~owned
        & (fs.obs.track_id >= 0)
        & (n_obs_now >= promote_thresh)
        & inited
    ) if S > 0 else jnp.zeros_like(dead_rows)
    with jax.named_scope("filt.consume"):
        consume_blocks, consumed_rows, consume_idx, consume_tri, consumed_sel = _consume_blocks(
            cfg, fs, promote_cand, wide_consume
        )
    if S > 0:
        H_b = jnp.concatenate([slam_H, consume_blocks.H.reshape(-1, D)], axis=0)
        r_b = jnp.concatenate([slam_r, consume_blocks.r.reshape(-1)], axis=0)
        n_acc_b = jnp.sum(slam_accept) + jnp.sum(consume_blocks.accept)
        # re-evaluate underweighting: the marginalizing update above may have
        # already collapsed the velocity uncertainty out of the high-unc range
        high_unc_b = jnp.max(cov_diag(cfg, fs.P)[6:9]) > cfg.filter.bootstrap_vel_var
        infl_b = cfg.noise.observation_noise**2 * cfg.filter.bootstrap_noise_inflation
        obs_var_b = jnp.where(
            high_unc_b,
            jnp.maximum(infl_b, cfg.filter.bootstrap_noise_floor**2),
            cfg.noise.observation_noise**2,
        )
        enable_b = inited & (n_acc_b > 0)
        fs, dx, upd_ok = apply_update(
            cfg, fs, H_b, r_b, obs_var_b,
            enable=enable_b,
        )
        # ---- 7. slam lifecycle: promote consumed candidates, drop lost ------
        # anchor at the newest clone (it survives pruning longest; re-anchoring
        # handles the eventual prune of the anchor).
        # Promotion is gated on the update having actually been APPLIED
        # (ADVICE r3 #1, r4 #4): upd_ok alone is the finite verdict — a
        # rejected update leaves fs.P as the PRE-update factor, possibly the
        # marginalization update's non-refactored one, whose freed-slot columns
        # promote_features requires structurally zero, and a dx the delayed
        # init would wrongly condition on; and a DISABLED update (every row
        # chi2-rejected, n_acc_b == 0) is finite yet a no-op, so promoting
        # through it would install landmarks whose window information was
        # never applied while still retiring the window.
        applied = upd_ok & enable_b
        consumed_sel = consumed_sel & applied
        consumed_rows = consumed_rows & applied
        fs = slam_mod.promote_features(
            cfg, fs, consume_blocks, consume_tri, consume_idx, consumed_sel, dx,
            anchor_slot=newest,
        )
        fs = slam_mod.drop_lost(cfg, fs, feats, slam_hard_fail)
        fs = slam_mod.relinearize_nulls(cfg, fs)
        # consumed windows retire (only if their information was actually
        # applied — a rejected update leaves the windows live for next frame)
        fs = fs.replace(
            obs=fs.obs.replace(valid=fs.obs.valid & ~consumed_rows[:, None])
        )

    # ---- 8. ZUPT update -----------------------------------------------------
    with jax.named_scope("filt.zupt"):
        fs = zupt_update(cfg, fs, stationary)

    # ---- 10. online reset (ref:onlineReset, SURVEY.md §5) -------------------
    # triggers: variance explosion, non-finite P, or COLLAPSE — a negative
    # diagonal in the always-estimated IMU block means f32 corruption (an
    # overconfident filter silently freezes at a wrong state; observed with
    # tightly-modeled observation noise)
    diagP = cov_diag(cfg, fs.P)
    pos_var = diagP[12:15]
    blown = (
        (jnp.max(pos_var) > cfg.filter.position_std_threshold**2)
        | ~jnp.all(jnp.isfinite(diagP))
        | ~(jnp.all(jnp.isfinite(fs.q)) & jnp.all(jnp.isfinite(fs.p))
            & jnp.all(jnp.isfinite(fs.v)))
        | (inited & (jnp.min(diagP[:IMU_DIM]) <= 0.0))
    )
    do_reset = blown & inited
    # reset prior: the DYNAMIC-mode covariance, not the static one — an online
    # reset almost always happens mid-motion, and restarting v=0 under the
    # static prior (sigma_v = 0.1 m/s) makes a ~1 m/s true velocity an 11-sigma
    # "impossible" error the chi2 gates then fight for the rest of the run.
    # The in-motion prior (sigma_v = 0.5, loose roll/pitch) matches the actual
    # post-reset uncertainty and lets bootstrap consumption pull velocity in.
    #
    # Calibration states that SURVIVED the fault finite (bg/ba/td) keep their
    # hard-won certainty: re-opening sigma_ba to 0.15 / sigma_td to 25 ms lets
    # the first post-reset updates dump the velocity transient into the slow
    # calibration states, which then takes tens of seconds to undo (observed:
    # ba error 0.01 -> 0.18, td swinging +-10 ms, velocity oscillating ~0.5
    # m/s for the rest of the run). Tight-but-adaptive priors on surviving
    # calibration keep the transient in the fast states where vision can
    # correct it in a few frames.
    # the reset prior is DIAGONAL — build it as a (D,) vector and materialize
    # the matrix once at the select below (the former per-knob fill_diagonal
    # chain copied the full (D,D) six times per frame, ~70 us of pure
    # bookkeeping on the hot path)
    d_reset = jnp.diagonal(initial_covariance(cfg, dtype, mode="dynamic"))
    ar = jnp.arange(d_reset.shape[0])

    def _cal_var(d, i0, n, var_keep, survived):
        # gate on the STATE surviving finite, not on the old P: P is exactly
        # what went non-finite in a NaN fault, yet a finite estimate carries
        # its pre-fault accuracy regardless
        m = (ar >= i0) & (ar < i0 + n)
        return jnp.where(m & survived, var_keep, d)

    # attitude survives most faults finite (gyro-only integration drifts only
    # ~0.1 deg/s with a good bg) — and it is the MOST expensive state to
    # re-open: a 0.12 rad roll/pitch prior lets the first big-velocity-residual
    # updates inject ~3 deg of tilt, whose gravity leak (0.5 m/s^2) then drives
    # a multi-ten-second velocity oscillation (observed). Keep roll/pitch at
    # the static-init trust level when q survived.
    q_ok = jnp.all(jnp.isfinite(fs.q))
    fcfg = cfg.filter
    d_reset = _cal_var(d_reset, 0, 2, jnp.asarray(fcfg.reset_rp_std, dtype) ** 2, q_ok)
    d_reset = _cal_var(d_reset, 2, 1, jnp.asarray(fcfg.reset_yaw_std, dtype) ** 2, q_ok)
    # attitude DID NOT survive (gyro fault): the restart is accel-seeded (see
    # q_fallback below) with tilt error ~|a_linear|/g — open roll/pitch to
    # cover it (the dynamic prior's 0.12 rad is ~1 sigma of a brisk-motion
    # seed; 0.2 rad keeps a ~10 deg seed error inside 1 sigma)
    d_reset = _cal_var(d_reset, 0, 2, jnp.asarray(fcfg.reset_accel_seed_rp_std,
                                                  dtype) ** 2, ~q_ok)
    d_reset = _cal_var(d_reset, 3, 3, jnp.asarray(fcfg.reset_bg_std, dtype) ** 2,
                       jnp.all(jnp.isfinite(fs.bg)))
    d_reset = _cal_var(d_reset, 9, 3, jnp.asarray(fcfg.reset_ba_std, dtype) ** 2,
                       jnp.all(jnp.isfinite(fs.ba)))
    if cfg.filter.estimate_td:
        from larvio_tpu.models.state import IDX_TD
        d_reset = _cal_var(d_reset, IDX_TD, 1,
                           jnp.asarray(fcfg.reset_td_std, dtype) ** 2,
                           jnp.isfinite(fs.td))
    # the reset must also sanitize the NOMINAL state: a NaN-poisoned
    # propagation (corrupted IMU) leaves q/p/bg/ba non-finite, and resetting
    # P alone would freeze the filter in a NaN state forever. Non-finite
    # components restart from neutral values (identity attitude, zero
    # bias/velocity/position — odometry restarts its own origin, like the
    # reference's onlineReset re-seeding from scratch); FEJ nulls restart at
    # the sanitized estimates.
    def _san(x, fallback):
        bad = do_reset & ~jnp.all(jnp.isfinite(x))
        return jnp.where(bad, jnp.asarray(fallback, dtype), x)

    # attitude fallback: identity is arbitrarily wrong mid-motion (tens of
    # degrees of tilt -> a ~5 m/s^2 gravity leak the bootstrap channel cannot
    # fight; observed: after a 1 s NaN-GYRO fault the filter never
    # re-converged, median velocity error 0.87 m/s for the rest of the run).
    # Re-seed roll/pitch from the newest finite accelerometer sample's gravity
    # direction — the static initializer's move, valid to ~|a_lin|/g — and
    # fall back to identity only if the accel is unusable too.
    from larvio_tpu.models.initializer import gravity_aligned_quat

    last_v = jnp.argmax(jnp.where(imu.valid, imu.t, -jnp.inf))
    a_seed = imu.a[last_v]
    a_ok = jnp.all(jnp.isfinite(a_seed)) & (
        jnp.linalg.norm(jnp.where(jnp.isfinite(a_seed), a_seed, 0.0)) > 1.0
    )
    q_grav = gravity_aligned_quat(jnp.where(jnp.isfinite(a_seed), a_seed, 0.0))
    q_fallback = jnp.where(a_ok, q_grav, jnp.array([0.0, 0.0, 0.0, 1.0], dtype))
    q_s = _san(fs.q, q_fallback)
    # a FINITE velocity estimate survives the reset (a variance blow-up's v is
    # still far closer to truth than 0); only a non-finite v restarts at zero
    v_s = _san(fs.v, jnp.zeros(3))
    p_s = _san(fs.p, jnp.zeros(3))
    bg_s = _san(fs.bg, jnp.zeros(3))
    ba_s = _san(fs.ba, jnp.zeros(3))
    t_s = _san(fs.time, feats.t)
    td_s = _san(fs.td, cfg.filter.td_initial)
    fs = fs.replace(
        # sqrt mode: fs.P holds a factor — the diagonal reset prior's
        # factor is diag(sqrt(d)). Materialized from the vector ONCE here.
        P=jnp.where(
            do_reset,
            jnp.diag(jnp.sqrt(d_reset) if cfg.filter.sqrt_form else d_reset),
            fs.P,
        ),
        q=q_s, v=v_s, p=p_s, bg=bg_s, ba=ba_s, time=t_s, td=td_s,
        q_null=jnp.where(do_reset, q_s, fs.q_null),
        v_null=jnp.where(do_reset, v_s, fs.v_null),
        p_null=jnp.where(do_reset, p_s, fs.p_null),
        clones=fs.clones.replace(valid=fs.clones.valid & ~do_reset),
        slam=fs.slam.replace(
            valid=fs.slam.valid & ~do_reset,
            track_id=jnp.where(do_reset, -1, fs.slam.track_id),
            track_slot=jnp.where(do_reset, -1, fs.slam.track_slot),
            anchor_slot=jnp.where(do_reset, -1, fs.slam.anchor_slot),
        ),
        obs=fs.obs.replace(
            valid=fs.obs.valid & ~do_reset,
            track_id=jnp.where(do_reset, -1, fs.obs.track_id),
        ),
        reset_count=fs.reset_count + do_reset.astype(jnp.int32),
        frame=fs.frame + 1,
        stationary=stationary,
    )

    out = StepOutput(
        q=fs.q,
        p=fs.p,
        v=fs.v,
        t=fs.time,
        td=fs.td,
        bg=fs.bg,
        ba=fs.ba,
        initialized=inited,
        stationary=stationary,
        n_clones=jnp.sum(fs.clones.valid),
        n_tracks=n_tracked,
        n_updated=jnp.where(do_update, n_accepted, 0),
        n_slam=jnp.sum(fs.slam.valid),
        p_std=jnp.sqrt(jnp.maximum(cov_diag(cfg, fs.P)[12:15], 0.0)),
        v_std=jnp.sqrt(jnp.maximum(cov_diag(cfg, fs.P)[6:9], 0.0)),
        q_std=jnp.sqrt(jnp.maximum(cov_diag(cfg, fs.P)[0:3], 0.0)),
        did_reset=do_reset,
    )
    return VioState(filter=fs, init_acc=acc), out
