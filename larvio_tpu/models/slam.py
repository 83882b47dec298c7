"""In-state SLAM features: the hybrid part of the hybrid MSCKF.

Counterpart of the reference's SLAM-feature path (ref:src/larvio.cpp —
"hybrid SLAM-feature updates" confirmed at BASELINE.json:5; the hybrid
EKF-SLAM/MSCKF estimator after Mingyang Li, SURVEY.md §0/§3.3):

  * long-surviving tracks are **promoted** into the state: their
    accumulated observation window is consumed by one MSCKF-style
    marginalized update (so no history is wasted), then the feature enters
    the state at its triangulated position with a conservative diagonal
    prior (delayed-initialization approximation, documented trade-off);
  * while tracked, a slam feature gets a cheap 2-row EKF update per frame
    against the newest clone (no window accumulation, no re-triangulation
    — this is what makes long tracks cheap in the hybrid filter);
  * on track death or persistent gating failure the feature is dropped and
    its covariance rows are zeroed (slot recycled).

Feature error state: world-frame position (3), FEJ value in ``p_w_null``.
(The reference parameterizes in anchored inverse depth; world-xyz with FEJ
is the standard alternative and keeps the padded layout trivial — anchor
bookkeeping would couple slam slots to clone slots.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.chi2 import chi2_inv
from larvio_tpu.core.linalg import mm
from larvio_tpu.core.quaternion import quat_to_rotation
from larvio_tpu.core.so3 import skew
from larvio_tpu.models.state import (
    CLONE_BASE,
    CLONE_DIM,
    FilterState,
    IDX_EXT_P,
    IDX_EXT_THETA,
    SLAM_DIM,
    slam_offset,
    state_dim,
)


def slam_owned_rows(cfg: VioConfig, fs: FilterState) -> jnp.ndarray:
    """(F,) mask: front-end rows whose track is an in-state slam feature."""
    if cfg.filter.max_slam_features == 0:
        return jnp.zeros(fs.obs.track_id.shape[0], bool)
    eq = fs.slam.track_id[:, None] == fs.obs.track_id[None, :]  # (S, F)
    eq = eq & fs.slam.valid[:, None] & (fs.obs.track_id >= 0)[None, :]
    return jnp.any(eq, axis=0)


def slam_measurement_blocks(cfg: VioConfig, fs: FilterState, feats, newest_slot):
    """2 rows per tracked slam feature against this frame's clone.

    Returns (H (2S, D), r (2S,), accept (S,), gate_fail_hard (S,)).
    """
    S = cfg.filter.max_slam_features
    D = state_dim(cfg)
    dtype = fs.P.dtype
    if S == 0:
        return jnp.zeros((0, D), dtype), jnp.zeros((0,), dtype), jnp.zeros((0,), bool), jnp.zeros((0,), bool)
    sigma2 = jnp.asarray(cfg.noise.observation_noise**2, dtype)
    fej = cfg.filter.use_fej

    # measurement for each slam feature: the front-end slot it owns
    slot = fs.slam.track_slot  # (S,)
    slot_c = jnp.clip(slot, 0, feats.uv.shape[0] - 1)
    z = feats.uv[slot_c]  # (S, 2)
    tracked = (
        fs.slam.valid
        & (slot >= 0)
        & feats.valid[slot_c]
        & (feats.ids[slot_c] == fs.slam.track_id)
    )

    q_lin = fs.clones.q_null if fej else fs.clones.q
    p_lin = fs.clones.p_null if fej else fs.clones.p
    R_wi_lin = quat_to_rotation(q_lin[newest_slot])
    R_wi_cur = quat_to_rotation(fs.clones.q[newest_slot])
    p_i_lin = p_lin[newest_slot]
    p_i_cur = fs.clones.p[newest_slot]
    R_ci = quat_to_rotation(fs.q_ci)

    p_f = fs.slam.p_w_null if fej else fs.slam.p_w  # (S, 3) linearization
    p_ij = jnp.einsum("ab,sb->sa", R_wi_lin, p_f - p_i_lin[None, :])
    p_cj = jnp.einsum("ab,sb->sa", R_ci, p_ij) + fs.t_ci
    p_ij_cur = jnp.einsum("ab,sb->sa", R_wi_cur, fs.slam.p_w - p_i_cur[None, :])
    p_cj_cur = jnp.einsum("ab,sb->sa", R_ci, p_ij_cur) + fs.t_ci

    z3 = jnp.where(jnp.abs(p_cj[:, 2]) < 1e-6, 1e-6, p_cj[:, 2])
    Jpi = jnp.stack(
        [
            jnp.stack([1.0 / z3, jnp.zeros_like(z3), -p_cj[:, 0] / z3**2], axis=-1),
            jnp.stack([jnp.zeros_like(z3), 1.0 / z3, -p_cj[:, 1] / z3**2], axis=-1),
        ],
        axis=1,
    )  # (S, 2, 3)
    JR = jnp.einsum("sij,jk->sik", Jpi, R_ci)
    H_theta = jnp.einsum("sij,sjk->sik", JR, skew(p_ij))
    H_p = -jnp.einsum("sij,jk->sik", JR, R_wi_lin)
    H_f = -H_p
    H_ext_theta = jnp.einsum("sij,sjk->sik", Jpi, skew(p_cj - fs.t_ci[None, :]))

    z3c = jnp.where(jnp.abs(p_cj_cur[:, 2]) < 1e-6, 1e-6, p_cj_cur[:, 2])
    pred = p_cj_cur[:, :2] / z3c[:, None]
    in_front = p_cj_cur[:, 2] > 0.1
    r = jnp.where((tracked & in_front)[:, None], z - pred, 0.0)  # (S, 2)

    # assemble rows
    H = jnp.zeros((S, 2, D), dtype)
    off = CLONE_BASE + CLONE_DIM * newest_slot
    H = jax.vmap(
        lambda Hrow, ht, hp: jax.lax.dynamic_update_slice(
            jax.lax.dynamic_update_slice(Hrow, ht, (0, off)), hp, (0, off + 3)
        )
    )(H, H_theta, H_p)
    if cfg.filter.estimate_extrinsic:
        H = H.at[:, :, IDX_EXT_THETA:IDX_EXT_THETA + 3].set(H_ext_theta)
        H = H.at[:, :, IDX_EXT_P:IDX_EXT_P + 3].set(Jpi)
    base = slam_offset(cfg, 0)
    eyeS = jnp.eye(S, dtype=dtype)
    fcols = jnp.einsum("sik,st->sitk", H_f, eyeS).reshape(S, 2, S * SLAM_DIM)
    H = H.at[:, :, base : base + S * SLAM_DIM].set(fcols)

    use = tracked & in_front
    H = jnp.where(use[:, None, None], H, 0.0)

    # chi2 gate (2 dof) per feature
    Hf2 = H.reshape(S, 2, D)
    Svar = jnp.einsum("sid,de,sje->sij", Hf2, fs.P, Hf2) + sigma2 * jnp.eye(2, dtype=dtype)
    # closed-form 2x2 inverse (batched LU custom-calls are pure overhead here)
    det = Svar[:, 0, 0] * Svar[:, 1, 1] - Svar[:, 0, 1] * Svar[:, 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    gamma = (
        Svar[:, 1, 1] * r[:, 0] ** 2
        - (Svar[:, 0, 1] + Svar[:, 1, 0]) * r[:, 0] * r[:, 1]
        + Svar[:, 0, 0] * r[:, 1] ** 2
    ) / det
    # an indefinite innovation covariance (gamma < 0 or non-finite) means the
    # feature's covariance block has gone numerically bad: hard-fail it
    bad = ~jnp.isfinite(gamma) | (gamma < 0.0)
    gate = chi2_inv(jnp.full((S,), 2, jnp.int32), cfg.filter.chi2_confidence)
    accept = use & (gamma < gate) & ~bad
    hard_fail = use & ((gamma > 5.0 * gate) | bad)

    H = jnp.where(accept[:, None, None], H, 0.0)
    r = jnp.where(accept[:, None], r, 0.0)
    return H.reshape(2 * S, D), r.reshape(2 * S), accept, hard_fail


def promote_features(cfg: VioConfig, fs: FilterState, blocks, tri, idx, sel, dx) -> FilterState:
    """Promote consumed candidates into free slam slots — exact delayed init.

    Each candidate's observation window was split by the Householder
    elimination (update.feature_block) into a nullspace part (already applied
    in the stacked update that produced ``dx`` and the posterior ``fs.P``)
    and three range-space rows

        r3 = H3 dx + Rf df + n,   n ~ N(0, sigma^2 I).

    Conditioning on the posterior gives the exact joint initialization
    (Li & Mourikis-style hybrid promotion):

        df_hat = Rf^-1 (r3 - H3 dx_hat)
        P_ff   = Rf^-1 (H3 P+ H3^T + sigma^2 I) Rf^-T
        P_fx   = -Rf^-1 H3 P+

    so the window's information is fully used with no double counting.
    """
    S = cfg.filter.max_slam_features
    if S == 0:
        return fs
    obs = fs.obs
    F = obs.track_id.shape[0]
    sigma2 = jnp.asarray(cfg.noise.observation_noise**2, fs.P.dtype)
    D = state_dim(cfg)

    # per-candidate conditional init (vmapped pre-pass)
    def init_of(k):
        Rf = blocks.Rf[k] + 1e-9 * jnp.eye(3, dtype=fs.P.dtype)
        H3 = blocks.H3[k]
        r3 = blocks.r3[k]
        rhs = r3 - mm(H3, dx[:, None])[:, 0]
        df = jax.scipy.linalg.solve_triangular(Rf, rhs[:, None], lower=False)[:, 0]
        H3P = mm(H3, fs.P)  # (3, D) — fs.P is the posterior here
        P_fx = -jax.scipy.linalg.solve_triangular(Rf, H3P, lower=False)
        P_ff = jax.scipy.linalg.solve_triangular(
            Rf, mm(H3P, H3.T) + sigma2 * jnp.eye(3, dtype=fs.P.dtype), lower=False
        )
        P_ff = jax.scipy.linalg.solve_triangular(Rf, P_ff.T, lower=False).T
        return df, P_fx, 0.5 * (P_ff + P_ff.T)

    df_all, P_fx_all, P_ff_all = jax.vmap(init_of)(jnp.arange(S))

    # only promote features whose initialization is well-constrained — a
    # promoted feature's linearization point is (FEJ-)frozen, so a multi-meter
    # depth sigma would poison every subsequent per-frame update. Also require
    # a well-conditioned elimination factor and finite blocks: in f32 a nearly
    # singular Rf can make the joint covariance indefinite.
    diag_ff = jnp.diagonal(P_ff_all, axis1=1, axis2=2)
    well_init = (
        (jnp.max(diag_ff, axis=1) < cfg.filter.slam_max_init_sigma**2)
        & (jnp.min(diag_ff, axis=1) > 0.0)
        & (jnp.min(jnp.abs(jnp.diagonal(blocks.Rf, axis1=1, axis2=2)), axis=1) > 1e-4)
        & jnp.all(jnp.isfinite(df_all), axis=1)
        & jnp.all(jnp.isfinite(P_fx_all.reshape(S, -1)), axis=1)
        & jnp.all(jnp.isfinite(P_ff_all.reshape(S, -1)), axis=1)
        & (jnp.linalg.norm(df_all, axis=1) < 3.0 * cfg.filter.slam_max_init_sigma)
    )
    sel = sel & well_init

    n_free = jnp.sum(~fs.slam.valid)
    take = sel & (jnp.cumsum(sel.astype(jnp.int32)) <= n_free)

    # k-th taken candidate -> k-th free slot
    free_order = jnp.argsort(fs.slam.valid.astype(jnp.int32))  # free slots first
    rank = jnp.cumsum(take.astype(jnp.int32)) - 1
    slot_for_cand = jnp.where(take, free_order[jnp.clip(rank, 0, S - 1)], -1)

    state = (
        fs.slam.p_w, fs.slam.p_w_null, fs.slam.track_slot, fs.slam.track_id,
        fs.slam.valid, fs.P,
    )

    def assign(carry, k):
        p_w_new, null_new, tslot_new, tid_new, valid_new, P = carry
        do = take[k]
        sc = jnp.clip(slot_for_cand[k], 0, S - 1)
        row = idx[k]

        df = df_all[k]
        P_fx = P_fx_all[k]
        P_ff = P_ff_all[k]

        p_init = tri.p_w[k] + df
        p_w_new = jnp.where(do, p_w_new.at[sc].set(p_init), p_w_new)
        null_new = jnp.where(do, null_new.at[sc].set(p_init), null_new)
        tslot_new = jnp.where(do, tslot_new.at[sc].set(row.astype(jnp.int32)), tslot_new)
        tid_new = jnp.where(do, tid_new.at[sc].set(obs.track_id[row]), tid_new)
        valid_new = jnp.where(do, valid_new.at[sc].set(True), valid_new)

        off = slam_offset(cfg, sc)
        Pa = jax.lax.dynamic_update_slice(P, P_fx, (off, 0))
        Pa = jax.lax.dynamic_update_slice(Pa, P_fx.T, (0, off))
        Pa = jax.lax.dynamic_update_slice(Pa, P_ff, (off, off))
        P = jnp.where(do, Pa, P)
        return (p_w_new, null_new, tslot_new, tid_new, valid_new, P), None

    (p_w_new, null_new, tslot_new, tid_new, valid_new, P), _ = jax.lax.scan(
        assign, state, jnp.arange(S)
    )

    return fs.replace(
        slam=fs.slam.replace(
            p_w=p_w_new, p_w_null=null_new, track_slot=tslot_new,
            track_id=tid_new, valid=valid_new,
        ),
        P=P,
    )


def drop_lost(cfg: VioConfig, fs: FilterState, feats, hard_fail) -> FilterState:
    """Drop slam features whose track died or which fail gating hard."""
    S = cfg.filter.max_slam_features
    if S == 0:
        return fs
    slot = jnp.clip(fs.slam.track_slot, 0, feats.uv.shape[0] - 1)
    tracked = (
        fs.slam.valid
        & (fs.slam.track_slot >= 0)
        & feats.valid[slot]
        & (feats.ids[slot] == fs.slam.track_id)
    )
    drop = fs.slam.valid & (~tracked | hard_fail)

    D = state_dim(cfg)
    P = fs.P

    def clear(carry, s):
        P = carry
        off = slam_offset(cfg, s)
        zero_rows = jnp.zeros((SLAM_DIM, D), P.dtype)
        Pa = jax.lax.dynamic_update_slice(P, zero_rows, (off, 0))
        Pa = jax.lax.dynamic_update_slice(Pa, zero_rows.T, (0, off))
        return jnp.where(drop[s], Pa, P), None

    P, _ = jax.lax.scan(clear, P, jnp.arange(S))
    return fs.replace(
        slam=fs.slam.replace(
            valid=fs.slam.valid & ~drop,
            track_id=jnp.where(drop, -1, fs.slam.track_id),
            track_slot=jnp.where(drop, -1, fs.slam.track_slot),
        ),
        P=P,
    )
