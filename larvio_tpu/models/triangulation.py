"""Gauss-Newton / LM feature triangulation in inverse depth.

Counterpart of ref:include/larvio/feature.hpp (Feature::checkMotion,
Feature::initializePosition, generateInitialGuess — SURVEY.md §2 "Feature
record + triangulation"; "Gauss-Newton feature triangulation" confirmed at
BASELINE.json:5).

TPU design: a feature's observation window is a masked row of the padded
observation table. The solver runs a **fixed** number of damped GN iterations
with masked residuals (invalid observations contribute exactly zero), and the
whole thing vmaps over the feature batch — per-feature 3x3 solves on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.quaternion import quat_multiply, quat_to_rotation


class CameraWindow(NamedTuple):
    """Per-clone camera poses derived from clone IMU poses + extrinsic."""

    R_cw: jnp.ndarray  # (C, 3, 3) world->camera
    p_cw: jnp.ndarray  # (C, 3) camera position in world
    valid: jnp.ndarray  # (C,)


def camera_window(fs, use_null: bool = False) -> CameraWindow:
    """Camera poses for all clone slots: R_cw = R_ci R_wi, p_c = p_i + R_wi^T p_ic."""
    clones = fs.clones
    q = clones.q_null if use_null else clones.q
    p = clones.p_null if use_null else clones.p
    R_ci = quat_to_rotation(fs.q_ci)  # IMU->cam
    R_wi = quat_to_rotation(q)  # (C, 3, 3)
    R_cw = jnp.einsum("ab,nbc->nac", R_ci, R_wi)
    p_ic = -R_ci.T @ fs.t_ci  # camera position in IMU frame
    p_cw = p + jnp.einsum("nba,b->na", R_wi, p_ic)  # R_wi^T @ p_ic
    return CameraWindow(R_cw=R_cw, p_cw=p_cw, valid=clones.valid)


class TriangulationResult(NamedTuple):
    p_w: jnp.ndarray  # (3,) world position
    valid: jnp.ndarray  # () bool: motion + depth gates (err gate is the caller's)
    anchor: jnp.ndarray  # () int32 anchor clone slot
    mean_err: jnp.ndarray  # () mean reprojection residual (normalized units;
    #     IRLS-weighted when tri_huber_k > 0, so a robustly-fit window with
    #     one downweighted mismatch reads as its inlier quality)
    resid: jnp.ndarray  # (C,) RAW per-observation reprojection residual norm
    #     at the final estimate (0 on invalid slots) — the callers'
    #     per-observation outlier trim reads this (config tri_trim_k)


def _earliest_latest(obs_valid, clone_frame):
    """Anchor = earliest valid observation (by clone frame counter), and latest."""
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(obs_valid, clone_frame, big)
    anchor = jnp.argmin(key)
    key2 = jnp.where(obs_valid, clone_frame, -1)
    latest = jnp.argmax(key2)
    return anchor, latest


def triangulate_feature(
    cfg: VioConfig,
    cams: CameraWindow,
    clone_frame: jnp.ndarray,  # (C,) ordering key
    uv: jnp.ndarray,  # (C, 2) normalized observations per clone slot
    obs_valid: jnp.ndarray,  # (C,)
) -> TriangulationResult:
    fcfg = cfg.filter
    obs_valid = obs_valid & cams.valid
    n_obs = jnp.sum(obs_valid)
    anchor, latest = _earliest_latest(obs_valid, clone_frame)

    R_a = cams.R_cw[anchor]
    p_a = cams.p_cw[anchor]
    z_a = uv[anchor]

    # relative poses: anchor cam -> each cam j
    R_ja = jnp.einsum("nab,cb->nac", cams.R_cw, R_a)  # R_cw[j] @ R_a^T
    t_ja = jnp.einsum("nab,nb->na", cams.R_cw, p_a - cams.p_cw)  # R_cw[j](p_a - p_j)

    # --- checkMotion: baseline orthogonal to the anchor ray (ref behavior) ---
    ray_w = R_a.T @ jnp.concatenate([z_a, jnp.ones(1, z_a.dtype)])
    ray_w = ray_w / jnp.linalg.norm(ray_w)
    trans = cams.p_cw[latest] - p_a
    ortho = trans - jnp.dot(trans, ray_w) * ray_w
    motion_ok = jnp.linalg.norm(ortho) > fcfg.tri_translation_threshold

    # --- initial guess: 2-view linear depth from anchor & latest (ref:generateInitialGuess)
    Rl = R_ja[latest]
    tl = t_ja[latest]
    m = Rl @ jnp.concatenate([z_a, jnp.ones(1, z_a.dtype)])
    # depth solving [z_l*(m1 - u_l*m3)] : least squares of 2 eqs
    a_vec = jnp.stack([m[0] - uv[latest, 0] * m[2], m[1] - uv[latest, 1] * m[2]])
    b_vec = jnp.stack(
        [uv[latest, 0] * tl[2] - tl[0], uv[latest, 1] * tl[2] - tl[1]]
    )
    depth0 = jnp.dot(a_vec, b_vec) / jnp.maximum(jnp.dot(a_vec, a_vec), 1e-12)
    depth0 = jnp.clip(depth0, fcfg.tri_min_depth, fcfg.tri_max_depth)
    x0 = jnp.array([z_a[0], z_a[1], 1.0 / depth0], z_a.dtype)

    # --- damped GN on inverse-depth [alpha, beta, rho] -----------------------
    def _raw_residuals(x):
        alpha, beta, rho = x[0], x[1], x[2]
        h = (
            jnp.einsum("nab,b->na", R_ja, jnp.array([alpha, beta, 1.0], x.dtype))
            + rho * t_ja
        )  # (C, 3)
        h3 = jnp.where(jnp.abs(h[:, 2]) < 1e-8, 1e-8, h[:, 2])
        pred = h[:, :2] / h3[:, None]
        r = jnp.where(obs_valid[:, None], pred - uv, 0.0)  # (C, 2)
        return r, h, h3

    def residuals_jac(x):
        r, h, h3 = _raw_residuals(x)
        # d pred / d h
        dpdh = jnp.stack(
            [
                jnp.stack([1.0 / h3, jnp.zeros_like(h3), -h[:, 0] / h3**2], axis=-1),
                jnp.stack([jnp.zeros_like(h3), 1.0 / h3, -h[:, 1] / h3**2], axis=-1),
            ],
            axis=1,
        )  # (C, 2, 3)
        dhdx = jnp.concatenate([R_ja[:, :, :2], t_ja[:, :, None]], axis=-1)  # (C,3,3)
        J = jnp.einsum("nij,njk->nik", dpdh, dhdx)  # (C, 2, 3)
        J = jnp.where(obs_valid[:, None, None], J, 0.0)
        return r, J

    def gn_step(carry, _):
        # (r, J) carried: ONE residuals_jac eval per iteration. The candidate
        # eval doubles as the next iteration's linearization on accept; on
        # reject the carried (r, J) at the unchanged x is still exact — the
        # LM accept/reject decisions are identical to the two-eval form.
        x, lam, cost, r, J = carry
        JtJ = jnp.einsum("nij,nik->jk", J, J)
        Jtr = jnp.einsum("nij,ni->j", J, r)
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ)) + 1e-9 * jnp.eye(3, dtype=x.dtype)
        from larvio_tpu.core.linalg import solve3

        dx = -solve3(A, Jtr)
        x_new = x + dx
        # stay on the physical branch: the depth-free cost has a mirror
        # optimum at negative inverse depth that "fits" inconsistent windows
        x_new = x_new.at[2].set(
            jnp.clip(x_new[2], 1.0 / fcfg.tri_max_depth, 1.0 / fcfg.tri_min_depth)
        )
        r_new, J_new = residuals_jac(x_new)
        cost_new = jnp.sum(r_new * r_new)
        accept = cost_new < cost
        x = jnp.where(accept, x_new, x)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-7), jnp.minimum(lam * 5.0, 1e4))
        cost = jnp.where(accept, cost_new, cost)
        r = jnp.where(accept, r_new, r)
        J = jnp.where(accept, J_new, J)
        return (x, lam, cost, r, J), None

    r0, J0 = residuals_jac(x0)
    cost0 = jnp.sum(r0 * r0)
    # unroll: ~tri_max_iterations x ~20 tiny batched ops is while-loop
    # latency-bound on TPU; unrolling lets XLA fuse across iterations
    (x, _, cost, _, _), _ = jax.lax.scan(
        gn_step, (x0, jnp.asarray(1e-3, x0.dtype), cost0, r0, J0), None,
        length=fcfg.tri_max_iterations, unroll=True,
    )

    rho = x[2]
    depth = 1.0 / jnp.where(jnp.abs(rho) < 1e-8, 1e-8, rho)
    p_anchor = jnp.array([x[0], x[1], 1.0], x.dtype) * depth
    p_w = R_a.T @ p_anchor + p_a

    # The reprojection-error acceptance bound is the CALLER's decision: a
    # tight bound is right in steady state, but right after a rough dynamic
    # initialization (or an online reset) the pose window itself is wrong and
    # large residuals are exactly the information the filter needs — so the
    # bound must scale with the filter's own uncertainty (see msckf.py).
    mean_err = jnp.sqrt(cost / jnp.maximum(n_obs.astype(x.dtype), 1.0))
    depth_ok = (depth > fcfg.tri_min_depth) & (depth < fcfg.tri_max_depth)
    valid = motion_ok & depth_ok & (n_obs >= 2)
    # per-observation residuals at the final estimate, for the callers'
    # outlier trim. The GN point itself stays plain least-squares: a gross
    # outlier biases p_w by ~|r_out|/n, but the consuming measurement block
    # is nullspace-projected (first-order insensitive to feature-position
    # error) and the promotion delayed-init ESTIMATES the feature error from
    # the trimmed range-space rows — so trimming the outlier's rows is
    # sufficient, and keeps this hot unrolled scan's graph unchanged (an
    # IRLS reweight inside the loop ballooned XLA:TPU compile).
    r_raw, _, _ = _raw_residuals(x)
    resid = jnp.linalg.norm(r_raw, axis=-1)
    return TriangulationResult(
        p_w=p_w, valid=valid, anchor=anchor, mean_err=mean_err, resid=resid
    )


def triangulate_batch(cfg, cams, clone_frame, uv_batch, valid_batch):
    """vmap over a feature batch: uv_batch (F, C, 2), valid_batch (F, C)."""
    return jax.vmap(
        lambda uv, m: triangulate_feature(cfg, cams, clone_frame, uv, m)
    )(uv_batch, valid_batch)
