"""Vectorized two-point translation RANSAC with known (gyro) rotation.

Counterpart of ref:ImageProcessor::twoPointRansac (SURVEY.md §3.2). With the
frame-to-frame rotation known from gyro integration, the epipolar geometry
has only the 2-dof translation direction left; two correspondences determine
it (t ~ (p2 x R p1) x (p2' x R p1')).

TPU design (SURVEY.md §7 layer 3): instead of sequential hypothesize-and-
verify, a fixed batch of hypotheses is sampled, ALL are scored against ALL
correspondences in one (hypotheses x features) matrix, and the argmax
hypothesis's inlier mask is returned — RANSAC as a fixed-trip-count argmax.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    inliers: jnp.ndarray  # (F,) bool
    n_inliers: jnp.ndarray  # ()
    degenerate: jnp.ndarray  # () translation too small to discriminate


def _homog(p):
    return jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), p.dtype)], axis=-1)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over the masked-valid entries of a padded 1-D array.

    jnp.median NaN-poisons the whole reduction if any slot holds NaN, so the
    obvious where(valid, x, nan) + median pattern silently returns NaN on any
    partially-valid table (ADVICE r1, high). Sort invalid slots to +inf and
    index the middle of the valid prefix instead. Returns 0 when nothing is
    valid.
    """
    big = jnp.asarray(jnp.inf, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask)
    last = x.shape[0] - 1
    lo = jnp.clip((n - 1) // 2, 0, last)
    hi = jnp.clip(n // 2, 0, last)
    med = 0.5 * (xs[lo] + xs[hi])
    return jnp.where(n > 0, med, jnp.asarray(0.0, x.dtype))


def two_point_ransac(
    p_prev: jnp.ndarray,  # (F, 2) normalized coords in prev frame
    p_curr: jnp.ndarray,  # (F, 2) normalized coords in curr frame
    R_p_c: jnp.ndarray,  # (3, 3) rotation prev cam -> curr cam (gyro)
    valid: jnp.ndarray,  # (F,)
    key: jnp.ndarray,  # PRNG key
    threshold: float,  # epipolar residual gate (normalized units)
    n_hyp: int = 64,
) -> RansacResult:
    F = p_prev.shape[0]
    dtype = p_prev.dtype

    r1 = jnp.einsum("ab,fb->fa", R_p_c, _homog(p_prev))  # rotated prev rays
    r1 = r1 / r1[..., 2:3]
    r2 = _homog(p_curr)

    # epipolar normals: n_f = r2 x r1  (t must be orthogonal to every n_f)
    n = jnp.cross(r2, r1)  # (F, 3)

    # degenerate (pure rotation): residuals without translation already tiny
    rot_resid = jnp.linalg.norm(r2[:, :2] - r1[:, :2], axis=-1)
    med_motion = masked_median(rot_resid, valid)
    degenerate = med_motion < threshold

    # sample hypothesis pairs among valid features (weighted choice without
    # replacement is overkill: sample indices uniformly, mask invalid picks)
    k1, k2 = jax.random.split(key)
    probs = valid.astype(dtype) + 1e-6
    probs = probs / jnp.sum(probs)
    idx = jax.random.choice(k1, F, shape=(n_hyp, 2), p=probs)
    na = n[idx[:, 0]]
    nb = n[idx[:, 1]]
    t = jnp.cross(na, nb)  # (H, 3) hypothesis translation directions
    t_norm = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = t / jnp.maximum(t_norm, 1e-12)
    hyp_ok = (t_norm[:, 0] > 1e-9) & valid[idx[:, 0]] & valid[idx[:, 1]]

    # residual: perpendicular distance of the current ray from the epipolar
    # line l = t x r1 of the rotated previous ray, in normalized-plane units
    # (same units as ``threshold``): |r2 . (t x r1)| / |l_xy|. The numerator
    # equals |t . n| (scalar triple product), but the denominator MUST be the
    # image-plane norm of the line, NOT |n|: |n| ~ |flow|, and dividing by it
    # yields a dimensionless noise/flow ratio (~0.1 for true inliers at 3-5 px
    # flow) that no coordinate-unit threshold can gate — measured: that form
    # rejected 80%+ of true inliers as soon as motion left the degenerate
    # branch, collapsing track lifetimes to ~1 frame during acceleration.
    l = jnp.cross(t[:, None, :], r1[None, :, :])  # (H, F, 3) epipolar lines
    l_xy = jnp.linalg.norm(l[..., :2], axis=-1)
    num = jnp.abs(jnp.einsum("fc,hfc->hf", r2, l))
    resid = num / jnp.maximum(l_xy, 1e-9)
    inlier_mat = (resid < threshold) & valid[None, :]
    counts = jnp.sum(inlier_mat, axis=1) * hyp_ok
    best = jnp.argmax(counts)
    inliers = inlier_mat[best]

    # if motion is degenerate (no translation), keep everything that fits the
    # pure-rotation model instead (the reference's markers for this case)
    rot_inliers = (rot_resid < threshold) & valid
    inliers = jnp.where(degenerate, rot_inliers, inliers)
    return RansacResult(
        inliers=inliers, n_inliers=jnp.sum(inliers), degenerate=degenerate
    )
