"""Pyramidal Lucas-Kanade feature tracking (inverse-compositional KLT).

Counterpart of the reference's cv::calcOpticalFlowPyrLK call inside
ref:ImageProcessor::trackFeatures (SURVEY.md §3.2 "THE HOT PATH"). TPU
design: the per-feature iterative solver becomes a fixed-trip-count loop with
convergence masks, vmapped over the whole padded feature table; each level's
template gradients are sampled once (inverse-compositional form), so per
iteration only the current-image patch is regathered.

This is the flagship candidate for a Pallas kernel (SURVEY.md §7 hard part
#3); this module is the XLA reference implementation and the correctness
baseline for it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from larvio_tpu.ops.image import in_bounds, sample_patch, scharr_gradients


class LKResult(NamedTuple):
    pos: jnp.ndarray  # (F, 2) tracked positions (full-res px)
    valid: jnp.ndarray  # (F,) tracking success
    err: jnp.ndarray  # (F,) mean abs residual (grayscale units)


def _patch_grid(patch: int, dtype):
    r = (patch - 1) / 2.0
    d = jnp.arange(patch, dtype=dtype) - r
    dx, dy = jnp.meshgrid(d, d, indexing="xy")
    return jnp.stack([dx, dy], axis=-1).reshape(-1, 2)  # (P*P, 2)


def lk_track(
    prev_pyr: list[jnp.ndarray],
    curr_pyr: list[jnp.ndarray],
    prev_grad_pyr: list[tuple[jnp.ndarray, jnp.ndarray]],
    pos_prev: jnp.ndarray,  # (F, 2) full-res px
    pos_guess: jnp.ndarray,  # (F, 2) full-res px initial guess (gyro-predicted)
    valid: jnp.ndarray,  # (F,)
    patch: int = 15,
    iters: int = 12,
    precision: float = 0.01,
    max_err: float = 25.0,
    min_eig: float = 1e-3,
) -> LKResult:
    """Track features prev -> curr through the pyramid. All args fixed-shape."""
    dtype = pos_prev.dtype
    levels = len(prev_pyr)
    n_px = patch * patch

    def track_level(lvl, flow, ok):
        """flow: current displacement estimate at full resolution."""
        scale = jnp.asarray(2.0 ** (-lvl), dtype)
        img_t = prev_pyr[lvl]
        img_c = curr_pyr[lvl]
        gx, gy = prev_grad_pyr[lvl]
        H, W = img_t.shape

        def per_feature(p_prev, p_flow, feat_ok):
            c_t = p_prev * scale  # template center at this level
            T = sample_patch(img_t, c_t, patch)
            Gx = sample_patch(gx, c_t, patch)
            Gy = sample_patch(gy, c_t, patch)
            # 2x2 normal matrix of the template (inverse compositional)
            gxx = jnp.sum(Gx * Gx)
            gxy = jnp.sum(Gx * Gy)
            gyy = jnp.sum(Gy * Gy)
            det = gxx * gyy - gxy * gxy
            tr = gxx + gyy
            min_e = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (2 * n_px)
            well_cond = min_e > min_eig
            inv = jnp.array([[gyy, -gxy], [-gxy, gxx]], dtype) / jnp.maximum(det, 1e-12)

            t_ok = feat_ok & well_cond & in_bounds(
                c_t, (H, W), margin=(patch // 2 + 1)
            )

            def body(_, carry):
                d, conv = carry
                I = sample_patch(img_c, c_t + d, patch)
                e = I - T
                g = jnp.stack([jnp.sum(Gx * e), jnp.sum(Gy * e)])
                step = inv @ g
                new_d = d - step
                small = jnp.linalg.norm(step) < precision
                d = jnp.where(conv | ~t_ok, d, new_d)
                return d, conv | small

            d0 = p_flow * scale
            d, _ = jax.lax.fori_loop(0, iters, body, (d0, jnp.asarray(False)))

            # final residual + bounds check at the tracked location
            I = sample_patch(img_c, c_t + d, patch)
            err = jnp.mean(jnp.abs(I - T))
            inb = in_bounds(c_t + d, (H, W), margin=1.0)
            return d / scale, t_ok & inb, err

        flow_new, ok_new, err = jax.vmap(per_feature)(pos_prev, flow, ok)
        # keep the old flow for features that failed at this level; a coarse
        # level being flat/ill-conditioned is NOT a tracking failure (OpenCV
        # semantics) — only the finest level's verdict gates validity
        flow = jnp.where(ok_new[:, None], flow_new, flow)
        return flow, ok_new, err

    flow = pos_guess - pos_prev
    ok = valid
    err = jnp.zeros(pos_prev.shape[0], dtype)
    ok_fine = valid
    for lvl in range(levels - 1, -1, -1):
        flow, ok_fine, err = track_level(lvl, flow, valid)

    pos = pos_prev + flow
    H0, W0 = prev_pyr[0].shape
    ok = valid & ok_fine & (err < max_err) & in_bounds(pos, (H0, W0), margin=1.0)
    return LKResult(pos=pos, valid=ok, err=err)


def make_grad_pyramid(pyr: list[jnp.ndarray]):
    return [scharr_gradients(im) for im in pyr]
